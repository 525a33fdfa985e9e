"""Production assembly: one loader that turns a weights directory into a
fully-registered, resident `VitronSystem`.

The reference's one observable deployment loads every checkpoint at startup
and serves all tasks A-G from resident models (reference: app.py:59-63 for
the MLLM, 89-342 for the backends; loader vitron/model/builder.py:27-171).
This module is the TPU-native equivalent: every component present under
`--weights` is loaded through the SAME converters the acceptance suite
uses, registered on a `VitronSystem`, and accounted in the `MemoryPlan`.
Missing components degrade the system (chat-only + whatever is present)
and are reported, never silently random-initialized.

Weights-directory layout (superset of apps/eval_suite.ACCEPTANCE_MANIFEST):

    vicuna-7b/              HF llama dir + tokenizer   (required)
    vitron_lora/            peft adapter + non_lora_trainables.bin
                            (projector + region extractor weights)
    clip_vit_l14/           HF CLIP vision tower       (required*)
    languagebind_video/     video tower w/ temporal attention
    clip_tokenizer/         HF CLIP tokenizer (SEEM language, GLIGEN /
                            video-diffusion text encoders)
    seem_focall_v1.pt       -> tasks B, E (+ the mask half of C)
    gligen/*.pth            -> task A; *inpaint*.pth -> task C
    t2v/*.pth               UNetSD_T2VBase            -> task D
    t2v/vae.pth             ldm AutoencoderKL (falls back to the GLIGEN
                            bundle's VAE when absent — same KL-f8 VAE)
    t2v/text_encoder/       HF CLIPTextModel dir (open-clip ViT-H text)
    i2vgen/*.pth (+vae/text_encoder like t2v)         -> task G
    stablevideo/control_sd15_canny.pth   ControlLDM bundle -> task F
    stablevideo/control_sd15_depth.pth   depth ControlNet (control_model.*)
    stablevideo/dpt_hybrid*.pt           MiDaS depth annotator
    stablevideo/<video>/checkpoint       per-video NLA atlases (task F)

(*) A real-weights system with a random-init vision tower silently answers
garbage for every image question; `build_system_from_weights` therefore
refuses to build one unless `allow_random_towers=True` (demo/smoke only).
"""
from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import Any, Dict, Optional, Tuple

import numpy as np


class MissingWeightsError(RuntimeError):
    """A component required for a sound deployment is absent."""


@dataclasses.dataclass
class AssemblyReport:
    """Per-component load ledger: name -> {status, detail}."""

    rows: Dict[str, Dict[str, Any]] = dataclasses.field(default_factory=dict)

    def add(self, name: str, status: str, detail: str = "") -> None:
        self.rows[name] = {"status": status, "detail": detail}

    def loaded(self) -> list:
        return [k for k, v in self.rows.items() if v["status"] == "loaded"]

    def summary(self) -> str:
        width = max((len(k) for k in self.rows), default=4)
        lines = [f"{k:{width}s}  {v['status']:8s} {v['detail']}".rstrip()
                 for k, v in self.rows.items()]
        return "\n".join(lines)


# ------------------------------------------------------------ HF config IO


def llama_cfg_from_hf(base: pathlib.Path):
    """LlamaConfig from an HF checkpoint dir's config.json
    (reference builder.py:54 AutoConfig.from_pretrained)."""
    from vitron_tpu.models.llm import llama

    cfg_file = pathlib.Path(base) / "config.json"
    if not cfg_file.exists():
        return llama.LlamaConfig.vicuna_7b()
    c = json.loads(cfg_file.read_text())
    return llama.LlamaConfig(
        vocab_size=c.get("vocab_size", 32000),
        hidden_size=c.get("hidden_size", 4096),
        intermediate_size=c.get("intermediate_size", 11008),
        num_layers=c.get("num_hidden_layers", 32),
        num_heads=c.get("num_attention_heads", 32),
        num_kv_heads=c.get("num_key_value_heads",
                           c.get("num_attention_heads", 32)),
        rope_theta=c.get("rope_theta", 10000.0),
        rms_norm_eps=c.get("rms_norm_eps", 1e-5),
        max_seq_len=min(c.get("max_position_embeddings", 4096), 4096))


def vit_cfg_from_hf(clip_dir: pathlib.Path):
    """ViTConfig from an HF CLIP dir's config.json (None when absent)."""
    from vitron_tpu.models.vision import vit

    cfg_file = pathlib.Path(clip_dir) / "config.json"
    if not cfg_file.exists():
        return None
    c = json.loads(cfg_file.read_text())
    v = c.get("vision_config", c)
    return vit.ViTConfig(
        image_size=v.get("image_size", 224),
        patch_size=v.get("patch_size", 14),
        hidden_size=v.get("hidden_size", 1024),
        num_layers=v.get("num_hidden_layers", 24),
        num_heads=v.get("num_attention_heads", 16),
        intermediate_size=v.get("intermediate_size", 4096))


def text_cfg_from_hf(text_dir: pathlib.Path):
    """clip_text.TextConfig from an HF CLIPTextModel dir (None when absent)."""
    from vitron_tpu.models.diffusion import clip_text

    cfg_file = pathlib.Path(text_dir) / "config.json"
    if not cfg_file.exists():
        return None
    c = json.loads(cfg_file.read_text())
    t = c.get("text_config", c)
    return clip_text.TextConfig(
        vocab_size=t.get("vocab_size", 49408),
        hidden_size=t.get("hidden_size", 768),
        num_layers=t.get("num_hidden_layers", 12),
        num_heads=t.get("num_attention_heads", 12),
        intermediate_size=t.get("intermediate_size", 3072),
        max_length=t.get("max_position_embeddings", 77))


def _load_state_dir(d: pathlib.Path) -> Dict[str, np.ndarray]:
    """safetensors-or-torch-bin directory load (builder.py load order)."""
    from vitron_tpu.models.llm import loader

    sd = loader.load_safetensors_dir(str(d))
    if not sd:
        for f in sorted(pathlib.Path(d).glob("*.bin")):
            sd.update(loader.load_torch_bin(str(f)))
    return sd


# ------------------------------------------------------------- NLA atlases


class NLAAtlasStore:
    """Resident per-video Neural-Layered-Atlas bundles for task F.

    The reference expects a precomputed NLA checkpoint per editable video
    (StableVideo/app.py:67-76, atlas_utils.py:75-80) and rebuilds
    everything per request; here each <video>/checkpoint is converted once
    and the UV/alpha evaluation is cached per (video, t, h, w).
    """

    # released IMLP geometries (atlas_utils.py:26-72)
    _MAPPING_CFGS: Dict[str, Any] = {}

    def __init__(self, root: pathlib.Path, atlas_res: int = 256):
        from vitron_tpu.models.diffusion import stablevideo as sv

        self.root = pathlib.Path(root)
        self.atlas_res = atlas_res
        self.videos = sorted(
            d.name for d in self.root.iterdir()
            if d.is_dir() and (d / "checkpoint").exists()
        ) if self.root.is_dir() else []
        self._cache: Dict[Any, Dict[str, Any]] = {}
        if not NLAAtlasStore._MAPPING_CFGS:
            NLAAtlasStore._MAPPING_CFGS = {
                "fg": sv.IMLPConfig(input_dim=3, output_dim=2, num_layers=6,
                                    positional_dim=0, skip_layers=()),
                "bg": sv.IMLPConfig(input_dim=3, output_dim=2, num_layers=4,
                                    positional_dim=0, skip_layers=()),
                "alpha": sv.IMLPConfig(input_dim=3, output_dim=1, num_layers=8,
                                       positional_dim=5, skip_layers=()),
                "atlas": sv.IMLPConfig(input_dim=2, output_dim=3, num_layers=8,
                                       positional_dim=10, skip_layers=(4, 7)),
            }

    def bundle(self, name: str, t: int, h: int, w: int) -> Dict[str, Any]:
        import jax.numpy as jnp
        import torch

        from vitron_tpu.models.diffusion import stablevideo as sv

        key = (name, t, h, w)
        if key in self._cache:
            return self._cache[key]
        vdir = self.root / name
        ckpt = torch.load(str(vdir / "checkpoint"), map_location="cpu",
                          weights_only=False)
        cfgs = NLAAtlasStore._MAPPING_CFGS
        fg = sv.convert_imlp_torch(ckpt["model_F_mapping1_state_dict"])
        bg = sv.convert_imlp_torch(ckpt["model_F_mapping2_state_dict"])
        alpha = sv.convert_imlp_torch(ckpt["model_F_alpha_state_dict"])
        atlas = sv.convert_imlp_torch(ckpt["F_atlas_state_dict"])
        meta = {}
        if (vdir / "config.json").exists():
            meta = json.loads((vdir / "config.json").read_text())
        fg_uv, bg_uv, a = sv.atlas_uvs(
            fg, bg, alpha,
            {k: cfgs[k] for k in ("fg", "bg", "alpha")}, t, h, w,
            max_frames=meta.get("maximum_number_of_frames", t))
        # evaluate atlas colors on a fixed grid: fg crop lives in the
        # [0,1]x[0,1] UV quadrant the mapping nets emit
        r = self.atlas_res
        gy, gx = np.meshgrid(np.linspace(-1, 1, r), np.linspace(-1, 1, r),
                             indexing="ij")
        pts = jnp.asarray(np.stack([gx, gy], -1), jnp.float32)
        colors = 0.5 * (np.asarray(
            sv.imlp_forward(atlas, cfgs["atlas"], pts)) + 1.0)
        out = {
            "fg_atlas": np.clip(colors, 0.0, 1.0),
            "bg_atlas": np.clip(colors, 0.0, 1.0),
            "fg_uv": np.asarray(fg_uv),
            "bg_uv": np.asarray(bg_uv),
            "alpha": np.asarray(a),
        }
        self._cache[key] = out
        return out

    def provider(self):
        """atlas_provider(video, extra) for register_video_editor: picks the
        NLA bundle named extra['atlas'] (default: the only/first one)."""

        def provide(video, extra):
            if not self.videos:
                raise FileNotFoundError(
                    f"no NLA atlas checkpoints under {self.root}")
            name = (extra or {}).get("atlas", self.videos[0])
            if name not in self.videos:
                raise FileNotFoundError(
                    f"unknown atlas {name!r}; have {self.videos}")
            t = len(video) if video is not None else 8
            h, w = (video[0].shape[:2] if video is not None else (256, 256))
            return self.bundle(name, t, h, w)

        return provide


# --------------------------------------------------------------- assembly


def _load_mllm(base: pathlib.Path, lora: pathlib.Path,
               clip_dir: pathlib.Path, lbv_dir: pathlib.Path,
               geometry: str, quantize: str, seed: int,
               allow_random_towers: bool, report: AssemblyReport):
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp
    import transformers

    from vitron_tpu.models import vitron_model
    from vitron_tpu.models.llm import loader
    from vitron_tpu.models.vision import loader as vloader
    from vitron_tpu.models.vision import projector, region_extractor

    if not base.is_dir():
        raise MissingWeightsError(f"{base} (HF llama dir) is required")
    tiny = geometry == "tiny"
    llm_cfg = llama_cfg_from_hf(base)
    tower_cfg = vit_cfg_from_hf(clip_dir)
    if tower_cfg is None and not allow_random_towers:
        raise MissingWeightsError(
            f"{clip_dir} (HF CLIP vision tower) is required: "
            "a random-init tower answers garbage for every image question. "
            "Pass allow_random_towers=True only for smoke tests.")
    if not tiny and tower_cfg is not None:
        # bf16 tower serving (reference loads towers fp16, builder.py:47)
        tower_cfg = _dc.replace(tower_cfg, param_dtype=jnp.bfloat16,
                                compute_dtype=jnp.bfloat16)
    kw: Dict[str, Any] = {"llm": llm_cfg}
    if tower_cfg is not None:
        kw["image_tower"] = tower_cfg
        kw["video_tower"] = _dc.replace(tower_cfg, add_time_attn=True)
    cfg = (vitron_model.VitronConfig.tiny(**kw) if tiny
           else vitron_model.VitronConfig(**kw))
    params = vitron_model.init_params(jax.random.PRNGKey(seed), cfg)

    params["llm"] = jax.tree.map(jnp.asarray, loader.load_pretrained_llama(
        str(base), llm_cfg, lora_path=str(lora) if lora.is_dir() else None,
        quantize=quantize))
    report.add("llm", "loaded",
               f"{base.name}"
               + (f" + LoRA({lora.name})" if lora.is_dir() else " (no LoRA)")
               + (f" quant={quantize}" if quantize else ""))

    for key, d, conv_cfg in (("image_tower", clip_dir, cfg.image_tower),
                             ("video_tower", lbv_dir, cfg.video_tower)):
        if d.is_dir():
            sd = _load_state_dir(d)
            params[key] = jax.tree.map(
                jnp.asarray, vloader.convert_hf_clip_vision(sd, conv_cfg))
            report.add(key, "loaded", d.name)
        else:
            report.add(key, "missing",
                       f"{d} absent — {key.replace('_', ' ')} stays random "
                       "init" + ("" if allow_random_towers else
                                 " (video understanding degraded)"))

    # adapter-only weights: projector + region extractor
    # (reference non_lora_trainables.bin, builder.py:63-79)
    nl: Dict[str, Any] = {}
    if lora.is_dir():
        for f in lora.glob("non_lora_trainables.bin"):
            nl.update(loader.load_torch_bin(str(f)))
        for f in lora.glob("non_lora_trainables.npz"):
            nl.update(dict(np.load(str(f))))
    if any("mm_projector" in k for k in nl):
        params["projector"] = jax.tree.map(jnp.asarray, projector.convert_hf(nl))
        report.add("projector", "loaded", "non_lora_trainables")
    else:
        report.add("projector", "missing",
                   "no mm_projector weights — multimodal replies will be "
                   "untrained")
    if any("region_extractor" in k for k in nl):
        params["region"] = jax.tree.map(jnp.asarray,
                                        region_extractor.convert_hf(nl))
        report.add("region_extractor", "loaded", "non_lora_trainables")
    else:
        report.add("region_extractor", "missing", "no region weights")

    tokenizer = transformers.AutoTokenizer.from_pretrained(str(base))
    return params, cfg, tokenizer


def _clip_tokenizer(w: pathlib.Path):
    d = w / "clip_tokenizer"
    if not d.is_dir():
        return None
    import transformers

    try:
        return transformers.AutoTokenizer.from_pretrained(str(d))
    except Exception:
        return transformers.CLIPTokenizer.from_pretrained(str(d))


def _register_seem(system, w: pathlib.Path, geometry: str, clip_tok,
                   report: AssemblyReport) -> None:
    import jax
    import jax.numpy as jnp

    from vitron_tpu.models.llm import loader
    from vitron_tpu.models.seem import model as seem_model

    pt = w / "seem_focall_v1.pt"
    if not pt.exists():
        report.add("seem", "missing", f"{pt.name} absent — tasks B/E off")
        return
    if clip_tok is None:
        report.add("seem", "skipped",
                   "clip_tokenizer/ absent (needed for referring text)")
        return
    tiny = geometry == "tiny"
    scfg = seem_model.SeemConfig.tiny() if tiny else seem_model.SeemConfig()
    sd = loader.load_torch_bin(str(pt))
    sp = jax.tree.map(jnp.asarray, seem_model.convert_torch(sd, scfg))
    system.register_seem(sp, scfg, clip_tok,
                         compute_dtype="float32" if tiny else "bfloat16")
    report.add("seem", "loaded", f"{pt.name} -> B, E (+C masks)")


def _register_gligen(system, w: pathlib.Path, geometry: str, clip_tok,
                     report: AssemblyReport):
    """-> vae_params or None (the shared KL-f8 VAE, reused by t2v/i2vgen
    when they ship no VAE of their own)."""
    import dataclasses as _dc

    from vitron_tpu.models.diffusion import gligen_pipeline as gp

    gdir = w / "gligen"
    pths = sorted(gdir.glob("*.pth")) if gdir.is_dir() else []
    gen = [p for p in pths if "inpaint" not in p.name.lower()]
    inp = [p for p in pths if "inpaint" in p.name.lower()]
    if not gen:
        report.add("gligen", "missing", f"{gdir}/*.pth absent — tasks A/C off")
        return None
    if clip_tok is None:
        report.add("gligen", "skipped", "clip_tokenizer/ absent")
        return None
    tiny = geometry == "tiny"
    gcfg = gp.GligenConfig.tiny() if tiny else gp.GligenConfig()
    unet_p, vae_p, text_p = gp.load_gligen_checkpoint(str(gen[0]), gcfg)
    inpaint_p = None
    if inp:
        icfg = _dc.replace(gcfg, unet=_dc.replace(gcfg.unet, in_channels=9))
        inpaint_p, _, _ = gp.load_gligen_checkpoint(str(inp[0]), icfg,
                                                    inpaint=True)
    pipe = gp.GligenPipeline(gcfg, unet_p, vae_p, text_p,
                             inpaint_unet_params=inpaint_p,
                             tokenizer=clip_tok)
    system.register_gligen(pipe)
    report.add("gligen", "loaded",
               f"{gen[0].name} -> A"
               + (f"; {inp[0].name} -> C" if inp else " (no inpaint bundle)"))
    return vae_p


def _video_components(w: pathlib.Path, name: str, geometry: str,
                      fallback_vae, report: AssemblyReport):
    """Load (unet_params, unet_cfg, vae_params, vae_cfg, text_params,
    text_cfg) for t2v/ or i2vgen/, or None with the reason reported."""
    import jax

    from vitron_tpu.models.diffusion import clip_text, unet_sd_video, vae
    from vitron_tpu.models.llm import loader

    vdir = w / name
    pths = sorted(p for p in (vdir.glob("*.pth") if vdir.is_dir() else [])
                  if p.name != "vae.pth")
    if not pths:
        report.add(name, "missing", f"{vdir}/*.pth absent")
        return None
    tiny = geometry == "tiny"
    variant = "i2vgen" if name == "i2vgen" else "t2v"
    if tiny:
        ucfg = unet_sd_video.UNetSDVideoConfig.tiny(variant)
    else:
        ucfg = (unet_sd_video.UNetSDVideoConfig.i2vgen_xl()
                if variant == "i2vgen" else unet_sd_video.UNetSDVideoConfig.t2v())
    unet_p = unet_sd_video.convert_torch(
        loader.load_torch_bin(str(pths[0])), ucfg)

    tdir = vdir / "text_encoder"
    tcfg = text_cfg_from_hf(tdir)
    if tcfg is None:
        report.add(name, "skipped",
                   f"{tdir}/ (HF CLIPTextModel) absent — cannot condition")
        return None
    text_p = jax.tree.map(jax.numpy.asarray, clip_text.convert_hf_clip_text(
        _load_state_dir(tdir), tcfg))

    vcfg = vae.VAEConfig.tiny() if tiny else vae.VAEConfig.sd()
    vae_file = vdir / "vae.pth"
    if vae_file.exists():
        vae_p = vae.convert_ldm_vae(loader.load_torch_bin(str(vae_file)), vcfg)
        vae_src = "own vae.pth"
    elif fallback_vae is not None:
        vae_p = fallback_vae
        vae_src = "shared GLIGEN KL-f8 VAE"
    else:
        report.add(name, "skipped",
                   f"{vae_file} absent and no GLIGEN VAE to share")
        return None
    return pths[0].name, unet_p, ucfg, vae_p, vcfg, text_p, tcfg, vae_src


def _register_t2v(system, w, geometry, clip_tok, fallback_vae, report):
    from vitron_tpu.models.diffusion import video_pipelines as vp

    if clip_tok is None:
        if (w / "t2v").is_dir():
            report.add("t2v", "skipped", "clip_tokenizer/ absent")
        return
    parts = _video_components(w, "t2v", geometry, fallback_vae, report)
    if parts is None:
        return
    fname, unet_p, ucfg, vae_p, vcfg, text_p, tcfg, vae_src = parts
    tiny = geometry == "tiny"
    cfg = (vp.Text2VideoConfig.tiny(unet=ucfg, vae=vcfg, text=tcfg)
           if tiny else vp.Text2VideoConfig(unet=ucfg, vae=vcfg, text=tcfg))
    system.register_text2video(vp.Text2VideoPipeline(
        cfg, unet_p, vae_p, text_p, tokenizer=clip_tok))
    report.add("t2v", "loaded", f"{fname} -> D ({vae_src})")


def _register_i2vgen(system, w, geometry, clip_tok, fallback_vae, report):
    from vitron_tpu.models.diffusion import video_pipelines as vp

    if clip_tok is None:
        if (w / "i2vgen").is_dir():
            report.add("i2vgen", "skipped", "clip_tokenizer/ absent")
        return
    parts = _video_components(w, "i2vgen", geometry, fallback_vae, report)
    if parts is None:
        return
    fname, unet_p, ucfg, vae_p, vcfg, text_p, tcfg, vae_src = parts
    tiny = geometry == "tiny"
    cfg = (vp.Image2VideoConfig.tiny(unet=ucfg, vae=vcfg, text=tcfg)
           if tiny else vp.Image2VideoConfig(unet=ucfg, vae=vcfg, text=tcfg))
    # global CLIP visual embedding defaults to zeros (pipeline docstring);
    # installing a visual embedder is a deployment extension point
    system.register_image2video(vp.Image2VideoPipeline(
        cfg, unet_p, vae_p, text_p, tokenizer=clip_tok))
    report.add("i2vgen", "loaded", f"{fname} -> G ({vae_src})")


def _register_stablevideo(system, w: pathlib.Path, geometry: str, clip_tok,
                          report: AssemblyReport) -> None:
    import jax

    from vitron_tpu.models.diffusion import (clip_text, controlnet, depth,
                                             stablevideo, unet2d, vae)
    from vitron_tpu.models.llm import loader

    svdir = w / "stablevideo"
    canny = svdir / "control_sd15_canny.pth"
    store = NLAAtlasStore(svdir)
    if not canny.exists():
        report.add("stablevideo", "missing" if not store.videos else "skipped",
                   f"{canny.name} absent — task F off"
                   + (f" ({len(store.videos)} NLA atlases present)"
                      if store.videos else ""))
        return
    if clip_tok is None:
        report.add("stablevideo", "skipped", "clip_tokenizer/ absent")
        return
    tiny = geometry == "tiny"
    # the ControlLDM bundle carries UNet + ControlNet + VAE + text encoder
    # (reference cldm/model.py load; StableVideo/app.py:50-66)
    sd = loader.load_torch_bin(str(canny))
    ucfg = unet2d.UNetConfig.tiny() if tiny else unet2d.UNetConfig.sd_v1()
    vcfg = vae.VAEConfig.tiny() if tiny else vae.VAEConfig.sd()
    tcfg = (clip_text.TextConfig.tiny(hidden_size=ucfg.context_dim,
                                      num_heads=2, intermediate_size=32)
            if tiny else clip_text.TextConfig())
    unet_p = unet2d.convert_ldm_unet(sd, ucfg)
    ctrl_p = controlnet.convert_torch(sd, ucfg)
    vae_p = vae.convert_ldm_vae(sd, vcfg)
    text_p = clip_text.convert_hf_clip_text(sd, tcfg)
    kw: Dict[str, Any] = {}
    detail = [f"{canny.name}"]
    dep = svdir / "control_sd15_depth.pth"
    if dep.exists():
        kw["depth_control_params"] = controlnet.convert_torch(
            loader.load_torch_bin(str(dep)), ucfg)
        detail.append(dep.name)
    dpt = sorted(svdir.glob("dpt_hybrid*.pt"))
    if dpt and not tiny:
        dcfg = depth.DPTConfig.dpt_hybrid()
        kw["depth_annotator"] = (
            depth.convert_midas_torch(loader.load_torch_bin(str(dpt[0])),
                                      dcfg), dcfg)
        detail.append(dpt[0].name)
    editor = stablevideo.StableVideoEditor(
        ucfg, unet_p, ctrl_p, vcfg, vae_p, tcfg, text_p,
        tokenizer=clip_tok, **kw)
    # atlas evaluation resolution = the editor's native edit size (the
    # background atlas IS the image edit_image denoises; SD works at 512²,
    # the tiny dry-run UNet at 32²) — an oversized atlas would put the
    # 20-step DDIM at a quadratically larger attention size
    store.atlas_res = 32 if tiny else 512
    store._cache.clear()
    if not store.videos:
        report.add("stablevideo", "skipped",
                   "editor weights present but no <video>/checkpoint NLA "
                   "atlases")
        return
    system.register_video_editor(editor, atlas_provider=store.provider())
    report.add("stablevideo", "loaded",
               f"{'+'.join(detail)} + atlases {store.videos} -> F")


def _apply_mesh(system, mesh, report: AssemblyReport) -> None:
    system.serving_mesh = None
    if mesh is None:
        return
    from vitron_tpu.runtime.sharded_serving import (install_mesh,
                                                    resolve_serving_mesh)

    resolved = resolve_serving_mesh(mesh)
    if resolved is not None:
        install_mesh(system, resolved)
        report.add("mesh", "loaded",
                   "LLM sharded over "
                   f"{dict(zip(resolved.axis_names, resolved.devices.shape))}")
    else:
        report.add("mesh", "skipped", "single device — replicated")


def build_mllm_system(
    base_model: str,
    lora: Optional[str] = None,
    clip_tower: Optional[str] = None,
    video_tower: Optional[str] = None,
    geometry: str = "real",
    quantize: str = "",
    mesh: Any = None,
    allow_random_towers: bool = False,
    seed: int = 0,
) -> Tuple[Any, AssemblyReport]:
    """Chat-only assembly from explicit checkpoint paths (the reference
    inference_image.py/builder.py load: base + LoRA + towers + adapters).
    Used by `vitron-cli --base-model`; refuses to ship random-init vision
    towers unless allow_random_towers (a base-model-only run would silently
    answer garbage to every image question — the r4 CLI bug)."""
    from vitron_tpu.runtime.engine import VitronEngine
    from vitron_tpu.runtime.system import VitronSystem

    report = AssemblyReport()
    missing = pathlib.Path("/nonexistent")
    params, cfg, tokenizer = _load_mllm(
        pathlib.Path(base_model),
        pathlib.Path(lora) if lora else missing,
        pathlib.Path(clip_tower) if clip_tower else missing,
        pathlib.Path(video_tower) if video_tower else missing,
        geometry, quantize, seed, allow_random_towers, report)
    system = VitronSystem(VitronEngine(params, cfg, tokenizer))
    _apply_mesh(system, mesh, report)
    return system, report


def build_system_from_weights(
    weights_dir: str,
    geometry: str = "real",
    quantize: str = "",
    mesh: Any = None,
    allow_random_towers: bool = False,
    seed: int = 0,
) -> Tuple[Any, AssemblyReport]:
    """Weights dir -> (fully-registered VitronSystem, AssemblyReport).

    geometry: "real" expects released-checkpoint shapes; "tiny" the
    synthetic dry-run shapes (tests/synthetic_weights.py). quantize:
    ""/"int8"/"int4" weight-only LLM quantization. mesh: None for
    single-chip, "auto" to build a serving mesh when jax.device_count()>1,
    or an existing jax.sharding.Mesh — LLM params are GSPMD-sharded
    (fsdp x tensor, llama.LLAMA_SHARDING_RULES) and everything else stays
    replicated per the MemoryPlan.
    """
    from vitron_tpu.runtime.engine import VitronEngine
    from vitron_tpu.runtime.system import VitronSystem

    w = pathlib.Path(weights_dir)
    if not w.is_dir():
        raise MissingWeightsError(f"weights dir {w} does not exist")
    report = AssemblyReport()

    params, cfg, tokenizer = _load_mllm(
        w / "vicuna-7b", w / "vitron_lora", w / "clip_vit_l14",
        w / "languagebind_video", geometry, quantize, seed,
        allow_random_towers, report)
    engine = VitronEngine(params, cfg, tokenizer)
    system = VitronSystem(engine)
    _apply_mesh(system, mesh, report)

    clip_tok = _clip_tokenizer(w)
    report.add("clip_tokenizer", "loaded" if clip_tok is not None else "missing",
               "" if clip_tok is not None else
               "clip_tokenizer/ absent — SEEM/GLIGEN/video backends skipped")

    _register_seem(system, w, geometry, clip_tok, report)
    shared_vae = _register_gligen(system, w, geometry, clip_tok, report)
    _register_t2v(system, w, geometry, clip_tok, shared_vae, report)
    _register_i2vgen(system, w, geometry, clip_tok, shared_vae, report)
    _register_stablevideo(system, w, geometry, clip_tok, report)
    return system, report

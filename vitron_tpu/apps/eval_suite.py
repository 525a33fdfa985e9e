"""Eval suite: run the five BASELINE measurable configs end-to-end.

BASELINE.md lists the workloads the rebuild must cover: (1) single-image
QA, (2) 8-frame video understanding, (3) SEEM segmentation/tracking,
(4) GLIGEN grounded generation/editing, (5) i2vgen + StableVideo
multi-backend orchestration. This script exercises each through the public
APIs and prints one JSON report — with --demo it uses small random-weight
models (pipeline validation without checkpoints, seconds on CPU), with
real checkpoint paths it becomes the acceptance run.

Usage:
  python -m vitron_tpu.apps.eval_suite --demo --cpu
"""
from __future__ import annotations

import argparse
import json
import os
import time
from typing import Any, Dict


def _timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 2)


def run_demo_suite(seed: int = 0) -> Dict[str, Any]:
    import jax
    import jax.numpy as jnp
    import numpy as np

    report: Dict[str, Any] = {}
    rs = np.random.RandomState(seed)

    # ---- (1) single-image QA ------------------------------------------
    from vitron_tpu.models import vitron_model
    from vitron_tpu.runtime.engine import VitronEngine
    from vitron_tpu.runtime.generation import SamplingConfig
    from vitron_tpu.runtime.system import VitronSystem

    class Tok:
        bos_token_id, eos_token_id = 1, 2

        def __call__(self, s):
            class R:
                pass

            r = R()
            r.input_ids = [1] + [abs(hash(w)) % 200 + 10 for w in s.split()]
            return r

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(str(t) for t in ids)

    cfg = vitron_model.VitronConfig.tiny()
    params = vitron_model.init_params(jax.random.PRNGKey(seed), cfg)
    system = VitronSystem(VitronEngine(params, cfg, Tok()))
    img = rs.randint(0, 255, (64, 64, 3), np.uint8)
    out, dt = _timed(lambda: system.chat(
        "what is in this image?", image=img,
        sampling=SamplingConfig(greedy=True, max_new_tokens=8, eos_ids=())))
    report["1_image_qa"] = {"status": out["status"],
                            "tokens": len(out["reply"]["raw"].split()),
                            "seconds": dt}

    # ---- (2) 8-frame video understanding -------------------------------
    vid = rs.randint(0, 255, (8, 64, 64, 3), np.uint8)
    out, dt = _timed(lambda: system.chat(
        "what happens in this video?", video=vid,
        sampling=SamplingConfig(greedy=True, max_new_tokens=8, eos_ids=())))
    report["2_video_qa"] = {"status": out["status"], "seconds": dt}

    # ---- (3) SEEM segmentation + tracking ------------------------------
    from vitron_tpu.models.seem import decoder as seem_dec
    from vitron_tpu.models.seem import model as seem_model

    scfg = seem_model.SeemConfig.tiny()
    sparams = seem_model.init_params(jax.random.PRNGKey(seed + 1), scfg)
    stroke = np.zeros((64, 64), bool)
    stroke[16:48, 16:48] = True
    pts, valid = seem_dec.sample_stroke_points(
        stroke, scfg.decoder.max_spatial_len, rs)

    def seg():
        m, _ = seem_model.segment_stroke(
            sparams, scfg, jnp.asarray(img), jnp.asarray(pts), jnp.asarray(valid))
        return np.asarray(seem_model.upsample_mask(m, (64, 64)))

    mask, dt = _timed(seg)
    frames = jnp.asarray(np.stack([np.roll(img, s_, axis=1) for s_ in (0, 4, 8)]))
    masks, dt2 = _timed(lambda: np.asarray(seem_model.track_video(
        sparams, scfg, frames, jnp.asarray(img), jnp.asarray(pts), jnp.asarray(valid))))
    report["3_seem"] = {"mask_pixels": int(mask.sum()),
                        "tracked_frames": int(masks.shape[0]),
                        "seg_seconds": dt, "track_seconds": dt2}

    # ---- (4) GLIGEN grounded generation + inpainting --------------------
    from vitron_tpu.models.diffusion import clip_text, gligen_pipeline as gp
    from vitron_tpu.models.diffusion import unet2d, vae

    class TTok:
        def __call__(self, texts, padding=None, max_length=16, truncation=True,
                     return_tensors="np"):
            out = np.zeros((len(texts), max_length), np.int64)
            for i, t in enumerate(texts):
                ids = [49] + [abs(hash(w)) % 100 + 2 for w in t.split()][:14] + [127]
                out[i, : len(ids)] = ids
            return {"input_ids": out}

    gcfg = gp.GligenConfig.tiny(steps=4)
    ks = jax.random.split(jax.random.PRNGKey(seed + 2), 3)
    pipe = gp.GligenPipeline(
        gcfg, unet2d.init_params(ks[0], gcfg.unet),
        vae.init_params(ks[1], gcfg.vae),
        clip_text.init_params(ks[2], gcfg.text), tokenizer=TTok())
    gen, dt = _timed(lambda: np.asarray(pipe.generate(
        "a red cube", [[0.2, 0.2, 0.7, 0.7]], ["red cube"],
        rng=jax.random.PRNGKey(seed), steps=4)))
    report["4_gligen"] = {"image": list(gen.shape), "seconds": dt}

    # ---- (5) video generation + atlas editing ---------------------------
    from vitron_tpu.models.diffusion import stablevideo as sv
    from vitron_tpu.models.diffusion import unet_sd_video
    from vitron_tpu.models.diffusion import video_pipelines as vp

    tcfg = vp.Text2VideoConfig.tiny()
    ks = jax.random.split(jax.random.PRNGKey(seed + 3), 3)
    t2v = vp.Text2VideoPipeline(
        tcfg, unet_sd_video.init_params(ks[0], tcfg.unet),
        vae.init_params(ks[1], tcfg.vae),
        clip_text.init_params(ks[2], tcfg.text), tokenizer=TTok())
    vidgen, dt = _timed(lambda: np.asarray(t2v.generate(
        "a dog running", rng=jax.random.PRNGKey(seed), steps=4)))

    fg = jnp.asarray(rs.rand(16, 16, 3).astype(np.float32))
    bg = jnp.asarray(rs.rand(16, 16, 3).astype(np.float32))
    ys = np.linspace(-1, 1, 8)
    gy, gx = np.meshgrid(ys, ys, indexing="ij")
    uv = jnp.asarray(np.broadcast_to(np.stack([gx, gy], -1), (4, 8, 8, 2)).astype(np.float32))
    rendered, dt2 = _timed(lambda: np.asarray(sv.render_frames(
        fg, bg, uv, uv, jnp.full((4, 8, 8, 1), 0.6))))
    report["5_video_gen_edit"] = {"t2v_frames": list(vidgen.shape),
                                  "t2v_seconds": dt,
                                  "atlas_render_frames": int(rendered.shape[0]),
                                  "render_seconds": dt2}
    return report


def _sha16(arr) -> str:
    import hashlib

    import numpy as np

    return hashlib.sha256(np.ascontiguousarray(arr).tobytes()).hexdigest()[:16]


def _llama_cfg_from_hf(base):
    """LlamaConfig from an HF checkpoint dir's config.json (shared with the
    production assembly, runtime/assembly.py)."""
    from vitron_tpu.runtime.assembly import llama_cfg_from_hf

    return llama_cfg_from_hf(base)


def _vit_cfg_from_hf(clip_dir):
    """ViTConfig from an HF CLIP dir's config.json (None when absent)."""
    from vitron_tpu.runtime.assembly import vit_cfg_from_hf

    return vit_cfg_from_hf(clip_dir)


ACCEPTANCE_MANIFEST = """\
Checkpoint manifest — every weight file the reference application loads
(reference file:line in parens), its expected location under --weights,
and the acceptance task run on it:

  vicuna-7b/            HF llama dir (builder.py:54-57)        -> image QA reply hash
  vitron_lora/          peft adapter + non_lora_trainables     -> merged into the QA run
                        (builder.py:63-86)
  clip_vit_l14/         HF CLIP vision tower (builder.py:149)  -> image tower for the QA run
  languagebind_video/   LanguageBind video tower w/ temporal
                        attn (languagebind/video)              -> 8-frame encode hash
  seem_focall_v1.pt     SEEM FocalNet-L (demo_code/app.py:37)  -> text-referred mask hash
  gligen/*.pth          GLIGEN generation bundle
                        (demo/app.py:67-80)                    -> one grounded UNet step
  gligen/*inpaint*.pth  GLIGEN inpainting bundle
                        (demo/app.py:81-91)                    -> one 9-channel UNet step
  stablevideo/<name>/   NLA atlas checkpoint + config.json
                        (atlas_utils.py:75-80)                 -> UV eval + render hash
  i2vgen/*.pth          UNetSD_I2VGen (app.py:324 equivalent)  -> one v-pred DDIM step hash
  t2v/*.pth             UNetSD_T2VBase / ZeroScope
                        (app.py:228 equivalent)                -> one v-pred DDIM step hash
                        (on CPU acceptance hosts the real-geometry step is
                        skipped — multi-minute forward — unless
                        VITRON_ACCEPT_FORWARD=1)

Every row present on disk must end `pass: true`; missing rows report
`status: missing` (skipped, pass: null). Exit code 1 if any present row
fails. `--geometry tiny` runs the same pipeline against synthetic tiny
checkpoints (tests/synthetic_weights.py builds them) for a dry run.

The SERVING assembly (runtime/assembly.build_system_from_weights,
`vitron-serve --weights`) reads the same layout plus optional rows:

  clip_tokenizer/       HF CLIP tokenizer (SEEM language + diffusion text)
  t2v/vae.pth           ldm AutoencoderKL (else the GLIGEN VAE is shared)
  t2v/text_encoder/     HF CLIPTextModel dir (open-clip ViT-H text)
  i2vgen/vae.pth, i2vgen/text_encoder/    same for image-to-video
  stablevideo/control_sd15_canny.pth      ControlLDM bundle -> task F
  stablevideo/control_sd15_depth.pth      depth ControlNet arm
  stablevideo/dpt_hybrid*.pt              MiDaS depth annotator
"""


def run_acceptance_suite(weights: str, seed: int = 0,
                         image_path: str = None,
                         geometry: str = "real") -> Dict[str, Any]:
    """Checkpoint-backed acceptance run (the reference's equivalent is
    manually running inference_image.py + the app example tabs). See
    ACCEPTANCE_MANIFEST for the weights-dir layout; docs/API.md documents
    the one-command flow. Every present component is loaded through the
    SAME converters the demos use, run on a small deterministic workload,
    and reported with a sha256 prefix of its output — the acceptance hash
    to pin per weights release — plus a pass verdict.

    geometry: "real" expects released-checkpoint shapes (SeemConfig(),
    GligenConfig(), UNetSDVideoConfig.t2v()/i2vgen_xl()); "tiny" expects
    the synthetic dry-run shapes tests/synthetic_weights.py writes. The
    llama/CLIP rows read their geometry from the HF config files either
    way."""
    import pathlib
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    tiny = geometry == "tiny"
    w = pathlib.Path(weights)
    report: Dict[str, Any] = {"weights_dir": str(w), "geometry": geometry}
    rs = np.random.RandomState(seed)

    def _row(key: str, present: bool, expected: str, fn) -> None:
        """Run one manifest row: missing -> skipped, exception -> failed,
        normal return (a dict) -> passed."""
        if not present:
            report[key] = {"status": "missing", "expected": expected,
                           "pass": None}
            return
        try:
            out = fn()
            report[key] = {**out, "pass": bool(out.get("pass", True))}
        except Exception as e:  # a present checkpoint that fails = red row
            report[key] = {"pass": False,
                           "error": f"{type(e).__name__}: {e}"}
    if image_path:
        from vitron_tpu.media.preprocess import load_image

        image = np.asarray(load_image(image_path))
    else:
        image = rs.randint(0, 255, (480, 640, 3), np.uint8)

    # ---- MLLM: base (+LoRA) + towers + projector/region adapters --------
    base = w / "vicuna-7b"

    def _row_image_qa():
        import transformers

        from vitron_tpu.models import vitron_model
        from vitron_tpu.models.llm import loader
        from vitron_tpu.models.vision import loader as vloader
        from vitron_tpu.models.vision import projector, region_extractor
        from vitron_tpu.runtime.engine import VitronEngine
        from vitron_tpu.runtime.generation import SamplingConfig
        from vitron_tpu.runtime.system import VitronSystem

        t0 = time.perf_counter()
        import dataclasses as _dc

        llm_cfg = _llama_cfg_from_hf(base)
        tower_cfg = _vit_cfg_from_hf(w / "clip_vit_l14")
        cfg = vitron_model.VitronConfig(llm=llm_cfg, **(
            {"image_tower": tower_cfg,
             "video_tower": _dc.replace(tower_cfg, add_time_attn=True)}
            if tower_cfg else {}))
        lora = w / "vitron_lora"
        params = vitron_model.init_params(jax.random.PRNGKey(seed), cfg)
        params["llm"] = jax.tree.map(jnp.asarray, loader.load_pretrained_llama(
            str(base), llm_cfg, lora_path=str(lora) if lora.is_dir() else None))
        clip_dir = w / "clip_vit_l14"
        if clip_dir.is_dir():
            sd = loader.load_safetensors_dir(str(clip_dir))
            if not sd:
                for f in sorted(clip_dir.glob("*.bin")):
                    sd.update(loader.load_torch_bin(str(f)))
            params["image_tower"] = jax.tree.map(
                jnp.asarray, vloader.convert_hf_clip_vision(sd, cfg.image_tower))
        # adapter-only weights (reference non_lora_trainables.bin,
        # builder.py:63-79)
        if lora.is_dir():
            nl = {}
            for f in lora.glob("non_lora_trainables.bin"):
                nl.update(loader.load_torch_bin(str(f)))
            for f in lora.glob("non_lora_trainables.npz"):
                nl.update(dict(np.load(str(f))))
            if nl:
                if any("mm_projector" in k for k in nl):
                    params["projector"] = jax.tree.map(
                        jnp.asarray, projector.convert_hf(nl))
                if any("region_extractor" in k for k in nl):
                    params["region"] = jax.tree.map(
                        jnp.asarray, region_extractor.convert_hf(nl))
        tokenizer = transformers.AutoTokenizer.from_pretrained(str(base))
        system = VitronSystem(VitronEngine(params, cfg, tokenizer))
        out, dt = _timed(lambda: system.chat(
            "What is in this image?", image=image,
            sampling=SamplingConfig(greedy=True, max_new_tokens=32),
            rng=jax.random.PRNGKey(seed)))
        return {
            "load_seconds": round(time.perf_counter() - t0 - dt, 1),
            "seconds": dt,
            "reply": out["reply"]["raw"][:200],
            # a trained checkpoint must produce text; synthetic tiny random
            # weights may greedy-decode straight into a stop separator
            "pass": len(out["reply"]["raw"]) > 0 if not tiny else True,
            "reply_sha16": _sha16(np.frombuffer(
                out["reply"]["raw"].encode(), np.uint8)),
        }

    _row("1_image_qa", base.is_dir(), str(base), _row_image_qa)

    # ---- LanguageBind video tower ----------------------------------------
    lbv = w / "languagebind_video"

    def _row_video_tower():
        from vitron_tpu.models.llm import loader
        from vitron_tpu.models.vision import loader as vloader
        from vitron_tpu.models.vision import vit

        tcfg = _vit_cfg_from_hf(lbv)
        import dataclasses as _dc

        tcfg = _dc.replace(tcfg, add_time_attn=True)
        sd = loader.load_safetensors_dir(str(lbv))
        if not sd:
            for f in sorted(lbv.glob("*.bin")):
                sd.update(loader.load_torch_bin(str(f)))
        vp = jax.tree.map(jnp.asarray, vloader.convert_hf_clip_vision(sd, tcfg))
        frames = jnp.asarray(rs.rand(
            1, tcfg.num_frames, tcfg.image_size, tcfg.image_size, 3),
            jnp.float32)
        feats, dt = _timed(lambda: np.asarray(
            vit.forward_video_features(vp, tcfg, frames)))
        return {"seconds": dt, "pass": bool(np.isfinite(feats).all()),
                "feat_sha16": _sha16(np.asarray(feats, np.float32))}

    _row("2_languagebind_video", lbv.is_dir(), str(lbv), _row_video_tower)

    # ---- SEEM ------------------------------------------------------------
    seem_pt = w / "seem_focall_v1.pt"

    def _row_seem():
        import transformers

        from vitron_tpu.models.llm import loader
        from vitron_tpu.models.seem import language as seem_lang
        from vitron_tpu.models.seem import model as seem_model

        sd = loader.load_torch_bin(str(seem_pt))
        scfg = seem_model.SeemConfig.tiny() if tiny else seem_model.SeemConfig()
        sp = jax.tree.map(jnp.asarray, seem_model.convert_torch(sd, scfg))
        size = scfg.input_size
        img = jnp.asarray(jax.image.resize(
            jnp.asarray(image, jnp.float32), (size, size, 3), "linear"),
            jnp.uint8)
        if (w / "clip_tokenizer").is_dir():
            # AutoTokenizer, matching the serving assembly: handles both
            # the slow (vocab.json+merges.txt) and fast (tokenizer.json)
            # on-disk formats; CLIPTokenizer alone crashes on fast-only dirs
            tok = transformers.AutoTokenizer.from_pretrained(
                str(w / "clip_tokenizer"))
            ids = seem_lang.tokenize(tok, ["the main object"],
                                     scfg.lang.context_length)
        else:
            # no tokenizer dir: deterministic synthetic token ids still
            # exercise the language encoder + decoder end-to-end
            ids = np.zeros((1, scfg.lang.context_length), np.int64)
            ids[0, :6] = [49, 12, 33, 7, 21, 120]
        mask_tok = (np.asarray(ids) != 0).astype(np.int64)
        mask, dt = _timed(lambda: np.asarray(seem_model.segment_text(
            sp, scfg, img, jnp.asarray(ids), jnp.asarray(mask_tok))[0]))
        return {"seconds": dt, "pass": bool(np.isfinite(mask).all()),
                "mask_sha16": _sha16(mask > 0)}

    _row("3_seem_text_seg", seem_pt.exists(), str(seem_pt), _row_seem)

    # ---- GLIGEN gen + inpaint ---------------------------------------------
    gdir = w / "gligen"
    gpth = sorted(gdir.glob("*.pth")) if gdir.is_dir() else []
    gen_pths = [p for p in gpth if "inpaint" not in p.name.lower()]
    inp_pths = [p for p in gpth if "inpaint" in p.name.lower()]

    def _gligen_row(path, inpaint: bool):
        import dataclasses as _dc

        from vitron_tpu.models.diffusion import gligen_pipeline as gp
        from vitron_tpu.models.diffusion import unet2d

        gcfg = gp.GligenConfig.tiny() if tiny else gp.GligenConfig()
        if inpaint:
            gcfg = _dc.replace(gcfg, unet=_dc.replace(gcfg.unet, in_channels=9))
        bundle, dt = _timed(lambda: gp.load_gligen_checkpoint(
            str(path), gcfg, inpaint=inpaint))
        unet_params = bundle[0] if isinstance(bundle, tuple) else bundle["unet"]
        lat = 16 if tiny else 64
        x = jnp.asarray(rs.randn(1, lat, lat, gcfg.unet.in_channels),
                        jnp.float32)
        ctx = jnp.asarray(rs.randn(1, 4, gcfg.unet.context_dim) * 0.02,
                          jnp.float32)
        objs = jnp.asarray(rs.randn(1, 4, gcfg.unet.context_dim) * 0.02,
                           jnp.float32)
        eps, fdt = _timed(lambda: np.asarray(unet2d.forward(
            unet_params, gcfg.unet, x, jnp.full((1,), 5.0), ctx, objs=objs)))
        return {"load_seconds": dt, "step_seconds": fdt,
                "pass": bool(np.isfinite(eps).all()),
                "eps_sha16": _sha16(np.asarray(eps, np.float32))}

    _row("4_gligen_gen", bool(gen_pths), str(gdir / "*.pth"),
         lambda: _gligen_row(gen_pths[0], False))
    _row("4_gligen_inpaint", bool(inp_pths), str(gdir / "*inpaint*.pth"),
         lambda: _gligen_row(inp_pths[0], True))

    # ---- StableVideo NLA atlases -------------------------------------------
    svdir = w / "stablevideo"
    nla_dirs = sorted(d for d in (svdir.iterdir() if svdir.is_dir() else [])
                      if (d / "checkpoint").exists())

    def _row_nla():
        import torch

        from vitron_tpu.models.diffusion import stablevideo as sv

        ckpt = torch.load(str(nla_dirs[0] / "checkpoint"),
                          map_location="cpu", weights_only=False)
        # IMLP geometries are fixed by the NLA release
        # (atlas_utils.py:26-72): mappings 3->2 no-positional 6/4 layers,
        # atlas 2->3 pos10 8 layers skip(4,7), alpha 3->1 pos5 8 layers
        cfgs = {
            "fg": sv.IMLPConfig(input_dim=3, output_dim=2, num_layers=6,
                                positional_dim=0, skip_layers=()),
            "bg": sv.IMLPConfig(input_dim=3, output_dim=2, num_layers=4,
                                positional_dim=0, skip_layers=()),
            "alpha": sv.IMLPConfig(input_dim=3, output_dim=1, num_layers=8,
                                   positional_dim=5, skip_layers=()),
        }
        atlas_cfg = sv.IMLPConfig(input_dim=2, output_dim=3, num_layers=8,
                                  positional_dim=10, skip_layers=(4, 7))
        fg = sv.convert_imlp_torch(ckpt["model_F_mapping1_state_dict"])
        bg = sv.convert_imlp_torch(ckpt["model_F_mapping2_state_dict"])
        alpha = sv.convert_imlp_torch(ckpt["model_F_alpha_state_dict"])
        atlas = sv.convert_imlp_torch(ckpt["F_atlas_state_dict"])
        svcfg = {}
        if (nla_dirs[0] / "config.json").exists():
            svcfg = json.loads((nla_dirs[0] / "config.json").read_text())
        t_frames, hh, ww = 2, 24, 24
        (fg_uv, bg_uv, a), dt = _timed(lambda: jax.tree.map(
            np.asarray, sv.atlas_uvs(
                fg, bg, alpha, cfgs, t_frames, hh, ww,
                max_frames=svcfg.get("maximum_number_of_frames", t_frames))))
        # evaluate the atlas colors on a small grid and render
        gy, gx = np.meshgrid(np.linspace(-1, 1, 16), np.linspace(-1, 1, 16),
                             indexing="ij")
        pts = jnp.asarray(np.stack([gx, gy], -1), jnp.float32)
        colors = 0.5 * (np.asarray(sv.imlp_forward(atlas, atlas_cfg, pts)) + 1)
        frames = np.asarray(sv.render_frames(
            jnp.asarray(colors), jnp.asarray(colors), jnp.asarray(fg_uv),
            jnp.asarray(bg_uv), jnp.asarray(a)))
        ok = bool(np.isfinite(frames).all() and np.isfinite(colors).all())
        return {"seconds": dt, "video": nla_dirs[0].name, "pass": ok,
                "render_sha16": _sha16(np.asarray(frames, np.float32))}

    _row("5_stablevideo_nla", bool(nla_dirs), str(svdir / "<name>/checkpoint"),
         _row_nla)

    # ---- video UNets (converter-level acceptance) --------------------------
    from vitron_tpu.models.diffusion import unet_sd_video

    for name, variant in (("i2vgen", "i2vgen"), ("t2v", "t2v")):
        vdir = w / name
        pths = sorted(vdir.glob("*.pth")) if vdir.is_dir() else []

        def _row_unet(pths=pths, variant=variant):
            from vitron_tpu.models.llm import loader

            sd = loader.load_torch_bin(str(pths[0]))
            if tiny:
                vcfg = unet_sd_video.UNetSDVideoConfig.tiny(variant)
            else:
                vcfg = (unet_sd_video.UNetSDVideoConfig.i2vgen_xl()
                        if variant == "i2vgen"
                        else unet_sd_video.UNetSDVideoConfig.t2v())
            vp, dt = _timed(lambda: unet_sd_video.convert_torch(sd, vcfg))
            n_params = sum(int(np.prod(np.shape(x)))
                           for x in jax.tree.leaves(vp))
            out = {"load_seconds": dt, "params": n_params, "pass": n_params > 0}
            # One v-pred DDIM denoise step with an output hash, so the row is
            # evidence the converted weights RUN, not just that they loaded —
            # matching the rigor of the SEEM/GLIGEN rows. Always at tiny
            # geometry; at real geometry whenever an accelerator is attached
            # (a real-geometry forward on the CPU acceptance host is
            # multi-minute, so CPU keeps converter-only + a 'skipped' note;
            # VITRON_ACCEPT_FORWARD=1 forces it anywhere).
            run_fwd = (tiny or jax.default_backend() != "cpu"
                       or os.environ.get("VITRON_ACCEPT_FORWARD") == "1")
            if not run_fwd:
                out["step"] = "skipped (CPU host; parity suite covers numerics)"
                return out
            if tiny:
                f, lh, lw = 2, 8, 8
                y = jnp.asarray(rs.randn(1, 3, 1024) * 0.02, jnp.float32)
            else:  # deployed latent geometry (video_pipelines.py defaults)
                f, lh, lw = (16, 32, 32) if variant == "i2vgen" else (24, 40, 72)
                y = jnp.asarray(rs.randn(1, 77, 1024) * 0.02, jnp.float32)
            x = jnp.asarray(rs.randn(1, f, lh, lw, 4), jnp.float32)
            kw = {}
            if variant == "i2vgen":
                kw = dict(image=jnp.zeros((1, vcfg.y_dim), jnp.float32),
                          local_image=jnp.zeros((1, lh, lw, 4), jnp.float32),
                          fps=jnp.asarray([8.0]))
            v_hat = unet_sd_video.forward(vp, vcfg, x, jnp.asarray([981.0]),
                                          y=y, **kw)
            # v-pred DDIM update (samplers.ddim_sample_v step math): one step
            # 981 -> 961 on the pipeline's zero-terminal-SNR cosine schedule
            # (video_pipelines._schedule)
            from vitron_tpu.models.diffusion import samplers

            sched = samplers.DiffusionSchedule.create(
                "cosine", 1000, zero_terminal_snr=True)
            ac = np.asarray(sched.alphas_cumprod, np.float64)
            a_t, a_prev = float(ac[981]), float(ac[961])
            v32 = np.asarray(v_hat, np.float32)
            x32 = np.asarray(x, np.float32)
            x0 = np.sqrt(a_t) * x32 - np.sqrt(1 - a_t) * v32
            eps = np.sqrt(a_t) * v32 + np.sqrt(1 - a_t) * x32
            x_prev = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * eps
            out["pass"] = bool(np.isfinite(x_prev).all())
            out["step_geometry"] = [1, f, lh, lw, 4]
            out["step_sha16"] = _sha16(np.asarray(x_prev, np.float32))
            return out

        _row(f"6_{name}_unet", bool(pths), str(vdir / "*.pth"), _row_unet)

    failures = [k for k, v in report.items()
                if isinstance(v, dict) and v.get("pass") is False]
    report["all_present_pass"] = not failures
    report["failed_rows"] = failures
    return report


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Vitron-TPU eval suite")
    p.add_argument("--demo", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--weights", help="weights dir for the acceptance run "
                                     "(see ACCEPTANCE_MANIFEST)")
    p.add_argument("--image", help="example image for the acceptance run")
    p.add_argument("--geometry", choices=("real", "tiny"), default="real",
                   help="checkpoint geometry: real released shapes, or the "
                        "tiny synthetic dry-run shapes "
                        "(tests/synthetic_weights.py)")
    p.add_argument("--manifest", action="store_true",
                   help="print the checkpoint manifest and exit")
    args = p.parse_args(argv)
    if args.manifest:
        print(ACCEPTANCE_MANIFEST)
        return 0
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if not args.demo and not args.weights:
        print("provide --weights DIR for the acceptance run, or --demo")
        return 2
    if args.demo:
        report = run_demo_suite(args.seed)
        print(json.dumps(report, indent=2))
        return 0
    report = run_acceptance_suite(args.weights, args.seed, args.image,
                                  geometry=args.geometry)
    print(json.dumps(report, indent=2))
    # unattended pass/fail table: one line per manifest row
    print(f"\n{'row':24s} verdict")
    for k, v in report.items():
        if not isinstance(v, dict) or "pass" not in v:
            continue
        verdict = ("SKIP (missing)" if v["pass"] is None
                   else "PASS" if v["pass"] else f"FAIL {v.get('error', '')}")
        print(f"{k:24s} {verdict}")
    return 0 if report.get("all_present_pass", False) else 1


if __name__ == "__main__":
    import sys

    sys.exit(main())

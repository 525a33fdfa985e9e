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
    """LlamaConfig from an HF checkpoint dir's config.json."""
    import json as _json

    from vitron_tpu.models.llm import llama

    cfg_file = base / "config.json"
    if not cfg_file.exists():
        return llama.LlamaConfig.vicuna_7b()
    c = _json.loads(cfg_file.read_text())
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


def _vit_cfg_from_hf(clip_dir):
    """ViTConfig from an HF CLIP dir's config.json (None when absent)."""
    import json as _json

    from vitron_tpu.models.vision import vit

    cfg_file = clip_dir / "config.json"
    if not cfg_file.exists():
        return None
    c = _json.loads(cfg_file.read_text())
    v = c.get("vision_config", c)
    return vit.ViTConfig(
        image_size=v.get("image_size", 224),
        patch_size=v.get("patch_size", 14),
        hidden_size=v.get("hidden_size", 1024),
        num_layers=v.get("num_hidden_layers", 24),
        num_heads=v.get("num_attention_heads", 16),
        intermediate_size=v.get("intermediate_size", 4096))


def run_acceptance_suite(weights: str, seed: int = 0,
                         image_path: str = None) -> Dict[str, Any]:
    """Checkpoint-backed acceptance run (the reference's equivalent is
    manually running inference_image.py + the app example tabs).

    Expected weights-dir layout (every component optional; missing ones are
    reported, not fatal):

        <weights>/vicuna-7b/            HF llama dir (*.safetensors or .bin)
        <weights>/vitron_lora/          adapter_config.json + adapter_model.*
                                        [+ non_lora_trainables.bin|.npz]
        <weights>/clip_vit_l14/         HF CLIP vision checkpoint (.bin/.safetensors)
        <weights>/seem_focall_v1.pt     SEEM FocalNet-L checkpoint
        <weights>/gligen/*.pth          GLIGEN generation checkpoint bundle
        <weights>/i2vgen/*.pth          UNetSD_I2VGen checkpoint
        <weights>/t2v/*.pth             UNetSD_T2VBase checkpoint

    Each present component is loaded through the SAME converters the demos
    use, run on a small deterministic workload, and reported with a sha256
    prefix of its output — the acceptance hash to pin per weights release.
    """
    import pathlib
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    w = pathlib.Path(weights)
    report: Dict[str, Any] = {"weights_dir": str(w)}
    rs = np.random.RandomState(seed)
    if image_path:
        from vitron_tpu.media.preprocess import load_image

        image = np.asarray(load_image(image_path))
    else:
        image = rs.randint(0, 255, (480, 640, 3), np.uint8)

    # ---- MLLM: base (+LoRA) + towers + projector/region adapters --------
    base = w / "vicuna-7b"
    if base.is_dir():
        import transformers

        from vitron_tpu.models import vitron_model
        from vitron_tpu.models.llm import llama, loader
        from vitron_tpu.models.vision import loader as vloader
        from vitron_tpu.models.vision import projector, region_extractor
        from vitron_tpu.runtime.engine import VitronEngine
        from vitron_tpu.runtime.generation import SamplingConfig

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
        from vitron_tpu.runtime.system import VitronSystem

        system = VitronSystem(VitronEngine(params, cfg, tokenizer))
        out, dt = _timed(lambda: system.chat(
            "What is in this image?", image=image,
            sampling=SamplingConfig(greedy=True, max_new_tokens=32),
            rng=jax.random.PRNGKey(seed)))
        report["1_image_qa"] = {
            "load_seconds": round(time.perf_counter() - t0 - dt, 1),
            "seconds": dt,
            "reply": out["reply"]["raw"][:200],
            "reply_sha16": _sha16(np.frombuffer(
                out["reply"]["raw"].encode(), np.uint8)),
        }
    else:
        report["1_image_qa"] = {"status": "missing", "expected": str(base)}

    # ---- SEEM ------------------------------------------------------------
    seem_pt = w / "seem_focall_v1.pt"
    if seem_pt.exists():
        import transformers

        from vitron_tpu.models.llm import loader
        from vitron_tpu.models.seem import language as seem_lang
        from vitron_tpu.models.seem import model as seem_model

        sd = loader.load_torch_bin(str(seem_pt))
        scfg = seem_model.SeemConfig()
        sp = jax.tree.map(jnp.asarray, seem_model.convert_torch(sd, scfg))
        tok = transformers.CLIPTokenizer.from_pretrained(
            str(w / "clip_tokenizer")) if (w / "clip_tokenizer").is_dir() else None
        size = scfg.input_size
        img = jnp.asarray(jax.image.resize(
            jnp.asarray(image, jnp.float32), (size, size, 3), "linear"),
            jnp.uint8)
        if tok is not None:
            ids = seem_lang.tokenize(tok, ["the main object"],
                                     scfg.lang.context_length)
            mask_tok = (np.asarray(ids) != 0).astype(np.int64)
            mask, dt = _timed(lambda: np.asarray(seem_model.segment_text(
                sp, scfg, img, jnp.asarray(ids), jnp.asarray(mask_tok))[0]))
            report["2_seem_text_seg"] = {"seconds": dt,
                                         "mask_sha16": _sha16(mask > 0)}
        else:
            report["2_seem_text_seg"] = {"status": "loaded (no clip_tokenizer dir "
                                                   "for the text query)"}
    else:
        report["2_seem_text_seg"] = {"status": "missing", "expected": str(seem_pt)}

    # ---- GLIGEN -----------------------------------------------------------
    gdir = w / "gligen"
    gpth = sorted(gdir.glob("*.pth")) if gdir.is_dir() else []
    if gpth:
        from vitron_tpu.models.diffusion import gligen_pipeline as gp

        gcfg = gp.GligenConfig()
        bundle, dt = _timed(lambda: gp.load_gligen_checkpoint(str(gpth[0]), gcfg))
        report["3_gligen"] = {"load_seconds": dt,
                              "components": sorted(bundle.keys())
                              if isinstance(bundle, dict) else "loaded"}
    else:
        report["3_gligen"] = {"status": "missing", "expected": str(w / 'gligen/*.pth')}

    # ---- video UNets (converter-level acceptance) --------------------------
    from vitron_tpu.models.diffusion import unet_sd_video

    for name, variant in (("i2vgen", "i2vgen"), ("t2v", "t2v")):
        vdir = w / name
        pths = sorted(vdir.glob("*.pth")) if vdir.is_dir() else []
        if not pths:
            report[f"4_{name}_unet"] = {"status": "missing",
                                        "expected": str(vdir / '*.pth')}
            continue
        from vitron_tpu.models.llm import loader

        sd = loader.load_torch_bin(str(pths[0]))
        vcfg = (unet_sd_video.UNetSDVideoConfig.i2vgen_xl() if variant == "i2vgen"
                else unet_sd_video.UNetSDVideoConfig.t2v())
        vp, dt = _timed(lambda: unet_sd_video.convert_torch(sd, vcfg))
        n_params = sum(int(np.prod(np.shape(x))) for x in jax.tree.leaves(vp))
        report[f"4_{name}_unet"] = {"load_seconds": dt, "params": n_params}
    return report


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Vitron-TPU eval suite")
    p.add_argument("--demo", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--weights", help="weights dir for the acceptance run "
                                     "(see run_acceptance_suite docstring)")
    p.add_argument("--image", help="example image for the acceptance run")
    args = p.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if not args.demo and not args.weights:
        print("provide --weights DIR for the acceptance run, or --demo")
        return 2
    if args.demo:
        report = run_demo_suite(args.seed)
    else:
        report = run_acceptance_suite(args.weights, args.seed, args.image)
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())

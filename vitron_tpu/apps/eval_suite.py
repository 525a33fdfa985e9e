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


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Vitron-TPU eval suite")
    p.add_argument("--demo", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if not args.demo:
        print("checkpoint-backed eval not wired; use --demo")
        return 2
    report = run_demo_suite(args.seed)
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())

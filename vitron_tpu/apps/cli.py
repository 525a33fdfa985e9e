"""CLI: single-image / video QA without a UI.

Rebuilds the reference CLI demo (reference: inference_image.py:10-116):
load the model, preprocess one image or video, run multimodal generation,
print the (optionally routed) response.

Usage:
  python -m vitron_tpu.apps.cli --base-model /path/to/vicuna \
      --image examples/dog.jpg --prompt "what is unusual here?"
  python -m vitron_tpu.apps.cli --demo --image x.jpg --prompt "..."
      (--demo runs a small random-weight model end-to-end: pipeline
       validation without checkpoints)
"""
from __future__ import annotations

import argparse
import sys


def build_argparser() -> argparse.ArgumentParser:
    from vitron_tpu.apps.serve import add_checkpoint_args

    p = argparse.ArgumentParser(description="Vitron-TPU CLI inference")
    add_checkpoint_args(p)
    p.add_argument("--image", help="input image path")
    p.add_argument("--video", help="input video path")
    p.add_argument("--prompt", required=True)
    p.add_argument("--bbox", type=float, nargs=4, metavar=("X1", "Y1", "X2", "Y2"),
                   help="region of interest in image pixels")
    p.add_argument("--temperature", type=float, default=0.2)  # inference_image.py:57
    p.add_argument("--top-p", type=float, default=0.7)
    p.add_argument("--max-new-tokens", type=int, default=1024)
    p.add_argument("--greedy", action="store_true")
    p.add_argument("--demo", action="store_true",
                   help="random tiny weights, whitespace tokenizer (no ckpts)")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--seed", type=int, default=0)
    return p


class _DemoTokenizer:
    bos_token_id = 1
    eos_token_id = 2

    def __call__(self, s):
        class R:
            pass

        r = R()
        r.input_ids = [1] + [abs(hash(w)) % 200 + 10 for w in s.split()]
        return r

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(f"tok{t}" for t in ids)


def _build_demo_system():
    import jax

    from vitron_tpu.models import vitron_model
    from vitron_tpu.runtime.engine import VitronEngine
    from vitron_tpu.runtime.system import VitronSystem

    cfg = vitron_model.VitronConfig.tiny()
    params = vitron_model.init_params(jax.random.PRNGKey(0), cfg)
    engine = VitronEngine(params, cfg, _DemoTokenizer())
    return VitronSystem(engine)


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if not args.demo and not args.base_model and not args.weights:
        print("error: provide --weights DIR, --base-model, or --demo",
              file=sys.stderr)
        return 2
    from vitron_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import numpy as np

    from vitron_tpu.media.preprocess import load_image, load_video_frames
    from vitron_tpu.runtime.generation import SamplingConfig

    if args.demo:
        system = _build_demo_system()
    else:
        # real weights go through the production assembly: towers +
        # projector + region extractor load from disk or the build refuses
        # (never the r4 behavior of serving random-init towers,
        # runtime/assembly.py). MissingWeightsError -> actionable exit.
        from vitron_tpu.apps.serve import build_serving_system
        from vitron_tpu.runtime.assembly import MissingWeightsError

        try:
            system, report = build_serving_system(args)
        except MissingWeightsError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        print(report.summary(), file=sys.stderr)

    image = load_image(args.image) if args.image else None
    video = load_video_frames(args.video) if args.video else None

    import jax

    sampling = SamplingConfig(
        temperature=args.temperature, top_p=args.top_p,
        max_new_tokens=args.max_new_tokens if not args.demo else min(args.max_new_tokens, 16),
        greedy=args.greedy)
    result = system.chat(args.prompt, image=image, video=video,
                         region_box=args.bbox,
                         sampling=sampling, rng=jax.random.PRNGKey(args.seed))
    print(f"[status] {result['status']}")
    if result.get("task"):
        print(f"[task]   {result['task']}")
    print(f"[reply]  {result['reply']['raw']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

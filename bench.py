"""Benchmark: Vicuna-7B-architecture decode throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload mirrors the reference chat hot loop (reference: app.py:562-571,
max_new_tokens=1024 sampled decode on Vicuna-7B fp16): prefill 256 tokens,
then fixed-length fully-compiled greedy decode via lax.scan. The reference
repo publishes no throughput numbers (BASELINE.md), so vs_baseline is
reported against a nominal 30 tok/s A100 fp16 HF-generate figure for
Vicuna-7B-class models.

Env knobs:
  VITRON_BENCH_PRESET=7b|3b|tiny   (default 7b; falls back on OOM)
  VITRON_BENCH_NEW_TOKENS          (default 128)
  VITRON_BENCH_PREFILL             (default 256)
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

A100_HF_VICUNA7B_TOKS = 30.0  # nominal PyTorch fp16 single-A100 decode rate

PRESETS = {
    "7b": dict(vocab_size=32000, hidden_size=4096, intermediate_size=11008,
               num_layers=32, num_heads=32, num_kv_heads=32),
    "3b": dict(vocab_size=32000, hidden_size=2560, intermediate_size=6912,
               num_layers=26, num_heads=20, num_kv_heads=20),
    "tiny": dict(vocab_size=512, hidden_size=128, intermediate_size=256,
                 num_layers=2, num_heads=4, num_kv_heads=4),
}


def run(preset: str, prefill: int, n_new: int, quant: str = ""):
    import jax
    import jax.numpy as jnp

    from vitron_tpu.models.llm import llama

    cfg = llama.LlamaConfig(max_seq_len=prefill + n_new + 8, **PRESETS[preset])
    if quant in ("int8", "int4"):
        # generate quantized weights directly: converting a resident bf16 7B
        # would need bf16+int8 copies simultaneously (>16 GB HBM)
        def init_q(key):
            def qw(kk, w):
                if quant == "int8":
                    q = jax.random.randint(kk, w.shape, -127, 128, jnp.int8)
                    s = jnp.full(w.shape[:-2] + (1, w.shape[-1]), 1e-2, jnp.float32)
                    return {"q": q, "s": s}
                packed = w.shape[:-2] + (w.shape[-2] // 2, w.shape[-1])
                q4 = jax.random.randint(kk, packed, -128, 128, jnp.int8)
                s = jnp.full(w.shape[:-2] + (1, w.shape[-1]), 2e-2, jnp.float32)
                return {"q4": q4, "s": s}

            p = llama.init_params(key, cfg)
            layers = dict(p["layers"])
            # enumerate, not hash(t): string hashing is per-process
            # randomized (PYTHONHASHSEED), which made bench weights — and
            # the spec acceptance they induce — vary across runs
            for i, t in enumerate(("wq", "wk", "wv", "wo", "gate", "down",
                                   "up")):
                layers[t] = qw(jax.random.fold_in(key, i), layers[t])
            # lm_head quantized too (serving default; 0.37 -> ~0.1 ms/tok,
            # docs/PERF.md decode attribution)
            return {**p, "layers": layers,
                    "lm_head": qw(jax.random.fold_in(key, 7), p["lm_head"])}

        params = jax.jit(init_q)(jax.random.PRNGKey(0))
    else:
        params = jax.jit(lambda k: llama.init_params(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    ids = jnp.asarray(np.random.RandomState(0).randint(1, cfg.vocab_size, (1, prefill)))
    pos = jnp.arange(prefill)[None]

    @jax.jit
    def prefill_fn(params, ids, pos):
        cache = llama.KVCache.create(cfg, 1, max_len=prefill + n_new)
        logits, cache = llama.forward_tokens(
            params, cfg, ids, positions=pos,
            attn_mask=jnp.ones_like(ids, bool), cache=cache)
        return jnp.argmax(logits[:, -1:], axis=-1), cache

    @jax.jit
    def decode_all(params, token, cache):
        from vitron_tpu.kernels.quantization import promote_int4

        # int4: one in-program expansion to native s4 (fuses into the dots);
        # amortized over n_new like a real generation would
        params = promote_int4(params)

        def step(carry, _):
            token, p, cache = carry
            logits, cache = llama.forward_tokens(
                params, cfg, token, positions=p,
                attn_mask=jnp.ones_like(token, bool), cache=cache)
            nxt = jnp.argmax(logits[:, -1:], axis=-1)
            return (nxt, p + 1, cache), nxt[:, 0]

        p0 = jnp.full((1, 1), prefill, jnp.int32)
        (_, _, _), toks = jax.lax.scan(step, (token, p0, cache), None, length=n_new)
        return toks

    # warmup (compile); np.asarray forces a device->host transfer, which is
    # the only reliable completion barrier on remote-executed backends
    tok, cache = prefill_fn(params, ids, pos)
    np.asarray(decode_all(params, tok, cache))
    # timed: best of 3
    best = float("inf")
    for _ in range(3):
        tok, cache = prefill_fn(params, ids, pos)
        np.asarray(tok)
        t0 = time.perf_counter()
        out = decode_all(params, tok, cache)
        np.asarray(out)
        dt = time.perf_counter() - t0
        best = min(best, dt)
    return n_new / best


def bench_e2e_request(quant: str = "int4") -> dict:
    """Full multimodal request on one chip: ViT-L/14 image encode (256 media
    tokens) + spliced prefill + 128-token greedy decode (the reference's
    app.py:456-571 hot path, minus its per-request checkpoint reloads)."""
    import time

    import jax
    import jax.numpy as jnp

    from vitron_tpu.constants import IMAGE_TOKEN_INDEX
    from vitron_tpu.models import vitron_model
    from vitron_tpu.models.llm import llama
    from vitron_tpu.runtime.engine import MediaItem, prepare_batch
    from vitron_tpu.runtime.generation import generate_scan

    llm_cfg = llama.LlamaConfig(max_seq_len=512, **PRESETS["7b"])
    cfg = vitron_model.VitronConfig.serving(llm=llm_cfg)

    def init(key):
        def qw(kk, w):
            packed = w.shape[:-2] + (w.shape[-2] // 2, w.shape[-1])
            return {"q4": jax.random.randint(kk, packed, -128, 128, jnp.int8),
                    "s": jnp.full(w.shape[:-2] + (1, w.shape[-1]), 2e-2,
                                  jnp.float32)}

        p = vitron_model.init_params(key, cfg)
        llm = dict(p["llm"])
        layers = dict(llm["layers"])
        for i, t in enumerate(("wq", "wk", "wv", "wo", "gate", "up",
                               "down")):
            layers[t] = qw(jax.random.fold_in(key, i), layers[t])
        llm["layers"] = layers
        llm["lm_head"] = qw(jax.random.fold_in(key, 7), llm["lm_head"])
        return {**p, "llm": llm}

    params = jax.jit(init)(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    row = [1] + [7] * 24 + [IMAGE_TOKEN_INDEX] + [9] * 24
    img = MediaItem("image", np.random.RandomState(0)
                    .rand(cfg.image_tower.image_size, cfg.image_tower.image_size, 3)
                    .astype(np.float32))
    plan, images, _, _ = prepare_batch(
        [row], [img], image_len=cfg.image_tower.num_patches)
    arrays = (jnp.asarray(plan.token_ids), jnp.asarray(plan.media_idx),
              jnp.asarray(plan.use_media), jnp.asarray(plan.position_ids),
              jnp.asarray(plan.attention_mask), jnp.asarray(plan.seq_lens))
    images = jnp.asarray(images)

    # the whole request is ONE jitted program: the in-program s4 promotion
    # must not cross a jit boundary (kernels/quantization.py docstring)
    req_fn = jax.jit(lambda p: generate_scan(p, cfg, arrays, 128,
                                             jax.random.PRNGKey(1),
                                             images=images))

    def req():
        return req_fn(params)

    np.asarray(req())  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(req())
        best = min(best, time.perf_counter() - t0)
    return {"e2e_request_s": round(best, 3),
            "e2e_req_per_min_chip": round(60.0 / best, 1)}


def bench_spec_decode() -> dict:
    """Prompt-lookup speculative decode (runtime/speculative.py) on the
    bench decode workload: 7B int4, prefill 256, 128 greedy tokens. Emits
    k+1 tokens per HBM-bound forward when drafts verify; the acceptance
    rate is workload-dependent (repetitive/quoting text accepts most) —
    spec_tok_per_forward reports what THIS run accepted."""
    import time

    import jax
    import jax.numpy as jnp

    from vitron_tpu.models import vitron_model
    from vitron_tpu.models.llm import llama
    from vitron_tpu.runtime.speculative import speculative_decode

    prefill, n_new = 256, 128
    llm_cfg = llama.LlamaConfig(max_seq_len=prefill + n_new + 16,
                                **PRESETS["7b"])
    cfg = vitron_model.VitronConfig.serving(llm=llm_cfg)

    def init(key):
        def qw(kk, w):
            packed = w.shape[:-2] + (w.shape[-2] // 2, w.shape[-1])
            return {"q4": jax.random.randint(kk, packed, -128, 128, jnp.int8),
                    "s": jnp.full(w.shape[:-2] + (1, w.shape[-1]), 2e-2,
                                  jnp.float32)}

        p = vitron_model.init_params(key, cfg)
        llm = dict(p["llm"])
        layers = dict(llm["layers"])
        for i, t in enumerate(("wq", "wk", "wv", "wo", "gate", "up",
                               "down")):
            layers[t] = qw(jax.random.fold_in(key, i), layers[t])
        llm["layers"] = layers
        llm["lm_head"] = qw(jax.random.fold_in(key, 7), llm["lm_head"])
        return {**p, "llm": llm}

    params = jax.jit(init)(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    row = [1] + list(np.random.RandomState(0).randint(10, 2000, prefill - 1))
    ids = jnp.asarray([row], jnp.int32)
    arrays = (ids, jnp.zeros((1, prefill), jnp.int32),
              jnp.zeros((1, prefill), bool),
              jnp.arange(prefill, dtype=jnp.int32)[None],
              jnp.ones((1, prefill), bool), jnp.asarray([prefill], jnp.int32))
    fn = jax.jit(lambda p: speculative_decode(p, cfg, arrays, n_new, k=4,
                                              ngram=2, eos_ids=()))
    toks, out_n, steps = jax.tree.map(np.asarray, fn(params))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.tree.map(np.asarray, fn(params))
        best = min(best, time.perf_counter() - t0)
    return {"spec_decode_tok_s": round(int(out_n) / best, 1),
            "spec_tok_per_forward": round(int(out_n) / int(steps), 2),
            # random-weight greedy output is degenerate/repetitive — ideal
            # for prompt lookup; treat as a favorable-acceptance UPPER BOUND
            # (bench_spec_acceptance replays realistic transcripts)
            "spec_note": "upper bound: random-weight cyclic continuation"}


# Realistic transcripts for model-free prompt-lookup acceptance replay:
# the reference's example-tab protocol replies (app.py:963-1085; the task
# strings a trained Vitron emits) and COCO-caption-style chat answers.
_SPEC_PROTOCOL_TRANSCRIPTS = [
    ("draw a picture of a gray wolf walking in the forest",
     "Certainly! <module>A</module> <instruction>prompt: a gray wolf "
     "walking in the forest, realistic, 4K</instruction>"),
    ("segment the man who is eating a hotdog in this image",
     "Sure, I will segment it. <module>B</module> <instruction>target: "
     "the man who is eating a hotdog</instruction>"),
    ("put a sun hat on the dog's head",
     "I can edit the image for you. <module>C</module> <instruction>edit: "
     "a sun hat on the dog's head</instruction>"),
    ("make a video of an aerial view of a tractor working on the fields",
     "Of course! <module>D</module> <instruction>prompt: an aerial view "
     "of a tractor working on the fields, 4K</instruction>"),
    ("track the woman in the video",
     "Tracking the woman now. <module>E</module> <instruction>track: "
     "the woman</instruction>"),
    ("turn the bear into a polar bear strolling in a snowy winter forest",
     "<module>F</module> <instruction>foreground: a polar bear strolling"
     "</instruction><instruction>background: a snowy winter forest"
     "</instruction>"),
]
_SPEC_CAPTION_TRANSCRIPTS = [
    ("describe this image in detail",
     "The image shows a man riding a wave on top of a surfboard . the man "
     "is wearing a black wetsuit and the wave is curling over him . in the "
     "background there are several other surfers waiting for the next wave "
     ". the water is a deep blue and the sky is clear ."),
    ("what is happening in this picture",
     "A group of people are sitting around a wooden table with plates of "
     "food . there are two pizzas on the table along with glasses of wine "
     ". the people appear to be enjoying a meal together at a restaurant ."),
    ("tell me about the animals here",
     "Two zebras are grazing in a grassy field . the zebra on the left is "
     "bending its neck down to eat the grass while the zebra on the right "
     "is looking toward the camera . behind the zebras there are trees ."),
]


def _simulate_prompt_lookup(prompt_ids, gold_ids, k=4, ngram=2):
    """Model-free replay of the ngram_draft accept loop
    (runtime/speculative.py semantics) over a gold continuation: at each
    verification step, draft k tokens from the most recent n-gram match in
    prompt+emitted history and count the accepted prefix. Returns
    emitted-tokens-per-forward for this transcript."""
    hist = list(prompt_ids) + [gold_ids[0]]
    i, forwards = 1, 0
    while i < len(gold_ids):
        key = hist[-ngram:]
        best = -1
        for s in range(len(hist) - ngram):
            if hist[s:s + ngram] == key:
                best = s
        if best >= 0:
            draft = hist[best + ngram: best + ngram + k]
        else:
            draft = [hist[-1]] * k
        acc = 0
        for j, d in enumerate(draft):
            if i + j < len(gold_ids) and d == gold_ids[i + j]:
                acc += 1
            else:
                break
        n_emit = min(acc + 1, len(gold_ids) - i)
        hist.extend(gold_ids[i:i + n_emit])
        i += n_emit
        forwards += 1
    return len(gold_ids) / max(forwards, 1)


def bench_spec_acceptance(plain_tok_s: float) -> dict:
    """Honest workload-dependent speculative acceptance: replay realistic
    transcripts (protocol strings + caption answers, word-tokenized as a
    BPE proxy) through the prompt-lookup accept rule and project tok/s via
    the measured 1.46x speculation-step cost (docs/PERF.md). These bound
    the real-checkpoint range alongside the cyclic upper bound."""
    from vitron_tpu.mm.conversation import conv_templates

    system = conv_templates["llava_v1"].system

    def tpf_for(transcripts):
        vocab: dict = {}

        def ids(text):
            return [vocab.setdefault(w, len(vocab)) for w in text.split()]

        vals = []
        for user, reply in transcripts:
            prompt = ids(system) + ids("USER: " + user + " ASSISTANT:")
            gold = ids(reply)
            vals.append(_simulate_prompt_lookup(prompt, gold))
        return sum(vals) / len(vals)

    spec_step_cost = 1.46  # measured (k+1)-wide forward vs 1-token step
    out = {}
    for name, tr in (("protocol", _SPEC_PROTOCOL_TRANSCRIPTS),
                     ("caption", _SPEC_CAPTION_TRANSCRIPTS)):
        tpf = tpf_for(tr)
        out[f"spec_tpf_{name}"] = round(tpf, 2)
        out[f"spec_tok_s_{name}_est"] = round(
            plain_tok_s * tpf / spec_step_cost, 1)
    return out


def bench_continuous_batching() -> dict:
    """Serving load point: aggregate decode tok/s through the co-batched
    paged path (PagedServer.step_n with per-row sampling) at 4 concurrent
    sequences vs 1 — the multi-client serving shape apps/serve.py runs
    (runtime/batching.py)."""
    import time

    import jax
    import jax.numpy as jnp

    from vitron_tpu.models.llm import llama
    from vitron_tpu.models.llm.paged_cache import PagedServer

    prefill, n = 256, 64
    cfg = llama.LlamaConfig(max_seq_len=1024, **PRESETS["7b"])

    def init_q(key):
        def qw(kk, w):
            packed = w.shape[:-2] + (w.shape[-2] // 2, w.shape[-1])
            return {"q4": jax.random.randint(kk, packed, -128, 128, jnp.int8),
                    "s": jnp.full(w.shape[:-2] + (1, w.shape[-1]), 2e-2,
                                  jnp.float32)}

        p = llama.init_params(key, cfg)
        layers = dict(p["layers"])
        for i, t in enumerate(("wq", "wk", "wv", "wo", "gate", "up", "down")):
            layers[t] = qw(jax.random.fold_in(key, i), layers[t])
        return {**p, "layers": layers,
                "lm_head": qw(jax.random.fold_in(key, 7), p["lm_head"])}

    params = jax.jit(init_q)(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    rs = np.random.RandomState(0)
    out = {}
    for b in (1, 4):
        # 4 chunks run per sequence (1 compile + 3 timed), each growing the
        # sequence by n tokens past the prefill
        blocks_per_seq = (prefill + 4 * n) // 16 + 2
        srv = PagedServer(params, cfg, num_blocks=blocks_per_seq * b,
                          block_size=16, max_blocks_per_seq=32)
        for _ in range(b):
            srv.add_request(list(rs.randint(1, 30000, prefill)), chunk=prefill)
        sampling = {sid: (0.0, 1.0, True) for sid in srv.seqs}
        sampling["rng"] = jax.random.PRNGKey(1)
        srv.step_n(n, sampling=sampling)  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            srv.step_n(n, sampling=dict(sampling))
            best = min(best, time.perf_counter() - t0)
        out[f"serve_batch{b}_tok_s"] = round(b * n / best, 1)
    if out.get("serve_batch1_tok_s"):
        out["serve_batch4_speedup"] = round(
            out["serve_batch4_tok_s"] / out["serve_batch1_tok_s"], 2)
    return out


def bench_seem_fps() -> dict:
    """SEEM FocalNet-L video tracking, 8 frames batched (the reference runs
    a 5 fps serial per-frame loop, interactive.py:227)."""
    import time

    import jax
    import jax.numpy as jnp

    from vitron_tpu.models.seem import decoder as seem_dec
    from vitron_tpu.models.seem import model as seem_model

    cfg = seem_model.SeemConfig()
    params = jax.jit(lambda k: seem_model.init_params(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    frames = jnp.asarray(np.random.RandomState(0)
                         .rand(8, cfg.input_size, cfg.input_size, 3)
                         .astype(np.float32))
    ref = frames[0]
    stroke = np.zeros((cfg.input_size, cfg.input_size), bool)
    stroke[200:300, 200:300] = True
    pts, valid = seem_dec.sample_stroke_points(
        stroke, cfg.decoder.max_spatial_len, np.random.RandomState(0))

    fn = jax.jit(lambda p, f, r, pt, va: seem_model.track_video(p, cfg, f, r, pt, va))
    args = (params, frames, ref, jnp.asarray(pts), jnp.asarray(valid))
    np.asarray(fn(*args))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return {"seem_track_fps": round(8.0 / best, 1)}


def bench_video_unet() -> dict:
    """Faithful UNetSD_T2V (4.4B params) CFG denoise step at the ZeroScope
    workload: 24 frames, 320x576 -> 40x72 latents, cond+uncond batched
    (reference app.py:228-240). Reports MFU against the 86.1 TF/step
    analytic count — single-chip peak is 2.29 steps/s, so the serving plan
    for D/G shards the step over the mesh (distributed/video_sharding.py).

    Zero-init weights (TPU op timing is data-independent; random init of a
    4.4B tree takes minutes through the tunnel)."""
    import time

    import jax
    import jax.numpy as jnp

    from vitron_tpu.models.diffusion import unet_sd_video as usv

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    except Exception:
        pass
    cfg = usv.UNetSDVideoConfig.t2v()
    try:
        with jax.default_device(jax.devices("cpu")[0]):
            abstract = jax.eval_shape(lambda k: usv.init_params(k, cfg),
                                      jax.random.PRNGKey(0))
    except RuntimeError:
        abstract = jax.eval_shape(lambda k: usv.init_params(k, cfg),
                                  jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda l: jnp.zeros(l.shape, jnp.bfloat16 if l.dtype == jnp.float32
                            else l.dtype), abstract)
    x0 = jnp.zeros((2, 24, 40, 72, 4), jnp.bfloat16)
    ctx = jnp.zeros((2, 77, 1024), jnp.bfloat16)
    nsteps = 3

    @jax.jit
    def steps(params, x, ctx):
        def body(x, t):
            eps = usv.forward(params, cfg, x, jnp.full((2,), t), ctx)
            return (x - 0.01 * eps).astype(x.dtype), None
        return jax.lax.scan(body, x, jnp.arange(nsteps, dtype=jnp.float32))[0]

    exe = steps.lower(params, x0, ctx).compile()
    # XLA's own 2MNK count. TPU cost_analysis counts a while-loop body
    # ONCE regardless of trip count (verified: nsteps=1 and nsteps=3 both
    # report 86.11 TF), so the executable's flops IS the per-step count —
    # and it confirms the r3 analytic 86.1 TF/step. Pallas custom calls
    # (fused GEGLU FF, frame attention) are INVISIBLE to cost_analysis, so
    # MFU uses the analytic count when kernels are engaged (the XLA-visible
    # number is still reported for the delta).
    cost = exe.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    xla_flops = cost.get("flops", 0.0)
    flops = max(xla_flops, 86.1e12)
    np.asarray(exe(params, x0, ctx), dtype=np.float32)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(exe(params, x0, ctx), dtype=np.float32)
        best = min(best, time.perf_counter() - t0)
    per = (best - 0.033) / nsteps
    out = {"video_unet_cfg_steps_per_s": round(1.0 / per, 2),
           "video_unet_mfu": round(flops / per / V5E_BF16_FLOPS, 3),
           "video_unet_tf_per_step": round(flops / 1e12, 1),
           "video_unet_xla_visible_tf": round(xla_flops / 1e12, 1)}

    # W8A8 serving variant (VITRON_VUNET_QUANT=w8a8): integer-MXU spatial
    # convs (conv-only — dot/tconv quantization measured NEGATIVE e2e, see
    # unet_sd_video.quantize_params). Labeled extra — a quality tradeoff
    # (per-channel int8 weights, dynamic int8 activations; rel err vs bf16
    # at the tiny config ~2-4%, tests/test_quantization.py) — the bf16
    # number above stays the honest headline.
    qparams = usv.quantize_params(params)
    exe_q = steps.lower(qparams, x0, ctx).compile()
    np.asarray(exe_q(qparams, x0, ctx), dtype=np.float32)
    best_q = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(exe_q(qparams, x0, ctx), dtype=np.float32)
        best_q = min(best_q, time.perf_counter() - t0)
    per_q = (best_q - 0.033) / nsteps
    out["video_unet_w8a8_cfg_steps_per_s"] = round(1.0 / per_q, 2)
    return out


def bench_sd_unet() -> dict:
    """SD v1.4 UNet CFG step rate at 512^2 latents (GLIGEN's 50-step PLMS
    workload, task_grounded_generation.py:252)."""
    import time

    import jax
    import jax.numpy as jnp

    from vitron_tpu.models.diffusion import unet2d

    cfg = unet2d.UNetConfig.sd_v1()
    params = jax.jit(lambda k: unet2d.init_params(k, cfg, grounding=False))(
        jax.random.PRNGKey(0))
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                          if x.dtype == jnp.float32 else x, params)
    jax.block_until_ready(params)
    x = jnp.zeros((2, 64, 64, 4), jnp.bfloat16)  # cond + uncond batched
    ctx = jnp.zeros((2, 77, cfg.context_dim), jnp.bfloat16)
    def make(n_steps):
        @jax.jit
        def steps(params, x, ctx):
            def body(x, t):
                eps = unet2d.forward(params, cfg, x, jnp.full((2,), t), ctx)
                return x - 0.01 * eps.astype(x.dtype), None

            x, _ = jax.lax.scan(body, x,
                                jnp.arange(n_steps, dtype=jnp.float32))
            return x
        return steps

    # differential timing: ~33 ms per-call tunnel overhead cancels in the
    # (long - short) difference; min per arm, THEN subtract (PERF.md)
    f_lo, f_hi = make(5), make(25)
    np.asarray(f_lo(params, x, ctx))
    np.asarray(f_hi(params, x, ctx))
    lo = hi = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f_lo(params, x, ctx))
        lo = min(lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(f_hi(params, x, ctx))
        hi = min(hi, time.perf_counter() - t0)
    # NOT measured here: the W8A8 arm (unet2d.quantize_params,
    # VITRON_UNET_QUANT=w8a8) — measured once on-chip at 22.3 steps/s vs
    # 53.6 bf16 (2.4x SLOWER; docs/PERF.md round-4 notes). The SD step is
    # ~37% MFU, not conv-roofline-bound like the video UNet's 90-98%
    # convs, so the integer MXU's 2x peak buys nothing while the dynamic
    # activation-quant chain adds HBM passes. Kept out of the recurring
    # bench (the losing arm cost 220 s of compile per run).
    return {"sd_unet_cfg_steps_per_s": round(20 / (hi - lo), 2)}


def bench_resident_vs_reload(llm_turn_s: float | None) -> dict:
    """The resident-weights win, quantified (VERDICT r4 item 8).

    A full task-A request is: one LLM protocol turn (instruction + caption +
    boxes) then a 50-step grounded GLIGEN generation
    (reference app.py:89-120 -> task_grounded_generation.py:252). The
    reference RELOADS the GLIGEN checkpoint from disk for every request
    (app.py:94-103 re-runs load_ckpt); this framework keeps every backend
    resident (runtime/assembly.py). Both arms share the resident LLM turn
    (the reference keeps vicuna resident too), so the differential is
    entirely the diffusion arm:

      resident: 50 CFG steps on device-resident params, compiled once.
      reload:   re-jit (fresh XLA compile) + host->device weight transfer
                + the same 50 steps, per request — OUR framework's cost IF
                it reloaded per request. Disk read (the reference's actual
                torch.load, ~10-30 s for a 5 GB checkpoint) is EXCLUDED, so
                the reported reload arm is a LOWER bound on per-request-
                reload cost; the resident/reload ratio is conservative.

    llm_turn_s: the measured e2e_request_s from bench_e2e_request (the
    protocol turn proxy: encode + prefill + 128-token decode), composed in.
    Transfer is measured over this host's TPU tunnel and reported
    separately so a local-host reader can re-derive the ratio."""
    import time

    import jax
    import jax.numpy as jnp

    from vitron_tpu.models.diffusion import unet2d

    cfg = unet2d.UNetConfig.sd_v1()
    params = jax.jit(lambda k: unet2d.init_params(k, cfg, grounding=True))(
        jax.random.PRNGKey(0))
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                          if x.dtype == jnp.float32 else x, params)
    host_params = jax.device_get(params)  # the "checkpoint" (host RAM)
    x = jnp.zeros((2, 64, 64, 4), jnp.bfloat16)
    ctx = jnp.zeros((2, 77, cfg.context_dim), jnp.bfloat16)
    objs = jnp.zeros((2, 30, cfg.context_dim), jnp.bfloat16)  # 30 GLIGEN slots

    def make_steps():
        @jax.jit
        def steps(params, x, ctx, objs):
            def body(x, t):
                eps = unet2d.forward(params, cfg, x, jnp.full((2,), t), ctx,
                                     objs=objs)
                return x - 0.01 * eps.astype(x.dtype), None

            x, _ = jax.lax.scan(body, x, jnp.arange(50, dtype=jnp.float32))
            return x
        return steps

    # resident arm
    steps = make_steps()
    np.asarray(steps(params, x, ctx, objs))  # compile (not counted: one-time)
    sd_res = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(steps(params, x, ctx, objs))
        sd_res = min(sd_res, time.perf_counter() - t0)

    # reload arm: fresh transfer + fresh compile + the same 50 steps
    t0 = time.perf_counter()
    params2 = jax.device_put(host_params)
    jax.block_until_ready(params2)
    transfer_s = time.perf_counter() - t0
    jax.clear_caches()  # drop the compiled executable: per-request re-jit
    t0 = time.perf_counter()
    np.asarray(make_steps()(params2, x, ctx, objs))
    sd_reload = time.perf_counter() - t0  # compile + transfer-free run

    llm = float(llm_turn_s) if llm_turn_s else 0.0
    res_req = llm + sd_res
    rel_req = llm + sd_reload + transfer_s
    out = {
        "taskA_resident_request_s": round(res_req, 2),
        "taskA_resident_req_per_min": round(60.0 / res_req, 2),
        "taskA_reload_request_s": round(rel_req, 2),
        "taskA_reload_req_per_min": round(60.0 / rel_req, 2),
        "taskA_resident_speedup": round(rel_req / res_req, 1),
        "taskA_reload_transfer_s": round(transfer_s, 2),
        "taskA_reload_note": ("reload arm = re-jit + weight re-transfer + "
                              "50 steps; reference's per-request disk "
                              "torch.load EXCLUDED (lower bound)"),
    }
    if not llm_turn_s:
        out["taskA_note"] = "llm turn unavailable; diffusion arm only"
    return out


V5E_HBM_BYTES_S = 819e9   # v5e HBM bandwidth
V5E_BF16_FLOPS = 197e12   # v5e bf16 peak


def decode_roofline_tok_s(preset: str, quant: str, avg_ctx: int) -> float:
    """HBM-bandwidth-bound decode ceiling: every step must read all weights
    plus the KV history once. Self-documenting progress metric (the 65%->
    goal is to close the measured/roofline gap, docs/PERF.md)."""
    d = PRESETS[preset]
    h, f, L, v = (d["hidden_size"], d["intermediate_size"],
                  d["num_layers"], d["vocab_size"])
    kvd = d["num_kv_heads"] * (h // d["num_heads"])
    matmul_elems = L * (2 * h * h + 2 * h * kvd + 3 * h * f)
    wbytes = {"int4": 0.5, "int8": 1.0, "": 2.0}[quant]
    # lm_head is quantized with the layers (embed is a row gather: ~free)
    weight_bytes = matmul_elems * wbytes + v * h * wbytes
    if quant:  # per-output-channel f32 scales
        weight_bytes += (L * (4 * h + 3 * f) + v) * 4
    kv_bytes = L * 2 * avg_ctx * kvd * 2
    return V5E_HBM_BYTES_S / (weight_bytes + kv_bytes)


def main():
    preset = os.environ.get("VITRON_BENCH_PRESET", "7b")
    if preset not in PRESETS:
        sys.exit(f"unknown VITRON_BENCH_PRESET {preset!r}; choose from {sorted(PRESETS)}")
    # int4 is the fastest serving config (s4 dequant fuses into the dots:
    # 110 vs 92 tok/s int8 on v5e) and mirrors the reference's bitsandbytes
    # load_4bit option (vitron/model/builder.py:40-45)
    quant = os.environ.get("VITRON_BENCH_QUANT", "int4")  # int4 | int8 | bf16
    if quant not in ("int4", "int8", "bf16"):
        sys.exit(f"unknown VITRON_BENCH_QUANT {quant!r}; choose int4|int8|bf16")
    if quant == "bf16":
        quant = ""
    prefill = int(os.environ.get("VITRON_BENCH_PREFILL", "256"))
    n_new = int(os.environ.get("VITRON_BENCH_NEW_TOKENS", "128"))
    order = [preset] + [p for p in ("3b", "tiny") if p != preset]
    toks = None
    used = preset
    for p in order:
        try:
            toks = run(p, prefill, n_new, quant)
            used = p
            break
        except Exception as e:  # OOM on small chips -> fall back
            print(f"# preset {p} failed: {type(e).__name__}: {e}", file=sys.stderr)
    if toks is None:
        print(json.dumps({"metric": "decode tokens/sec/chip", "value": 0.0,
                          "unit": "tok/s", "vs_baseline": 0.0}))
        return
    vs = toks / A100_HF_VICUNA7B_TOKS if used == "7b" else None
    dtype_tag = quant or "bf16"

    # north-star extras (BASELINE.md): e2e request, SEEM fps, UNet steps/s —
    # each best-effort so a failure cannot take down the primary metric
    extras = {}
    roof = decode_roofline_tok_s(used, quant, prefill + n_new // 2)
    extras["decode_roofline_tok_s"] = round(roof, 1)
    extras["decode_roofline_frac"] = round(toks / roof, 3)
    if os.environ.get("VITRON_BENCH_EXTRAS", "1") == "1" and used == "7b":
        import time as _time
        # resident_vs_reload goes LAST: its reload arm calls
        # jax.clear_caches(), which would force every later extra to re-jit
        for name, fn in (
                ("bench_e2e_request", bench_e2e_request),
                ("bench_spec_decode", bench_spec_decode),
                ("bench_spec_acceptance", lambda: bench_spec_acceptance(toks)),
                ("bench_continuous_batching", bench_continuous_batching),
                ("bench_seem_fps", bench_seem_fps),
                ("bench_sd_unet", bench_sd_unet),
                ("bench_video_unet", bench_video_unet),
                ("bench_resident_vs_reload",
                 lambda: bench_resident_vs_reload(
                     extras.get("e2e_request_s")))):
            t0 = _time.perf_counter()
            try:
                extras.update(fn())
            except Exception as e:
                print(f"# extra {name} failed: {type(e).__name__}: {e}",
                      file=sys.stderr)
            # per-extra wall time on stderr: the full run is ~18 min on the
            # tunnel host, dominated by compiles — this is the breakdown a
            # budget-limited driver needs to trim from
            print(f"# extra {name} took {_time.perf_counter() - t0:.1f}s",
                  file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": f"vicuna-{used} decode tokens/sec/chip (greedy, {dtype_tag} weights)",
        "value": round(toks, 2),
        "unit": "tok/s",
        "vs_baseline": round(vs, 2) if vs else None,
        # the reference publishes NO numbers (BASELINE.md); vs_baseline is
        # against a nominal 30 tok/s A100 fp16 HF-generate figure
        "vs_baseline_note": "nominal A100 fp16 HF-generate 30 tok/s",
        **({"extras": extras} if extras else {}),
    }))


if __name__ == "__main__":
    main()

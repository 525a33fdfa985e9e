"""Weight-only int8 quantization for the LLM decode path.

Replaces the reference's bitsandbytes 4/8-bit CUDA load path
(reference: vitron/model/builder.py:40-45, train.py:1040-1056) with a
TPU-native scheme: per-output-channel symmetric int8 weights + fp32 scales.
Decode on one chip is HBM-bandwidth-bound (weights are re-read every token),
so halving weight bytes ~doubles tokens/sec; the int8->bf16 convert fuses
into the XLA dot's operand read, nothing is materialized.

Representation: a quantized matrix is the dict {"q": int8 [..., in, out],
"s": f32 [..., 1, out]} living at the same pytree key as the original
array — `matmul_maybe_quantized` dispatches on type, so the same model code
serves both. int4 packs two nibbles per int8 byte ({"q4": ..., "s": ...}).

Measured (v5e tunnel chip, 7B decode): bf16 51.9 -> int8 92.4 tok/s (the
int8->bf16 convert fuses into the dot's operand read) -> int4 110.0 tok/s
via `promote_int4` (in-program expansion of the packed nibbles to native
s4, whose dequant rides the dot's memory pipeline at ~470 GB/s packed).
Fallbacks for paths that cannot promote (s4 cannot cross a jit boundary):
the fused Pallas kernel (kernels/int4_matmul.py) at ~139 GB/s, and plain
XLA manual unpack at 9.8 tok/s. int4 is both the capacity play (7B in
3.4 GB) and the speed play; int8 is the accuracy-conservative option.
"""
from __future__ import annotations

from typing import Any, Dict, Union

import jax
import jax.numpy as jnp
import numpy as np


def quantize_int8(w: jax.Array) -> Dict[str, jax.Array]:
    """Symmetric per-output-channel int8: w ~= q * s. w: [..., in, out]."""
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)
    s = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w32 / s), -127, 127).astype(jnp.int8)
    return {"q": q, "s": s}


def quantize_int4(w: jax.Array) -> Dict[str, jax.Array]:
    """Symmetric per-output-channel int4, two values packed per byte along
    the input dim (in must be even)."""
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)
    s = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(w32 / s), -7, 7).astype(jnp.int8)
    lo = q[..., 0::2, :]
    hi = q[..., 1::2, :]
    packed = ((hi.astype(jnp.uint8) & 0xF) << 4 | (lo.astype(jnp.uint8) & 0xF)).astype(jnp.int8)
    return {"q4": packed, "s": s}


def _unpack_int4(packed: jax.Array) -> jax.Array:
    u = packed.astype(jnp.uint8)
    lo = (u & 0xF).astype(jnp.int8)
    hi = ((u >> 4) & 0xF).astype(jnp.int8)
    # sign-extend 4-bit two's complement
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    stacked = jnp.stack([lo, hi], axis=-2)  # [..., in/2, 2, out]
    shape = packed.shape[:-2] + (packed.shape[-2] * 2, packed.shape[-1])
    return stacked.reshape(shape)


def w4a8_default() -> bool:
    """W4A8 decode default: OFF (VITRON_W4A8=1 opts in). Read at TRACE
    time — flip the env var before building programs, not mid-process.

    Measured negative result (v5e, 7B int4 bench decode, r4): the integer
    s8 x s4 MXU dot does NOT beat the s4->bf16 convert path — 143.6 tok/s
    ([1,K] matvec), 154.6 (padded [8,K] GEMM), 150.9 (static activation
    scale, no absmax reduction) vs 156.8 baseline. The padded bf16 GEMM's
    s4 convert already rides the dot's memory pipeline, so removing the
    convert buys nothing and the activation-quant chain adds VPU work.
    Kept as an option for future toolchains; docs/PERF.md r4 attribution."""
    import os

    return os.environ.get("VITRON_W4A8", "0") == "1"


def promote_int4(tree, a8=None):
    """Expand packed int4 leaves {"q4", "s"} to native s4 arrays {"q", "s"}.

    XLA's s4 dequantize fuses into the dot's operand read on TPU (measured
    v5e: 469 GB/s packed vs 139 GB/s for the fused Pallas unpack kernel —
    the Mosaic unpack is VPU-bound at ~6 i32 ops/byte, while the native s4
    convert rides the memory pipeline). s4 buffers cannot cross a jit
    boundary on current runtimes, so call this INSIDE the jitted decode
    program (generate_scan does); the one-time expansion (~40 ms for 7B)
    amortizes over the generated tokens.

    a8: promote to the W4A8 form {"qa8", "s"} instead — decode matvecs then
    quantize activations to int8 per row and run an INTEGER dot (s8 x s4,
    int32 accumulate) on the MXU, skipping the s4->bf16 convert pipeline
    that caps the weight stream at ~570 GB/s (docs/PERF.md r4 attribution;
    measured 2.4x faster per decode-shape layer). Activation quant error is
    ~2^-8 relative — the same magnitude as bf16 rounding — but gradients
    differ, so the QLoRA trainer passes a8=False explicitly. None = the
    VITRON_W4A8 env default (on)."""
    if a8 is None:
        a8 = w4a8_default()
    key = "qa8" if a8 else "q"

    def promote(w):
        if isinstance(w, dict) and "q4" in w:
            extra = {k: v for k, v in w.items() if k not in ("q4",)}
            return {**extra, key: _unpack_int4(w["q4"]).astype(jnp.int4)}
        return w

    return jax.tree.map(promote, tree,
                        is_leaf=lambda x: isinstance(x, dict) and "q4" in x)


def dequantize(w: Union[jax.Array, Dict[str, jax.Array]]) -> jax.Array:
    if isinstance(w, dict):
        if "q4" in w:
            return _unpack_int4(w["q4"]).astype(jnp.float32) * w["s"]
        if "qa8" in w:
            return w["qa8"].astype(jnp.float32) * w["s"]
        if "q8" in w:
            return w["q8"].astype(jnp.float32) * w["s"]
        if "qc" in w:
            return w["qc"].astype(jnp.float32) * w["s"]
        return w["q"].astype(jnp.float32) * w["s"]
    return w


def _w4a8_matmul(x: jax.Array, w: Dict[str, jax.Array]) -> jax.Array:
    """Integer decode matvec: per-row symmetric int8 activation quant, then
    s8 x s4 dot with int32 accumulate — the MXU's integer path consumes the
    s4 operand directly, so the weight stream skips the s4->bf16 convert
    (the r3 bottleneck at ~570 GB/s). y = (xq @ q) * sx * sw."""
    import os
    lead = x.shape[:-1]
    xf = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    rows = xf.shape[0]
    if 0 < rows < 8:
        # same MXU trick as _quantized_dot: an [8, K] integer GEMM goes to
        # the MXU, a [1, K] matvec lowers to a VPU multiply-reduce
        xf = jnp.pad(xf, ((0, 8 - rows), (0, 0)))
    if os.environ.get("VITRON_W4A8_STATIC"):
        sx = jnp.full((xf.shape[0], 1), float(os.environ["VITRON_W4A8_STATIC"]),
                      jnp.float32)
    else:
        sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                         1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, w["qa8"], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx * w["s"].astype(jnp.float32)
    return y[:rows].reshape(lead + (y.shape[-1],)).astype(x.dtype)


def matmul_maybe_quantized(x: jax.Array, w) -> jax.Array:
    """x @ w for plain arrays or quantized dicts. The scale applies AFTER the
    matmul (per output channel) so the dot reads int8 straight from HBM.
    int4 routes through the fused Pallas dequantize-matmul on TPU (the
    plain-XLA unpack doesn't fuse; see module docstring).

    A quantized dict may carry LoRA bypass factors ("lora_a" [in, r],
    "lora_b" [r, out], "lora_scale"): y = x@W_q + (x@A)@B * scale — the
    frozen base stays quantized while the adapters train in bf16/f32
    (train/lora.py merge)."""
    if isinstance(w, dict) and "lora_a" in w:
        base = {k: v for k, v in w.items() if not k.startswith("lora_")}
        bypass = ((x.astype(jnp.float32) @ w["lora_a"].astype(jnp.float32))
                  @ w["lora_b"].astype(jnp.float32)) * w["lora_scale"]
        y = matmul_maybe_quantized(x, base)
        return y + bypass.astype(y.dtype)
    if isinstance(w, dict) and "q8" in w:
        return _w8a8_matmul(x, w)
    if isinstance(w, dict) and "qa8" in w:
        if w["qa8"].ndim == 2:
            return _w4a8_matmul(x, w)
        # stacked (non-scan) layers: fall back to the convert path
        y = _quantized_dot(x, w["qa8"])
        return y * w["s"].astype(y.dtype)
    if isinstance(w, dict):
        if "q4" in w:
            if w["q4"].ndim == 2 and jax.default_backend() == "tpu":
                from vitron_tpu.kernels.int4_matmul import int4_matmul

                lead = x.shape[:-1]
                y = int4_matmul(x.reshape(-1, x.shape[-1]), w["q4"],
                                w["s"].astype(jnp.float32))
                return y.reshape(lead + (y.shape[-1],))
            q = _unpack_int4(w["q4"])
            s = w["s"]
        else:
            q, s = w["q"], w["s"]
        y = _quantized_dot(x, q)
        return y * s.astype(y.dtype)
    return x @ w


def _quantized_dot(x: jax.Array, q: jax.Array) -> jax.Array:
    """x @ q.astype(x.dtype), with single-row decode inputs padded to 8
    rows: XLA lowers a [1, K] matvec against an s4/int8 operand as a VPU
    multiply-reduce fusion (~450-530 GB/s effective on v5e), while the
    [8, K] GEMM goes to the MXU with the dequant convert riding the memory
    pipeline (7.6x faster on the same s4 data, measured). The 8x extra
    MXU flops are free — the MXU is idle in a matvec — and the pad rows
    are sliced off."""
    rows = int(np.prod(x.shape[:-1]))
    if 0 < rows < 8 and q.ndim == 2 and jax.default_backend() == "tpu":
        lead = x.shape[:-1]
        xf = x.reshape(rows, x.shape[-1])
        x8 = jnp.pad(xf, ((0, 8 - rows), (0, 0)))
        y = jnp.matmul(x8, q.astype(x.dtype))[:rows]
        return y.reshape(lead + (y.shape[-1],))
    return jnp.matmul(x, q.astype(x.dtype))


def quantize_int8_a8(w: jax.Array) -> Dict[str, jax.Array]:
    """Symmetric per-output-channel int8 weight for the W8A8 integer-MXU
    dot ("q8" key): unlike {"q"} (weight-only, operand converted to bf16 in
    the dot's memory pipeline — the right scheme for HBM-bound decode),
    "q8" dots quantize the ACTIVATION too and run s8 x s8 -> s32 on the
    integer MXU at 2x bf16 peak. Measured NEGATIVE e2e on the video
    UNet's transformer dots (1.646 conv-only -> 1.56/1.35 with dots; the
    per-row quant materialization passes lose to XLA's dot-epilogue
    fusions — docs/PERF.md round-4 W8A8 notes); kept as a tested,
    explicitly-enabled path (quantize_params(min_dot_dim=...))."""
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)
    s = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w32 / s), -127, 127).astype(jnp.int8)
    return {"q8": q, "s": s}


def _w8a8_matmul(x: jax.Array, w: Dict[str, jax.Array]) -> jax.Array:
    """Dynamic per-row symmetric int8 activation quant -> s8 x s8 -> s32
    integer-MXU dot -> f32 dequant. Inference-only (no custom_vjp)."""
    lead = x.shape[:-1]
    xf = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                     1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, w["q8"], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    y = (acc.astype(jnp.float32) * sx
         * w["s"].astype(jnp.float32)).astype(x.dtype)
    return y.reshape(lead + (y.shape[-1],))


def quantize_tconv(w: jax.Array) -> Dict[str, jax.Array]:
    """Symmetric per-output-channel int8 for the k=3 temporal conv taps
    ("q8t" key; w [3, C, Co] or the torch-layout [3, 1, C, Co]). Consumed
    by kernels/temporal_conv.temporal_conv_k3's W8A8 path. Measured
    NEGATIVE e2e (1.646 conv-only -> 1.564 with tconv taps: three
    separate int8 dots lose to the bf16 shift-matmul whose pad/add
    partials fuse into dot epilogues); explicitly-enabled via
    quantize_params(min_tconv_dim=...)."""
    if w.ndim == 4:
        w = w[:, 0]
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=(0, 1))
    s = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w32 / s), -127, 127).astype(jnp.int8)
    return {"q8t": q, "s": s}


def quantize_conv2d(w: jax.Array) -> Dict[str, jax.Array]:
    """Symmetric per-output-channel int8 for conv weights [kh, kw, ci, co].

    Key is "qc" (not "q") so `matmul_maybe_quantized` never consumes a conv
    weight by accident; `layers.conv2d` dispatches on it."""
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=(0, 1, 2))
    s = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w32 / s), -127, 127).astype(jnp.int8)
    return {"qc": q, "s": s}


def conv2d_w8a8(x: jax.Array, w: Dict[str, jax.Array], stride: int = 1,
                padding: int = 0) -> jax.Array:
    """W8A8 convolution on the integer MXU: dynamic per-tensor symmetric
    int8 activation quant -> s8 x s8 -> s32 conv -> f32 dequant.

    The video UNet's 3x3 convs run at 90-98% of the bf16 MXU roofline
    (docs/PERF.md round-4 attribution), so the only way past them
    single-chip is the 2x-peak integer MXU: measured 1.66-1.97x on the
    real [48,20,36,1280] / [48,40,72,640] shapes INCLUDING this dynamic
    activation-quant chain (abs-max reduce + round/clip fuse into the
    conv's operand read); e2e ZeroScope CFG step 1.52 -> 1.646 steps/s
    with convs alone quantized. Inference-only: no custom_vjp, training
    keeps bf16 weights."""
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    sx = jnp.maximum(ax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                  -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, w["qc"], (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (w["s"] * sx)).astype(x.dtype)


def quantize_llama(params: Dict[str, Any], bits: int = 8,
                   targets=("wq", "wk", "wv", "wo", "gate", "up", "down"),
    head: bool = False) -> Dict[str, Any]:
    """Quantize the projection matrices of a llama param tree (embed and
    norms stay bf16; the embed read is a row gather so quantizing it buys
    nothing). head=True also quantizes lm_head — its bf16 read is 8% of a
    7B int4 decode step's HBM traffic (docs/PERF.md decode attribution);
    serving enables it, training keeps the head full-precision for loss
    fidelity (QLoRA convention)."""
    fn = quantize_int8 if bits == 8 else quantize_int4
    layers = dict(params["layers"])
    for t in targets:
        if t in layers:
            layers[t] = fn(layers[t])
    out = {**params, "layers": layers}
    if head and "lm_head" in out:
        out["lm_head"] = fn(out["lm_head"])
    return out

"""Per-pixel frame-axis attention for the video UNets.

The reference TemporalTransformer (i2vgen util.py:992-1089) attends over
the 24-frame axis independently at every pixel: per (batch, pixel, head)
a [F, F] attention with F=24, d=64. Under XLA this becomes millions of
24x24x64 dots (MXU tiles are 128x128 — ~4% utilization) plus layout
copies between the dot-friendly [B,N,H,F,D] form and the conv-friendly
[B,F,N,C] form — traced at ~11 ms/step at the 2880-pixel site alone
(docs/PERF.md round-4 video notes).

This kernel keeps the conv layout and runs the whole thing on the VPU:
grid over (batch, lane-block, pixel blocks); each step loads q/k/v
[F, bn, 128] tiles (channels on lanes, pixels on sublanes), materializes
the [F, F, bn] score block in VMEM scratch per head, does an exact f32
softmax over the frame axis, and accumulates the output with F fused
multiply-adds.

MEASURED NEGATIVE RESULT (r4, v5e): e2e UNetSD_T2V CFG step 1.52 ->
1.16 steps/s with this kernel engaged. The arithmetic is
2 x F^2 x N x H x D x 2 ~ 11 GFLOP across the step's temporal sites,
and the v5e VPU (~1 Tops/s f32) delivers LESS effective throughput on
it than the XLA path's 24x24x64 MXU dots at ~4% utilization (~8 TF/s
effective) — per-pixel frame attention is MXU work even at 4% tiling
efficiency, and the fori_loop's per-iteration [1, bn, D] ref reads add
loop overhead on top. Kept (with parity + grad tests,
tests/test_temporal_attention.py) as the measured record; re-measure
via VITRON_TATTN=fused on hardware with a wider VPU. The production
path stays the XLA einsum with bf16-probability materialization
(unet_sd_video._temporal_mha).

Backward recomputes through the plain einsum formulation via custom_vjp.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, o_ref, s_ref, *, frames: int, d: int):
    cb = q_ref.shape[-1]
    fdim, bn = q_ref.shape[1], q_ref.shape[2]
    for h in range(cb // d):                        # heads in this lane block
        hd = slice(h * d, (h + 1) * d)
        q = q_ref[0, :, :, hd].astype(jnp.float32)  # [F, bn, D]

        # scores scratch is [G, F, bn]: every frame index stays on the
        # LEADING axis (middle-axis scalar indexing lowers to an
        # unsupported >2D gather in Mosaic). fori_loop with pl.ds ref
        # reads, not Python unrolling: unrolled, Mosaic kept every
        # iteration's buffers alive (262 MB VMEM OOM), and dynamic_slice
        # on loaded VALUES has no TC lowering.
        def sim_body(g, _):
            kg = k_ref[0, pl.ds(g, 1), :, hd].astype(jnp.float32)  # [1,bn,D]
            s_ref[pl.ds(g, 1)] = jnp.sum(q * kg, axis=-1)[None]
            return 0

        jax.lax.fori_loop(0, frames, sim_body, 0)
        s = s_ref[...]                              # [G, F, bn] f32
        s = s - jnp.max(s, axis=0, keepdims=True)
        p = jnp.exp(s)
        s_ref[...] = p / jnp.sum(p, axis=0, keepdims=True)

        def av_body(g, acc):
            pg = s_ref[pl.ds(g, 1)]                 # [1, F, bn]
            vg = v_ref[0, pl.ds(g, 1), :, hd].astype(jnp.float32)  # [1,bn,D]
            return acc + pg.reshape(fdim, bn)[:, :, None] * vg

        acc = jax.lax.fori_loop(
            0, frames, av_body, jnp.zeros(q.shape, jnp.float32))
        o_ref[0, :, :, hd] = acc.astype(o_ref.dtype)


def _pick_bn(n: int) -> int:
    for bn in (512, 480, 384, 360, 320, 256, 240, 180, 128):
        if n % bn == 0:
            return bn
    return 0


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def _fwd(q4, k4, v4, heads: int, interpret: bool = False):
    """q4/k4/v4: [B, F, N, H*D]; the head is picked by the channel-axis
    index map (block minor dim = D on lanes, pixels on sublanes — the
    natural [B,F,N,C] layout streams in with zero relayout)."""
    b, f, n, hc = q4.shape
    d = hc // heads
    bn = _pick_bn(n)
    cb = 128 if hc % 128 == 0 and d <= 128 and 128 % d == 0 else hc
    grid = (b, hc // cb, n // bn)
    spec = pl.BlockSpec((1, f, bn, cb), lambda i, j, l: (i, 0, l, j))
    return pl.pallas_call(
        functools.partial(_kernel, frames=f, d=d),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q4.shape, v4.dtype),
        scratch_shapes=[pltpu.VMEM((f, f, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(q4, k4, v4)


def _xla(q4, k4, v4, heads):
    b, f, n, hc = q4.shape
    d = hc // heads
    q5 = q4.reshape(b, f, n, heads, d)
    k5 = k4.reshape(b, f, n, heads, d)
    v5 = v4.reshape(b, f, n, heads, d)
    sim = jnp.einsum("bfnhd,bgnhd->bnhfg", q5, k5).astype(jnp.float32)
    sim = sim - jax.lax.stop_gradient(jnp.max(sim, axis=-1, keepdims=True))
    attn = jax.nn.softmax(sim, axis=-1).astype(v5.dtype)
    return jnp.einsum("bnhfg,bgnhd->bfnhd", attn, v5).reshape(b, f, n, hc)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _frame_attn(q4, k4, v4, heads):
    return _fwd(q4, k4, v4, heads=heads)


def _vjp_fwd(q4, k4, v4, heads):
    return _frame_attn(q4, k4, v4, heads), (q4, k4, v4)


def _vjp_bwd(heads, res, g):
    _, vjp = jax.vjp(lambda a, b, c: _xla(a, b, c, heads), *res)
    return vjp(g)


_frame_attn.defvjp(_vjp_fwd, _vjp_bwd)


def usable(x, frames: int) -> bool:
    """q/k/v: [B, F, N, C] bf16 on TPU with a tileable pixel count."""
    if os.environ.get("VITRON_TATTN", "xla") != "fused":
        return False
    if x.dtype != jnp.bfloat16 or jax.default_backend() != "tpu":
        return False
    n = x.shape[2]
    return frames <= 32 and n >= 128 and _pick_bn(n) >= 128


def frame_attention(q, k, v, heads: int, scale: float):
    """q/k/v: [B, F, N, H*D] -> [B, F, N, H*D]; softmax over the frame
    axis per (pixel, head) — reference util.py:871-990/1009 semantics."""
    return _frame_attn(q * jnp.asarray(scale, q.dtype), k, v, heads)

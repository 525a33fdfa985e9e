"""Fused GEGLU feed-forward for the diffusion transformers.

The reference FeedForward (GLIGEN attention.py:44-71, i2vgen util.py) is
Linear(C -> 2F) -> split -> a * gelu(gate) -> Linear(F -> C). Under XLA
this materializes the [M, 2F] hidden tensor in HBM (566 MB bf16 at the
video UNet's 720-token sites) and re-reads it for the gelu/second-dot
fusion — the traced cost is ~7 ms per site vs the 4.4 ms MXU roofline of
the two dots (per-fusion xplane attribution, docs/PERF.md round-4 video
notes).

This kernel streams the hidden tensor through VMEM instead: grid over
(M blocks, F blocks); each step computes the a/gate slices with two
[bm, C] x [C, bf] dots, applies the EXACT erf gelu in f32, and
accumulates the second dot into a [bm, C] f32 scratch — the [M, 2F]
tensor never exists in HBM. Weights are passed twice with shifted index
maps so the a/gate halves of the fused [C, 2F] projection stream without
a host-side split copy.

Backward (training) recomputes through the plain XLA formulation via
custom_vjp — the kernel is a forward-path optimization only.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TANH_C = np.sqrt(2.0 / np.pi).astype(np.float32)


def _gelu(x):
    """tanh-form gelu: Mosaic has no erf lowering, and the tanh form's
    deviation from exact erf-gelu (max ~1.2e-3 absolute, at |x|~2 where
    gelu(x)~2) is below the bf16 quantum of the hidden tensor this kernel
    immediately casts to — agreement with the XLA erf path is pinned at
    bf16 tolerance by tests/test_geglu_ff.py."""
    return 0.5 * x * (1.0 + jnp.tanh(_TANH_C * (x + 0.044715 * x * x * x)))


def _kernel(x_ref, wa_ref, wg_ref, ba_ref, bg_ref, w2_ref, b2_ref,
            o_ref, acc_ref, *, nf: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    a = jax.lax.dot_general(x, wa_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    g = jax.lax.dot_general(x, wg_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    a = a + ba_ref[...].astype(jnp.float32)
    g = g + bg_ref[...].astype(jnp.float32)
    t = (a * _gelu(g)).astype(x.dtype)
    acc_ref[...] += jax.lax.dot_general(t, w2_ref[...], (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)

    @pl.when(j == nf - 1)
    def _():
        o_ref[...] = (acc_ref[...]
                      + b2_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _pick_bm(m: int, c: int = 1024) -> int:
    # wide channels shrink the m block: the [bm, C] x/acc/out windows are
    # the VMEM budget (the f-blocked weight windows are fixed 2 MB each)
    cap = 512 if c <= 1024 else 256
    for bm in (512, 480, 448, 384, 320, 256, 128, 64):
        if bm <= cap and m % bm == 0:
            return bm
    return 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def _geglu_ff_fwd(x2d, proj_w, proj_b, out_w, out_b, interpret=False):
    m, c = x2d.shape
    f = out_w.shape[0]
    # bf=512 when it divides f; 256 covers the SD UNet's f=1280 (5 blocks).
    # The gate (usable) guarantees one of them divides.
    bm, bf = _pick_bm(m, c), (512 if f % 512 == 0 else 256)
    nf = f // bf
    grid = (m // bm, nf)
    kernel = functools.partial(_kernel, nf=nf)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, c), lambda i, j: (i, 0)),          # x
            pl.BlockSpec((c, bf), lambda i, j: (0, j)),          # W1 a-half
            pl.BlockSpec((c, bf), lambda i, j, _nf=nf: (0, j + _nf)),  # W1 gate
            pl.BlockSpec((1, bf), lambda i, j: (0, j)),          # b1 a-half
            pl.BlockSpec((1, bf), lambda i, j, _nf=nf: (0, j + _nf)),  # b1 gate
            pl.BlockSpec((bf, c), lambda i, j: (j, 0)),          # W2
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),           # b2
        ],
        out_specs=pl.BlockSpec((bm, c), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, c), x2d.dtype),
        scratch_shapes=[pltpu.VMEM((bm, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x2d, proj_w, proj_w, proj_b.reshape(1, -1), proj_b.reshape(1, -1),
      out_w, out_b.reshape(1, -1))


def _xla_geglu(x, proj_w, proj_b, out_w, out_b):
    h = x @ proj_w + proj_b
    a, gate = jnp.split(h, 2, axis=-1)
    t = a * jax.nn.gelu(gate, approximate=False)
    return t @ out_w + out_b


@jax.custom_vjp
def _geglu_ff(x2d, proj_w, proj_b, out_w, out_b):
    return _geglu_ff_fwd(x2d, proj_w, proj_b, out_w, out_b)


def _vjp_fwd(x2d, proj_w, proj_b, out_w, out_b):
    return _geglu_ff(x2d, proj_w, proj_b, out_w, out_b), \
        (x2d, proj_w, proj_b, out_w, out_b)


def _vjp_bwd(res, g):
    x2d, proj_w, proj_b, out_w, out_b = res
    _, vjp = jax.vjp(_xla_geglu, x2d, proj_w, proj_b, out_w, out_b)
    return vjp(g)


_geglu_ff.defvjp(_vjp_fwd, _vjp_bwd)


def usable(x, proj_w, out_w) -> bool:
    """Kernel engages for large bf16 TPU workloads with tileable shapes."""
    if os.environ.get("VITRON_FFN", "fused") != "fused":
        return False
    if x.dtype != jnp.bfloat16 or jax.default_backend() != "tpu":
        return False
    m = int(np.prod(x.shape[:-1]))
    c, f2 = proj_w.shape
    f = out_w.shape[0]
    # Measured NEGATIVE at the SD UNet's sites (r5): relaxing the gate to
    # m>=2048 / c%64 / f%256 (c=320 is legal — every C-carrying BlockSpec
    # uses the full dim, Mosaic lane-pads it) engaged the kernel at the SD
    # ds=1 (m=8192, c=320, f=1280, bf=256) and ds=2 (m=2048, c=640) sites
    # and LOST e2e: 53.2 -> 47.0 CFG steps/s. At c=320 the per-block dots
    # pad 2.5 lane tiles to 3 (17% waste) and bf=256 halves the dot N-dim,
    # while the XLA path's weakness there (FF out-proj fusions at ~20%
    # roofline) costs less than the kernel's weight re-streaming
    # (m/bm x full-W sweep = 39 MB vs the 2.4 MB resident weights XLA
    # reads once). The kernel stays gated to the video-UNet-class shapes
    # it was measured winning on.
    return (m >= 4096 and _pick_bm(m, c) >= 128 and f2 == 2 * f
            and f % 512 == 0 and c % 128 == 0)


def geglu_ff_fused(x, proj_w, proj_b, out_w, out_b):
    """x: [..., C] -> [..., C]; reference GEGLU FeedForward semantics."""
    shape = x.shape
    out = _geglu_ff(x.reshape(-1, shape[-1]), proj_w, proj_b, out_w, out_b)
    return out.reshape(shape)

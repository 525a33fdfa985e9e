"""Fused int4 dequantize-matmul Pallas kernel.

The plain-XLA int4 path materializes the unpacked weight matrix every step
(nibble shifts/selects don't fuse into the dot), collapsing decode to 9.8
tok/s vs 92.9 int8 (docs/PERF.md). This kernel reads the PACKED matrix from
HBM (quarter the bf16 bytes), unpacks nibbles in VMEM registers, and feeds
the MXU directly.

Trick: packed row r holds K=2r in the low nibble and K=2r+1 in the high
nibble, so with the activations pre-split into even/odd columns the product
is   out = x_even @ lo + x_odd @ hi   — no interleave ever materializes.
Sign extension is two shifts on int8: lo = (w << 4) >> 4, hi = w >> 4
(arithmetic). Per-output-channel scales apply once at the end.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xe_ref, xo_ref, q_ref, s_ref, o_ref, acc, *, n_k):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    # Mosaic only legalizes shifts on i32: widen, extract nibbles with
    # sign-extending shifts, narrow back for the MXU (the i8->i32 widen
    # already sign-extends, so the high nibble is a single arithmetic shift)
    w = q_ref[:].astype(jnp.int32)                 # [bk2, bn]
    lo = jnp.right_shift(jnp.left_shift(w, 28), 28)
    hi = jnp.right_shift(w, 4)
    xe = xe_ref[:]                                 # [M, bk2]
    xo = xo_ref[:]
    acc[:] += jax.lax.dot_general(
        xe, lo.astype(xe.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc[:] += jax.lax.dot_general(
        xo, hi.astype(xo.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == n_k - 1)
    def _fin():
        o_ref[:] = (acc[:] * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def int4_matmul(x: jax.Array, q4: jax.Array, scale: jax.Array,
                block_n: int = 512, block_k2: int = 512,
                interpret: bool = False) -> jax.Array:
    """x: [M, K] (bf16/f32); q4: [K//2, N] packed int8; scale: [1, N] f32.
    Returns [M, N] in x.dtype. Differentiable w.r.t. x (QLoRA-style training
    over a frozen int4 base): the backward pass dequantizes once in XLA —
    training is MXU-bound at prefill shapes, so the unfused unpack is noise."""
    return _int4_matmul_impl(x, q4, scale, block_n, block_k2, interpret)


def _int4_fwd(x, q4, scale, block_n, block_k2, interpret):
    return _int4_matmul_impl(x, q4, scale, block_n, block_k2, interpret), (q4, scale)


def _int4_bwd(block_n, block_k2, interpret, res, g):
    from vitron_tpu.kernels.quantization import dequantize

    q4, scale = res
    w = dequantize({"q4": q4, "s": scale}).astype(g.dtype)   # [K, N]
    return (g @ w.T, None, None)


int4_matmul.defvjp(_int4_fwd, _int4_bwd)


def _int4_matmul_impl(x: jax.Array, q4: jax.Array, scale: jax.Array,
                      block_n: int = 512, block_k2: int = 512,
                      interpret: bool = False) -> jax.Array:
    m, k = x.shape
    k2, n = q4.shape
    assert k == 2 * k2, (k, k2)
    block_n = min(block_n, n)
    block_k2 = min(block_k2, k2)
    # tile M as well: large-batch prefill (e.g. 8 x 256 rows) would
    # otherwise hold all M rows of xe/xo/acc/out in VMEM at once and
    # exceed the 16 MB scoped limit
    block_m = min(512, m) if m > 512 else m
    # pad rows to the bf16 sublane tile (or the m block)
    m_pad = (-m % block_m) if m > 512 else (-m % 16)
    n_pad = -n % block_n
    k2_pad = -k2 % block_k2
    xe = x[:, 0::2]
    xo = x[:, 1::2]
    if m_pad or k2_pad:
        xe = jnp.pad(xe, ((0, m_pad), (0, k2_pad)))
        xo = jnp.pad(xo, ((0, m_pad), (0, k2_pad)))
    q = jnp.pad(q4, ((0, k2_pad), (0, n_pad))) if (k2_pad or n_pad) else q4
    s = jnp.pad(scale, ((0, 0), (0, n_pad))) if n_pad else scale
    mm = m + m_pad
    if mm <= 512:
        block_m = mm
    nm_b = mm // block_m
    nn_b = (n + n_pad) // block_n
    nk_b = (k2 + k2_pad) // block_k2

    out = pl.pallas_call(
        functools.partial(_kernel, n_k=nk_b),
        grid=(nm_b, nn_b, nk_b),
        in_specs=[
            pl.BlockSpec((block_m, block_k2), lambda im, in_, ik: (im, ik),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, block_k2), lambda im, in_, ik: (im, ik),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k2, block_n), lambda im, in_, ik: (ik, in_),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda im, in_, ik: (0, in_),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda im, in_, ik: (im, in_),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((mm, n + n_pad), x.dtype),
        interpret=interpret,
    )(xe, xo, q, s)
    return out[:m, :n]

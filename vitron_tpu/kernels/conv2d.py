"""Pallas 3x3 same-padding convolution — a documented experiment.

XLA's conv lowering on current TPU runtimes runs far below the MXU: a
3x3 conv at 128^2 x 512ch measures ~8 bf16 TF/s while the same chip does
110 TF/s on plain matmuls, and XLA-level im2col/shifted-matmul rewrites
don't help (the strided-slice relayouts dominate, ~14 GB/s effective).
This kernel reformulates the 3x3 stride-1 conv as 9 MXU dots:

- the input stays in HBM (`memory_space=ANY`); each grid step issues one
  manual async copy of its OVERLAPPING [bh+2, W+2, C] row window into a
  VMEM scratch — halos never duplicate in HBM and XLA never copies;
- each tap is a [bh*W, C] @ [C, bd] dot accumulated in fp32; taps are
  cast to bf16 (f32 inputs lose <1e-3 relative, same as XLA's own conv);
- the grid tiles (batch, H rows, output channels) to bound VMEM.

Measured (v5e, 128^2x512): 32 ms bf16 — the ±1 W-axis tap windows force a
sublane relayout per tap in Mosaic, which dominates, so the NATIVE conv
(9.6 ms bf16) still wins and the model helpers keep lax.conv for 3x3
(1x1 convs run as matmuls — a pure win). Kept, with parity + grad tests
(tests/test_conv2d.py), as the starting point for a W-on-lanes layout
variant; the 16 MB default scoped-VMEM limit (override via
compiler_params.vmem_limit_bytes) and the 8-aligned HBM window rule are
the non-obvious constraints discovered here.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 100 * 1024 * 1024


def _kernel(x_hbm, w_ref, o_ref, xs, acc, sem, *, bh, W, n_d):
    b = pl.program_id(0)
    ih = pl.program_id(1)
    C = xs.shape[-1]
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(ih * bh, bh + 2)], xs, sem)
    cp.start()
    cp.wait()
    acc[...] = jnp.zeros_like(acc)
    x = xs[...]
    for dy in range(3):
        for dx in range(3):
            tap = x[dy:dy + bh, dx:dx + W, :].reshape(bh * W, C)
            acc[...] += jax.lax.dot_general(
                tap, w_ref[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    o_ref[...] = acc[...].reshape(o_ref.shape).astype(o_ref.dtype)


def _pick_block(total: int, target: int, quantum: int = 1) -> int:
    """Largest divisor of `total` that is <= target and a multiple of
    quantum; falls back to total."""
    best = total
    for cand in range(min(target, total), quantum - 1, -1):
        if total % cand == 0 and cand % quantum == 0:
            best = cand
            break
    return best


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _conv3x3(x: jax.Array, w: jax.Array, interpret: bool) -> jax.Array:
    bs, h, ww, c = x.shape
    d = w.shape[-1]
    cdtype = jnp.bfloat16 if x.dtype in (jnp.bfloat16, jnp.float32) else x.dtype
    isz = jnp.dtype(cdtype).itemsize
    bd = _pick_block(d, 512, 128)

    def _need(bh):
        # VMEM: x window + taps the compiler may materialize + weights + acc
        return (((bh + 2) * (ww + 2) * c + 9 * bh * ww * c + 9 * c * bd) * isz
                + 2 * bh * ww * bd * 4)

    bh = h
    for cand in range(min(64, h), 0, -1):
        if h % cand == 0 and _need(cand) <= _VMEM_LIMIT:
            bh = cand
            break
    use_kernel = (_need(bh) <= _VMEM_LIMIT and c % 128 == 0 and d % 128 == 0
                  and ww % 8 == 0 and h % bh == 0
                  and (interpret or jax.default_backend() == "tpu"))
    if not use_kernel:
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # W+2 must stay 8-aligned for the HBM window DMA; extra right columns
    # are zero and never read (taps stop at dx=2)
    wp = ww + 2 + (-(ww + 2)) % 8
    xp = jnp.pad(x.astype(cdtype), ((0, 0), (1, 1), (1, wp - ww - 1), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_kernel, bh=bh, W=ww, n_d=d // bd),
        grid=(bs, h // bh, d // bd),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((3, 3, c, bd), lambda b, i, j: (0, 0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, ww, bd), lambda b, i, j: (b, i, 0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bh + 2, wp, c), cdtype),
            pltpu.VMEM((bh * ww, bd), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        out_shape=jax.ShapeDtypeStruct((bs, h, ww, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT + 24 * 1024 * 1024),
        interpret=interpret,
    )(xp, w.astype(cdtype))
    return out


def _conv3x3_fwd(x, w, interpret):
    return _conv3x3(x, w, interpret), (x, w)


def _conv3x3_bwd(interpret, res, g):
    x, w = res
    # dx: correlate g with the spatially-flipped, in/out-swapped kernel —
    # same 3x3/s1/SAME shape, so it reuses the fast forward
    dx = _conv3x3(g, w[::-1, ::-1].transpose(0, 1, 3, 2).astype(g.dtype),
                  interpret)
    # dw[ky,kx] = xpad shifted-tap^T @ g: nine [C, BHW] @ [BHW, D] dots
    bs, h, ww, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    gf = g.reshape(bs * h * ww, -1)
    taps = []
    for dy in range(3):
        for dx_ in range(3):
            t = xp[:, dy:dy + h, dx_:dx_ + ww, :].reshape(bs * h * ww, c)
            taps.append(jax.lax.dot_general(
                t, gf, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
    dw = jnp.stack(taps).reshape(3, 3, c, -1).astype(w.dtype)
    return dx.astype(x.dtype), dw


_conv3x3.defvjp(_conv3x3_fwd, _conv3x3_bwd)


def conv3x3_same(x: jax.Array, w: jax.Array, b: Optional[jax.Array] = None,
                 interpret: bool = False) -> jax.Array:
    """3x3 stride-1 SAME conv, NHWC x HWIO -> NHWC. Falls back to
    lax.conv_general_dilated when the tiling rules don't apply (tiny
    channel counts, odd widths). Differentiable (custom VJP; dx reuses
    the fast kernel)."""
    assert w.shape[0] == w.shape[1] == 3 and w.shape[2] == x.shape[-1], \
        (w.shape, x.shape)
    out = _conv3x3(x, w, interpret)
    return out if b is None else out + b

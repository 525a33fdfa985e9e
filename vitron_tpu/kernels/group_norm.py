"""Pallas group-norm statistics: (sum, sum-of-squares) over spatial rows.

MEASURED NEGATIVE RESULT (round 3) — kept gated behind VITRON_GN=pallas
as an engineering record; the XLA reductions stay production.

Hypothesis: the round-3 video-UNet trace attributes ~110 ms/step to the
XLA reduction fusions that compute group-norm statistics, running at
20-90 GB/s (docs/PERF.md, video UNet section), so a dedicated read-once
Pallas stats pass (one [RB, C] VMEM tile per grid step, row-sum and
row-sum-of-squares on the VPU, accumulated into a resident [2, C] f32
output block) should stream them at DMA speed.

Measurement: the kernel itself hits ~740 GB/s including its producer
(near HBM peak), but the full UNetSD_T2V CFG step gets SLOWER:
1.42 -> 1.30 steps/s (704 -> 769 ms). Same verdict as the r3 "stats as
MXU ones-dots" experiment (757 -> 813 ms): XLA input-fuses the s1/s2
reductions with the activation's producer, so the stats read is free
in-flight, and any opaque call in its place forces an extra
materialization + read. The per-op trace attribution ("110 ms of slow
stat fusions") over-counts what those multi-output fusions already get
for free — only e2e A/B timings are decision-grade here.

The grouped reduction (C -> groups) and the affine apply are XLA in
both paths — they touch only [B, C]-sized tensors and the apply fuses
into the consumer.

Gradients: d(s1)/dx = 1, d(s2)/dx = 2x, so the VJP is one cheap
elementwise expression (training path only).

Reference behavior mirrored: torch GroupNorm(32, eps) as used by SD/VAE/
video UNets (e.g. /root/reference/modules/i2vgen-xl/tools/modules/unet/
unet_t2v.py res blocks).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(x_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)                       # [RB, C]
    st = jnp.stack([jnp.sum(x, 0), jnp.sum(x * x, 0)])       # [2, C]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        o_ref[...] = st

    @pl.when(pl.program_id(1) != 0)
    def _acc():
        o_ref[...] += st


def _pick_rb(r: int, c: int, itemsize: int) -> int:
    """Largest power-of-two row block whose tile fits ~1 MB of VMEM."""
    budget = 1024 * 1024
    rb = 1024
    while rb > 8 and rb * c * itemsize > budget:
        rb //= 2
    return min(rb, max(8, r))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _sums_pallas(x3: jax.Array, interpret: bool = False) -> jax.Array:
    b, r, c = x3.shape
    rb = _pick_rb(r, c, x3.dtype.itemsize)
    n_r = pl.cdiv(r, rb)
    pad = n_r * rb - r
    if pad:
        # zero rows contribute 0 to both sums
        x3 = jnp.pad(x3, ((0, 0), (0, pad), (0, 0)))
    return pl.pallas_call(
        _kernel,
        grid=(b, n_r),
        in_specs=[pl.BlockSpec((pl.Squeezed(), rb, c),
                               lambda bi, ri: (bi, ri, 0))],
        out_specs=pl.BlockSpec((pl.Squeezed(), 2, c),
                               lambda bi, ri: (bi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 2, c), jnp.float32),
        interpret=interpret,
    )(x3)


def _sums_xla(x3: jax.Array) -> jax.Array:
    x32 = x3.astype(jnp.float32)
    return jnp.stack([jnp.sum(x32, 1), jnp.sum(x32 * x32, 1)], axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def gn_sums(x3: jax.Array, use_pallas: bool) -> jax.Array:
    """x3: [B, R, C] -> [B, 2, C] f32 (sum, sum of squares over R)."""
    if use_pallas:
        return _sums_pallas(x3)
    return _sums_xla(x3)


def _fwd(x3, use_pallas):
    return gn_sums(x3, use_pallas), x3


def _bwd(use_pallas, x3, g):
    g1 = g[:, 0][:, None, :]
    g2 = g[:, 1][:, None, :]
    dx = g1 + 2.0 * x3.astype(jnp.float32) * g2
    return (dx.astype(x3.dtype),)


gn_sums.defvjp(_fwd, _bwd)


def group_norm_sums(x3: jax.Array, *, use_pallas: bool | None = None) -> jax.Array:
    """Dispatch: XLA producer-fused reductions (production default —
    measured faster e2e, see module docstring); VITRON_GN=pallas forces
    the read-once kernel for re-measurement on other hardware."""
    if use_pallas is None:
        use_pallas = (os.environ.get("VITRON_GN", "") == "pallas"
                      and jax.default_backend() not in ("cpu",))
    return gn_sums(x3, use_pallas)

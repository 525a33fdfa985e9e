"""Pallas depthwise 2D convolution (stride 1, SAME padding, odd kernel).

Why: XLA lowers ``feature_group_count=C`` convolutions far below the
hardware bound on TPU — the per-channel kernels defeat the MXU path and
the VPU fallback re-reads the input per tap. FocalNet-L's focal levels
(k = 3/5/7/9 at 192..1536 channels, reference
modules/SEEM/demo_code/xdecoder/backbone/focal.py:44-116) are the
dominant cost of SEEM segmentation/tracking, and DaViT's 3x3 conv
position-encoding (davit.py) and the ConvNeXt grounding downsamplers
(GLIGEN, ldm/modules/diffusionmodules/convnext.py 7x7) hit the same
lowering.

Design: the input is zero-padded once in XLA, then each grid step loads
one [hb + k - 1, W + k - 1, 128] halo tile into VMEM (``pl.Element``
block dims give the overlapping windows) and accumulates the k*k
shifted elementwise FMAs entirely on-chip — the activation is read from
HBM exactly once instead of k*k times, and the VPU does the minimal
k^2 * B*H*W*C FMA work with C on lanes.

Gradients: dx is the same kernel with a spatially flipped filter
(depthwise convs are self-adjoint up to a flip); dw is a small XLA
reduction over shifted windows (training-path only, cold).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, o_ref, *, k: int, hb: int, wout: int):
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for dy in range(k):
        for dx in range(k):
            tile = x_ref[dy:dy + hb, dx:dx + wout, :].astype(jnp.float32)
            acc = acc + tile * w_ref[dy, dx, :].astype(jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype)


def _pick_hb(h: int, w: int, k: int, cb: int, itemsize: int) -> int:
    """Largest power-of-two row block whose halo tile fits ~2 MB of VMEM."""
    budget = 2 * 1024 * 1024
    hb = 64
    while hb > 8 and (hb + k - 1) * (w + k - 1) * cb * itemsize > budget:
        hb //= 2
    return min(hb, h)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _dw_pallas(x: jax.Array, w: jax.Array, interpret: bool = False) -> jax.Array:
    b, h, wd, c = x.shape
    k = w.shape[0]
    p = k // 2
    cb = min(128, c)
    hb = _pick_hb(h, wd, k, cb, x.dtype.itemsize)
    n_h = pl.cdiv(h, hb)
    # Pad spatially for SAME semantics; pad H further so every Element
    # halo block [hi*hb, hi*hb + hb + 2p) stays in bounds.
    pad_h_extra = n_h * hb - h
    xp = jnp.pad(x, ((0, 0), (p, p + pad_h_extra), (p, p), (0, 0)))
    kern = functools.partial(_kernel, k=k, hb=hb, wout=wd)
    out = pl.pallas_call(
        kern,
        grid=(b, n_h, pl.cdiv(c, cb)),
        in_specs=[
            # All-Element block (TPU lowering forbids mixing Element with
            # Blocked dims); index map yields ELEMENT offsets, so rows
            # overlap by the 2p halo between adjacent hi steps.
            pl.BlockSpec(
                (pl.Squeezed(), pl.Element(hb + 2 * p, (0, 0)),
                 pl.Element(wd + 2 * p, (0, 0)), pl.Element(cb, (0, 0))),
                lambda bi, hi, ci: (bi, hi * hb, 0, ci * cb)),
            pl.BlockSpec((k, k, cb), lambda bi, hi, ci: (0, 0, ci)),
        ],
        out_specs=pl.BlockSpec(
            (pl.Squeezed(), hb, wd, cb), lambda bi, hi, ci: (bi, hi, 0, ci)),
        out_shape=jax.ShapeDtypeStruct((b, n_h * hb, wd, c), x.dtype),
        interpret=interpret,
    )(xp, w)
    return out[:, :h] if pad_h_extra else out


def _dw_xla(x: jax.Array, w: jax.Array) -> jax.Array:
    k = w.shape[0]
    return jax.lax.conv_general_dilated(
        x, w[:, :, None, :].astype(x.dtype), (1, 1), [(k // 2, k // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1])


def reference(x: jax.Array, w: jax.Array) -> jax.Array:
    """jnp shift-and-scale reference (f32 accumulation) for parity tests."""
    k = w.shape[0]
    p = k // 2
    b, h, wd, c = x.shape
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (p, p), (p, p), (0, 0)))
    acc = jnp.zeros((b, h, wd, c), jnp.float32)
    for dy in range(k):
        for dx in range(k):
            acc = acc + xp[:, dy:dy + h, dx:dx + wd] * w[dy, dx].astype(jnp.float32)
    return acc.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dw(x: jax.Array, w: jax.Array, use_pallas: bool) -> jax.Array:
    if use_pallas:
        return _dw_pallas(x, w)
    return _dw_xla(x, w)


def _dw_fwd(x, w, use_pallas):
    return _dw(x, w, use_pallas), (x, w)


def _dw_bwd(use_pallas, res, g):
    x, w = res
    k = w.shape[0]
    # dL/dx = depthwise conv of g with the spatially flipped filter.
    dx = _dw(g, w[::-1, ::-1], use_pallas).astype(x.dtype)
    # dL/dw[dy, dx, c] = sum_{b,h,w} xp[b, h+dy, w+dx, c] * g[b, h, w, c]
    p = k // 2
    b, h, wd, c = x.shape
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (p, p), (p, p), (0, 0)))
    g32 = g.astype(jnp.float32)
    taps = [jnp.sum(xp[:, dy:dy + h, dx_:dx_ + wd] * g32, axis=(0, 1, 2))
            for dy in range(k) for dx_ in range(k)]
    dw = jnp.stack(taps).reshape(k, k, c).astype(w.dtype)
    return dx, dw


_dw.defvjp(_dw_fwd, _dw_bwd)


def depthwise_conv2d(x: jax.Array, w: jax.Array, bias=None, *,
                     use_pallas: bool | None = None) -> jax.Array:
    """Depthwise conv, NHWC, stride 1, SAME padding, odd square kernel.

    x: [B, H, W, C]; w: [k, k, C] (or [k, k, 1, C] HWIO with one input
    channel per group); bias: [C] or None. Uses the Pallas read-once
    kernel on TPU, XLA's grouped conv elsewhere (CPU tests/dryrun).
    """
    if w.ndim == 4:
        w = w[:, :, 0, :]
    k = w.shape[0]
    if k % 2 != 1 or w.shape[1] != k:
        raise ValueError(f"odd square kernel required, got {w.shape}")
    if use_pallas is None:
        force = os.environ.get("VITRON_DEPTHWISE", "")
        if force:
            use_pallas = force == "pallas"
        else:
            use_pallas = jax.default_backend() not in ("cpu",)
    out = _dw(x, w, use_pallas)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out

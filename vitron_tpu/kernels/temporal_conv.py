"""Pallas fused temporal (frame-axis) k=3 convolution.

The video UNets run a TemporalConvBlock after every res block (reference
modules/i2vgen-xl/tools/modules/unet/util.py:1347-1392): a kernel-3
convolution over the FRAME axis with full C_in x C_out channel mixing,
applied per pixel. The XLA formulation (three frame-shifted matmuls,
`models/diffusion/video_unet.py::temporal_conv_block`) is MXU-optimal on
the dots but materializes three y-sized intermediates plus their pad/
slice/add fusions — ~5x the mandatory HBM traffic, ~100 ms of the
UNetSD_T2V CFG step (r3 trace, docs/PERF.md).

This kernel computes y[:, f] = sum_d x[:, f+d-1] @ w[d] + b in one pass:
each grid step loads a [F+2, block_n, C] frame-padded tile (the whole
frame axis — F is ~24 for the video UNets, a few MB of VMEM) and a
[3, C, block_co] weight tile, and accumulates the three tap dots
(M = F*block_n rows each) on-chip — one y write, zero intermediates.

MEASURED NEGATIVE RESULT (r3, v5e, real UNetSD_T2V sites, bf16,
differential-timed): the XLA shift-matmul path wins or ties everywhere —
  [2,24,2880, 512]  pallas  98.6 TF/s | xla 119.0 TF/s
  [2,24, 720,1024]  pallas 144.8 TF/s | xla 185.6 TF/s
  [2,24, 180,2048]  pallas 181.9 TF/s | xla 179.6 TF/s (tie)
  [2,24,  45,2048]  pallas 177.2 TF/s | xla 222.5 TF/s
XLA's pad/slice/add "intermediates" are fused into the dot epilogues, so
the trace-attributed ~5x traffic never hits HBM; meanwhile this kernel's
M=F*bn dot geometry under-utilizes the MXU at C=512. The XLA path stays
the default (`video_unet.temporal_conv_block`); this kernel is kept as a
tested engineering record, reachable via VITRON_TCONV=pallas.

Gradients: dx is the same kernel with frame-flipped, transposed weights
(conv transpose of a SAME k=3 stride-1 conv); dw/db are small XLA
einsums (training-path only, cold).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(x_ref, w_ref, o_ref, *, f: int):
    # x_ref: [F+2, bn, C] (frame-padded); w_ref: [3, C, bco];
    # o_ref: [F, bn, bco]. One dot per tap with M = F*bn rows.
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for d in range(3):
        acc = acc + jax.lax.dot_general(
            x_ref[d:d + f], w_ref[d], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _tconv_pallas(x: jax.Array, w: jax.Array, interpret: bool = False) -> jax.Array:
    """x: [B, F, N, C]; w: [3, C, Co] -> [B, F, N, Co].

    The whole (padded) frame axis lives in one block — F is ~24 for the
    video UNets, so a [F+2, bn, C] tile is a few MB of VMEM — which keeps
    every BlockSpec Blocked (Mosaic can't window unaligned Element offsets
    on non-minor dims) and contracts the full C per step."""
    b, f, n, c = x.shape
    co = w.shape[-1]
    it = x.dtype.itemsize
    # Scoped-VMEM budget (the TPU stack limit is 16 MB, and Pallas
    # DOUBLE-BUFFERS the in/out blocks): 2x x tile (f+2)*bn*c, 2x w
    # 3*c*bco, 2x out f*bn*bco, plus the f32 acc + dot temp.
    budget = 13 * 1024 * 1024
    bco = bn = None
    for bco in (512, 256, 128, co):
        bco = min(bco, co)
        per_row = 2 * (f + 2) * c * it + f * bco * (2 * it + 12)
        bn = (budget - 2 * 3 * c * bco * it) // per_row
        if bn >= 8:
            break
    bn = max(8, min(bn - bn % 8, 512, -(-n // 8) * 8))
    n_pad = -n % bn  # token rows are independent; zero-pad and slice off
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, n_pad), (0, 0)))
    kern = functools.partial(_kernel, f=f)
    out = pl.pallas_call(
        kern,
        # co is innermost: the x tile stays resident across the co sweep
        grid=(b, (n + n_pad) // bn, pl.cdiv(co, bco)),
        in_specs=[
            pl.BlockSpec((pl.Squeezed(), f + 2, bn, c),
                         lambda bi, ni, ci: (bi, 0, ni, 0)),
            pl.BlockSpec((3, c, bco), lambda bi, ni, ci: (0, 0, ci)),
        ],
        out_specs=pl.BlockSpec(
            (pl.Squeezed(), f, bn, bco), lambda bi, ni, ci: (bi, 0, ni, ci)),
        out_shape=jax.ShapeDtypeStruct((b, f, n + n_pad, co), x.dtype),
        interpret=interpret,
    )(xp, w)
    return out[:, :, :n] if n_pad else out


def _tconv_concat(x: jax.Array, w: jax.Array) -> jax.Array:
    """Single-dot form: concat the three frame-shifted views along C and
    contract [*, 3C] @ [3C, Co] in ONE MXU dot (K is 3x deeper, the
    shifted-add partials never materialize; the concat costs one extra
    write+read of x). A/B vs the shift-matmul form via VITRON_TCONV."""
    b, f, n, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    xcat = jnp.concatenate([xp[:, :-2], xp[:, 1:-1], xp[:, 2:]], axis=-1)
    return xcat @ w.reshape(3 * c, -1).astype(x.dtype)


def _tconv_w8a8(x: jax.Array, w) -> jax.Array:
    """Shift-matmul form on the integer MXU: w is the {"q8t": int8
    [3, C, Co], "s": f32 [Co]} dict of quantization.quantize_tconv. The
    activation is quantized ONCE (dynamic per-row symmetric int8) and all
    three taps consume the same s8 operand — serving-only (no vjp)."""
    b, f, n, c = x.shape
    xf = x.reshape(-1, c).astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                     1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    sw = w["s"].astype(jnp.float32)

    def tap(d):
        acc = jax.lax.dot_general(xq, w["q8t"][d], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        y = (acc.astype(jnp.float32) * sx * sw).astype(x.dtype)
        return y.reshape(b, f, n, -1)

    y = tap(1)
    y0 = tap(0)[:, :-1]
    y2 = tap(2)[:, 1:]
    return (y
            + jnp.pad(y0, ((0, 0), (1, 0), (0, 0), (0, 0)))
            + jnp.pad(y2, ((0, 0), (0, 1), (0, 0), (0, 0))))


def _tconv_xla(x: jax.Array, w: jax.Array) -> jax.Array:
    w0, w1, w2 = (w[i].astype(x.dtype) for i in range(3))
    y = x @ w1
    y0 = (x @ w0)[:, :-1]
    y2 = (x @ w2)[:, 1:]
    return (y
            + jnp.pad(y0, ((0, 0), (1, 0), (0, 0), (0, 0)))
            + jnp.pad(y2, ((0, 0), (0, 1), (0, 0), (0, 0))))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _tconv(x: jax.Array, w: jax.Array, mode: str) -> jax.Array:
    if mode == "pallas":
        return _tconv_pallas(x, w)
    if mode == "concat":
        return _tconv_concat(x, w)
    return _tconv_xla(x, w)


def _tconv_fwd(x, w, mode):
    return _tconv(x, w, mode), (x, w)


def _tconv_bwd(mode, res, g):
    x, w = res
    # dL/dx[f] = sum_d g[f-d+1] @ w[d].T  (frame-flipped transposed taps)
    wt = jnp.flip(w, 0).transpose(0, 2, 1)
    dx = _tconv(g, wt.astype(g.dtype), mode).astype(x.dtype)
    # dL/dw[d] = sum over (b, n) of x[:, f]^T g[:, f+1-d] pairs
    gp = jnp.pad(g, ((0, 0), (1, 1), (0, 0), (0, 0))).astype(jnp.float32)
    f = x.shape[1]
    x32 = x.astype(jnp.float32)
    dw = jnp.stack([
        jnp.einsum("bfnc,bfnd->cd", x32, gp[:, 2 - d:2 - d + f])
        for d in range(3)
    ]).astype(w.dtype)
    return dx, dw


_tconv.defvjp(_tconv_fwd, _tconv_bwd)


def temporal_conv_k3(x: jax.Array, w: jax.Array, bias=None, *,
                     use_pallas: bool | None = None) -> jax.Array:
    """Frame-axis k=3 SAME conv: x [B, F, ..., C], w [3, C, Co] (or the
    torch-layout [3, 1, C, Co]), bias [Co]. Middle dims are flattened for
    the kernel and restored. Default = the XLA shift-matmul path (it wins
    or ties at every measured site, module docstring); the Pallas kernel
    is the tested record behind VITRON_TCONV=pallas."""
    if isinstance(w, dict):
        shape = x.shape
        b, f, c = shape[0], shape[1], shape[-1]
        n = 1
        for s in shape[2:-1]:
            n *= s
        out = _tconv_w8a8(x.reshape(b, f, n, c), w)
        out = out.reshape(shape[:-1] + (out.shape[-1],))
        return out if bias is None else out + bias.astype(out.dtype)
    if w.ndim == 4:
        w = w[:, 0]
    if use_pallas is None:
        mode = os.environ.get("VITRON_TCONV", "xla")
        if jax.default_backend() == "cpu":
            mode = "xla" if mode == "pallas" else mode
    else:
        mode = "pallas" if use_pallas else "xla"
    shape = x.shape
    b, f, c = shape[0], shape[1], shape[-1]
    n = 1
    for s in shape[2:-1]:
        n *= s
    out = _tconv(x.reshape(b, f, n, c), w, mode)
    out = out.reshape(shape[:-1] + (w.shape[-1],))
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out

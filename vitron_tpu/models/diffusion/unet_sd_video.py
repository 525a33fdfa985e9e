"""Faithful ZeroScope/T2V + i2vgen-xl video UNets with checkpoint converters.

JAX re-build of the reference video UNet family
(reference: modules/i2vgen-xl/tools/modules/unet/unet_t2v.py:20-348,
unet_i2vgen.py:20-418, shared blocks util.py:177-1392), matching the real
module structure so upstream ``.pth`` checkpoints convert 1:1:

- UNetSD_T2VBase (ZeroScope-style text-to-video): SD encoder/decoder of
  ResBlocks (each with a built-in TemporalConvBlock_v2,
  util.py:690-730,1347-1392), linear-projection SpatialTransformers and
  conv1d-projection TemporalTransformers at the configured scales, optional
  fps conditioning (unet_t2v.py:98-104).
- UNetSD_I2VGen adds the three image-conditioning streams
  (unet_i2vgen.py:115-132,280-325): a first-frame "concat" stream (conv
  stack + tiny temporal transformer over frame-position maps, added to the
  latent channelwise), a local-image context stream (conv stack + adaptive
  pool -> 64 extra context tokens), and a global CLIP-image stream
  (context_embedding -> num_tokens extra context tokens).

Layout is TPU-native: activations are [B, F, H, W, C]; spatial ops fold
frames into the batch (one big MXU matmul per projection); temporal ops view
the tensor as per-pixel frame sequences. Eval semantics (dropout = no-op).

Faithfully replicated quirks:
- ``concat_dim`` is overridden by ``in_dim`` (unet_i2vgen.py:82);
- the concat stream is added TWICE (unet_i2vgen.py:294-295, upstream
  comments it as a bug that shipped in the released weights);
- sinusoidal embedding is cos-first (util.py:177-189);
- decoder SpatialTransformers are built with context_dim=1024 regardless of
  config (unet_i2vgen.py:210, unet_t2v.py:180) - so context_dim must be
  1024 for the torch model to run at all; we assert the same.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vitron_tpu.models.diffusion.layers import (
    _np,
    basic_transformer_block,
    conv2d,
    conv_w,
    convert_ff,
    convert_ln,
    geglu_ff,
    group_norm,
    layer_norm,
    lin_w,
    timestep_embedding,
    upsample2x_nearest,
)
from vitron_tpu.kernels.quantization import matmul_maybe_quantized as mmq
from vitron_tpu.models.diffusion.video_unet import temporal_conv_block


@dataclasses.dataclass(frozen=True)
class UNetSDVideoConfig:
    variant: str = "t2v"                      # "t2v" | "i2vgen"
    in_dim: int = 4
    dim: int = 512
    y_dim: int = 1024                          # global image-embedding dim
    context_dim: int = 1024
    out_dim: int = 4
    num_tokens: int = 4                        # global-image context tokens
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_heads: int = 8                         # init-block temporal heads
    head_dim: int = 64
    num_res_blocks: int = 2
    attn_scales: Tuple[float, ...] = (0.5, 0.25, 0.125)
    temporal_attention: bool = True
    use_fps_condition: bool = False            # t2v only; i2vgen always has fps
    adapter_transformer_layers: int = 1

    @property
    def concat_dim(self) -> int:
        # unet_i2vgen.py:82 overrides the concat_dim arg with in_dim
        return self.in_dim

    @property
    def embed_dim(self) -> int:
        return self.dim * 4

    @staticmethod
    def i2vgen_xl(**kw) -> "UNetSDVideoConfig":
        """configs/i2vgen_xl_train.yaml:32-51 (dim keeps the ctor default)."""
        base = dict(variant="i2vgen", in_dim=4, y_dim=1024, context_dim=1024,
                    out_dim=4, dim_mult=(1, 2, 4, 4), num_heads=8,
                    head_dim=64, num_res_blocks=2)
        base.update(kw)
        return UNetSDVideoConfig(**base)

    @staticmethod
    def t2v(**kw) -> "UNetSDVideoConfig":
        """configs/t2v_train.yaml:32-51."""
        base = dict(variant="t2v", in_dim=4, y_dim=1024, context_dim=1024,
                    out_dim=4, dim_mult=(1, 2, 4, 4), num_heads=8,
                    head_dim=64, num_res_blocks=2)
        base.update(kw)
        return UNetSDVideoConfig(**base)

    @staticmethod
    def tiny(variant: str = "t2v", **kw) -> "UNetSDVideoConfig":
        base = dict(variant=variant, in_dim=4, dim=32, y_dim=16,
                    context_dim=1024, out_dim=4, num_tokens=4,
                    dim_mult=(1, 2), num_heads=2, head_dim=16,
                    num_res_blocks=1, attn_scales=(1.0, 0.5))
        base.update(kw)
        return UNetSDVideoConfig(**base)


# ------------------------------------------------------------------ plan

def block_plan(cfg: UNetSDVideoConfig):
    """Static layer plan mirroring the reference construction loops
    (unet_t2v.py:110-201 / unet_i2vgen.py:134-231).

    Entries: ('conv_in', cin, cout) | ('res', cin, cout) |
    ('sattn', ch, heads) | ('tattn', ch, heads, inner) |
    ('down', ch) | ('up', ch).
    """
    dim = cfg.dim
    hd = cfg.head_dim
    enc_dims = [dim * u for u in (1,) + tuple(cfg.dim_mult)]
    dec_dims = [dim * u for u in (cfg.dim_mult[-1],) + tuple(cfg.dim_mult[::-1])]
    in0 = cfg.in_dim + (cfg.concat_dim if cfg.variant == "i2vgen" else 0)

    init: List[tuple] = [("conv_in", in0, dim)]
    if cfg.temporal_attention:
        init.append(("tattn", dim, cfg.num_heads, cfg.num_heads * hd))
    input_plan: List[List[tuple]] = [init]
    skips = [dim]
    scale = 1.0
    ch = dim
    for i, (cin, cout) in enumerate(zip(enc_dims[:-1], enc_dims[1:])):
        for j in range(cfg.num_res_blocks):
            blk = [("res", cin, cout)]
            if scale in cfg.attn_scales:
                blk.append(("sattn", cout, cout // hd))
                if cfg.temporal_attention:
                    blk.append(("tattn", cout, cout // hd, cout))
            cin = cout
            input_plan.append(blk)
            skips.append(cout)
            if i != len(cfg.dim_mult) - 1 and j == cfg.num_res_blocks - 1:
                input_plan.append([("down", cout)])
                skips.append(cout)
                scale /= 2.0
        ch = cout

    middle: List[tuple] = [("res", ch, ch), ("sattn", ch, ch // hd)]
    if cfg.temporal_attention:
        middle.append(("tattn", ch, ch // hd, ch))
    middle.append(("res", ch, ch))

    output_plan: List[List[tuple]] = []
    for i, (cin, cout) in enumerate(zip(dec_dims[:-1], dec_dims[1:])):
        for j in range(cfg.num_res_blocks + 1):
            blk = [("res", cin + skips.pop(), cout)]
            if scale in cfg.attn_scales:
                blk.append(("sattn", cout, cout // hd))
                if cfg.temporal_attention:
                    blk.append(("tattn", cout, cout // hd, cout))
            cin = cout
            if i != len(cfg.dim_mult) - 1 and j == cfg.num_res_blocks:
                blk.append(("up", cout))
                scale *= 2.0
            output_plan.append(blk)
    return input_plan, middle, output_plan


# ------------------------------------------------------------------ pieces

def sinusoidal_embedding(t: jax.Array, dim: int) -> jax.Array:
    """util.py:177-189: cos-first (the repo's timestep_embedding matches)."""
    return timestep_embedding(t, dim)


def _mlp2(p, x):
    """nn.Sequential(Linear, SiLU, Linear)."""
    return jax.nn.silu(x @ p["w1"] + p["b1"]) @ p["w2"] + p["b2"]


def adaptive_avg_pool2d(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """torch AdaptiveAvgPool2d on NHWC input, any in/out sizes.

    Output bin i over an axis of length n averages rows
    [floor(i*n/out), ceil((i+1)*n/out)) - computed via an integral image so
    the op is two cumsums + gathers (static shapes, fine under jit)."""

    def pool_axis(x, axis, n_out):
        n_in = x.shape[axis]
        starts = np.array([(i * n_in) // n_out for i in range(n_out)])
        ends = np.array([-((-(i + 1) * n_in) // n_out) for i in range(n_out)])
        cs = jnp.cumsum(x, axis=axis)
        pad = [(0, 0)] * x.ndim
        pad[axis] = (1, 0)
        cs = jnp.pad(cs, pad)
        s = jnp.take(cs, ends, axis=axis) - jnp.take(cs, starts, axis=axis)
        shape = [1] * x.ndim
        shape[axis] = n_out
        return s / jnp.asarray(ends - starts, x.dtype).reshape(shape)

    return pool_axis(pool_axis(x, 1, out_hw[0]), 2, out_hw[1])


def _temporal_mha(p: Dict[str, Any], x: jax.Array, context: jax.Array,
                  heads: int) -> jax.Array:
    """CrossAttention math on [B, F, N, C] attending over the FRAME axis
    per pixel — einsum batch dims (b, n, h) replace the explicit
    [BHW, F, C] transpose (the transposes pushed XLA's global layout
    assignment into batch-minor layouts; see docs/PERF.md video notes)."""
    b, f, n, hc = x.shape
    wq = p["to_q"]
    d = (wq["q8"] if isinstance(wq, dict) else wq).shape[1] // heads
    scale = d ** -0.5
    if context.shape[1] == f:
        from vitron_tpu.kernels import temporal_attention as _ta

        if _ta.usable(x, f):
            # fused VPU frame-attention kernel: the XLA path's per-pixel
            # 24x24x64 dots run at ~4% MXU utilization and drag layout
            # copies with them (docs/PERF.md round-4 video notes)
            q = mmq(x, p["to_q"])
            k = mmq(context, p["to_k"])
            v = mmq(context, p["to_v"])
            out = _ta.frame_attention(q, k, v, heads, scale)
            return mmq(out, p["out_w"]) + p["out_b"]
    q = mmq(x, p["to_q"]).reshape(b, f, n, heads, d)
    k = mmq(context, p["to_k"]).reshape(b, -1, n, heads, d)
    v = mmq(context, p["to_v"]).reshape(b, -1, n, heads, d)
    sim = jnp.einsum("bfnhd,bgnhd->bnhfg", q, k).astype(jnp.float32) * scale
    if v.dtype == jnp.bfloat16:
        # bf16 probability materialization (see layers._mha): per-pixel
        # [F, G] probs round-trip HBM in bf16, rowsum stays f32, normalize
        # after the attn@v dot. f32 path stays exact for parity tests.
        mx = jax.lax.stop_gradient(jnp.max(sim, axis=-1, keepdims=True))
        pr = jnp.exp(sim - mx)
        s = jnp.sum(pr, axis=-1)  # [B, N, H, F] f32
        out = jnp.einsum("bnhfg,bgnhd->bfnhd", pr.astype(jnp.bfloat16), v)
        out = out.astype(jnp.float32) / s.transpose(0, 3, 1, 2)[..., None]
        out = out.astype(v.dtype).reshape(b, f, n, hc)
        return mmq(out, p["out_w"]) + p["out_b"]
    attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
    out = jnp.einsum("bnhfg,bgnhd->bfnhd", attn, v).reshape(b, f, n, hc)
    return mmq(out, p["out_w"]) + p["out_b"]


def _temporal_mha_nmajor(p: Dict[str, Any], x: jax.Array, heads: int) -> jax.Array:
    """Self-attention over the frame axis on the PIXEL-MAJOR view
    [B, N, F, C] (VITRON_TATTN=nmajor experiment): the einsum batch dims
    (b, n) lead the operands, so the frame-attention dots need no interior
    relayout of the big tensor — the one transpose is hoisted to the
    temporal_transformer block boundary."""
    b, n, f, hc = x.shape
    wq = p["to_q"]
    d = (wq["q8"] if isinstance(wq, dict) else wq).shape[1] // heads
    scale = d ** -0.5
    q = mmq(x, p["to_q"]).reshape(b, n, f, heads, d)
    k = mmq(x, p["to_k"]).reshape(b, n, f, heads, d)
    v = mmq(x, p["to_v"]).reshape(b, n, f, heads, d)
    sim = jnp.einsum("bnfhd,bnghd->bnhfg", q, k).astype(jnp.float32) * scale
    if v.dtype == jnp.bfloat16:
        mx = jax.lax.stop_gradient(jnp.max(sim, axis=-1, keepdims=True))
        pr = jnp.exp(sim - mx)
        s = jnp.sum(pr, axis=-1)  # [B, N, H, F] f32
        out = jnp.einsum("bnhfg,bnghd->bnfhd", pr.astype(jnp.bfloat16), v)
        out = out.astype(jnp.float32) / jnp.moveaxis(s, 2, 3)[..., None]
        out = out.astype(v.dtype).reshape(b, n, f, hc)
        return mmq(out, p["out_w"]) + p["out_b"]
    attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
    out = jnp.einsum("bnhfg,bnghd->bnfhd", attn, v).reshape(b, n, f, hc)
    return mmq(out, p["out_w"]) + p["out_b"]


def temporal_transformer(p: Dict[str, Any], x: jax.Array, heads: int) -> jax.Array:
    """TemporalTransformer (util.py:992-1089, use_linear=False,
    only_self_att=True): GN -> conv1d proj (= per-frame linear) -> self-attn
    transformer blocks over the frame axis per pixel -> conv1d proj out ->
    residual. x: [B, F, H, W, C]; computed in [B, F, H*W, C] (plain
    reshape, no transpose) with frame-axis attention via einsum.

    VITRON_TATTN=nmajor: hoist ONE [B,F,N,C] -> [B,N,F,C] transpose pair
    to the block boundary and run every attn + FF pixel-major, instead of
    letting each frame-attention einsum relayout its operands internally
    (the r4 trace's "layout copies between dot- and conv-friendly forms")."""
    b, f, h, w, c = x.shape
    x_in = x
    # stats over (F, H, W, C/g); computed as per-frame partials (see
    # layers.group_norm stat_chunks)
    xn = group_norm(x, p["norm_s"], p["norm_b"], stat_chunks=f)
    y = mmq(xn.reshape(b, f, h * w, c), p["proj_in_w"]) + p["proj_in_b"]
    nmajor = os.environ.get("VITRON_TATTN") == "nmajor"
    if nmajor:
        y = jnp.swapaxes(y, 1, 2)  # [B, N, F, C]
        att = _temporal_mha_nmajor
        for blk in p["blocks"]:
            y = att(blk["attn1"], layer_norm(y, blk["norm1"]), heads) + y
            y = att(blk["attn2"], layer_norm(y, blk["norm2"]), heads) + y
            y = geglu_ff(blk["ff"], layer_norm(y, blk["norm3"])) + y
        y = jnp.swapaxes(y, 1, 2)  # back to [B, F, N, C]
    else:
        for blk in p["blocks"]:
            # BasicTransformerBlock with context_dim=None: attn2 degenerates
            # to self-attention (util.py:1009,536-540)
            yn = layer_norm(y, blk["norm1"])
            y = _temporal_mha(blk["attn1"], yn, yn, heads) + y
            yn = layer_norm(y, blk["norm2"])
            y = _temporal_mha(blk["attn2"], yn, yn, heads) + y
            y = geglu_ff(blk["ff"], layer_norm(y, blk["norm3"])) + y
    y = mmq(y, p["proj_out_w"]) + p["proj_out_b"]
    return y.reshape(b, f, h, w, c) + x_in


def spatial_transformer_linear(p: Dict[str, Any], x: jax.Array, context,
                               heads: int) -> jax.Array:
    """SpatialTransformer with use_linear=True (util.py:311-373):
    GN(eps 1e-6) -> linear proj_in -> blocks over (h w) tokens -> linear
    proj_out -> residual. x: [B, H, W, C], context: [B, L, ctx]."""
    b, h, w, c = x.shape
    x_in = x
    xn = group_norm(x, p["norm_s"], p["norm_b"])
    y = mmq(xn.reshape(b, h * w, c), p["proj_in_w"]) + p["proj_in_b"]
    for blk in p["blocks"]:
        y = basic_transformer_block(blk, y, context, None, heads)
    y = mmq(y, p["proj_out_w"]) + p["proj_out_b"]
    return y.reshape(b, h, w, -1) + x_in


def _res_block(p, x, emb, eps: float = 1e-5):
    """ResBlock (util.py:610-730, use_scale_shift_norm=False in all uses):
    GN -> SiLU -> conv3x3, +emb, GN -> SiLU -> conv3x3(zero), skip; then the
    built-in TemporalConvBlock_v2. x: [B, F, H, W, C]."""
    b, f = x.shape[:2]
    xf = x.reshape((b * f,) + x.shape[2:])
    h = group_norm(xf, p["norm1_s"], p["norm1_b"], eps=eps)
    h = conv2d(jax.nn.silu(h), p["conv1_w"], p["conv1_b"], padding=1)
    emb_out = jax.nn.silu(emb) @ p["emb_w"] + p["emb_b"]
    # cast: keeps the f32 time embedding from promoting downstream convs
    h = h + emb_out.astype(h.dtype)[:, None, None, :]
    h = group_norm(h, p["norm2_s"], p["norm2_b"], eps=eps)
    h = conv2d(jax.nn.silu(h), p["conv2_w"], p["conv2_b"], padding=1)
    skip = xf
    if "skip_w" in p:
        skip = conv2d(xf, p["skip_w"], p["skip_b"])
    h = (skip + h).reshape((b, f) + h.shape[1:])
    return temporal_conv_block(p["tconv"], h)


def transformer_v2(layers_p: Sequence[Dict[str, Any]], x: jax.Array,
                   heads: int, dim_head: int) -> jax.Array:
    """TransformerV2 (util.py:1129-1148): PreNorm attention (+x) then plain
    FeedForward (Linear-GELU-Linear, glu=False) with explicit residual."""
    for lp in layers_p:
        xn = layer_norm(x, lp["norm"])
        qkv = xn @ lp["qkv_w"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, n, inner = q.shape
        q = q.reshape(b, n, heads, dim_head)
        k = k.reshape(b, n, heads, dim_head)
        v = v.reshape(b, n, heads, dim_head)
        sim = jnp.einsum("bnhd,bmhd->bhnm", q, k).astype(jnp.float32)
        sim = sim * (dim_head ** -0.5)
        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, inner)
        x = out @ lp["out_w"] + lp["out_b"] + x
        # FeedForward applied to the post-attention x, no pre-norm
        h = jax.nn.gelu(x @ lp["ff_w1"] + lp["ff_b1"], approximate=False)
        x = h @ lp["ff_w2"] + lp["ff_b2"] + x
    return x


# ------------------------------------------------------------------ forward

def _run_block(entries, layers, x, emb_bt, ctx_bt):
    """x: [B, F, h, w, c]; spatial layers fold F into batch."""
    b, f = x.shape[:2]

    def fold(x):
        return x.reshape((b * f,) + x.shape[2:])

    def unfold(y):
        return y.reshape((b, f) + y.shape[1:])

    for e, p in zip(entries, layers):
        kind = e[0]
        if kind == "conv_in":
            x = unfold(conv2d(fold(x), p["w"], p["b"], padding=1))
        elif kind == "res":
            x = _res_block(p, x, emb_bt)
        elif kind == "sattn":
            x = unfold(spatial_transformer_linear(p, fold(x), ctx_bt, e[2]))
        elif kind == "tattn":
            x = temporal_transformer(p, x, e[2])
        elif kind == "down":
            x = unfold(conv2d(fold(x), p["w"], p["b"], stride=2, padding=1))
        elif kind == "up":
            y = fold(x)
            bt, h, w, c = y.shape
            y = upsample2x_nearest(y)
            x = unfold(conv2d(y, p["w"], p["b"], padding=1))
    return x


def forward(params: Dict[str, Any], cfg: UNetSDVideoConfig,
            x: jax.Array, t: jax.Array,
            y: Optional[jax.Array] = None,
            fps: Optional[jax.Array] = None,
            image: Optional[jax.Array] = None,
            local_image: Optional[jax.Array] = None) -> jax.Array:
    """x: [B, F, H, W, in_dim] latents; t/fps: [B]; y: [B, L, context_dim]
    text tokens (None -> params['zero_y'][:, :1]); image: [B, y_dim] global
    CLIP image embedding (i2vgen); local_image: [B, H, W, in_dim] first-frame
    latent (i2vgen). Returns [B, F, H, W, out_dim].

    Mirrors unet_i2vgen.py:243-346 / unet_t2v.py:210-277.
    """
    b, f, h, w, _ = x.shape
    dtype = x.dtype

    # [Embeddings] (unet_i2vgen.py:297-299; unet_t2v.py:240-245)
    emb = _mlp2(params["time_embed"], sinusoidal_embedding(t, cfg.dim).astype(dtype))
    if cfg.variant == "i2vgen":
        emb = emb + _mlp2(params["fps_embed"],
                          sinusoidal_embedding(fps, cfg.dim).astype(dtype))
    elif cfg.use_fps_condition and fps is not None:
        emb = emb + _mlp2(params["fps_embed"],
                          sinusoidal_embedding(fps, cfg.dim).astype(dtype))
    emb_bt = jnp.repeat(emb, f, axis=0)   # (b f) ordering, b-major

    # [Context] (unet_i2vgen.py:301-323; unet_t2v.py:247-255)
    if y is None:
        y = jnp.broadcast_to(params["zero_y"][:, :1], (b, 1, cfg.context_dim))
    ctx = y.astype(dtype)
    if cfg.variant == "i2vgen":
        # [Concat] first-frame stream (unet_i2vgen.py:280-295)
        li = local_image.astype(dtype)                      # [B, H, W, 4]
        if f > 1:
            # frame 0 = the latent; frame k = constant k/(f-1)
            pos = jnp.arange(1, f, dtype=dtype) / (f - 1)
            pos_maps = jnp.broadcast_to(
                pos[None, :, None, None, None], (b, f - 1, h, w, li.shape[-1]))
            xi = jnp.concatenate([li[:, None], pos_maps], axis=1)
        else:
            xi = li[:, None]
        xi = xi.reshape((b * f,) + xi.shape[2:])
        cp = params["local_concat"]
        xi = conv2d(xi, cp["conv0_w"], cp["conv0_b"], padding=1)
        xi = conv2d(jax.nn.silu(xi), cp["conv1_w"], cp["conv1_b"], padding=1)
        xi = conv2d(jax.nn.silu(xi), cp["conv2_w"], cp["conv2_b"], padding=1)
        cd = xi.shape[-1]
        # (b h w) tokens of f frames for the adapter transformer
        tok = xi.reshape(b, f, h, w, cd).transpose(0, 2, 3, 1, 4)
        tok = tok.reshape(b * h * w, f, cd)
        tok = transformer_v2(params["local_temporal"], tok, heads=2, dim_head=cd)
        concat = tok.reshape(b, h, w, f, cd).transpose(0, 3, 1, 2, 4)
        concat = concat * 2.0  # the doubled add, unet_i2vgen.py:294-295
        x = jnp.concatenate([x, concat.astype(dtype)], axis=-1)

        # [C] local-image context tokens (unet_i2vgen.py:311-316)
        lp = params["local_embed"]
        lc = conv2d(li, lp["conv0_w"], lp["conv0_b"], padding=1)
        lc = adaptive_avg_pool2d(jax.nn.silu(lc), (32, 32))
        lc = conv2d(lc, lp["conv1_w"], lp["conv1_b"], stride=2, padding=1)
        lc = conv2d(jax.nn.silu(lc), lp["conv2_w"], lp["conv2_b"], stride=2, padding=1)
        lc = lc.reshape(b, -1, lc.shape[-1])               # [B, 64, 1024]
        ctx = jnp.concatenate([ctx, lc], axis=1)

        # [C] global-image context tokens (unet_i2vgen.py:319-322)
        if image is not None:
            ic = _mlp2(params["context_embed"], image.astype(dtype))
            ic = ic.reshape(b, cfg.num_tokens, cfg.context_dim)
            ctx = jnp.concatenate([ctx, ic], axis=1)
    ctx_bt = jnp.repeat(ctx, f, axis=0)

    input_plan, middle_plan, output_plan = block_plan(cfg)
    hs = []
    hcur = x
    for entries, layers in zip(input_plan, params["input_blocks"]):
        hcur = _run_block(entries, layers, hcur, emb_bt, ctx_bt)
        hs.append(hcur)
    hcur = _run_block(middle_plan, params["middle_block"], hcur, emb_bt, ctx_bt)
    for entries, layers in zip(output_plan, params["output_blocks"]):
        hcur = jnp.concatenate([hcur, hs.pop()], axis=-1)
        hcur = _run_block(entries, layers, hcur, emb_bt, ctx_bt)

    yf = hcur.reshape((b * f,) + hcur.shape[2:])
    yf = group_norm(yf, params["out_norm_s"], params["out_norm_b"], eps=1e-5)
    yf = conv2d(jax.nn.silu(yf), params["out_w"], params["out_b"], padding=1)
    return yf.reshape((b, f) + yf.shape[1:])


# ------------------------------------------------------------------ init

def _conv_init(key, kh, kw, cin, cout, zero=False):
    if zero:
        return jnp.zeros((kh, kw, cin, cout), jnp.float32)
    return jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) / np.sqrt(kh * kw * cin)


def _lin_init(key, cin, cout, zero=False):
    if zero:
        return jnp.zeros((cin, cout), jnp.float32)
    return jax.random.normal(key, (cin, cout), jnp.float32) / np.sqrt(cin)


def init_params(rng: jax.Array, cfg: UNetSDVideoConfig) -> Dict[str, Any]:
    ki = iter(jax.random.split(rng, 4096))
    ed = cfg.embed_dim

    def mlp2(cin, cmid, cout, zero_last=False):
        return {"w1": _lin_init(next(ki), cin, cmid), "b1": jnp.zeros((cmid,)),
                "w2": _lin_init(next(ki), cmid, cout, zero=zero_last),
                "b2": jnp.zeros((cout,))}

    def ln(c):
        return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}

    def attn(qdim, kdim, inner):
        return {"to_q": _lin_init(next(ki), qdim, inner),
                "to_k": _lin_init(next(ki), kdim, inner),
                "to_v": _lin_init(next(ki), kdim, inner),
                "out_w": _lin_init(next(ki), inner, qdim),
                "out_b": jnp.zeros((qdim,))}

    def tblock(dim_, ctx):
        return {"attn1": attn(dim_, dim_, dim_),
                "attn2": attn(dim_, ctx if ctx else dim_, dim_),
                "ff": {"proj_w": _lin_init(next(ki), dim_, dim_ * 8),
                       "proj_b": jnp.zeros((dim_ * 8,)),
                       "out_w": _lin_init(next(ki), dim_ * 4, dim_),
                       "out_b": jnp.zeros((dim_,))},
                "norm1": ln(dim_), "norm2": ln(dim_), "norm3": ln(dim_)}

    def tconv_init(c):
        p = {}
        for i in range(4):
            p[f"norm{i}_s"] = jnp.ones((c,))
            p[f"norm{i}_b"] = jnp.zeros((c,))
            p[f"conv{i}_w"] = (jnp.zeros((3, 1, c, c)) if i == 3 else
                               jax.random.normal(next(ki), (3, 1, c, c)) / np.sqrt(3 * c))
            p[f"conv{i}_b"] = jnp.zeros((c,))
        return p

    def build(e):
        if e[0] == "conv_in":
            return {"w": _conv_init(next(ki), 3, 3, e[1], e[2]),
                    "b": jnp.zeros((e[2],))}
        if e[0] == "res":
            cin, cout = e[1], e[2]
            p = {"norm1_s": jnp.ones((cin,)), "norm1_b": jnp.zeros((cin,)),
                 "conv1_w": _conv_init(next(ki), 3, 3, cin, cout),
                 "conv1_b": jnp.zeros((cout,)),
                 "emb_w": _lin_init(next(ki), ed, cout), "emb_b": jnp.zeros((cout,)),
                 "norm2_s": jnp.ones((cout,)), "norm2_b": jnp.zeros((cout,)),
                 "conv2_w": _conv_init(next(ki), 3, 3, cout, cout, zero=True),
                 "conv2_b": jnp.zeros((cout,)),
                 "tconv": tconv_init(cout)}
            if cin != cout:
                p["skip_w"] = _conv_init(next(ki), 1, 1, cin, cout)
                p["skip_b"] = jnp.zeros((cout,))
            return p
        if e[0] == "sattn":
            ch = e[1]
            inner = e[2] * cfg.head_dim
            return {"norm_s": jnp.ones((ch,)), "norm_b": jnp.zeros((ch,)),
                    "proj_in_w": _lin_init(next(ki), ch, inner),
                    "proj_in_b": jnp.zeros((inner,)),
                    "proj_out_w": _lin_init(next(ki), inner, ch, zero=True),
                    "proj_out_b": jnp.zeros((ch,)),
                    "blocks": [tblock(inner, cfg.context_dim)]}
        if e[0] == "tattn":
            ch, heads, inner = e[1], e[2], e[3]
            return {"norm_s": jnp.ones((ch,)), "norm_b": jnp.zeros((ch,)),
                    "proj_in_w": _lin_init(next(ki), ch, inner),
                    "proj_in_b": jnp.zeros((inner,)),
                    "proj_out_w": _lin_init(next(ki), inner, ch, zero=True),
                    "proj_out_b": jnp.zeros((ch,)),
                    "blocks": [tblock(inner, None)]}
        if e[0] in ("down", "up"):
            return {"w": _conv_init(next(ki), 3, 3, e[1], e[1]),
                    "b": jnp.zeros((e[1],))}
        raise ValueError(e[0])

    input_plan, middle_plan, output_plan = block_plan(cfg)
    params: Dict[str, Any] = {
        "time_embed": mlp2(cfg.dim, ed, ed),
        "input_blocks": [[build(e) for e in blk] for blk in input_plan],
        "middle_block": [build(e) for e in middle_plan],
        "output_blocks": [[build(e) for e in blk] for blk in output_plan],
        "out_norm_s": jnp.ones((cfg.dim,)), "out_norm_b": jnp.zeros((cfg.dim,)),
        "out_w": _conv_init(next(ki), 3, 3, cfg.dim, cfg.out_dim, zero=True),
        "out_b": jnp.zeros((cfg.out_dim,)),
    }
    if cfg.variant == "i2vgen" or cfg.use_fps_condition:
        params["fps_embed"] = mlp2(cfg.dim, ed, ed, zero_last=True)
    if cfg.variant == "i2vgen":
        cd = cfg.concat_dim
        params["context_embed"] = mlp2(cfg.y_dim, ed, cfg.context_dim * cfg.num_tokens)
        params["local_concat"] = {
            "conv0_w": _conv_init(next(ki), 3, 3, 4, cd * 4), "conv0_b": jnp.zeros((cd * 4,)),
            "conv1_w": _conv_init(next(ki), 3, 3, cd * 4, cd * 4), "conv1_b": jnp.zeros((cd * 4,)),
            "conv2_w": _conv_init(next(ki), 3, 3, cd * 4, cd), "conv2_b": jnp.zeros((cd,)),
        }
        inner = 2 * cd
        params["local_temporal"] = [
            {"norm": ln(cd),
             "qkv_w": _lin_init(next(ki), cd, inner * 3),
             "out_w": _lin_init(next(ki), inner, cd), "out_b": jnp.zeros((cd,)),
             # FeedForward(dim, mlp_dim): hidden = 4*dim, out = mlp_dim (=dim)
             "ff_w1": _lin_init(next(ki), cd, cd * 4), "ff_b1": jnp.zeros((cd * 4,)),
             "ff_w2": _lin_init(next(ki), cd * 4, cd), "ff_b2": jnp.zeros((cd,))}
            for _ in range(cfg.adapter_transformer_layers)]
        # the reference hardcodes 1024 output channels
        # (unet_i2vgen.py:132) == context_dim in every shipped config;
        # parametrize so tiny configs stay self-consistent
        params["local_embed"] = {
            "conv0_w": _conv_init(next(ki), 3, 3, 4, cd * 8), "conv0_b": jnp.zeros((cd * 8,)),
            "conv1_w": _conv_init(next(ki), 3, 3, cd * 8, cd * 16), "conv1_b": jnp.zeros((cd * 16,)),
            "conv2_w": _conv_init(next(ki), 3, 3, cd * 16, cfg.context_dim),
            "conv2_b": jnp.zeros((cfg.context_dim,)),
        }
    return params


# ----------------------------------------------------------- quantization

_QUANT_DOT_KEYS = frozenset((
    "to_q", "to_k", "to_v", "out_w",     # spatial/temporal attention
    "proj_w",                            # GEGLU FF up-projection
    "proj_in_w", "proj_out_w",           # transformer in/out projections
))


def quantize_params(params: Dict[str, Any], min_channels: int = 64,
                    min_dot_dim: Optional[int] = None,
                    min_tconv_dim: Optional[int] = None) -> Dict[str, Any]:
    """W8A8 serving quantization — spatial convs ONLY by default.

    Every [3, 3, ci, co] spatial conv with ci, co >= min_channels goes to
    the integer MXU (2x bf16 peak) as the {"qc", "s"} dict `layers.conv2d`
    dispatches: per-out-channel int8 weight, dynamic per-tensor int8
    activation. Measured on the ZeroScope CFG step: 1.52 -> 1.646 steps/s
    (+8%; standalone conv sites run 1.66-1.97x bf16 INCLUDING the dynamic
    activation-quant chain — docs/PERF.md round-4 W8A8 notes).

    Two more classes are implemented + parity-tested but measured
    NEGATIVE e2e, so they are off unless explicitly enabled:

    - transformer projection dots (attention q/k/v/out, GEGLU FF, proj
      in/out) with both dims >= min_dot_dim -> the {"q8", "s"} dict of
      `matmul_maybe_quantized` (per-row dynamic activation int8).
      conv+all-dots: 1.35 steps/s; conv+attention-dots-only (fused GEGLU
      kept engaged): 1.56 — the per-row quant materialization passes
      lose to XLA's dot-epilogue fusions, same physics as the r3
      GN-stats arms.
    - temporal k=3 conv taps [3, 1, c, co] with dims >= min_tconv_dim ->
      the {"q8t", "s"} dict of `temporal_conv_k3`. conv+tconv: 1.564 —
      three separate int8 dots lose to the bf16 shift-matmul whose
      pad/add partials fuse into dot epilogues.

    Everything else — conv_in/out (IO-critical, ci or co of 4), time-
    embedding MLPs (2-row dots, precision-critical), norms, the attention
    probability math (bf16) — stays full precision. Inference only: the
    quantized tree is not differentiable.

    Gated: serving applies it when VITRON_VUNET_QUANT=w8a8 (see
    video_pipelines); bench reports the quantized rate as a labeled extra
    next to the honest bf16 headline."""
    from vitron_tpu.kernels.quantization import (
        quantize_conv2d,
        quantize_int8_a8,
        quantize_tconv,
    )

    import jax.numpy as jnp

    def _float(v) -> bool:
        # double application must be a no-op: an already-quantized int8
        # 'qc'/'q8t' leaf matches the shape predicates and would otherwise
        # be re-wrapped into a nested dict that crashes at trace time
        return jnp.issubdtype(v.dtype, jnp.floating)

    def conv_eligible(v) -> bool:
        return (hasattr(v, "ndim") and v.ndim == 4 and _float(v)
                and v.shape[0] == 3 and v.shape[1] == 3
                and v.shape[2] >= min_channels and v.shape[3] >= min_channels)

    def dot_eligible(k, v) -> bool:
        return (min_dot_dim is not None and k in _QUANT_DOT_KEYS
                and hasattr(v, "ndim") and v.ndim == 2 and _float(v)
                and min(v.shape) >= min_dot_dim)

    def tconv_eligible(v) -> bool:
        # TemporalConvBlock_v2 taps, torch layout [3, 1, C, Co]
        return (min_tconv_dim is not None
                and hasattr(v, "ndim") and v.ndim == 4 and _float(v)
                and v.shape[0] == 3 and v.shape[1] == 1
                and v.shape[2] >= min_tconv_dim and v.shape[3] >= min_tconv_dim)

    def walk(p):
        if isinstance(p, dict):
            if ("qc" in p or "q8" in p or "q8t" in p) and "s" in p:
                return p
            return {k: (quantize_conv2d(v) if conv_eligible(v)
                        else quantize_int8_a8(v) if dot_eligible(k, v)
                        else quantize_tconv(v) if tconv_eligible(v)
                        else walk(v))
                    for k, v in p.items()}
        if isinstance(p, (list, tuple)):
            return type(p)(walk(v) for v in p)
        return p

    return walk(params)


def quant_default() -> bool:
    """VITRON_VUNET_QUANT=w8a8 opts serving into the quantized video UNet."""
    import os

    return os.environ.get("VITRON_VUNET_QUANT", "") == "w8a8"


# ------------------------------------------------------------------ convert

def _convert_attn(sd, pfx):
    return {"to_q": lin_w(sd, pfx + "to_q.weight"),
            "to_k": lin_w(sd, pfx + "to_k.weight"),
            "to_v": lin_w(sd, pfx + "to_v.weight"),
            "out_w": lin_w(sd, pfx + "to_out.0.weight"),
            "out_b": _np(sd[pfx + "to_out.0.bias"])}


def _convert_tblock(sd, pfx):
    return {"attn1": _convert_attn(sd, pfx + "attn1."),
            "attn2": _convert_attn(sd, pfx + "attn2."),
            "ff": convert_ff(sd, pfx + "ff."),
            "norm1": convert_ln(sd, pfx + "norm1."),
            "norm2": convert_ln(sd, pfx + "norm2."),
            "norm3": convert_ln(sd, pfx + "norm3.")}


def _conv1d_w(sd, key):
    """torch Conv1d k=1 [O, I, 1] -> [I, O] matrix."""
    return np.ascontiguousarray(_np(sd[key])[:, :, 0].T)


def _conv3d_t_w(sd, key):
    """torch Conv3d (3,1,1) [O, I, 3, 1, 1] -> HWIO [3, 1, I, O]."""
    w = _np(sd[key])[:, :, :, 0, 0]           # [O, I, 3]
    return np.ascontiguousarray(w.transpose(2, 1, 0))[:, None]


def _convert_tconv(sd, pfx):
    """TemporalConvBlock_v2 (util.py:1347-1392): conv1 = Seq(GN,SiLU,Conv3d),
    conv2..4 = Seq(GN,SiLU,Dropout,Conv3d). NB upstream attr typo
    'temopral_conv' is the caller's key, handled by the caller."""
    p = {}
    for i in range(4):
        seq = f"conv{i + 1}"
        conv_idx = 2 if i == 0 else 3
        p[f"norm{i}_s"] = _np(sd[f"{pfx}{seq}.0.weight"])
        p[f"norm{i}_b"] = _np(sd[f"{pfx}{seq}.0.bias"])
        p[f"conv{i}_w"] = _conv3d_t_w(sd, f"{pfx}{seq}.{conv_idx}.weight")
        p[f"conv{i}_b"] = _np(sd[f"{pfx}{seq}.{conv_idx}.bias"])
    return p


def _convert_res(sd, pfx):
    p = {"norm1_s": _np(sd[pfx + "in_layers.0.weight"]),
         "norm1_b": _np(sd[pfx + "in_layers.0.bias"]),
         "conv1_w": conv_w(sd, pfx + "in_layers.2.weight"),
         "conv1_b": _np(sd[pfx + "in_layers.2.bias"]),
         "emb_w": lin_w(sd, pfx + "emb_layers.1.weight"),
         "emb_b": _np(sd[pfx + "emb_layers.1.bias"]),
         "norm2_s": _np(sd[pfx + "out_layers.0.weight"]),
         "norm2_b": _np(sd[pfx + "out_layers.0.bias"]),
         "conv2_w": conv_w(sd, pfx + "out_layers.3.weight"),
         "conv2_b": _np(sd[pfx + "out_layers.3.bias"]),
         "tconv": _convert_tconv(sd, pfx + "temopral_conv.")}
    if (pfx + "skip_connection.weight") in sd:
        p["skip_w"] = conv_w(sd, pfx + "skip_connection.weight")
        p["skip_b"] = _np(sd[pfx + "skip_connection.bias"])
    return p


def _convert_sattn(sd, pfx):
    """SpatialTransformer with use_linear=True: proj_in/out are Linear."""
    return {"norm_s": _np(sd[pfx + "norm.weight"]),
            "norm_b": _np(sd[pfx + "norm.bias"]),
            "proj_in_w": lin_w(sd, pfx + "proj_in.weight"),
            "proj_in_b": _np(sd[pfx + "proj_in.bias"]),
            "proj_out_w": lin_w(sd, pfx + "proj_out.weight"),
            "proj_out_b": _np(sd[pfx + "proj_out.bias"]),
            "blocks": [_convert_tblock(sd, pfx + "transformer_blocks.0.")]}


def _convert_tattn(sd, pfx):
    """TemporalTransformer with use_linear=False: proj_in/out are Conv1d."""
    return {"norm_s": _np(sd[pfx + "norm.weight"]),
            "norm_b": _np(sd[pfx + "norm.bias"]),
            "proj_in_w": _conv1d_w(sd, pfx + "proj_in.weight"),
            "proj_in_b": _np(sd[pfx + "proj_in.bias"]),
            "proj_out_w": _conv1d_w(sd, pfx + "proj_out.weight"),
            "proj_out_b": _np(sd[pfx + "proj_out.bias"]),
            "blocks": [_convert_tblock(sd, pfx + "transformer_blocks.0.")]}


def _convert_mlp2(sd, pfx):
    return {"w1": lin_w(sd, pfx + "0.weight"), "b1": _np(sd[pfx + "0.bias"]),
            "w2": lin_w(sd, pfx + "2.weight"), "b2": _np(sd[pfx + "2.bias"])}


def convert_torch(sd: Dict[str, Any], cfg: UNetSDVideoConfig) -> Dict[str, Any]:
    """Reference UNetSD_T2VBase / UNetSD_I2VGen state_dict -> param tree.

    Accepts raw state dicts or checkpoint dicts whose keys carry a leading
    'module.' (DDP) prefix.
    """
    if any(k.startswith("module.") for k in sd):
        sd = {k[len("module."):] if k.startswith("module.") else k: v
              for k, v in sd.items()}

    def convert_entry(e, pfx):
        if e[0] == "conv_in":
            return {"w": conv_w(sd, pfx + "weight"), "b": _np(sd[pfx + "bias"])}
        if e[0] == "res":
            return _convert_res(sd, pfx)
        if e[0] == "sattn":
            return _convert_sattn(sd, pfx)
        if e[0] == "tattn":
            return _convert_tattn(sd, pfx)
        if e[0] == "down":
            return {"w": conv_w(sd, pfx + "op.weight"),
                    "b": _np(sd[pfx + "op.bias"])}
        if e[0] == "up":
            return {"w": conv_w(sd, pfx + "conv.weight"),
                    "b": _np(sd[pfx + "conv.bias"])}
        raise ValueError(e[0])

    input_plan, middle_plan, output_plan = block_plan(cfg)
    params: Dict[str, Any] = {
        "time_embed": _convert_mlp2(sd, "time_embed."),
        # Downsample blocks are appended bare (unet_t2v.py:149), not wrapped
        # in a ModuleList, so they have no inner index in the state dict
        "input_blocks": [
            [convert_entry(e, f"input_blocks.{i}." if e[0] == "down"
                           else f"input_blocks.{i}.{j}.")
             for j, e in enumerate(blk)]
            for i, blk in enumerate(input_plan)],
        "middle_block": [convert_entry(e, f"middle_block.{j}.")
                         for j, e in enumerate(middle_plan)],
        "output_blocks": [
            [convert_entry(e, f"output_blocks.{i}.{j}.") for j, e in enumerate(blk)]
            for i, blk in enumerate(output_plan)],
        "out_norm_s": _np(sd["out.0.weight"]), "out_norm_b": _np(sd["out.0.bias"]),
        "out_w": conv_w(sd, "out.2.weight"), "out_b": _np(sd["out.2.bias"]),
    }
    if "fps_embedding.0.weight" in sd:
        params["fps_embed"] = _convert_mlp2(sd, "fps_embedding.")
    if cfg.variant == "i2vgen":
        params["context_embed"] = _convert_mlp2(sd, "context_embedding.")
        params["local_concat"] = {
            "conv0_w": conv_w(sd, "local_image_concat.0.weight"),
            "conv0_b": _np(sd["local_image_concat.0.bias"]),
            "conv1_w": conv_w(sd, "local_image_concat.2.weight"),
            "conv1_b": _np(sd["local_image_concat.2.bias"]),
            "conv2_w": conv_w(sd, "local_image_concat.4.weight"),
            "conv2_b": _np(sd["local_image_concat.4.bias"]),
        }
        params["local_temporal"] = []
        for l in range(cfg.adapter_transformer_layers):
            base = f"local_temporal_encoder.layers.{l}."
            params["local_temporal"].append({
                "norm": convert_ln(sd, base + "0.norm."),
                "qkv_w": lin_w(sd, base + "0.fn.to_qkv.weight"),
                "out_w": lin_w(sd, base + "0.fn.to_out.0.weight"),
                "out_b": _np(sd[base + "0.fn.to_out.0.bias"]),
                "ff_w1": lin_w(sd, base + "1.net.0.0.weight"),
                "ff_b1": _np(sd[base + "1.net.0.0.bias"]),
                "ff_w2": lin_w(sd, base + "1.net.2.weight"),
                "ff_b2": _np(sd[base + "1.net.2.bias"]),
            })
        params["local_embed"] = {
            "conv0_w": conv_w(sd, "local_image_embedding.0.weight"),
            "conv0_b": _np(sd["local_image_embedding.0.bias"]),
            "conv1_w": conv_w(sd, "local_image_embedding.3.weight"),
            "conv1_b": _np(sd["local_image_embedding.3.bias"]),
            "conv2_w": conv_w(sd, "local_image_embedding.5.weight"),
            "conv2_b": _np(sd["local_image_embedding.5.bias"]),
        }
    return params

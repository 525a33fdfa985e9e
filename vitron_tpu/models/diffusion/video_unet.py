"""Video diffusion UNet: spatial SD blocks + temporal attention/conv.

JAX re-design of the ZeroScope / i2vgen-xl video UNet family (reference:
modules/i2vgen-xl/tools/modules/unet/{unet_t2v,unet_i2vgen}.py and
util.py:871-1400; at runtime Vitron invokes the equivalent diffusers
pipelines, app.py:228-240,324-342):

- spatial ResBlocks + cross-attention transformers run with frames folded
  into the batch (one big MXU matmul per projection);
- after each spatial block: a TemporalConvBlock (4x [GN -> SiLU -> (3,1,1)
  temporal conv], zero-initialized last conv so it starts as identity,
  util.py:1347-1392) and after each spatial attention: a
  TemporalAttentionBlock (GroupNorm -> per-pixel attention over the frame
  axis, util.py:871-990);
- image-to-video (i2vgen) conditioning: CLIP image embedding appended to
  the context tokens + first-frame latent concatenated channelwise.

Params reuse unet2d's res/attention structures, so GLIGEN/SD spatial
weights can seed a video model.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vitron_tpu.kernels.temporal_conv import temporal_conv_k3
from vitron_tpu.models.diffusion import unet2d
from vitron_tpu.models.diffusion.layers import (conv2d, group_norm,
                                                timestep_embedding,
                                                upsample2x_nearest)
from vitron_tpu.models.diffusion.unet2d import UNetConfig, block_plan


@dataclasses.dataclass(frozen=True)
class VideoUNetConfig:
    spatial: UNetConfig = dataclasses.field(default_factory=UNetConfig.sd_v1)
    num_frames: int = 24
    temporal_heads: int = 8

    @staticmethod
    def zeroscope(**kw) -> "VideoUNetConfig":
        kw.setdefault("spatial", UNetConfig(
            model_channels=320, channel_mult=(1, 2, 4, 4), num_res_blocks=2,
            attention_resolutions=(4, 2, 1), num_heads=8, context_dim=1024))
        kw.setdefault("num_frames", 24)
        return VideoUNetConfig(**kw)

    @staticmethod
    def i2vgen(**kw) -> "VideoUNetConfig":
        kw.setdefault("spatial", UNetConfig(
            in_channels=8,  # latent + first-frame latent concat
            model_channels=320, channel_mult=(1, 2, 4, 4), num_res_blocks=2,
            attention_resolutions=(4, 2, 1), num_heads=8, context_dim=1024))
        kw.setdefault("num_frames", 16)
        return VideoUNetConfig(**kw)

    @staticmethod
    def tiny(**kw) -> "VideoUNetConfig":
        kw.setdefault("spatial", UNetConfig.tiny())
        kw.setdefault("num_frames", 4)
        kw.setdefault("temporal_heads", 2)
        return VideoUNetConfig(**kw)


def temporal_conv_block(p, x):
    """x: [B, T, H, W, C]; 4x (GN -> SiLU -> temporal conv k3) with identity
    residual (util.py:1347-1392). Temporal conv == conv over T per pixel."""
    identity = x

    def tconv(x, w_, b_):
        # k=3 temporal conv as THREE frame-shifted matmuls: the only conv in
        # the graph whose spatial dims were (T, HW) — expressing it as dots
        # keeps the whole video UNet's op mix identical to the image UNet
        # (NHWC convs + matmuls) so XLA's layout assignment stays row-major
        # (954 -> 717 ms/step with the reduction groupnorm, docs/PERF.md).
        # y[:, t] = x[:, t-1] @ w0 + x[:, t] @ w1 + x[:, t+1] @ w2, zero pad
        # — temporal_conv_k3 owns both formulations (XLA default, Pallas
        # behind VITRON_TCONV=pallas) so the math lives in one place.
        # A quantized {"q8t","s"} dict routes to the integer-MXU W8A8 path.
        if isinstance(w_, dict):
            return temporal_conv_k3(x, w_, b_.astype(x.dtype))
        return temporal_conv_k3(x, w_.astype(x.dtype), b_.astype(x.dtype))

    def gn(x, s, bias):
        # torch GroupNorm on [b, c, t, h, w]: stats per group over (t, h, w);
        # eps matches torch's GroupNorm default (the diffusion transformers
        # use 1e-6, but these blocks are built with the default).
        # stat_chunks=T: per-frame stat partials (layers.group_norm)
        return group_norm(x, s, bias, eps=1e-5, stat_chunks=x.shape[1])

    for i in range(4):
        x = gn(x, p[f"norm{i}_s"], p[f"norm{i}_b"])
        x = jax.nn.silu(x)
        x = tconv(x, p[f"conv{i}_w"], p[f"conv{i}_b"])
    return identity + x


def temporal_attention_block(p, x, heads: int):
    """x: [B, T, H, W, C]; GroupNorm then attention over the frame axis per
    pixel (util.py:871-990, no rotary by default)."""
    b, t, h, w, c = x.shape
    identity = x
    # stats over (t, h, w), per-frame partials (layers.group_norm)
    xn = group_norm(x, p["norm_s"], p["norm_b"], stat_chunks=t)
    xn = xn.transpose(0, 2, 3, 1, 4).reshape(b, h * w, t, c)
    qkv = xn @ p["qkv_w"] + p["qkv_b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    d = c // heads
    q = q.reshape(b, h * w, t, heads, d) * (d ** -0.5)
    k = k.reshape(b, h * w, t, heads, d)
    v = v.reshape(b, h * w, t, heads, d)
    sim = jnp.einsum("bpihd,bpjhd->bphij", q, k).astype(jnp.float32)
    sim = sim - jax.lax.stop_gradient(jnp.max(sim, axis=-1, keepdims=True))
    attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
    out = jnp.einsum("bphij,bpjhd->bpihd", attn, v).reshape(b, h * w, t, c)
    out = out @ p["out_w"] + p["out_b"]
    out = out.reshape(b, h, w, t, c).transpose(0, 3, 1, 2, 4)
    return identity + out


def _t_conv_init(ki, c):
    def cw():
        return jax.random.normal(next(ki), (3, 1, c, c), jnp.float32) / np.sqrt(3 * c)

    p = {}
    for i in range(4):
        p[f"norm{i}_s"] = jnp.ones((c,))
        p[f"norm{i}_b"] = jnp.zeros((c,))
        p[f"conv{i}_w"] = cw() if i < 3 else jnp.zeros((3, 1, c, c))
        p[f"conv{i}_b"] = jnp.zeros((c,))
    return p


def _t_attn_init(ki, c):
    return {
        "norm_s": jnp.ones((c,)), "norm_b": jnp.zeros((c,)),
        "qkv_w": jax.random.normal(next(ki), (c, 3 * c), jnp.float32) / np.sqrt(c),
        "qkv_b": jnp.zeros((3 * c,)),
        "out_w": jnp.zeros((c, c)),  # zero-init so temporal starts as identity
        "out_b": jnp.zeros((c,)),
    }


def init_params(rng: jax.Array, cfg: VideoUNetConfig,
                grounding: bool = False) -> Dict[str, Any]:
    params = unet2d.init_params(rng, cfg.spatial, grounding=grounding)
    ki = iter(jax.random.split(jax.random.fold_in(rng, 7), 512))
    input_plan, middle_plan, output_plan = block_plan(cfg.spatial)

    def temporals(plan):
        out = []
        for entries in plan:
            t = []
            for e in entries:
                if e[0] == "res":
                    t.append(("tconv", _t_conv_init(ki, e[2])))
                elif e[0] == "attn":
                    t.append(("tattn", _t_attn_init(ki, e[1])))
                else:
                    t.append((None, {}))
            out.append(t)
        return out

    params["t_input"] = [[d for _, d in blk] for blk in temporals(input_plan)]
    params["t_middle"] = [d for _, d in temporals([middle_plan])[0]]
    params["t_output"] = [[d for _, d in blk] for blk in temporals(output_plan)]
    return params


def _run_block(entries, layers, t_layers, x, emb, context, cfg, heads):
    """x: [B, T, h, w, c]. Spatial layers fold T into batch; temporal layers
    operate on the 5D tensor."""
    b, t = x.shape[:2]
    for e, p, tp in zip(entries, layers, t_layers):
        kind = e[0]
        if kind == "conv_in":
            y = conv2d(x.reshape((b * t,) + x.shape[2:]), p["w"], p["b"], padding=1)
            x = y.reshape((b, t) + y.shape[1:])
        elif kind == "res":
            y = unet2d._res_block(p, x.reshape((b * t,) + x.shape[2:]), emb)
            x = y.reshape((b, t) + y.shape[1:])
            x = temporal_conv_block(tp, x)
        elif kind == "attn":
            from vitron_tpu.models.diffusion.layers import spatial_transformer

            y = spatial_transformer(
                p, x.reshape((b * t,) + x.shape[2:]), context, None,
                cfg.spatial.num_heads)
            x = y.reshape((b, t) + y.shape[1:])
            x = temporal_attention_block(tp, x, heads)
        elif kind == "down":
            y = conv2d(x.reshape((b * t,) + x.shape[2:]), p["w"], p["b"],
                       stride=2, padding=1)
            x = y.reshape((b, t) + y.shape[1:])
        elif kind == "up":
            bt = b * t
            y = x.reshape((bt,) + x.shape[2:])
            _, h, w, c = y.shape
            y = upsample2x_nearest(y)
            y = conv2d(y, p["w"], p["b"], padding=1)
            x = y.reshape((b, t) + y.shape[1:])
    return x


def forward(params: Dict[str, Any], cfg: VideoUNetConfig, x: jax.Array,
            timesteps: jax.Array, context: jax.Array) -> jax.Array:
    """x: [B, T, H, W, in_ch]; timesteps [B]; context [B, L, ctx] (already
    including any image-conditioning tokens). Returns eps [B, T, H, W, out]."""
    b, t = x.shape[:2]
    mc = cfg.spatial.model_channels
    t_emb = timestep_embedding(timesteps, mc)
    emb = jax.nn.silu(t_emb @ params["time_w1"] + params["time_b1"])
    emb = emb @ params["time_w2"] + params["time_b2"]
    # spatial layers see (B*T) rows; broadcast the time embedding per frame
    emb_bt = jnp.repeat(emb, t, axis=0)
    ctx_bt = jnp.repeat(context, t, axis=0)

    input_plan, middle_plan, output_plan = block_plan(cfg.spatial)
    hs = []
    h = x
    for entries, layers, tl in zip(input_plan, params["input_blocks"], params["t_input"]):
        h = _run_block(entries, layers, tl, h, emb_bt, ctx_bt, cfg, cfg.temporal_heads)
        hs.append(h)
    h = _run_block(middle_plan, params["middle_block"], params["t_middle"],
                   h, emb_bt, ctx_bt, cfg, cfg.temporal_heads)
    for entries, layers, tl in zip(output_plan, params["output_blocks"], params["t_output"]):
        h = jnp.concatenate([h, hs.pop()], axis=-1)
        h = _run_block(entries, layers, tl, h, emb_bt, ctx_bt, cfg, cfg.temporal_heads)
    y = h.reshape((b * t,) + h.shape[2:])
    y = group_norm(y, params["out_norm_s"], params["out_norm_b"])
    y = conv2d(jax.nn.silu(y), params["out_w"], params["out_b"], padding=1)
    return y.reshape((b, t) + y.shape[1:])

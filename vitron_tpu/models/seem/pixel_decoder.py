"""FPN pixel decoder with a 6-layer transformer encoder on res5.

JAX re-design of TransformerEncoderPixelDecoder (reference:
modules/SEEM/demo_code/xdecoder/body/encoder/transformer_encoder_fpn.py:
23-330; config yaml:48-58: conv_dim=mask_dim=512, GroupNorm, 6 encoder
layers, in features res2..res5). DETR-style post-norm encoder layers with
sine positional embeddings; FPN top-down nearest upsampling.

Returns (mask_features, multi_scale_features[res5_y, res4_y, res3_y]) —
the transformer-encoder intermediate feature is dropped (unused by SEEM).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class PixelDecoderConfig:
    conv_dim: int = 512
    mask_dim: int = 512
    num_enc_layers: int = 6
    num_heads: int = 8
    dim_feedforward: int = 2048
    in_channels: Tuple[int, ...] = (192, 384, 768, 1536)  # res2..res5
    gn_groups: int = 32

    @staticmethod
    def tiny(**kw) -> "PixelDecoderConfig":
        base = dict(conv_dim=32, mask_dim=32, num_enc_layers=2, num_heads=4,
                    dim_feedforward=64, in_channels=(16, 32))
        base.update(kw)
        return PixelDecoderConfig(**base)


def position_embedding_sine(h: int, w: int, dim: int, temperature: float = 10000.0):
    """DETR PositionEmbeddingSine(normalize=True) -> [h*w, dim]."""
    half = dim // 2
    y = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None]
    x = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :]
    eps = 1e-6
    scale = 2 * math.pi
    y = y / (h + eps) * scale
    x = x / (w + eps) * scale
    dim_t = temperature ** (2 * (jnp.arange(half, dtype=jnp.float32) // 2) / half)
    pos_x = x[..., None] / dim_t
    pos_y = (y / 1.0)[..., None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=-1).reshape(1, w, half)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=-1).reshape(h, 1, half)
    pos_y = jnp.broadcast_to(pos_y, (h, w, half))
    pos_x = jnp.broadcast_to(pos_x, (h, w, half))
    return jnp.concatenate([pos_y, pos_x], axis=-1).reshape(h * w, dim)


def _conv(x, w, b=None, stride=1, padding=0):
    # 1x1 convs as matmuls: XLA's conv lowering runs far below the MXU on
    # current TPU runtimes (see kernels/conv2d.py for the 3x3 experiments)
    if w.shape[0] == w.shape[1] == 1 and stride == 1 and padding == 0:
        out = x @ w[0, 0].astype(x.dtype)
        return out if b is None else out + b.astype(out.dtype)
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def _gn(x, p, groups):
    from vitron_tpu.models.diffusion.layers import group_norm

    return group_norm(x, p["scale"], p["bias"], groups=groups, eps=1e-5)


def _ln(x, p, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]).astype(x.dtype)


def _mha(q, k, v, p, heads):
    """torch nn.MultiheadAttention equivalent: packed in_proj, out_proj."""
    e = q.shape[-1]
    d = e // heads
    wq, wk, wv = jnp.split(p["in_w"], 3, axis=1)
    bq, bk, bv = jnp.split(p["in_b"], 3, axis=0)
    qq = (q @ wq + bq).reshape(q.shape[0], q.shape[1], heads, d)
    kk = (k @ wk + bk).reshape(k.shape[0], k.shape[1], heads, d)
    vv = (v @ wv + bv).reshape(v.shape[0], v.shape[1], heads, d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qq, kk).astype(jnp.float32) / np.sqrt(d)
    probs = jax.nn.softmax(logits, axis=-1).astype(vv.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, vv).reshape(q.shape[0], q.shape[1], e)
    return out @ p["out_w"] + p["out_b"]


def _encoder_layer(p, src, pos, heads):
    """DETR post-norm encoder layer: q=k=src+pos."""
    q = src + pos
    src2 = _mha(q, q, src, p["attn"], heads)
    src = _ln(src + src2, p["norm1"])
    h = jax.nn.relu(src @ p["fc1_w"] + p["fc1_b"])
    src2 = h @ p["fc2_w"] + p["fc2_b"]
    return _ln(src + src2, p["norm2"])


def forward_features(params: Dict[str, Any], cfg: PixelDecoderConfig,
                     features: List[jax.Array]):
    """features: [res2..res5] NHWC -> (mask_features [B,H/4,W/4,mask_dim],
    multi_scale [res5_y, res4_y, res3_y] in conv_dim)."""
    n = len(features)
    multi_scale = []
    y = None
    for idx in range(n - 1, -1, -1):  # top-down: res5 first
        x = features[idx]
        lvl = params["levels"][idx]
        if idx == n - 1:
            b, h, w, _ = x.shape
            src = _conv(x, lvl["input_proj_w"], lvl["input_proj_b"])
            pos = position_embedding_sine(h, w, cfg.conv_dim).astype(src.dtype)[None]
            t = src.reshape(b, h * w, cfg.conv_dim)
            for enc in params["encoder"]:
                t = _encoder_layer(enc, t, pos, cfg.num_heads)
            t = t.reshape(b, h, w, cfg.conv_dim)
            y = jax.nn.relu(_gn(_conv(t, lvl["out_w"], lvl.get("out_b"), padding=1),
                                lvl["out_norm"], cfg.gn_groups))
        else:
            cur = _gn(_conv(x, lvl["lat_w"], lvl.get("lat_b")), lvl["lat_norm"], cfg.gn_groups)
            bb, hh, ww, cc = cur.shape
            y = cur + jax.image.resize(y, (bb, hh, ww, cc), method="nearest")
            y = jax.nn.relu(_gn(_conv(y, lvl["out_w"], lvl.get("out_b"), padding=1),
                                lvl["out_norm"], cfg.gn_groups))
        if len(multi_scale) < 3:
            multi_scale.append(y)
    mask_features = _conv(y, params["mask_w"], params["mask_b"], padding=1)
    return mask_features, multi_scale


def init_params(rng: jax.Array, cfg: PixelDecoderConfig) -> Dict[str, Any]:
    ki = iter(jax.random.split(rng, 256))
    cd = cfg.conv_dim

    def dense(cin, cout):
        return jax.random.normal(next(ki), (cin, cout), jnp.float32) / np.sqrt(cin)

    def conv(kh, kw, cin, cout):
        return jax.random.normal(next(ki), (kh, kw, cin, cout), jnp.float32) / np.sqrt(kh * kw * cin)

    def gn():
        return {"scale": jnp.ones((cd,)), "bias": jnp.zeros((cd,))}

    def lnp(c):
        return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}

    levels = []
    for idx, cin in enumerate(cfg.in_channels):
        if idx == len(cfg.in_channels) - 1:
            levels.append({
                "input_proj_w": conv(1, 1, cin, cd), "input_proj_b": jnp.zeros((cd,)),
                "out_w": conv(3, 3, cd, cd), "out_norm": gn(),
            })
        else:
            levels.append({
                "lat_w": conv(1, 1, cin, cd), "lat_norm": gn(),
                "out_w": conv(3, 3, cd, cd), "out_norm": gn(),
            })
    encoder = []
    for _ in range(cfg.num_enc_layers):
        encoder.append({
            "attn": {"in_w": dense(cd, 3 * cd), "in_b": jnp.zeros((3 * cd,)),
                     "out_w": dense(cd, cd), "out_b": jnp.zeros((cd,))},
            "norm1": lnp(cd), "norm2": lnp(cd),
            "fc1_w": dense(cd, cfg.dim_feedforward), "fc1_b": jnp.zeros((cfg.dim_feedforward,)),
            "fc2_w": dense(cfg.dim_feedforward, cd), "fc2_b": jnp.zeros((cd,)),
        })
    return {
        "levels": levels,
        "encoder": encoder,
        "mask_w": conv(3, 3, cd, cfg.mask_dim), "mask_b": jnp.zeros((cfg.mask_dim,)),
    }


def convert_torch(sd, cfg: PixelDecoderConfig,
                  prefix: str = "sem_seg_head.pixel_decoder.") -> Dict[str, Any]:
    """Reference keys (transformer_encoder_fpn.py): adapter_{i}/layer_{i}
    (1-indexed from res2), input_proj, transformer.encoder.layers.{i}.*,
    mask_features. detectron2 Conv2d stores fused .norm submodule."""
    def _np(x):
        return x if isinstance(x, np.ndarray) else x.detach().float().cpu().numpy()

    def g(k):
        return _np(sd[prefix + k])

    def cw(k):
        return np.ascontiguousarray(g(k).transpose(2, 3, 1, 0))

    def gn(k):
        return {"scale": g(k + ".weight"), "bias": g(k + ".bias")}

    n = len(cfg.in_channels)
    levels = []
    for idx in range(n):
        if idx == n - 1:
            levels.append({
                "input_proj_w": cw("input_proj.weight"),
                "input_proj_b": g("input_proj.bias"),
                "out_w": cw(f"layer_{idx + 1}.weight"),
                "out_norm": gn(f"layer_{idx + 1}.norm"),
            })
        else:
            levels.append({
                "lat_w": cw(f"adapter_{idx + 1}.weight"),
                "lat_norm": gn(f"adapter_{idx + 1}.norm"),
                "out_w": cw(f"layer_{idx + 1}.weight"),
                "out_norm": gn(f"layer_{idx + 1}.norm"),
            })
    encoder = []
    for i in range(cfg.num_enc_layers):
        e = f"transformer.encoder.layers.{i}."
        encoder.append({
            "attn": {
                "in_w": np.ascontiguousarray(g(e + "self_attn.in_proj_weight").T),
                "in_b": g(e + "self_attn.in_proj_bias"),
                "out_w": np.ascontiguousarray(g(e + "self_attn.out_proj.weight").T),
                "out_b": g(e + "self_attn.out_proj.bias"),
            },
            "norm1": gn(e + "norm1"), "norm2": gn(e + "norm2"),
            "fc1_w": np.ascontiguousarray(g(e + "linear1.weight").T),
            "fc1_b": g(e + "linear1.bias"),
            "fc2_w": np.ascontiguousarray(g(e + "linear2.weight").T),
            "fc2_b": g(e + "linear2.bias"),
        })
    return {
        "levels": levels,
        "encoder": encoder,
        "mask_w": cw("mask_features.weight"), "mask_b": g("mask_features.bias"),
    }

"""GLIGEN grounding-net variants: canny/depth/hed/normal/sem/keypoint.

JAX rebuild of the remaining GLIGEN PositionNets (reference:
modules/GLIGEN/ldm/modules/diffusionmodules/*_grounding_net.py and
*_grounding_downsampler.py; the text and text+image variants live in
layers.py::position_net / position_net_with_image):

- canny / depth / hed / normal: resize the hint map, run a ConvNeXt-tiny
  backbone (convnext.py:54-118), 196 grid tokens + learned pos embedding,
  3-layer MLP to 768-d grounding tokens, null-feature masking;
- sem: same with a 1x1-ish in_conv from num_sem channels to RGB first
  (sem_grounding_net.py:20);
- keypoint: per-person + per-keypoint learned embeddings + Fourier xy
  (keypoint_grounding_net.py:9-60);
- downsamplers: small conv stacks (or pure resize for hed) whose output is
  concatenated to the UNet input channels.

NHWC layouts; hint resizing uses jax.image.resize (torch's nearest/bicubic
differ sub-pixel from jax on up/downsampling — parity tests feed inputs at
the target size where the resize is identity).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vitron_tpu.kernels.depthwise_conv import depthwise_conv2d
from vitron_tpu.models.diffusion.layers import (
    _np,
    conv2d,
    conv_w,
    fourier_embed,
    lin_w,
)

CONVNEXT_TINY_DEPTHS = (3, 3, 9, 3)
CONVNEXT_TINY_DIMS = (96, 192, 384, 768)


# ------------------------------------------------------------- ConvNeXt-tiny

def _ln(x, w, b, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return (((x32 - mu) * jax.lax.rsqrt(var + eps)) * w + b).astype(x.dtype)


def convnext_forward(params: Dict[str, Any], x: jax.Array) -> jax.Array:
    """ConvNeXt feature trunk (convnext.py:54-118, heads removed upstream).
    x: [B, H, W, 3] -> [B, H/32, W/32, dims[-1]]."""
    for stage_i, stage in enumerate(params["stages"]):
        ds = params["downsample"][stage_i]
        if stage_i == 0:
            x = conv2d(x, ds["conv_w"], ds["conv_b"], stride=4)
            x = _ln(x, ds["norm_w"], ds["norm_b"])
        else:
            x = _ln(x, ds["norm_w"], ds["norm_b"])
            x = conv2d(x, ds["conv_w"], ds["conv_b"], stride=2)
        for blk in stage:
            inp = x
            # depthwise 7x7 (read-once Pallas kernel on TPU)
            h = depthwise_conv2d(x, blk["dw_w"].astype(x.dtype), blk["dw_b"])
            h = _ln(h, blk["norm_w"], blk["norm_b"])
            h = jax.nn.gelu(h @ blk["pw1_w"] + blk["pw1_b"], approximate=False)
            h = h @ blk["pw2_w"] + blk["pw2_b"]
            x = inp + blk["gamma"] * h
    return x


def convnext_init(rng: jax.Array, depths=CONVNEXT_TINY_DEPTHS,
                  dims=CONVNEXT_TINY_DIMS) -> Dict[str, Any]:
    ki = iter(jax.random.split(rng, 256))

    def conv(kh, kw, cin, cout, groups=1):
        fan = kh * kw * cin // groups
        return jax.random.normal(next(ki), (kh, kw, cin // groups, cout)) * 0.02 / np.sqrt(max(fan, 1) / 49)

    downsample = []
    stages = []
    for i, (d, dim) in enumerate(zip(depths, dims)):
        if i == 0:
            downsample.append({"conv_w": conv(4, 4, 3, dim),
                               "conv_b": jnp.zeros((dim,)),
                               "norm_w": jnp.ones((dim,)),
                               "norm_b": jnp.zeros((dim,))})
        else:
            downsample.append({"norm_w": jnp.ones((dims[i - 1],)),
                               "norm_b": jnp.zeros((dims[i - 1],)),
                               "conv_w": conv(2, 2, dims[i - 1], dim),
                               "conv_b": jnp.zeros((dim,))})
        blocks = []
        for _ in range(d):
            blocks.append({
                "dw_w": conv(7, 7, dim, dim, groups=dim),
                "dw_b": jnp.zeros((dim,)),
                "norm_w": jnp.ones((dim,)), "norm_b": jnp.zeros((dim,)),
                "pw1_w": jax.random.normal(next(ki), (dim, 4 * dim)) * 0.02,
                "pw1_b": jnp.zeros((4 * dim,)),
                "pw2_w": jax.random.normal(next(ki), (4 * dim, dim)) * 0.02,
                "pw2_b": jnp.zeros((dim,)),
                "gamma": jnp.full((dim,), 1e-6),
            })
        stages.append(blocks)
    return {"downsample": downsample, "stages": stages}


def convert_convnext_torch(sd, pfx: str = "convnext_tiny_backbone.",
                           depths=CONVNEXT_TINY_DEPTHS) -> Dict[str, Any]:
    def dw_w(key):
        # torch depthwise conv [C, 1, 7, 7] -> HWIO [7, 7, 1, C]
        return np.ascontiguousarray(_np(sd[key]).transpose(2, 3, 1, 0))

    downsample = []
    for i in range(len(depths)):
        base = f"{pfx}downsample_layers.{i}."
        if i == 0:
            downsample.append({"conv_w": conv_w(sd, base + "0.weight"),
                               "conv_b": _np(sd[base + "0.bias"]),
                               "norm_w": _np(sd[base + "1.weight"]),
                               "norm_b": _np(sd[base + "1.bias"])})
        else:
            downsample.append({"norm_w": _np(sd[base + "0.weight"]),
                               "norm_b": _np(sd[base + "0.bias"]),
                               "conv_w": conv_w(sd, base + "1.weight"),
                               "conv_b": _np(sd[base + "1.bias"])})
    stages = []
    for i, d in enumerate(depths):
        blocks = []
        for j in range(d):
            base = f"{pfx}stages.{i}.{j}."
            blocks.append({
                "dw_w": dw_w(base + "dwconv.weight"),
                "dw_b": _np(sd[base + "dwconv.bias"]),
                "norm_w": _np(sd[base + "norm.weight"]),
                "norm_b": _np(sd[base + "norm.bias"]),
                "pw1_w": lin_w(sd, base + "pwconv1.weight"),
                "pw1_b": _np(sd[base + "pwconv1.bias"]),
                "pw2_w": lin_w(sd, base + "pwconv2.weight"),
                "pw2_b": _np(sd[base + "pwconv2.bias"]),
                "gamma": _np(sd[base + "gamma"]),
            })
        stages.append(blocks)
    return {"downsample": downsample, "stages": stages}


# ---------------------------------------------------------- hint PositionNets

def _mlp3(p, x):
    """nn.Sequential(Linear, SiLU, Linear, SiLU, Linear)."""
    h = jax.nn.silu(x @ p["w0"] + p["b0"])
    h = jax.nn.silu(h @ p["w1"] + p["b1"])
    return h @ p["w2"] + p["b2"]


def position_net_hint(p: Dict[str, Any], hint: jax.Array, mask: jax.Array,
                      resize_input: int = 448) -> jax.Array:
    """Shared canny/depth/hed/normal PositionNet (canny_grounding_net.py:
    13-62): hint [B, H, W, 3] -> [B, (r/32)^2, out_dim] grounding tokens;
    mask [B] (0 -> the whole map replaced by the learned null feature).
    The sem variant adds an in_conv first ('in_conv' in params,
    sem_grounding_net.py:20,45)."""
    b = hint.shape[0]
    if hint.shape[1] != resize_input or hint.shape[2] != resize_input:
        hint = jax.image.resize(
            hint, (b, resize_input, resize_input, hint.shape[-1]),
            method="nearest")
    if "in_conv" in p:
        hint = conv2d(hint, p["in_conv"]["w"], p["in_conv"]["b"], padding=1)
    feats = convnext_forward(p["convnext"], hint)      # [B, r/32, r/32, C]
    n = feats.shape[1] * feats.shape[2]
    # torch reshapes the channels-first map as (B, C, N) then transposes,
    # so token order is row-major over (h, w) — same as NHWC flatten
    objs = feats.reshape(b, n, feats.shape[-1])
    m = mask.reshape(-1, 1, 1).astype(objs.dtype)
    objs = objs * m + (1.0 - m) * p["null_feature"]
    objs = objs + p["pos_embedding"]
    return _mlp3(p["linears"], objs)


def position_net_keypoint(p: Dict[str, Any], points: jax.Array,
                          masks: jax.Array) -> jax.Array:
    """Keypoint PositionNet (keypoint_grounding_net.py:9-60): points
    [B, max_persons*17, 2] in [0, 1]; masks [B, max_persons*17]."""
    n = points.shape[0]
    max_persons = p["person_embeddings"].shape[0]
    out_dim = p["person_embeddings"].shape[1]
    person = jnp.repeat(p["person_embeddings"], 17, axis=0)   # (P*17, C)
    keypoint = jnp.tile(p["keypoint_embeddings"], (max_persons, 1))
    person = jnp.broadcast_to((person + keypoint)[None],
                              (n, max_persons * 17, out_dim))
    xy = fourier_embed(points, 8)
    m = masks[..., None].astype(xy.dtype)
    person = person * m + (1.0 - m) * p["null_person"]
    xy = xy * m + (1.0 - m) * p["null_xy"]
    return _mlp3(p["linears"], jnp.concatenate([person, xy], axis=-1))


# ------------------------------------------------------------- downsamplers

def grounding_downsampler(p: Dict[str, Any], hint: jax.Array,
                          resize_input: int = 256,
                          grayscale: bool = False,
                          mode: str = "bicubic") -> jax.Array:
    """Conv downsampler (canny/normal/sem *_grounding_downsampler.py):
    resize -> conv s2 -> SiLU -> conv s2; output concatenated to the UNet
    input channels. hint: [B, H, W, C]."""
    b = hint.shape[0]
    if grayscale:  # canny: keep channel 0 only (the map is grayscale RGB)
        hint = hint[..., :1]
    if hint.shape[1] != resize_input or hint.shape[2] != resize_input:
        method = {"bicubic": "cubic", "nearest": "nearest"}[mode]
        hint = jax.image.resize(
            hint, (b, resize_input, resize_input, hint.shape[-1]),
            method=method, antialias=False)
    h = conv2d(hint, p["conv1_w"], p["conv1_b"], stride=2, padding=1)
    return conv2d(jax.nn.silu(h), p["conv2_w"], p["conv2_b"], stride=2,
                  padding=1)


def grounding_downsampler_hed(hint: jax.Array) -> jax.Array:
    """hed: parameter-free bicubic resize of the grayscale map to 64x64
    (hed_grounding_downsampler.py:8-18)."""
    b = hint.shape[0]
    return jax.image.resize(hint[..., :1], (b, 64, 64, 1), method="cubic",
                            antialias=False)


# ------------------------------------------------------------------ init

def init_hint_position_net(rng: jax.Array, resize_input: int = 448,
                           out_dim: int = 768, in_dim: int = 0) -> Dict[str, Any]:
    ks = jax.random.split(rng, 8)
    num_tokens = (resize_input // 32) ** 2
    c = CONVNEXT_TINY_DIMS[-1]
    p = {
        "convnext": convnext_init(ks[0]),
        "pos_embedding": jax.random.normal(ks[1], (1, num_tokens, c)) * 0.02,
        "null_feature": jnp.zeros((c,)),
        "linears": {
            "w0": jax.random.normal(ks[2], (c, 512)) / np.sqrt(c),
            "b0": jnp.zeros((512,)),
            "w1": jax.random.normal(ks[3], (512, 512)) / np.sqrt(512),
            "b1": jnp.zeros((512,)),
            "w2": jax.random.normal(ks[4], (512, out_dim)) / np.sqrt(512),
            "b2": jnp.zeros((out_dim,)),
        },
    }
    if in_dim:  # sem variant
        p["in_conv"] = {
            "w": jax.random.normal(ks[5], (3, 3, in_dim, 3)) / np.sqrt(9 * in_dim),
            "b": jnp.zeros((3,)),
        }
    return p


def init_keypoint_position_net(rng: jax.Array, max_persons: int = 8,
                               out_dim: int = 768) -> Dict[str, Any]:
    ks = jax.random.split(rng, 4)
    pos_dim = 8 * 2 * 2
    return {
        "person_embeddings": jnp.zeros((max_persons, out_dim)),
        "keypoint_embeddings": jnp.zeros((17, out_dim)),
        "null_person": jnp.zeros((out_dim,)),
        "null_xy": jnp.zeros((pos_dim,)),
        "linears": {
            "w0": jax.random.normal(ks[0], (out_dim + pos_dim, 512)) / np.sqrt(out_dim + pos_dim),
            "b0": jnp.zeros((512,)),
            "w1": jax.random.normal(ks[1], (512, 512)) / np.sqrt(512),
            "b1": jnp.zeros((512,)),
            "w2": jax.random.normal(ks[2], (512, out_dim)) / np.sqrt(512),
            "b2": jnp.zeros((out_dim,)),
        },
    }


# ----------------------------------------------------------------- convert

def convert_hint_position_net(sd, pfx: str = "position_net.") -> Dict[str, Any]:
    p = {
        "convnext": convert_convnext_torch(sd, pfx + "convnext_tiny_backbone."),
        "pos_embedding": _np(sd[pfx + "pos_embedding"]),
        "null_feature": _np(sd[pfx + "null_feature"]),
        "linears": {
            "w0": lin_w(sd, pfx + "linears.0.weight"), "b0": _np(sd[pfx + "linears.0.bias"]),
            "w1": lin_w(sd, pfx + "linears.2.weight"), "b1": _np(sd[pfx + "linears.2.bias"]),
            "w2": lin_w(sd, pfx + "linears.4.weight"), "b2": _np(sd[pfx + "linears.4.bias"]),
        },
    }
    if (pfx + "in_conv.weight") in sd:
        p["in_conv"] = {"w": conv_w(sd, pfx + "in_conv.weight"),
                        "b": _np(sd[pfx + "in_conv.bias"])}
    return p


def convert_keypoint_position_net(sd, pfx: str = "position_net.") -> Dict[str, Any]:
    return {
        "person_embeddings": _np(sd[pfx + "person_embeddings"]),
        "keypoint_embeddings": _np(sd[pfx + "keypoint_embeddings"]),
        "null_person": _np(sd[pfx + "null_person_feature"]),
        "null_xy": _np(sd[pfx + "null_xy_feature"]),
        "linears": {
            "w0": lin_w(sd, pfx + "linears.0.weight"), "b0": _np(sd[pfx + "linears.0.bias"]),
            "w1": lin_w(sd, pfx + "linears.2.weight"), "b1": _np(sd[pfx + "linears.2.bias"]),
            "w2": lin_w(sd, pfx + "linears.4.weight"), "b2": _np(sd[pfx + "linears.4.bias"]),
        },
    }


def convert_grounding_downsampler(sd, pfx: str = "downsample_net.") -> Dict[str, Any]:
    return {
        "conv1_w": conv_w(sd, pfx + "layers.0.weight"),
        "conv1_b": _np(sd[pfx + "layers.0.bias"]),
        "conv2_w": conv_w(sd, pfx + "layers.2.weight"),
        "conv2_b": _np(sd[pfx + "layers.2.bias"]),
    }

"""Deformable pixel decoder (MSDeformAttn variant).

JAX re-design of MSDeformAttnPixelDecoder (reference:
modules/SEEM/demo_code/xdecoder/body/encoder/transformer_encoder_deform.py:
30-380 + ops/modules/ms_deform_attn.py:82-120) — the alternative SEEM pixel
decoder that exercises the custom deformable-attention op (the demo config
uses the FPN decoder, seem_focall_lang.yaml:48; this one is part of the
build surface). Structure:

- the top `n_levels` features flatten into one token stream with sine +
  level position embeddings;
- each encoder layer runs MSDeformAttn self-attention: per-query learned
  sampling offsets around reference points across all levels, attention-
  weighted bilinear gathers (vitron_tpu.kernels.ms_deform_attn — the TPU
  replacement for the reference CUDA im2col) + a ReLU FFN;
- outputs reshape back to per-level maps; lower FPN levels get lateral +
  output convs with bilinear top-down fusion; a final conv yields mask
  features.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vitron_tpu.kernels.ms_deform_attn import ms_deform_attn
from vitron_tpu.models.seem.pixel_decoder import _gn, _ln, position_embedding_sine, _conv


@dataclasses.dataclass(frozen=True)
class DeformDecoderConfig:
    conv_dim: int = 512
    mask_dim: int = 512
    num_layers: int = 6
    num_heads: int = 8
    num_points: int = 4
    dim_feedforward: int = 1024
    in_channels: Tuple[int, ...] = (192, 384, 768, 1536)  # res2..res5
    num_transformer_levels: int = 3                        # res3..res5
    gn_groups: int = 32

    @staticmethod
    def tiny(**kw) -> "DeformDecoderConfig":
        base = dict(conv_dim=32, mask_dim=32, num_layers=2, num_heads=4,
                    num_points=2, dim_feedforward=64, in_channels=(16, 32),
                    num_transformer_levels=1)
        base.update(kw)
        return DeformDecoderConfig(**base)


def ms_deform_attn_module(p: Dict[str, Any], query: jax.Array,
                          reference_points: jax.Array, value_tokens: jax.Array,
                          spatial_shapes, num_heads: int, num_points: int) -> jax.Array:
    """MSDeformAttn module forward (ms_deform_attn.py:82-120): project
    values, predict per-query offsets + softmax weights, gather."""
    b, lq, c = query.shape
    L = len(spatial_shapes)
    d = c // num_heads
    value = value_tokens @ p["value_w"] + p["value_b"]
    value = value.reshape(b, -1, num_heads, d)
    offsets = (query @ p["off_w"] + p["off_b"]).reshape(
        b, lq, num_heads, L, num_points, 2)
    weights = (query @ p["attw_w"] + p["attw_b"]).reshape(
        b, lq, num_heads, L * num_points)
    weights = jax.nn.softmax(weights, axis=-1).reshape(
        b, lq, num_heads, L, num_points)
    normalizer = jnp.asarray([[w, h] for h, w in spatial_shapes], jnp.float32)
    locs = reference_points[:, :, None, :, None, :] + \
        offsets / normalizer[None, None, None, :, None, :]
    out = ms_deform_attn(value, spatial_shapes, locs, weights)
    return out @ p["out_w"] + p["out_b"]


def _reference_points(spatial_shapes) -> np.ndarray:
    """[sum HW, L, 2] normalized centers (transformer_encoder_deform.py:
    141-152, valid_ratios == 1 for unpadded inputs)."""
    pts = []
    for h, w in spatial_shapes:
        ys = (np.arange(h) + 0.5) / h
        xs = (np.arange(w) + 0.5) / w
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        pts.append(np.stack([gx.reshape(-1), gy.reshape(-1)], -1))
    ref = np.concatenate(pts, 0).astype(np.float32)
    return np.broadcast_to(ref[:, None], (ref.shape[0], len(spatial_shapes), 2)).copy()


def forward_features(params: Dict[str, Any], cfg: DeformDecoderConfig,
                     features: List[jax.Array]):
    """features: [res2..resN] NHWC -> (mask_features, multi_scale)."""
    n = len(features)
    ntl = cfg.num_transformer_levels
    trans_feats = features[n - ntl:][::-1]  # top-down: res5..res3

    srcs, poss, shapes = [], [], []
    for i, f in enumerate(trans_feats):
        b, h, w, _ = f.shape
        proj = params["input_proj"][i]
        x = _gn(_conv(f, proj["w"], proj["b"]), proj["norm"], cfg.gn_groups)
        srcs.append(x.reshape(b, h * w, cfg.conv_dim))
        pos = position_embedding_sine(h, w, cfg.conv_dim).astype(f.dtype)
        poss.append(pos[None] + params["level_embed"][i])
        shapes.append((h, w))
    src = jnp.concatenate(srcs, axis=1)
    pos = jnp.concatenate(poss, axis=1)
    ref = jnp.asarray(_reference_points(shapes))[None]

    for lp in params["layers"]:
        q = src + pos
        att = ms_deform_attn_module(lp["attn"], q, ref, src, shapes,
                                    cfg.num_heads, cfg.num_points)
        src = _ln(src + att, lp["norm1"])
        h2 = jax.nn.relu(src @ lp["fc1_w"] + lp["fc1_b"]) @ lp["fc2_w"] + lp["fc2_b"]
        src = _ln(src + h2, lp["norm2"])

    # split back to maps (top-down order)
    outs = []
    off = 0
    for (h, w) in shapes:
        outs.append(src[:, off:off + h * w].reshape(-1, h, w, cfg.conv_dim))
        off += h * w
    # FPN for the remaining low levels
    y = outs[-1]
    for i, f in enumerate(features[: n - ntl][::-1]):
        lvl = params["fpn"][i]
        cur = _gn(_conv(f, lvl["lat_w"], None), lvl["lat_norm"], cfg.gn_groups)
        bb, hh, ww, _ = cur.shape
        up = jax.image.resize(y, (bb, hh, ww, cfg.conv_dim), method="linear")
        y = jax.nn.relu(_gn(_conv(cur + up, lvl["out_w"], None, padding=1),
                            lvl["out_norm"], cfg.gn_groups))
        outs.append(y)
    mask_features = _conv(outs[-1], params["mask_w"], params["mask_b"], padding=1)
    return mask_features, outs[:3]


def init_params(rng: jax.Array, cfg: DeformDecoderConfig) -> Dict[str, Any]:
    ki = iter(jax.random.split(rng, 256))
    cd = cfg.conv_dim
    L = cfg.num_transformer_levels

    def dense(cin, cout, zero=False):
        if zero:
            return jnp.zeros((cin, cout))
        return jax.random.normal(next(ki), (cin, cout)) / np.sqrt(cin)

    def conv(kh, kw, cin, cout):
        return jax.random.normal(next(ki), (kh, kw, cin, cout)) / np.sqrt(kh * kw * cin)

    def gn():
        return {"scale": jnp.ones((cd,)), "bias": jnp.zeros((cd,))}

    def lnp():
        return {"scale": jnp.ones((cd,)), "bias": jnp.zeros((cd,))}

    # grid-like init for sampling offsets (reference _reset_parameters):
    # zero weights, bias pointing at ring directions
    heads, pts = cfg.num_heads, cfg.num_points
    thetas = np.arange(heads) * (2 * np.pi / heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None], (1, L, pts, 1))
    for p_i in range(pts):
        grid[:, :, p_i] *= p_i + 1
    off_bias = jnp.asarray(grid.reshape(-1), jnp.float32)

    def attn():
        return {
            "value_w": dense(cd, cd), "value_b": jnp.zeros((cd,)),
            "off_w": dense(cd, heads * L * pts * 2, zero=True), "off_b": off_bias,
            "attw_w": dense(cd, heads * L * pts, zero=True),
            "attw_b": jnp.zeros((heads * L * pts,)),
            "out_w": dense(cd, cd), "out_b": jnp.zeros((cd,)),
        }

    n_fpn = len(cfg.in_channels) - L
    return {
        "input_proj": [
            {"w": conv(1, 1, cin, cd), "b": jnp.zeros((cd,)), "norm": gn()}
            for cin in cfg.in_channels[len(cfg.in_channels) - L:][::-1]],
        "level_embed": jax.random.normal(next(ki), (L, cd)) * 0.02,
        "layers": [
            {"attn": attn(), "norm1": lnp(), "norm2": lnp(),
             "fc1_w": dense(cd, cfg.dim_feedforward), "fc1_b": jnp.zeros((cfg.dim_feedforward,)),
             "fc2_w": dense(cfg.dim_feedforward, cd), "fc2_b": jnp.zeros((cd,))}
            for _ in range(cfg.num_layers)],
        "fpn": [
            {"lat_w": conv(1, 1, cin, cd), "lat_norm": gn(),
             "out_w": conv(3, 3, cd, cd), "out_norm": gn()}
            for cin in cfg.in_channels[:n_fpn][::-1]],
        "mask_w": conv(3, 3, cd, cfg.mask_dim), "mask_b": jnp.zeros((cfg.mask_dim,)),
    }

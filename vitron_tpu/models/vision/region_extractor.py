"""Region feature extractor: bbox -> mask-pooled patch features + location embed.

Reference: vitron/model/region_extractor/layer.py. Semantics replicated
exactly, including the reference's bbox rasterization quirk
`mask[int(x1):int(x2), int(y1):int(y2)] = 1` (layer.py:83) which indexes the
FIRST mask axis with x — parity matters more than convention here because the
trained weights saw this layout.

Pipeline (layer.py:87-130):
1. bbox (224-space) -> binary 224x224 mask,
2. bilinear resize to the 16x16 patch grid (align_corners=False), re-binarize,
3. normalized mask-pool over patch features (einsum),
4. 3-layer ReLU MLP 1024->4096->4096->4096 on pooled features,
5. 2-layer location encoder on the raw bbox coords,
6. sum -> [B, 1, 4096].

The rasterize+resize collapses to pure jnp ops on a broadcasted_iota grid —
no gather, fully jittable with static shapes.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def init_params(rng: jax.Array, in_dim: int = 1024, out_dim: int = 4096,
                dtype: Any = jnp.float32) -> Dict[str, Any]:
    ks = jax.random.split(rng, 5)

    def dense(key, shape):
        s = 1.0 / jnp.sqrt(shape[0])
        return (jax.random.normal(key, shape, jnp.float32) * s).astype(dtype)

    return {
        "mlp": {
            "w0": dense(ks[0], (in_dim, out_dim)), "b0": jnp.zeros((out_dim,), dtype),
            "w1": dense(ks[1], (out_dim, out_dim)), "b1": jnp.zeros((out_dim,), dtype),
            "w2": dense(ks[2], (out_dim, out_dim)), "b2": jnp.zeros((out_dim,), dtype),
        },
        "loc": {
            "w0": dense(ks[3], (4, out_dim // 2)), "b0": jnp.zeros((out_dim // 2,), dtype),
            "w1": dense(ks[4], (out_dim // 2, out_dim)), "b1": jnp.zeros((out_dim,), dtype),
        },
    }


def rasterize_bbox_mask(bboxes: jax.Array, image_size: int) -> jax.Array:
    """[B, 4] (x1,y1,x2,y2) -> [B, image_size, image_size] binary masks.

    Replicates layer.py:77-85: int truncation of coords, x indexes axis 0.
    """
    bb = jnp.floor(bboxes).astype(jnp.int32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (image_size, image_size), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (image_size, image_size), 1)
    x1, y1, x2, y2 = bb[:, 0], bb[:, 1], bb[:, 2], bb[:, 3]
    m = (
        (rows[None] >= x1[:, None, None]) & (rows[None] < x2[:, None, None])
        & (cols[None] >= y1[:, None, None]) & (cols[None] < y2[:, None, None])
    )
    return m.astype(jnp.float32)


def mask_pool(feats: jax.Array, masks: jax.Array) -> jax.Array:
    """Normalized mask pooling (layer.py:23-43).

    feats: [B, N, C] patch features (N = g*g grid); masks: [B, S, S] at image
    resolution, bilinearly resized to the feature grid then binarized.
    Returns [B, C].
    """
    b, n, c = feats.shape
    g = int(round(n ** 0.5))
    # F.interpolate(..., mode='bilinear', align_corners=False) == jax.image
    # 'linear' resize (half-pixel centers) with antialias OFF (torch default)
    small = jax.image.resize(masks, (b, g, g), method="linear", antialias=False)
    small = (small > 0).astype(feats.dtype)
    denom = jnp.sum(small, axis=(-1, -2), keepdims=True) + 1e-8
    w = (small / denom).reshape(b, n)
    return jnp.einsum("bnc,bn->bc", feats, w)


def apply(params: Dict[str, Any], feats: jax.Array, bboxes: jax.Array,
          image_size: int = 224) -> jax.Array:
    """feats: [B, N, C] raw (pre-projector) patch features; bboxes: [B, 4]
    in `image_size` coordinates. Returns [B, 1, out_dim]."""
    masks = rasterize_bbox_mask(bboxes, image_size).astype(feats.dtype)
    pooled = mask_pool(feats, masks)
    m = params["mlp"]
    x = jax.nn.relu(pooled @ m["w0"] + m["b0"])
    x = jax.nn.relu(x @ m["w1"] + m["b1"])
    x = x @ m["w2"] + m["b2"]
    l = params["loc"]
    loc = jax.nn.relu(bboxes.astype(x.dtype) @ l["w0"] + l["b0"]) @ l["w1"] + l["b1"]
    return (x + loc)[:, None, :]


def convert_hf(state_dict, prefix: str = "model.region_extractor.") -> Dict[str, Any]:
    """Torch keys: region_linear.layers.{0,1,2}.*, loc_encoder.loc_encoder.{0,2}.*"""
    import numpy as np

    def g(k):
        v = state_dict[prefix + k]
        if not isinstance(v, np.ndarray):
            v = v.detach().float().cpu().numpy()
        return v

    return {
        "mlp": {
            "w0": np.ascontiguousarray(g("region_linear.layers.0.weight").T),
            "b0": g("region_linear.layers.0.bias"),
            "w1": np.ascontiguousarray(g("region_linear.layers.1.weight").T),
            "b1": g("region_linear.layers.1.bias"),
            "w2": np.ascontiguousarray(g("region_linear.layers.2.weight").T),
            "b2": g("region_linear.layers.2.bias"),
        },
        "loc": {
            "w0": np.ascontiguousarray(g("loc_encoder.loc_encoder.0.weight").T),
            "b0": g("loc_encoder.loc_encoder.0.bias"),
            "w1": np.ascontiguousarray(g("loc_encoder.loc_encoder.2.weight").T),
            "b1": g("loc_encoder.loc_encoder.2.bias"),
        },
    }

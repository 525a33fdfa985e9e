"""MiDaS/DPT monocular depth estimation (StableVideo's depth annotator).

JAX re-design of the vendored MiDaS DPT (reference: modules/StableVideo/
annotator/midas/midas/dpt_depth.py:26-110, blocks.py fusion/reassemble,
__init__.py:9-40 MidasDetector normalization). Implemented variant:
**dpt_large** (plain ViT-L/16 backbone, hooks at layers [5, 11, 17, 23],
'project' readout) — the reference's default dpt_hybrid needs a timm
ResNet50+ViT hybrid that this image cannot even load; dpt_large is the
documented alternative (api.py:35-44) and shares the entire scratch head.

Pipeline: ViT-L/16 (cls readout projected into tokens) -> 4 hooked hidden
states -> reassemble to 4 scales (x4, x2, x1, x0.5 of the patch grid) ->
1x1 scratch convs -> residual fusion refinenets top-down -> conv head ->
relative inverse depth map.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vitron_tpu.models.diffusion.layers import conv2d


@dataclasses.dataclass(frozen=True)
class DPTConfig:
    image_size: int = 384
    patch_size: int = 16
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_dim: int = 4096
    hooks: Tuple[int, ...] = (5, 11, 17, 23)
    features: int = 256
    reassemble_dims: Tuple[int, ...] = (256, 512, 1024, 1024)

    @staticmethod
    def dpt_large(**kw) -> "DPTConfig":
        return DPTConfig(**kw)

    @staticmethod
    def tiny(**kw) -> "DPTConfig":
        base = dict(image_size=32, patch_size=8, hidden_size=32, num_layers=4,
                    num_heads=4, mlp_dim=64, hooks=(0, 1, 2, 3), features=16,
                    reassemble_dims=(16, 16, 32, 32))
        base.update(kw)
        return DPTConfig(**base)


def _ln(x, p, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]).astype(x.dtype)


def _vit_block(x, p, heads):
    b, n, c = x.shape
    d = c // heads
    xn = _ln(x, p["ln1"])
    qkv = xn @ p["qkv_w"] + p["qkv_b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, n, heads, d)
    k = k.reshape(b, n, heads, d)
    v = v.reshape(b, n, heads, d)
    a = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) / np.sqrt(d)
    a = jax.nn.softmax(a, axis=-1).astype(v.dtype)
    att = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(b, n, c)
    x = x + att @ p["proj_w"] + p["proj_b"]
    xn = _ln(x, p["ln2"])
    h = jax.nn.gelu(xn @ p["fc1_w"] + p["fc1_b"], approximate=False)
    return x + h @ p["fc2_w"] + p["fc2_b"]


def _readout_project(tokens, cls, p):
    """'project' readout (blocks.py ProjectReadout): concat cls to every
    token, linear+GELU back to C."""
    b, n, c = tokens.shape
    cat = jnp.concatenate([tokens, jnp.broadcast_to(cls, (b, n, c))], axis=-1)
    return jax.nn.gelu(cat @ p["w"] + p["b"], approximate=False)


def forward(params: Dict[str, Any], cfg: DPTConfig, image: jax.Array) -> jax.Array:
    """image: [B, H, W, 3] normalized -> relative inverse depth [B, H, W]."""
    b, H, W, _ = image.shape
    p = cfg.patch_size
    gh, gw = H // p, W // p
    x = image.reshape(b, gh, p, gw, p, 3).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, gh * gw, p * p * 3) @ params["patch_w"] + params["patch_b"]
    cls = jnp.broadcast_to(params["cls"], (b, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1) + params["pos_emb"][: gh * gw + 1]

    hooked: List[jax.Array] = []
    for i, blk in enumerate(params["blocks"]):
        x = _vit_block(x, blk, cfg.num_heads)
        if i in cfg.hooks:
            hooked.append(x)
    # reassemble: readout-project, reshape to grid, 1x1 to stage dims, resize
    scales = (4.0, 2.0, 1.0, 0.5)
    feats = []
    for i, h in enumerate(hooked):
        t = _readout_project(h[:, 1:], h[:, :1], params["readout"][i])
        t = t.reshape(b, gh, gw, cfg.hidden_size)
        t = conv2d(t, params["reassemble"][i]["w"], params["reassemble"][i]["b"])
        s = scales[i]
        t = jax.image.resize(t, (b, int(gh * s), int(gw * s), t.shape[-1]),
                             method="linear" if s != 1.0 else "nearest")
        feats.append(t)
    # scratch 3x3 projections to `features`
    rn = [conv2d(f, params["scratch"][i]["w"], None, padding=1)
          for i, f in enumerate(feats)]

    def fusion(i, x_up, skip):
        fp = params["fusion"][i]

        def res_unit(y, u):
            y = jax.nn.relu(y)
            y = conv2d(y, u["w1"], u["b1"], padding=1)
            y = jax.nn.relu(y)
            return conv2d(y, u["w2"], u["b2"], padding=1)

        if skip is not None:
            x_up = x_up + res_unit(skip, fp["res1"])
        x_up = x_up + res_unit(x_up, fp["res2"])
        bb, hh, ww, cc = x_up.shape
        x_up = jax.image.resize(x_up, (bb, hh * 2, ww * 2, cc), method="linear")
        return conv2d(x_up, fp["out_w"], fp["out_b"])

    path = fusion(3, rn[3], None)
    path = fusion(2, path, rn[2])
    path = fusion(1, path, rn[1])
    path = fusion(0, path, rn[0])
    # head (dpt_depth.py:94-103)
    hd = params["head"]
    y = conv2d(path, hd["w1"], hd["b1"], padding=1)
    bb, hh, ww, cc = y.shape
    y = jax.image.resize(y, (bb, hh * 2, ww * 2, cc), method="linear")
    y = jax.nn.relu(conv2d(y, hd["w2"], hd["b2"], padding=1))
    y = jax.nn.relu(conv2d(y, hd["w3"], hd["b3"]))
    return y[..., 0]


def depth_hint(params, cfg: DPTConfig, image_uint8: np.ndarray) -> np.ndarray:
    """MidasDetector-style hint (annotator/midas/__init__.py:13-27): run at
    the model size, min-max normalize to [0, 1], resize back; 3-channel."""
    h, w = image_uint8.shape[:2]
    x = jnp.asarray(image_uint8, jnp.float32) / 127.5 - 1.0
    x = jax.image.resize(x, (cfg.image_size, cfg.image_size, 3), "linear")
    d = forward(params, cfg, x[None])[0]
    d = d - d.min()
    d = d / jnp.maximum(d.max(), 1e-6)
    d = jax.image.resize(d, (h, w), "linear")
    return np.asarray(jnp.stack([d] * 3, axis=-1), np.float32)


def init_params(rng: jax.Array, cfg: DPTConfig) -> Dict[str, Any]:
    ki = iter(jax.random.split(rng, 512))
    c = cfg.hidden_size
    f = cfg.features

    def dense(cin, cout):
        return jax.random.normal(next(ki), (cin, cout)) / np.sqrt(cin)

    def conv(kh, kw, cin, cout):
        return jax.random.normal(next(ki), (kh, kw, cin, cout)) / np.sqrt(kh * kw * cin)

    def ln():
        return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}

    n_tok = (cfg.image_size // cfg.patch_size) ** 2 + 1
    return {
        "patch_w": dense(cfg.patch_size ** 2 * 3, c),
        "patch_b": jnp.zeros((c,)),
        "cls": jax.random.normal(next(ki), (1, 1, c)) * 0.02,
        "pos_emb": jax.random.normal(next(ki), (n_tok, c)) * 0.02,
        "blocks": [
            {"ln1": ln(), "ln2": ln(),
             "qkv_w": dense(c, 3 * c), "qkv_b": jnp.zeros((3 * c,)),
             "proj_w": dense(c, c), "proj_b": jnp.zeros((c,)),
             "fc1_w": dense(c, cfg.mlp_dim), "fc1_b": jnp.zeros((cfg.mlp_dim,)),
             "fc2_w": dense(cfg.mlp_dim, c), "fc2_b": jnp.zeros((c,))}
            for _ in range(cfg.num_layers)],
        "readout": [{"w": dense(2 * c, c), "b": jnp.zeros((c,))} for _ in range(4)],
        "reassemble": [
            {"w": conv(1, 1, c, cfg.reassemble_dims[i]),
             "b": jnp.zeros((cfg.reassemble_dims[i],))} for i in range(4)],
        "scratch": [
            {"w": conv(3, 3, cfg.reassemble_dims[i], f)} for i in range(4)],
        "fusion": [
            {"res1": {"w1": conv(3, 3, f, f), "b1": jnp.zeros((f,)),
                      "w2": conv(3, 3, f, f), "b2": jnp.zeros((f,))},
             "res2": {"w1": conv(3, 3, f, f), "b1": jnp.zeros((f,)),
                      "w2": conv(3, 3, f, f), "b2": jnp.zeros((f,))},
             "out_w": conv(1, 1, f, f), "out_b": jnp.zeros((f,))}
            for _ in range(4)],
        "head": {
            "w1": conv(3, 3, f, f // 2), "b1": jnp.zeros((f // 2,)),
            "w2": conv(3, 3, f // 2, 32), "b2": jnp.zeros((32,)),
            "w3": conv(1, 1, 32, 1), "b3": jnp.zeros((1,)),
        },
    }

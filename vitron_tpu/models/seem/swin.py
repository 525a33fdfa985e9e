"""Swin Transformer backbone (SEEM's alternative to FocalNet).

JAX re-design of the vendored Microsoft Swin (reference:
modules/SEEM/demo_code/xdecoder/backbone/swin.py:26-830, registry-selected
as an alternative backbone, SURVEY §2.2). Window attention with relative
position bias, shifted windows with the cyclic-roll mask, patch merging
between stages, per-stage output norms. Static input sizes keep every
window partition a reshape (jit-friendly); windows fold into the batch for
one big attention einsum per block.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vitron_tpu.models.seem.pixel_decoder import _ln


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    embed_dim: int = 192             # swin-L
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (6, 12, 24, 48)
    window_size: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    patch_size: int = 4

    @property
    def dims(self):
        return tuple(self.embed_dim * 2 ** i for i in range(len(self.depths)))

    @staticmethod
    def swin_l(**kw) -> "SwinConfig":
        return SwinConfig(**kw)

    @staticmethod
    def tiny(**kw) -> "SwinConfig":
        base = dict(embed_dim=16, depths=(1, 2), num_heads=(2, 4),
                    window_size=4)
        base.update(kw)
        return SwinConfig(**base)


def _rel_pos_index(w: int) -> np.ndarray:
    """Relative position index [w*w, w*w] into the (2w-1)^2 bias table
    (swin.py:100-115)."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += w - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    return rel.sum(-1)


def window_partition(x: jax.Array, w: int) -> jax.Array:
    """[B, H, W, C] -> [B*nw, w*w, C]."""
    b, h, ww, c = x.shape
    x = x.reshape(b, h // w, w, ww // w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)


def window_reverse(x: jax.Array, w: int, h: int, ww: int) -> jax.Array:
    b = x.shape[0] // ((h // w) * (ww // w))
    x = x.reshape(b, h // w, ww // w, w, w, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, ww, -1)


def _attn_mask_for_shift(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """Cyclic-shift window mask (swin.py:247-270): [nw, w*w, w*w] additive
    (-100 blocked, 0 allowed)."""
    img = np.zeros((1, h, w, 1))
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[:, hs, ws, :] = cnt
            cnt += 1
    win = np.asarray(window_partition(jnp.asarray(img), window))[:, :, 0]
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _window_attention(p, x, heads: int, rel_idx, mask=None):
    """x: [nW, N, C]; relative position bias added per head (swin.py:136-178)."""
    nw, n, c = x.shape
    d = c // heads
    qkv = x @ p["qkv_w"] + p["qkv_b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(nw, n, heads, d).transpose(0, 2, 1, 3) * (d ** -0.5)
    k = k.reshape(nw, n, heads, d).transpose(0, 2, 1, 3)
    v = v.reshape(nw, n, heads, d).transpose(0, 2, 1, 3)
    attn = (q @ k.transpose(0, 1, 3, 2)).astype(jnp.float32)
    bias = p["rel_bias"][rel_idx.reshape(-1)].reshape(n, n, heads)
    attn = attn + bias.transpose(2, 0, 1)[None].astype(jnp.float32)
    if mask is not None:
        nm = mask.shape[0]
        attn = attn.reshape(nw // nm, nm, heads, n, n) + mask[None, :, None]
        attn = attn.reshape(nw, heads, n, n)
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(nw, n, c)
    return out @ p["proj_w"] + p["proj_b"]


def forward(params: Dict[str, Any], cfg: SwinConfig, pixels: jax.Array) -> List[jax.Array]:
    """pixels: [B, H, W, 3] (normalized) -> [res2..res5] NHWC features."""
    b, H, W, _ = pixels.shape
    p4 = cfg.patch_size
    x = pixels.reshape(b, H // p4, p4, W // p4, p4, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, (H // p4) * (W // p4), p4 * p4 * 3)
    x = x @ params["patch_w"] + params["patch_b"]
    x = _ln(x, params["patch_norm"])
    h, w = H // p4, W // p4

    outs = []
    for si, stage in enumerate(params["stages"]):
        # the vendored block keeps the window FIXED and always shifts on odd
        # blocks (the resolution clamp is commented out, swin.py:252-256);
        # feature maps pad to window multiples instead
        window = cfg.window_size
        shift = window // 2
        rel_idx = jnp.asarray(_rel_pos_index(window))
        hp = -h % window
        wp = -w % window
        hh, ww = h + hp, w + wp
        shift_mask = jnp.asarray(_attn_mask_for_shift(hh, ww, window, shift))
        for bi, blk in enumerate(stage["blocks"]):
            do_shift = shift if (bi % 2 == 1) else 0
            res = x
            xn = _ln(x, blk["norm1"]).reshape(b, h, w, -1)
            if hp or wp:
                xn = jnp.pad(xn, ((0, 0), (0, hp), (0, wp), (0, 0)))
            if do_shift:
                xn = jnp.roll(xn, (-do_shift, -do_shift), axis=(1, 2))
            wins = window_partition(xn, window)
            att = _window_attention(blk["attn"], wins, cfg.num_heads[si],
                                    rel_idx, shift_mask if do_shift else None)
            xn = window_reverse(att, window, hh, ww)
            if do_shift:
                xn = jnp.roll(xn, (do_shift, do_shift), axis=(1, 2))
            if hp or wp:
                xn = xn[:, :h, :w]
            x = res + xn.reshape(b, h * w, -1)
            xn = _ln(x, blk["norm2"])
            hmid = jax.nn.gelu(xn @ blk["fc1_w"] + blk["fc1_b"], approximate=False)
            x = x + hmid @ blk["fc2_w"] + blk["fc2_b"]
        outs.append(_ln(x, params["out_norms"][si]).reshape(b, h, w, -1))
        if "merge_w" in stage:
            xm = x.reshape(b, h, w, -1)
            x0 = xm[:, 0::2, 0::2]
            x1 = xm[:, 1::2, 0::2]
            x2 = xm[:, 0::2, 1::2]
            x3 = xm[:, 1::2, 1::2]
            xm = jnp.concatenate([x0, x1, x2, x3], axis=-1)
            h, w = h // 2, w // 2
            xm = xm.reshape(b, h * w, -1)
            xm = _ln(xm, stage["merge_norm"])
            x = xm @ stage["merge_w"]
    return outs


def init_params(rng: jax.Array, cfg: SwinConfig) -> Dict[str, Any]:
    ki = iter(jax.random.split(rng, 1024))

    def dense(cin, cout):
        return jax.random.normal(next(ki), (cin, cout)) / np.sqrt(cin)

    def ln(c):
        return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}

    stages = []
    for si, depth in enumerate(cfg.depths):
        c = cfg.dims[si]
        win = cfg.window_size
        blocks = []
        for _ in range(depth):
            blocks.append({
                "norm1": ln(c), "norm2": ln(c),
                "attn": {
                    "qkv_w": dense(c, 3 * c), "qkv_b": jnp.zeros((3 * c,)),
                    "rel_bias": jax.random.normal(
                        next(ki), ((2 * win - 1) ** 2, cfg.num_heads[si])) * 0.02,
                    "proj_w": dense(c, c), "proj_b": jnp.zeros((c,)),
                },
                "fc1_w": dense(c, int(c * cfg.mlp_ratio)),
                "fc1_b": jnp.zeros((int(c * cfg.mlp_ratio),)),
                "fc2_w": dense(int(c * cfg.mlp_ratio), c),
                "fc2_b": jnp.zeros((c,)),
            })
        stage = {"blocks": blocks}
        if si < len(cfg.depths) - 1:
            stage["merge_norm"] = ln(4 * c)
            stage["merge_w"] = dense(4 * c, 2 * c)
        stages.append(stage)
    return {
        "patch_w": dense(cfg.patch_size ** 2 * 3, cfg.embed_dim),
        "patch_b": jnp.zeros((cfg.embed_dim,)),
        "patch_norm": ln(cfg.embed_dim),
        "stages": stages,
        "out_norms": [ln(cfg.dims[i]) for i in range(len(cfg.depths))],
    }


def convert_torch(sd, cfg: SwinConfig, prefix: str = "backbone.") -> Dict[str, Any]:
    """Vendored Swin state dict -> param tree (swin.py naming:
    patch_embed.proj/norm, layers.{i}.blocks.{j}.*, layers.{i}.downsample.*,
    norm{i})."""
    def _np(x):
        return x if isinstance(x, np.ndarray) else x.detach().float().cpu().numpy()

    def g(k):
        return _np(sd[prefix + k])

    def lnp(k):
        return {"scale": g(k + ".weight"), "bias": g(k + ".bias")}

    p4 = cfg.patch_size
    conv = g("patch_embed.proj.weight")  # [C, 3, p, p]
    patch_w = np.ascontiguousarray(conv.transpose(2, 3, 1, 0).reshape(p4 * p4 * 3, -1))
    stages = []
    for si, depth in enumerate(cfg.depths):
        blocks = []
        for bi in range(depth):
            stem = f"layers.{si}.blocks.{bi}."
            blocks.append({
                "norm1": lnp(stem + "norm1"), "norm2": lnp(stem + "norm2"),
                "attn": {
                    "qkv_w": np.ascontiguousarray(g(stem + "attn.qkv.weight").T),
                    "qkv_b": g(stem + "attn.qkv.bias"),
                    "rel_bias": g(stem + "attn.relative_position_bias_table"),
                    "proj_w": np.ascontiguousarray(g(stem + "attn.proj.weight").T),
                    "proj_b": g(stem + "attn.proj.bias"),
                },
                "fc1_w": np.ascontiguousarray(g(stem + "mlp.fc1.weight").T),
                "fc1_b": g(stem + "mlp.fc1.bias"),
                "fc2_w": np.ascontiguousarray(g(stem + "mlp.fc2.weight").T),
                "fc2_b": g(stem + "mlp.fc2.bias"),
            })
        stage = {"blocks": blocks}
        if si < len(cfg.depths) - 1:
            stage["merge_norm"] = lnp(f"layers.{si}.downsample.norm")
            stage["merge_w"] = np.ascontiguousarray(
                g(f"layers.{si}.downsample.reduction.weight").T)
        stages.append(stage)
    return {
        "patch_w": patch_w,
        "patch_b": g("patch_embed.proj.bias"),
        "patch_norm": lnp("patch_embed.norm"),
        "stages": stages,
        "out_norms": [lnp(f"norm{i}") for i in range(len(cfg.depths))],
    }

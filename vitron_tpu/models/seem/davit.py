"""DaViT backbone (dual attention: spatial windows + channel groups).

JAX re-design of the vendored DaViT (reference:
modules/SEEM/demo_code/xdecoder/backbone/davit.py:22-545) — the fourth
registry-selectable SEEM backbone. Per stage: a conv patch embed (optional
pre/post LayerNorm), then depth x (SpatialBlock, ChannelBlock); each block
is [depthwise-conv residual, pre-LN attention residual, depthwise-conv
residual, pre-LN MLP residual]. Spatial attention = plain (unshifted,
unbiased) window attention with window padding; channel attention
transposes the tokens/channels axes inside each group — a global
interaction at O(N*C^2/g) cost that maps to two MXU matmuls.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vitron_tpu.kernels.depthwise_conv import depthwise_conv2d
from vitron_tpu.models.seem.pixel_decoder import _ln
from vitron_tpu.models.seem.swin import window_partition, window_reverse


@dataclasses.dataclass(frozen=True)
class DaViTConfig:
    depths: Tuple[int, ...] = (1, 1, 3, 1)
    embed_dims: Tuple[int, ...] = (64, 128, 192, 256)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    num_groups: Tuple[int, ...] = (3, 6, 12, 24)
    patch_size: Tuple[int, ...] = (7, 2, 2, 2)
    patch_stride: Tuple[int, ...] = (4, 2, 2, 2)
    patch_padding: Tuple[int, ...] = (3, 0, 0, 0)
    patch_prenorm: Tuple[bool, ...] = (False, False, False, False)
    window_size: int = 7
    mlp_ratio: float = 4.0

    @staticmethod
    def tiny(**kw) -> "DaViTConfig":
        base = dict(depths=(1, 1), embed_dims=(16, 32), num_heads=(2, 4),
                    num_groups=(2, 4), patch_size=(7, 2), patch_stride=(4, 2),
                    patch_padding=(3, 0), patch_prenorm=(False, False),
                    window_size=4)
        base.update(kw)
        return DaViTConfig(**base)


def _conv(x, w, b=None, stride=1, padding=0, groups=1):
    # 1x1 convs as matmuls (see kernels/conv2d.py)
    if w.shape[0] == w.shape[1] == 1 and stride == 1 and padding == 0 and groups == 1:
        out = x @ w[0, 0].astype(x.dtype)
        return out if b is None else out + b.astype(out.dtype)
    # full depthwise (conv pos-encodings): read-once Pallas kernel
    if (groups == x.shape[-1] and stride == 1 and w.shape[0] == w.shape[1]
            and w.shape[0] % 2 == 1 and padding == w.shape[0] // 2):
        return depthwise_conv2d(x, w, b)
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def _dw_residual(p, x, h, w):
    """x + depthwise3x3(x) (DepthWiseConv2d under a norm-less PreNorm)."""
    b, n, c = x.shape
    y = _conv(x.reshape(b, h, w, c), p["w"], p["b"], padding=1, groups=c)
    return x + y.reshape(b, n, c)


def _window_attn(p, x, h, w, heads, window):
    b, n, c = x.shape
    xs = x.reshape(b, h, w, c)
    hp = -h % window
    wp = -w % window
    if hp or wp:
        xs = jnp.pad(xs, ((0, 0), (0, hp), (0, wp), (0, 0)))
    wins = window_partition(xs, window)                  # [nW, win*win, C]
    nw, nn, _ = wins.shape
    d = c // heads
    qkv = wins @ p["qkv_w"] + p["qkv_b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(nw, nn, heads, d).transpose(0, 2, 1, 3) * (d ** -0.5)
    k = k.reshape(nw, nn, heads, d).transpose(0, 2, 1, 3)
    v = v.reshape(nw, nn, heads, d).transpose(0, 2, 1, 3)
    a = jax.nn.softmax((q @ k.transpose(0, 1, 3, 2)).astype(jnp.float32),
                       axis=-1).astype(v.dtype)
    o = (a @ v).transpose(0, 2, 1, 3).reshape(nw, nn, c)
    o = o @ p["proj_w"] + p["proj_b"]
    o = window_reverse(o, window, h + hp, w + wp)
    if hp or wp:
        o = o[:, :h, :w]
    return o.reshape(b, n, c)


def _channel_attn(p, x, groups):
    """ChannelAttention (davit.py:154-176): attention over the channel axis
    within each group; q scaled by N^-0.5."""
    b, n, c = x.shape
    d = c // groups
    qkv = x @ p["qkv_w"] + p["qkv_b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, n, groups, d).transpose(0, 2, 1, 3) * (n ** -0.5)
    k = k.reshape(b, n, groups, d).transpose(0, 2, 1, 3)
    v = v.reshape(b, n, groups, d).transpose(0, 2, 1, 3)
    att = jax.nn.softmax(
        (q.transpose(0, 1, 3, 2) @ k).astype(jnp.float32), axis=-1).astype(v.dtype)
    o = (att @ v.transpose(0, 1, 3, 2)).transpose(0, 1, 3, 2)  # [b,g,n,d]
    o = o.transpose(0, 2, 1, 3).reshape(b, n, c)
    return o @ p["proj_w"] + p["proj_b"]


def _mlp(p, x):
    h = jax.nn.gelu(x @ p["fc1_w"] + p["fc1_b"], approximate=False)
    return h @ p["fc2_w"] + p["fc2_b"]


def forward(params: Dict[str, Any], cfg: DaViTConfig,
            pixels: jax.Array) -> List[jax.Array]:
    """pixels: [B, H, W, 3] -> per-stage NHWC feature maps (res2..)."""
    x_img = pixels
    b = pixels.shape[0]
    outs = []
    x = None
    h = w = None
    for si in range(len(cfg.depths)):
        ce = params["convs"][si]
        if si == 0:
            y = x_img
        else:
            if cfg.patch_prenorm[si]:
                x = _ln(x, ce["norm"])
            y = x.reshape(b, h, w, -1)
        y = _conv(y, ce["w"], ce["b"], stride=cfg.patch_stride[si],
                  padding=cfg.patch_padding[si])
        h, w = y.shape[1], y.shape[2]
        x = y.reshape(b, h * w, -1)
        if not cfg.patch_prenorm[si] and "norm" in ce:
            x = _ln(x, ce["norm"])
        for blk in params["blocks"][si]:
            sp = blk["spatial"]
            x = _dw_residual(sp["conv1"], x, h, w)
            x = x + _window_attn(sp["attn"], _ln(x, sp["attn_norm"]), h, w,
                                 cfg.num_heads[si], cfg.window_size)
            x = _dw_residual(sp["conv2"], x, h, w)
            x = x + _mlp(sp["mlp"], _ln(x, sp["mlp_norm"]))
            ch = blk["channel"]
            x = _dw_residual(ch["conv1"], x, h, w)
            x = x + _channel_attn(ch["attn"], _ln(x, ch["attn_norm"]),
                                  cfg.num_groups[si])
            x = _dw_residual(ch["conv2"], x, h, w)
            x = x + _mlp(ch["mlp"], _ln(x, ch["mlp_norm"]))
        outs.append(x.reshape(b, h, w, -1))
    return outs


def init_params(rng: jax.Array, cfg: DaViTConfig) -> Dict[str, Any]:
    ki = iter(jax.random.split(rng, 2048))

    def dense(cin, cout):
        return jax.random.normal(next(ki), (cin, cout)) * 0.02

    def conv(kh, kw, cin, cout, groups=1):
        return jax.random.normal(next(ki), (kh, kw, cin // groups, cout)) * 0.02

    def ln(c):
        return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}

    def block(c, ffn):
        def attn():
            return {"qkv_w": dense(c, 3 * c), "qkv_b": jnp.zeros((3 * c,)),
                    "proj_w": dense(c, c), "proj_b": jnp.zeros((c,))}

        def dw():
            return {"w": conv(3, 3, c, c, groups=c), "b": jnp.zeros((c,))}

        return {"conv1": dw(), "attn_norm": ln(c), "attn": attn(),
                "conv2": dw(), "mlp_norm": ln(c),
                "mlp": {"fc1_w": dense(c, ffn), "fc1_b": jnp.zeros((ffn,)),
                        "fc2_w": dense(ffn, c), "fc2_b": jnp.zeros((c,))}}

    convs, blocks = [], []
    for si in range(len(cfg.depths)):
        cin = 3 if si == 0 else cfg.embed_dims[si - 1]
        c = cfg.embed_dims[si]
        ce = {"w": conv(cfg.patch_size[si], cfg.patch_size[si], cin, c),
              "b": jnp.zeros((c,)),
              "norm": ln(cin if cfg.patch_prenorm[si] else c)}
        convs.append(ce)
        ffn = int(c * cfg.mlp_ratio)
        blocks.append([{"spatial": block(c, ffn), "channel": block(c, ffn)}
                       for _ in range(cfg.depths[si])])
    return {"convs": convs, "blocks": blocks}


def convert_torch(sd, cfg: DaViTConfig, prefix: str = "backbone.") -> Dict[str, Any]:
    """Vendored DaViT state dict (convs.{i}.*, blocks.{i}.{j}.
    {spatial_block,channel_block}.*) -> param tree."""
    def _np(x):
        return x if isinstance(x, np.ndarray) else x.detach().float().cpu().numpy()

    def g(k):
        return _np(sd[prefix + k])

    def cw(k):
        return np.ascontiguousarray(g(k).transpose(2, 3, 1, 0))

    def ln(stem):
        return {"scale": g(stem + ".weight"), "bias": g(stem + ".bias")}

    def attn(stem):
        return {"qkv_w": np.ascontiguousarray(g(stem + ".qkv.weight").T),
                "qkv_b": g(stem + ".qkv.bias"),
                "proj_w": np.ascontiguousarray(g(stem + ".proj.weight").T),
                "proj_b": g(stem + ".proj.bias")}

    def dw(stem):
        return {"w": cw(stem + ".dw.weight"), "b": g(stem + ".dw.bias")}

    def mlp(stem):
        return {"fc1_w": np.ascontiguousarray(g(stem + ".net.fc1.weight").T),
                "fc1_b": g(stem + ".net.fc1.bias"),
                "fc2_w": np.ascontiguousarray(g(stem + ".net.fc2.weight").T),
                "fc2_b": g(stem + ".net.fc2.bias")}

    convs, blocks = [], []
    for si in range(len(cfg.depths)):
        convs.append({"w": cw(f"convs.{si}.proj.weight"),
                      "b": g(f"convs.{si}.proj.bias"),
                      "norm": ln(f"convs.{si}.norm")})
        stage = []
        for bi in range(cfg.depths[si]):
            base = f"blocks.{si}.{bi}."

            def half(name):
                return {
                    "conv1": dw(base + name + ".conv1.fn"),
                    "attn_norm": ln(base + name + (".window_attn.norm" if name == "spatial_block" else ".channel_attn.norm")),
                    "attn": attn(base + name + (".window_attn.fn" if name == "spatial_block" else ".channel_attn.fn")),
                    "conv2": dw(base + name + ".conv2.fn"),
                    "mlp_norm": ln(base + name + ".ffn.norm"),
                    "mlp": mlp(base + name + ".ffn.fn"),
                }

            stage.append({"spatial": half("spatial_block"),
                          "channel": half("channel_block")})
        blocks.append(stage)
    return {"convs": convs, "blocks": blocks}

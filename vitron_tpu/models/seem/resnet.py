"""ResNet backbone (SEEM's third registry-selectable backbone).

JAX re-design of the detectron2-style ResNet the reference vendors
(reference: modules/SEEM/demo_code/xdecoder/backbone/resnet.py, registry
alternative to FocalNet/Swin). Standard ResNet-50/101 bottleneck layout
with **frozen BatchNorm** (inference-mode affine using running stats — the
detectron2 FrozenBatchNorm2d convention), deep or plain stem, res2..res5
outputs at strides 4/8/16/32. NHWC; every conv maps to the MXU.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    stem_channels: int = 64
    stage_blocks: Tuple[int, ...] = (3, 4, 6, 3)   # resnet-50
    stage_channels: Tuple[int, ...] = (256, 512, 1024, 2048)
    bottleneck: bool = True

    @staticmethod
    def resnet50(**kw) -> "ResNetConfig":
        return ResNetConfig(**kw)

    @staticmethod
    def resnet101(**kw) -> "ResNetConfig":
        kw.setdefault("stage_blocks", (3, 4, 23, 3))
        return ResNetConfig(**kw)

    @staticmethod
    def tiny(**kw) -> "ResNetConfig":
        base = dict(stem_channels=8, stage_blocks=(1, 1),
                    stage_channels=(16, 32))
        base.update(kw)
        return ResNetConfig(**base)


def _conv(x, w, stride=1, padding=0):
    # 1x1 convs as matmuls (see kernels/conv2d.py)
    if w.shape[0] == w.shape[1] == 1 and stride == 1 and padding == 0:
        return x @ w[0, 0].astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def frozen_bn(x, p, eps: float = 1e-5):
    """FrozenBatchNorm2d: y = (x - mean) / sqrt(var+eps) * gamma + beta,
    entirely from stored statistics."""
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    w = (p["gamma"].astype(jnp.float32) * inv).astype(x.dtype)
    b = (p["beta"].astype(jnp.float32)
         - p["mean"].astype(jnp.float32) * p["gamma"].astype(jnp.float32) * inv
         ).astype(x.dtype)
    return x * w + b


def _bottleneck(p, x, stride):
    out = jax.nn.relu(frozen_bn(_conv(x, p["w1"]), p["bn1"]))
    out = jax.nn.relu(frozen_bn(_conv(out, p["w2"], stride=stride, padding=1), p["bn2"]))
    out = frozen_bn(_conv(out, p["w3"]), p["bn3"])
    if "w_sc" in p:
        x = frozen_bn(_conv(x, p["w_sc"], stride=stride), p["bn_sc"])
    return jax.nn.relu(x + out)


def forward(params: Dict[str, Any], cfg: ResNetConfig,
            pixels: jax.Array) -> List[jax.Array]:
    """pixels: [B, H, W, 3] normalized -> [res2..res{N+1}] NHWC features."""
    x = _conv(pixels, params["stem_w"], stride=2, padding=3)
    x = jax.nn.relu(frozen_bn(x, params["stem_bn"]))
    # maxpool 3x3 stride 2 pad 1
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), "VALID")
    outs = []
    for si, stage in enumerate(params["stages"]):
        stride = 1 if si == 0 else 2
        for bi, blk in enumerate(stage):
            x = _bottleneck(blk, x, stride if bi == 0 else 1)
        outs.append(x)
    return outs


def init_params(rng: jax.Array, cfg: ResNetConfig) -> Dict[str, Any]:
    ki = iter(jax.random.split(rng, 1024))

    def conv(kh, kw, cin, cout):
        return jax.random.normal(next(ki), (kh, kw, cin, cout)) / np.sqrt(kh * kw * cin)

    def bn(c):
        return {"gamma": jnp.ones((c,)), "beta": jnp.zeros((c,)),
                "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}

    stages = []
    cin = cfg.stem_channels
    for si, (n_blocks, cout) in enumerate(zip(cfg.stage_blocks, cfg.stage_channels)):
        mid = cout // 4
        blocks = []
        for bi in range(n_blocks):
            blk = {
                "w1": conv(1, 1, cin, mid), "bn1": bn(mid),
                "w2": conv(3, 3, mid, mid), "bn2": bn(mid),
                "w3": conv(1, 1, mid, cout), "bn3": bn(cout),
            }
            if bi == 0:
                blk["w_sc"] = conv(1, 1, cin, cout)
                blk["bn_sc"] = bn(cout)
            blocks.append(blk)
            cin = cout
        stages.append(blocks)
    return {
        "stem_w": conv(7, 7, 3, cfg.stem_channels),
        "stem_bn": bn(cfg.stem_channels),
        "stages": stages,
    }


def convert_torch(sd, cfg: ResNetConfig, prefix: str = "backbone.") -> Dict[str, Any]:
    """torchvision/detectron2 ResNet state dicts -> param tree.
    Accepts 'conv1/bn1/layer{i}.{j}.conv{k}' (torchvision) naming."""
    def _np(x):
        return x if isinstance(x, np.ndarray) else x.detach().float().cpu().numpy()

    def g(k):
        return _np(sd[prefix + k])

    def cw(k):
        return np.ascontiguousarray(g(k).transpose(2, 3, 1, 0))

    def bn(stem):
        return {"gamma": g(stem + ".weight"), "beta": g(stem + ".bias"),
                "mean": g(stem + ".running_mean"), "var": g(stem + ".running_var")}

    stages = []
    for si, n_blocks in enumerate(cfg.stage_blocks):
        blocks = []
        for bi in range(n_blocks):
            b = f"layer{si + 1}.{bi}."
            blk = {
                "w1": cw(b + "conv1.weight"), "bn1": bn(b + "bn1"),
                "w2": cw(b + "conv2.weight"), "bn2": bn(b + "bn2"),
                "w3": cw(b + "conv3.weight"), "bn3": bn(b + "bn3"),
            }
            if (prefix + b + "downsample.0.weight") in sd:
                blk["w_sc"] = cw(b + "downsample.0.weight")
                blk["bn_sc"] = bn(b + "downsample.1")
            blocks.append(blk)
        stages.append(blocks)
    return {
        "stem_w": cw("conv1.weight"),
        "stem_bn": bn("bn1"),
        "stages": stages,
    }

"""ControlNet: hint-conditioned copy of the SD UNet encoder with zero convs.

JAX re-design of the StableVideo ControlNet (reference:
modules/StableVideo/cldm/cldm.py:22-305): an input-hint conv stack
(3->16->16->32->32->96->96->256->model_channels with three stride-2 stages,
cldm.py:146-160), a trainable copy of the UNet encoder emitting one
zero-conv'ed residual per input block plus a middle residual, and a
controlled UNet whose decoder adds the residuals to the skips
(cldm.py:23-45).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vitron_tpu.models.diffusion import unet2d
from vitron_tpu.models.diffusion.layers import conv2d, group_norm, timestep_embedding
from vitron_tpu.models.diffusion.unet2d import UNetConfig, block_plan

HINT_CHANNELS = (16, 16, 32, 32, 96, 96, 256)
HINT_STRIDES = (1, 1, 2, 1, 2, 1, 2)


def init_params(rng: jax.Array, cfg: UNetConfig) -> Dict[str, Any]:
    """ControlNet params: UNet encoder copy + hint block + zero convs."""
    base = unet2d.init_params(rng, cfg, grounding=False)
    ki = iter(jax.random.split(jax.random.fold_in(rng, 3), 64))

    def conv(kh, kw, cin, cout, zero=False):
        if zero:
            return jnp.zeros((kh, kw, cin, cout), jnp.float32)
        return jax.random.normal(next(ki), (kh, kw, cin, cout), jnp.float32) / np.sqrt(kh * kw * cin)

    hint = []
    cin = 3
    for cout, _ in zip(HINT_CHANNELS, HINT_STRIDES):
        hint.append({"w": conv(3, 3, cin, cout), "b": jnp.zeros((cout,))})
        cin = cout
    hint.append({"w": conv(3, 3, cin, cfg.model_channels, zero=True),
                 "b": jnp.zeros((cfg.model_channels,))})

    input_plan, _, _ = block_plan(cfg)
    zero_convs = []
    ch_per_block = []
    ch = cfg.model_channels
    for entries in input_plan:
        for e in entries:
            if e[0] == "conv_in":
                ch = e[2]
            elif e[0] == "res":
                ch = e[2]
        ch_per_block.append(ch)
    for c in ch_per_block:
        zero_convs.append({"w": jnp.zeros((1, 1, c, c)), "b": jnp.zeros((c,))})
    mid_ch = ch_per_block[-1]
    return {
        "time_w1": base["time_w1"], "time_b1": base["time_b1"],
        "time_w2": base["time_w2"], "time_b2": base["time_b2"],
        "input_blocks": base["input_blocks"],
        "middle_block": base["middle_block"],
        "hint_block": hint,
        "zero_convs": zero_convs,
        "middle_out": {"w": jnp.zeros((1, 1, mid_ch, mid_ch)), "b": jnp.zeros((mid_ch,))},
    }


def hint_features(params, hint: jax.Array) -> jax.Array:
    """hint: [B, H, W, 3] in [0, 1] -> [B, H/8, W/8, model_channels]."""
    h = hint
    for i, (p, stride) in enumerate(zip(params["hint_block"][:-1],
                                        list(HINT_STRIDES))):
        h = conv2d(h, p["w"], p["b"], stride=stride, padding=1)
        h = jax.nn.silu(h)
    last = params["hint_block"][-1]
    return conv2d(h, last["w"], last["b"], padding=1)


def control_residuals(params, cfg: UNetConfig, x: jax.Array, hint: jax.Array,
                      timesteps: jax.Array, context: jax.Array) -> List[jax.Array]:
    """Run the control encoder; returns per-input-block residuals + middle
    (cldm.py:283-305)."""
    mc = cfg.model_channels
    t_emb = timestep_embedding(timesteps, mc)
    emb = jax.nn.silu(t_emb @ params["time_w1"] + params["time_b1"])
    emb = emb @ params["time_w2"] + params["time_b2"]
    guided = hint_features(params, hint)

    input_plan, middle_plan, _ = block_plan(cfg)
    outs = []
    h = x
    for bi, (entries, layers) in enumerate(zip(input_plan, params["input_blocks"])):
        h = unet2d._run_block(entries, layers, h, emb, context, None, cfg, 1.0)
        if bi == 0:
            h = h + guided
        zc = params["zero_convs"][bi]
        outs.append(conv2d(h, zc["w"], zc["b"]))
    h = unet2d._run_block(middle_plan, params["middle_block"], h, emb, context,
                          None, cfg, 1.0)
    mo = params["middle_out"]
    outs.append(conv2d(h, mo["w"], mo["b"]))
    return outs


def controlled_forward(unet_params, cfg: UNetConfig, x: jax.Array,
                       timesteps: jax.Array, context: jax.Array,
                       control: List[jax.Array],
                       control_scale: float = 1.0) -> jax.Array:
    """UNet forward with control residuals added to middle + skips
    (cldm.py:23-45)."""
    mc = cfg.model_channels
    t_emb = timestep_embedding(timesteps, mc)
    emb = jax.nn.silu(t_emb @ unet_params["time_w1"] + unet_params["time_b1"])
    emb = emb @ unet_params["time_w2"] + unet_params["time_b2"]
    input_plan, middle_plan, output_plan = block_plan(cfg)
    control = [c * control_scale for c in control]
    hs = []
    h = x
    for entries, layers in zip(input_plan, unet_params["input_blocks"]):
        h = unet2d._run_block(entries, layers, h, emb, context, None, cfg, 1.0)
        hs.append(h)
    h = unet2d._run_block(middle_plan, unet_params["middle_block"], h, emb,
                          context, None, cfg, 1.0)
    h = h + control[-1]
    skips = control[:-1]
    for entries, layers in zip(output_plan, unet_params["output_blocks"]):
        h = jnp.concatenate([h, hs.pop() + skips.pop()], axis=-1)
        h = unet2d._run_block(entries, layers, h, emb, context, None, cfg, 1.0)
    h = group_norm(h, unet_params["out_norm_s"], unet_params["out_norm_b"])
    return conv2d(jax.nn.silu(h), unet_params["out_w"], unet_params["out_b"], padding=1)


def convert_torch(sd, cfg: UNetConfig, prefix: str = "control_model.") -> Dict[str, Any]:
    """ControlNet state dict -> param tree (cldm naming)."""
    from vitron_tpu.models.diffusion.layers import _np, conv_w, lin_w

    sub = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    input_plan, middle_plan, _ = block_plan(cfg)

    def res(b):
        p = {
            "norm1_s": _np(sub[b + "in_layers.0.weight"]), "norm1_b": _np(sub[b + "in_layers.0.bias"]),
            "conv1_w": conv_w(sub, b + "in_layers.2.weight"), "conv1_b": _np(sub[b + "in_layers.2.bias"]),
            "emb_w": lin_w(sub, b + "emb_layers.1.weight"), "emb_b": _np(sub[b + "emb_layers.1.bias"]),
            "norm2_s": _np(sub[b + "out_layers.0.weight"]), "norm2_b": _np(sub[b + "out_layers.0.bias"]),
            "conv2_w": conv_w(sub, b + "out_layers.3.weight"), "conv2_b": _np(sub[b + "out_layers.3.bias"]),
        }
        if (b + "skip_connection.weight") in sub:
            p["skip_w"] = conv_w(sub, b + "skip_connection.weight")
            p["skip_b"] = _np(sub[b + "skip_connection.bias"])
        return p

    from vitron_tpu.models.diffusion.layers import convert_spatial_transformer

    def block(entries, base):
        layers = []
        for j, e in enumerate(entries):
            if e[0] == "conv_in":
                layers.append({"w": conv_w(sub, f"{base}.{j}.weight"),
                               "b": _np(sub[f"{base}.{j}.bias"])})
            elif e[0] == "res":
                layers.append(res(f"{base}.{j}."))
            elif e[0] == "attn":
                layers.append(convert_spatial_transformer(
                    sub, f"{base}.{j}.", depth=cfg.transformer_depth))
            elif e[0] == "down":
                layers.append({"w": conv_w(sub, f"{base}.{j}.op.weight"),
                               "b": _np(sub[f"{base}.{j}.op.bias"])})
        return layers

    hint = []
    hint_idx = [0, 2, 4, 6, 8, 10, 12, 14]
    for i in hint_idx:
        hint.append({"w": conv_w(sub, f"input_hint_block.{i}.weight"),
                     "b": _np(sub[f"input_hint_block.{i}.bias"])})
    n_blocks = len(input_plan)
    return {
        "time_w1": lin_w(sub, "time_embed.0.weight"), "time_b1": _np(sub["time_embed.0.bias"]),
        "time_w2": lin_w(sub, "time_embed.2.weight"), "time_b2": _np(sub["time_embed.2.bias"]),
        "input_blocks": [block(b, f"input_blocks.{i}") for i, b in enumerate(input_plan)],
        "middle_block": [
            res("middle_block.0.") ,
            convert_spatial_transformer(sub, "middle_block.1.", depth=cfg.transformer_depth),
            res("middle_block.2."),
        ],
        "hint_block": hint,
        "zero_convs": [{"w": conv_w(sub, f"zero_convs.{i}.0.weight"),
                        "b": _np(sub[f"zero_convs.{i}.0.bias"])}
                       for i in range(n_blocks)],
        "middle_out": {"w": conv_w(sub, "middle_block_out.0.weight"),
                       "b": _np(sub["middle_block_out.0.bias"])},
    }

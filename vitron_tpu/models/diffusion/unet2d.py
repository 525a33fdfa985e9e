"""SD v1.4 UNet with GLIGEN grounding (gated self-attention fuser).

JAX re-design of the reference UNetModel
(reference: modules/GLIGEN/demo/gligen/ldm/modules/diffusionmodules/
openaimodel.py:455-502 + attention.py). NHWC convs, params as pure-array
pytrees; the block sequence ("plan") is derived statically from the config
so the forward unrolls under jit exactly once per geometry.

The same skeleton serves: GLIGEN text-box generation & inpainting (the
in_channels=9 variant), plain SD (no fuser params -> fuser skipped), and is
extended with temporal blocks for video diffusion in video_unet.py.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vitron_tpu.models.diffusion.layers import (
    _np,
    conv2d,
    conv_w,
    convert_spatial_transformer,
    group_norm,
    lin_w,
    spatial_transformer,
    timestep_embedding,
    upsample2x_nearest,
)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4              # 9 for GLIGEN inpainting (latent+mask+masked latent)
    model_channels: int = 320
    out_channels: int = 4
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (4, 2, 1)
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_heads: int = 8
    context_dim: int = 768
    transformer_depth: int = 1

    @staticmethod
    def sd_v1(**kw) -> "UNetConfig":
        return UNetConfig(**kw)

    @staticmethod
    def tiny(**kw) -> "UNetConfig":
        base = dict(model_channels=32, num_res_blocks=1,
                    attention_resolutions=(2, 1), channel_mult=(1, 2),
                    num_heads=2, context_dim=16, transformer_depth=1)
        base.update(kw)
        return UNetConfig(**base)


def block_plan(cfg: UNetConfig):
    """Static layer plan mirroring ldm's input/middle/output_blocks layout.

    Each block is a list of ('conv_in',)/('res', cin, cout)/('attn', ch)/
    ('down', ch)/('up', ch) entries; returns (input_plan, middle_plan,
    output_plan, skip_channels)."""
    mc = cfg.model_channels
    input_plan: List[List[tuple]] = [[("conv_in", cfg.in_channels, mc)]]
    skips = [mc]
    ch = mc
    ds = 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            block = [("res", ch, mult * mc)]
            ch = mult * mc
            if ds in cfg.attention_resolutions:
                block.append(("attn", ch))
            input_plan.append(block)
            skips.append(ch)
        if level != len(cfg.channel_mult) - 1:
            input_plan.append([("down", ch)])
            skips.append(ch)
            ds *= 2
    middle_plan = [("res", ch, ch), ("attn", ch), ("res", ch, ch)]
    output_plan: List[List[tuple]] = []
    for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
        for i in range(cfg.num_res_blocks + 1):
            ich = skips.pop()
            block = [("res", ch + ich, mult * mc)]
            ch = mult * mc
            if ds in cfg.attention_resolutions:
                block.append(("attn", ch))
            if level and i == cfg.num_res_blocks:
                block.append(("up", ch))
                ds //= 2
            output_plan.append(block)
    return input_plan, middle_plan, output_plan


# ------------------------------------------------------------------ init

def _conv_init(key, kh, kw, cin, cout, zero=False):
    if zero:
        return jnp.zeros((kh, kw, cin, cout), jnp.float32)
    fan = kh * kw * cin
    return jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) / np.sqrt(fan)


def _lin_init(key, cin, cout, zero=False):
    if zero:
        return jnp.zeros((cin, cout), jnp.float32)
    return jax.random.normal(key, (cin, cout), jnp.float32) / np.sqrt(cin)


def _res_init(key, cin, cout, emb_ch):
    ks = jax.random.split(key, 4)
    p = {
        "norm1_s": jnp.ones((cin,)), "norm1_b": jnp.zeros((cin,)),
        "conv1_w": _conv_init(ks[0], 3, 3, cin, cout), "conv1_b": jnp.zeros((cout,)),
        "emb_w": _lin_init(ks[1], emb_ch, cout), "emb_b": jnp.zeros((cout,)),
        "norm2_s": jnp.ones((cout,)), "norm2_b": jnp.zeros((cout,)),
        "conv2_w": _conv_init(ks[2], 3, 3, cout, cout, zero=True),
        "conv2_b": jnp.zeros((cout,)),
    }
    if cin != cout:
        p["skip_w"] = _conv_init(ks[3], 1, 1, cin, cout)
        p["skip_b"] = jnp.zeros((cout,))
    return p


def _attn_pack_init(key, ch, cfg: UNetConfig, with_fuser: bool):
    ks = jax.random.split(key, 12)
    d = ch

    def attn(i, kdim):
        return {
            "to_q": _lin_init(ks[i], d, d), "to_k": _lin_init(ks[i + 1], kdim, d),
            "to_v": _lin_init(ks[i + 2], kdim, d),
            "out_w": _lin_init(ks[i + 3], d, d), "out_b": jnp.zeros((d,)),
        }

    def ln():
        return {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}

    def ff(i):
        return {"proj_w": _lin_init(ks[i], d, d * 8), "proj_b": jnp.zeros((d * 8,)),
                "out_w": _lin_init(ks[i + 1], d * 4, d), "out_b": jnp.zeros((d,))}

    blk = {
        "attn1": attn(0, d), "attn2": attn(4, cfg.context_dim),
        "ff": ff(8), "norm1": ln(), "norm2": ln(), "norm3": ln(),
    }
    if with_fuser:
        blk["fuser"] = {
            "linear_w": _lin_init(ks[10], cfg.context_dim, d),
            "linear_b": jnp.zeros((d,)),
            "attn": attn(0, d), "ff": ff(8), "norm1": ln(), "norm2": ln(),
            "alpha_attn": jnp.zeros(()), "alpha_dense": jnp.zeros(()),
        }
    return {
        "norm_scale": jnp.ones((ch,)), "norm_bias": jnp.zeros((ch,)),
        "proj_in_w": _conv_init(ks[11], 1, 1, ch, d), "proj_in_b": jnp.zeros((d,)),
        "proj_out_w": _conv_init(ks[11], 1, 1, d, ch, zero=True),
        "proj_out_b": jnp.zeros((ch,)),
        "blocks": [blk for _ in range(cfg.transformer_depth)],
    }


def init_params(rng: jax.Array, cfg: UNetConfig, grounding: bool = True) -> Dict[str, Any]:
    mc = cfg.model_channels
    emb_ch = mc * 4
    input_plan, middle_plan, output_plan = block_plan(cfg)
    key_iter = iter(jax.random.split(rng, 512))

    def build_block(entries):
        layers = []
        for e in entries:
            if e[0] == "conv_in":
                layers.append({"w": _conv_init(next(key_iter), 3, 3, e[1], e[2]),
                               "b": jnp.zeros((e[2],))})
            elif e[0] == "res":
                layers.append(_res_init(next(key_iter), e[1], e[2], emb_ch))
            elif e[0] == "attn":
                layers.append(_attn_pack_init(next(key_iter), e[1], cfg, grounding))
            elif e[0] in ("down", "up"):
                layers.append({"w": _conv_init(next(key_iter), 3, 3, e[1], e[1]),
                               "b": jnp.zeros((e[1],))})
        return layers

    params = {
        "time_w1": _lin_init(next(key_iter), mc, emb_ch), "time_b1": jnp.zeros((emb_ch,)),
        "time_w2": _lin_init(next(key_iter), emb_ch, emb_ch), "time_b2": jnp.zeros((emb_ch,)),
        "input_blocks": [build_block(b) for b in input_plan],
        "middle_block": build_block(middle_plan),
        "output_blocks": [build_block(b) for b in output_plan],
        "out_norm_s": jnp.ones((mc,)), "out_norm_b": jnp.zeros((mc,)),
        "out_w": _conv_init(next(key_iter), 3, 3, mc, cfg.out_channels, zero=True),
        "out_b": jnp.zeros((cfg.out_channels,)),
    }
    if grounding:
        pos_dim = 8 * 2 * 4
        ks = jax.random.split(next(key_iter), 3)
        params["position_net"] = {
            "null_positive": jnp.zeros((cfg.context_dim,)),
            "null_position": jnp.zeros((pos_dim,)),
            "w0": _lin_init(ks[0], cfg.context_dim + pos_dim, 512), "b0": jnp.zeros((512,)),
            "w1": _lin_init(ks[1], 512, 512), "b1": jnp.zeros((512,)),
            "w2": _lin_init(ks[2], 512, cfg.context_dim), "b2": jnp.zeros((cfg.context_dim,)),
        }
    return params


# ------------------------------------------------------------------ forward

def _res_block(p, x, emb):
    h = group_norm(x, p["norm1_s"], p["norm1_b"])
    h = conv2d(jax.nn.silu(h), p["conv1_w"], p["conv1_b"], padding=1)
    emb_out = jax.nn.silu(emb) @ p["emb_w"] + p["emb_b"]
    # cast: the time embedding runs f32; without this the f32 promotes every
    # downstream conv/norm to f32 (measured 2x conv slowdown + per-step
    # weight-conversion fusions on TPU)
    h = h + emb_out.astype(h.dtype)[:, None, None, :]
    h = group_norm(h, p["norm2_s"], p["norm2_b"])
    h = conv2d(jax.nn.silu(h), p["conv2_w"], p["conv2_b"], padding=1)
    skip = x
    if "skip_w" in p:
        skip = conv2d(x, p["skip_w"], p["skip_b"])
    return skip + h


def _run_block(entries, layers, x, emb, context, objs, cfg, gate_scale):
    for e, p in zip(entries, layers):
        kind = e[0]
        if kind == "conv_in":
            x = conv2d(x, p["w"], p["b"], padding=1)
        elif kind == "res":
            x = _res_block(p, x, emb)
        elif kind == "attn":
            x = spatial_transformer(p, x, context, objs, cfg.num_heads, gate_scale)
        elif kind == "down":
            x = conv2d(x, p["w"], p["b"], stride=2, padding=1)
        elif kind == "up":
            b, h, w, c = x.shape
            x = upsample2x_nearest(x)
            x = conv2d(x, p["w"], p["b"], padding=1)
    return x


def forward(params: Dict[str, Any], cfg: UNetConfig, x: jax.Array,
            timesteps: jax.Array, context: jax.Array,
            objs: Optional[jax.Array] = None, gate_scale=1.0) -> jax.Array:
    """x: [B, H, W, in_ch] latent; timesteps: [B]; context: [B, 77, 768]
    text embeddings; objs: [B, max_box, context_dim] grounding tokens."""
    mc = cfg.model_channels
    t_emb = timestep_embedding(timesteps, mc)
    emb = jax.nn.silu(t_emb @ params["time_w1"] + params["time_b1"])
    emb = emb @ params["time_w2"] + params["time_b2"]

    input_plan, middle_plan, output_plan = block_plan(cfg)
    hs = []
    h = x
    for entries, layers in zip(input_plan, params["input_blocks"]):
        h = _run_block(entries, layers, h, emb, context, objs, cfg, gate_scale)
        hs.append(h)
    h = _run_block(middle_plan, params["middle_block"], h, emb, context, objs,
                   cfg, gate_scale)
    for entries, layers in zip(output_plan, params["output_blocks"]):
        h = jnp.concatenate([h, hs.pop()], axis=-1)
        h = _run_block(entries, layers, h, emb, context, objs, cfg, gate_scale)
    h = group_norm(h, params["out_norm_s"], params["out_norm_b"])
    return conv2d(jax.nn.silu(h), params["out_w"], params["out_b"], padding=1)


def grounding_tokens(params, boxes, masks, text_embeddings) -> jax.Array:
    """position_net wrapper (openaimodel.py:383-405)."""
    from vitron_tpu.models.diffusion.layers import position_net

    return position_net(params["position_net"], boxes, masks, text_embeddings)


def quantize_params(params: Dict[str, Any],
                    min_channels: int = 64) -> Dict[str, Any]:
    """W8A8 quantization of the SD image UNet — spatial convs only.

    Measured NEGATIVE e2e on-chip (kept as a gated, tested record so later
    rounds don't re-litigate): the 512^2 CFG step runs **22.3 steps/s
    quantized vs 53.6 bf16** (v5e, docs/PERF.md round-4 notes). Same arm
    as `unet_sd_video.quantize_params`'s conv-only default — every
    [3, 3, ci, co] conv with ci, co >= min_channels becomes the
    {"qc", "s"} per-out-channel int8 dict `layers.conv2d` routes to the
    integer MXU — but the physics lands the other way here: the video
    UNet's convs run at 90-98% of the bf16 MXU roofline (int8's 2x peak
    is the only headroom), while the SD step is ~37% MFU with shallow
    N=320-class output channels, so the 2x peak buys nothing and the
    dynamic activation-quant chain (abs-max reduce + int8
    materialization per site) adds pure HBM overhead.

    conv_in / out_w (ci or co of 4), attention/FF dots, position_net, and
    all norms stay full precision. Inference-only: the quantized tree is
    not differentiable. The VITRON_UNET_QUANT=w8a8 knob (`quant_default`)
    exists for hardware where the tradeoff flips; bf16 is the default and
    the bench headline."""
    from vitron_tpu.kernels.quantization import quantize_conv2d

    import jax.numpy as jnp

    def eligible(v) -> bool:
        # float-dtype guard makes double application a no-op: an already-
        # quantized {'qc','s'} leaf's int8 'qc' is itself [3,3,ci,co]-shaped
        # and would otherwise be re-wrapped into a nested dict that
        # conv2d_w8a8 crashes on at trace time
        return (hasattr(v, "ndim") and v.ndim == 4
                and jnp.issubdtype(v.dtype, jnp.floating)
                and v.shape[0] == 3 and v.shape[1] == 3
                and v.shape[2] >= min_channels and v.shape[3] >= min_channels)

    def walk(p):
        if isinstance(p, dict):
            if "qc" in p and "s" in p:
                return p
            return {k: (quantize_conv2d(v) if eligible(v) else walk(v))
                    for k, v in p.items()}
        if isinstance(p, (list, tuple)):
            return type(p)(walk(v) for v in p)
        return p

    return walk(params)


def quant_default() -> bool:
    """VITRON_UNET_QUANT=w8a8 opts serving into the quantized image UNet."""
    import os

    return os.environ.get("VITRON_UNET_QUANT", "") == "w8a8"


# ------------------------------------------------------------------ convert

def convert_ldm_unet(sd, cfg: UNetConfig) -> Dict[str, Any]:
    """ldm/GLIGEN UNet state dict (keys input_blocks.N.M....) -> param tree.

    Accepts dicts with or without a leading 'model.diffusion_model.' prefix.
    """
    pfx = ""
    if any(k.startswith("model.diffusion_model.") for k in sd):
        pfx = "model.diffusion_model."
    input_plan, middle_plan, output_plan = block_plan(cfg)

    def res(b):
        p = {
            "norm1_s": _np(sd[b + "in_layers.0.weight"]), "norm1_b": _np(sd[b + "in_layers.0.bias"]),
            "conv1_w": conv_w(sd, b + "in_layers.2.weight"), "conv1_b": _np(sd[b + "in_layers.2.bias"]),
            "emb_w": lin_w(sd, b + "emb_layers.1.weight"), "emb_b": _np(sd[b + "emb_layers.1.bias"]),
            "norm2_s": _np(sd[b + "out_layers.0.weight"]), "norm2_b": _np(sd[b + "out_layers.0.bias"]),
            "conv2_w": conv_w(sd, b + "out_layers.3.weight"), "conv2_b": _np(sd[b + "out_layers.3.bias"]),
        }
        if (b + "skip_connection.weight") in sd:
            p["skip_w"] = conv_w(sd, b + "skip_connection.weight")
            p["skip_b"] = _np(sd[b + "skip_connection.bias"])
        return p

    def block(entries, base):
        layers = []
        j = 0
        for e in entries:
            if e[0] == "conv_in":
                layers.append({"w": conv_w(sd, f"{base}.{j}.weight"),
                               "b": _np(sd[f"{base}.{j}.bias"])})
            elif e[0] == "res":
                layers.append(res(f"{base}.{j}."))
            elif e[0] == "attn":
                layers.append(convert_spatial_transformer(
                    sd, f"{base}.{j}.", depth=cfg.transformer_depth))
            elif e[0] == "down":
                layers.append({"w": conv_w(sd, f"{base}.{j}.op.weight"),
                               "b": _np(sd[f"{base}.{j}.op.bias"])})
            elif e[0] == "up":
                layers.append({"w": conv_w(sd, f"{base}.{j}.conv.weight"),
                               "b": _np(sd[f"{base}.{j}.conv.bias"])})
            j += 1
        return layers

    def mid():
        layers = []
        for j, e in enumerate(middle_plan):
            if e[0] == "res":
                layers.append(res(f"{pfx}middle_block.{j}."))
            else:
                layers.append(convert_spatial_transformer(
                    sd, f"{pfx}middle_block.{j}.", depth=cfg.transformer_depth))
        return layers

    params = {
        "time_w1": lin_w(sd, pfx + "time_embed.0.weight"), "time_b1": _np(sd[pfx + "time_embed.0.bias"]),
        "time_w2": lin_w(sd, pfx + "time_embed.2.weight"), "time_b2": _np(sd[pfx + "time_embed.2.bias"]),
        "input_blocks": [block(b, f"{pfx}input_blocks.{i}") for i, b in enumerate(input_plan)],
        "middle_block": mid(),
        "output_blocks": [block(b, f"{pfx}output_blocks.{i}") for i, b in enumerate(output_plan)],
        "out_norm_s": _np(sd[pfx + "out.0.weight"]), "out_norm_b": _np(sd[pfx + "out.0.bias"]),
        "out_w": conv_w(sd, pfx + "out.2.weight"), "out_b": _np(sd[pfx + "out.2.bias"]),
    }
    if (pfx + "position_net.null_positive_feature") in sd:
        from vitron_tpu.models.diffusion.layers import convert_position_net

        params["position_net"] = convert_position_net(sd, pfx + "position_net.")
    return params

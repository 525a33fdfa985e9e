"""AutoencoderKL (SD VAE) encoder/decoder.

JAX re-design of the ldm autoencoder used by GLIGEN/StableVideo
(reference: modules/GLIGEN/demo/gligen/ldm/models/autoencoder.py:17-45 and
ldm/modules/diffusionmodules/model.py Encoder/Decoder). NHWC throughout;
the spatial mid-attention is one batched einsum.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vitron_tpu.models.diffusion.layers import (_np, conv2d, conv_w,
                                                group_norm,
                                                upsample2x_nearest)

SD_SCALE_FACTOR = 0.18215


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    base_channels: int = 128
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4

    @staticmethod
    def sd(**kw) -> "VAEConfig":
        return VAEConfig(**kw)

    @staticmethod
    def tiny(**kw) -> "VAEConfig":
        base = dict(base_channels=32, channel_mult=(1, 2), num_res_blocks=1,
                    z_channels=4)
        base.update(kw)
        return VAEConfig(**base)


def _resnet(p, x):
    h = group_norm(x, p["norm1_s"], p["norm1_b"])
    h = conv2d(jax.nn.silu(h), p["conv1_w"], p["conv1_b"], padding=1)
    h = group_norm(h, p["norm2_s"], p["norm2_b"])
    h = conv2d(jax.nn.silu(h), p["conv2_w"], p["conv2_b"], padding=1)
    if "nin_w" in p:
        x = conv2d(x, p["nin_w"], p["nin_b"])
    return x + h


def _attn(p, x):
    from vitron_tpu.models.diffusion.layers import _mha

    b, h, w, c = x.shape
    hn = group_norm(x, p["norm_s"], p["norm_b"])
    q = conv2d(hn, p["q_w"], p["q_b"]).reshape(b, h * w, c)
    k = conv2d(hn, p["k_w"], p["k_b"]).reshape(b, h * w, c)
    v = conv2d(hn, p["v_w"], p["v_b"]).reshape(b, h * w, c)
    # single-head over h*w tokens; _mha routes >=1024 tokens to the Pallas
    # flash kernel (the einsum path materializes fp32 [b, 4096, 4096] at
    # 512^2 decode)
    o = _mha(q, k, v, heads=1, scale=c ** -0.5).reshape(b, h, w, c)
    return x + conv2d(o, p["proj_w"], p["proj_b"])


def encode(params: Dict[str, Any], cfg: VAEConfig, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """x: [B, H, W, 3] in [-1, 1] -> (mean, logvar) each [B, H/8, W/8, z]."""
    e = params["encoder"]
    h = conv2d(x, e["conv_in_w"], e["conv_in_b"], padding=1)
    for li, level in enumerate(e["down"]):
        for blk in level["blocks"]:
            h = _resnet(blk, h)
        if "down_w" in level:
            # ldm pads (0,1,0,1) then convs stride 2 with no padding
            h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            h = conv2d(h, level["down_w"], level["down_b"], stride=2, padding=0)
    h = _resnet(e["mid1"], h)
    h = _attn(e["mid_attn"], h)
    h = _resnet(e["mid2"], h)
    h = group_norm(h, e["out_norm_s"], e["out_norm_b"])
    h = conv2d(jax.nn.silu(h), e["conv_out_w"], e["conv_out_b"], padding=1)
    moments = conv2d(h, params["quant_w"], params["quant_b"])
    mean, logvar = jnp.split(moments, 2, axis=-1)
    return mean, jnp.clip(logvar, -30.0, 20.0)


def sample_latent(rng, mean, logvar):
    return mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape, mean.dtype)


def decode(params: Dict[str, Any], cfg: VAEConfig, z: jax.Array) -> jax.Array:
    """z: [B, h, w, z_channels] -> image [B, 8h, 8w, 3] in [-1, 1]."""
    d = params["decoder"]
    h = conv2d(z, params["post_quant_w"], params["post_quant_b"])
    h = conv2d(h, d["conv_in_w"], d["conv_in_b"], padding=1)
    h = _resnet(d["mid1"], h)
    h = _attn(d["mid_attn"], h)
    h = _resnet(d["mid2"], h)
    for level in d["up"]:
        for blk in level["blocks"]:
            h = _resnet(blk, h)
        if "up_w" in level:
            b, hh, ww, c = h.shape
            h = upsample2x_nearest(h)
            h = conv2d(h, level["up_w"], level["up_b"], padding=1)
    h = group_norm(h, d["out_norm_s"], d["out_norm_b"])
    return conv2d(jax.nn.silu(h), d["conv_out_w"], d["conv_out_b"], padding=1)


# ---------------------------------------------------------------- init

def _resnet_init(key, cin, cout):
    ks = jax.random.split(key, 3)

    def cw(k, ci, co, kk=3):
        return jax.random.normal(k, (kk, kk, ci, co), jnp.float32) / np.sqrt(kk * kk * ci)

    p = {
        "norm1_s": jnp.ones((cin,)), "norm1_b": jnp.zeros((cin,)),
        "conv1_w": cw(ks[0], cin, cout), "conv1_b": jnp.zeros((cout,)),
        "norm2_s": jnp.ones((cout,)), "norm2_b": jnp.zeros((cout,)),
        "conv2_w": cw(ks[1], cout, cout), "conv2_b": jnp.zeros((cout,)),
    }
    if cin != cout:
        p["nin_w"] = cw(ks[2], cin, cout, 1)
        p["nin_b"] = jnp.zeros((cout,))
    return p


def _attn_init(key, c):
    ks = jax.random.split(key, 4)

    def cw(k, ci, co):
        return jax.random.normal(k, (1, 1, ci, co), jnp.float32) / np.sqrt(ci)

    return {
        "norm_s": jnp.ones((c,)), "norm_b": jnp.zeros((c,)),
        "q_w": cw(ks[0], c, c), "q_b": jnp.zeros((c,)),
        "k_w": cw(ks[1], c, c), "k_b": jnp.zeros((c,)),
        "v_w": cw(ks[2], c, c), "v_b": jnp.zeros((c,)),
        "proj_w": cw(ks[3], c, c), "proj_b": jnp.zeros((c,)),
    }


def init_params(rng: jax.Array, cfg: VAEConfig) -> Dict[str, Any]:
    bc = cfg.base_channels
    key_iter = iter(jax.random.split(rng, 256))

    def cw(ci, co, kk=3):
        return jax.random.normal(next(key_iter), (kk, kk, ci, co), jnp.float32) / np.sqrt(kk * kk * ci)

    # encoder
    ch = bc
    down = []
    for li, mult in enumerate(cfg.channel_mult):
        blocks = []
        for _ in range(cfg.num_res_blocks):
            blocks.append(_resnet_init(next(key_iter), ch, mult * bc))
            ch = mult * bc
        level = {"blocks": blocks}
        if li != len(cfg.channel_mult) - 1:
            level["down_w"] = cw(ch, ch)
            level["down_b"] = jnp.zeros((ch,))
        down.append(level)
    encoder = {
        "conv_in_w": cw(cfg.in_channels, bc), "conv_in_b": jnp.zeros((bc,)),
        "down": down,
        "mid1": _resnet_init(next(key_iter), ch, ch),
        "mid_attn": _attn_init(next(key_iter), ch),
        "mid2": _resnet_init(next(key_iter), ch, ch),
        "out_norm_s": jnp.ones((ch,)), "out_norm_b": jnp.zeros((ch,)),
        "conv_out_w": cw(ch, 2 * cfg.z_channels), "conv_out_b": jnp.zeros((2 * cfg.z_channels,)),
    }
    # decoder (reverse)
    dch = cfg.channel_mult[-1] * bc
    decoder_up = []
    for li, mult in list(enumerate(cfg.channel_mult))[::-1]:
        blocks = []
        for _ in range(cfg.num_res_blocks + 1):
            blocks.append(_resnet_init(next(key_iter), dch, mult * bc))
            dch = mult * bc
        level = {"blocks": blocks}
        if li != 0:
            level["up_w"] = cw(dch, dch)
            level["up_b"] = jnp.zeros((dch,))
        decoder_up.append(level)
    top = cfg.channel_mult[-1] * bc
    decoder = {
        "conv_in_w": cw(cfg.z_channels, top), "conv_in_b": jnp.zeros((top,)),
        "mid1": _resnet_init(next(key_iter), top, top),
        "mid_attn": _attn_init(next(key_iter), top),
        "mid2": _resnet_init(next(key_iter), top, top),
        "up": decoder_up,
        "out_norm_s": jnp.ones((bc,)), "out_norm_b": jnp.zeros((bc,)),
        "conv_out_w": cw(bc, cfg.in_channels), "conv_out_b": jnp.zeros((cfg.in_channels,)),
    }
    return {
        "encoder": encoder,
        "decoder": decoder,
        "quant_w": jax.random.normal(next(key_iter), (1, 1, 2 * cfg.z_channels, 2 * cfg.z_channels)) / np.sqrt(2 * cfg.z_channels),
        "quant_b": jnp.zeros((2 * cfg.z_channels,)),
        "post_quant_w": jax.random.normal(next(key_iter), (1, 1, cfg.z_channels, cfg.z_channels)) / np.sqrt(cfg.z_channels),
        "post_quant_b": jnp.zeros((cfg.z_channels,)),
    }


# ---------------------------------------------------------------- convert

def convert_ldm_vae(sd, cfg: VAEConfig, prefix: str = "") -> Dict[str, Any]:
    """ldm AutoencoderKL state dict -> param tree. Handles 'first_stage_model.'
    or bare prefixes."""
    if not prefix and any(k.startswith("first_stage_model.") for k in sd):
        prefix = "first_stage_model."

    def g(k):
        return _np(sd[prefix + k])

    def cv(k):
        return conv_w(sd, prefix + k)

    def resnet(b):
        p = {
            "norm1_s": g(b + "norm1.weight"), "norm1_b": g(b + "norm1.bias"),
            "conv1_w": cv(b + "conv1.weight"), "conv1_b": g(b + "conv1.bias"),
            "norm2_s": g(b + "norm2.weight"), "norm2_b": g(b + "norm2.bias"),
            "conv2_w": cv(b + "conv2.weight"), "conv2_b": g(b + "conv2.bias"),
        }
        if (prefix + b + "nin_shortcut.weight") in sd:
            p["nin_w"] = cv(b + "nin_shortcut.weight")
            p["nin_b"] = g(b + "nin_shortcut.bias")
        return p

    def attn(b):
        return {
            "norm_s": g(b + "norm.weight"), "norm_b": g(b + "norm.bias"),
            "q_w": cv(b + "q.weight"), "q_b": g(b + "q.bias"),
            "k_w": cv(b + "k.weight"), "k_b": g(b + "k.bias"),
            "v_w": cv(b + "v.weight"), "v_b": g(b + "v.bias"),
            "proj_w": cv(b + "proj_out.weight"), "proj_b": g(b + "proj_out.bias"),
        }

    n_levels = len(cfg.channel_mult)
    down = []
    for li in range(n_levels):
        level = {"blocks": [resnet(f"encoder.down.{li}.block.{bi}.")
                            for bi in range(cfg.num_res_blocks)]}
        if (prefix + f"encoder.down.{li}.downsample.conv.weight") in sd:
            level["down_w"] = cv(f"encoder.down.{li}.downsample.conv.weight")
            level["down_b"] = g(f"encoder.down.{li}.downsample.conv.bias")
        down.append(level)
    up = []
    for li in range(n_levels - 1, -1, -1):  # decoder iterates top-down
        level = {"blocks": [resnet(f"decoder.up.{li}.block.{bi}.")
                            for bi in range(cfg.num_res_blocks + 1)]}
        if (prefix + f"decoder.up.{li}.upsample.conv.weight") in sd:
            level["up_w"] = cv(f"decoder.up.{li}.upsample.conv.weight")
            level["up_b"] = g(f"decoder.up.{li}.upsample.conv.bias")
        up.append(level)
    return {
        "encoder": {
            "conv_in_w": cv("encoder.conv_in.weight"), "conv_in_b": g("encoder.conv_in.bias"),
            "down": down,
            "mid1": resnet("encoder.mid.block_1."),
            "mid_attn": attn("encoder.mid.attn_1."),
            "mid2": resnet("encoder.mid.block_2."),
            "out_norm_s": g("encoder.norm_out.weight"), "out_norm_b": g("encoder.norm_out.bias"),
            "conv_out_w": cv("encoder.conv_out.weight"), "conv_out_b": g("encoder.conv_out.bias"),
        },
        "decoder": {
            "conv_in_w": cv("decoder.conv_in.weight"), "conv_in_b": g("decoder.conv_in.bias"),
            "mid1": resnet("decoder.mid.block_1."),
            "mid_attn": attn("decoder.mid.attn_1."),
            "mid2": resnet("decoder.mid.block_2."),
            "up": up,
            "out_norm_s": g("decoder.norm_out.weight"), "out_norm_b": g("decoder.norm_out.bias"),
            "conv_out_w": cv("decoder.conv_out.weight"), "conv_out_b": g("decoder.conv_out.bias"),
        },
        "quant_w": cv("quant_conv.weight"), "quant_b": g("quant_conv.bias"),
        "post_quant_w": cv("post_quant_conv.weight"), "post_quant_b": g("post_quant_conv.bias"),
    }

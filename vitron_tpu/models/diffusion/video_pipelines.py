"""Text-to-video (ZeroScope) and image-to-video (I2VGen-XL) pipelines.

TPU-native rebuild of the Vitron video-generation backends (reference:
app.py:215-240 — ZeroScope 576w, 50 steps DPM-Solver++, 320x576, 24 frames;
app.py:316-342 — I2VGenXL 50 steps, guidance 9.0, fixed seed, negative
prompt). The reference loads each diffusers pipeline from disk per request
and offloads to CPU; here weights are resident and every sampler step is one
jitted video-UNet call with cond+uncond batched.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vitron_tpu.models.diffusion import clip_text, samplers, vae, video_unet
from vitron_tpu.models.diffusion.vae import SD_SCALE_FACTOR


@dataclasses.dataclass(frozen=True)
class Text2VideoConfig:
    unet: video_unet.VideoUNetConfig = dataclasses.field(
        default_factory=video_unet.VideoUNetConfig.zeroscope)
    vae: vae.VAEConfig = dataclasses.field(default_factory=vae.VAEConfig.sd)
    text: clip_text.TextConfig = dataclasses.field(default_factory=clip_text.TextConfig.clip_l)
    height: int = 320
    width: int = 576
    num_frames: int = 24
    steps: int = 50
    guidance_scale: float = 9.0

    @staticmethod
    def tiny(**kw) -> "Text2VideoConfig":
        base = dict(
            unet=video_unet.VideoUNetConfig.tiny(),
            vae=vae.VAEConfig.tiny(),
            text=clip_text.TextConfig.tiny(hidden_size=16, num_heads=2,
                                           intermediate_size=32),
            height=16, width=16, num_frames=4, steps=4, guidance_scale=7.0)
        base.update(kw)
        return Text2VideoConfig(**base)

    @property
    def latent_hw(self):
        f = 2 ** (len(self.vae.channel_mult) - 1)
        return self.height // f, self.width // f


class Text2VideoPipeline:
    """prompt -> [T, H, W, 3] uint8 frames (ZeroScope-style)."""

    def __init__(self, cfg: Text2VideoConfig, unet_params, vae_params,
                 text_params, tokenizer=None):
        self.cfg = cfg
        self.unet_params = unet_params
        self.vae_params = vae_params
        self.text_params = text_params
        self.tokenizer = tokenizer

    def encode_prompt(self, texts):
        tok = self.tokenizer(texts, padding="max_length",
                             max_length=self.cfg.text.max_length,
                             truncation=True, return_tensors="np")
        return clip_text.encode(self.text_params, self.cfg.text,
                                jnp.asarray(tok["input_ids"]))

    def generate(self, prompt: str, negative_prompt: str = "",
                 rng: Optional[jax.Array] = None,
                 steps: Optional[int] = None) -> jax.Array:
        cfg = self.cfg
        steps = steps or cfg.steps
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        context = self.encode_prompt([prompt])
        uc = self.encode_prompt([negative_prompt])
        ctx2 = jnp.concatenate([context, uc], axis=0)
        gs = cfg.guidance_scale

        def eps(x, t, gate):
            xx = jnp.concatenate([x, x], axis=0)
            tt = jnp.broadcast_to(jnp.asarray(t), (2,))
            out = video_unet.forward(self.unet_params, cfg.unet, xx, tt, ctx2)
            e_c, e_uc = jnp.split(out, 2, axis=0)
            return e_uc + gs * (e_c - e_uc)

        lh, lw = cfg.latent_hw
        rng, k = jax.random.split(rng)
        x = jax.random.normal(
            k, (1, cfg.num_frames, lh, lw, cfg.unet.spatial.out_channels))
        sched = samplers.DiffusionSchedule.create("linear", 1000, 0.00085, 0.012)
        x = samplers.dpm_solver_pp_2m(eps, x, sched, steps)
        frames = vae.decode(self.vae_params, cfg.vae,
                            x[0] / SD_SCALE_FACTOR)  # [T, H, W, 3]
        frames = jnp.clip(frames, -1, 1) * 0.5 + 0.5
        return (frames * 255).astype(jnp.uint8)


@dataclasses.dataclass(frozen=True)
class Image2VideoConfig:
    unet: video_unet.VideoUNetConfig = dataclasses.field(
        default_factory=video_unet.VideoUNetConfig.i2vgen)
    vae: vae.VAEConfig = dataclasses.field(default_factory=vae.VAEConfig.sd)
    text: clip_text.TextConfig = dataclasses.field(default_factory=clip_text.TextConfig.clip_l)
    size: int = 512
    num_frames: int = 16
    steps: int = 50
    guidance_scale: float = 9.0

    @staticmethod
    def tiny(**kw) -> "Image2VideoConfig":
        import dataclasses as dc

        tiny_spatial = video_unet.VideoUNetConfig.tiny()
        base = dict(
            unet=dc.replace(tiny_spatial,
                            spatial=dc.replace(tiny_spatial.spatial, in_channels=8)),
            vae=vae.VAEConfig.tiny(),
            text=clip_text.TextConfig.tiny(hidden_size=16, num_heads=2,
                                           intermediate_size=32),
            size=16, num_frames=4, steps=4, guidance_scale=7.0)
        base.update(kw)
        return Image2VideoConfig(**base)

    @property
    def latent_size(self):
        return self.size // (2 ** (len(self.vae.channel_mult) - 1))


class Image2VideoPipeline:
    """image (+prompt) -> video frames (I2VGen-XL-style conditioning:
    first-frame latent concatenated channelwise; reference
    unet_i2vgen.py:20-418)."""

    def __init__(self, cfg: Image2VideoConfig, unet_params, vae_params,
                 text_params, tokenizer=None):
        self.cfg = cfg
        self.unet_params = unet_params
        self.vae_params = vae_params
        self.text_params = text_params
        self.tokenizer = tokenizer

    def encode_prompt(self, texts):
        tok = self.tokenizer(texts, padding="max_length",
                             max_length=self.cfg.text.max_length,
                             truncation=True, return_tensors="np")
        return clip_text.encode(self.text_params, self.cfg.text,
                                jnp.asarray(tok["input_ids"]))

    def generate(self, image: jax.Array, prompt: str,
                 negative_prompt: str = "",
                 rng: Optional[jax.Array] = None,
                 steps: Optional[int] = None) -> jax.Array:
        """image: [H, W, 3] uint8 -> [T, H, W, 3] uint8."""
        cfg = self.cfg
        steps = steps or cfg.steps
        rng = rng if rng is not None else jax.random.PRNGKey(8800)  # app.py:332
        context = self.encode_prompt([prompt])
        uc = self.encode_prompt([negative_prompt])
        ctx2 = jnp.concatenate([context, uc], axis=0)
        gs = cfg.guidance_scale

        img = (image.astype(jnp.float32) / 255.0 - 0.5) / 0.5
        mean, _ = vae.encode(self.vae_params, cfg.vae, img[None])
        first_latent = mean * SD_SCALE_FACTOR  # [1, h, w, z]
        cond = jnp.broadcast_to(first_latent[:, None],
                                (1, cfg.num_frames) + first_latent.shape[1:])
        cond2 = jnp.concatenate([cond, cond], axis=0)

        def eps(x, t, gate):
            xx = jnp.concatenate([x, x], axis=0)
            xx = jnp.concatenate([xx, cond2], axis=-1)
            tt = jnp.broadcast_to(jnp.asarray(t), (2,))
            out = video_unet.forward(self.unet_params, cfg.unet, xx, tt, ctx2)
            e_c, e_uc = jnp.split(out, 2, axis=0)
            return e_uc + gs * (e_c - e_uc)

        ls = cfg.latent_size
        rng, k = jax.random.split(rng)
        x = jax.random.normal(k, (1, cfg.num_frames, ls, ls, 4))
        sched = samplers.DiffusionSchedule.create("linear", 1000, 0.00085, 0.012)
        x = samplers.ddim_sample(eps, x, sched, steps)
        frames = vae.decode(self.vae_params, cfg.vae, x[0] / SD_SCALE_FACTOR)
        frames = jnp.clip(frames, -1, 1) * 0.5 + 0.5
        return (frames * 255).astype(jnp.uint8)

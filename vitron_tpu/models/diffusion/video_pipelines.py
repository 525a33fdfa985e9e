"""Text-to-video (ZeroScope/T2V) and image-to-video (I2VGen-XL) pipelines.

TPU-native rebuild of the Vitron video-generation backends (reference:
app.py:215-240 — ZeroScope 576w, 50 steps, 320x576, 24 frames;
app.py:316-342 — I2VGenXL 50 steps, guidance 9.0, fixed seed, negative
prompt; in-repo engine: modules/i2vgen-xl/tools/inferences/
inference_i2vgen_entrance.py:100-234). The reference loads each pipeline
from disk per request and offloads to CPU; here weights are resident and
every sampler step is one jitted video-UNet call with cond+uncond batched.

The UNets are the faithful UNetSD_T2VBase / UNetSD_I2VGen rebuilds
(unet_sd_video.py) whose convert_torch loads real upstream checkpoints;
sampling is the reference's v-prediction DDIM over the cosine
zero-terminal-SNR schedule (configs/i2vgen_xl_train.yaml:52-66).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vitron_tpu.models.diffusion import clip_text, samplers, unet_sd_video, vae
from vitron_tpu.models.diffusion.vae import SD_SCALE_FACTOR


def _schedule(cfg_unet) -> samplers.DiffusionSchedule:
    # DiffusionDDIM schedule (i2vgen_xl_train.yaml:52-60 / t2v_train.yaml)
    return samplers.DiffusionSchedule.create(
        "cosine", 1000, zero_terminal_snr=True)


@dataclasses.dataclass(frozen=True)
class Text2VideoConfig:
    unet: unet_sd_video.UNetSDVideoConfig = dataclasses.field(
        default_factory=unet_sd_video.UNetSDVideoConfig.t2v)
    vae: vae.VAEConfig = dataclasses.field(default_factory=vae.VAEConfig.sd)
    text: clip_text.TextConfig = dataclasses.field(
        default_factory=lambda: clip_text.TextConfig.clip_l(hidden_size=1024,
                                                            num_heads=16))
    height: int = 320
    width: int = 576
    num_frames: int = 24
    steps: int = 50
    guidance_scale: float = 9.0

    @staticmethod
    def tiny(**kw) -> "Text2VideoConfig":
        base = dict(
            unet=unet_sd_video.UNetSDVideoConfig.tiny(
                "t2v", context_dim=16, y_dim=16),
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
    """prompt -> [T, H, W, 3] uint8 frames (UNetSD_T2VBase / ZeroScope)."""

    def __init__(self, cfg: Text2VideoConfig, unet_params, vae_params,
                 text_params, tokenizer=None):
        self.cfg = cfg
        if unet_sd_video.quant_default():
            # VITRON_VUNET_QUANT=w8a8: integer-MXU conv quantization
            # (unet_sd_video.quantize_params — measured 1.52 -> 1.65
            # CFG steps/s, docs/PERF.md round-4 W8A8 notes; bf16 stays
            # the default)
            unet_params = unet_sd_video.quantize_params(unet_params)
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
        """Host side: tokenization only; encoder -> DDIM -> VAE decode
        runs as ONE cached jitted program (eager dispatch costs ~33 ms/op
        on the tunnel-attached TPU)."""
        cfg = self.cfg
        steps = steps or cfg.steps
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        ids = jnp.asarray(self._token_ids([prompt, negative_prompt]))
        return self._get_run(steps)(self.unet_params, self.vae_params,
                                    self.text_params, ids, rng)

    def _token_ids(self, texts):
        tok = self.tokenizer(texts, padding="max_length",
                             max_length=self.cfg.text.max_length,
                             truncation=True, return_tensors="np")
        return tok["input_ids"]

    def _get_run(self, steps: int):
        if not hasattr(self, "_run_cache"):
            from vitron_tpu.runtime.telemetry import ProgramCache
            self._run_cache = ProgramCache("t2v-run", max_entries=4)
        fn = self._run_cache.lookup(steps)
        if fn is not None:
            return fn
        cfg = self.cfg
        gs = cfg.guidance_scale
        sched = _schedule(cfg.unet)

        def run(unet_params, vae_params, text_params, ids, rng):
            ctx2 = clip_text.encode(text_params, cfg.text, ids)

            def v_fn(x, t):
                xx = jnp.concatenate([x, x], axis=0)
                tt = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (2,))
                out = unet_sd_video.forward(unet_params, cfg.unet, xx, tt,
                                            y=ctx2)
                v_c, v_uc = jnp.split(out, 2, axis=0)
                return v_uc + gs * (v_c - v_uc)

            lh, lw = cfg.latent_hw
            rng2, k = jax.random.split(rng)
            x = jax.random.normal(k, (1, cfg.num_frames, lh, lw, cfg.unet.in_dim))
            x = samplers.ddim_sample_v(v_fn, x, sched, steps)
            frames = vae.decode(vae_params, cfg.vae,
                                x[0] / SD_SCALE_FACTOR)  # [T, H, W, 3]
            frames = jnp.clip(frames, -1, 1) * 0.5 + 0.5
            return (frames * 255).astype(jnp.uint8)

        return self._run_cache.store(steps, jax.jit(run))


@dataclasses.dataclass(frozen=True)
class Image2VideoConfig:
    unet: unet_sd_video.UNetSDVideoConfig = dataclasses.field(
        default_factory=unet_sd_video.UNetSDVideoConfig.i2vgen_xl)
    vae: vae.VAEConfig = dataclasses.field(default_factory=vae.VAEConfig.sd)
    text: clip_text.TextConfig = dataclasses.field(
        default_factory=lambda: clip_text.TextConfig.clip_l(hidden_size=1024,
                                                            num_heads=16))
    size: int = 512
    num_frames: int = 16
    fps: int = 16                 # FPS condition (i2vgen_xl_infer.yaml:8)
    steps: int = 50
    guidance_scale: float = 9.0

    @staticmethod
    def tiny(**kw) -> "Image2VideoConfig":
        base = dict(
            unet=unet_sd_video.UNetSDVideoConfig.tiny(
                "i2vgen", context_dim=16, y_dim=16),
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
    """image (+prompt) -> video frames, UNetSD_I2VGen conditioning: global
    CLIP image embedding + first-frame latent through the UNet's concat and
    local-context streams (unet_i2vgen.py:280-325).

    `image_embedder(image_uint8) -> [1, y_dim]` supplies the global CLIP
    visual embedding (reference FrozenOpenCLIPTtxtVisualEmbedder,
    inference_i2vgen_entrance.py:195); when absent a zero embedding is used.
    """

    def __init__(self, cfg: Image2VideoConfig, unet_params, vae_params,
                 text_params, tokenizer=None,
                 image_embedder: Optional[Callable] = None):
        self.cfg = cfg
        if unet_sd_video.quant_default():
            unet_params = unet_sd_video.quantize_params(unet_params)
        self.unet_params = unet_params
        self.vae_params = vae_params
        self.text_params = text_params
        self.tokenizer = tokenizer
        self.image_embedder = image_embedder

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
        """image: [H, W, 3] uint8 -> [T, H, W, 3] uint8. Host side:
        tokenization + optional image embedder; the rest is ONE cached
        jitted program."""
        cfg = self.cfg
        steps = steps or cfg.steps
        rng = rng if rng is not None else jax.random.PRNGKey(8800)  # app.py:332
        tok = self.tokenizer([prompt, negative_prompt], padding="max_length",
                             max_length=cfg.text.max_length,
                             truncation=True, return_tensors="np")
        ids = jnp.asarray(tok["input_ids"])
        if self.image_embedder is not None:
            glob = jnp.asarray(self.image_embedder(image), jnp.float32)
        else:
            glob = jnp.zeros((1, cfg.unet.y_dim), jnp.float32)
        return self._get_run(steps)(self.unet_params, self.vae_params,
                                    self.text_params, ids,
                                    jnp.asarray(image), glob, rng)

    def _get_run(self, steps: int):
        if not hasattr(self, "_run_cache"):
            from vitron_tpu.runtime.telemetry import ProgramCache
            self._run_cache = ProgramCache("i2v-run", max_entries=4)
        fn = self._run_cache.lookup(steps)
        if fn is not None:
            return fn
        cfg = self.cfg
        gs = cfg.guidance_scale
        sched = _schedule(cfg.unet)

        def run(unet_params, vae_params, text_params, ids, image, glob, rng):
            ctx2 = clip_text.encode(text_params, cfg.text, ids)
            img = (image.astype(jnp.float32) / 255.0 - 0.5) / 0.5
            mean, _ = vae.encode(vae_params, cfg.vae, img[None])
            local = mean * SD_SCALE_FACTOR             # [1, h, w, 4]
            local2 = jnp.concatenate([local, local], axis=0)
            glob2 = jnp.concatenate([glob, jnp.zeros_like(glob)], axis=0)
            fps2 = jnp.full((2,), float(cfg.fps), jnp.float32)

            def v_fn(x, t):
                xx = jnp.concatenate([x, x], axis=0)
                tt = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (2,))
                out = unet_sd_video.forward(
                    unet_params, cfg.unet, xx, tt, y=ctx2, fps=fps2,
                    image=glob2, local_image=local2)
                v_c, v_uc = jnp.split(out, 2, axis=0)
                return v_uc + gs * (v_c - v_uc)

            ls = cfg.latent_size
            rng2, k = jax.random.split(rng)
            x = jax.random.normal(k, (1, cfg.num_frames, ls, ls, cfg.unet.in_dim))
            x = samplers.ddim_sample_v(v_fn, x, sched, steps)
            frames = vae.decode(vae_params, cfg.vae, x[0] / SD_SCALE_FACTOR)
            frames = jnp.clip(frames, -1, 1) * 0.5 + 0.5
            return (frames * 255).astype(jnp.uint8)

        return self._run_cache.store(steps, jax.jit(run))

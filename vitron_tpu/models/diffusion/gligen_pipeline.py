"""GLIGEN grounded text-to-image generation & inpainting pipeline.

TPU-native rebuild of the reference task runner (reference:
modules/GLIGEN/demo/gligen/task_grounded_generation.py:138-294 and the
Vitron glue app.py:89-212):

- grounding instruction -> per-phrase CLIP pooled text features padded to
  max_objs=30 slots (fire_clip, :138-181),
- prompt/negative-prompt contexts from the CLIP text encoder,
- PLMS 50 steps with the gated-attention alpha schedule; classifier-free
  guidance batched cond+uncond in ONE UNet call per step (the reference
  runs two sequential forwards),
- inpainting: VAE-encode the image, keep-mask from boxes at latent
  resolution, per-step noised composite, mask+masked-latent as 5 extra
  UNet input channels (:216-240),
- VAE decode to pixels.

Weights stay resident; the reference reloads every checkpoint per request
(app.py:94-103) — that alone is most of the reference's request latency.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vitron_tpu.models.diffusion import clip_text, samplers, unet2d, vae
from vitron_tpu.models.diffusion.vae import SD_SCALE_FACTOR


@dataclasses.dataclass(frozen=True)
class GligenConfig:
    unet: unet2d.UNetConfig = dataclasses.field(default_factory=unet2d.UNetConfig.sd_v1)
    vae: vae.VAEConfig = dataclasses.field(default_factory=vae.VAEConfig.sd)
    text: clip_text.TextConfig = dataclasses.field(default_factory=clip_text.TextConfig.clip_l)
    image_size: int = 512
    max_objs: int = 30
    steps: int = 50

    @property
    def latent_size(self) -> int:
        # one 2x downsample per VAE level transition (8x for SD's 4 levels)
        return self.image_size // (2 ** (len(self.vae.channel_mult) - 1))

    @staticmethod
    def tiny(**kw) -> "GligenConfig":
        base = dict(
            unet=unet2d.UNetConfig.tiny(),
            vae=vae.VAEConfig.tiny(),
            text=clip_text.TextConfig.tiny(hidden_size=16, num_heads=2,
                                           intermediate_size=32),
            image_size=32, max_objs=4, steps=4)
        base.update(kw)
        return GligenConfig(**base)


def pack_grounding(
    boxes: Sequence[Sequence[float]],     # [N, 4] normalized xyxy
    phrase_features: np.ndarray,          # [N, context_dim] CLIP pooled feats
    max_objs: int,
    context_dim: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """fire_clip's 30-slot padding (task_grounded_generation.py:152-181)."""
    out_boxes = np.zeros((max_objs, 4), np.float32)
    out_masks = np.zeros((max_objs,), np.float32)
    out_text = np.zeros((max_objs, context_dim), np.float32)
    n = min(len(boxes), max_objs)
    for i in range(n):
        out_boxes[i] = np.asarray(boxes[i], np.float32)
        out_masks[i] = 1.0
        out_text[i] = phrase_features[i]
    return out_boxes, out_masks, out_text


def keep_mask_from_boxes(boxes: Sequence[Sequence[float]], size: int) -> np.ndarray:
    """draw_masks_from_boxes (evaluator.py:21-31): 1 = keep, 0 inside boxes.
    Note the reference's y-then-x indexing of normalized coords."""
    m = np.ones((size, size), np.float32)
    for bx in boxes:
        x0, x1 = bx[0] * size, bx[2] * size
        y0, y1 = bx[1] * size, bx[3] * size
        m[int(y0):int(y1), int(x0):int(x1)] = 0.0
    return m


class GligenPipeline:
    """Holds resident params + jitted samplers for generation / inpainting."""

    def __init__(self, cfg: GligenConfig, unet_params, vae_params, text_params,
                 inpaint_unet_params=None, tokenizer=None):
        self.cfg = cfg
        if unet2d.quant_default():
            # VITRON_UNET_QUANT=w8a8: integer-MXU conv quantization of the
            # SD/GLIGEN image UNet. Measured NEGATIVE on v5e (22.3 vs 53.6
            # CFG steps/s — see unet2d.quantize_params); the knob is a
            # tested record for hardware where the tradeoff flips, bf16
            # stays the default.
            unet_params = unet2d.quantize_params(unet_params)
            if inpaint_unet_params is not None:
                inpaint_unet_params = unet2d.quantize_params(inpaint_unet_params)
        self.unet_params = unet_params
        self.inpaint_unet_params = inpaint_unet_params
        self.vae_params = vae_params
        self.text_params = text_params
        self.tokenizer = tokenizer
        # jitted end-to-end samplers keyed by the static knobs: on the
        # tunnel-attached TPU every eager dispatch costs ~33 ms, so an
        # un-jitted 50-step generate (~3000 ops) took 146 s vs ~1.5 s for
        # the same math compiled as ONE program
        from vitron_tpu.runtime.telemetry import ProgramCache
        self._run_cache = ProgramCache("gligen-run", max_entries=8)

    # ---------------------------------------------------------- text utils

    def encode_prompt(self, token_ids: jax.Array) -> jax.Array:
        """[B, 77] -> [B, 77, 768] (FrozenCLIPEmbedder last hidden)."""
        return clip_text.encode(self.text_params, self.cfg.text, token_ids)

    def pooled_text_features(self, token_ids: jax.Array) -> jax.Array:
        """Per-phrase pooled features (text_model_output.pooler_output,
        task_grounded_generation.py:123): final-LN hidden at the EOS
        (=argmax token id) position."""
        hidden = clip_text.encode(self.text_params, self.cfg.text, token_ids)
        eos = jnp.argmax(token_ids, axis=-1)
        return jnp.take_along_axis(hidden, eos[:, None, None], axis=1)[:, 0]

    def tokenize(self, texts: List[str]) -> jax.Array:
        tok = self.tokenizer(texts, padding="max_length",
                             max_length=self.cfg.text.max_length,
                             truncation=True, return_tensors="np")
        return jnp.asarray(tok["input_ids"])

    # ---------------------------------------------------------- sampling

    def _eps_fn(self, params, context, uc_context, boxes, masks, text_emb,
                guidance_scale, extra_channels=None):
        cfg = self.cfg
        objs = unet2d.grounding_tokens(params, boxes, masks, text_emb)
        objs2 = jnp.concatenate([objs, objs], axis=0)
        ctx2 = jnp.concatenate([context, uc_context], axis=0)

        def eps(x, t, gate):
            x_in = x
            if extra_channels is not None:
                x_in = jnp.concatenate(
                    [x, jnp.broadcast_to(extra_channels, x.shape[:-1] + (extra_channels.shape[-1],))],
                    axis=-1)
            if guidance_scale == 1.0:
                tt = jnp.broadcast_to(jnp.asarray(t), (x.shape[0],))
                return unet2d.forward(params, cfg.unet, x_in, tt, context, objs, gate)
            xx = jnp.concatenate([x_in, x_in], axis=0)
            tt = jnp.broadcast_to(jnp.asarray(t), (xx.shape[0],))
            out = unet2d.forward(params, cfg.unet, xx, tt, ctx2, objs2, gate)
            e_c, e_uc = jnp.split(out, 2, axis=0)
            return e_uc + guidance_scale * (e_c - e_uc)

        return eps

    def generate(
        self,
        prompt: str,
        boxes: Sequence[Sequence[float]],
        phrases: Sequence[str],
        negative_prompt: str = "",
        guidance_scale: float = 7.5,
        alpha_type: Sequence[float] = (0.3, 0.0, 0.7),
        rng: Optional[jax.Array] = None,
        steps: Optional[int] = None,
        inpaint_image: Optional[jax.Array] = None,   # [H, W, 3] in [0, 255]
        inpaint_keep_mask: Optional[np.ndarray] = None,
    ) -> jax.Array:
        """-> [H, W, 3] uint8 image. Mirrors grounded_generation_box
        (task_grounded_generation.py:185-294); defaults match the Vitron
        glue (alpha_type and guidance, app.py:100-106,189).

        Host side: tokenization + box packing only. Everything from the
        text encoder through PLMS and the VAE decode runs as ONE jitted
        program, cached per (steps, guidance, alpha_type, inpaint)."""
        cfg = self.cfg
        steps = steps or cfg.steps
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        is_inpaint = inpaint_image is not None

        ids_ctx = self.tokenize([prompt])
        # inpainting uses context as uc (task_grounded_generation.py:258-261)
        uc_text = prompt if is_inpaint else negative_prompt
        ids_uc = self.tokenize([uc_text])
        # phrase ids padded to the max_objs slots (invalid rows masked on
        # device; a lone BOS row keeps argmax-eos well-defined)
        phrase_ids = np.zeros((cfg.max_objs, cfg.text.max_length), np.int64)
        phrase_ids[:, 0] = 1
        n = min(len(phrases), cfg.max_objs)
        if n:
            phrase_ids[:n] = np.asarray(self.tokenize(list(phrases)[:n]))
        b_, m_, _ = pack_grounding(boxes, np.zeros((n, cfg.text.hidden_size)),
                                   cfg.max_objs, cfg.text.hidden_size)
        gb = jnp.asarray(b_)[None]
        gm = jnp.asarray(m_)[None]

        if is_inpaint:
            img = np.asarray(inpaint_image)
            if img.shape[:2] != (cfg.image_size, cfg.image_size):
                # the reference center-crops the inpaint source to 512^2
                # (demo/app.py:299-306); we resize instead so normalized
                # protocol boxes stay aligned with the full frame, and do it
                # on HOST so the jitted program is not keyed on input size
                from PIL import Image
                img = np.asarray(Image.fromarray(
                    np.clip(img, 0, 255).astype(np.uint8)).resize(
                        (cfg.image_size, cfg.image_size), Image.BILINEAR))
            img = jnp.asarray(img, jnp.float32)
            keep = inpaint_keep_mask if inpaint_keep_mask is not None else \
                keep_mask_from_boxes(boxes, cfg.latent_size)
            keep = jnp.asarray(keep, jnp.float32)
        else:
            img = jnp.zeros((8, 8, 3), jnp.float32)     # unused placeholder
            keep = jnp.zeros((cfg.latent_size, cfg.latent_size), jnp.float32)
        run = self._get_run(steps, float(guidance_scale), tuple(alpha_type),
                            is_inpaint)
        params = self.unet_params
        if is_inpaint and self.inpaint_unet_params is not None:
            params = self.inpaint_unet_params
        return run(params, self.vae_params, self.text_params,
                   jnp.asarray(ids_ctx), jnp.asarray(ids_uc),
                   jnp.asarray(phrase_ids), gb, gm, img, keep, rng)

    def _get_run(self, steps: int, guidance_scale: float,
                 alpha_type: Tuple[float, ...], is_inpaint: bool):
        key = (steps, guidance_scale, alpha_type, is_inpaint)
        fn = self._run_cache.lookup(key)
        if fn is not None:
            return fn
        cfg = self.cfg
        sched = samplers.DiffusionSchedule.create("linear", 1000, 0.00085, 0.012)
        gates = samplers.alpha_generator(steps, alpha_type)

        def run(params, vae_params, text_params, ids_ctx, ids_uc, phrase_ids,
                gb, gm, inpaint_img, keep_mask, rng):
            context = clip_text.encode(text_params, cfg.text, ids_ctx)
            uc = clip_text.encode(text_params, cfg.text, ids_uc)
            hidden = clip_text.encode(text_params, cfg.text, phrase_ids)
            eos = jnp.argmax(phrase_ids, axis=-1)
            pooled = jnp.take_along_axis(hidden, eos[:, None, None], axis=1)[:, 0]
            gt = (pooled * gm[0][:, None]).astype(jnp.float32)[None]

            extra = None
            mask_blend = None
            if is_inpaint:
                img = (inpaint_img / 255.0 - 0.5) / 0.5
                mean, _ = vae.encode(vae_params, cfg.vae, img[None])
                x0 = mean * SD_SCALE_FACTOR
                keep = keep_mask[None, :, :, None]
                extra = jnp.concatenate([x0 * keep, keep], axis=-1)[0]
                mask_blend = (keep, x0)

            eps = self._eps_fn(params, context, uc, gb, gm, gt,
                               guidance_scale, extra_channels=extra)
            rng2, k = jax.random.split(rng)
            x = jax.random.normal(k, (1, cfg.latent_size, cfg.latent_size,
                                      cfg.unet.out_channels), jnp.float32)
            x = samplers.plms_sample(eps, x, sched, steps, rng=rng2,
                                     gate_alphas=gates, mask_blend=mask_blend)
            img = vae.decode(vae_params, cfg.vae, x / SD_SCALE_FACTOR)[0]
            img = jnp.clip(img, -1, 1) * 0.5 + 0.5
            return (img * 255).astype(jnp.uint8)

        return self._run_cache.store(key, jax.jit(run))


def reproject_image_feature(feature: jax.Array,
                            projection_matrix: jax.Array) -> jax.Array:
    """GLIGEN 'after_reproject' image-feature transform
    (task_grounded_generation.py:110-116): project through the learned
    matrix (transposed), L2-normalize, scale to norm 28.7."""
    f = feature @ projection_matrix.T
    f = f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-12)
    return f * 28.7


class GligenStylePipeline(GligenPipeline):
    """Text+image-grounded (style) generation: the third reference pipeline
    (demo/app.py:84-91, positionnet_with_image). Needs an is_style UNet
    checkpoint, the CLIP vision tower + visual projection, and GLIGEN's
    projection_matrix."""

    def __init__(self, cfg, unet_params, vae_params, text_params,
                 vision_params=None, vision_cfg=None, visual_proj=None,
                 projection_matrix=None, tokenizer=None):
        super().__init__(cfg, unet_params, vae_params, text_params,
                         tokenizer=tokenizer)
        self.vision_params = vision_params
        self.vision_cfg = vision_cfg
        self.visual_proj = visual_proj
        self.projection_matrix = projection_matrix

    def image_features(self, images: jax.Array) -> jax.Array:
        """[N, S, S, 3] preprocessed style crops -> [N, 768] grounding
        features (pooled CLIP embeds, reprojected + renormed)."""
        from vitron_tpu.models.vision import vit

        pooled = vit.forward_pooled(self.vision_params, self.vision_cfg,
                                    images, self.visual_proj)
        if self.projection_matrix is not None:
            pooled = reproject_image_feature(pooled, self.projection_matrix)
        return pooled

    def generate_styled(self, prompt, boxes, phrases, style_images,
                        has_text_mask=1.0, has_image_mask=1.0,
                        negative_prompt="", guidance_scale=7.5,
                        alpha_type=(0.3, 0.0, 0.7), rng=None,
                        steps=None):
        """Grounded generation with per-box text AND image features
        (fire_clip with images, task_grounded_generation.py:138-181)."""
        import numpy as np

        from vitron_tpu.models.diffusion import samplers, unet2d, vae as vae_mod
        from vitron_tpu.models.diffusion.layers import position_net_with_image
        from vitron_tpu.models.diffusion.vae import SD_SCALE_FACTOR

        cfg = self.cfg
        steps = steps or cfg.steps
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        context = self.encode_prompt(self.tokenize([prompt]))
        uc = self.encode_prompt(self.tokenize([negative_prompt]))
        pooled_t = self.pooled_text_features(self.tokenize(list(phrases)))
        pooled_i = self.image_features(style_images)
        n = len(boxes)
        mo, cd = cfg.max_objs, cfg.text.hidden_size
        gb = np.zeros((mo, 4), np.float32)
        gm = np.zeros((mo,), np.float32)
        gt = np.zeros((mo, cd), np.float32)
        gi = np.zeros((mo, cd), np.float32)
        for i in range(min(n, mo)):
            gb[i] = np.asarray(boxes[i], np.float32)
            gm[i] = 1.0
            gt[i] = np.asarray(pooled_t)[min(i, pooled_t.shape[0] - 1)]
            gi[i] = np.asarray(pooled_i)[min(i, pooled_i.shape[0] - 1)]
        tm = gm * has_text_mask
        im = gm * has_image_mask
        objs = position_net_with_image(
            self.unet_params["position_net"],
            jnp.asarray(gb)[None], jnp.asarray(gm)[None], jnp.asarray(tm)[None],
            jnp.asarray(im)[None], jnp.asarray(gt)[None], jnp.asarray(gi)[None])
        objs2 = jnp.concatenate([objs, objs], axis=0)
        ctx2 = jnp.concatenate([context, uc], axis=0)

        def eps(x, t, gate):
            xx = jnp.concatenate([x, x], axis=0)
            tt = jnp.broadcast_to(jnp.asarray(t), (2,))
            out = unet2d.forward(self.unet_params, cfg.unet, xx, tt, ctx2,
                                 objs2, gate)
            e_c, e_uc = jnp.split(out, 2, axis=0)
            return e_uc + guidance_scale * (e_c - e_uc)

        sched = samplers.DiffusionSchedule.create("linear", 1000, 0.00085, 0.012)
        gates = samplers.alpha_generator(steps, tuple(alpha_type))
        rng, k = jax.random.split(rng)
        x = jax.random.normal(k, (1, cfg.latent_size, cfg.latent_size,
                                  cfg.unet.out_channels), jnp.float32)
        x = samplers.plms_sample(eps, x, sched, steps, rng=rng, gate_alphas=gates)
        img = vae_mod.decode(self.vae_params, cfg.vae, x / SD_SCALE_FACTOR)[0]
        img = jnp.clip(img, -1, 1) * 0.5 + 0.5
        return (img * 255).astype(jnp.uint8)


def load_gligen_checkpoint(path: str, cfg: GligenConfig, inpaint: bool = False):
    """Load a GLIGEN .pth bundle (reference load_ckpt,
    task_grounded_generation.py:67-82: dict with 'model' (UNet),
    'autoencoder', 'text_encoder' state dicts + an OmegaConf 'config'
    pickled alongside) -> (unet_params, vae_params, text_params).

    The UNet converter accepts both grounding variants; pass inpaint=True
    for the 9-channel inpainting checkpoint (the converter reads channel
    counts from the weights via the block plan of `cfg`)."""
    import dataclasses as dc

    import torch

    from vitron_tpu.models.diffusion import clip_text as ct
    from vitron_tpu.models.diffusion import unet2d as u
    from vitron_tpu.models.diffusion import vae as v

    bundle = torch.load(path, map_location="cpu", weights_only=False)
    ucfg = dc.replace(cfg.unet, in_channels=9) if inpaint else cfg.unet
    unet_params = u.convert_ldm_unet(
        {k: vv for k, vv in bundle["model"].items()}, ucfg)
    vae_params = v.convert_ldm_vae(bundle["autoencoder"], cfg.vae)
    text_params = ct.convert_hf_clip_text(bundle["text_encoder"], cfg.text)
    return unet_params, vae_params, text_params

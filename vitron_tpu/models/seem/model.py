"""SEEM segmentation model: backbone -> pixel decoder -> SEEM decoder.

JAX re-design of SEEM_Model / the demo task drivers (reference:
modules/SEEM/demo_code/xdecoder/architectures/seem_model.py:34-927 and
tasks/interactive.py:36-216). Supported task flows (the ones Vitron
invokes, app.py:114-155,243-273):

- text-grounded segmentation: phrase -> grounding tokens -> decoder ->
  match pred_captions against the phrase class embedding (vl_similarity);
- stroke segmentation: stroke mask -> sampled spatial tokens -> decoder ->
  match pred_maskembs against the pooled positive spatial embedding;
- visual/example segmentation ("refimg" + per-frame matching) for video
  object tracking.

Pixel normalization uses the reference constants (yaml INPUT.PIXEL_MEAN/STD).
Inputs are fixed 512x512 buckets (the demo resizes short side to 512,
interactive.py:39).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vitron_tpu.models.seem import decoder as dec
from vitron_tpu.models.seem import focalnet, language, pixel_decoder

PIXEL_MEAN = (123.675, 116.280, 103.530)
PIXEL_STD = (58.395, 57.120, 57.375)


@dataclasses.dataclass(frozen=True)
class SeemConfig:
    backbone: focalnet.FocalNetConfig = dataclasses.field(
        default_factory=focalnet.FocalNetConfig.focall)
    pixel: pixel_decoder.PixelDecoderConfig = dataclasses.field(
        default_factory=pixel_decoder.PixelDecoderConfig)
    decoder: dec.SeemDecoderConfig = dataclasses.field(
        default_factory=dec.SeemDecoderConfig)
    lang: language.LangConfig = dataclasses.field(default_factory=language.LangConfig)
    input_size: int = 512
    # Serving knob: "bfloat16" runs the backbone + pixel decoder in bf16
    # (decoder/language stay f32); mask outputs are argmax/threshold-robust.
    compute_dtype: str = "float32"

    @staticmethod
    def tiny(**kw) -> "SeemConfig":
        base = dict(
            backbone=focalnet.FocalNetConfig.tiny(),
            pixel=pixel_decoder.PixelDecoderConfig.tiny(),
            decoder=dec.SeemDecoderConfig.tiny(),
            lang=language.LangConfig.tiny(),
            input_size=64,
        )
        base.update(kw)
        return SeemConfig(**base)


def init_params(rng: jax.Array, cfg: SeemConfig) -> Dict[str, Any]:
    ks = jax.random.split(rng, 4)
    return {
        "backbone": focalnet.init_params(ks[0], cfg.backbone),
        "pixel": pixel_decoder.init_params(ks[1], cfg.pixel),
        "decoder": dec.init_params(ks[2], cfg.decoder),
        "lang": language.init_params(ks[3], cfg.lang),
    }


def cast_tower_params(params: Dict[str, Any],
                      dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Cast the backbone + pixel-decoder float weights for bf16 serving
    (halves their HBM reads); decoder/language params are left f32 to keep
    the query/grounding math at reference precision."""
    def cast(t):
        return jax.tree.map(
            lambda l: l.astype(dtype) if l.dtype == jnp.float32 else l, t)
    return {**params, "backbone": cast(params["backbone"]),
            "pixel": cast(params["pixel"])}


def normalize_pixels(image: jax.Array) -> jax.Array:
    """uint8 [H, W, 3] RGB -> normalized float (seem_model.py:260-261)."""
    mean = jnp.asarray(PIXEL_MEAN, jnp.float32)
    std = jnp.asarray(PIXEL_STD, jnp.float32)
    return (image.astype(jnp.float32) - mean) / std


def encode_image(params, cfg: SeemConfig, image: jax.Array):
    """image: [H, W, 3] uint8 -> (mask_features, multi_scale, srcs_2d)."""
    x = normalize_pixels(image)[None].astype(jnp.dtype(cfg.compute_dtype))
    feats = focalnet.forward(params["backbone"], cfg.backbone, x)
    mask_features, multi_scale = pixel_decoder.forward_features(
        params["pixel"], cfg.pixel, feats)
    if cfg.compute_dtype != "float32":
        mask_features = mask_features.astype(jnp.float32)
        multi_scale = [m.astype(jnp.float32) for m in multi_scale]
    # per-level 2D views for spatial-token point sampling (seem.py:440-443)
    srcs_2d = [m[0] for m in multi_scale]
    return mask_features, multi_scale, srcs_2d


def segment_text(params, cfg: SeemConfig, image: jax.Array, phrase_ids: jax.Array,
                 phrase_mask: jax.Array, class_embeddings: Optional[jax.Array] = None):
    """Text-grounded segmentation (interactive.py:162-176).

    phrase_ids/mask: [1, 77] CLIP tokens of the referring phrase.
    Returns (mask [H, W] logits, class_logits or None)."""
    mask_features, multi_scale, _ = encode_image(params, cfg, image)
    token_emb, class_emb = language.token_and_class_emb(
        params["lang"], cfg.lang, phrase_ids, norm=False)
    # grounding tokens = per-token embeddings at valid positions
    # (seem_model.py:282-288); padded to context_length with validity mask
    g_tokens = token_emb[0]
    g_valid = phrase_mask[0].astype(bool)

    out = dec.forward(
        params["decoder"], cfg.decoder, multi_scale, mask_features,
        class_embeddings=class_embeddings,
        logit_scale=params["lang"]["logit_scale"],
        grounding_tokens=g_tokens, grounding_valid=g_valid)

    v_emb = out["pred_captions"][0]
    t_emb = class_emb / (jnp.linalg.norm(class_emb, axis=-1, keepdims=True) + 1e-7)
    v = v_emb / (jnp.linalg.norm(v_emb, axis=-1, keepdims=True) + 1e-7)
    sim = language.vl_similarity(v, t_emb, params["lang"]["logit_scale"])  # [1, Q]
    matched = jnp.argmax(sim[0])
    mask = out["pred_masks"][0, matched]
    logits = out["pred_logits"][0, matched] if out["pred_logits"] is not None else None
    return mask, logits


def segment_audio(params, cfg: SeemConfig, image: jax.Array,
                  transcript_ids: jax.Array, transcript_mask: jax.Array,
                  class_embeddings: Optional[jax.Array] = None):
    """Audio-referred segmentation (interactive.py:105-109,177-191): the
    spoken query is transcribed on host (the reference uses Whisper, loaded
    as `audio` in demo_code/app.py:74-77 — shipped disabled there too), and
    the transcript routes through the language encoder into the decoder's
    AUDIO token group (seem_model.py:291-299), matched against
    pred_captions like the text path.

    transcript_ids/mask: [1, 77] CLIP tokens of the transcription.
    Returns (mask [H, W] logits, class_logits or None)."""
    mask_features, multi_scale, _ = encode_image(params, cfg, image)
    token_emb, class_emb = language.token_and_class_emb(
        params["lang"], cfg.lang, transcript_ids, norm=False)
    a_tokens = token_emb[0]
    a_valid = transcript_mask[0].astype(bool)

    out = dec.forward(
        params["decoder"], cfg.decoder, multi_scale, mask_features,
        class_embeddings=class_embeddings,
        logit_scale=params["lang"]["logit_scale"],
        audio_tokens=a_tokens, audio_valid=a_valid)

    v_emb = out["pred_captions"][0]
    t_emb = class_emb / (jnp.linalg.norm(class_emb, axis=-1, keepdims=True) + 1e-7)
    v = v_emb / (jnp.linalg.norm(v_emb, axis=-1, keepdims=True) + 1e-7)
    sim = language.vl_similarity(v, t_emb, params["lang"]["logit_scale"])
    matched = jnp.argmax(sim[0])
    mask = out["pred_masks"][0, matched]
    logits = out["pred_logits"][0, matched] if out["pred_logits"] is not None else None
    return mask, logits


def segment_stroke(params, cfg: SeemConfig, image: jax.Array, points: jax.Array,
                   points_valid: jax.Array, class_embeddings=None):
    """Stroke/spatial segmentation (interactive.py:138-149).

    points: [S, 2] normalized (y, x) sampled from the stroke mask on host
    (decoder.sample_stroke_points)."""
    mask_features, multi_scale, srcs_2d = encode_image(params, cfg, image)
    sp_tokens, sp_pos = dec.build_spatial_tokens(
        params["decoder"], cfg.decoder, srcs_2d, mask_features, points,
        points_valid, pos=True)
    out = dec.forward(
        params["decoder"], cfg.decoder, multi_scale, mask_features,
        class_embeddings=class_embeddings,
        logit_scale=params["lang"]["logit_scale"],
        spatial_queries=sp_tokens, spatial_valid=points_valid,
        spatial_pos_embed=sp_pos[None])

    v_emb = out["pred_maskembs"][0]                 # [Q, mask_dim]
    s_emb = out["pred_pspatials"][0]                # [1, mask_dim]
    matched = jnp.argmax(v_emb @ s_emb[0])
    mask = out["pred_masks"][0, matched]
    logits = out["pred_logits"][0, matched] if out["pred_logits"] is not None else None
    return mask, logits


def reference_visual_queries(params, cfg: SeemConfig, image: jax.Array,
                             points: jax.Array, points_valid: jax.Array):
    """'refimg' task (seem.py:464-471): capture the reference image's spatial
    tokens + pooled embedding as VISUAL queries for other frames."""
    mask_features, _, srcs_2d = encode_image(params, cfg, image)
    vq, v_pos = dec.build_spatial_tokens(
        params["decoder"], cfg.decoder, srcs_2d, mask_features, points,
        points_valid, pos=True)
    return vq, v_pos[None], points_valid


def segment_visual(params, cfg: SeemConfig, image: jax.Array, visual_queries,
                   visual_pos, visual_valid, class_embeddings=None):
    """Example/visual segmentation of a new frame against reference visual
    queries (interactive.py:151-160; video loop :219-316)."""
    mask_features, multi_scale, _ = encode_image(params, cfg, image)
    out = dec.forward(
        params["decoder"], cfg.decoder, multi_scale, mask_features,
        class_embeddings=class_embeddings,
        logit_scale=params["lang"]["logit_scale"],
        visual_queries=visual_queries, visual_valid=visual_valid,
        visual_pos_embed=visual_pos)
    v_emb = out["pred_maskembs"][0]
    s_emb = out["pred_pvisuals"][0]
    matched = jnp.argmax(v_emb @ s_emb[0])
    mask = out["pred_masks"][0, matched]
    logits = out["pred_logits"][0, matched] if out["pred_logits"] is not None else None
    return mask, logits


def segment_panoptic(params, cfg: SeemConfig, image: jax.Array,
                     class_bank: jax.Array):
    """'Segment everything' pass (the demo's empty task list,
    demo_code/app.py:131-136 -> seem_model.py:819-875): plain decoder
    forward with every query scored against the pre-embedded class bank
    (demo_code/app.py:69-71). class_bank: [K+1, dim_proj] with the last row
    the 'background' no-object embedding. Returns
    (class_logits [Q, K+1], mask_logits [Q, h, w])."""
    mask_features, multi_scale, _ = encode_image(params, cfg, image)
    out = dec.forward(
        params["decoder"], cfg.decoder, multi_scale, mask_features,
        class_embeddings=class_bank,
        logit_scale=params["lang"]["logit_scale"])
    return out["pred_logits"][0], out["pred_masks"][0]


def upsample_mask(mask_logits: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Bilinear upsample + 0 threshold (interactive.py:195-197)."""
    m = jax.image.resize(mask_logits[None, None], (1, 1) + tuple(out_hw),
                         method="linear")[0, 0]
    return m > 0.0


def track_video(params, cfg: SeemConfig, frames: jax.Array, ref_image: jax.Array,
                points: jax.Array, points_valid: jax.Array) -> jax.Array:
    """Video object tracking (interactive_infer_video, interactive.py:219-316):
    reference stroke -> visual queries -> BATCHED per-frame visual
    segmentation (the reference loops frames in Python, one forward per
    frame at 5fps; here frames vmap into one program).

    frames: [T, H, W, 3] uint8. Returns [T, H, W] bool masks."""
    vq, v_pos, v_valid = reference_visual_queries(
        params, cfg, ref_image, points, points_valid)

    def per_frame(frame):
        mask, _ = segment_visual(params, cfg, frame, vq, v_pos, v_valid)
        return mask

    masks = jax.lax.map(per_frame, frames)
    return masks > 0.0


def convert_torch(sd, cfg: SeemConfig) -> Dict[str, Any]:
    """Reference seem_focall_v1.pt state dict -> full param tree."""
    return {
        "backbone": focalnet.convert_torch(sd, cfg.backbone, prefix="backbone."),
        "pixel": pixel_decoder.convert_torch(sd, cfg.pixel),
        "decoder": convert_decoder_torch(sd, cfg.decoder),
        "lang": language.convert_torch(sd, cfg.lang),
    }


def convert_decoder_torch(sd, cfg: dec.SeemDecoderConfig,
                          prefix: str = "sem_seg_head.predictor.") -> Dict[str, Any]:
    def _np(x):
        return x if isinstance(x, np.ndarray) else x.detach().float().cpu().numpy()

    def g(k):
        return _np(sd[prefix + k])

    def attn(stem):
        return {
            "in_w": np.ascontiguousarray(g(stem + ".in_proj_weight").T),
            "in_b": g(stem + ".in_proj_bias"),
            "out_w": np.ascontiguousarray(g(stem + ".out_proj.weight").T),
            "out_b": g(stem + ".out_proj.bias"),
        }

    def lnp(stem):
        return {"scale": g(stem + ".weight"), "bias": g(stem + ".bias")}

    layers = []
    for i in range(cfg.dec_layers):
        layers.append({
            "cross": {"attn": attn(f"transformer_cross_attention_layers.{i}.multihead_attn"),
                      "norm": lnp(f"transformer_cross_attention_layers.{i}.norm")},
            "self": {"attn": attn(f"transformer_self_attention_layers.{i}.self_attn"),
                     "norm": lnp(f"transformer_self_attention_layers.{i}.norm")},
            "ffn": {
                "fc1_w": np.ascontiguousarray(g(f"transformer_ffn_layers.{i}.linear1.weight").T),
                "fc1_b": g(f"transformer_ffn_layers.{i}.linear1.bias"),
                "fc2_w": np.ascontiguousarray(g(f"transformer_ffn_layers.{i}.linear2.weight").T),
                "fc2_b": g(f"transformer_ffn_layers.{i}.linear2.bias"),
                "norm": lnp(f"transformer_ffn_layers.{i}.norm"),
            },
        })
    return {
        "query_feat": g("query_feat.weight"),
        "query_embed": g("query_embed.weight"),
        "pn_indicator": g("pn_indicator.weight"),
        "level_embed": g("level_embed.weight"),
        "layers": layers,
        "decoder_norm": lnp("decoder_norm"),
        "class_embed": g("class_embed"),
        "mask_embed": {
            "w0": np.ascontiguousarray(g("mask_embed.layers.0.weight").T),
            "b0": g("mask_embed.layers.0.bias"),
            "w1": np.ascontiguousarray(g("mask_embed.layers.1.weight").T),
            "b1": g("mask_embed.layers.1.bias"),
            "w2": np.ascontiguousarray(g("mask_embed.layers.2.weight").T),
            "b2": g("mask_embed.layers.2.bias"),
        },
        # present only when the checkpoint was built with spatial on
        # (task_switch['spatial'], seem.py:339-346)
        "mask_spatial_embed": [
            g(f"mask_sptial_embed.{i}")
            if (prefix + f"mask_sptial_embed.{i}") in sd
            else np.zeros((cfg.hidden_dim, cfg.hidden_dim), np.float32)
            for i in range(cfg.num_feature_levels)],
    }

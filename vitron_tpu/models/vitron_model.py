"""Vitron multimodal meta-architecture.

TPU-native rebuild of the reference LLaVA meta-arch
(reference: vitron/model/llava_arch.py:28-617 + llava_llama.py:29-117):
CLIP/LanguageBind towers -> mm projector (+ region extractor) -> sentinel
splice -> Llama decoder.

Split into a host planning phase (vitron_tpu/mm/splice.plan_splice — ragged
sentinel walk, pure numpy) and one jittable device program:

    media pixels -> tower forward (frames folded into batch)
                 -> projector
                 -> region extractor (bbox mask pooling on raw feats)
                 -> two-gather splice into text embeddings
                 -> llama forward (prefill or cached decode)

Everything on device has static shapes; per-request raggedness lives only in
the precomputed gather maps. The reference instead builds ragged Python
lists per sample inside forward (llava_arch.py:310-412), which would retrace
under jit on every new shape.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vitron_tpu.mm.splice import apply_splice
from vitron_tpu.models.llm import llama
from vitron_tpu.models.vision import projector as projector_mod
from vitron_tpu.models.vision import region_extractor as region_mod
from vitron_tpu.models.vision import vit


@dataclasses.dataclass(frozen=True)
class VitronConfig:
    llm: llama.LlamaConfig = dataclasses.field(default_factory=llama.LlamaConfig)
    image_tower: vit.ViTConfig = dataclasses.field(default_factory=vit.ViTConfig.clip_vit_l14)
    video_tower: vit.ViTConfig = dataclasses.field(default_factory=vit.ViTConfig.video_vit_l14)
    projector_type: str = "mlp2x_gelu"

    @property
    def vision_hidden(self) -> int:
        return self.image_tower.hidden_size

    @staticmethod
    def tiny(**kw) -> "VitronConfig":
        base = dict(
            llm=llama.LlamaConfig.tiny(),
            image_tower=vit.ViTConfig.tiny(),
            video_tower=vit.ViTConfig.tiny(add_time_attn=True),
        )
        base.update(kw)
        return VitronConfig(**base)

    @staticmethod
    def serving(**kw) -> "VitronConfig":
        """Inference config: bf16 tower weights + compute, matching the
        reference's fp16 tower serving (builder.py loads towers in
        torch.float16). Parity tests pin f32; bf16 encode runs the MXU at
        2x the f32 rate."""
        base = dict(
            image_tower=vit.ViTConfig.clip_vit_l14(
                param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16),
            video_tower=vit.ViTConfig.video_vit_l14(
                param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16),
        )
        base.update(kw)
        return VitronConfig(**base)


def init_params(rng: jax.Array, cfg: VitronConfig) -> Dict[str, Any]:
    ks = jax.random.split(rng, 5)
    return {
        "llm": llama.init_params(ks[0], cfg.llm),
        "image_tower": vit.init_params(ks[1], cfg.image_tower),
        "video_tower": vit.init_params(ks[2], cfg.video_tower),
        "projector": projector_mod.init_params(
            ks[3], cfg.vision_hidden, cfg.llm.hidden_size, cfg.projector_type),
        "region": region_mod.init_params(
            ks[4], cfg.vision_hidden, cfg.llm.hidden_size),
    }


VITRON_SHARDING_RULES = tuple(
    [("llm/" + k if not k.startswith("llm") else k, s) for k, s in llama.LLAMA_SHARDING_RULES]
) + vit.VIT_SHARDING_RULES


def encode_media(
    params: Dict[str, Any],
    cfg: VitronConfig,
    images: Optional[jax.Array],          # [Ni, S, S, 3] or None
    videos: Optional[jax.Array],          # [Nv, T, S, S, 3] or None
    block_perm: Optional[jax.Array] = None,  # [n_blocks] flat-block gather order
    region_boxes: Optional[jax.Array] = None,   # [Nr, 4] in 224-space
    region_block_idx: Optional[jax.Array] = None,  # [Nr] flat block each bbox reads
    n_blocks: Optional[int] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Encode all media into flat image-sized feature blocks.

    Returns (image_feats [n_blocks, P, H_llm], region_feats [n_blocks, 1, H_llm]
    or None). Block order follows the splice planner's flat-block space:
    images contribute 1 block, videos `T` consecutive blocks
    (mm/splice.plan_splice). `block_perm` maps [image blocks.., video frame
    blocks..] concat order to planner order (identity if None).

    Mirrors reference encode_images/encode_videos (llava_arch.py:168-188);
    region features are pooled from RAW tower features, not projected ones
    (llava_arch.py:170-173).
    """
    raw_blocks = []
    if images is not None and images.shape[0] > 0:
        raw_blocks.append(vit.forward_features(params["image_tower"], cfg.image_tower, images))
    if videos is not None and videos.shape[0] > 0:
        vfeats = vit.forward_video_features(params["video_tower"], cfg.video_tower, videos)
        nv, t, p, h = vfeats.shape
        raw_blocks.append(vfeats.reshape(nv * t, p, h))
    if not raw_blocks:
        return None, None
    raw = jnp.concatenate(raw_blocks, axis=0) if len(raw_blocks) > 1 else raw_blocks[0]
    if block_perm is not None:
        raw = jnp.take(raw, block_perm, axis=0)
    feats = projector_mod.apply(params["projector"], raw)

    region_feats = None
    if region_boxes is not None and region_boxes.shape[0] > 0:
        src = jnp.take(raw, region_block_idx, axis=0)  # [Nr, P, H_vis]
        r = region_mod.apply(
            params["region"], src, region_boxes,
            image_size=cfg.image_tower.image_size)  # [Nr, 1, H_llm]
        nb = n_blocks if n_blocks is not None else feats.shape[0]
        region_feats = jnp.zeros((nb, 1, feats.shape[-1]), feats.dtype)
        region_feats = region_feats.at[region_block_idx].set(r.astype(feats.dtype))
    return feats, region_feats


def spliced_embeds(
    params: Dict[str, Any],
    cfg: VitronConfig,
    plan_token_ids: jax.Array,    # [B, L]
    plan_media_idx: jax.Array,    # [B, L]
    plan_use_media: jax.Array,    # [B, L] bool
    images: Optional[jax.Array] = None,
    videos: Optional[jax.Array] = None,
    block_perm: Optional[jax.Array] = None,
    region_boxes: Optional[jax.Array] = None,
    region_block_idx: Optional[jax.Array] = None,
) -> jax.Array:
    """Encode media and splice into text embeddings -> [B, L, H_llm].

    The embedding half of `forward`, exposed so chunked prefill
    (runtime/batching.py staged admission) can compute the full spliced
    sequence ONCE and then feed the decoder in cache-offset chunks."""
    image_feats, region_feats = encode_media(
        params, cfg, images, videos, block_perm, region_boxes, region_block_idx)
    embed_table = params["llm"]["embed"]
    if image_feats is None:
        return jnp.take(embed_table, plan_token_ids, axis=0)
    return apply_splice(
        embed_table, plan_token_ids, plan_media_idx, plan_use_media,
        image_feats, region_feats)


def forward(
    params: Dict[str, Any],
    cfg: VitronConfig,
    plan_token_ids: jax.Array,    # [B, L]
    plan_media_idx: jax.Array,    # [B, L]
    plan_use_media: jax.Array,    # [B, L] bool
    positions: jax.Array,         # [B, L]
    attn_mask: jax.Array,         # [B, L] bool
    images: Optional[jax.Array] = None,
    videos: Optional[jax.Array] = None,
    block_perm: Optional[jax.Array] = None,
    region_boxes: Optional[jax.Array] = None,
    region_block_idx: Optional[jax.Array] = None,
    cache: Optional[llama.KVCache] = None,
    mesh=None,
) -> Tuple[jax.Array, Optional[llama.KVCache]]:
    """Multimodal prefill: encode media, splice, run the decoder.

    `mesh` enables the llm's ring-attention path (cfg.llm.attn_impl="ring"):
    sequence-parallel prefill over the context axis for long-video QA — the
    capability the reference caps at 8 frames (processing_video.py:93)."""
    embeds = spliced_embeds(
        params, cfg, plan_token_ids, plan_media_idx, plan_use_media,
        images=images, videos=videos, block_perm=block_perm,
        region_boxes=region_boxes, region_block_idx=region_block_idx)
    return llama.forward(
        params["llm"], cfg.llm, embeds, positions,
        attn_mask=attn_mask, cache=cache, mesh=mesh)


def decode_step(
    params: Dict[str, Any],
    cfg: VitronConfig,
    token_ids: jax.Array,   # [B, 1]
    positions: jax.Array,   # [B, 1]
    cache: llama.KVCache,
) -> Tuple[jax.Array, llama.KVCache]:
    """Single-token decode; the splice is bypassed exactly like the reference
    does for len-1 steps (llava_arch.py:196-205)."""
    return llama.forward_tokens(
        params["llm"], cfg.llm, token_ids, positions=positions,
        attn_mask=jnp.ones_like(token_ids, bool), cache=cache)

"""Request engine: host-side batch preparation + the chat pipeline.

Rebuilds the reference predict() flow (reference: app.py:456-664) as a
library: conversation prompt -> sentinel tokenization -> splice plan ->
jitted multimodal generate -> structured-output parse. Media stay resident
on device; the reference reloads backend checkpoints per request
(app.py:94-103) — here everything is loaded once and reused.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from vitron_tpu.constants import (
    IMAGE_FEATURE_LENGTH,
    NUM_VIDEO_FRAMES,
    REGION_FEATURE_LENGTH,
)
from vitron_tpu.mm.conversation import conv_templates
from vitron_tpu.mm.protocol import parse_model_output
from vitron_tpu.mm.splice import SplicePlan, plan_splice
from vitron_tpu.mm.tokenization import KeywordStopper, tokenizer_image_region_token
from vitron_tpu.runtime import generation as _gen_mod
from vitron_tpu.runtime.generation import Generator, SamplingConfig


@dataclasses.dataclass
class MediaItem:
    kind: str                 # "image" | "video"
    pixels: np.ndarray        # image: [S, S, 3]; video: [T, S, S, 3] (HWC float)


def compute_block_perm(media_kinds: Sequence[str], num_frames: int) -> np.ndarray:
    """Planner flat-block order -> row in [all images | all video frames].

    encode_media concatenates image features first, then video-frame
    features; the splice planner numbers blocks in media-list order. This
    permutation reconciles the two with one gather.
    """
    n_img = sum(1 for k in media_kinds if k == "image")
    perm: List[int] = []
    img_i = vid_i = 0
    for kind in media_kinds:
        if kind == "image":
            perm.append(img_i)
            img_i += 1
        else:
            perm.extend(n_img + vid_i * num_frames + f for f in range(num_frames))
            vid_i += 1
    return np.asarray(perm, np.int32)


def pack_media(media: Sequence[MediaItem]) -> Tuple[Optional[np.ndarray], Optional[np.ndarray], Optional[np.ndarray]]:
    """-> (images [Ni,S,S,3], videos [Nv,T,S,S,3], block_perm)."""
    imgs = [m.pixels for m in media if m.kind == "image"]
    vids = [m.pixels for m in media if m.kind == "video"]
    kinds = [m.kind for m in media]
    images = np.stack(imgs) if imgs else None
    videos = np.stack(vids) if vids else None
    nf = videos.shape[1] if videos is not None else NUM_VIDEO_FRAMES
    perm = compute_block_perm(kinds, nf) if (imgs and vids) else None
    return images, videos, perm


def round_up(n: int, mult: int) -> int:
    return ((n + mult - 1) // mult) * mult


def prepare_batch(
    token_rows: Sequence[Sequence[int]],
    media: Sequence[MediaItem],
    pad_to: Optional[int] = None,
    bucket: int = 128,
    max_len: Optional[int] = None,
    image_len: int = IMAGE_FEATURE_LENGTH,
    region_len: int = REGION_FEATURE_LENGTH,
    labels: Optional[Sequence[Sequence[int]]] = None,
) -> Tuple[SplicePlan, Optional[np.ndarray], Optional[np.ndarray], Optional[np.ndarray]]:
    """Tokenized rows + media -> (plan, images, videos, block_perm).

    pad_len is rounded up to a `bucket` multiple so compiled programs are
    reused across requests (static-shape bucketing). `image_len` must equal
    the tower's patch count (256 for ViT-L/14 @ 224; smaller in tests).
    """
    kinds = [m.kind for m in media]
    nf = NUM_VIDEO_FRAMES
    vids = [m for m in media if m.kind == "video"]
    if vids:
        nf = vids[0].pixels.shape[0]
    est = max(
        (sum(1 for t in row if t == -200) * image_len
         + sum(1 for t in row if t == -300) * region_len
         + sum(1 for t in row if t >= 0))
        for row in token_rows
    )
    pad_len = pad_to or round_up(max(est, 8), bucket)
    plan = plan_splice(token_rows, kinds, pad_len, num_video_frames=nf,
                       max_len=max_len, image_len=image_len,
                       region_len=region_len, labels=labels)
    images, videos, perm = pack_media(media)
    return plan, images, videos, perm


class VitronEngine:
    """End-to-end chat: prompt assembly -> generate -> protocol parse.

    Mirrors the reference predict() (app.py:456-664) minus the UI: returns
    (clean_text, module, instructions, region) plus raw text.
    """

    def __init__(self, params, cfg, tokenizer, conv_template: str = "llava_v1"):
        self.generator = Generator(params, cfg, tokenizer)
        self.tokenizer = tokenizer
        self.conv_template = conv_template
        # set by ServingPipeline(batched=True): chat decode co-batches with
        # other in-flight requests through runtime/batching.py
        self.batcher = None

    def chat(
        self,
        user_message: str,
        media: Sequence[MediaItem] = (),
        region_boxes: Optional[np.ndarray] = None,
        history: Optional[List[Tuple[str, str]]] = None,
        sampling: SamplingConfig = SamplingConfig(),
        rng=None,
        decode_chunk: Optional[int] = None,  # auto: 128 for int4, 32 otherwise
    ) -> Dict[str, Any]:
        conv = conv_templates[self.conv_template].copy()
        for u, a in history or []:
            conv.append_message(conv.roles[0], u)
            conv.append_message(conv.roles[1], a)
        conv.append_message(conv.roles[0], user_message)
        conv.append_message(conv.roles[1], None)
        prompt = conv.get_prompt()

        ids = tokenizer_image_region_token(prompt, self.tokenizer)
        plan, images, videos, perm = prepare_batch(
            [ids], media, image_len=self.generator.cfg.image_tower.num_patches)
        stop_str = conv.sep if conv.sep2 is None else conv.sep2
        stopper = KeywordStopper([stop_str], self.tokenizer, prompt_len=0) if stop_str else None

        import jax.numpy as jnp

        out = self.generator.generate(
            plan,
            images=jnp.asarray(images) if images is not None else None,
            videos=jnp.asarray(videos) if videos is not None else None,
            block_perm=perm,
            region_boxes=region_boxes,
            sampling=sampling,
            rng=rng,
            stopper=stopper,
            # device chunks with EOS early exit: ~3-5x interactive decode
            # vs per-token stepping (each tunnel dispatch + per-token host
            # sync costs ~1 ms + a round-trip); int4 weights auto-chunk at
            # 128 so the in-program s4 promotion amortizes to ~0.3 ms/token.
            # The keyword stopper is checked at chunk boundaries.
            decode_chunk=decode_chunk if decode_chunk is not None else (
                None if _gen_mod._has_packed_int4(self.generator.params) else 32),
            batcher=self.batcher,
        )[0]
        text = self.tokenizer.decode(out, skip_special_tokens=True)
        if stop_str and text.endswith(stop_str):
            text = text[: -len(stop_str)].strip()
        clean, module, instructions, region = parse_model_output(text)
        return {
            "raw": text,
            "text": clean,
            "module": module,
            "instructions": instructions,
            "region": region,
        }

"""End-to-end multimodal forward + generation on tiny configs."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitron_tpu.constants import IMAGE_TOKEN_INDEX, OBJS_TOKEN_INDEX
from vitron_tpu.mm.splice import plan_splice
from vitron_tpu.models import vitron_model
from vitron_tpu.runtime.engine import MediaItem, compute_block_perm, prepare_batch
from vitron_tpu.runtime.generation import Generator, SamplingConfig, generate_scan


IMG = IMAGE_TOKEN_INDEX
OBJ = OBJS_TOKEN_INDEX


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = vitron_model.VitronConfig.tiny()
    params = vitron_model.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_multimodal_forward_image_region_video(tiny_setup):
    cfg, params = tiny_setup
    # row 0: image + region; row 1: video (4 frames of 16 patches)
    rows = [
        [1, 5, IMG, 6, OBJ, 7],
        [1, 8] + [IMG] * 4 + [9],
    ]
    media = [
        MediaItem("image", np.random.RandomState(0).rand(28, 28, 3).astype(np.float32)),
        MediaItem("video", np.random.RandomState(1).rand(4, 28, 28, 3).astype(np.float32)),
    ]
    plan, images, videos, perm = prepare_batch(
        rows, media, pad_to=128, image_len=16)
    boxes = np.array([[2.0, 2.0, 20.0, 24.0]], np.float32)
    logits, _ = vitron_model.forward(
        params, cfg,
        jnp.asarray(plan.token_ids), jnp.asarray(plan.media_idx),
        jnp.asarray(plan.use_media), jnp.asarray(plan.position_ids),
        jnp.asarray(plan.attention_mask),
        images=jnp.asarray(images), videos=jnp.asarray(videos),
        block_perm=jnp.asarray(perm) if perm is not None else None,
        region_boxes=jnp.asarray(boxes),
        region_block_idx=jnp.asarray(plan.region_blocks),
    )
    assert logits.shape == (2, 128, cfg.llm.vocab_size)
    assert not bool(jnp.isnan(logits).any())
    # row0: 4 text + 16 image + 1 region; row1: 3 text + 64 video
    assert plan.seq_lens.tolist() == [4 + 16 + 1, 3 + 64]


def test_block_perm_video_before_image():
    perm = compute_block_perm(["video", "image"], num_frames=4)
    # planner blocks: video frames 0-3, then image block 4
    # concat rows: image first (row 0), then video frames (rows 1-4)
    assert perm.tolist() == [1, 2, 3, 4, 0]


def test_generate_host_vs_scan_greedy(tiny_setup):
    """The host decode loop and the fully-scanned path must emit identical
    greedy tokens (cross-validation of the two decode implementations)."""
    cfg, params = tiny_setup
    rows = [[1, 5, IMG, 6, 7]]
    media = [MediaItem("image", np.random.RandomState(0).rand(28, 28, 3).astype(np.float32))]
    plan, images, videos, perm = prepare_batch(rows, media, pad_to=64, image_len=16)

    gen = Generator(params, cfg)
    out_host = gen.generate(
        plan, images=jnp.asarray(images),
        sampling=SamplingConfig(greedy=True, max_new_tokens=8, eos_ids=()),
    )[0]

    arrays = (
        jnp.asarray(plan.token_ids), jnp.asarray(plan.media_idx),
        jnp.asarray(plan.use_media), jnp.asarray(plan.position_ids),
        jnp.asarray(plan.attention_mask), jnp.asarray(plan.seq_lens),
    )
    out_scan = generate_scan(
        params, cfg, arrays, n_new=8, rng=jax.random.PRNGKey(0),
        images=jnp.asarray(images), temperature=0.0)
    assert out_host == np.asarray(out_scan)[0].tolist()

    # the chunked (while_loop) decode path must match too, for chunk sizes
    # that divide, exceed, and straddle max_new_tokens
    for chunk in (3, 8, 16):
        out_chunked = gen.generate(
            plan, images=jnp.asarray(images),
            sampling=SamplingConfig(greedy=True, max_new_tokens=8, eos_ids=()),
            decode_chunk=chunk,
        )[0]
        assert out_chunked == out_host, (chunk, out_chunked, out_host)
    # EOS early exit: force the first generated token to be "EOS"
    eos_first = gen.generate(
        plan, images=jnp.asarray(images),
        sampling=SamplingConfig(greedy=True, max_new_tokens=8,
                                eos_ids=(out_host[0],)),
        decode_chunk=4,
    )[0]
    assert eos_first == [out_host[0]]
    # EOS mid-chunk
    eos_mid = gen.generate(
        plan, images=jnp.asarray(images),
        sampling=SamplingConfig(greedy=True, max_new_tokens=8,
                                eos_ids=(out_host[2],)),
        decode_chunk=8,
    )[0]
    assert eos_mid == out_host[:3]


def test_generate_batch_padding_isolation(tiny_setup):
    """A short row padded next to a long row must generate the same greedy
    tokens as the short row alone (padding must not leak through the cache)."""
    cfg, params = tiny_setup
    img = np.random.RandomState(0).rand(28, 28, 3).astype(np.float32)
    rows_single = [[1, 5, IMG, 6]]
    media = [MediaItem("image", img)]
    plan_s, images_s, _, _ = prepare_batch(rows_single, media, pad_to=64, image_len=16)
    gen = Generator(params, cfg)
    alone = gen.generate(
        plan_s, images=jnp.asarray(images_s),
        sampling=SamplingConfig(greedy=True, max_new_tokens=6, eos_ids=()))[0]

    rows_batch = [[1, 5, IMG, 6], [1, 7, IMG, 8, 9, 10, 11, 12]]
    media2 = [MediaItem("image", img), MediaItem("image", img + 0.1)]
    plan_b, images_b, _, _ = prepare_batch(rows_batch, media2, pad_to=64, image_len=16)
    batched = gen.generate(
        plan_b, images=jnp.asarray(images_b),
        sampling=SamplingConfig(greedy=True, max_new_tokens=6, eos_ids=()))[0]
    assert alone == batched


def test_eos_stops(tiny_setup):
    cfg, params = tiny_setup
    rows = [[1, 5, 6]]
    plan, _, _, _ = prepare_batch(rows, [], pad_to=32, image_len=16)
    gen = Generator(params, cfg)
    # make every token EOS: eos_ids covering the full vocab range sample
    out = gen.generate(
        plan, sampling=SamplingConfig(greedy=True, max_new_tokens=20,
                                      eos_ids=tuple(range(cfg.llm.vocab_size))))[0]
    assert len(out) == 1  # stopped immediately after first token

"""Static-shape splice vs a direct ragged emulation of the reference
prepare_inputs_labels_for_multimodal (llava_arch.py:189-573)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from vitron_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX, OBJS_TOKEN_INDEX
from vitron_tpu.mm.splice import apply_splice, plan_splice

IMG_LEN = 4
REG_LEN = 1
NFRAMES = 2
H = 8
VOCAB = 50


def ragged_reference_splice(input_ids, media_kinds, embed, image_feats, region_feats,
                            labels=None, max_len=None):
    """Direct numpy re-enactment of the reference ragged python loop."""
    # flatten media blocks: image -> 1 block, video -> NFRAMES blocks
    flat_blocks = []
    flat_regions = []
    bi = 0
    for kind in media_kinds:
        n = NFRAMES if kind == "video" else 1
        for _ in range(n):
            flat_blocks.append(image_feats[bi])
            flat_regions.append(region_feats[bi])
            bi += 1
    out_embeds, out_labels = [], []
    cur = 0  # index into media_kinds-expanded *flat* list? reference indexes flat list
    for b, row in enumerate(input_ids):
        row = list(row)
        row_labels = list(labels[b]) if labels is not None else [IGNORE_INDEX] * len(row)
        embeds, labs = [], []
        if not any(t in (IMAGE_TOKEN_INDEX, OBJS_TOKEN_INDEX) for t in row):
            embeds = [embed[t] for t in row]
            labs = row_labels
            cur += 1  # consumes one block (llava_arch.py:317-324)
        else:
            last = -1
            for t, l in zip(row, row_labels):
                if t == IMAGE_TOKEN_INDEX:
                    embeds.extend(flat_blocks[cur])
                    labs.extend([IGNORE_INDEX] * IMG_LEN)
                    last = cur
                    cur += 1
                elif t == OBJS_TOKEN_INDEX:
                    embeds.extend(flat_regions[last if last >= 0 else max(cur - 1, 0)])
                    labs.extend([IGNORE_INDEX] * REG_LEN)
                else:
                    embeds.append(embed[t])
                    labs.append(l)
        e = np.array(embeds) if embeds else np.zeros((0, H))
        if max_len is not None:
            e = e[:max_len]
            labs = labs[:max_len]
        out_embeds.append(e)
        out_labels.append(np.array(labs))
    return out_embeds, out_labels


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    embed = rng.normal(size=(VOCAB, H)).astype(np.float32)
    return rng, embed


def run_case(input_ids, media_kinds, pad_len, labels=None, max_len=None,
             padding_side="right", seed=0):
    rng, embed = make_inputs(seed)
    # count flat blocks
    n_blocks = sum(NFRAMES if k == "video" else 1 for k in media_kinds)
    image_feats = rng.normal(size=(n_blocks, IMG_LEN, H)).astype(np.float32)
    region_feats = rng.normal(size=(n_blocks, REG_LEN, H)).astype(np.float32)

    plan = plan_splice(
        input_ids, media_kinds, pad_len, labels=labels,
        image_len=IMG_LEN, region_len=REG_LEN, num_video_frames=NFRAMES,
        max_len=max_len, padding_side=padding_side,
    )
    got = np.asarray(apply_splice(
        jnp.asarray(embed), plan.token_ids, plan.media_idx, plan.use_media,
        jnp.asarray(image_feats), jnp.asarray(region_feats),
    ))

    ref_embeds, ref_labels = ragged_reference_splice(
        input_ids, media_kinds, embed, image_feats, region_feats,
        labels=labels, max_len=max_len,
    )
    for b, (re_, rl) in enumerate(zip(ref_embeds, ref_labels)):
        L = re_.shape[0]
        assert plan.seq_lens[b] == L
        if padding_side == "right":
            np.testing.assert_allclose(got[b, :L], re_, rtol=1e-6)
            assert plan.attention_mask[b, :L].all()
            assert not plan.attention_mask[b, L:].any()
            np.testing.assert_array_equal(plan.labels[b, :L], rl)
            assert (plan.labels[b, L:] == IGNORE_INDEX).all()
            np.testing.assert_array_equal(plan.position_ids[b, :L], np.arange(L))
        else:
            np.testing.assert_allclose(got[b, pad_len - L:], re_, rtol=1e-6)
            assert plan.attention_mask[b, pad_len - L:].all()
    return plan, got


def test_single_image():
    ids = [[1, 5, IMAGE_TOKEN_INDEX, 7, 8]]
    run_case(ids, ["image"], pad_len=16)


def test_image_with_region():
    ids = [[1, 5, IMAGE_TOKEN_INDEX, 6, OBJS_TOKEN_INDEX, 7]]
    run_case(ids, ["image"], pad_len=16)


def test_video_expansion():
    # <video> pre-expanded to NFRAMES sentinels upstream (train.py:380)
    ids = [[1] + [IMAGE_TOKEN_INDEX] * NFRAMES + [9]]
    run_case(ids, ["video"], pad_len=16)


def test_mixed_batch_order_and_text_only_row_consumes_block():
    ids = [
        [1, IMAGE_TOKEN_INDEX, 4],
        [2, 3, 4],  # text-only row: consumes a block but splices nothing
        [1, IMAGE_TOKEN_INDEX, OBJS_TOKEN_INDEX, 5],
    ]
    run_case(ids, ["image", "image", "image"], pad_len=12)


def test_truncation_mid_media():
    ids = [[1, 2, IMAGE_TOKEN_INDEX, 9]]
    run_case(ids, ["image"], pad_len=8, max_len=4)


def test_left_padding():
    ids = [[1, IMAGE_TOKEN_INDEX, 4], [2, 3, IMAGE_TOKEN_INDEX, 4, 5]]
    run_case(ids, ["image", "image"], pad_len=12, padding_side="left")


def test_labels_threading():
    ids = [[1, 5, IMAGE_TOKEN_INDEX, 7]]
    labels = [[IGNORE_INDEX, IGNORE_INDEX, IGNORE_INDEX, 7]]
    plan, _ = run_case(ids, ["image"], pad_len=12, labels=labels)
    # the only supervised position carries label 7
    assert (plan.labels == 7).sum() == 1

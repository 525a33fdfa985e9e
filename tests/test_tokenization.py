"""Sentinel tokenization parity with reference vitron/mm_utils.py."""
import types

import pytest

from vitron_tpu.constants import IMAGE_TOKEN_INDEX, OBJS_TOKEN_INDEX
from vitron_tpu.mm import tokenization
from tests.conftest import load_reference_module


class FakeTokenizer:
    """Deterministic word-level tokenizer with a BOS id, mimicking the
    sentencepiece behavior the helpers depend on."""

    bos_token_id = 1

    def __call__(self, text):
        ids = [self.bos_token_id]
        for i, w in enumerate(text.split()):
            ids.append(100 + (hash(w) % 1000))
        return types.SimpleNamespace(input_ids=ids)

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(i) for i in ids)


@pytest.fixture(scope="module")
def ref_mm_utils():
    return load_reference_module("vitron/mm_utils.py", "ref_mm_utils")


PROMPTS = [
    "USER: <image>\nwhat is this? ASSISTANT:",
    "<image> two <image> images",
    "no media at all",
    "<image>",
    "leading text <image>",
    "<image> trailing",
]


@pytest.mark.parametrize("prompt", PROMPTS)
def test_tokenizer_image_token_parity(prompt, ref_mm_utils):
    tok = FakeTokenizer()
    ours = tokenization.tokenizer_image_token(prompt, tok)
    ref = ref_mm_utils.tokenizer_image_token(prompt, tok)
    assert ours == ref


REGION_PROMPTS = [
    "USER: <image> find <objs> here ASSISTANT:",
    "<objs> at start",
    "a <objs> b <objs> c <image> d",
    "plain",
]


@pytest.mark.parametrize("prompt", REGION_PROMPTS)
def test_tokenizer_image_region_token_parity(prompt, ref_mm_utils):
    tok = FakeTokenizer()
    ours = tokenization.tokenizer_image_region_token(prompt, tok)
    ref = ref_mm_utils.tokenizer_image_region_token(prompt, tok)
    assert ours == ref


def test_sentinels_present():
    tok = FakeTokenizer()
    ids = tokenization.tokenizer_image_region_token(
        "USER: <image> find <objs> here", tok
    )
    assert IMAGE_TOKEN_INDEX in ids
    assert OBJS_TOKEN_INDEX in ids


def test_preprocess_region_parity(ref_mm_utils):
    region = [10, 20, 110, 220]
    ours = tokenization.preprocess_region(region, (640, 480), (224, 224))
    ref = ref_mm_utils.preprocess_region(region, (640, 480), (224, 224))
    assert ours == pytest.approx(ref)


def test_expand2square_array():
    import numpy as np

    img = np.ones((10, 20, 3), dtype=np.uint8) * 7
    out = tokenization.expand2square_array(img, (1, 2, 3))
    assert out.shape == (20, 20, 3)
    assert (out[5:15] == 7).all()
    assert tuple(out[0, 0]) == (1, 2, 3)

    img2 = np.ones((20, 10, 3), dtype=np.uint8) * 9
    out2 = tokenization.expand2square_array(img2, (0, 0, 0))
    assert out2.shape == (20, 20, 3)
    assert (out2[:, 5:15] == 9).all()

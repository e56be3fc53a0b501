"""Tokenizer-utility tests: sentinel interleave, stopping criteria, subsampling."""

import os
import sys
import types

import numpy as np
import pytest

from teochat_tpu.constants import IMAGE_TOKEN_INDEX
from teochat_tpu.mm_utils import (
    KeywordsStoppingCriteria,
    get_model_name_from_path,
    tokenizer_image_token,
)
from teochat_tpu.utils import order_pick_k

from tests.ref_loader import HAS_REFERENCE, load_ref_module


class MockTokenizer:
    """Word-level tokenizer with BOS=1; vocabulary assigned on first sight."""

    bos_token_id = 1

    def __init__(self):
        self.vocab = {"<s>": 1, "</s>": 2}

    def _id(self, word):
        if word not in self.vocab:
            self.vocab[word] = len(self.vocab) + 10
        return self.vocab[word]

    def __call__(self, text):
        ids = [self.bos_token_id] + [self._id(w) for w in text.split()]
        return types.SimpleNamespace(input_ids=ids)

    def batch_decode(self, ids_batch, skip_special_tokens=True):
        rev = {v: k for k, v in self.vocab.items()}
        out = []
        for ids in np.asarray(ids_batch):
            words = [rev.get(int(i), "?") for i in ids]
            if skip_special_tokens:
                words = [w for w in words if w not in ("<s>", "</s>")]
            out.append(" ".join(words))
        return out


def test_tokenizer_image_token_single():
    tok = MockTokenizer()
    ids = tokenizer_image_token("hello <image> world", tok)
    h, w = tok.vocab["hello"], tok.vocab["world"]
    assert ids == [1, h, IMAGE_TOKEN_INDEX, w]


def test_tokenizer_image_token_multi_frame():
    tok = MockTokenizer()
    ids = tokenizer_image_token("a <image> b <image> c", tok)
    assert ids.count(IMAGE_TOKEN_INDEX) == 2
    assert ids[0] == 1 and ids.count(1) == 1  # exactly one BOS, in front


def test_tokenizer_image_token_leading_image():
    tok = MockTokenizer()
    ids = tokenizer_image_token("<image> describe", tok)
    # chunk0 = "" still tokenizes to [bos]; sentinel then follows
    assert ids[0] == 1
    assert ids[1] == IMAGE_TOKEN_INDEX


def test_tokenizer_image_token_np():
    tok = MockTokenizer()
    arr = tokenizer_image_token("x <image>", tok, return_tensors="np")
    assert arr.dtype == np.int64


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
@pytest.mark.parametrize(
    "prompt",
    [
        "hello <image> world",
        "<image> leading",
        "trailing <image>",
        "a <image> b <image> c <image> d",
        "no image here",
        "",
    ],
)
def test_tokenizer_image_token_parity(prompt):
    ref_fn = load_ref_module("videollava/mm_utils.py", "videollava.mm_utils").tokenizer_image_token

    ours = tokenizer_image_token(prompt, MockTokenizer())
    ref = ref_fn(prompt, MockTokenizer())
    assert ours == ref


def test_keywords_stopping():
    tok = MockTokenizer()
    prompt_ids = np.array([[1, 11, 12, 13]])
    stop = KeywordsStoppingCriteria(["</s>"], tok, prompt_ids)
    grown = np.concatenate([prompt_ids, np.array([[14, 15]])], axis=1)
    assert not stop(grown)
    stopped = np.concatenate([grown, np.array([[2]])], axis=1)
    assert stop(stopped)


def test_get_model_name_from_path():
    assert get_model_name_from_path("jirvin16/TEOChat") == "TEOChat"
    assert (
        get_model_name_from_path("/ckpts/teochat/checkpoint-2000/")
        == "teochat_checkpoint-2000"
    )


def test_order_pick_k():
    lst = list(range(100))
    picked, idx = order_pick_k(lst, 16)
    assert len(picked) == 16
    assert picked == sorted(picked)
    assert idx == sorted(idx)
    same, idx2 = order_pick_k([1, 2, 3], 16)
    assert same == [1, 2, 3] and idx2 is None

"""Chat session tests: multi-turn history, prefixes, bbox suffix."""

import numpy as np
import pytest

import jax

from teochat_tpu.config import tiny_test_config
from teochat_tpu.data.processing import ImageProcessor
from teochat_tpu.models.teochat import TEOChat, init_teochat
from teochat_tpu.serve.chat import SYSTEM_PREFIX, Chat, draw_bboxes, mask2bbox
from tests.test_eval_e2e import MockTokenizer


@pytest.fixture()
def chat():
    cfg = tiny_test_config(vocab_size=128)
    tok = MockTokenizer()
    model = TEOChat(cfg, init_teochat(jax.random.PRNGKey(0), cfg), tokenizer=tok)
    return Chat(model_bundle=(tok, model, ImageProcessor(size=28)))


def _imgs(n=2):
    return [np.random.RandomState(i).randint(0, 255, (40, 40, 3), np.uint8) for i in range(n)]


def test_first_turn_prefix_and_history(chat):
    r1 = chat.generate("What is here?", _imgs(), temperature=0.0, max_new_tokens=3)
    assert chat.history[0][0].startswith(SYSTEM_PREFIX)
    assert isinstance(r1["response"], str)

    # second turn: no new <video>, but history carried
    r2 = chat.generate("And the second image?", [], temperature=0.0, max_new_tokens=3)
    assert len(chat.history) == 2
    assert not chat.history[1][0].startswith(SYSTEM_PREFIX)
    assert isinstance(r2["response"], str)


def test_multi_turn_prompt_differs_from_fresh(chat):
    """History must change the model input: identical question, different state."""
    chat.generate("Describe.", _imgs(), temperature=0.0, max_new_tokens=3)
    second = chat.generate("Describe.", [], temperature=0.0, max_new_tokens=3)
    chat.reset()
    fresh = chat.generate("Describe.", [], temperature=0.0, max_new_tokens=3)
    # can't guarantee different tokens from a random model, but the session
    # state must differ
    assert len(chat.history) == 1
    assert isinstance(second["response"], str) and isinstance(fresh["response"], str)


def test_bbox_suffix(chat):
    chat.generate("Classify this region", _imgs(1), bbox=[10, 20, 30, 40],
                  temperature=0.0, max_new_tokens=2)
    assert "[10, 20, 30, 40]" in chat.history[0][0]


def test_reset(chat):
    chat.generate("q", _imgs(1), temperature=0.0, max_new_tokens=2)
    chat.reset()
    assert chat.history == [] and chat._first_turn

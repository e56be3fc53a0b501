"""Incremental multi-turn sessions: KV reuse must not change outputs.

A ChatSession turn must emit the same tokens as a stateless
TEOChat.generate over the identical full conversation (serve/session.py);
the Chat wrapper must carry frames across turns like the reference demo.
"""

import numpy as np
import pytest

import jax

from teochat_tpu.config import GenerationConfig, tiny_test_config
from teochat_tpu.constants import IMAGE_TOKEN_INDEX
from teochat_tpu.data.processing import ImageProcessor
from teochat_tpu.models.teochat import TEOChat, init_teochat
from teochat_tpu.serve.chat import Chat
from teochat_tpu.serve.session import ChatSession
from tests.test_eval_e2e import MockTokenizer

pytestmark = pytest.mark.slow  # heavy suite: excluded from the smoke tier


@pytest.fixture(scope="module")
def model():
    cfg = tiny_test_config()
    return TEOChat(cfg, init_teochat(jax.random.PRNGKey(0), cfg),
                   tokenizer=MockTokenizer())


def _greedy(max_new=6):
    return GenerationConfig(max_new_tokens=max_new, do_sample=False,
                            temperature=0.0, stop_strings=())


def test_session_matches_stateless_multiturn_text(model):
    session = ChatSession(model, max_len=512)
    gen = _greedy()
    convo = [1, 5, 9, 4, 7]
    for turn in range(3):
        want = model.generate([convo], None, gen)[0]
        got = session.generate(convo, None, gen)
        assert got == want, f"turn {turn}: {got} != {want}"
        # next turn: append the reply + some new user tokens
        convo = convo + got + [11 + turn, 6, 2 + turn]
    assert session.stats["turns"] == 3
    assert session.stats["reused_tokens"] > 0  # reuse actually happened


def test_session_matches_stateless_multimodal(model):
    session = ChatSession(model, max_len=1024)
    gen = _greedy(5)
    frames = np.random.RandomState(0).randn(2, 3, 28, 28).astype(np.float32)
    convo = [1, 5, IMAGE_TOKEN_INDEX, 9, IMAGE_TOKEN_INDEX, 4]
    r1_want = model.generate([convo], frames, gen)[0]
    r1 = session.generate(convo, frames, gen)
    assert r1 == r1_want

    convo2 = convo + r1 + [13, 8, 6]
    r2_want = model.generate([convo2], frames, gen)[0]
    r2 = session.generate(convo2, frames, gen)
    assert r2 == r2_want
    # the second turn must NOT have re-prefilled the whole conversation
    assert session.stats["reused_tokens"] >= len(convo) + len(r1) - 1


def test_session_divergent_history_reprefills(model):
    """Editing committed history falls back to re-prefill from divergence."""
    session = ChatSession(model, max_len=512)
    gen = _greedy(4)
    out1 = session.generate([1, 5, 9, 4], None, gen)
    assert out1
    edited = [1, 5, 3, 7]  # diverges at index 2
    want = model.generate([edited], None, gen)[0]
    got = session.generate(edited, None, gen)
    assert got == want


def test_session_capacity_error(model):
    session = ChatSession(model, max_len=32)
    with pytest.raises(ValueError, match="session cache full"):
        session.generate(list(range(1, 20)), None, _greedy(max_new=30))


def test_chat_accumulates_frames_across_turns(model):
    """Turn-2 prompts keep turn-1's <image> tokens backed by real frames
    (the pre-fix behavior silently dropped them)."""
    chat = Chat(model_bundle=(model.tokenizer, model, ImageProcessor(size=28)),
                incremental=True, session_max_len=2048)
    imgs = [np.random.RandomState(i).randint(0, 255, (40, 40, 3), np.uint8)
            for i in range(2)]
    r1 = chat.generate("What is here?", imgs, temperature=0.0, max_new_tokens=3)
    assert isinstance(r1["response"], str)
    assert len(chat.images) == 2
    r2 = chat.generate("And now?", [], temperature=0.0, max_new_tokens=3)
    assert isinstance(r2["response"], str)
    # the session reused the committed multimodal prefix
    assert chat._session.stats["reused_tokens"] > 0


def test_chat_non_incremental_still_works(model):
    chat = Chat(model_bundle=(model.tokenizer, model, ImageProcessor(size=28)),
                incremental=False)
    r = chat.generate("Hello", [], temperature=0.0, max_new_tokens=3)
    assert isinstance(r["response"], str)


def test_session_matches_stateless_with_w8a8_prefill():
    """int8_prefill_activations: the suffix prefill must take the same w8a8
    path as the stateless full prefill (parity beyond bf16)."""
    import dataclasses

    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg, llm=dataclasses.replace(cfg.llm, int8_prefill_activations=True)
    )
    from teochat_tpu.ops.quant import quantize_llama_params

    params = init_teochat(jax.random.PRNGKey(0), cfg)
    params = dict(params, llm=quantize_llama_params(params["llm"]))
    model = TEOChat(cfg, params, tokenizer=MockTokenizer())
    session = ChatSession(model, max_len=512)
    gen = _greedy(5)
    convo = [1, 5, 9, 4, 7]
    for turn in range(2):
        want = model.generate([convo], None, gen)[0]
        got = session.generate(convo, None, gen)
        assert got == want, f"turn {turn}: {got} != {want}"
        convo = convo + got + [11 + turn, 6]


def test_session_speculative_matches_plain(model):
    """Session turns with speculation emit the same greedy tokens as plain
    session turns (and therefore as stateless generate), drafting from the
    full conversation history."""
    import dataclasses

    plain = ChatSession(model, max_len=512)
    spec = ChatSession(model, max_len=512)
    g0 = _greedy(6)
    gs = dataclasses.replace(g0, speculative_k=4)
    convo = [1, 5, 9, 4, 7, 5, 9, 4]
    for turn in range(2):
        a = plain.generate(convo, None, g0)
        b = spec.generate(convo, None, gs)
        assert a == b, f"turn {turn}: {a} != {b}"
        convo = convo + a + [11 + turn, 6]
    assert spec.stats["spec_steps"] >= 1


def test_chat_speculative_turns(model):
    """Chat(speculative_k=...) runs turns through the speculative session."""
    chat = Chat(model_bundle=(model.tokenizer, model, ImageProcessor(size=28)),
                incremental=True, session_max_len=2048)
    r1 = chat.generate("Describe.", [], temperature=0.0, max_new_tokens=4,
                       speculative_k=3)
    r2 = chat.generate("More detail.", [], temperature=0.0, max_new_tokens=4,
                       speculative_k=3)
    assert isinstance(r1["response"], str) and isinstance(r2["response"], str)
    assert chat._session.stats.get("spec_steps", 0) >= 1

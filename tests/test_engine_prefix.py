"""Automatic prefix caching in the serving engine: requests sharing a leading
text run seed their KV from a pool row and prefill only the suffix.

Correctness bar: token-exact vs the no-prefix-cache engine (and therefore vs
single-request generate — tests/test_engine.py establishes that chain). The
reference has no serving engine at all (teochat_demo.py serves one blocking
request at a time); prefix caching is a beyond-reference TPU-serving feature.
"""

import threading

import numpy as np
import pytest

import jax

from teochat_tpu.config import GenerationConfig, tiny_test_config
from teochat_tpu.constants import IMAGE_TOKEN_INDEX
from teochat_tpu.models.teochat import TEOChat, init_teochat
from teochat_tpu.serve.engine import BatchEngine
from tests.test_eval_e2e import MockTokenizer

pytestmark = pytest.mark.slow  # heavy suite: excluded from the smoke tier

SYSTEM = list(range(40, 60))  # 20-token shared "system prompt"


@pytest.fixture(scope="module")
def model():
    cfg = tiny_test_config(vocab_size=128)
    return TEOChat(cfg, init_teochat(jax.random.PRNGKey(0), cfg),
                   tokenizer=MockTokenizer())


def _submit_all(engine, prompts, gen):
    results = [None] * len(prompts)
    threads = []
    for i, (ids, frames) in enumerate(prompts):
        def run(i=i, ids=ids, frames=frames):
            results[i] = engine.submit(ids, frames, gen)
        t = threading.Thread(target=run)
        t.start()
        threads.append(t)
    for t in threads:
        t.join(timeout=600)
    return results


def _shared_prefix_prompts(n):
    rng = np.random.RandomState(3)
    out = []
    for i in range(n):
        ids = [1] + SYSTEM + [IMAGE_TOKEN_INDEX] + list(rng.randint(4, 100, 2 + i))
        frames = rng.randn(1, 3, 28, 28).astype(np.float32)
        out.append((ids, frames))
    return out


def test_prefix_hits_are_token_exact(model):
    """Requests 2..n hit request 1's pooled prefix; outputs must equal the
    plain engine's (same model, no prefix cache) token for token."""
    gen = GenerationConfig(max_new_tokens=6, temperature=0.0, do_sample=False,
                           stop_strings=())
    prompts = _shared_prefix_prompts(3)

    plain = BatchEngine(model, max_slots=2, max_len=96, chunk=2).start()
    try:
        # serialize through the plain engine for deterministic expected output
        expected = [plain.submit(ids, fr, gen) for ids, fr in prompts]
    finally:
        plain.shutdown()

    engine = BatchEngine(model, max_slots=2, max_len=96, chunk=2,
                         prefix_cache_slots=2, prefix_min_tokens=8).start()
    try:
        got = [engine.submit(ids, fr, gen) for ids, fr in prompts]
        assert got == expected
        # request 1 stored the prefix; 2 and 3 hit it
        assert engine.stats["prefix_hits"] == 2
        assert engine.stats["prefix_tokens_saved"] == 2 * (1 + len(SYSTEM))
    finally:
        engine.shutdown()


def test_prefix_hits_concurrent(model):
    """Concurrent submissions with a shared prefix stay token-exact."""
    gen = GenerationConfig(max_new_tokens=5, temperature=0.0, do_sample=False,
                           stop_strings=())
    prompts = _shared_prefix_prompts(4)
    expected = [
        model.generate([ids], fr, gen)[0] for ids, fr in prompts
    ]
    engine = BatchEngine(model, max_slots=4, max_len=96, chunk=2,
                         prefix_cache_slots=2, prefix_min_tokens=8).start()
    try:
        got = _submit_all(engine, prompts, gen)
        assert got == expected
    finally:
        engine.shutdown()


def test_text_only_exact_repeat(model):
    """A text-only prompt repeated exactly: the whole prefix (capped at
    fused_len - 1) is reused; output identical."""
    gen = GenerationConfig(max_new_tokens=5, temperature=0.0, do_sample=False,
                           stop_strings=())
    ids = [1] + SYSTEM + [7, 9, 11]
    expected = model.generate([ids], None, gen)[0]
    engine = BatchEngine(model, max_slots=2, max_len=96, chunk=2,
                         prefix_cache_slots=1, prefix_min_tokens=8).start()
    try:
        first = engine.submit(ids, None, gen)
        second = engine.submit(ids, None, gen)
        assert first == expected and second == expected
        assert engine.stats["prefix_hits"] == 1
        # exact repeat reuses all but the final token
        assert engine.stats["prefix_tokens_saved"] == len(ids) - 1
    finally:
        engine.shutdown()


def test_lru_eviction(model):
    """With a 1-row pool, a second distinct prefix evicts the first."""
    gen = GenerationConfig(max_new_tokens=3, temperature=0.0, do_sample=False,
                           stop_strings=())
    a = [1] + SYSTEM + [7, 9]
    b = [1] + list(range(70, 90)) + [8, 10]
    engine = BatchEngine(model, max_slots=2, max_len=96, chunk=2,
                         prefix_cache_slots=1, prefix_min_tokens=8).start()
    try:
        ea = model.generate([a], None, gen)[0]
        eb = model.generate([b], None, gen)[0]
        assert engine.submit(a, None, gen) == ea   # store a
        assert engine.submit(b, None, gen) == eb   # evict a, store b
        assert engine.stats["prefix_hits"] == 0
        assert engine.submit(b, None, gen) == eb   # hit b
        assert engine.stats["prefix_hits"] == 1
        assert engine.submit(a, None, gen) == ea   # miss (evicted), re-store
        assert engine.stats["prefix_hits"] == 1
        assert len(engine._prefix_entries) == 1
        assert engine._prefix_entries[0]["key"] == tuple(a)
    finally:
        engine.shutdown()


def test_short_prefix_not_pooled(model):
    """Runs below prefix_min_tokens never enter the pool."""
    gen = GenerationConfig(max_new_tokens=3, temperature=0.0, do_sample=False,
                           stop_strings=())
    ids = [1, 5, 9, IMAGE_TOKEN_INDEX, 12]  # 3-token text run
    frames = np.random.RandomState(0).randn(1, 3, 28, 28).astype(np.float32)
    engine = BatchEngine(model, max_slots=2, max_len=96, chunk=2,
                         prefix_cache_slots=1, prefix_min_tokens=8).start()
    try:
        engine.submit(ids, frames, gen)
        engine.submit(ids, frames, gen)
        assert engine.stats["prefix_hits"] == 0
        assert engine._prefix_entries == []
    finally:
        engine.shutdown()


def test_prefix_with_chunked_prefill(model):
    """Prefix hit + chunked suffix prefill compose token-exactly."""
    gen = GenerationConfig(max_new_tokens=5, temperature=0.0, do_sample=False,
                           stop_strings=())
    prompts = _shared_prefix_prompts(3)
    expected = [model.generate([ids], fr, gen)[0] for ids, fr in prompts]
    engine = BatchEngine(model, max_slots=2, max_len=96, chunk=2,
                         prefill_chunk=8, prefix_cache_slots=2,
                         prefix_min_tokens=8).start()
    try:
        got = [engine.submit(ids, fr, gen) for ids, fr in prompts]
        assert got == expected
        assert engine.stats["prefix_hits"] == 2
    finally:
        engine.shutdown()


def test_prefix_with_speculation(model):
    """Prefix hit + speculative decode chunks stay greedy-token-exact."""
    gen = GenerationConfig(max_new_tokens=6, temperature=0.0, do_sample=False,
                           stop_strings=())
    prompts = _shared_prefix_prompts(2)
    expected = [model.generate([ids], fr, gen)[0] for ids, fr in prompts]
    engine = BatchEngine(model, max_slots=2, max_len=96, chunk=2,
                         speculative_k=3, prefix_cache_slots=1,
                         prefix_min_tokens=8).start()
    try:
        got = [engine.submit(ids, fr, gen) for ids, fr in prompts]
        assert got == expected
        assert engine.stats["prefix_hits"] == 1
    finally:
        engine.shutdown()


def test_longer_run_extends_pool(model):
    """A hit whose own text run extends past the matched entry REPLACES it in
    place (multi-turn pattern: turn 2 extends turn 1's prefix; under LCP
    matching the longer key subsumes the shorter, so no extra pool row)."""
    gen = GenerationConfig(max_new_tokens=3, temperature=0.0, do_sample=False,
                           stop_strings=())
    turn1 = [1] + SYSTEM + [7, 9]
    turn2 = turn1 + [13, 15, 17]
    e1 = model.generate([turn1], None, gen)[0]
    e2 = model.generate([turn2], None, gen)[0]
    engine = BatchEngine(model, max_slots=2, max_len=96, chunk=2,
                         prefix_cache_slots=2, prefix_min_tokens=8).start()
    try:
        assert engine.submit(turn1, None, gen) == e1
        assert engine.submit(turn2, None, gen) == e2  # hits turn1's prefix
        assert engine.stats["prefix_hits"] == 1
        assert [e["plen"] for e in engine._prefix_entries] == [len(turn2)]
        # a repeat of turn1 still matches (LCP against the longer key) ...
        assert engine.submit(turn1, None, gen) == e1
        # ... and a repeat of turn2 matches all but its final token
        assert engine.submit(turn2, None, gen) == e2
        assert engine.stats["prefix_hits"] == 3
        assert engine.stats["prefix_tokens_saved"] >= (
            len(turn1) + (len(turn1) - 1) + (len(turn2) - 1))
    finally:
        engine.shutdown()


def test_divergent_tiny_tail_not_pooled(model):
    """Prompts sharing a pooled prefix but diverging by only a few tokens
    (shared system prompt + short question) hit the pool WITHOUT each storing
    a near-duplicate entry — the store's row copy isn't worth a <
    prefix_min_tokens unique tail."""
    gen = GenerationConfig(max_new_tokens=3, temperature=0.0, do_sample=False,
                           stop_strings=())
    base = [1] + SYSTEM  # 21-token shared run
    prompts = [base + [60 + i, 90 + i] for i in range(3)]
    expected = [model.generate([ids], None, gen)[0] for ids in prompts]
    engine = BatchEngine(model, max_slots=2, max_len=96, chunk=2,
                         prefix_cache_slots=4, prefix_min_tokens=8).start()
    try:
        got = [engine.submit(ids, None, gen) for ids in prompts]
        assert got == expected
        assert engine.stats["prefix_hits"] == 2
        assert engine.stats["prefix_tokens_saved"] == 2 * len(base)
        # only prompt 1's run was pooled; the divergent 2-token tails weren't
        assert len(engine._prefix_entries) == 1
    finally:
        engine.shutdown()

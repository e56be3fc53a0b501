"""Prompt-lookup speculative decoding: token parity with plain greedy.

The speculative path (models/generation.py::generate_tokens_spec) must emit
EXACTLY the tokens plain greedy decode emits — speculation changes scheduling,
never outputs. The reference has no speculative path (HF generate,
inference.py:64-72); these tests pin the beyond-reference capability.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from teochat_tpu.config import GenerationConfig, tiny_test_config
from teochat_tpu.constants import IMAGE_TOKEN_INDEX
from teochat_tpu.models import generation as gen_mod
from teochat_tpu.models.teochat import TEOChat, init_teochat

pytestmark = pytest.mark.slow  # heavy suite: excluded from the smoke tier


@pytest.fixture(scope="module")
def model():
    cfg = tiny_test_config()
    params = init_teochat(jax.random.PRNGKey(0), cfg)
    return TEOChat(cfg, params)


def _greedy(k=0, max_new=12):
    return GenerationConfig(
        max_new_tokens=max_new, do_sample=False, temperature=0.0,
        speculative_k=k,
    )


def test_draft_lookup_matches_recent_ngram():
    hist = jnp.asarray(
        [
            # ... 5 6 7 8 ... 5 6 -> draft the continuation 7 8 (most recent)
            [1, 5, 6, 7, 8, 2, 5, 6, 9, 5, 6, -1, -1],
            # no earlier occurrence of the last bigram -> zero drafts
            [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, -1, -1],
        ],
        jnp.int32,
    )
    lens = jnp.asarray([11, 11], jnp.int32)
    d = np.asarray(gen_mod._draft_lookup(hist, lens, 3))
    # row 0: query bigram (5, 6) at (9, 10); earlier matches start at 1 and 6.
    # Most recent earlier match starts at 6 -> continuation hist[8:] = 9, 5, 6
    assert d[0].tolist() == [9, 5, 6]
    assert d[1].tolist() == [0, 0, 0]


def test_draft_lookup_trigram_beats_bigram():
    """When the last THREE tokens recur, the trigram continuation wins over
    the (more recent but less specific) bigram match."""
    #                 0  1  2  3  4  5  6  7  8  9 10
    hist = jnp.asarray([[9, 5, 6, 7, 2, 5, 6, 1, 9, 5, 6]], jnp.int32)
    lens = jnp.asarray([11], jnp.int32)
    # query trigram (9, 5, 6) matches at 0 -> continuation hist[3:] = 7, 2
    # (the bigram (5, 6) would have matched more recently at 5 -> 1, 9)
    d = np.asarray(gen_mod._draft_lookup(hist, lens, 2))
    assert d[0].tolist() == [7, 2]


def test_draft_lookup_short_history_safe():
    hist = jnp.asarray([[4, -1, -1]], jnp.int32)
    d = np.asarray(gen_mod._draft_lookup(hist, jnp.asarray([1]), 2))
    assert d.shape == (1, 2)
    assert (d >= 0).all()


@pytest.mark.parametrize("k", [1, 3, 5])
def test_spec_matches_plain_greedy_text(model, k):
    ids = [[1, 5, 9, 4, 3, 7, 8, 11, 5, 9, 4]]
    base = model.generate(ids, None, _greedy(0))
    spec = model.generate(ids, None, _greedy(k))
    assert spec == base
    stats = model.last_spec_stats
    assert stats["steps"] >= 1
    assert stats["tokens"] == len(spec[0])


def test_spec_matches_plain_greedy_multimodal(model):
    ids = [[1, 5, IMAGE_TOKEN_INDEX, 9, 4, 7]]
    frames = np.random.RandomState(0).randn(1, 3, 28, 28).astype(np.float32)
    base = model.generate(ids, frames, _greedy(0))
    spec = model.generate(ids, frames, _greedy(4))
    assert spec == base


def test_spec_matches_plain_greedy_ragged_batch(model):
    rows = [
        [1, 5, IMAGE_TOKEN_INDEX, 9, 4],
        [1, 7, 8, IMAGE_TOKEN_INDEX, IMAGE_TOKEN_INDEX, 3, 2, 6],
        [1, 9, 9, 2, 4],
    ]
    frames = np.random.RandomState(1).randn(3, 3, 28, 28).astype(np.float32)
    base = model.generate(rows, frames, _greedy(0, max_new=9))
    spec = model.generate(rows, frames, _greedy(3, max_new=9))
    assert spec == base


def test_spec_respects_max_new_tokens(model):
    ids = [[1, 5, 9, 4]]
    for max_new in (1, 2, 5):
        base = model.generate(ids, None, _greedy(0, max_new=max_new))
        spec = model.generate(ids, None, _greedy(4, max_new=max_new))
        assert spec == base
        assert len(spec[0]) <= max_new


def test_spec_repetitive_prompt_accepts_drafts(model):
    """A self-repetitive context must yield accepted drafts (fewer steps
    than tokens) — the mechanism, not just the fallback path."""
    ids = [[1, 5, 6, 7, 8] * 6]
    spec = model.generate(ids, None, _greedy(5, max_new=24))
    stats = model.last_spec_stats
    base = model.generate(ids, None, _greedy(0, max_new=24))
    assert spec == base
    if stats["tokens"] > 4:  # random-init models usually loop -> drafts hit
        assert stats["steps"] < stats["tokens"]


def test_spec_sampling_deterministic_per_seed(model):
    """Sampling speculation is stochastic but reproducible per PRNG seed."""
    ids = [[1, 5, 9, 4]]
    gen = dataclasses.replace(
        GenerationConfig(max_new_tokens=6, do_sample=True, temperature=1.0),
        speculative_k=4,
    )
    a = model.generate(ids, None, gen, rng=jax.random.PRNGKey(3))
    b = model.generate(ids, None, gen, rng=jax.random.PRNGKey(3))
    assert a == b
    c = model.generate(ids, None, gen, rng=jax.random.PRNGKey(4))
    assert isinstance(c[0], list)  # other seeds still produce valid rows


def test_sample_excluding_residual_math():
    """_sample_excluding: excluded token never drawn; with nothing excluded
    it is plain categorical; empirical frequencies match the renormalized
    residual distribution."""
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.2]]))
    n = 3000
    rngs = jax.random.split(jax.random.PRNGKey(0), n)
    draw = jax.jit(jax.vmap(
        lambda r: gen_mod._sample_excluding(
            logits, r, 1.0, 1.0, jnp.asarray([0]))[0]
    ))(rngs)
    counts = np.bincount(np.asarray(draw), minlength=3)
    assert counts[0] == 0  # excluded mass never sampled
    # residual = [0, .6, .4]
    assert abs(counts[1] / n - 0.6) < 0.05
    assert abs(counts[2] / n - 0.4) < 0.05

    draw2 = jax.jit(jax.vmap(
        lambda r: gen_mod._sample_excluding(
            logits, r, 1.0, 1.0, jnp.asarray([-1]))[0]
    ))(rngs)
    c2 = np.bincount(np.asarray(draw2), minlength=3) / n
    assert abs(c2[0] - 0.5) < 0.05 and abs(c2[1] - 0.3) < 0.05


def test_spec_sampling_distribution_matches_plain(model):
    """Exactness: sampled outputs under speculation must be distributed like
    plain sampling. Uses BATCHED rows (independent per-row samples in one
    call) and a self-calibrated noise floor: TV(plain_A, plain_B) between two
    independent plain runs bounds the sampling noise; TV(plain, spec) must
    not exceed it by more than a margin. Deterministic seeds, so not flaky."""
    n = 512
    ids = [[1, 5, 9, 4, 5, 9]] * n
    gen_plain = GenerationConfig(max_new_tokens=2, do_sample=True,
                                 temperature=0.8, stop_strings=())
    gen_spec = dataclasses.replace(gen_plain, speculative_k=3)

    pa = model.generate(ids, None, gen_plain, rng=jax.random.PRNGKey(1))
    pb = model.generate(ids, None, gen_plain, rng=jax.random.PRNGKey(2))
    sp = model.generate(ids, None, gen_spec, rng=jax.random.PRNGKey(3))

    def tv(a_vals, b_vals):
        support = set(a_vals) | set(b_vals)
        return 0.5 * sum(
            abs(a_vals.count(t) / len(a_vals) - b_vals.count(t) / len(b_vals))
            for t in support
        )

    for pos in (0, 1):
        a = [r[pos] for r in pa if len(r) > pos]
        b = [r[pos] for r in pb if len(r) > pos]
        s = [r[pos] for r in sp if len(r) > pos]
        noise = tv(a, b)
        cross = tv(a, s)
        assert cross < noise + 0.12, (pos, noise, cross)


def test_spec_matches_plain_greedy_int4_weights():
    """Speculation over the packed-int4 decoder (the Pallas fused-dequant
    path with in-kernel layer select) must stay token-identical — the verify
    block runs S=k+1 rows through the same int4 projections."""
    from teochat_tpu.models.teochat import TEOChat, init_teochat
    from teochat_tpu.ops.quant import quantize_llama_params_int4

    cfg = tiny_test_config()
    params = init_teochat(jax.random.PRNGKey(0), cfg)
    params = dict(params, llm=quantize_llama_params_int4(params["llm"]))
    model = TEOChat(cfg, params)
    ids = [[1, 5, 9, 4, 3, 7, 8, 11, 5, 9, 4]]
    base = model.generate(ids, None, _greedy(0, max_new=8))
    spec = model.generate(ids, None, _greedy(4, max_new=8))
    assert spec == base


def test_spec_draft_corruption_keeps_greedy_parity(model):
    """The bench's acceptance-forcing knob (draft_keep_prob) corrupts drafts
    before verification — outputs must stay token-identical to plain greedy
    at EVERY keep probability (corruption only changes scheduling), and lower
    keep rates must not accept more drafts than verbatim drafting."""
    ids = [[1, 5, 6, 7, 8] * 6]  # self-repetitive: drafts actually hit
    base = model.generate(ids, None, _greedy(0, max_new=24))
    accepted = {}
    for keep in (1.0, 0.5, 0.0):
        gen = dataclasses.replace(
            _greedy(5, max_new=24), speculative_draft_keep_prob=keep
        )
        out = model.generate(ids, None, gen)
        assert out == base, keep
        accepted[keep] = model.last_spec_stats["drafts_accepted"]
    assert accepted[0.0] == 0  # every draft corrupted -> none accepted
    assert accepted[0.5] <= accepted[1.0]


def test_spec_fuzz_parity(model):
    """Randomized prompts/batch shapes/k/max_new: speculative greedy must
    stay token-identical to plain greedy (fixed seed, deterministic)."""
    rs = np.random.RandomState(7)
    vocab = model.cfg.llm.vocab_size  # keep fuzz ids in-vocabulary
    for trial in range(5):
        b = int(rs.randint(1, 3))
        rows = [
            [1] + rs.randint(3, vocab, int(rs.randint(3, 12))).tolist()
            for _ in range(b)
        ]
        k = int(rs.choice([1, 3, 5]))
        mn = int(rs.choice([2, 6, 10]))
        base = model.generate(rows, None, _greedy(0, max_new=mn))
        spec = model.generate(rows, None, _greedy(k, max_new=mn))
        assert spec == base, (trial, b, k, mn)


def test_spec_oracle_targets_emitted_exactly():
    """oracle_ids (bench-only workload forcing) makes the greedy target BE the
    oracle sequence: emitted tokens must equal the oracle verbatim, and a
    self-repeating oracle that echoes the prompt must get drafts accepted
    (that is the measurement: prompt-lookup acceptance on realistic text)."""
    import jax.numpy as jnp

    from teochat_tpu.config import tiny_test_config
    from teochat_tpu.models import llama as llama_mod

    cfg = tiny_test_config().llm
    params = llama_mod.init_llama(jax.random.PRNGKey(0), cfg)
    b, s, max_new, k = 1, 12, 16, 4
    embeds = jnp.asarray(
        np.random.RandomState(0).randn(b, s, cfg.hidden_size) * 0.1,
        jnp.float32,
    )
    pos = jnp.arange(s, dtype=jnp.int32)[None]
    prompt = [1, 30, 31, 32, 33, 9, 8, 30, 31, 32, 33, 5]
    prompt_ids = jnp.asarray([prompt], jnp.int32)
    stop = gen_mod.StopSpec(
        keyword_ids=jnp.zeros((1, 1), jnp.int32),
        keyword_lens=jnp.zeros((1,), jnp.int32),
        eos_id=jnp.asarray(-1, jnp.int32),
    )
    # oracle echoes the prompt's 30..33 run twice -> prompt-lookup drafts hit
    oracle = [30, 31, 32, 33, 9, 8, 30, 31, 32, 33, 9, 8, 30, 31, 32, 33]

    def run(o):
        return gen_mod.generate_tokens_spec(
            params, cfg, embeds, jnp.asarray([s], jnp.int32),
            jnp.ones((b, s), bool), pos, prompt_ids,
            jnp.asarray([s], jnp.int32), stop,
            max_new_tokens=max_new, cache_len=s + max_new + k + 1,
            spec_k=k, oracle_ids=o,
        )

    toks, n, steps, acc = run(jnp.asarray([oracle], jnp.int32))
    assert int(n[0]) == max_new
    assert np.asarray(toks)[0].tolist() == oracle
    assert int(acc) > 0, "echoing oracle must get drafts accepted"
    assert int(steps) < max_new, "acceptances must shorten the loop"
    # positions < 0 fall back to the model argmax: a disabled oracle row
    # reproduces plain speculative greedy
    base_toks, base_n, _, _ = run(None)
    off_toks, off_n, _, _ = run(jnp.full((1, max_new), -1, jnp.int32))
    assert np.asarray(off_toks).tolist() == np.asarray(base_toks).tolist()
    assert np.asarray(off_n).tolist() == np.asarray(base_n).tolist()

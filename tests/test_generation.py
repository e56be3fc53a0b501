"""End-to-end generation tests on the tiny model (CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from teochat_tpu.config import GenerationConfig, tiny_test_config
from teochat_tpu.constants import IMAGE_TOKEN_INDEX
from teochat_tpu.models import generation as gen_mod
from teochat_tpu.models import llama as llama_mod
from teochat_tpu.models.teochat import TEOChat, init_teochat, round_to_bucket


@pytest.fixture(scope="module")
def model():
    cfg = tiny_test_config()
    params = init_teochat(jax.random.PRNGKey(0), cfg)
    return TEOChat(cfg, params)


def test_round_to_bucket():
    assert round_to_bucket(1, (4, 8)) == 4
    assert round_to_bucket(5, (4, 8)) == 8
    assert round_to_bucket(900, (4, 8)) == 1024


def test_generate_greedy_deterministic(model):
    ids = [[1, 5, IMAGE_TOKEN_INDEX, 9, 4]]
    frames = np.random.RandomState(0).randn(1, 3, 28, 28).astype(np.float32)
    gen = GenerationConfig(max_new_tokens=6, do_sample=False, temperature=0.0)
    out1 = model.generate(ids, frames, gen)
    out2 = model.generate(ids, frames, gen)
    assert out1 == out2
    assert len(out1) == 1 and 0 < len(out1[0]) <= 6


def test_generate_batch_matches_single(model):
    """Batching must not change greedy outputs (ragged rows)."""
    rows = [
        [1, 5, IMAGE_TOKEN_INDEX, 9, 4],
        [1, 7, 8, IMAGE_TOKEN_INDEX, IMAGE_TOKEN_INDEX, 3, 2, 6],
    ]
    rs = np.random.RandomState(1)
    frames = rs.randn(3, 3, 28, 28).astype(np.float32)
    gen = GenerationConfig(max_new_tokens=5, do_sample=False, temperature=0.0)

    batched = model.generate(rows, frames, gen)
    single0 = model.generate([rows[0]], frames[:1], gen)
    single1 = model.generate([rows[1]], frames[1:], gen)
    assert batched[0] == single0[0]
    assert batched[1] == single1[0]


def test_generate_eos_stops(model):
    """Force EOS as the argmax by checking generated rows stop at eos."""
    ids = [[1, 5, 9]]
    gen = GenerationConfig(max_new_tokens=32, do_sample=False, temperature=0.0)
    out = model.generate(ids, None, gen)[0]
    eos = model.cfg.llm.eos_token_id
    if eos in out:
        assert out[-1] == eos  # nothing after the stop token


def test_generate_frame_count_mismatch(model):
    ids = [[1, IMAGE_TOKEN_INDEX]]
    with pytest.raises(ValueError):
        model.generate(ids, None, GenerationConfig(max_new_tokens=2))
    with pytest.raises(ValueError):
        model.generate(
            ids,
            np.zeros((3, 3, 28, 28), np.float32),
            GenerationConfig(max_new_tokens=2),
        )


def test_sampling_temperature(model):
    ids = [[1, 5, IMAGE_TOKEN_INDEX, 9]]
    frames = np.random.RandomState(2).randn(1, 3, 28, 28).astype(np.float32)
    gen = GenerationConfig(max_new_tokens=8, do_sample=True, temperature=1.5)
    outs = {
        tuple(model.generate(ids, frames, gen, rng=jax.random.PRNGKey(s))[0])
        for s in range(4)
    }
    assert len(outs) > 1  # high temperature must actually vary samples


def test_keyword_hit_multitoken():
    spec = gen_mod.StopSpec(
        keyword_ids=jnp.asarray([[0, 7, 8], [3, 4, 5]], jnp.int32),
        keyword_lens=jnp.asarray([2, 3], jnp.int32),
        eos_id=jnp.asarray(2, jnp.int32),
    )
    window = jnp.asarray([[9, 7, 8], [3, 4, 5], [7, 8, 9]], jnp.int32)
    hit = np.asarray(gen_mod._keyword_hit(window, spec))
    assert hit.tolist() == [True, True, False]


def test_padding_does_not_corrupt_slot0(model):
    """Trash-slot regression: a padded batch row must equal its unpadded run."""
    ids = [[1, 5, 9, 4, 3, 7, 8, 2][:k] for k in (8, 3)]  # ragged pair
    gen = GenerationConfig(max_new_tokens=4, do_sample=False, temperature=0.0)
    batched = model.generate(ids, None, gen)
    alone = model.generate([ids[1]], None, gen)
    assert batched[1] == alone[0]

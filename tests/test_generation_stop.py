"""Regression: empty/padded stop keywords must never fire; n_gen counts honestly."""

import numpy as np

import jax
import jax.numpy as jnp

from teochat_tpu.config import GenerationConfig, tiny_test_config
from teochat_tpu.models import generation as gen_mod
from teochat_tpu.models.teochat import TEOChat, init_teochat


def test_empty_keyword_spec_never_matches():
    spec = gen_mod.StopSpec(
        keyword_ids=jnp.zeros((1, 1), jnp.int32),
        keyword_lens=jnp.zeros((1,), jnp.int32),
        eos_id=jnp.asarray(-1, jnp.int32),
    )
    window = jnp.asarray([[0], [7]], jnp.int32)
    assert not bool(np.asarray(gen_mod._keyword_hit(window, spec)).any())


def test_padded_keyword_rows_ignored():
    # row 0 real keyword [5], row 1 zero-length padding
    spec = gen_mod.StopSpec(
        keyword_ids=jnp.asarray([[0, 5], [0, 0]], jnp.int32),
        keyword_lens=jnp.asarray([1, 0], jnp.int32),
        eos_id=jnp.asarray(-1, jnp.int32),
    )
    hit5 = gen_mod._keyword_hit(jnp.asarray([[9, 5]], jnp.int32), spec)
    hit0 = gen_mod._keyword_hit(jnp.asarray([[9, 0]], jnp.int32), spec)
    assert bool(np.asarray(hit5)[0])
    assert not bool(np.asarray(hit0)[0])  # matching the zero-pad row must not stop


def test_generation_runs_to_max_when_no_stop():
    cfg = tiny_test_config()
    model = TEOChat(cfg, init_teochat(jax.random.PRNGKey(0), cfg))
    spec = gen_mod.StopSpec(
        keyword_ids=jnp.zeros((1, 1), jnp.int32),
        keyword_lens=jnp.zeros((1,), jnp.int32),
        eos_id=jnp.asarray(-1, jnp.int32),  # unreachable
    )
    out = model.generate(
        [[1, 5, 9, 4]], None,
        GenerationConfig(max_new_tokens=7, do_sample=False, temperature=0.0),
        stop_spec=spec,
    )[0]
    assert len(out) == 7  # must not stop early

"""Regression: empty/padded stop keywords must never fire; n_gen counts honestly."""

import numpy as np
import pytest

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


def test_make_stop_spec_right_alignment():
    import types

    class Tok:
        bos_token_id = 1

        def __call__(self, t):
            ids = {"</s>": [1, 2], "###": [1, 7, 8, 9]}[t]
            return types.SimpleNamespace(input_ids=ids)

    spec = gen_mod.make_stop_spec(["</s>", "###"], Tok(), eos_id=2)
    # BOS stripped; right-aligned in a [K, M] matrix with M = longest keyword
    assert spec.keyword_ids.shape == (2, 3)
    assert spec.keyword_lens.tolist() == [1, 3]
    assert spec.keyword_ids[0].tolist() == [0, 0, 2]
    assert spec.keyword_ids[1].tolist() == [7, 8, 9]


@pytest.mark.slow  # 15s grad-equivalence check, not smoke
def test_remat_matches_no_remat_gradients():
    """Gradient checkpointing must not change loss or gradients."""
    import jax.numpy as jnp

    from teochat_tpu.models import teochat as teochat_mod
    from teochat_tpu.models.fusion import build_fusion_plan

    cfg = tiny_test_config()
    params = init_teochat(jax.random.PRNGKey(2), cfg)
    ids = [[1, 5, -200, 9, 7, 2]]
    labels = [[-100, -100, -100, -100, 7, 2]]
    plan = build_fusion_plan(ids, labels=labels,
                             tokens_per_frame=cfg.vision.num_patches, pad_to=16)
    pixels = jnp.asarray(
        np.random.RandomState(0).randn(1, 3, 28, 28), jnp.float32
    )

    def loss(params, remat):
        return teochat_mod.forward_train(params, cfg, plan, pixels, remat=remat)

    l0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    leaves0, leaves1 = jax.tree.leaves(g0), jax.tree.leaves(g1)
    for a, b in zip(leaves0, leaves1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)

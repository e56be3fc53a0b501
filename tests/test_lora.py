"""LoRA adapter tests: zero-init no-op, merge equivalence, trainable filter."""

import numpy as np

import jax
import jax.numpy as jnp

from teochat_tpu.config import LlamaConfig
from teochat_tpu.models.llama import embed_tokens, init_llama, llama_forward
from teochat_tpu.train.lora import (
    add_lora_params,
    lora_trainable_filter,
    merge_lora,
)

CFG = LlamaConfig(
    vocab_size=64, hidden_size=32, intermediate_size=64,
    num_layers=2, num_heads=4, num_kv_heads=4,
)


def _logits(params, ids):
    emb = embed_tokens(params, jnp.asarray(ids))
    pos = jnp.arange(ids.shape[1])[None, :]
    out, _ = llama_forward(params, CFG, emb, position_ids=pos)
    return np.asarray(out)


def test_zero_init_lora_is_noop():
    base = init_llama(jax.random.PRNGKey(0), CFG)
    lora = add_lora_params(jax.random.PRNGKey(1), base, rank=4)
    ids = np.random.RandomState(0).randint(0, 64, (1, 5))
    np.testing.assert_allclose(_logits(base, ids), _logits(lora, ids), atol=1e-6)


def test_merge_matches_adapter_forward():
    base = init_llama(jax.random.PRNGKey(0), CFG)
    lora = add_lora_params(jax.random.PRNGKey(1), base, rank=4, alpha=8.0)
    # give B nonzero values so the adapters actually do something
    lora = jax.tree_util.tree_map_with_path(
        lambda path, x: (
            jax.random.normal(jax.random.PRNGKey(7), x.shape) * 0.05
            if any(getattr(p, "key", "") == "lora_b" for p in path)
            else x
        ),
        lora,
    )
    ids = np.random.RandomState(1).randint(0, 64, (1, 6))
    with_adapters = _logits(lora, ids)
    merged = merge_lora(lora)
    # merged params have no lora leaves
    assert "lora_a" not in merged["layers"]["attn"]["q"]
    np.testing.assert_allclose(_logits(merged, ids), with_adapters, atol=2e-4, rtol=1e-3)
    # and adapters changed the function vs base
    assert np.abs(with_adapters - _logits(base, ids)).max() > 1e-3


def test_trainable_filter():
    assert lora_trainable_filter("llm/layers/attn/q/lora_a")
    assert lora_trainable_filter("llm/layers/mlp/down/lora_b")
    assert lora_trainable_filter("projector/layers/0/kernel")
    assert not lora_trainable_filter("llm/layers/attn/q/kernel")
    assert not lora_trainable_filter("vision/layers/attn/q/kernel")

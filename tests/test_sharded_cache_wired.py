"""Decode-time sequence sharding WIRED through the decoder (llama_forward).

With LlamaConfig.cache_sequence_axis set, cached decode attention runs the
parallel/sharded_cache.py shard_map path (per-shard partials + pmax/psum
combine) while cache writes stay GSPMD scatters. These tests pin token-exact
greedy equality against the dense single-device path on the conftest
8-virtual-device CPU mesh — prefill, decode, and speculative verify blocks.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from teochat_tpu.config import LlamaConfig
from teochat_tpu.models import generation as gen_mod
from teochat_tpu.models import llama as llama_mod


def _mesh(n=8):
    return Mesh(np.array(jax.devices()[:n]).reshape(n), ("sequence",))


def _cfg(**kw):
    base = dict(
        vocab_size=96, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=4, max_position_embeddings=256,
    )
    base.update(kw)
    return LlamaConfig(**base)


def _stop(eos=2, m=2):
    return gen_mod.StopSpec(
        keyword_ids=jnp.zeros((1, m), jnp.int32),
        keyword_lens=jnp.zeros((1,), jnp.int32),
        eos_id=jnp.asarray(eos, jnp.int32),
    )


def _prompt_batch(params, cfg, rows, pad_to):
    b = len(rows)
    ids = np.zeros((b, pad_to), np.int32)
    mask = np.zeros((b, pad_to), bool)
    for i, r in enumerate(rows):
        ids[i, : len(r)] = r
        mask[i, : len(r)] = True
    seq_lens = jnp.asarray([len(r) for r in rows], jnp.int32)
    pos = jnp.asarray(np.maximum(np.cumsum(mask, 1) - 1, 0), jnp.int32)
    embeds = llama_mod.embed_tokens(params, jnp.asarray(ids), jnp.float32)
    return embeds, seq_lens, jnp.asarray(mask), pos


@pytest.mark.parametrize("hkv", [4, 2])
def test_generate_tokens_sharded_cache_matches_dense(hkv):
    cfg = _cfg(num_kv_heads=hkv)
    cfg_sh = dataclasses.replace(cfg, cache_sequence_axis="sequence")
    params = llama_mod.init_llama(jax.random.PRNGKey(0), cfg)
    rows = [[1, 5, 9, 4], [1, 7, 8, 3, 2, 6, 11]]
    embeds, seq_lens, mask, pos = _prompt_batch(params, cfg, rows, 8)
    args = (embeds, seq_lens, mask, pos, None, _stop(), jax.random.PRNGKey(1))
    kw = dict(max_new_tokens=6, cache_len=32)  # 32 % 8 == 0

    dense_tok, dense_n = gen_mod.generate_tokens(params, cfg, *args, **kw)
    with jax.set_mesh(_mesh(8)):
        sh_tok, sh_n = gen_mod.generate_tokens(params, cfg_sh, *args, **kw)

    np.testing.assert_array_equal(np.asarray(dense_tok), np.asarray(sh_tok))
    np.testing.assert_array_equal(np.asarray(dense_n), np.asarray(sh_n))


def test_spec_decode_sharded_cache_matches_plain_greedy():
    """Speculative verify blocks (S>1 reads of the sharded cache) stay exact."""
    cfg = _cfg()
    cfg_sh = dataclasses.replace(cfg, cache_sequence_axis="sequence")
    params = llama_mod.init_llama(jax.random.PRNGKey(2), cfg)
    # repetitive prompt so the n-gram drafter actually fires
    rows = [[1, 5, 9, 5, 9, 5, 9, 5]]
    embeds, seq_lens, mask, pos = _prompt_batch(params, cfg, rows, 8)
    prompt_ids = jnp.asarray(np.array([rows[0]]), jnp.int32)

    plain_tok, plain_n = gen_mod.generate_tokens(
        params, cfg, embeds, seq_lens, mask, pos, None, _stop(),
        jax.random.PRNGKey(3), max_new_tokens=8, cache_len=32,
    )
    with jax.set_mesh(_mesh(8)):
        sh_tok, sh_n, _, _ = gen_mod.generate_tokens_spec(
            params, cfg_sh, embeds, seq_lens, mask, pos, prompt_ids,
            seq_lens, _stop(), jax.random.PRNGKey(3), max_new_tokens=8,
            cache_len=32, spec_k=3,
        )
    np.testing.assert_array_equal(np.asarray(plain_tok), np.asarray(sh_tok))
    np.testing.assert_array_equal(np.asarray(plain_n), np.asarray(sh_n))


def test_session_prefill_suffix_decode_sharded():
    """Multi-turn session path: full prefill -> decode -> suffix prefill ->
    decode, all against the time-sharded cache, equals the dense path."""
    cfg = _cfg()
    cfg_sh = dataclasses.replace(cfg, cache_sequence_axis="sequence")
    params = llama_mod.init_llama(jax.random.PRNGKey(4), cfg)
    rows = [[1, 9, 7, 5]]
    embeds, seq_lens, mask, pos = _prompt_batch(params, cfg, rows, 8)
    suffix = [[12, 13, 14]]
    s_emb, s_lens, s_mask, s_pos = _prompt_batch(params, cfg, suffix, 4)

    def run(cfg_run, mesh_ctx):
        with mesh_ctx:
            cache = llama_mod.init_cache(cfg_run, 1, 32, jnp.float32)
            logits, cache = gen_mod.prefill_full(
                params, cfg_run, cache, embeds, seq_lens, mask, pos
            )
            tok1, n1, cache = gen_mod.decode_with_cache(
                params, cfg_run, cache, logits, seq_lens, _stop(),
                jax.random.PRNGKey(5), max_new_tokens=4,
            )
            start = seq_lens + n1
            logits2, cache = gen_mod.prefill_suffix(
                params, cfg_run, cache, s_emb, start, s_lens, s_mask, s_pos
            )
            tok2, n2, _ = gen_mod.decode_with_cache(
                params, cfg_run, cache, logits2, start + s_lens, _stop(),
                jax.random.PRNGKey(6), max_new_tokens=4,
            )
        return tok1, tok2

    import contextlib

    d1, d2 = run(cfg, contextlib.nullcontext())
    s1, s2 = run(cfg_sh, jax.set_mesh(_mesh(8)))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(d2), np.asarray(s2))

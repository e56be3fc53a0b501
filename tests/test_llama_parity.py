"""LLaMA decoder parity vs HF (tiny random init, fp32) + KV-cache consistency."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from teochat_tpu.checkpoint.convert_hf import convert_llama
from teochat_tpu.config import LlamaConfig
from teochat_tpu.models.llama import (

    KVCache,
    embed_tokens,
    init_cache,
    init_llama,
    llama_forward,
)

pytestmark = pytest.mark.slow  # heavy suite: excluded from the smoke tier

CFG = LlamaConfig(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=128,
    num_layers=3,
    num_heads=4,
    num_kv_heads=4,
    max_position_embeddings=128,
)


@pytest.fixture(scope="module")
def hf_model():
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    torch.manual_seed(0)
    hf_cfg = HFLlamaConfig(
        vocab_size=CFG.vocab_size,
        hidden_size=CFG.hidden_size,
        intermediate_size=CFG.intermediate_size,
        num_hidden_layers=CFG.num_layers,
        num_attention_heads=CFG.num_heads,
        num_key_value_heads=CFG.num_kv_heads,
        max_position_embeddings=CFG.max_position_embeddings,
        rms_norm_eps=CFG.rms_norm_eps,
        attn_implementation="eager",
    )
    return LlamaForCausalLM(hf_cfg).eval()


def _forward_ours(params, ids):
    embeds = embed_tokens(params, jnp.asarray(ids))
    pos = jnp.broadcast_to(jnp.arange(ids.shape[1]), ids.shape)
    logits, _ = llama_forward(params, CFG, embeds, position_ids=pos)
    return np.asarray(logits)


def test_logits_parity(hf_model):
    import torch

    params = convert_llama(hf_model.state_dict(), CFG)
    ids = np.random.RandomState(0).randint(0, CFG.vocab_size, (2, 9))
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids)).logits.numpy()
    ours = _forward_ours(params, ids)
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-3)


def test_greedy_decode_parity(hf_model):
    """Token-exact greedy decode vs HF generate (BASELINE.json north star)."""
    import torch

    params = convert_llama(hf_model.state_dict(), CFG)
    ids = np.random.RandomState(1).randint(3, CFG.vocab_size, (1, 7))
    n_new = 8
    with torch.no_grad():
        ref_out = hf_model.generate(
            torch.from_numpy(ids), max_new_tokens=n_new, do_sample=False,
            eos_token_id=None, pad_token_id=0,
        ).numpy()

    # ours: prefill through cache, then greedy decode steps
    b, s = ids.shape
    cache = init_cache(CFG, b, s + n_new, dtype=jnp.float32)
    embeds = embed_tokens(params, jnp.asarray(ids))
    slots = jnp.broadcast_to(jnp.arange(s), (b, s))
    kv_mask = jnp.zeros((b, s + n_new), bool).at[:, :s].set(True)
    logits, cache = llama_forward(
        params, CFG, embeds, position_ids=slots, cache=cache,
        write_slots=slots, kv_mask=kv_mask, logits_mode="last",
        last_index=jnp.full((b,), s - 1),
    )
    toks = [int(jnp.argmax(logits[0, -1]))]
    for step in range(n_new - 1):
        pos = jnp.full((b, 1), s + step)
        kv_mask = kv_mask.at[:, s + step].set(True)
        emb = embed_tokens(params, jnp.full((b, 1), toks[-1]))
        logits, cache = llama_forward(
            params, CFG, emb, position_ids=pos, cache=cache,
            write_slots=pos, kv_mask=kv_mask, logits_mode="last",
        )
        toks.append(int(jnp.argmax(logits[0, -1])))

    assert toks == ref_out[0, s:].tolist()


def test_cache_matches_nocache():
    """Cached prefill logits == cache-free logits (ragged batch, scatter writes)."""
    params = init_llama(jax.random.PRNGKey(0), CFG)
    rs = np.random.RandomState(2)
    ids = rs.randint(0, CFG.vocab_size, (2, 6))
    lens = np.array([6, 4])  # row 1 padded by 2
    mask = np.arange(6)[None, :] < lens[:, None]

    embeds = embed_tokens(params, jnp.asarray(ids))
    pos = jnp.broadcast_to(jnp.arange(6), (2, 6))

    ref_logits, _ = llama_forward(
        params, CFG, embeds, position_ids=pos, attention_mask=jnp.asarray(mask)
    )

    cache = init_cache(CFG, 2, 16, dtype=jnp.float32)
    kv_mask = jnp.zeros((2, 16), bool).at[:, :6].set(jnp.asarray(mask))
    got_logits, cache2 = llama_forward(
        params, CFG, embeds, position_ids=pos, cache=cache,
        write_slots=pos, kv_mask=kv_mask,
    )
    # compare only valid rows/positions
    for bidx in range(2):
        L = lens[bidx]
        np.testing.assert_allclose(
            np.asarray(got_logits)[bidx, :L],
            np.asarray(ref_logits)[bidx, :L],
            atol=2e-5,
            rtol=1e-4,
        )
    assert isinstance(cache2, KVCache)


def test_per_row_decode_slots():
    """Ragged decode: rows write at different slots in the same step."""
    params = init_llama(jax.random.PRNGKey(3), CFG)
    rs = np.random.RandomState(3)
    full = rs.randint(0, CFG.vocab_size, (2, 5))
    lens = np.array([5, 3])

    # Reference: run each row separately, cache-free, take last valid logits.
    refs = []
    for bidx in range(2):
        ids = full[bidx : bidx + 1, : lens[bidx]]
        emb = embed_tokens(params, jnp.asarray(ids))
        pos = jnp.arange(lens[bidx])[None, :]
        lg, _ = llama_forward(params, CFG, emb, position_ids=pos)
        refs.append(np.asarray(lg)[0, -1])

    # Ours: prefill the ragged batch, then check last-token logits per row.
    mask = np.arange(5)[None, :] < lens[:, None]
    emb = embed_tokens(params, jnp.asarray(full))
    pos = jnp.broadcast_to(jnp.arange(5), (2, 5))
    cache = init_cache(CFG, 2, 8, dtype=jnp.float32)
    kv_mask = jnp.zeros((2, 8), bool).at[:, :5].set(jnp.asarray(mask))
    logits, cache = llama_forward(
        params, CFG, emb, position_ids=pos, cache=cache, write_slots=pos,
        kv_mask=kv_mask, logits_mode="last", last_index=jnp.asarray(lens - 1),
    )
    for bidx in range(2):
        np.testing.assert_allclose(
            np.asarray(logits)[bidx, 0], refs[bidx], atol=2e-5, rtol=1e-4
        )

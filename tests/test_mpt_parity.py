"""MPT backend parity vs HF MptForCausalLM (tiny random init, fp32)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from teochat_tpu.config import MptConfig
from teochat_tpu.models.llama import init_cache
from teochat_tpu.models.mpt import (

    alibi_slopes,
    convert_hf_mpt,
    init_mpt,
    mpt_embed,
    mpt_forward,
)

pytestmark = pytest.mark.slow  # heavy suite: excluded from the smoke tier

CFG = MptConfig(
    vocab_size=96, d_model=32, n_layers=2, n_heads=4, expansion_ratio=4,
    max_seq_len=64,
)


@pytest.fixture(scope="module")
def hf_model():
    torch = pytest.importorskip("torch")
    from transformers import MptConfig as HFMptConfig
    from transformers import MptForCausalLM

    torch.manual_seed(0)
    hf_cfg = HFMptConfig(
        vocab_size=CFG.vocab_size,
        d_model=CFG.d_model,
        n_layers=CFG.n_layers,
        n_heads=CFG.n_heads,
        expansion_ratio=CFG.expansion_ratio,
        max_seq_len=CFG.max_seq_len,
        attn_config={"attn_impl": "eager", "alibi": True, "alibi_bias_max": 8},
    )
    return MptForCausalLM(hf_cfg).eval()


def test_alibi_slopes_power_of_two():
    s = np.asarray(alibi_slopes(4, 8))
    np.testing.assert_allclose(s, [0.25, 0.0625, 0.015625, 0.00390625])


def test_alibi_slopes_non_power_of_two():
    s = np.asarray(alibi_slopes(6, 8))
    assert s.shape == (6,)
    assert np.all(s[:-1] >= s[1:] * 0)  # positive, head-dependent


def test_logits_parity(hf_model):
    import torch

    params = convert_hf_mpt(hf_model.state_dict(), CFG)
    ids = np.random.RandomState(0).randint(0, CFG.vocab_size, (2, 7))
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids)).logits.numpy()
    emb = mpt_embed(params, jnp.asarray(ids))
    got, _ = mpt_forward(params, CFG, emb)
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-4, rtol=1e-3)


def test_greedy_decode_parity(hf_model):
    import torch

    params = convert_hf_mpt(hf_model.state_dict(), CFG)
    ids = np.random.RandomState(1).randint(0, CFG.vocab_size, (1, 5))
    n_new = 6
    with torch.no_grad():
        ref = hf_model.generate(
            torch.from_numpy(ids), max_new_tokens=n_new, do_sample=False,
            eos_token_id=None, pad_token_id=0,
        ).numpy()

    b, s = ids.shape
    from teochat_tpu.config import LlamaConfig

    cache_cfg = LlamaConfig(
        num_layers=CFG.n_layers, hidden_size=CFG.d_model,
        num_heads=CFG.n_heads, num_kv_heads=CFG.n_heads,
    )
    cache = init_cache(cache_cfg, b, s + n_new, dtype=jnp.float32)
    slots = jnp.broadcast_to(jnp.arange(s), (b, s))
    kv_mask = jnp.zeros((b, s + n_new), bool).at[:, :s].set(True)
    emb = mpt_embed(params, jnp.asarray(ids))
    logits, cache = mpt_forward(
        params, CFG, emb, cache=cache, write_slots=slots, kv_mask=kv_mask,
        logits_mode="last", last_index=jnp.full((b,), s - 1),
    )
    toks = [int(jnp.argmax(logits[0, -1]))]
    for step in range(n_new - 1):
        pos = jnp.full((b, 1), s + step)
        kv_mask = kv_mask.at[:, s + step].set(True)
        emb1 = mpt_embed(params, jnp.full((b, 1), toks[-1]))
        logits, cache = mpt_forward(
            params, CFG, emb1, cache=cache, write_slots=pos, kv_mask=kv_mask,
            logits_mode="last",
        )
        toks.append(int(jnp.argmax(logits[0, -1])))
    assert toks == ref[0, s:].tolist()


def test_multiquery_runs():
    cfg = MptConfig(
        vocab_size=64, d_model=32, n_layers=2, n_heads=4,
        attn_type="multiquery_attention",
    )
    params = init_mpt(jax.random.PRNGKey(0), cfg)
    emb = mpt_embed(params, jnp.asarray([[1, 2, 3]]))
    logits, _ = mpt_forward(params, cfg, emb)
    assert logits.shape == (1, 3, 64)

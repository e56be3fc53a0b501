"""Flash-decode kernel (interpret mode) vs XLA reference; fp8 KV cache path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from teochat_tpu.ops.decode_attention import decode_attention

pytestmark = pytest.mark.slow  # opt-in kernel study, not smoke coverage


@pytest.mark.parametrize(
    "b,h,hkv,t,d",
    [(2, 4, 4, 256, 128), (3, 8, 2, 512, 128), (1, 4, 4, 384, 128)],
)
def test_decode_kernel_matches_xla(b, h, hkv, t, d):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, hkv, t, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, hkv, t, d), jnp.float32)
    lens = jnp.asarray(rng.randint(1, t + 1, (b,)), jnp.int32)
    ref = decode_attention(q, k, v, lens, impl="xla")
    got = decode_attention(q, k, v, lens, impl="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_decode_kernel_length_isolation():
    """Slots beyond a row's length must not leak into its output."""
    rng = np.random.RandomState(1)
    b, h, t, d = 2, 2, 256, 128
    k = jnp.asarray(rng.randn(b, h, t, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, t, d), jnp.float32)
    q = jnp.asarray(rng.randn(b, h, d), jnp.float32)
    lens = jnp.asarray([40, 200], jnp.int32)
    out1 = decode_attention(q, k, v, lens, impl="pallas", interpret=True)
    # corrupt everything past each row's length; output must not change
    slot = jnp.arange(t)[None, None, :, None]
    k2 = jnp.where(slot < lens[:, None, None, None], k, 1e4)
    v2 = jnp.where(slot < lens[:, None, None, None], v, -1e4)
    out2 = decode_attention(q, k2, v2, lens, impl="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_fp8_kv_cache_decode_close_to_bf16():
    """kv_dtype='float8_e4m3fn' (opt-in, halves cache bytes) must track the
    bf16-KV decode closely on a tiny model — metric-safe, not bit-exact."""
    from teochat_tpu.config import tiny_test_config
    from teochat_tpu.models import generation as gen_mod
    from teochat_tpu.models import llama as llama_mod

    cfg = tiny_test_config().llm
    params = llama_mod.init_llama(jax.random.PRNGKey(0), cfg)
    b, s = 2, 8
    embeds = jnp.asarray(
        np.random.RandomState(0).randn(b, s, cfg.hidden_size) * 0.1, jnp.float32
    )
    seq_lens = jnp.asarray([s, s - 2], jnp.int32)
    amask = jnp.arange(s)[None, :] < seq_lens[:, None]
    pos = jnp.where(amask, jnp.cumsum(amask, axis=1) - 1, 0).astype(jnp.int32)
    stop = gen_mod.StopSpec(
        keyword_ids=jnp.zeros((1, 1), jnp.int32),
        keyword_lens=jnp.zeros((1,), jnp.int32),
        eos_id=jnp.asarray(-1, jnp.int32),
    )

    def gen(kv_dtype):
        toks, n = gen_mod.generate_tokens(
            params, cfg, embeds, seq_lens, amask, pos, None, stop,
            jax.random.PRNGKey(0), max_new_tokens=6, temperature=0.0,
            do_sample=False, cache_len=s + 7, kv_dtype=kv_dtype,
        )
        return np.asarray(toks)

    t_bf16 = gen("float32")
    t_fp8 = gen("float8_e4m3fn")
    # greedy argmax over a tiny random model: fp8 KV rounding may flip ties on
    # later steps; the first decoded token must agree and most tokens match
    assert (t_bf16[:, 0] == t_fp8[:, 0]).all()
    assert (t_bf16 == t_fp8).mean() >= 0.5

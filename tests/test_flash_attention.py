"""Flash-attention kernel math vs XLA reference (Pallas interpreter on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from teochat_tpu.ops.attention import xla_attention
from teochat_tpu.ops.flash_attention import flash_attention


def _rand(shape, seed):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape), jnp.float32)


@pytest.mark.parametrize("s,block", [(256, 128), (128, 128), (384, 128)])
def test_flash_matches_xla_causal(s, block):
    b, h, d = 2, 4, 64
    q = _rand((b, s, h, d), 0)
    k = _rand((b, s, h, d), 1)
    v = _rand((b, s, h, d), 2)
    ref = xla_attention(q, k, v, causal=True)
    got = flash_attention(q, k, v, causal=True, block_q=block, block_k=block,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_noncausal():
    b, s, h, d = 1, 256, 2, 64
    q, k, v = _rand((b, s, h, d), 3), _rand((b, s, h, d), 4), _rand((b, s, h, d), 5)
    ref = xla_attention(q, k, v, causal=False)
    got = flash_attention(q, k, v, causal=False, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_gqa_expansion():
    b, s, h, hkv, d = 1, 128, 4, 2, 64
    q = _rand((b, s, h, d), 6)
    k = _rand((b, s, hkv, d), 7)
    v = _rand((b, s, hkv, d), 8)
    ref = xla_attention(q, k, v, causal=True)
    got = flash_attention(q, k, v, causal=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_rejects_mask():
    q = _rand((1, 128, 2, 64), 9)
    with pytest.raises(NotImplementedError):
        flash_attention(q, q, q, mask=jnp.ones((1, 128), bool), interpret=True)


def test_flash_bias_k_alibi():
    """Key-separable ALiBi bias through the kernel matches the XLA path."""
    from teochat_tpu.models.mpt import alibi_bias

    b, s, h, d = 2, 256, 4, 64
    q, k, v = _rand((b, s, h, d), 10), _rand((b, s, h, d), 11), _rand((b, s, h, d), 12)
    table = alibi_bias(h, s)[0, :, 0, :]  # [H, S]
    ref = xla_attention(q, k, v, causal=True, bias=table[None, :, None, :])
    got = flash_attention(q, k, v, causal=True, bias_k=table, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_bias_k_multiquery():
    """bias_k composes with GQA/multiquery kv-head sharing (MPT multiquery)."""
    b, s, h, d = 1, 256, 4, 64
    q = _rand((b, s, h, d), 13)
    k = _rand((b, s, 1, d), 14)
    v = _rand((b, s, 1, d), 15)
    table = _rand((h, s), 16) * 0.1
    ref = xla_attention(q, k, v, causal=True, bias=table[None, :, None, :])
    got = flash_attention(q, k, v, causal=True, bias_k=table, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_bias_k_shape_check():
    q = _rand((1, 128, 2, 64), 17)
    with pytest.raises(ValueError):
        flash_attention(q, q, q, bias_k=jnp.zeros((2, 64)), interpret=True)


def test_dispatch_bias_k_routes_xla_on_cpu():
    """dot_product_attention(bias_k=...) equals explicit-bias XLA attention."""
    from teochat_tpu.ops.attention import dot_product_attention

    b, s, h, d = 1, 64, 2, 32
    q, k, v = _rand((b, s, h, d), 18), _rand((b, s, h, d), 19), _rand((b, s, h, d), 20)
    table = _rand((h, s), 21) * 0.1
    ref = xla_attention(q, k, v, causal=True, bias=table[None, :, None, :])
    got = dot_product_attention(q, k, v, causal=True, bias_k=table)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)
    with pytest.raises(ValueError):
        dot_product_attention(q, k, v, bias=table[None, :, None, :], bias_k=table)

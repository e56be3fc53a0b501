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

"""One-shot ViT attention kernel (ops/vit_attention.py) vs XLA reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from teochat_tpu.ops.attention import xla_attention
from teochat_tpu.ops.vit_attention import vit_attention

pytestmark = pytest.mark.slow  # opt-in kernel study, not smoke coverage


@pytest.mark.parametrize("b,s,h,d", [(2, 257, 4, 64), (1, 128, 2, 32), (3, 100, 8, 64)])
def test_vit_attention_matches_xla(b, s, h, d):
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(b, s, h, d), jnp.float32)
    k = jnp.asarray(rs.randn(b, s, h, d), jnp.float32)
    v = jnp.asarray(rs.randn(b, s, h, d), jnp.float32)
    ref = xla_attention(q, k, v, causal=False)
    got = vit_attention(q, k, v, impl="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_vit_attention_bf16_padded_cols_masked():
    """Zero-padded key columns (S=257 -> 384 lanes) must not leak into the
    softmax: compare against XLA on bf16 inputs."""
    rs = np.random.RandomState(1)
    b, s, h, d = 2, 257, 16, 64
    q = jnp.asarray(rs.randn(b, s, h, d), jnp.bfloat16)
    k = jnp.asarray(rs.randn(b, s, h, d), jnp.bfloat16)
    v = jnp.asarray(rs.randn(b, s, h, d), jnp.bfloat16)
    ref = xla_attention(q, k, v, causal=False).astype(jnp.float32)
    got = vit_attention(q, k, v, impl="pallas", interpret=True).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_vit_attention_auto_falls_back_small_seq():
    # temporal attention shapes (frames axis) stay on XLA
    rs = np.random.RandomState(2)
    q = jnp.asarray(rs.randn(2, 8, 4, 64), jnp.float32)
    out = vit_attention(q, q, q)  # auto -> xla on CPU/small S
    assert out.shape == q.shape

"""Attention-op unit tests: masks, GQA, bias, dispatch guards."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from teochat_tpu.ops.attention import dot_product_attention, xla_attention


def _rand(shape, seed):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape), jnp.float32)


def test_gqa_matches_expanded():
    b, s, h, hkv, d = 2, 8, 4, 2, 16
    q = _rand((b, s, h, d), 0)
    k = _rand((b, s, hkv, d), 1)
    v = _rand((b, s, hkv, d), 2)
    got = xla_attention(q, k, v, causal=True)
    k_full = jnp.repeat(k, h // hkv, axis=2)
    v_full = jnp.repeat(v, h // hkv, axis=2)
    ref = xla_attention(q, k_full, v_full, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_padding_mask_2d():
    b, s, d = 1, 6, 8
    q = _rand((b, s, 2, d), 3)
    k = _rand((b, s, 2, d), 4)
    v = _rand((b, s, 2, d), 5)
    mask = jnp.asarray([[True, True, True, False, False, False]])
    out = xla_attention(q, k, v, mask=mask)
    # same output as truncating k/v to the valid prefix
    ref = xla_attention(q, k[:, :3], v[:, :3])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_additive_bias():
    b, s, h, d = 1, 4, 2, 8
    q, k, v = _rand((b, s, h, d), 6), _rand((b, s, h, d), 7), _rand((b, s, h, d), 8)
    bias = jnp.full((1, h, s, s), -1e9).at[:, :, :, 0].set(0.0)
    out = xla_attention(q, k, v, bias=bias)
    # with everything except key 0 masked via bias, output == v[:, 0]
    ref = jnp.broadcast_to(v[:, :1], out.shape)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_dispatch_auto_uses_xla_off_tpu():
    # on CPU the auto path must not route to the Pallas kernel
    q = _rand((1, 256, 2, 128), 9)
    out = dot_product_attention(q, q, q, causal=True, impl="auto")
    ref = xla_attention(q, q, q, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_causal_with_kv_longer_than_q():
    """Decode-style: 1 query against T cached keys, causal offset alignment."""
    b, t, h, d = 1, 5, 2, 8
    k = _rand((b, t, h, d), 10)
    v = _rand((b, t, h, d), 11)
    q = _rand((b, 1, h, d), 12)
    out = xla_attention(q, k, v, causal=True)
    # last query row attends all keys -> equals non-causal
    ref = xla_attention(q, k, v, causal=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

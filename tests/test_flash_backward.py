"""Flash-attention custom_vjp: gradient parity vs the XLA path (interpreter)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from teochat_tpu.ops.attention import xla_attention
from teochat_tpu.ops.flash_attention import flash_attention_trainable

pytestmark = pytest.mark.slow  # heavy suite: excluded from the smoke tier


def _rand(shape, seed):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape), jnp.float32)


@pytest.mark.parametrize("s", [128, 256])
def test_forward_matches_xla(s):
    b, h, d = 1, 2, 64
    q, k, v = _rand((b, s, h, d), 0), _rand((b, s, h, d), 1), _rand((b, s, h, d), 2)
    ref = xla_attention(q, k, v, causal=True)
    got = flash_attention_trainable(q, k, v, True, None, 128, 128, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("s,causal", [(128, True), (256, True), (128, False)])
def test_gradients_match_xla(s, causal):
    b, h, d = 1, 2, 64
    q, k, v = _rand((b, s, h, d), 3), _rand((b, s, h, d), 4), _rand((b, s, h, d), 5)
    # scale down so exp() stays tame for the fp32 comparison
    q, k = q * 0.3, k * 0.3

    def loss_flash(q, k, v):
        o = flash_attention_trainable(q, k, v, causal, None, 128, 128, True)
        return jnp.sum(o * jnp.cos(o))  # nontrivial upstream gradient

    def loss_xla(q, k, v):
        o = xla_attention(q, k, v, causal=causal)
        return jnp.sum(o * jnp.cos(o))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip("qkv", gf, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-5, rtol=1e-3,
            err_msg=f"d{name} mismatch",
        )


def test_gradients_multi_tile_causal():
    """Several q/kv tiles with causal skipping: exercises both kernels' grids."""
    b, h, d, s = 1, 1, 64, 384
    q, k, v = _rand((b, s, h, d), 6), _rand((b, s, h, d), 7), _rand((b, s, h, d), 8)
    q, k = q * 0.2, k * 0.2

    def loss(fn):
        def inner(q, k, v):
            return jnp.sum(fn(q, k, v) ** 2)

        return inner

    gf = jax.grad(
        loss(lambda q, k, v: flash_attention_trainable(q, k, v, True, None, 128, 128, True)),
        argnums=(0, 1, 2),
    )(q, k, v)
    gx = jax.grad(
        loss(lambda q, k, v: xla_attention(q, k, v, causal=True)), argnums=(0, 1, 2)
    )(q, k, v)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("hkv", [1, 2])
def test_gqa_forward_matches_xla(hkv):
    """GQA (kv heads < q heads) routed through BlockSpec index maps."""
    b, h, d, s = 1, 4, 64, 256
    q = _rand((b, s, h, d), 10)
    k = _rand((b, s, hkv, d), 11)
    v = _rand((b, s, hkv, d), 12)
    ref = xla_attention(q, k, v, causal=True)
    got = flash_attention_trainable(q, k, v, True, None, 128, 128, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("hkv,causal", [(1, True), (2, True), (2, False)])
def test_gqa_gradients_match_xla(hkv, causal):
    """dK/dV must accumulate the per-group gradient sum (the dKV kernel's
    combined group*q_tile sweep) and dQ must read the shared kv head."""
    b, h, d, s = 1, 4, 64, 256
    q = _rand((b, s, h, d), 13) * 0.3
    k = _rand((b, s, hkv, d), 14) * 0.3
    v = _rand((b, s, hkv, d), 15)

    def loss_flash(q, k, v):
        o = flash_attention_trainable(q, k, v, causal, None, 128, 128, True)
        return jnp.sum(o * jnp.cos(o))

    def loss_xla(q, k, v):
        o = xla_attention(q, k, v, causal=causal)
        return jnp.sum(o * jnp.cos(o))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip("qkv", gf, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-5, rtol=1e-3,
            err_msg=f"d{name} mismatch (hkv={hkv})",
        )


@pytest.mark.parametrize("s", [130, 200, 384])
def test_padded_any_length_matches_xla(s):
    """Non-tile-multiple lengths via the pad+slice wrapper: forward and
    gradients must match XLA exactly (padded keys causally invisible)."""
    from teochat_tpu.ops.flash_attention import flash_attention_trainable_padded

    b, h, d = 1, 2, 64
    q = _rand((b, s, h, d), 20) * 0.3
    k = _rand((b, s, h, d), 21) * 0.3
    v = _rand((b, s, h, d), 22)
    ref = xla_attention(q, k, v, causal=True)
    got = flash_attention_trainable_padded(q, k, v, True, None, 128, 128, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)

    def loss(fn):
        return lambda *a: jnp.sum(fn(*a) * jnp.cos(fn(*a)))

    gf = jax.grad(
        lambda q, k, v: jnp.sum(
            flash_attention_trainable_padded(q, k, v, True, None, 128, 128, True) ** 2
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    gx = jax.grad(
        lambda q, k, v: jnp.sum(xla_attention(q, k, v, causal=True) ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    for name, a, b_ in zip("qkv", gf, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-5, rtol=1e-3,
            err_msg=f"d{name} mismatch (s={s})",
        )


def test_padded_rejects_noncausal():
    from teochat_tpu.ops.flash_attention import flash_attention_trainable_padded

    q = _rand((1, 130, 2, 64), 23)
    with pytest.raises(ValueError, match="causal"):
        flash_attention_trainable_padded(q, q, q, False, None, 128, 128, True)


@pytest.mark.parametrize("hkv", [1, 4])
def test_gradients_with_alibi_bias(hkv):
    """bias_k rides through fwd residuals AND both bwd recomputes (MPT/ALiBi).

    dbias is defined as zero (constant table, matching the reference Triton
    kernel) so only dq/dk/dv are compared.
    """
    from teochat_tpu.models.mpt import alibi_bias

    b, h, d, s = 1, 4, 64, 256
    q = _rand((b, s, h, d), 20) * 0.3
    k = _rand((b, s, hkv, d), 21) * 0.3
    v = _rand((b, s, hkv, d), 22)
    table = alibi_bias(h, s)[0, :, 0, :]  # [H, S]

    def loss_flash(q, k, v):
        o = flash_attention_trainable(q, k, v, True, None, 128, 128, True, table)
        return jnp.sum(o * jnp.cos(o))

    def loss_xla(q, k, v):
        o = xla_attention(q, k, v, causal=True, bias=table[None, :, None, :])
        return jnp.sum(o * jnp.cos(o))

    ref = xla_attention(q, k, v, causal=True, bias=table[None, :, None, :])
    got = flash_attention_trainable(q, k, v, True, None, 128, 128, True, table)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip("qkv", gf, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-5, rtol=1e-3,
            err_msg=f"d{name} mismatch (hkv={hkv})",
        )


def test_gradients_bias_padded_lengths():
    """bias_k + off-tile lengths through the pad+slice wrapper."""
    from teochat_tpu.ops.flash_attention import flash_attention_trainable_padded

    b, h, d, s = 1, 2, 64, 200
    q = _rand((b, s, h, d), 23) * 0.3
    k = _rand((b, s, h, d), 24) * 0.3
    v = _rand((b, s, h, d), 25)
    table = _rand((h, s), 26) * 0.1

    def loss_flash(q, k, v):
        o = flash_attention_trainable_padded(
            q, k, v, True, None, 128, 128, True, table
        )
        return jnp.sum(o ** 2)

    def loss_xla(q, k, v):
        o = xla_attention(q, k, v, causal=True, bias=table[None, :, None, :])
        return jnp.sum(o ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4, rtol=1e-3)

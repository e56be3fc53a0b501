"""Pallas int4 fused dequant-matmul: kernel math vs XLA unpack (interpreter)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from teochat_tpu.ops.int4_matmul import int4_matmul, pack_int4, unpack_int4_halves


def _case(m, k, n, seed):
    rs = np.random.RandomState(seed)
    w_q = jnp.asarray(rs.randint(-8, 8, (k, n)), jnp.int32)
    packed = pack_int4(w_q)
    scale = jnp.asarray(rs.rand(n).astype(np.float32) * 0.1 + 0.01)
    x = jnp.asarray(rs.randn(m, k), jnp.float32)
    return x, w_q, packed, scale


def test_pack_unpack_roundtrip():
    _, w_q, packed, _ = _case(1, 16, 128, 0)
    w2 = unpack_int4_halves(packed, jnp.int32)
    np.testing.assert_array_equal(np.asarray(w2), np.asarray(w_q))


@pytest.mark.parametrize("m,k,n", [(1, 256, 256), (8, 512, 128), (13, 256, 384)])
def test_int4_matmul_matches_reference(m, k, n):
    x, w_q, packed, scale = _case(m, k, n, 1)
    ref = (x @ w_q.astype(jnp.float32)) * scale[None, :]
    got = int4_matmul(x, packed, scale, block_n=128, block_k2=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3, rtol=1e-4)


def test_int4_matmul_multiblock_k():
    x, w_q, packed, scale = _case(4, 1024, 256, 2)
    ref = (x @ w_q.astype(jnp.float32)) * scale[None, :]
    got = int4_matmul(x, packed, scale, block_n=128, block_k2=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3, rtol=1e-4)


@pytest.mark.parametrize("m,k,n", [(1, 256, 256), (8, 512, 384), (5, 256, 300)])
def test_int4_matmul_tiled_matches_reference(m, k, n):
    from teochat_tpu.ops.int4_matmul import int4_matmul_tiled, pack_int4_tiled

    rs = np.random.RandomState(3)
    w_q = jnp.asarray(rs.randint(-8, 8, (k, n)), jnp.int32)
    tiles = pack_int4_tiled(w_q, bn=128)
    n_pad = tiles.shape[0] * 128
    scale = jnp.asarray(
        np.pad(rs.rand(n).astype(np.float32) * 0.1 + 0.01, (0, n_pad - n))
    )
    x = jnp.asarray(rs.randn(m, k), jnp.float32)
    ref = (x @ w_q.astype(jnp.float32)) * scale[None, :n]
    got = int4_matmul_tiled(x, tiles, scale, n_out=n, block_k2=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3, rtol=1e-4)


def test_pack_i8_roundtrip_and_bit_equivalence():
    """v3 bytes are the v0 bytes with the top bit flipped; unpack roundtrips."""
    from teochat_tpu.ops.int4_matmul import pack_int4_i8, unpack_int4_i8

    rs = np.random.RandomState(7)
    w_q = jnp.asarray(rs.randint(-8, 8, (64, 128)), jnp.int32)
    b_i8 = pack_int4_i8(w_q)
    assert b_i8.dtype == jnp.int8
    np.testing.assert_array_equal(
        np.asarray(unpack_int4_i8(b_i8, jnp.int32)), np.asarray(w_q)
    )
    b_u8 = np.asarray(pack_int4(w_q))
    np.testing.assert_array_equal(
        (b_u8 ^ 0x80).astype(np.int8), np.asarray(b_i8)
    )


@pytest.mark.parametrize("m,k,n", [(1, 256, 256), (8, 512, 384), (5, 256, 300)])
def test_int4_matmul_tiled_i8_matches_reference(m, k, n):
    """The v3 (int8-storage) kernel path, selected by tile dtype."""
    from teochat_tpu.ops.int4_matmul import int4_matmul_tiled, pack_int4_tiled_i8

    rs = np.random.RandomState(5)
    w_q = jnp.asarray(rs.randint(-8, 8, (k, n)), jnp.int32)
    tiles = pack_int4_tiled_i8(w_q, bn=128)
    assert tiles.dtype == jnp.int8
    n_pad = tiles.shape[0] * 128
    scale = jnp.asarray(
        np.pad(rs.rand(n).astype(np.float32) * 0.1 + 0.01, (0, n_pad - n))
    )
    x = jnp.asarray(rs.randn(m, k), jnp.float32)
    ref = (x @ w_q.astype(jnp.float32)) * scale[None, :n]
    got = int4_matmul_tiled(x, tiles, scale, n_out=n, block_k2=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3, rtol=1e-4)


@pytest.mark.parametrize("m,k,n,layers", [(1, 256, 256, 3), (4, 512, 300, 2)])
def test_int4_matmul_tiled_stacked_i8_selects_layer(m, k, n, layers):
    from teochat_tpu.ops.int4_matmul import (
        int4_matmul_tiled_stacked,
        pack_int4_tiled_i8,
    )

    rs = np.random.RandomState(13)
    w_q = jnp.asarray(rs.randint(-8, 8, (layers, k, n)), jnp.int32)
    tiles = jnp.stack([pack_int4_tiled_i8(w_q[l], bn=128) for l in range(layers)])
    n_pad = tiles.shape[1] * 128
    scale = jnp.asarray(
        np.pad(
            rs.rand(layers, n).astype(np.float32) * 0.1 + 0.01,
            ((0, 0), (0, n_pad - n)),
        )
    )
    x = jnp.asarray(rs.randn(m, k), jnp.float32)
    for l in range(layers):
        ref = (x @ w_q[l].astype(jnp.float32)) * scale[l, None, :n]
        got = int4_matmul_tiled_stacked(
            x, tiles, scale, l, n_out=n, block_k2=128, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-3, rtol=1e-4
        )


def test_int4_matmul_tiled_i8_bf16_activations():
    """bf16 xa/xb split keeps error at bf16 scale (production decode dtype)."""
    from teochat_tpu.ops.int4_matmul import int4_matmul_tiled, pack_int4_tiled_i8

    rs = np.random.RandomState(17)
    k, n = 512, 256
    w_q = jnp.asarray(rs.randint(-8, 8, (k, n)), jnp.int32)
    tiles = pack_int4_tiled_i8(w_q, bn=128)
    scale = jnp.asarray(rs.rand(n).astype(np.float32) * 0.1 + 0.01)
    x = jnp.asarray(rs.randn(1, k), jnp.bfloat16)
    ref = (
        x.astype(jnp.float32) @ w_q.astype(jnp.float32)
    ) * scale[None, :]
    got = int4_matmul_tiled(
        x, tiles, scale, n_out=n, block_k2=128, interpret=True
    ).astype(jnp.float32)
    # bf16 activations carry ~3 decimal digits; tolerance scales with |ref|
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref),
        atol=0.05 * float(jnp.max(jnp.abs(ref))), rtol=0.02,
    )


@pytest.mark.parametrize("m,k,n,layers", [(1, 256, 256, 3), (4, 512, 300, 2)])
def test_int4_matmul_tiled_stacked_selects_layer(m, k, n, layers):
    """The layer-stacked kernel (scalar-prefetch layer index) must equal the
    per-layer reference for EVERY layer index."""
    from teochat_tpu.ops.int4_matmul import (
        int4_matmul_tiled_stacked,
        pack_int4_tiled,
    )

    rs = np.random.RandomState(11)
    w_q = jnp.asarray(rs.randint(-8, 8, (layers, k, n)), jnp.int32)
    tiles = jnp.stack([pack_int4_tiled(w_q[l], bn=128) for l in range(layers)])
    n_pad = tiles.shape[1] * 128
    scale = jnp.asarray(
        np.pad(
            rs.rand(layers, n).astype(np.float32) * 0.1 + 0.01,
            ((0, 0), (0, n_pad - n)),
        )
    )
    x = jnp.asarray(rs.randn(m, k), jnp.float32)
    for l in range(layers):
        ref = (x @ w_q[l].astype(jnp.float32)) * scale[l, None, :n]
        got = int4_matmul_tiled_stacked(
            x, tiles, scale, l, n_out=n, block_k2=128, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-3, rtol=1e-4
        )

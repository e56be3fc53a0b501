"""Decode with a time-sharded KV cache: exact match vs single-device decode.

Runs on the conftest 8-virtual-device CPU mesh; the masked owner-write and
pmax/psum softmax combination are identical to what executes over ICI.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from teochat_tpu.ops.attention import xla_attention
from teochat_tpu.parallel.sharded_cache import sharded_cache_decode_step


def _mesh(n=8):
    return Mesh(np.array(jax.devices()[:n]).reshape(n), ("sequence",))


def _decode_ref(q_steps, k_steps, v_steps, k0, v0, start):
    """Single-device reference: append each step's K/V, attend to the prefix."""
    outs = []
    k_cache, v_cache = np.array(k0), np.array(v0)
    pos = start
    for q, k, v in zip(q_steps, k_steps, v_steps):
        k_cache[:, pos] = k[:, 0]
        v_cache[:, pos] = v[:, 0]
        out = xla_attention(
            jnp.asarray(q), jnp.asarray(k_cache[:, : pos + 1]),
            jnp.asarray(v_cache[:, : pos + 1]),
        )
        outs.append(np.asarray(out))
        pos += 1
    return outs


@pytest.mark.slow  # 50+ s/param on this box; the wired-path equivalents
# (test_sharded_cache_wired.py) keep smoke-tier coverage of this feature
@pytest.mark.parametrize("hkv", [4, 2, 1])
def test_sharded_cache_decode_matches_dense(hkv):
    b, t, h, d, start, steps = 2, 32, 4, 16, 10, 5
    rs = np.random.RandomState(0)
    k0 = rs.randn(b, t, hkv, d).astype(np.float32) * 0.5
    v0 = rs.randn(b, t, hkv, d).astype(np.float32) * 0.5
    k0[:, start:] = 0.0  # slots past `start` are unwritten
    v0[:, start:] = 0.0
    q_steps = [rs.randn(b, 1, h, d).astype(np.float32) * 0.5 for _ in range(steps)]
    k_steps = [rs.randn(b, 1, hkv, d).astype(np.float32) * 0.5 for _ in range(steps)]
    v_steps = [rs.randn(b, 1, hkv, d).astype(np.float32) * 0.5 for _ in range(steps)]

    ref = _decode_ref(q_steps, k_steps, v_steps, k0, v0, start)

    mesh = _mesh(8)
    with jax.set_mesh(mesh):
        kc, vc = jnp.asarray(k0), jnp.asarray(v0)
        pos = jnp.full((b,), start, jnp.int32)
        for i in range(steps):
            out, kc, vc = sharded_cache_decode_step(
                jnp.asarray(q_steps[i]), jnp.asarray(k_steps[i]),
                jnp.asarray(v_steps[i]), kc, vc, pos,
            )
            np.testing.assert_allclose(
                np.asarray(out), ref[i], rtol=2e-5, atol=2e-5,
                err_msg=f"step {i} (hkv={hkv})",
            )
            pos = pos + 1
        # every written slot landed on the right shard-local position
        np.testing.assert_allclose(
            np.asarray(kc[:, start : start + steps]),
            np.concatenate(k_steps, axis=1), rtol=1e-6,
        )


def test_sharded_cache_ragged_rows():
    """Rows at different positions write to different shards in one step."""
    b, t, h, d = 4, 32, 2, 8
    rs = np.random.RandomState(3)
    k0 = np.zeros((b, t, h, d), np.float32)
    v0 = np.zeros((b, t, h, d), np.float32)
    positions = np.array([0, 5, 17, 30], np.int32)  # spans several shards
    q = rs.randn(b, 1, h, d).astype(np.float32)
    nk = rs.randn(b, 1, h, d).astype(np.float32)
    nv = rs.randn(b, 1, h, d).astype(np.float32)

    with jax.set_mesh(_mesh(8)):
        out, kc, vc = sharded_cache_decode_step(
            jnp.asarray(q), jnp.asarray(nk), jnp.asarray(nv),
            jnp.asarray(k0), jnp.asarray(v0), jnp.asarray(positions),
        )
    kc = np.asarray(kc)
    for r, p in enumerate(positions):
        np.testing.assert_allclose(kc[r, p], nk[r, 0], rtol=1e-6)
        # no other slot of this row was touched
        others = np.delete(kc[r], p, axis=0)
        assert np.abs(others).max() == 0.0

    # per-row dense reference over the visible prefix (zero-filled earlier
    # slots are legitimate keys — they were "written" as zeros)
    for r, p in enumerate(positions):
        kd, vd = np.array(k0[r]), np.array(v0[r])
        kd[p], vd[p] = nk[r, 0], nv[r, 0]
        ref = xla_attention(
            jnp.asarray(q[r : r + 1]),
            jnp.asarray(kd[None, : p + 1]),
            jnp.asarray(vd[None, : p + 1]),
        )
        np.testing.assert_allclose(
            np.asarray(out)[r], np.asarray(ref)[0], rtol=2e-5, atol=2e-5,
            err_msg=f"row {r} pos {p}",
        )


def test_sharded_cache_uneven_length_rejected():
    with jax.set_mesh(_mesh(8)):
        z = jnp.zeros((1, 30, 2, 8))  # 30 % 8 != 0
        with pytest.raises(ValueError, match="not divisible"):
            sharded_cache_decode_step(
                jnp.zeros((1, 1, 2, 8)), jnp.zeros((1, 1, 2, 8)),
                jnp.zeros((1, 1, 2, 8)), z, z, jnp.zeros((1,), jnp.int32),
            )

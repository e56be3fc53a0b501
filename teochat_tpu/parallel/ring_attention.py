"""Ring attention: context parallelism over a `sequence` mesh axis.

The reference bounds context instead of scaling it (SURVEY §5: max ~4.4k fused
tokens, no ring/blockwise/Ulysses anywhere). This module adds the TPU-native
long-context lever the mesh reserved room for: shard the sequence across
devices and rotate K/V blocks around the ICI ring (`jax.lax.ppermute`) while
each device accumulates flash-style online-softmax partial results for its
resident queries. Peak memory per device is O(S/n) and the collective traffic
rides neighbor-to-neighbor ICI links — the layout the hardware's torus is
built for.

Numerics match full attention: fp32 running max/sum/accumulator, identical to
ops/flash_attention.py's scheme. Forward-and-backward differentiable (the
rotation loop is a `lax.scan`, so autodiff just works; each K/V block is
rematerialized by the scan's reverse pass rather than stored).

Not wired into the TEOChat decoder by default — parity needs no sequence
sharding at ≤4.4k tokens. `ring_attention` is the shard_map-ready collective
op; `context_parallel_attention` is the convenience wrapper that builds the
shard_map over an existing mesh's `sequence` axis.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def ring_attention(
    q: jnp.ndarray,  # [B, S_local, H, D] this device's query shard
    k: jnp.ndarray,  # [B, S_local, Hkv, D] this device's key shard (GQA ok)
    v: jnp.ndarray,  # [B, S_local, Hkv, D]
    *,
    axis_name: str,
    axis_size: int,
    causal: bool = True,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Attention over the full (sharded) sequence; call inside shard_map.

    Device i holds queries/keys/values for global positions
    [i*S_local, (i+1)*S_local). Each of the `axis_size` ring steps attends the
    resident queries to the currently-held K/V block, then passes the block to
    the next device. Causal masking uses global positions; fully-masked blocks
    cost one wasted matmul (block skipping would unbalance the ring schedule —
    every device must forward every block anyway to keep the rotation going).

    GQA: Hkv may divide H; queries are viewed as [B, S, Hkv, G, D] and each
    kv head serves its G-query group in one grouped einsum — the rotating
    K/V blocks stay at Hkv width, so ICI traffic shrinks by G vs expansion.
    """
    b, s_loc, h, d = q.shape
    hkv = k.shape[2]
    if h % hkv:
        raise ValueError(f"q heads {h} not a multiple of kv heads {hkv}")
    g = h // hkv
    if scale is None:
        scale = d ** -0.5
    idx = jax.lax.axis_index(axis_name)
    q_pos = idx * s_loc + jnp.arange(s_loc)

    qf = q.astype(jnp.float32).reshape(b, s_loc, hkv, g, d)
    m0 = jnp.full((b, h, s_loc), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, h, s_loc), jnp.float32)
    acc0 = jnp.zeros((b, h, s_loc, d), jnp.float32)

    perm = [(j, (j + 1) % axis_size) for j in range(axis_size)]

    def block_update(k_blk, v_blk, i, m, l, acc):
        # the block held at ring step i originated on device (idx - i) % n
        src = (idx - i) % axis_size
        k_pos = src * s_loc + jnp.arange(s_loc)
        s = jnp.einsum(
            "bqhgd,bkhd->bhgqk", qf, k_blk.astype(jnp.float32)
        ).reshape(b, h, s_loc, s_loc) * scale
        if causal:
            s = jnp.where(
                q_pos[None, None, :, None] >= k_pos[None, None, None, :],
                s, _NEG_INF,
            )
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[..., None])
        l = l * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[..., None] + jnp.einsum(
            "bhgqk,bkhd->bhgqd",
            p.reshape(b, hkv, g, s_loc, s_loc), v_blk.astype(jnp.float32),
        ).reshape(b, h, s_loc, d)
        return m_new, l, acc

    # step 0 consumes the resident block; each later step rotates FIRST and
    # then consumes, so no rotation's result is ever discarded (exactly
    # axis_size - 1 neighbor ppermutes per call)
    m, l, acc = block_update(k, v, jnp.asarray(0), m0, l0, acc0)

    def step(carry, i):
        k_blk, v_blk, m, l, acc = carry
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        m, l, acc = block_update(k_blk, v_blk, i, m, l, acc)
        return (k_blk, v_blk, m, l, acc), None

    (_, _, m, l, acc), _ = jax.lax.scan(
        step, (k, v, m, l, acc), jnp.arange(1, axis_size)
    )
    # rows with no visible keys (can't happen for causal self-attention, but
    # guard the division anyway)
    l_safe = jnp.where(l == 0.0, 1.0, l)
    out = acc / l_safe[..., None]
    return jnp.transpose(out, (0, 2, 1, 3)).astype(q.dtype)


def ring_self_attention(
    q: jnp.ndarray,  # [B, S, H, D] global arrays (inside jit)
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    axis_name: str,
    causal: bool = True,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Trace-time ring attention over the AMBIENT mesh's `axis_name` axis.

    For use inside a jitted model under `jax.set_mesh(...)` (the decoder's
    cache-free path when LlamaConfig.sequence_axis is set): shard_map splits
    S across the axis, runs the ring, and returns the S-sharded result. The
    caller guarantees causal-only masking is sufficient (right-padded
    prompts: pads sit after every valid query)."""
    mesh = jax.sharding.get_abstract_mesh()
    if axis_name not in mesh.shape:
        raise ValueError(
            f"sequence axis {axis_name!r} not in the active mesh {mesh.shape}"
        )
    n = mesh.shape[axis_name]
    s = q.shape[1]
    if s % n:
        raise ValueError(f"sequence length {s} not divisible by {axis_name}={n}")
    spec = P(None, axis_name, None, None)
    fn = jax.shard_map(
        functools.partial(
            ring_attention, axis_name=axis_name, axis_size=n,
            causal=causal, scale=scale,
        ),
        in_specs=(spec, spec, spec), out_specs=spec,
    )
    return fn(q, k, v)


def context_parallel_attention(
    q: jnp.ndarray,  # [B, S, H, D] full arrays (sharded or to-be-sharded)
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    *,
    axis_name: str = "sequence",
    causal: bool = True,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """shard_map wrapper: shards S over `axis_name`, runs the ring.

    S must divide evenly by the axis size (pad upstream — static shapes)."""
    n = mesh.shape[axis_name]
    s = q.shape[1]
    if s % n:
        raise ValueError(f"sequence length {s} not divisible by {axis_name}={n}")
    spec = P(None, axis_name, None, None)
    fn = jax.shard_map(
        functools.partial(
            ring_attention, axis_name=axis_name, axis_size=n,
            causal=causal, scale=scale,
        ),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
    )
    put = lambda x: jax.device_put(x, NamedSharding(mesh, spec))
    return fn(put(q), put(k), put(v))

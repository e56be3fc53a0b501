"""Decode-time sequence sharding: the KV cache split over a mesh axis.

Ring attention (parallel/ring_attention.py) scales cache-FREE forwards
(training, prefill) past one device's memory. This module is the decode-side
counterpart the reference never needed (it bounds context at ~4.4k tokens,
SURVEY §5): the KV cache's TIME axis is sharded over `sequence` devices, so a
context of length T costs each device O(T/n) cache HBM and O(T/n) attention
reads per step.

Per decode step, inside shard_map:
- the new K/V row is written by the ONE device whose shard owns slot `pos`
  (a masked in-place scatter — no gather, no reshard);
- every device computes a flash-style partial over its resident shard
  (running max m, denominator l, weighted accumulator acc);
- the partials combine with two tiny collectives: `pmax` for the global max,
  `psum` for the rescaled l/acc — O(B*H*(D+2)) bytes on the ICI, independent
  of T.

Numerics are exactly online-softmax attention: identical to the single-device
cached path up to fp32 reduction order. GQA: Hkv may divide H (grouped
einsums, same convention as ring_attention).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def sharded_cache_decode_attention(
    q: jnp.ndarray,        # [B, 1, H, D] this step's queries (replicated)
    new_k: jnp.ndarray,    # [B, 1, Hkv, D] this step's key (replicated)
    new_v: jnp.ndarray,    # [B, 1, Hkv, D]
    k_shard: jnp.ndarray,  # [B, T_loc, Hkv, D] resident cache slice
    v_shard: jnp.ndarray,  # [B, T_loc, Hkv, D]
    pos: jnp.ndarray,      # [B] int32 global write slot (== #cached tokens)
    *,
    axis_name: str,
    scale: Optional[float] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One decode step against a time-sharded cache; call inside shard_map.

    Returns (out [B, 1, H, D], k_shard', v_shard'). Device i owns global
    slots [i*T_loc, (i+1)*T_loc). Attention covers slots <= pos (the new
    token attends to itself through the just-written slot).
    """
    b, t_loc, hkv, d = k_shard.shape
    h = q.shape[2]
    if h % hkv:
        raise ValueError(f"q heads {h} not a multiple of kv heads {hkv}")
    g = h // hkv
    if scale is None:
        scale = d ** -0.5
    idx = jax.lax.axis_index(axis_name)
    rows = jnp.arange(b)

    # masked owner write: out-of-range rows rewrite their clamped slot with
    # its existing value (a no-op), so exactly one device mutates per row
    local = pos - idx * t_loc
    in_range = (local >= 0) & (local < t_loc)
    li = jnp.clip(local, 0, t_loc - 1)
    mask = in_range[:, None, None]  # [B,1,1] against [B,Hkv,D]
    k_shard = k_shard.at[rows, li].set(
        jnp.where(mask, new_k[:, 0], k_shard[rows, li])
    )
    v_shard = v_shard.at[rows, li].set(
        jnp.where(mask, new_v[:, 0], v_shard[rows, li])
    )

    # flash-style partial over the resident shard
    kv_pos = idx * t_loc + jnp.arange(t_loc)  # [T_loc] global slots
    qf = q.astype(jnp.float32).reshape(b, hkv, g, d)  # S=1 squeezed
    s = jnp.einsum(
        "bhgd,bkhd->bhgk", qf, k_shard.astype(jnp.float32)
    ).reshape(b, h, t_loc) * scale
    visible = kv_pos[None, None, :] <= pos[:, None, None]
    s = jnp.where(visible, s, _NEG_INF)

    m = jnp.max(s, axis=-1)  # [B, H]
    p = jnp.exp(s - m[..., None])
    p = jnp.where(visible, p, 0.0)  # rows with zero visible keys stay 0
    l = jnp.sum(p, axis=-1)  # [B, H]
    acc = jnp.einsum(
        "bhgk,bkhd->bhgd", p.reshape(b, hkv, g, t_loc),
        v_shard.astype(jnp.float32),
    ).reshape(b, h, d)

    # combine partials: global max, then rescaled sums (O(B*H*D) collectives)
    m_g = jax.lax.pmax(m, axis_name)
    corr = jnp.exp(m - m_g)
    l_g = jax.lax.psum(l * corr, axis_name)
    acc_g = jax.lax.psum(acc * corr[..., None], axis_name)
    l_safe = jnp.where(l_g == 0.0, 1.0, l_g)
    out = (acc_g / l_safe[..., None]).astype(q.dtype)
    return out[:, None].reshape(b, 1, h, d), k_shard, v_shard


def sharded_cache_decode_step(
    q: jnp.ndarray,      # [B, 1, H, D] global (inside jit, ambient mesh)
    new_k: jnp.ndarray,  # [B, 1, Hkv, D]
    new_v: jnp.ndarray,
    k_cache: jnp.ndarray,  # [B, T, Hkv, D] time-sharded over `axis_name`
    v_cache: jnp.ndarray,
    pos: jnp.ndarray,    # [B]
    *,
    axis_name: str = "sequence",
    scale: Optional[float] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Trace-time wrapper over the AMBIENT mesh (like ring_self_attention):
    shard_map splits the cache's T axis, runs the step, returns the output
    plus the updated (still T-sharded) cache buffers."""
    mesh = jax.sharding.get_abstract_mesh()
    if axis_name not in mesh.shape:
        raise ValueError(
            f"sequence axis {axis_name!r} not in the active mesh {mesh.shape}"
        )
    n = mesh.shape[axis_name]
    t = k_cache.shape[1]
    if t % n:
        raise ValueError(f"cache length {t} not divisible by {axis_name}={n}")
    rep = P(None, None, None, None)
    sh = P(None, axis_name, None, None)
    fn = jax.shard_map(
        functools.partial(
            sharded_cache_decode_attention, axis_name=axis_name, scale=scale
        ),
        in_specs=(rep, rep, rep, sh, sh, P(None)),
        out_specs=(rep, sh, sh),
    )
    return fn(q, new_k, new_v, k_cache, v_cache, pos)

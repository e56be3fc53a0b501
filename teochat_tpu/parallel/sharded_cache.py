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


def _partial_softmax_attention(
    q: jnp.ndarray,        # [B, S, H, D] queries (replicated)
    k_shard: jnp.ndarray,  # [B, T_loc, Hkv, D] resident cache slice
    v_shard: jnp.ndarray,  # [B, T_loc, Hkv, D]
    visible: jnp.ndarray,  # [B, S, T_loc] bool attention visibility
    *,
    axis_name: str,
    scale: float,
) -> jnp.ndarray:
    """Flash-style partial over the resident shard + two-collective combine.

    Shared by the write+attend decode step and the read-only path. Returns
    out [B, S, H, D]."""
    b, t_loc, hkv, d = k_shard.shape
    s_len, h = q.shape[1], q.shape[2]
    g = h // hkv

    qf = q.astype(jnp.float32).reshape(b, s_len, hkv, g, d)
    s = jnp.einsum(
        "bsngd,bknd->bsngk", qf, k_shard.astype(jnp.float32)
    ).reshape(b, s_len, h, t_loc) * scale
    vis = visible[:, :, None, :]  # [B, S, 1, T_loc] across heads
    s = jnp.where(vis, s, _NEG_INF)

    m = jnp.max(s, axis=-1)  # [B, S, H]
    p = jnp.exp(s - m[..., None])
    p = jnp.where(vis, p, 0.0)  # rows with zero visible keys stay 0
    l = jnp.sum(p, axis=-1)  # [B, S, H]
    acc = jnp.einsum(
        "bsngk,bknd->bsngd", p.reshape(b, s_len, hkv, g, t_loc),
        v_shard.astype(jnp.float32),
    ).reshape(b, s_len, h, d)

    # combine partials: global max, then rescaled sums (O(B*S*H*D) on ICI)
    m_g = jax.lax.pmax(m, axis_name)
    corr = jnp.exp(m - m_g)
    l_g = jax.lax.psum(l * corr, axis_name)
    acc_g = jax.lax.psum(acc * corr[..., None], axis_name)
    l_safe = jnp.where(l_g == 0.0, 1.0, l_g)
    return (acc_g / l_safe[..., None]).astype(q.dtype)


def sharded_cache_attention(
    q: jnp.ndarray,        # [B, S, H, D] queries (replicated)
    k_shard: jnp.ndarray,  # [B, T_loc, Hkv, D]
    v_shard: jnp.ndarray,  # [B, T_loc, Hkv, D]
    q_slots: jnp.ndarray,  # [B, S] global cache slot of each query
    kv_mask_shard,         # [B, T_loc] validity or None
    *,
    axis_name: str,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """READ-ONLY attention over a time-sharded cache; call inside shard_map.

    The new token's K/V must already be scattered into the cache (the model's
    decode path writes first, exactly like the unsharded branch —
    models/llama.py); queries see slots <= their own q_slot, intersected with
    kv_mask. S is general: 1 for plain decode, k+1 for speculative verify
    blocks. Semantics match the unsharded masked-dot-product decode branch up
    to fp32 reduction order."""
    b, t_loc, hkv, d = k_shard.shape
    h = q.shape[2]
    if h % hkv:
        raise ValueError(f"q heads {h} not a multiple of kv heads {hkv}")
    if scale is None:
        scale = d ** -0.5
    idx = jax.lax.axis_index(axis_name)
    kv_pos = idx * t_loc + jnp.arange(t_loc)  # [T_loc] global slots
    visible = kv_pos[None, None, :] <= q_slots[:, :, None]  # [B, S, T_loc]
    if kv_mask_shard is not None:
        visible = visible & kv_mask_shard[:, None, :]
    return _partial_softmax_attention(
        q, k_shard, v_shard, visible, axis_name=axis_name, scale=scale
    )


def sharded_cache_attention_step(
    q: jnp.ndarray,        # [B, S, H, D] global (inside jit, ambient mesh)
    k_cache: jnp.ndarray,  # [B, T, Hkv, D] time-sharded over `axis_name`
    v_cache: jnp.ndarray,
    q_slots: jnp.ndarray,  # [B, S]
    kv_mask,               # [B, T] or None
    *,
    axis_name: str = "sequence",
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Trace-time wrapper over the AMBIENT mesh for the read-only attention.

    This is what models/llama.py's decode branch calls when
    LlamaConfig.cache_sequence_axis is set: writes stay GSPMD scatters on the
    stacked buffers; only the attention read runs under shard_map."""
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
    mask_spec = P(None, axis_name)
    if kv_mask is None:
        fn = jax.shard_map(
            functools.partial(
                sharded_cache_attention, axis_name=axis_name, scale=scale,
            ),
            in_specs=(rep, sh, sh, P(None, None), None),
            out_specs=rep,
        )
        return fn(q, k_cache, v_cache, q_slots, None)
    fn = jax.shard_map(
        functools.partial(
            sharded_cache_attention, axis_name=axis_name, scale=scale,
        ),
        in_specs=(rep, sh, sh, P(None, None), mask_spec),
        out_specs=rep,
    )
    return fn(q, k_cache, v_cache, q_slots, kv_mask)


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

    # flash-style partial over the resident shard + combine (shared helper)
    kv_pos = idx * t_loc + jnp.arange(t_loc)  # [T_loc] global slots
    visible = kv_pos[None, None, :] <= pos[:, None, None]  # [B, 1, T_loc]
    out = _partial_softmax_attention(
        q, k_shard, v_shard, visible, axis_name=axis_name, scale=scale
    )
    return out, k_shard, v_shard


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

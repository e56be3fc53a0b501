"""Pallas flash-attention (forward) for TPU.

Replaces the reference's Triton flash-attention kernel
(videollava/model/language_model/mpt/flash_attn_triton.py, SURVEY §2 M10) with
a TPU-native tiled online-softmax kernel:

- grid (batch, heads, q_tiles, kv_tiles); kv is the sequential ("arbitrary")
  reduction axis, batch/heads/q are parallel across megacores;
- running max/denominator/accumulator live in fp32 VMEM scratch that persists
  across kv tiles of one q tile;
- causal masking at two levels: whole kv tiles above the diagonal are skipped
  (no matmul issued), the diagonal tile masks per-element;
- QK^T and P@V hit the MXU in the input dtype with fp32 accumulation.

Used for prefill self-attention (decoder sequences >= 256, head_dim 128).
Decode steps and the 257-token ViT attention stay on the fused XLA path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _flash_kernel(
    q_ref,  # [1, 1, block_q, head_dim]
    k_ref,  # [1, 1, block_k, head_dim]
    v_ref,  # [1, 1, block_k, head_dim]
    o_ref,  # [1, 1, block_q, head_dim]
    m_scratch,  # [block_q, STATS_LANES] fp32
    l_scratch,  # [block_q, STATS_LANES] fp32
    acc_scratch,  # [block_q, head_dim] fp32
    *,
    causal: bool,
    scale: float,
    block_q: int,
    block_k: int,
    kv_len: int,
):
    q_idx = pl.program_id(2)
    kv_idx = pl.program_id(3)
    num_kv = pl.num_programs(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    if causal:
        # run iff the tile's first kv position <= the tile's last q position
        should_run = (kv_idx * block_k) <= (q_idx * block_q + block_q - 1)
    else:
        should_run = True

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]  # [block_q, d]
        k = k_ref[0, 0]  # [block_k, d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [block_q, block_k]
        s = s * scale

        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            mask = (q_idx * block_q + row) >= (kv_idx * block_k + col)
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        m_prev = m_scratch[...]  # [block_q, lanes]
        l_prev = l_scratch[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)  # [block_q, 1]
        m_next = jnp.maximum(m_prev, m_curr)  # broadcast over lanes
        alpha = jnp.exp(m_prev - m_next)  # [block_q, lanes]
        p = jnp.exp(s - m_next[:, :1])  # [block_q, block_k]
        l_corr = alpha * l_prev
        l_next = l_corr + jnp.sum(p, axis=1, keepdims=True)

        m_scratch[...] = m_next
        l_scratch[...] = l_next

        v = v_ref[0, 0]  # [block_k, d]
        o_curr = jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )  # [block_q, d]
        acc_scratch[...] = acc_scratch[...] * alpha[:, :1] + o_curr

    @pl.when(kv_idx == num_kv - 1)
    def _store():
        l = l_scratch[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("causal", "scale", "block_q", "block_k", "interpret")
)
def _flash_bhsd(
    q: jnp.ndarray,  # [B, H, S, D]
    k: jnp.ndarray,  # [B, H, T, D]
    v: jnp.ndarray,
    *,
    causal: bool,
    scale: float,
    block_q: int,
    block_k: int,
    interpret: bool = False,
) -> jnp.ndarray:
    b, h, s, d = q.shape
    t = k.shape[2]
    grid = (b, h, pl.cdiv(s, block_q), pl.cdiv(t, block_k))

    kernel = functools.partial(
        _flash_kernel,
        causal=causal,
        scale=scale,
        block_q=block_q,
        block_k=block_k,
        kv_len=t,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)
            ),
            pl.BlockSpec(
                (1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0)
            ),
            pl.BlockSpec(
                (1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s * t * d // (2 if causal else 1),
            bytes_accessed=(2 * b * h * s * d + 2 * b * h * t * d) * q.dtype.itemsize,
            transcendentals=b * h * s * t,
        ),
        interpret=interpret,
    )(q, k, v)


def flash_attention(
    q: jnp.ndarray,  # [B, S, H, D]
    k: jnp.ndarray,  # [B, T, Hkv, D]
    v: jnp.ndarray,
    *,
    mask: Optional[jnp.ndarray] = None,
    causal: bool = True,
    scale: Optional[float] = None,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """[B,S,H,D] layout wrapper. GQA kv heads are expanded to full heads.

    `mask` is not supported in-kernel; right-padded causal prefill needs none
    (padded keys sit after every valid query, so causality masks them — see
    generation.generate_tokens). Callers with other masks use the XLA path.
    """
    if mask is not None:
        raise NotImplementedError("flash_attention: use the XLA path for masked attention")
    b, s, h, d = q.shape
    t = k.shape[1]
    if scale is None:
        scale = d ** -0.5
    n_rep = h // k.shape[2]
    if n_rep > 1:
        from teochat_tpu.ops.attention import _repeat_kv

        k = _repeat_kv(k, n_rep)
        v = _repeat_kv(v, n_rep)

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    bq = min(block_q, s)
    bk = min(block_k, t)
    out = _flash_bhsd(
        qt, kt, vt, causal=causal, scale=scale, block_q=bq, block_k=bk,
        interpret=interpret,
    )
    return out.transpose(0, 2, 1, 3)

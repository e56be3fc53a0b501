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
    *refs,
    causal: bool,
    scale: float,
    block_q: int,
    block_k: int,
    kv_len: int,
    has_bias_k: bool = False,
):
    # refs: q, k, v, [bias_k], o, m_scratch, l_scratch, acc_scratch.
    # bias_k is an OPTIONAL [1, block_k] fp32 tile of per-key additive bias
    # (ALiBi for the MPT backend — reference flash_attn_triton.py supports a
    # full bias tensor; the MPT form is key-separable so a [H, T] table
    # suffices and costs one broadcast add per tile).
    if has_bias_k:
        q_ref, k_ref, v_ref, bias_ref, o_ref = refs[:5]
    else:
        q_ref, k_ref, v_ref, o_ref = refs[:4]
        bias_ref = None
    m_scratch, l_scratch, acc_scratch = refs[-3:]
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
        if bias_ref is not None:
            s = s + bias_ref[...].astype(jnp.float32)  # [1, block_k] broadcast

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
    k: jnp.ndarray,  # [B, Hkv, T, D]; GQA via index map (no expansion)
    v: jnp.ndarray,
    bias_k: Optional[jnp.ndarray] = None,  # [H, T] per-key additive bias
    *,
    causal: bool,
    scale: float,
    block_q: int,
    block_k: int,
    interpret: bool = False,
) -> jnp.ndarray:
    b, h, s, d = q.shape
    t = k.shape[2]
    # GQA: query head hi reads kv head hi // g through the BlockSpec index
    # map — the shared kv tile is fetched once per group from HBM, never
    # materialized h/hkv times (what _repeat_kv would cost in bandwidth)
    g = h // k.shape[1]
    grid = (b, h, pl.cdiv(s, block_q), pl.cdiv(t, block_k))

    kernel = functools.partial(
        _flash_kernel,
        causal=causal,
        scale=scale,
        block_q=block_q,
        block_k=block_k,
        kv_len=t,
        has_bias_k=bias_k is not None,
    )
    in_specs = [
        pl.BlockSpec(
            (1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)
        ),
        pl.BlockSpec(
            (1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi // g, ki, 0)
        ),
        pl.BlockSpec(
            (1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi // g, ki, 0)
        ),
    ]
    args = [q, k, v]
    if bias_k is not None:
        in_specs.append(
            pl.BlockSpec((1, block_k), lambda bi, hi, qi, ki: (hi, ki))
        )
        args.append(bias_k.astype(jnp.float32))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=in_specs,
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
            bytes_accessed=(2 * b * h * s * d + 2 * b * k.shape[1] * t * d)
            * q.dtype.itemsize,
            transcendentals=b * h * s * t,
        ),
        interpret=interpret,
    )(*args)


def flash_attention(
    q: jnp.ndarray,  # [B, S, H, D]
    k: jnp.ndarray,  # [B, T, Hkv, D]
    v: jnp.ndarray,
    *,
    mask: Optional[jnp.ndarray] = None,
    bias_k: Optional[jnp.ndarray] = None,  # [H, T] per-key additive bias
    causal: bool = True,
    scale: Optional[float] = None,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """[B,S,H,D] layout wrapper; GQA kv heads shared via BlockSpec index maps.

    `bias_k` is a key-separable additive bias table (ALiBi for the MPT
    backend, models/mpt.py — the reference's Triton kernel takes a full
    [B,H,S,T] bias, flash_attn_triton.py:60-90; ALiBi is row-shift invariant
    so the key-position form suffices and costs one [1, block_k] add per
    tile). `mask` is not supported in-kernel; right-padded causal prefill
    needs none (padded keys sit after every valid query, so causality masks
    them — see generation.generate_tokens). Callers with other masks use the
    XLA path.
    """
    if mask is not None:
        raise NotImplementedError("flash_attention: use the XLA path for masked attention")
    b, s, h, d = q.shape
    t = k.shape[1]
    if scale is None:
        scale = d ** -0.5
    if h % k.shape[2]:
        raise ValueError(f"q heads {h} not a multiple of kv heads {k.shape[2]}")
    if bias_k is not None and bias_k.shape != (h, t):
        raise ValueError(f"bias_k shape {bias_k.shape} != (H={h}, T={t})")

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    bq = min(block_q, s)
    bk = min(block_k, t)
    out = _flash_bhsd(
        qt, kt, vt, bias_k, causal=causal, scale=scale, block_q=bq, block_k=bk,
        interpret=interpret,
    )
    return out.transpose(0, 2, 1, 3)


# ---------------------------------------------------------------- backward
#
# custom_vjp flash attention for training (the reference trains through its
# Triton kernel's fwd+bwd, flash_attn_triton.py:306-399). Forward additionally
# saves per-row softmax stats (m = running max, l = denominator); backward runs
# two kernels with opposite iteration orders:
#   dKV: for each kv tile, sweep q tiles, accumulating dk/dv in VMEM scratch;
#   dQ:  for each q tile, sweep kv tiles, accumulating dq.
# di = rowsum(o * do) is precomputed once outside both kernels.


def _flash_fwd_res_kernel(*refs, causal, scale, block_q, block_k,
                          has_bias_k=False):
    # refs: q, k, v, [bias_k], o, m_out, l_out + scratches m, l, acc
    if has_bias_k:
        q_ref, k_ref, v_ref, bias_ref, o_ref, m_out, l_out = refs[:7]
    else:
        q_ref, k_ref, v_ref, o_ref, m_out, l_out = refs[:6]
        bias_ref = None
    m_scratch, l_scratch, acc_scratch = refs[-3:]
    q_idx = pl.program_id(2)
    kv_idx = pl.program_id(3)
    num_kv = pl.num_programs(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    should_run = True
    if causal:
        should_run = (kv_idx * block_k) <= (q_idx * block_q + block_q - 1)

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if bias_ref is not None:
            s = s + bias_ref[...].astype(jnp.float32)  # [1, block_k] broadcast
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            mask = (q_idx * block_q + row) >= (kv_idx * block_k + col)
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
        m_prev = m_scratch[...]
        l_prev = l_scratch[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scratch[...] = m_next
        l_scratch[...] = l_next
        v = v_ref[0, 0]
        o_curr = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        acc_scratch[...] = acc_scratch[...] * alpha[:, :1] + o_curr

    @pl.when(kv_idx == num_kv - 1)
    def _store():
        l = l_scratch[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)
        # stats padded to 128 lanes (TPU block layout wants (8,128) tiles)
        m_out[0, 0] = m_scratch[...]
        l_out[0, 0] = l_scratch[...]


def _flash_fwd_with_residuals(q, k, v, bias_k=None, *, causal, scale,
                              block_q, block_k, interpret=False):
    b, h, s, d = q.shape
    t = k.shape[2]
    g = h // k.shape[1]  # GQA group size (k/v stay [B, Hkv, T, D])
    grid = (b, h, pl.cdiv(s, block_q), pl.cdiv(t, block_k))
    kernel = functools.partial(
        _flash_fwd_res_kernel, causal=causal, scale=scale,
        block_q=block_q, block_k=block_k, has_bias_k=bias_k is not None,
    )
    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi // g, ki, 0)),
        pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi // g, ki, 0)),
    ]
    args = [q, k, v]
    if bias_k is not None:
        in_specs.append(pl.BlockSpec((1, block_k), lambda bi, hi, qi, ki: (hi, ki)))
        args.append(bias_k.astype(jnp.float32))
    o, m, l = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((b, h, s, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, h, s, 128), jnp.float32),
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 128), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 128), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)
    return o, m, l


def _bwd_dkv_kernel(*refs, causal, scale, block_q, block_k, num_q_tiles,
                    has_bias_k=False):
    # refs: q, k, v, do, m, l, di, [bias_k], dk, dv + scratches dk, dv.
    # grid axis 3 enumerates (group_member, q_tile) pairs: t = g_i*NQ + q_i.
    # dk/dv for one kv head accumulate over ALL q heads in its group — the
    # GQA gradient sum happens in the same VMEM scratch that already sums
    # over q tiles, so no post-kernel reduction pass is needed.
    if has_bias_k:
        (q_ref, k_ref, v_ref, do_ref, m_ref, l_ref, di_ref, bias_ref,
         dk_ref, dv_ref) = refs[:10]
    else:
        (q_ref, k_ref, v_ref, do_ref, m_ref, l_ref, di_ref,
         dk_ref, dv_ref) = refs[:9]
        bias_ref = None
    dk_scratch, dv_scratch = refs[-2:]
    kv_idx = pl.program_id(2)
    t_idx = pl.program_id(3)
    total = pl.num_programs(3)
    q_idx = t_idx % num_q_tiles

    @pl.when(t_idx == 0)
    def _init():
        dk_scratch[...] = jnp.zeros_like(dk_scratch)
        dv_scratch[...] = jnp.zeros_like(dv_scratch)

    should_run = True
    if causal:
        # q tile contributes iff its last row >= kv tile's first row
        should_run = (q_idx * block_q + block_q - 1) >= (kv_idx * block_k)

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        m = m_ref[0, 0][:, :1]   # [block_q, 1] (lane-padded stats)
        l = l_ref[0, 0][:, :1]
        di = di_ref[0, 0][:, :1]

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if bias_ref is not None:
            s = s + bias_ref[...].astype(jnp.float32)
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            mask = (q_idx * block_q + row) >= (kv_idx * block_k + col)
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        p = jnp.exp(s - m) * l_inv  # [block_q, block_k] softmax probs
        # dV += P^T @ dO
        dv_scratch[...] += jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        # dP = dO @ V^T ; dS = P * (dP - di)
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - di)
        # dK += dS^T @ Q * scale
        dk_scratch[...] += jax.lax.dot_general(
            ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    @pl.when(t_idx == total - 1)
    def _store():
        dk_ref[0, 0] = dk_scratch[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scratch[...].astype(dv_ref.dtype)


def _bwd_dq_kernel(*refs, causal, scale, block_q, block_k, has_bias_k=False):
    # refs: q, k, v, do, m, l, di, [bias_k], dq + scratch dq
    if has_bias_k:
        (q_ref, k_ref, v_ref, do_ref, m_ref, l_ref, di_ref, bias_ref,
         dq_ref) = refs[:9]
    else:
        q_ref, k_ref, v_ref, do_ref, m_ref, l_ref, di_ref, dq_ref = refs[:8]
        bias_ref = None
    dq_scratch = refs[-1]
    q_idx = pl.program_id(2)
    kv_idx = pl.program_id(3)
    num_kv = pl.num_programs(3)

    @pl.when(kv_idx == 0)
    def _init():
        dq_scratch[...] = jnp.zeros_like(dq_scratch)

    should_run = True
    if causal:
        should_run = (kv_idx * block_k) <= (q_idx * block_q + block_q - 1)

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        m = m_ref[0, 0][:, :1]
        l = l_ref[0, 0][:, :1]
        di = di_ref[0, 0][:, :1]

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if bias_ref is not None:
            s = s + bias_ref[...].astype(jnp.float32)
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            mask = (q_idx * block_q + row) >= (kv_idx * block_k + col)
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        p = jnp.exp(s - m) * l_inv
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - di)
        dq_scratch[...] += jax.lax.dot(
            ds, k.astype(jnp.float32), preferred_element_type=jnp.float32
        ) * scale

    @pl.when(kv_idx == num_kv - 1)
    def _store():
        dq_ref[0, 0] = dq_scratch[...].astype(dq_ref.dtype)


def _flash_bwd(q, k, v, o, m, l, do, bias_k=None, *, causal, scale,
               block_q, block_k, interpret=False):
    b, h, s, d = q.shape
    t = k.shape[2]
    hkv = k.shape[1]
    g = h // hkv  # GQA group size
    nq = pl.cdiv(s, block_q)
    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)  # [B,H,S]
    di = jnp.broadcast_to(di[..., None], di.shape + (128,))
    has_bias = bias_k is not None
    if has_bias:
        bias_k = bias_k.astype(jnp.float32)

    # dKV grid: (b, KV head, kv tile, group*q tiles) — axis 3 sweeps every
    # (q head in group, q tile) pair sequentially so the per-kv-head scratch
    # accumulates the full GQA gradient sum
    q_spec = pl.BlockSpec(
        (1, 1, block_q, d), lambda bi, hk, ki, ti: (bi, hk * g + ti // nq, ti % nq, 0)
    )
    kv_spec = pl.BlockSpec((1, 1, block_k, d), lambda bi, hk, ki, ti: (bi, hk, ki, 0))
    row_spec = pl.BlockSpec(
        (1, 1, block_q, 128), lambda bi, hk, ki, ti: (bi, hk * g + ti // nq, ti % nq, 0)
    )
    dkv_in_specs = [q_spec, kv_spec, kv_spec, q_spec, row_spec, row_spec, row_spec]
    dkv_args = [q, k, v, do, m, l, di]
    if has_bias:
        # bias row follows the sweeping q head hi = hk*g + ti//nq; kv tile ki
        dkv_in_specs.append(
            pl.BlockSpec((1, block_k), lambda bi, hk, ki, ti: (hk * g + ti // nq, ki))
        )
        dkv_args.append(bias_k)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, causal=causal, scale=scale,
                          block_q=block_q, block_k=block_k, num_q_tiles=nq,
                          has_bias_k=has_bias),
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        grid=(b, hkv, pl.cdiv(t, block_k), g * nq),
        in_specs=dkv_in_specs,
        out_specs=(
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hk, ki, ti: (bi, hk, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hk, ki, ti: (bi, hk, ki, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*dkv_args)

    q_spec2 = pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0))
    kv_spec2 = pl.BlockSpec(
        (1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi // g, ki, 0)
    )
    row_spec2 = pl.BlockSpec((1, 1, block_q, 128), lambda bi, hi, qi, ki: (bi, hi, qi, 0))
    dq_in_specs = [q_spec2, kv_spec2, kv_spec2, q_spec2, row_spec2, row_spec2, row_spec2]
    dq_args = [q, k, v, do, m, l, di]
    if has_bias:
        dq_in_specs.append(pl.BlockSpec((1, block_k), lambda bi, hi, qi, ki: (hi, ki)))
        dq_args.append(bias_k)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, causal=causal, scale=scale,
                          block_q=block_q, block_k=block_k, has_bias_k=has_bias),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(b, h, pl.cdiv(s, block_q), pl.cdiv(t, block_k)),
        in_specs=dq_in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)
        ),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*dq_args)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def flash_attention_trainable(q, k, v, causal=True, scale=None,
                              block_q=128, block_k=128, interpret=False,
                              bias_k=None):
    """Differentiable flash attention, [B, S, H, D] layout; GQA supported
    (k/v [B, T, Hkv, D] with Hkv dividing H — kv tiles are shared through
    BlockSpec index maps, and dK/dV accumulate the per-group gradient sum
    inside the dKV kernel's scratch sweep).

    `bias_k` [H, T] is a key-separable additive bias (ALiBi for MPT training,
    matching the reference Triton kernel's bias support,
    flash_attn_triton.py:306-399). It is treated as a CONSTANT table: its
    cotangent is defined as zero — ALiBi slopes are never learned, and the
    reference kernel likewise produces no dbias. Do NOT route a learned bias
    through this function.

    Padding note: with right-padded batches and causal=True no explicit mask
    is needed — padded keys sit after every valid query and padded queries'
    gradients arrive as zeros through the loss mask.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    qt, kt, vt = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
    o, _, _ = _flash_fwd_with_residuals(
        qt, kt, vt, bias_k, causal=causal, scale=scale,
        block_q=min(block_q, q.shape[1]), block_k=min(block_k, k.shape[1]),
        interpret=interpret,
    )
    return o.transpose(0, 2, 1, 3)


def _fa_fwd(q, k, v, causal, scale, block_q, block_k, interpret, bias_k=None):
    if scale is None:
        scale = q.shape[-1] ** -0.5
    qt, kt, vt = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
    bq, bk = min(block_q, q.shape[1]), min(block_k, k.shape[1])
    o, m, l = _flash_fwd_with_residuals(
        qt, kt, vt, bias_k, causal=causal, scale=scale, block_q=bq, block_k=bk,
        interpret=interpret,
    )
    return o.transpose(0, 2, 1, 3), (qt, kt, vt, o, m, l, bias_k)


def _fa_bwd(causal, scale, block_q, block_k, interpret, res, g):
    qt, kt, vt, o, m, l, bias_k = res
    if scale is None:
        scale = qt.shape[-1] ** -0.5
    bq, bk = min(block_q, qt.shape[2]), min(block_k, kt.shape[2])
    do = g.transpose(0, 2, 1, 3)
    dq, dk, dv = _flash_bwd(
        qt, kt, vt, o, m, l, do, bias_k, causal=causal, scale=scale,
        block_q=bq, block_k=bk, interpret=interpret,
    )
    dbias = None if bias_k is None else jnp.zeros_like(bias_k)
    return (
        dq.transpose(0, 2, 1, 3),
        dk.transpose(0, 2, 1, 3),
        dv.transpose(0, 2, 1, 3),
        dbias,
    )


flash_attention_trainable.defvjp(_fa_fwd, _fa_bwd)


def flash_attention_trainable_padded(q, k, v, causal=True, scale=None,
                                     block_q=128, block_k=128,
                                     interpret=False, bias_k=None):
    """flash_attention_trainable for ANY sequence length (causal only).

    Pads S/T up to the tile size and slices the output back; safe because
    zero-padded keys sit at positions past every real query, so causal
    masking hides them (the same argument that makes right-padded batches
    mask-free), and padded queries' rows are sliced away — their gradients
    are exactly zero through the slice. Autodiff of the pad/slice wrappers
    is automatic; the custom-vjp kernel runs on the padded shapes. `bias_k`
    [H, T] is zero-padded along T (padded keys are causally masked anyway).
    """
    if not causal:
        raise ValueError(
            "padded flash attention requires causal=True (zero-padded keys "
            "would be attended under a non-causal mask); use the XLA path"
        )
    if scale is None:
        scale = q.shape[-1] ** -0.5  # pre-pad head_dim (unchanged by padding)
    b, s, h, d = q.shape
    t = k.shape[1]
    sp, tp = -s % block_q, -t % block_k
    if not (sp or tp):
        return flash_attention_trainable(
            q, k, v, causal, scale, block_q, block_k, interpret, bias_k
        )
    qp = jnp.pad(q, ((0, 0), (0, sp), (0, 0), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, tp), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, tp), (0, 0), (0, 0)))
    bp = None if bias_k is None else jnp.pad(bias_k, ((0, 0), (0, tp)))
    out = flash_attention_trainable(
        qp, kp, vp, causal, scale, block_q, block_k, interpret, bp
    )
    return out[:, :s]

"""Pallas fused int4-dequant matmul (w4a16).

The XLA-level unpack (bit ops + reshape) does not fuse into the matmul — it
materializes the full bf16 weight matrix every call, which at decode time means
reading 4x the bytes int4 should read. This kernel keeps the weights packed in
HBM and unpacks nibbles in VMEM right before the MXU:

packing: W [K, N] int4 -> packed [K/2, N] uint8 where the LOW nibble holds
rows [0, K/2) ("lo half") and the HIGH nibble rows [K/2, K) ("hi half"),
each nibble storing value+8. The kernel then computes

    acc += x_lo @ (packed & 0xF - 8)  +  x_hi @ (packed >> 4 - 8)

with two x BlockSpecs pointing at the two halves of the K axis — no interleave
reshuffle needed in-kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_int4(w_q: jnp.ndarray) -> jnp.ndarray:
    """[K, N] int values in [-8, 7] -> packed uint8 [K/2, N] (split-halves)."""
    k = w_q.shape[-2]
    assert k % 2 == 0
    lo = (w_q[..., : k // 2, :] + 8).astype(jnp.uint8)
    hi = (w_q[..., k // 2 :, :] + 8).astype(jnp.uint8)
    return lo | (hi << 4)


def unpack_int4_halves(packed: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """packed uint8 [..., K/2, N] -> [..., K, N] values (lo half then hi half)."""
    lo = (packed & 0xF).astype(jnp.int8) - 8
    hi = (packed >> 4).astype(jnp.int8) - 8
    return jnp.concatenate([lo, hi], axis=-2).astype(dtype)


def _int4_kernel(x_lo_ref, x_hi_ref, packed_ref, scale_ref, o_ref, acc_ref,
                 *, n_k: int):
    k_idx = pl.program_id(1)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # NOTE: Mosaic crashes on uint8 bit-ops; widen to int32 first (the HBM
    # read is still one byte per weight — widening happens in VMEM).
    p = packed_ref[...].astype(jnp.int32)
    lo = ((p & 0xF) - 8).astype(x_lo_ref.dtype)
    hi = ((p >> 4) - 8).astype(x_lo_ref.dtype)
    acc_ref[...] += jax.lax.dot(
        x_lo_ref[...], lo, preferred_element_type=jnp.float32
    )
    acc_ref[...] += jax.lax.dot(
        x_hi_ref[...], hi, preferred_element_type=jnp.float32
    )

    @pl.when(k_idx == n_k - 1)
    def _store():
        o_ref[...] = (acc_ref[...] * scale_ref[...].astype(jnp.float32)).astype(
            o_ref.dtype
        )


@functools.partial(jax.jit, static_argnames=("block_n", "block_k2", "interpret"))
def int4_matmul(
    x: jnp.ndarray,  # [M, K] bf16/f32
    packed: jnp.ndarray,  # [K/2, N] uint8 (split-halves packing)
    scale: jnp.ndarray,  # [N] f32
    *,
    block_n: int = 512,
    block_k2: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = (x @ unpack(packed)) * scale, reading only packed bytes from HBM."""
    m, k = x.shape
    k2, n = packed.shape
    assert k == 2 * k2, (k, k2)

    # pad M to the fp32/bf16 sublane minimum so blocks tile
    m_pad = max(8, ((m + 7) // 8) * 8)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    bn = min(block_n, n)
    bk2 = min(block_k2, k2)
    n_k = pl.cdiv(k2, bk2)
    grid = (pl.cdiv(n, bn), n_k)
    k2_blocks = k2 // bk2  # offset (in blocks) of the hi half of x

    out = pl.pallas_call(
        functools.partial(_int4_kernel, n_k=n_k),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        grid=grid,
        in_specs=[
            # x lo half: block (m, bk2) at k-block k
            pl.BlockSpec((m_pad, bk2), lambda ni, ki: (0, ki)),
            # x hi half: same block size, offset by k2 in the K axis
            pl.BlockSpec(
                (m_pad, bk2), lambda ni, ki, _o=k2_blocks: (0, ki + _o)
            ),
            pl.BlockSpec((bk2, bn), lambda ni, ki: (ki, ni)),
            pl.BlockSpec((1, bn), lambda ni, ki: (0, ni)),
        ],
        out_specs=pl.BlockSpec((m_pad, bn), lambda ni, ki: (0, ni)),
        scratch_shapes=[pltpu.VMEM((m_pad, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n,
            bytes_accessed=k2 * n + m_pad * k * x.dtype.itemsize + m_pad * n * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, x, packed, scale.reshape(1, n))
    return out[:m]

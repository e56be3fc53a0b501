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


# ------------------------------------------------------------- tiled layout
#
# The flat [K/2, N] layout makes each (bk2, bn) block a strided HBM read (rows
# of bn bytes at stride N). The tiled layout stores each bn-wide column band
# contiguously — packed_tiles [N/bn, K/2, bn] — so a grid cell's DMA is one
# dense region and streams at full HBM rate.

TILE_BN = 512


def pack_int4_tiled(w_q: jnp.ndarray, bn: int = TILE_BN) -> jnp.ndarray:
    """[K, N] int4 values -> [ceil(N/bn), K/2, bn] uint8 (N zero-padded)."""
    packed = pack_int4(w_q)  # [K/2, N]
    k2, n = packed.shape
    n_pad = ((n + bn - 1) // bn) * bn
    if n_pad != n:
        packed = jnp.pad(packed, ((0, 0), (0, n_pad - n)))
    return packed.reshape(k2, n_pad // bn, bn).transpose(1, 0, 2)


def pack_int4_tiled_i8(w_q: jnp.ndarray, bn: int = TILE_BN) -> jnp.ndarray:
    """[K, N] int4 values -> [ceil(N/bn), K/2, bn] int8 v3 bytes (N padded).

    Pad value 0 decodes as (L, H) = (-8, 0); harmless — padded output columns
    are sliced off and their scales never applied."""
    packed = pack_int4_i8(w_q)  # [K/2, N]
    k2, n = packed.shape
    n_pad = ((n + bn - 1) // bn) * bn
    if n_pad != n:
        packed = jnp.pad(packed, ((0, 0), (0, n_pad - n)))
    return packed.reshape(k2, n_pad // bn, bn).transpose(1, 0, 2)


# ----------------------------------------------------------- i8 storage (v3)
#
# The v0 byte stores both nibbles biased: u8 = (L+8) | ((H+8) << 4). Unpacking
# costs ~5 VPU ops/byte (widen, mask, shift, 2 converts) and the decode step is
# VPU-unpack-bound (TODO.md). The v3 byte stores i8 = (L+8) + 16*H — the SAME
# bits with the top bit flipped (u8 ^ 0x80 bitcast to int8) — which an int8
# MXU-feeding convert turns into bf16 DIRECTLY (no widen/mask/shift): the byte
# value itself is a valid weight for a dot against rescaled activations,
#
#     y = xa @ (L+8) + xb @ b - 8*rowsum(x_lo),
#     xb = x_hi/16 (exact in bf16),  xa = x_lo - xb  (one rounding),
#
# because xb@b = (x_hi/16)(L+8) + x_hi*H and xa@(L+8) cancels the first term.
# Only the lo-dot still needs a mask (widen+and+convert): 4 VPU ops/byte vs 5.
# Kernels dispatch on packed dtype: int8 -> v3, uint8 -> legacy v0 (so
# existing u8 artifacts and tests keep working unchanged).


def pack_int4_i8(w_q: jnp.ndarray) -> jnp.ndarray:
    """[K, N] int values in [-8, 7] -> packed int8 [K/2, N], b = (L+8) + 16*H."""
    k = w_q.shape[-2]
    assert k % 2 == 0
    lo = jnp.asarray(w_q[..., : k // 2, :], jnp.int32) + 8
    hi = jnp.asarray(w_q[..., k // 2 :, :], jnp.int32)
    return (lo + 16 * hi).astype(jnp.int8)  # range [-128, 127], exact


def unpack_int4_i8(packed: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """int8 [..., K/2, N] -> [..., K, N] values (lo half then hi half)."""
    p = packed.astype(jnp.int32)
    lo = (p & 0xF) - 8
    hi = p >> 4  # arithmetic shift = floor(b/16) = H exactly (L+8 in [0,15])
    return jnp.concatenate([lo, hi], axis=-2).astype(dtype)


def unpack_int4_any(packed: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Layout-dispatching unpack: int8 = v3 combined byte, uint8 = v0 nibbles."""
    if packed.dtype == jnp.int8:
        return unpack_int4_i8(packed, dtype)
    return unpack_int4_halves(packed, dtype)


def _split_xa_xb(x: jnp.ndarray, k2: int):
    """x [M, 2*k2] -> (xa, xb) activation halves for the v3 byte trick."""
    x_lo, x_hi = x[:, :k2], x[:, k2:]
    xb = (x_hi.astype(jnp.float32) / 16.0).astype(x.dtype)
    xa = (x_lo.astype(jnp.float32) - xb.astype(jnp.float32)).astype(x.dtype)
    return xa, xb


def _int4_tiled_kernel(x_lo_ref, x_hi_ref, packed_ref, scale_ref, o_ref,
                       acc_ref, *, n_k: int):
    k_idx = pl.program_id(1)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Nibbles store value+8. Instead of subtracting 8 per element (VPU-bound),
    # dot with the raw nibbles and correct per output row:
    #   x @ (W + 8) - 8 * rowsum(x)  ==  x @ W
    p = packed_ref[0].astype(jnp.int32)  # [bk2, bn]
    lo = (p & 0xF).astype(x_lo_ref.dtype)
    hi = (p >> 4).astype(x_lo_ref.dtype)
    x_lo = x_lo_ref[...]
    x_hi = x_hi_ref[...]
    acc_ref[...] += jax.lax.dot(x_lo, lo, preferred_element_type=jnp.float32)
    acc_ref[...] += jax.lax.dot(x_hi, hi, preferred_element_type=jnp.float32)
    corr = 8.0 * (
        jnp.sum(x_lo.astype(jnp.float32), axis=1)
        + jnp.sum(x_hi.astype(jnp.float32), axis=1)
    )  # [m_pad]
    acc_ref[...] -= corr[:, None]

    @pl.when(k_idx == n_k - 1)
    def _store():
        o_ref[0] = (acc_ref[...] * scale_ref[0, 0].astype(jnp.float32)).astype(
            o_ref.dtype
        )


def _int4_tiled_kernel_i8(xa_ref, xb_ref, packed_ref, scale_ref, o_ref,
                          acc_ref, *, n_k: int):
    k_idx = pl.program_id(1)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    b = packed_ref[0]  # [bk2, bn] int8 = (L+8) + 16*H
    byte = b.astype(xa_ref.dtype)  # one direct i8 -> bf16 convert
    lo = (b.astype(jnp.int32) & 0xF).astype(xa_ref.dtype)  # (L+8) >= 0
    xa = xa_ref[...]
    xb = xb_ref[...]
    # y = xa @ (L+8) + xb @ b - 8*rowsum(x_lo);  x_lo = xa + xb
    acc_ref[...] += jax.lax.dot(xa, lo, preferred_element_type=jnp.float32)
    acc_ref[...] += jax.lax.dot(xb, byte, preferred_element_type=jnp.float32)
    corr = 8.0 * jnp.sum(
        xa.astype(jnp.float32) + xb.astype(jnp.float32), axis=1
    )
    acc_ref[...] -= corr[:, None]

    @pl.when(k_idx == n_k - 1)
    def _store():
        o_ref[0] = (acc_ref[...] * scale_ref[0, 0].astype(jnp.float32)).astype(
            o_ref.dtype
        )


@functools.partial(jax.jit, static_argnames=("n_out", "block_k2", "interpret"))
def int4_matmul_tiled(
    x: jnp.ndarray,  # [M, K]
    packed_tiles: jnp.ndarray,  # [n_tiles, K/2, bn]
    scale: jnp.ndarray,  # [n_tiles * bn] f32 (padded)
    *,
    n_out: int,
    block_k2: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """y[:, :n_out] = (x @ unpack(packed)) * scale with dense per-tile reads.

    packed dtype selects the kernel: int8 = v3 combined-byte (fewer VPU
    unpack ops), uint8 = legacy split-nibble."""
    m, k = x.shape
    n_tiles, k2, bn = packed_tiles.shape
    assert k == 2 * k2

    m_pad = max(8, ((m + 7) // 8) * 8)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    bk2 = min(block_k2, k2)
    n_k = pl.cdiv(k2, bk2)
    k2_blocks = k2 // bk2

    v3 = packed_tiles.dtype == jnp.int8
    if v3:
        kernel = functools.partial(_int4_tiled_kernel_i8, n_k=n_k)
        xa, xb = _split_xa_xb(x, k2)
        x_args = (xa, xb)
        x_specs = [
            pl.BlockSpec((m_pad, bk2), lambda ni, ki: (0, ki)),
            pl.BlockSpec((m_pad, bk2), lambda ni, ki: (0, ki)),
        ]
    else:
        kernel = functools.partial(_int4_tiled_kernel, n_k=n_k)
        x_args = (x, x)
        x_specs = [
            pl.BlockSpec((m_pad, bk2), lambda ni, ki: (0, ki)),
            pl.BlockSpec((m_pad, bk2), lambda ni, ki, _o=k2_blocks: (0, ki + _o)),
        ]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles, m_pad, bn), x.dtype),
        grid=(n_tiles, n_k),
        in_specs=x_specs + [
            pl.BlockSpec((1, bk2, bn), lambda ni, ki: (ni, ki, 0)),
            # scale as [n_tiles, 1, bn]: the (1, bn) trailing block dims are
            # (equal-to-array, 128-divisible), satisfying the tiling rule
            pl.BlockSpec((1, 1, bn), lambda ni, ki: (ni, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, m_pad, bn), lambda ni, ki: (ni, 0, 0)),
        scratch_shapes=[pltpu.VMEM((m_pad, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n_tiles * bn,
            bytes_accessed=n_tiles * k2 * bn + m_pad * k * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*x_args, packed_tiles, scale.reshape(n_tiles, 1, bn))
    # [n_tiles, m_pad, bn] -> [m_pad, n_tiles*bn] -> slice
    y = out.transpose(1, 0, 2).reshape(m_pad, n_tiles * bn)
    return y[:m, :n_out]


# ---------------------------------------------------- layer-stacked variant
#
# Models scan/fori over stacked per-layer params. An XLA dynamic-slice of a
# stacked weight CANNOT fuse into a pallas custom call (it fuses fine into an
# XLA einsum), so slicing a layer's int4 tiles in the loop body materializes
# a full copy of that layer's weights EVERY STEP — measured at ~40% of the
# whole int4 decode step (scripts/profile_decode.py, hlo_stats:
# dynamic-slice_bitcast_fusion ~4.5 ms/step vs kernels ~5.4 ms). This variant
# takes the FULL [L, n_tiles, K/2, bn] buffer plus the layer index as a
# scalar-prefetch operand and block-indexes the layer inside the kernel: the
# DMA engine reads only the selected layer's blocks straight from HBM.


def _int4_tiled_kernel_stacked(layer_ref, x_lo_ref, x_hi_ref, packed_ref,
                               scale_ref, o_ref, acc_ref, *, n_k: int):
    del layer_ref  # consumed by the index maps
    k_idx = pl.program_id(1)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p = packed_ref[0, 0].astype(jnp.int32)  # [bk2, bn]
    lo = (p & 0xF).astype(x_lo_ref.dtype)
    hi = (p >> 4).astype(x_lo_ref.dtype)
    x_lo = x_lo_ref[...]
    x_hi = x_hi_ref[...]
    acc_ref[...] += jax.lax.dot(x_lo, lo, preferred_element_type=jnp.float32)
    acc_ref[...] += jax.lax.dot(x_hi, hi, preferred_element_type=jnp.float32)
    corr = 8.0 * (
        jnp.sum(x_lo.astype(jnp.float32), axis=1)
        + jnp.sum(x_hi.astype(jnp.float32), axis=1)
    )
    acc_ref[...] -= corr[:, None]

    @pl.when(k_idx == n_k - 1)
    def _store():
        o_ref[0] = (
            acc_ref[...] * scale_ref[0, 0, 0].astype(jnp.float32)
        ).astype(o_ref.dtype)


def _int4_tiled_kernel_stacked_i8(layer_ref, xa_ref, xb_ref, packed_ref,
                                  scale_ref, o_ref, acc_ref, *, n_k: int):
    del layer_ref  # consumed by the index maps
    k_idx = pl.program_id(1)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    b = packed_ref[0, 0]  # [bk2, bn] int8 = (L+8) + 16*H
    byte = b.astype(xa_ref.dtype)
    lo = (b.astype(jnp.int32) & 0xF).astype(xa_ref.dtype)
    xa = xa_ref[...]
    xb = xb_ref[...]
    acc_ref[...] += jax.lax.dot(xa, lo, preferred_element_type=jnp.float32)
    acc_ref[...] += jax.lax.dot(xb, byte, preferred_element_type=jnp.float32)
    corr = 8.0 * jnp.sum(
        xa.astype(jnp.float32) + xb.astype(jnp.float32), axis=1
    )
    acc_ref[...] -= corr[:, None]

    @pl.when(k_idx == n_k - 1)
    def _store():
        o_ref[0] = (
            acc_ref[...] * scale_ref[0, 0, 0].astype(jnp.float32)
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_out", "block_k2", "interpret"))
def int4_matmul_tiled_stacked(
    x: jnp.ndarray,  # [M, K]
    packed_tiles: jnp.ndarray,  # [L, n_tiles, K/2, bn]
    scale: jnp.ndarray,  # [L, n_tiles * bn] f32 (padded)
    layer,  # scalar int32
    *,
    n_out: int,
    block_k2: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """y[:, :n_out] = (x @ unpack(packed[layer])) * scale[layer].

    No XLA-level layer slice: the layer index rides a scalar-prefetch operand
    and only the selected layer's blocks are DMA'd."""
    m, k = x.shape
    n_layers, n_tiles, k2, bn = packed_tiles.shape
    assert k == 2 * k2

    m_pad = max(8, ((m + 7) // 8) * 8)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    bk2 = min(block_k2, k2)
    n_k = pl.cdiv(k2, bk2)
    k2_blocks = k2 // bk2

    def x_lo_map(ni, ki, layer_s):
        return (0, ki)

    def x_hi_map(ni, ki, layer_s, _o=k2_blocks):
        return (0, ki + _o)

    def packed_map(ni, ki, layer_s):
        return (layer_s[0], ni, ki, 0)

    def scale_map(ni, ki, layer_s):
        return (layer_s[0], ni, 0, 0)

    def out_map(ni, ki, layer_s):
        return (ni, 0, 0)

    v3 = packed_tiles.dtype == jnp.int8
    if v3:
        kernel = functools.partial(_int4_tiled_kernel_stacked_i8, n_k=n_k)
        x_args = _split_xa_xb(x, k2)  # both halves map with x_lo_map
        x_specs = [
            pl.BlockSpec((m_pad, bk2), x_lo_map),
            pl.BlockSpec((m_pad, bk2), x_lo_map),
        ]
    else:
        kernel = functools.partial(_int4_tiled_kernel_stacked, n_k=n_k)
        x_args = (x, x)
        x_specs = [
            pl.BlockSpec((m_pad, bk2), x_lo_map),
            pl.BlockSpec((m_pad, bk2), x_hi_map),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles, n_k),
        in_specs=x_specs + [
            pl.BlockSpec((1, 1, bk2, bn), packed_map),
            pl.BlockSpec((1, 1, 1, bn), scale_map),
        ],
        out_specs=pl.BlockSpec((1, m_pad, bn), out_map),
        scratch_shapes=[pltpu.VMEM((m_pad, bn), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, m_pad, bn), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n_tiles * bn,
            bytes_accessed=n_tiles * k2 * bn + m_pad * k * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        *x_args,
        packed_tiles,
        scale.reshape(n_layers, n_tiles, 1, bn),
    )
    y = out.transpose(1, 0, 2).reshape(m_pad, n_tiles * bn)
    return y[:m, :n_out]

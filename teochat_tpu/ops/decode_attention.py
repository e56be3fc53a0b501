"""Pallas flash-decode attention over the KV cache (single query per row).

Status: EXPERIMENTAL, not wired into the decode loop — kept as a documented
negative result with tests. Measured on v5e (32-layer x 32-step loops,
B=8 H=32 D=128 T=2048):

- XLA masked attention over the [B,T,H,D] cache: 13.05 ms/step uniform,
  13.12 ragged = ~658 GB/s — AT the HBM roofline. (The round-1 batched-decode
  shortfall was the layer scan re-stacking the cache, fixed in
  models/llama.py, not the attention op.)
- This kernel, head-blocked (grid B x Hkv/8 x T/256, 1 MB KV DMA per step):
  38.6 ms/step uniform — ~4.7 us/grid-step against 1.6 us of DMA, i.e.
  grid-step overhead bound, 3x off XLA.
- The ragged-length play (scalar-prefetched lengths CLAMP the KV block index
  so revisited blocks skip their copy) returned 32.5 ms vs the ~9.4 ms a true
  4.1x byte reduction implies: Mosaic did not elide the revisited-block
  copies under a prefetch-driven dynamic index map, only the @pl.when compute.

Conclusion: on this toolchain a hand kernel cannot beat XLA's fused decode
attention at uniform lengths (roofline is roofline), and the ragged win needs
copy elision that does not materialize. Revisit only with megacore-aware
block scheduling or an int8/fp8-KV in-kernel dequant (fewer bytes is the one
lever XLA cannot express for quantized caches with per-slot scales).

Numerics: fp32 online softmax (same scheme as ops/flash_attention.py), output
in the query dtype; supports GQA via query-head grouping.

Reference point: the reference's HF decode materializes full attention rows
per step (no flash decode at all); SURVEY §2 M10.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _decode_kernel(
    # scalar prefetch
    lens_ref,  # [B] int32 valid slots per row
    # blocks
    q_ref,  # [1, block_h, G, D]
    k_ref,  # [1, block_h, block_t, D]
    v_ref,  # [1, block_h, block_t, D]
    o_ref,  # [1, block_h, G, D]
    m_scratch,  # [block_h * G, 128] f32
    l_scratch,  # [block_h * G, 128] f32
    acc_scratch,  # [block_h * G, D] f32
    *,
    scale: float,
    block_t: int,
    block_h: int,
):
    b = pl.program_id(0)
    t = pl.program_id(2)
    nt = pl.num_programs(2)

    length = lens_ref[b]
    n_valid = pl.cdiv(length, block_t)  # blocks that contain live slots

    @pl.when(t == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    @pl.when(t < n_valid)
    def _run():
        rows = m_scratch.shape[0]  # block_h * G query rows
        g = rows // block_h
        # batched over the head-block axis: one MXU pass per kv head
        q = q_ref[0]  # [block_h, G, D]
        k = k_ref[0]  # [block_h, block_t, D]
        s3 = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [block_h, G, block_t]
        s = s3.reshape(rows, block_t) * scale
        pos = t * block_t + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(pos < length, s, MASK_VALUE)

        m_prev = m_scratch[...]
        l_prev = l_scratch[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        l_scratch[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scratch[...] = m_next

        v = v_ref[0]  # [block_h, block_t, D]
        p3 = p.reshape(block_h, g, block_t).astype(v.dtype)
        o3 = jax.lax.dot_general(
            p3, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [block_h, G, D]
        acc_scratch[...] = (
            acc_scratch[...] * alpha[:, :1] + o3.reshape(rows, -1)
        )

    @pl.when(t == nt - 1)
    def _store():
        l = l_scratch[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        out = acc_scratch[...] * l_inv
        o_ref[0] = out.reshape(o_ref.shape[1:]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_t", "block_h", "interpret")
)
def _decode_pallas(
    q: jnp.ndarray,  # [B, H_kv, G, D] queries grouped per kv head
    k: jnp.ndarray,  # [B, H_kv, T, D]
    v: jnp.ndarray,  # [B, H_kv, T, D]
    lengths: jnp.ndarray,  # [B] int32
    *,
    scale: float,
    block_t: int,
    block_h: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    b, hkv, g, d = q.shape
    t = k.shape[2]
    nt = pl.cdiv(t, block_t)
    bh = min(block_h, hkv)
    while hkv % bh:
        bh -= 1

    def q_map(bi, hi, ti, lens):
        return (bi, hi, 0, 0)

    def kv_map(bi, hi, ti, lens):
        # clamp to the row's last live block: once past it, the index repeats
        # and Pallas skips the HBM->VMEM copy entirely
        last = jnp.maximum(pl.cdiv(lens[bi], block_t) - 1, 0)
        return (bi, hi, jnp.minimum(ti, last), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, hkv // bh, nt),
        in_specs=[
            pl.BlockSpec((1, bh, g, d), q_map),
            pl.BlockSpec((1, bh, block_t, d), kv_map),
            pl.BlockSpec((1, bh, block_t, d), kv_map),
        ],
        out_specs=pl.BlockSpec((1, bh, g, d), q_map),
        scratch_shapes=[
            pltpu.VMEM((bh * g, 128), jnp.float32),
            pltpu.VMEM((bh * g, 128), jnp.float32),
            pltpu.VMEM((bh * g, d), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _decode_kernel, scale=scale, block_t=block_t, block_h=bh
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths, q, k, v)


def _pick_block_t(t: int) -> int:
    for bt in (512, 256, 128):
        if t % bt == 0:
            return bt
    return 0


def decode_attention(
    q: jnp.ndarray,  # [B, H, D] one query per row
    k_cache: jnp.ndarray,  # [B, H_kv, T, D]
    v_cache: jnp.ndarray,  # [B, H_kv, T, D]
    lengths: jnp.ndarray,  # [B] int32 valid prefix length per row
    *,
    scale=None,
    impl: str = "auto",
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-step attention against the cache; returns [B, H, D].

    impl: auto | pallas | xla. "auto" takes the Pallas kernel on TPU when the
    cache length is 128-blockable and head_dim is lane-aligned.
    """
    b, h, d = q.shape
    hkv, t = k_cache.shape[1], k_cache.shape[2]
    g = h // hkv
    if scale is None:
        scale = d ** -0.5
    block_t = _pick_block_t(t)
    if impl == "auto":
        use_pallas = (
            (jax.default_backend() == "tpu" or interpret)
            and d % 128 == 0
            and block_t > 0
            and h % hkv == 0
        )
        impl = "pallas" if use_pallas else "xla"
    if impl == "pallas":
        qg = q.reshape(b, hkv, g, d)
        out = _decode_pallas(
            qg, k_cache, v_cache, lengths.astype(jnp.int32),
            scale=float(scale), block_t=block_t, interpret=interpret,
        )
        return out.reshape(b, h, d)
    # XLA reference path (CPU tests / odd shapes)
    qf = q.astype(jnp.float32)
    kf = k_cache.astype(jnp.float32)
    vf = v_cache.astype(jnp.float32)
    if g > 1:
        kf = jnp.repeat(kf, g, axis=1)
        vf = jnp.repeat(vf, g, axis=1)
    logits = jnp.einsum("bhd,bhtd->bht", qf, kf) * scale
    mask = jax.lax.broadcasted_iota(jnp.int32, (b, 1, t), 2) < lengths[:, None, None]
    logits = jnp.where(mask, logits, MASK_VALUE)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bht,bhtd->bhd", probs, vf)
    return out.astype(q.dtype)

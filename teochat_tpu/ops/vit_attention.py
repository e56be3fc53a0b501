"""One-shot short-sequence attention for the ViT (Pallas, TPU).

The encoder's spatial attention (S=257 tokens, 16 heads of 64) is where XLA
loses: it materializes the [B, H, S, S] score matrices in HBM (write + read
for softmax + read for PV), measured at ~29% of encode time, HBM-bound at
~500 GiB/s (scripts/profile_encode.py). At S=257 the WHOLE score matrix for a
head-block fits VMEM, so no flash-style online softmax is needed: one kernel
cell computes scores -> softmax -> PV without touching HBM in between.

Not a flash kernel: picked deliberately for short S (flash tiling pays off
when S^2 doesn't fit VMEM; here it only adds bookkeeping). Forward-only — the
vision tower is frozen in every TEOChat recipe (reference train_teochat.sh
trains LoRA+projector only), so no vjp is required; the XLA path remains for
CPU/fallback.

MEASURED OUTCOME (v5e, [32,257,16,64] bf16): isolated, this kernel is 1.7x
faster than XLA attention (0.565 vs 0.956 ms/call incl. wrapper transposes,
scripts/bench_vit_attention.py). End-to-end in the 23-layer encoder it is a
net LOSS (52.2 vs 49.1 ms/batch): inside the full program XLA fuses the
attention with the q/k/v and output projections, and the [B,S,H,D]->[BH,S,D]
transposes around pallas_call add HBM passes that the isolated baseline also
paid. The ViT therefore defaults to the XLA path (models/vit.py); this kernel
is opt-in via impl="pallas".

Reference point: CLIPAttention in the reference's LanguageBind towers
(videollava/model/multimodal_encoder/languagebind/image/modeling_image.py)
materializes the same score matrices via torch.bmm.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_valid: int):
    q = q_ref[...]  # [bh, Sq, D]
    k = k_ref[...]  # [bh, Sk, D]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # [bh, Sq, Sk] f32
    # zero-padded keys must not participate in softmax
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(col < n_valid, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    v = v_ref[...]  # [bh, Sk, D]
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [bh, Sq, D]
    o_ref[...] = (o / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "n_valid", "block_h", "interpret"))
def _vit_attention_pallas(
    q: jnp.ndarray,  # [BH, Sq, D]  (Sq 8-aligned, rows >= n_valid are pad)
    k: jnp.ndarray,  # [BH, Sk, D]  (Sk 128-aligned, zero-padded)
    v: jnp.ndarray,  # [BH, Sk, D]
    *,
    scale: float,
    n_valid: int,
    block_h: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    bh_total, sq, d = q.shape
    sk = k.shape[1]
    bh = block_h
    while bh_total % bh:
        bh -= 1
    grid = (bh_total // bh,)
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, n_valid=n_valid),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bh, sq, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((bh, sk, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((bh, sk, d), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bh, sq, d), lambda i: (i, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bh_total * sq * sk * d,
            bytes_accessed=(2 * bh_total * sk * d + 2 * bh_total * sq * d)
            * q.dtype.itemsize,
            transcendentals=bh_total * sq * sk,
        ),
        interpret=interpret,
    )(q, k, v)


def vit_attention(
    q: jnp.ndarray,  # [B, S, H, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale=None,
    impl: str = "auto",
    interpret: bool = False,
) -> jnp.ndarray:
    """Bidirectional attention for short sequences; returns [B, S, H, D].

    impl: auto | pallas | xla. "auto" takes the Pallas one-shot kernel on TPU
    when S is large enough that XLA's materialized score matrices hurt
    (S >= 64) and the padded score block fits VMEM comfortably (S <= 1024)."""
    b, s, h, d = q.shape
    if scale is None:
        scale = d ** -0.5
    if impl == "auto":
        use_pallas = (
            (jax.default_backend() == "tpu" or interpret)
            and 64 <= s <= 1024
            and d % 8 == 0
        )
        impl = "pallas" if use_pallas else "xla"
    if impl == "xla":
        from teochat_tpu.ops.attention import xla_attention

        return xla_attention(q, k, v, causal=False, scale=scale)

    sq = -(-s // 8) * 8
    sk = -(-s // 128) * 128

    def prep(x, pad_to):
        x = jnp.swapaxes(x, 1, 2).reshape(b * h, s, d)
        if pad_to != s:
            x = jnp.pad(x, ((0, 0), (0, pad_to - s), (0, 0)))
        return x

    out = _vit_attention_pallas(
        prep(q, sq), prep(k, sk), prep(v, sk),
        scale=float(scale), n_valid=s, interpret=interpret,
    )
    out = out[:, :s].reshape(b, h, s, d)
    return jnp.swapaxes(out, 1, 2)

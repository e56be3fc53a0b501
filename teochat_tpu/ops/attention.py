"""Attention dispatch: XLA reference path + Pallas flash-attention fast path.

The decoder's long-sequence attention routes to the Pallas kernel on TPU
(replacing the reference's Triton flash_attn_triton.py / flash-attn library,
SURVEY §2 M10); the ViT's 257-token attention and all CPU-test runs use the
fused-by-XLA reference path, which is numerically the ground truth the kernel
is tested against.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _repeat_kv(x: jnp.ndarray, n_rep: int) -> jnp.ndarray:
    """[B, T, Hkv, D] -> [B, T, Hkv*n_rep, D] (GQA head expansion)."""
    if n_rep == 1:
        return x
    b, t, h, d = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :], (b, t, h, n_rep, d)).reshape(
        b, t, h * n_rep, d
    )


def xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    bias: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Reference attention. q:[B,S,H,D] k,v:[B,T,Hkv,D] -> [B,S,H,D].

    Softmax in fp32 regardless of input dtype (bf16-safe); `mask` is boolean
    [B,1,S,T] or [B,S,T] or [B,T] (True = attend); `bias` is additive
    [B|1, H|1, S, T] (e.g. ALiBi for the MPT backend).
    """
    orig_dtype = q.dtype
    b, s, h, d = q.shape
    t = k.shape[1]
    n_rep = h // k.shape[2]
    k = _repeat_kv(k, n_rep)
    v = _repeat_kv(v, n_rep)
    if scale is None:
        scale = d ** -0.5

    logits = jnp.einsum(
        "bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32
    )
    logits = logits.astype(jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if causal:
        q_pos = jax.lax.broadcasted_iota(jnp.int32, (s, t), 0) + (t - s)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (s, t), 1)
        logits = jnp.where(q_pos[None, None] >= k_pos[None, None], logits, _NEG_INF)
    if mask is not None:
        if mask.ndim == 2:  # [B, T]
            mask = mask[:, None, None, :]
        elif mask.ndim == 3:  # [B, S, T]
            mask = mask[:, None, :, :]
        logits = jnp.where(mask, logits, _NEG_INF)

    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhst,bthd->bshd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(orig_dtype)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    bias: Optional[jnp.ndarray] = None,
    bias_k: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Attention entry point. impl: auto | xla | flash.

    "auto" uses the Pallas flash kernel on TPU for causal self-attention over
    sequences long enough to tile (prefill), else the XLA path (ViT's 257
    tokens, single-token decode, CPU tests).

    `bias_k` is a key-separable additive bias table [H, T] (ALiBi, MPT
    backend) — unlike the general `bias` it stays eligible for the flash
    path; on the XLA path it broadcasts to [1, H, 1, T].
    """
    if bias is not None and bias_k is not None:
        raise ValueError("pass either bias or bias_k, not both")
    if impl == "auto":
        on_tpu = jax.default_backend() == "tpu"
        s, t = q.shape[1], k.shape[1]
        use_flash = (
            on_tpu
            and causal
            and bias is None
            and mask is None
            and s == t
            and s >= 256
            and q.shape[-1] % 128 == 0
        )
        impl = "flash" if use_flash else "xla"
    if impl == "flash":
        from teochat_tpu.ops.flash_attention import flash_attention

        return flash_attention(
            q, k, v, mask=mask, bias_k=bias_k, causal=causal, scale=scale
        )
    if bias_k is not None:
        bias = bias_k[None, :, None, :]
    return xla_attention(q, k, v, bias=bias, mask=mask, causal=causal, scale=scale)

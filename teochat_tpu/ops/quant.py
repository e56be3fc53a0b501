"""Int8 weight-only quantization for the decoder.

API-parity with the reference's `load_8bit` path (bitsandbytes LLM.int8,
builder.py:94-103, train.py:930-947) rebuilt TPU-natively: symmetric
per-output-channel int8 weights with fp32 scales. Because scales are
per-OUTPUT-channel they commute with the matmul —

    x @ (W_i8 * s) == (x @ W_i8) * s

— so the hot path is a bf16 matmul over int8-loaded weights (XLA fuses the
int8->bf16 convert into the read) followed by one fused multiply. Decode is
HBM-bandwidth-bound; halving weight bytes ~doubles tokens/sec. The projector
and vision tower stay bf16 (the reference's llm_int8_skip_modules parity).

No outlier decomposition: LLM.int8's mixed-precision outlier path is a GPU
workaround for accuracy, so the int8 path here is metric-parity, not
bit-parity (SURVEY §7 hard-parts).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

import numpy as np


def quantize_kernel(kernel: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """[..., in, out] fp -> {'kernel': int8, 'scale': fp32 [..., out]}."""
    k32 = jnp.asarray(kernel, jnp.float32)
    amax = jnp.max(jnp.abs(k32), axis=-2)  # [..., out]
    scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    q = jnp.round(k32 / scale[..., None, :])
    q = jnp.clip(q, -127, 127).astype(jnp.int8)
    return {"kernel": q, "scale": scale}


def dequantize_kernel(p: Dict[str, jnp.ndarray], dtype=jnp.float32) -> jnp.ndarray:
    return (p["kernel"].astype(jnp.float32) * p["scale"][..., None, :]).astype(dtype)


def quantized_proj(x: jnp.ndarray, p: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """y = (x @ W_i8) * scale, bf16 compute / fp32 accumulation.

    Called inside the layer scan, so kernel is [in, out], scale [out]."""
    y = jnp.einsum(
        "...d,df->...f", x, p["kernel"].astype(x.dtype),
        preferred_element_type=jnp.float32,
    )
    return (y * p["scale"].astype(jnp.float32)).astype(x.dtype)


_QUANT_TARGETS = ("attn", "mlp")  # groups inside llm/layers whose kernels quantize


def quantize_llama_params(params: Dict, quantize_lm_head: bool = True) -> Dict:
    """Quantize all decoder projection kernels; norms/embeddings stay as-is.

    Mirrors the reference's choice of quantizing every LLM Linear
    (find_all_linear_names, train.py:176-189) while skipping embeddings.
    """
    out = dict(params)
    layers = dict(params["layers"])
    for group in _QUANT_TARGETS:
        g = {}
        for name, proj in layers[group].items():
            g[name] = quantize_kernel(proj["kernel"])
        layers[group] = g
    out["layers"] = {**layers}
    if quantize_lm_head and "lm_head" in params:
        out["lm_head"] = quantize_kernel(params["lm_head"]["kernel"])
    return out


def random_int8_llama(rng: jax.Array, cfg, embed_dtype=jnp.bfloat16) -> Dict:
    """Random int8-weight decoder for benchmarking (no fp32 materialization)."""
    keys = iter(jax.random.split(rng, 32))
    d, i_sz, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    hkv_d = cfg.num_kv_heads * cfg.head_dim

    def qproj(key, fan_in, fan_out):
        k = jax.random.randint(key, (L, fan_in, fan_out), -127, 128, jnp.int8)
        return {"kernel": k, "scale": jnp.full((L, fan_out), 0.02 / 127, jnp.float32)}

    params = {
        "embed_tokens": {
            "embedding": (
                jax.random.normal(next(keys), (cfg.vocab_size, d)) * 0.02
            ).astype(embed_dtype)
        },
        "layers": {
            "input_norm": {"scale": jnp.ones((L, d), jnp.float32)},
            "attn": {
                "q": qproj(next(keys), d, d),
                "k": qproj(next(keys), d, hkv_d),
                "v": qproj(next(keys), d, hkv_d),
                "out": qproj(next(keys), d, d),
            },
            "post_attn_norm": {"scale": jnp.ones((L, d), jnp.float32)},
            "mlp": {
                "gate": qproj(next(keys), d, i_sz),
                "up": qproj(next(keys), d, i_sz),
                "down": qproj(next(keys), i_sz, d),
            },
        },
        "final_norm": {"scale": jnp.ones((d,), jnp.float32)},
        "lm_head": {
            "kernel": jax.random.randint(next(keys), (d, cfg.vocab_size), -127, 128, jnp.int8),
            "scale": jnp.full((cfg.vocab_size,), 0.02 / 127, jnp.float32),
        },
    }
    return params

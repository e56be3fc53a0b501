"""Vision-language projector (reference multimodal_projector/builder.py:33-51).

`linear` | `mlp{N}x_gelu` (regex-dispatched) | `identity`. Production config is
mlp2x_gelu: Linear(1024->4096) + GELU + Linear(4096->4096)
(reference scripts/train_teochat.sh:14).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from teochat_tpu.config import ProjectorConfig

Params = Dict


def init_projector(rng: jax.Array, cfg: ProjectorConfig, dtype=jnp.float32) -> Params:
    depth = cfg.depth
    if depth == 0:  # identity
        return {}
    keys = jax.random.split(rng, depth)
    layers = []
    fan_in = cfg.mm_hidden_size
    for i in range(depth):
        std = fan_in ** -0.5
        layers.append(
            {
                "kernel": (
                    jax.random.normal(keys[i], (fan_in, cfg.hidden_size)) * std
                ).astype(dtype),
                "bias": jnp.zeros((cfg.hidden_size,), dtype),
            }
        )
        fan_in = cfg.hidden_size
    return {"layers": layers}


def projector_forward(params: Params, cfg: ProjectorConfig, x: jnp.ndarray) -> jnp.ndarray:
    """[..., mm_hidden] -> [..., hidden]; GELU (tanh-free exact) between layers."""
    if cfg.depth == 0:
        return x
    layers = params["layers"]
    for i, lp in enumerate(layers):
        if i > 0:
            x = jax.nn.gelu(x, approximate=False)
        x = jnp.einsum(
            "...d,df->...f", x, lp["kernel"].astype(x.dtype),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype) + lp["bias"].astype(x.dtype)
    return x

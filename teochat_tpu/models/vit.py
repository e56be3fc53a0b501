"""CLIP ViT vision tower — single functional implementation, scan-over-layers.

TPU-first rebuild of the reference's five vendored CLIP copies
(videollava/model/multimodal_encoder/languagebind/*/modeling_*.py, SURVEY §2 M6):
- params are a pytree of stacked per-layer arrays, the encoder is one
  `lax.scan` over layers (one compile of the layer body instead of 24 unrolled);
- patch embedding is a reshape+matmul (maps straight onto the MXU; a conv with
  stride == kernel size is exactly a block reshape);
- optional temporal attention over the frame axis behind `add_time_attn`
  (reference modeling_video.py:105-134), with the (b t) n d <-> (b n) t d
  folding done by reshapes XLA fuses away;
- feature selection (`hidden_states[select_layer]`, 'patch' drops CLS —
  reference languagebind/__init__.py:121-129) is implemented by scanning only
  the layer prefix that is actually needed: select_layer=-2 runs 23 of 24
  layers and never computes the last one.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from teochat_tpu.config import VisionConfig
from teochat_tpu.ops.attention import dot_product_attention

Params = Dict


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


ACT = {"quick_gelu": quick_gelu, "gelu": jax.nn.gelu}


def _layer_norm(x: jnp.ndarray, p: Params, eps: float) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _dense(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    if "scale" in p:
        # w8a8 projection (ops/quant.py::quantize_vit_params): encode is
        # compute-bound, so int8 activations ride the 2x int8 MXU rate.
        from teochat_tpu.ops.quant import quantized_proj_act_i8

        y = quantized_proj_act_i8(x, p)
    else:
        y = jnp.einsum("...d,df->...f", x, p["kernel"].astype(x.dtype),
                       preferred_element_type=jnp.float32).astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _attn_block(x: jnp.ndarray, p: Params, cfg: VisionConfig) -> jnp.ndarray:
    """CLIP bidirectional self-attention. x: [B, N, D]."""
    b, n, _ = x.shape
    h, hd = cfg.num_heads, cfg.head_dim
    # NOTE: quantize-time qkv fusion (one [d,3d] int8 matmul + single act
    # quantize) was A/B'd on v5e at encode bs=32 and LOSES: 736.9 f/s
    # ([..., :d] splits) / 473.6 ([:,:,i] splits) vs 778.7 unfused — XLA
    # already shares the act-quantize across the three matmuls, and the
    # wide output's re-split costs more than the fusion saves.
    q = _dense(x, p["q"]).reshape(b, n, h, hd)
    k = _dense(x, p["k"]).reshape(b, n, h, hd)
    v = _dense(x, p["v"]).reshape(b, n, h, hd)
    # XLA wins here: measured end-to-end A/B on v5e (batch 32 encode) puts the
    # Pallas one-shot kernel (ops/vit_attention.py) at 52.2 ms/batch vs XLA's
    # 49.1 — the kernel's 1.7x isolated win is eaten by the layout transposes
    # around the pallas_call plus XLA's fusion of attention with the
    # neighbouring projections. The kernel remains standalone in
    # ops/vit_attention.py (not routed from here) for shapes where the score
    # matrices stop fitting cache-friendly fusions.
    out = dot_product_attention(q, k, v, causal=False)
    return _dense(out.reshape(b, n, h * hd), p["out"])


def _mlp_block(x: jnp.ndarray, p: Params, cfg: VisionConfig) -> jnp.ndarray:
    return _dense(ACT[cfg.hidden_act](_dense(x, p["fc1"])), p["fc2"])


def _encoder_layer(x: jnp.ndarray, lp: Params, cfg: VisionConfig,
                   num_frames: int = 1) -> jnp.ndarray:
    """One pre-LN CLIP layer; optional temporal attention first.

    x: [(B*T), N, D] with T = num_frames when temporal attention is on.
    """
    if cfg.add_time_attn:
        bt, n, d = x.shape
        t = num_frames
        b = bt // t
        # (b t) n d -> (b n) t d
        xt = x.reshape(b, t, n, d).transpose(0, 2, 1, 3).reshape(b * n, t, d)
        if t != 1:
            xt = xt + lp["temporal_embedding"][:t].astype(x.dtype)
        res = xt
        y = _layer_norm(xt, lp["temporal_ln"], cfg.layer_norm_eps)
        y = _attn_block(y, lp["temporal_attn"], cfg)
        xt = res + y
        # (b n) t d -> (b t) n d
        x = xt.reshape(b, n, t, d).transpose(0, 2, 1, 3).reshape(bt, n, d)

    res = x
    y = _layer_norm(x, lp["ln1"], cfg.layer_norm_eps)
    y = _attn_block(y, lp["attn"], cfg)
    x = res + y
    res = x
    y = _layer_norm(x, lp["ln2"], cfg.layer_norm_eps)
    y = _mlp_block(y, lp["mlp"], cfg)
    return res + y


def embed_patches(params: Params, cfg: VisionConfig, pixel_values: jnp.ndarray) -> jnp.ndarray:
    """[B, 3, H, W] -> [B, 1+num_patches, D] (CLS + patches + positions + pre-LN)."""
    b = pixel_values.shape[0]
    p = cfg.patch_size
    gh, gw = cfg.grid  # rectangular for the audio tower's spectrograms
    x = pixel_values.reshape(b, 3, gh, p, gw, p)
    # -> [B, gh, gw, 3, p, p] -> [B, gh*gw, 3*p*p]; flatten order (c, ph, pw)
    # matches a conv kernel flattened the same way by the checkpoint converter.
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, gh * gw, 3 * p * p)
    x = jnp.einsum("bnk,kd->bnd", x, params["patch_embedding"]["kernel"].astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(pixel_values.dtype)
    cls = jnp.broadcast_to(
        params["class_embedding"].astype(x.dtype), (b, 1, cfg.hidden_size)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["position_embedding"].astype(x.dtype)
    return _layer_norm(x, params["pre_layernorm"], cfg.layer_norm_eps)


def vit_forward(
    params: Params,
    cfg: VisionConfig,
    pixel_values: jnp.ndarray,
    *,
    select_layer: Optional[int] = None,
    num_frames: int = 1,
    remat: bool = False,
) -> jnp.ndarray:
    """Run the tower and return hidden states at `select_layer`.

    pixel_values: [B*T, 3, H, W]  (frames folded into batch, reference
    modeling_video.py:631-648). Returns [B*T, 1+N, D] hidden states *before*
    post-layernorm, matching HF `output_hidden_states` semantics where
    hidden_states[-2] is the input to the final layer.
    """
    if select_layer is None:
        select_layer = cfg.select_layer
    # hidden_states tuple in HF has num_layers+1 entries (embeddings first);
    # hidden_states[select_layer] = output of layer (num_layers + select_layer).
    k = cfg.num_layers + 1 + select_layer if select_layer < 0 else select_layer
    if not 0 <= k <= cfg.num_layers:
        raise ValueError(f"select_layer {select_layer} out of range")

    x = embed_patches(params, cfg, pixel_values)
    if k == 0:
        return x

    layers = jax.tree.map(lambda a: a[:k], params["layers"])

    def body(carry, lp):
        fn = _encoder_layer
        if remat:
            fn = jax.checkpoint(_encoder_layer, static_argnums=(2, 3))
        return fn(carry, lp, cfg, num_frames), None

    x, _ = jax.lax.scan(body, x, layers)
    return x


def select_features(hidden: jnp.ndarray, feature: str = "patch") -> jnp.ndarray:
    """'patch' drops CLS; 'cls_patch' keeps all (reference __init__.py:121-129)."""
    if feature == "patch":
        return hidden[:, 1:]
    if feature == "cls_patch":
        return hidden
    raise ValueError(f"Unexpected select feature: {feature}")


def init_vit(rng: jax.Array, cfg: VisionConfig, dtype=jnp.float32) -> Params:
    """Random init with CLIP's scheme (std scaled by width/depth)."""
    keys = iter(jax.random.split(rng, 64))
    d, i_size, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    factor = 1.0
    in_std = (d ** -0.5) * factor
    pk = 3 * cfg.patch_size * cfg.patch_size

    def dense_p(key, fan_in, fan_out, std, n_layers=None):
        shape = (fan_in, fan_out) if n_layers is None else (n_layers, fan_in, fan_out)
        bshape = (fan_out,) if n_layers is None else (n_layers, fan_out)
        return {
            "kernel": (jax.random.normal(key, shape) * std).astype(dtype),
            "bias": jnp.zeros(bshape, dtype),
        }

    def ln_p(n_layers=None):
        shape = (d,) if n_layers is None else (n_layers, d)
        return {"scale": jnp.ones(shape, jnp.float32), "bias": jnp.zeros(shape, jnp.float32)}

    attn_std = (d ** -0.5) * ((2 * L) ** -0.5) * factor
    fc_std = ((2 * d) ** -0.5) * factor

    def attn_p():
        return {
            "q": dense_p(next(keys), d, d, attn_std, L),
            "k": dense_p(next(keys), d, d, attn_std, L),
            "v": dense_p(next(keys), d, d, attn_std, L),
            "out": dense_p(next(keys), d, d, attn_std, L),
        }

    layers = {
        "ln1": ln_p(L),
        "attn": attn_p(),
        "ln2": ln_p(L),
        "mlp": {
            "fc1": dense_p(next(keys), d, i_size, fc_std, L),
            "fc2": dense_p(next(keys), i_size, d, in_std, L),
        },
    }
    if cfg.add_time_attn:
        layers["temporal_ln"] = ln_p(L)
        layers["temporal_attn"] = attn_p()
        layers["temporal_embedding"] = (
            jax.random.normal(next(keys), (L, cfg.num_frames, d)) * (d ** -0.5)
        ).astype(dtype)

    return {
        "patch_embedding": {
            "kernel": (jax.random.normal(next(keys), (pk, d)) * in_std).astype(dtype)
        },
        "class_embedding": (jax.random.normal(next(keys), (d,)) * in_std).astype(dtype),
        "position_embedding": (
            jax.random.normal(next(keys), (cfg.num_positions, d)) * in_std
        ).astype(dtype),
        "pre_layernorm": ln_p(),
        "post_layernorm": ln_p(),
        "layers": layers,
    }


def resize_position_embedding(pos: jnp.ndarray, old_grid: int, new_grid: int) -> jnp.ndarray:
    """Bicubic interpolation of the patch position table (reference
    modeling_video.py:800-846 `resize_pos`); CLS row is kept as-is."""
    cls_row, patch = pos[:1], pos[1:]
    d = patch.shape[-1]
    grid = patch.reshape(old_grid, old_grid, d)
    resized = jax.image.resize(grid, (new_grid, new_grid, d), method="bicubic")
    return jnp.concatenate([cls_row, resized.reshape(new_grid * new_grid, d)], axis=0)

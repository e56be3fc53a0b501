"""MPT decoder backend — ALiBi attention, no positional embeddings.

TPU-first rebuild of the reference's vendored MosaicML MPT stack
(videollava/model/language_model/mpt/: modeling_mpt.py:144-224, attention
attention.py:20-150, blocks.py:8-40, norm.py:14-53, SURVEY §2 M9) as one
functional scan-over-layers module sharing the infra of llama.py:

- ALiBi: per-head linear distance bias. Because softmax is row-shift
  invariant, the key-position form bias_k = -slope_h * (S_max - 1 - pos_k)
  (the reference's [1, H, 1, S] trick, modeling_mpt.py:88-143) equals the
  relative form under a causal mask; we use it so cached decode needs no
  per-query bias tensor.
- packed QKV projection (attention.py Wqkv), optional multiquery (1 kv head);
- pre-LN blocks with exact-GELU MLP, bias-free projections (no_bias=True);
- optional prefix-LM: bidirectional attention over a per-row prefix length
  (the reference ships HF prefix-LM converters, hf_prefixlm_converter.py).

The Triton flash-attention kernel the reference pairs with this backend
(flash_attn_triton.py) is replaced by ops/flash_attention.py + the XLA path.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from teochat_tpu.config import MptConfig
from teochat_tpu.ops.attention import dot_product_attention

Params = Dict


def alibi_slopes(n_heads: int, alibi_bias_max: int = 8) -> jnp.ndarray:
    """Per-head slopes with the power-of-two interleave (attention.py gen_slopes)."""
    ceil_pow2 = 2 ** math.ceil(math.log2(n_heads))
    m = jnp.arange(1, ceil_pow2 + 1, dtype=jnp.float32)
    m = m * (alibi_bias_max / ceil_pow2)
    slopes = 1.0 / (2.0 ** m)
    if ceil_pow2 != n_heads:
        # interleave: odd-indexed slopes first, then evens, truncated
        slopes = jnp.concatenate([slopes[1::2], slopes[0::2]])[:n_heads]
    return slopes


def alibi_bias(n_heads: int, seq_len: int, alibi_bias_max: int = 8) -> jnp.ndarray:
    """[1, H, 1, S] key-position bias (reference modeling_mpt.py:88-143 form)."""
    slopes = alibi_slopes(n_heads, alibi_bias_max)  # [H]
    dist = jnp.arange(1 - seq_len, 1, dtype=jnp.float32)  # [-(S-1) .. 0]
    return (slopes[:, None] * dist[None, :])[None, :, None, :]


def _ln(x: jnp.ndarray, p: Params, eps: float = 1e-5) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"]
    if "bias" in p:
        y = y + p["bias"]
    return y.astype(x.dtype)


def _dense(x: jnp.ndarray, p: Params, route=None) -> jnp.ndarray:
    if "scale" in p or "packed" in p or "packed_tiles" in p or "lora_a" in p:
        # int8 weight-only / packed int4 / LoRA dicts: llama's projection
        # dispatch covers every quantized layout (ops/quant.py convention);
        # `route` [B, A] mixes adapter-stacked multi-LoRA leaves per row
        from teochat_tpu.models.llama import _proj

        y = _proj(x, p, route=route)
    else:
        y = jnp.einsum("...d,df->...f", x, p["kernel"].astype(x.dtype),
                       preferred_element_type=jnp.float32).astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _mpt_layer(
    x: jnp.ndarray,
    lp: Params,
    cfg: MptConfig,
    bias: jnp.ndarray,  # [H, T] key-position ALiBi table
    mask: Optional[jnp.ndarray],
    k_cache: Optional[jnp.ndarray],
    v_cache: Optional[jnp.ndarray],
    write_slots: Optional[jnp.ndarray],
    q_slots: Optional[jnp.ndarray],
    layer: Optional[jnp.ndarray] = None,
    row_offset=0,
    spec_verify: bool = False,
    prefill_start=0,
    attend_cache: bool = False,
    route=None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], Optional[jnp.ndarray]]:
    """k_cache/v_cache are FULL stacked [L, B, T, H_kv, D] buffers with
    `layer` selecting this layer's slab (in-place update pattern shared
    with models/llama.py — scan ys would copy the whole cache per decode
    step). row_offset/spec_verify/prefill_start/attend_cache
    mirror llama._attention_layer's cache contract (per-slot engine prefill,
    suffix prefill over committed context, chunked prefill)."""
    b, s, d = x.shape
    h = cfg.n_heads
    hd = d // h
    n_kv = 1 if cfg.attn_type == "multiquery_attention" else h

    y = _ln(x, lp["norm1"])
    qkv = _dense(y, lp["wqkv"], route)  # [B, S, D + 2 * n_kv * hd]
    q = qkv[..., :d].reshape(b, s, h, hd)
    k = qkv[..., d : d + n_kv * hd].reshape(b, s, n_kv, hd)
    v = qkv[..., d + n_kv * hd :].reshape(b, s, n_kv, hd)

    if k_cache is None:
        if (
            mask is None
            and jax.default_backend() == "tpu"
            and hd % 128 == 0
            and s >= 128
        ):
            # differentiable Pallas flash path with the ALiBi table riding
            # in-kernel (the reference pairs MPT with its Triton flash kernel's
            # bias support, flash_attn_triton.py:60-90 / 306-399); keeps
            # mpt_forward trainable on TPU, mirroring llama.py:187-200
            from teochat_tpu.ops.flash_attention import (
                flash_attention_trainable_padded,
            )

            out = flash_attention_trainable_padded(
                q, k, v, True, None, bias_k=bias[:, :s]
            )
        else:
            out = dot_product_attention(
                q, k, v, causal=True, mask=mask, bias_k=bias[:, :s], impl="xla"
            )
    else:
        if s > 1 and not spec_verify:
            # contiguous right-padded prefill: one dus per buffer
            # (see llama.py note); prefill_start offsets chunked pieces
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, k.astype(k_cache.dtype)[None],
                (layer, row_offset, prefill_start, 0, 0),
            )
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, v.astype(v_cache.dtype)[None],
                (layer, row_offset, prefill_start, 0, 0),
            )
        else:
            # per-row scatter writes (llama.py KVCache note);
            # row indices offset for per-slot engine prefills
            batch_idx = row_offset + jnp.arange(b, dtype=jnp.int32)[:, None]
            k_cache = k_cache.at[layer, batch_idx, write_slots].set(
                k.astype(k_cache.dtype)
            )
            v_cache = v_cache.at[layer, batch_idx, write_slots].set(
                v.astype(v_cache.dtype)
            )
        if s > 1 and not spec_verify and not attend_cache:
            out = dot_product_attention(
                q, k, v, causal=True, bias_k=bias[:, :s]
            )
        else:
            kl = jax.lax.dynamic_index_in_dim(k_cache, layer, 0, keepdims=False)
            vl = jax.lax.dynamic_index_in_dim(v_cache, layer, 0, keepdims=False)
            if kl.shape[0] != b:
                # per-slot block over a wider cache: read this row group only
                kl = jax.lax.dynamic_slice_in_dim(kl, row_offset, b, axis=0)
                vl = jax.lax.dynamic_slice_in_dim(vl, row_offset, b, axis=0)
            t_max = kl.shape[1]
            slot_ids = jax.lax.broadcasted_iota(jnp.int32, (b, s, t_max), 2)
            dec_mask = slot_ids <= q_slots[:, :, None]
            if mask is not None:
                dec_mask = dec_mask & mask[:, None, :]
            out = dot_product_attention(
                q, kl.astype(q.dtype), vl.astype(q.dtype),
                mask=dec_mask, bias_k=bias[:, :t_max],
            )
    x = x + _dense(out.reshape(b, s, d), lp["out_proj"], route)

    y = _ln(x, lp["norm2"])
    y = _dense(jax.nn.gelu(_dense(y, lp["up_proj"], route), approximate=False),
               lp["down_proj"], route)
    return x + y, k_cache, v_cache


def mpt_forward(
    params: Params,
    cfg: MptConfig,
    inputs_embeds: jnp.ndarray,
    *,
    attention_mask: Optional[jnp.ndarray] = None,
    cache: Optional["KVCache"] = None,
    write_slots: Optional[jnp.ndarray] = None,
    kv_mask: Optional[jnp.ndarray] = None,
    logits_mode: str = "all",
    last_index: Optional[jnp.ndarray] = None,
    remat: bool = False,
    cache_row_offset=0,
    spec_verify: bool = False,
    prefill_start=0,
    attend_cache: bool = False,
    adapter_route: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional["KVCache"]]:
    """Run the MPT stack. Mirrors llama.llama_forward's cache contract.

    ALiBi replaces position ids entirely (learned_pos_emb=False production
    config); the bias table is sized to the cache (or sequence) length.
    `remat` rematerializes layers in the backward pass (HF gradient
    checkpointing equivalent; cache-free path only, like llama).
    """
    from teochat_tpu.models.llama import KVCache

    x = inputs_embeds
    b, s, d = x.shape
    t_bias = cache.max_len if cache is not None else s
    # key-separable [H, T] form: eligible for the flash path's per-tile add
    # (ops/attention.py bias_k); the XLA path broadcasts it to [1, H, 1, T]
    bias = alibi_bias(cfg.n_heads, t_bias, cfg.alibi_bias_max)[0, :, 0, :]
    q_slots = write_slots

    layer_fn = _mpt_layer
    if remat and cache is None:
        layer_fn = jax.checkpoint(
            _mpt_layer, static_argnums=(2,),
            policy=jax.checkpoint_policies.nothing_saveable,
        )

    if cache is None:
        if cfg.pipeline_axis is not None:
            # GPipe over the stacked layer axis (parallel/pipeline.py); the
            # ALiBi bias is microbatch-independent and closes over the block,
            # only the padding mask travels with its microbatch
            if adapter_route is not None:
                raise ValueError(
                    "adapter_route (multi-LoRA) does not compose with "
                    "pipeline_axis (see llama.llama_forward)"
                )
            from teochat_tpu.parallel.pipeline import pipelined_scan_blocks

            def block_fn(xc, lp, mask_b):
                y, _, _ = layer_fn(
                    xc, lp, cfg, bias, mask_b, None, None, None, None
                )
                return y

            x = pipelined_scan_blocks(
                params["layers"], block_fn, x, (attention_mask,),
                axis_name=cfg.pipeline_axis,
                num_microbatches=cfg.pipeline_microbatches,
            )
        else:
            def body(carry, lp):
                y, _, _ = layer_fn(
                    carry, lp, cfg, bias, attention_mask, None, None, None,
                    None, None, 0, False, 0, False, adapter_route,
                )
                return y, None

            x, _ = jax.lax.scan(body, x, params["layers"])
        new_cache = None
    else:
        n_layers = cache.k.shape[0]

        def body(l, carry):
            y, kc, vc = carry
            lp = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, l, 0, keepdims=False),
                params["layers"],
            )
            y, kc, vc = _mpt_layer(
                y, lp, cfg, bias, kv_mask, kc, vc, write_slots, q_slots, l,
                cache_row_offset, spec_verify, prefill_start, attend_cache,
                adapter_route,
            )
            return (y, kc, vc)

        x, nk, nv = jax.lax.fori_loop(0, n_layers, body, (x, cache.k, cache.v))
        new_cache = KVCache(k=nk, v=nv)

    x = _ln(x, params["final_norm"])
    if logits_mode == "none":
        return x, new_cache
    if logits_mode == "last":
        if last_index is None:
            x = x[:, -1:]
        else:
            x = x[jnp.arange(b), last_index][:, None]
    # tied embeddings (MPT SharedEmbedding, custom_embedding.py:6-10)
    logits = jnp.einsum(
        "bsd,vd->bsv", x, params["wte"]["embedding"].astype(x.dtype),
        preferred_element_type=jnp.float32,
    ).astype(jnp.float32)
    if cfg.logit_scale is not None:
        logits = logits * cfg.logit_scale
    return logits, new_cache


def mpt_embed(params: Params, input_ids: jnp.ndarray, dtype=None) -> jnp.ndarray:
    emb = params["wte"]["embedding"]
    if dtype is not None:
        emb = emb.astype(dtype)
    return jnp.take(emb, input_ids, axis=0)


NUM_SENTINEL_TOKENS = 100  # reference mpt/adapt_tokenizer.py:4


def adapt_tokenizer_for_denoising(tokenizer) -> None:
    """Add <extra_id_0..99> sentinels + a <pad> token for MPT
    mixture-of-denoiser training (reference mpt/adapt_tokenizer.py:6-23).
    Idempotent: add_tokens skips existing entries. Sets
    ``tokenizer.sentinel_token_ids`` like the reference."""
    sentinels = [f"<extra_id_{i}>" for i in range(NUM_SENTINEL_TOKENS)]
    tokenizer.add_tokens(sentinels, special_tokens=True)
    if getattr(tokenizer, "pad_token", None) is None:
        tokenizer.add_tokens("<pad>", special_tokens=True)
        tokenizer.pad_token = "<pad>"
        assert tokenizer.pad_token_id is not None
    joined = "".join(sentinels)
    tokenizer.sentinel_token_ids = tokenizer(
        joined, add_special_tokens=False
    ).input_ids


def init_mpt(rng: jax.Array, cfg: MptConfig, dtype=jnp.float32) -> Params:
    if cfg.init_config is not None:
        # named scheme from the reference's param-init registry
        from teochat_tpu.models.mpt_init import init_mpt_params

        return init_mpt_params(rng, cfg, dtype=dtype)
    keys = iter(jax.random.split(rng, 16))
    d, L = cfg.d_model, cfg.n_layers
    h = cfg.n_heads
    hd = d // h
    n_kv = 1 if cfg.attn_type == "multiquery_attention" else h
    ffn = cfg.expansion_ratio * d
    std = 0.02

    def dense(key, fan_in, fan_out):
        p = {"kernel": (jax.random.normal(key, (L, fan_in, fan_out)) * std).astype(dtype)}
        if not cfg.no_bias:
            p["bias"] = jnp.zeros((L, fan_out), dtype)
        return p

    def ln():
        p = {"scale": jnp.ones((L, d), jnp.float32)}
        if not cfg.no_bias:
            p["bias"] = jnp.zeros((L, d), jnp.float32)
        return p

    final_norm = {"scale": jnp.ones((d,), jnp.float32)}
    if not cfg.no_bias:
        final_norm["bias"] = jnp.zeros((d,), jnp.float32)

    return {
        "wte": {
            "embedding": (
                jax.random.normal(next(keys), (cfg.vocab_size, d)) * std
            ).astype(dtype)
        },
        "layers": {
            "norm1": ln(),
            "wqkv": dense(next(keys), d, d + 2 * n_kv * hd),
            "out_proj": dense(next(keys), d, d),
            "norm2": ln(),
            "up_proj": dense(next(keys), d, ffn),
            "down_proj": dense(next(keys), ffn, d),
        },
        "final_norm": final_norm,
    }


def convert_hf_mpt(sd, cfg: MptConfig, prefix: str = "transformer.") -> Params:
    """HF MptForCausalLM state_dict -> pytree (stacked layers)."""
    import numpy as np

    def _np(t):
        if isinstance(t, np.ndarray):
            return t
        t = t.detach().cpu()
        if str(t.dtype) == "torch.bfloat16":
            t = t.float()
        return t.numpy()

    L = cfg.n_layers
    p = prefix

    def stack(fmt, transpose=False):
        arrs = [_np(sd[fmt.format(i=i)]) for i in range(L)]
        if transpose:
            arrs = [a.T for a in arrs]
        return np.stack(arrs, 0)

    return {
        "wte": {"embedding": _np(sd[f"{p}wte.weight"])},
        "layers": {
            "norm1": {"scale": stack(f"{p}blocks.{{i}}.norm_1.weight")},
            "wqkv": {"kernel": stack(f"{p}blocks.{{i}}.attn.Wqkv.weight", True)},
            "out_proj": {"kernel": stack(f"{p}blocks.{{i}}.attn.out_proj.weight", True)},
            "norm2": {"scale": stack(f"{p}blocks.{{i}}.norm_2.weight")},
            "up_proj": {"kernel": stack(f"{p}blocks.{{i}}.ffn.up_proj.weight", True)},
            "down_proj": {"kernel": stack(f"{p}blocks.{{i}}.ffn.down_proj.weight", True)},
        },
        "final_norm": {"scale": _np(sd[f"{p}norm_f.weight"])},
    }

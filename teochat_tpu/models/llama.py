"""LLaMA-2 decoder — functional, scan-over-layers, ragged-batch KV cache.

TPU-first rebuild of the reference's decoder path (HF LlamaForCausalLM as used
by videollava/model/language_model/llava_llama.py:33-99):
- stacked per-layer params + `lax.scan` (one traced layer body, not 32);
- RoPE in the HF rotate-half convention (checkpoint-compatible);
- KV cache as two stacked [L, B, T_max, H_kv, D] buffers carried WHOLE through
  a fori_loop over layers (in-place scatter writes; threading per-layer slabs
  through scan ys would copy the full cache every decode step) — decode steps
  write at a *per-row* slot index, so ragged batches need no left-padding
  (the reference pads left, llava_arch.py:302-331; here position ids and
  masks carry raggedness);
- fp32 RMSNorm/softmax, bf16 matmuls; prefill attention routes to the Pallas
  flash kernel on TPU via ops.attention dispatch.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from teochat_tpu.config import LlamaConfig
from teochat_tpu.ops.attention import dot_product_attention

Params = Dict


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    """K and V as SEPARATE stacked buffers — measured faster at every batch.

    Round 3 combined them as kv[L, 2, B, T, H, D] to halve the decode scatter
    count (~85 us/step of scatter op overhead at 7B bs=1), but the combined
    layout regressed end-to-end decode at every batch size on the real chip
    (bs1 97.9→94.7, bs8 548→452, bs16 855→446 tok/s — BENCH_r02 vs r03): the
    mid-buffer [l, 0]/[l, 1] slab reads stopped streaming into the batched
    attention fusion and materialized copies. Two scatters per layer are
    cheaper than one de-fused cache read; split buffers are the r2-proven
    layout and stay.
    """

    k: jnp.ndarray  # [L, B, T_max, H_kv, D]
    v: jnp.ndarray  # [L, B, T_max, H_kv, D]

    @property
    def dtype(self):
        return self.k.dtype

    @property
    def max_len(self) -> int:
        return self.k.shape[2]


def init_cache(cfg: LlamaConfig, batch: int, max_len: int, dtype=jnp.bfloat16) -> KVCache:
    shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
    k = jnp.zeros(shape, dtype)
    v = jnp.zeros(shape, dtype)
    if cfg.cache_sequence_axis is not None:
        # pin the TIME axis onto the mesh so decode reads stay shard-local
        # (parallel/sharded_cache.py); writes are GSPMD scatters
        mesh = jax.sharding.get_abstract_mesh()
        if mesh is not None and cfg.cache_sequence_axis in mesh.shape:
            spec = jax.sharding.PartitionSpec(
                None, None, cfg.cache_sequence_axis, None, None
            )
            k = jax.lax.with_sharding_constraint(k, spec)
            v = jax.lax.with_sharding_constraint(v, spec)
    return KVCache(k=k, v=v)


def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    y = x32 * jax.lax.rsqrt(var + eps)
    # HF casts back to the weight dtype *before* multiplying by the scale
    return (y.astype(x.dtype) * scale.astype(x.dtype))


def rope_tables(positions: jnp.ndarray, head_dim: int, theta: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for HF rotate-half RoPE. positions: [...] -> [..., head_dim]."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # [..., head_dim/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: [B, S, H, D]; cos/sin: [B, S, D] (HF rotate-half convention)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    cos = cos[:, :, None, :].astype(jnp.float32)
    sin = sin[:, :, None, :].astype(jnp.float32)
    return (x.astype(jnp.float32) * cos + rotated.astype(jnp.float32) * sin).astype(x.dtype)


def _proj(x: jnp.ndarray, p: Params, act_quant: bool = False, layer=None,
          route=None) -> jnp.ndarray:
    if "packed" in p or "packed_tiles" in p:  # int4 w4a16 (ops/quant.py)
        from teochat_tpu.ops.quant import int4_proj

        y = int4_proj(x, p, layer)
    elif "scale" in p:  # int8 weight-only path (ops/quant.py)
        if act_quant:  # w8a8 prefill: int8 MXU at 2x bf16 rate
            from teochat_tpu.ops.quant import quantized_proj_act_i8

            y = quantized_proj_act_i8(x, p)
        else:
            from teochat_tpu.ops.quant import quantized_proj

            y = quantized_proj(x, p)
    else:
        y = jnp.einsum(
            "...d,df->...f", x, p["kernel"].astype(x.dtype),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
    if "lora_a" in p:  # LoRA adapter path (train/lora.py)
        a = p["lora_a"].astype(x.dtype)
        b = p["lora_b"].astype(x.dtype)
        scale = jax.lax.stop_gradient(p["lora_scale"]).astype(jnp.float32)
        if a.ndim == 3:
            # Multi-LoRA serving (train/lora.py stack_lora_adapters): the
            # per-layer slice carries an extra leading ADAPTER axis —
            # a [A, d, r], b [A, r, f], scale [A] — and `route` [B, A] mixes
            # adapters per batch row (one-hot for hard routing; all-zero row
            # = base model only). The adapter axis unrolls statically (A is
            # small) and each adapter runs the EXACT single-adapter einsum
            # chain, weighted per row in f32: a zero weight contributes an
            # exact f32 zero, so a one-hot row is BITWISE equal to the
            # single-adapter model (a fused "bsd,adr->absr" contraction was
            # measured to tile differently across batch sizes and flip
            # near-tie greedy tokens between engine bs=N and generate bs=1).
            # Costs A x the rank-r FLOPs (MXU noise at decode shapes) but
            # stays gather-free: a per-row weight gather would materialize B
            # copies of [d, r] per projection per layer per step.
            if route is None:
                raise ValueError(
                    "params carry adapter-stacked LoRA leaves (multi-LoRA) "
                    "but no adapter_route was passed to the forward"
                )
            w = route.astype(jnp.float32) * scale[None, :]  # [B, A]
            delta = None
            for i in range(a.shape[0]):
                d_i = jnp.einsum(
                    "...d,dr->...r", x, a[i],
                    preferred_element_type=jnp.float32,
                ).astype(x.dtype)
                d_i = jnp.einsum(
                    "...r,rf->...f", d_i, b[i],
                    preferred_element_type=jnp.float32,
                )
                d_i = d_i * w[:, i][:, None, None]
                delta = d_i if delta is None else delta + d_i
            return y + delta.astype(x.dtype)
        delta = jnp.einsum(
            "...d,dr->...r", x, a, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        delta = jnp.einsum(
            "...r,rf->...f", delta, b, preferred_element_type=jnp.float32
        )
        y = y + (delta * scale).astype(x.dtype)
    return y


def _attention_layer(
    x: jnp.ndarray,
    lp: Params,
    cfg: LlamaConfig,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray],
    q_slots: Optional[jnp.ndarray],
    k_cache: Optional[jnp.ndarray],
    v_cache: Optional[jnp.ndarray],
    write_slots: Optional[jnp.ndarray],
    right_padded: bool = False,
    layer: Optional[jnp.ndarray] = None,
    row_offset=0,
    act_quant: bool = False,
    spec_verify: bool = False,
    prefill_start=0,
    attend_cache: bool = False,
    route=None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], Optional[jnp.ndarray]]:
    """Self-attention with optional KV cache.

    x: [B, S, D]; k_cache/v_cache: FULL stacked [L, B, T_max, H_kv, Hd] with
    `layer` selecting this layer's slab (kept whole so updates stay in place);
    write_slots: [B, S] slot index for each new token; q_slots: [B, S] slot of
    each query (for causal masking against cache slots); kv_mask: [B, T_max]
    validity. `spec_verify`: treat an S>1 block like S decode steps (per-row
    scatter writes + masked attention against the cache) — the speculative-
    decoding verification path (models/generation.py), where the S tokens are
    a draft continuation rather than a fresh right-padded prompt.
    `prefill_start` offsets the contiguous prefill panel write (chunked
    prefill: chunk i lands at slots [start, start+S)); `attend_cache` makes
    an S>1 prefill attend the cache slab (masked to slot <= q_slot) instead
    of only its fresh K/V — required whenever earlier chunks committed
    context below `prefill_start`. When the cache holds more rows than the
    batch, rows [row_offset, row_offset+B) are sliced for the read.
    """
    b, s, _ = x.shape
    h, hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    if "qkv" in lp:
        # fused q|k|v projection (ops/quant.py fuse_projections): one weight
        # read / one kernel launch instead of three
        fused = _proj(x, lp["qkv"], act_quant, layer, route)
        q = fused[..., : h * hd]
        k = fused[..., h * hd : (h + hkv) * hd]
        v = fused[..., (h + hkv) * hd :]
        q, k, v = (
            q.reshape(b, s, h, hd),
            k.reshape(b, s, hkv, hd),
            v.reshape(b, s, hkv, hd),
        )
    else:
        q = _proj(x, lp["q"], act_quant, layer, route).reshape(b, s, h, hd)
        k = _proj(x, lp["k"], act_quant, layer, route).reshape(b, s, hkv, hd)
        v = _proj(x, lp["v"], act_quant, layer, route).reshape(b, s, hkv, hd)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    if k_cache is None:
        if cfg.sequence_axis is not None:
            # context parallelism: S is sharded over the mesh's sequence
            # axis; K/V blocks rotate around the ICI ring while each shard
            # accumulates its queries' online softmax. Right-padded batches
            # only (causal masking subsumes the pad mask, as with flash).
            # Explicitly configured -> misuse is an ERROR, not a silent
            # fallback to O(S^2)-per-device attention.
            if not (right_padded or kv_mask is None):
                raise ValueError(
                    "sequence_axis needs right-padded batches (causal-only "
                    "masking); got a padding mask without right_padded=True"
                )
            from teochat_tpu.parallel.ring_attention import ring_self_attention

            out = ring_self_attention(
                q, k, v, axis_name=cfg.sequence_axis, causal=True
            )
        elif (
            right_padded
            and jax.default_backend() == "tpu"
            and cfg.head_dim % 128 == 0
            and s >= 128
        ):
            # right padding + causal => the mask is redundant; use the
            # differentiable Pallas flash kernel (fwd + custom bwd). Lengths
            # off the 128 tile are padded+sliced around the kernel.
            from teochat_tpu.ops.flash_attention import (
                flash_attention_trainable_padded,
            )

            out = flash_attention_trainable_padded(q, k, v, True, None)
        else:
            # cache-free path: causal self-attention over S (plus padding mask)
            out = dot_product_attention(q, k, v, causal=True, mask=kv_mask)
    else:
        # k_cache/v_cache here are the FULL stacked [L, B, T, H_kv, D] buffers
        # with `layer` selecting this layer's slab; scatter-writing through the
        # layer index keeps the buffers in place across the layer loop and the
        # decode while_loop. (Round 1 threaded per-layer caches through
        # lax.scan ys, which re-stacked — i.e. fully copied — both cache
        # buffers every decode step: ~1.5 GB x2 at bs=8, ~10 ms/step of pure
        # copy, the dominant cost of batched decode.)
        if s > 1 and not spec_verify:
            # Prefill writes are CONTIGUOUS for right-padded prompts: one
            # dynamic_update_slice of the whole [B, S] panel at slot 0 (far
            # faster than a 640-row scatter). Slots in [row_len, S) hold pad
            # garbage — never attended (decode masks slot <= q_slot) and
            # progressively overwritten by decode writes. `row_offset` places
            # a b-row prefill at cache rows [row_offset, row_offset+b) — the
            # serving engine prefills one request into its slot while other
            # slots keep decoding.
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, k.astype(k_cache.dtype)[None],
                (layer, row_offset, prefill_start, 0, 0),
            )
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, v.astype(v_cache.dtype)[None],
                (layer, row_offset, prefill_start, 0, 0),
            )
        else:
            # decode / spec-verify: per-row scatter at each row's write slot
            batch_idx = jnp.arange(b, dtype=jnp.int32)[:, None]
            k_cache = k_cache.at[layer, batch_idx, write_slots].set(
                k.astype(k_cache.dtype)
            )
            v_cache = v_cache.at[layer, batch_idx, write_slots].set(
                v.astype(v_cache.dtype)
            )
        if s > 1 and not spec_verify and not attend_cache:
            # Prefill: right-padded fused prompts start at slot 0, so causal
            # attention over the FRESH k/v equals attention over the cache
            # (padded keys sit after every valid query) — O(S^2), and the
            # mask-free causal shape routes to the Pallas flash kernel on TPU.
            out = dot_product_attention(q, k, v, causal=True)
        else:
            # Decode: one query per row against this layer's cache slab,
            # masked to live slots. The dynamic slice at `layer` is a read
            # (XLA streams it into the attention fusion, measured at HBM
            # roofline); only the scatter above writes.
            kl = jax.lax.dynamic_index_in_dim(k_cache, layer, 0, keepdims=False)
            vl = jax.lax.dynamic_index_in_dim(v_cache, layer, 0, keepdims=False)
            if kl.shape[0] != b:
                # per-slot chunked prefill: a B-row block over a wider cache
                kl = jax.lax.dynamic_slice_in_dim(kl, row_offset, b, axis=0)
                vl = jax.lax.dynamic_slice_in_dim(vl, row_offset, b, axis=0)
            if cfg.cache_sequence_axis is not None:
                # Time-sharded cache (parallel/sharded_cache.py): each device
                # attends over its resident T/n slots; partials combine with
                # pmax/psum. Same visibility rule as the masked path below.
                from teochat_tpu.parallel.sharded_cache import (
                    sharded_cache_attention_step,
                )

                out = sharded_cache_attention_step(
                    q, kl.astype(q.dtype), vl.astype(q.dtype), q_slots,
                    kv_mask, axis_name=cfg.cache_sequence_axis,
                )
            else:
                t_max = kl.shape[1]
                slot_ids = jax.lax.broadcasted_iota(jnp.int32, (b, s, t_max), 2)
                mask = slot_ids <= q_slots[:, :, None]
                if kv_mask is not None:
                    mask = mask & kv_mask[:, None, :]
                out = dot_product_attention(
                    q, kl.astype(q.dtype), vl.astype(q.dtype), mask=mask
                )
    out = out.reshape(b, s, h * hd)
    return _proj(out, lp["out"], act_quant, layer, route), k_cache, v_cache


def _mlp(x: jnp.ndarray, lp: Params, act_quant: bool = False, layer=None,
         route=None) -> jnp.ndarray:
    if "gateup" in lp:  # fused gate|up (ops/quant.py fuse_projections)
        gu = _proj(x, lp["gateup"], act_quant, layer, route)
        i_sz = gu.shape[-1] // 2
        gate_in, up = gu[..., :i_sz], gu[..., i_sz:]
    else:
        gate_in = _proj(x, lp["gate"], act_quant, layer, route)
        up = _proj(x, lp["up"], act_quant, layer, route)
    gate = jax.nn.silu(gate_in.astype(jnp.float32)).astype(x.dtype)
    return _proj(gate * up, lp["down"], act_quant, layer, route)


def _decoder_layer(x, lp, cfg, cos, sin, kv_mask, q_slots, k_cache, v_cache,
                   write_slots, right_padded=False, layer=None, row_offset=0,
                   spec_verify=False, act_quant_ok=True, prefill_start=0,
                   attend_cache=False, route=None):
    # w8a8 projections on the compute-bound prefill only (s>1); decode is
    # bandwidth-bound and keeps bf16 activations. Speculative verify blocks
    # (s>1 but decode-like) pass act_quant_ok=False so the greedy targets
    # match the plain decode path exactly; suffix prefills (also routed
    # through spec_verify's cache mode) keep w8a8 for parity with the
    # stateless full prefill.
    act_quant = (
        cfg.int8_prefill_activations and x.shape[1] > 1 and act_quant_ok
    )
    y = rms_norm(x, lp["input_norm"]["scale"], cfg.rms_norm_eps)
    attn_out, k_cache, v_cache = _attention_layer(
        y, lp["attn"], cfg, cos, sin, kv_mask, q_slots, k_cache, v_cache,
        write_slots, right_padded, layer, row_offset, act_quant, spec_verify,
        prefill_start, attend_cache, route,
    )
    x = x + attn_out
    y = rms_norm(x, lp["post_attn_norm"]["scale"], cfg.rms_norm_eps)
    return x + _mlp(y, lp["mlp"], act_quant, layer, route), k_cache, v_cache


def embed_tokens(params: Params, input_ids: jnp.ndarray, dtype=None) -> jnp.ndarray:
    emb = params["embed_tokens"]["embedding"]
    if dtype is not None:
        emb = emb.astype(dtype)
    return jnp.take(emb, input_ids, axis=0)


def llama_forward(
    params: Params,
    cfg: LlamaConfig,
    inputs_embeds: jnp.ndarray,
    *,
    position_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    cache: Optional[KVCache] = None,
    write_slots: Optional[jnp.ndarray] = None,
    kv_mask: Optional[jnp.ndarray] = None,
    logits_mode: str = "all",  # all | last | none
    last_index: Optional[jnp.ndarray] = None,
    remat: bool = False,
    right_padded: bool = False,
    cache_row_offset=0,
    spec_verify: bool = False,
    act_quant_ok: Optional[bool] = None,
    prefill_start=0,
    attend_cache: bool = False,
    adapter_route: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    """Run the decoder stack.

    inputs_embeds: [B, S, D]; position_ids: [B, S] RoPE positions;
    attention_mask (cache-free path): [B, S] padding validity;
    cache + write_slots [B,S] + kv_mask [B,T_max]: cached path (prefill writes
    S entries; decode writes 1). `last_index`: [B] row-wise index for
    logits_mode='last'. `cache_row_offset` (prefill only): write this
    B-row prefill into cache rows [offset, offset+B) — the serving engine's
    per-slot prefill; decode requires B == cache rows. `adapter_route`
    ([B, A], multi-LoRA params only): per-row adapter mixing weights —
    one-hot selects an adapter, an all-zero row runs the base model
    (see _proj and train/lora.py stack_lora_adapters).
    """
    x = inputs_embeds
    b, s, _ = x.shape
    if act_quant_ok is None:
        # speculative VERIFY blocks must reproduce plain-decode numerics
        # (bf16 activations); everything else may take the w8a8 prefill path
        act_quant_ok = not spec_verify
    cos, sin = rope_tables(position_ids, cfg.head_dim, cfg.rope_theta)

    q_slots = write_slots  # queries sit at the slots they are being written to

    layer_fn = _decoder_layer
    if remat:
        layer_fn = jax.checkpoint(
            _decoder_layer, static_argnums=(2, 10),
            policy=jax.checkpoint_policies.nothing_saveable,
        )

    if cache is None:
        mask2d = attention_mask

        if cfg.pipeline_axis is not None:
            # GPipe pipeline over the stacked layer axis
            # (parallel/pipeline.py): stage s holds layers [s*L/P, ...);
            # activations rotate via ppermute. cos/sin/mask travel with
            # their microbatch. Ring attention inside a stage would nest
            # shard_maps — reject the combination explicitly.
            if cfg.sequence_axis is not None:
                raise ValueError(
                    "pipeline_axis and sequence_axis cannot be combined "
                    "(ring attention inside a pipeline stage nests shard_maps)"
                )
            if adapter_route is not None:
                raise ValueError(
                    "adapter_route (multi-LoRA) is a serving feature and does "
                    "not compose with pipeline_axis (the route would have to "
                    "travel with each microbatch); merge or route on the host"
                )
            from teochat_tpu.parallel.pipeline import pipelined_scan_blocks

            def block_fn(xc, lp, cos_b, sin_b, mask_b):
                y, _, _ = layer_fn(
                    xc, lp, cfg, cos_b, sin_b, mask_b, None, None, None, None,
                    right_padded,
                )
                return y

            x = pipelined_scan_blocks(
                params["layers"], block_fn, x, (cos, sin, mask2d),
                axis_name=cfg.pipeline_axis,
                num_microbatches=cfg.pipeline_microbatches,
            )
        else:
            def body(carry, lp):
                y, _, _ = layer_fn(
                    carry, lp, cfg, cos, sin, mask2d, None, None, None, None,
                    right_padded, None, 0, False, act_quant_ok, 0, False,
                    adapter_route,
                )
                return y, None

            x, _ = jax.lax.scan(body, x, params["layers"])
        new_cache = None
    else:
        # fori_loop over layers with the STACKED cache buffers carried whole:
        # per-layer params come from a fused dynamic slice (same access
        # pattern scan generates) and cache updates are in-place scatters.
        # scan-with-ys would re-stack (copy) both full cache buffers per call.
        def _slice_layer(tree, l):
            # Slice per-layer params EXCEPT int4 packed groups: a dynamic
            # slice feeding a pallas custom call materializes the whole
            # layer's weights (no fusion across custom-call boundaries);
            # those stay stacked and the kernel selects the layer itself
            # via scalar prefetch (ops/int4_matmul.int4_matmul_tiled_stacked).
            if isinstance(tree, dict):
                if "packed" in tree or "packed_tiles" in tree:
                    # only the quantized group itself stays stacked; any other
                    # leaves (e.g. LoRA a/b/scale) must be layer-sliced like
                    # everything else or they reach the einsums un-sliced
                    return {
                        k: v if k in ("packed", "packed_tiles", "scale")
                        else _slice_layer(v, l)
                        for k, v in tree.items()
                    }
                return {k: _slice_layer(v, l) for k, v in tree.items()}
            return jax.lax.dynamic_index_in_dim(tree, l, 0, keepdims=False)

        def body(l, carry):
            y, kc, vc = carry
            lp = _slice_layer(params["layers"], l)
            y, kc, vc = layer_fn(
                y, lp, cfg, cos, sin, kv_mask, q_slots, kc, vc, write_slots,
                False, l, cache_row_offset, spec_verify, act_quant_ok,
                prefill_start, attend_cache, adapter_route,
            )
            return (y, kc, vc)

        x, new_k, new_v = jax.lax.fori_loop(
            0, cfg.num_layers, body, (x, cache.k, cache.v)
        )
        new_cache = KVCache(k=new_k, v=new_v)

    x = rms_norm(x, params["final_norm"]["scale"], cfg.rms_norm_eps)

    if logits_mode == "none":
        return x, new_cache
    if logits_mode == "last":
        if last_index is None:
            x = x[:, -1:]
        else:
            x = x[jnp.arange(b), last_index][:, None]
    head = params.get("lm_head")
    if head is None:  # tied embeddings
        logits = jnp.einsum(
            "bsd,vd->bsv", x, params["embed_tokens"]["embedding"].astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
    else:
        if "packed" in head or "packed_tiles" in head:  # int4 lm_head
            from teochat_tpu.ops.quant import int4_proj

            logits = int4_proj(x, head).astype(jnp.float32)
        else:
            logits = jnp.einsum(
                "bsd,dv->bsv", x, head["kernel"].astype(x.dtype),
                preferred_element_type=jnp.float32,
            )
            if "scale" in head:  # int8 weight-only lm_head
                logits = logits * head["scale"].astype(jnp.float32)
    return logits.astype(jnp.float32), new_cache


def init_llama(rng: jax.Array, cfg: LlamaConfig, dtype=jnp.float32) -> Params:
    """Random init (normal(0.02), HF default) with stacked layers."""
    keys = iter(jax.random.split(rng, 32))
    d, i_sz, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    hkv_d = cfg.num_kv_heads * cfg.head_dim
    std = 0.02

    def proj(key, fan_in, fan_out):
        return {
            "kernel": (jax.random.normal(key, (L, fan_in, fan_out)) * std).astype(dtype)
        }

    params = {
        "embed_tokens": {
            "embedding": (
                jax.random.normal(next(keys), (cfg.vocab_size, d)) * std
            ).astype(dtype)
        },
        "layers": {
            "input_norm": {"scale": jnp.ones((L, d), jnp.float32)},
            "attn": {
                "q": proj(next(keys), d, d),
                "k": proj(next(keys), d, hkv_d),
                "v": proj(next(keys), d, hkv_d),
                "out": proj(next(keys), d, d),
            },
            "post_attn_norm": {"scale": jnp.ones((L, d), jnp.float32)},
            "mlp": {
                "gate": proj(next(keys), d, i_sz),
                "up": proj(next(keys), d, i_sz),
                "down": proj(next(keys), i_sz, d),
            },
        },
        "final_norm": {"scale": jnp.ones((d,), jnp.float32)},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {
            "kernel": (jax.random.normal(next(keys), (d, cfg.vocab_size)) * std).astype(dtype)
        }
    return params

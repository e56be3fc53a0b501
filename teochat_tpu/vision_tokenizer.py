"""Vision-tokenizer special-token machinery: <im_patch> / <im_start> / <im_end>.

Behavior-parity rebuild of three reference sites:
- llava_arch.py:348-391 `initialize_vision_tokenizer` — train-time token add,
  embedding resize with MEAN-init of the new rows, optional embed-row load
  from a pretrained mm-projector checkpoint;
- model/builder.py:135-147 — load-time token add (patch tokens when
  `mm_use_im_patch_token`, start/end when `mm_use_im_start_end`) followed by
  `resize_token_embeddings(len(tokenizer))`;
- the `<im_start><image><im_end>` prompt wrap that `mm_use_im_start_end`
  implies (the TEOChat fork plumbs the flag at train.py:1083-1085; the wrap
  semantics come from upstream LLaVA's preprocess_multimodal, which this fork
  inherits the flag from).

TPU-different by design: torch mutates nn.Embedding buffers in place; here
resizing is a pure function over the param pytree — embed_tokens [V, D] gets
rows appended, lm_head [D, V] gets columns appended, and quantized lm_heads
(int8 {kernel, scale} / int4 {packed|packed_tiles, scale}) are dequantized,
resized, and requantized (per-output-column scales make the round trip exact
for the untouched columns). New rows/columns are the DETERMINISTIC mean of
the existing ones (reference llava_arch.py:358-367; HF's stochastic
mean-resizing is replaced by the plain mean so resizes are reproducible).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from teochat_tpu.constants import (
    DEFAULT_IM_END_TOKEN,
    DEFAULT_IM_START_TOKEN,
    DEFAULT_IMAGE_PATCH_TOKEN,
    DEFAULT_IMAGE_TOKEN,
    DEFAULT_VID_END_TOKEN,
    DEFAULT_VID_START_TOKEN,
    DEFAULT_VIDEO_PATCH_TOKEN,
)

Params = Dict[str, Any]


def wrap_image_tokens(text: str) -> str:
    """`<image>` -> `<im_start><image><im_end>` (upstream-LLaVA wrap).

    Applied to prompts only when the model was trained with
    `mm_use_im_start_end=True`. The wrap targets each `<image>` occurrence
    (not whole replacement strings) so interleaved prompts like
    "Image 1: <image>" keep their visible text outside the markers.
    """
    return text.replace(
        DEFAULT_IMAGE_TOKEN,
        DEFAULT_IM_START_TOKEN + DEFAULT_IMAGE_TOKEN + DEFAULT_IM_END_TOKEN,
    )


def add_vision_tokens(
    tokenizer,
    mm_use_im_patch_token: bool,
    mm_use_im_start_end: bool,
) -> int:
    """Add the special tokens the flags call for; return #new vocab entries.

    Mirrors builder.py:135-147: patch tokens first (image + video share the
    "<im_patch>" string, so the second add is a no-op), then the four
    start/end markers. Safe to call twice — HF add_tokens dedupes.
    """
    added = 0
    if mm_use_im_patch_token:
        added += tokenizer.add_tokens([DEFAULT_IMAGE_PATCH_TOKEN], special_tokens=True)
        added += tokenizer.add_tokens([DEFAULT_VIDEO_PATCH_TOKEN], special_tokens=True)
    if mm_use_im_start_end:
        added += tokenizer.add_tokens(
            [DEFAULT_IM_START_TOKEN, DEFAULT_IM_END_TOKEN], special_tokens=True
        )
        added += tokenizer.add_tokens(
            [DEFAULT_VID_START_TOKEN, DEFAULT_VID_END_TOKEN], special_tokens=True
        )
    return added


# ------------------------------------------------------------- resize core


def _dequant_lm_head(head: Params) -> jnp.ndarray:
    """Any lm_head leaf group -> fp32 [D, V]."""
    if "packed_tiles" in head or "packed" in head:
        from teochat_tpu.ops.quant import unpack_int4

        if "packed_tiles" in head:
            tiles = head["packed_tiles"]  # [n_tiles, in/2, bn]
            k2, bn = tiles.shape[-2:]
            flat = jnp.moveaxis(tiles, -3, -2).reshape(k2, -1)
        else:
            flat = head["packed"]
        w = unpack_int4(flat, jnp.float32)[..., : head["scale"].shape[-1]]
        return w * head["scale"].astype(jnp.float32)
    if "scale" in head:
        from teochat_tpu.ops.quant import dequantize_kernel

        return dequantize_kernel(head, jnp.float32)
    return jnp.asarray(head["kernel"], jnp.float32)


def _requant_lm_head(w: jnp.ndarray, like: Params) -> Params:
    """fp32 [D, V] -> the same quantization family as `like`."""
    if "packed_tiles" in like or "packed" in like:
        from teochat_tpu.ops.quant import quantize_kernel_int4

        return quantize_kernel_int4(w)
    if "scale" in like:
        from teochat_tpu.ops.quant import quantize_kernel

        return quantize_kernel(w)
    return {"kernel": w.astype(like["kernel"].dtype)}


def resize_token_embeddings(
    llm_params: Params,
    new_vocab: int,
    mean_init: bool = True,
) -> Params:
    """Pure-functional vocab resize of embed_tokens (+ lm_head when untied).

    Grow: new embed rows / lm_head columns are the mean of the existing ones
    (reference llava_arch.py:358-367). Shrink: truncate (HF
    resize_token_embeddings semantics). No-op when sizes already match.
    """
    emb = jnp.asarray(llm_params["embed_tokens"]["embedding"])
    old_vocab = emb.shape[0]
    if new_vocab == old_vocab:
        return llm_params

    out = dict(llm_params)
    if new_vocab < old_vocab:
        out["embed_tokens"] = {"embedding": emb[:new_vocab]}
        if "lm_head" in llm_params:
            w = _dequant_lm_head(llm_params["lm_head"])[:, :new_vocab]
            out["lm_head"] = _requant_lm_head(w, llm_params["lm_head"])
        return out

    n_new = new_vocab - old_vocab
    if mean_init:
        row = jnp.mean(emb.astype(jnp.float32), axis=0, keepdims=True)
    else:
        row = jnp.zeros((1, emb.shape[1]), jnp.float32)
    new_rows = jnp.tile(row, (n_new, 1)).astype(emb.dtype)
    out["embed_tokens"] = {"embedding": jnp.concatenate([emb, new_rows], axis=0)}

    if "lm_head" in llm_params:
        w = _dequant_lm_head(llm_params["lm_head"])  # [D, V]
        if mean_init:
            col = jnp.mean(w, axis=1, keepdims=True)
        else:
            col = jnp.zeros((w.shape[0], 1), jnp.float32)
        w = jnp.concatenate([w, jnp.tile(col, (1, n_new))], axis=1)
        out["lm_head"] = _requant_lm_head(w, llm_params["lm_head"])
    return out


# ----------------------------------------------------- train-time machinery


def initialize_vision_tokenizer(
    model_args,
    cfg,
    params: Params,
    tokenizer,
    pretrain_embed_rows: Optional[Any] = None,
) -> Tuple[Any, Params, int]:
    """Train-time token add + resize (reference llava_arch.py:348-391).

    Returns (cfg, params, num_new_tokens) with cfg.llm.vocab_size and the
    mm_use_* flags updated so checkpoints record what they were trained with.
    `pretrain_embed_rows` optionally carries the `model.embed_tokens.weight`
    array from a pretrain_mm_mlp_adapter checkpoint (llava_arch.py:375-387):
    its last num_new rows overwrite the mean-init input-embedding rows.
    """
    use_patch = bool(getattr(model_args, "mm_use_im_patch_token", False))
    use_start_end = bool(getattr(model_args, "mm_use_im_start_end", False))

    params = dict(params)
    llm = params["llm"]
    num_new = 0
    if use_patch:
        num_new += tokenizer.add_tokens(
            [DEFAULT_IMAGE_PATCH_TOKEN], special_tokens=True
        )
        llm = resize_token_embeddings(llm, len(tokenizer))
    if use_start_end:
        n = tokenizer.add_tokens(
            [DEFAULT_IM_START_TOKEN, DEFAULT_IM_END_TOKEN], special_tokens=True
        )
        num_new += n
        llm = resize_token_embeddings(llm, len(tokenizer))
        if n > 0 and pretrain_embed_rows is not None:
            rows = jnp.asarray(pretrain_embed_rows)
            emb = jnp.asarray(llm["embed_tokens"]["embedding"])
            if rows.shape == emb.shape:
                new_rows = rows[-n:]
            elif rows.shape[0] == n:
                new_rows = rows
            else:
                raise ValueError(
                    f"Unexpected embed_tokens shape from pretrain adapter: "
                    f"{rows.shape} vs current {emb.shape}, {n} new tokens"
                )
            llm = dict(llm)
            llm["embed_tokens"] = {
                "embedding": emb.at[-n:].set(new_rows.astype(emb.dtype))
            }
    params["llm"] = llm

    cfg = dataclasses.replace(
        cfg,
        llm=dataclasses.replace(cfg.llm, vocab_size=len(tokenizer)),
        mm_use_im_start_end=use_start_end,
        mm_use_im_patch_token=use_patch,
    )
    return cfg, params, num_new


def embed_trainable_filter(base_filter):
    """Wrap a trainable filter so input embeddings train too (and lm_head
    stays frozen) — the reference's tune_mm_mlp_adapter + mm_use_im_start_end
    gradient gating (llava_arch.py:369-374), expressed as a path predicate
    instead of requires_grad mutation."""

    def fn(path: str) -> bool:
        if "embed_tokens" in path:
            return True
        if "lm_head" in path:
            return False
        return base_filter(path) if base_filter is not None else True

    return fn

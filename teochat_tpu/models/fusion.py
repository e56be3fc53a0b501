"""Multimodal fusion core — static-shape rebuild of the reference's
`prepare_inputs_labels_for_multimodal` (llava_arch.py:148-346).

The reference builds ragged Python lists of tensors and concatenates per sample
on the GPU. On TPU that is a recompile storm; here fusion is split into:

1. `build_fusion_plan` (host, numpy): per row, expand each IMAGE_TOKEN_INDEX
   sentinel into `tokens_per_frame` vision slots, truncate to max_length
   (llava_arch.py:295-299), pad to a static bucket length, and emit pure
   gather indices: for every output position either a text-token index or an
   index into the flat [total_frames * tokens_per_frame] vision-token array.
   Labels get IGNORE_INDEX at vision/pad slots, mirroring the reference's
   label splicing.
2. `fuse` (device, jit-safe): one `jnp.where` over two gathers. No dynamic
   shapes, no per-sample Python, fully fusable by XLA.

Frames are consumed in flat batch order, matching the reference collator's
flattened `images` list contract (train.py:880-894) with one deliberate
divergence: text-only rows consume NO frame (the reference burns one dummy
image per imageless row, llava_arch.py:263 — a DeepSpeed gradient-flow hack);
correspondingly the dataset emits no dummy frames, so mixed text+image batches
stay frame-aligned end-to-end.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from teochat_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FusionPlan:
    """Static-shape gather plan; all arrays [B, L] unless noted."""

    text_ids: jnp.ndarray  # [B, Lt] sentinel-free token ids (sentinels -> 0)
    text_gather: jnp.ndarray  # index into text_ids row
    vis_gather: jnp.ndarray  # index into flat [N_frames * tokens_per_frame]
    is_vision: jnp.ndarray  # bool
    attention_mask: jnp.ndarray  # bool
    position_ids: jnp.ndarray  # int32
    labels: jnp.ndarray  # int32 (IGNORE_INDEX at vision/pad)
    seq_lens: jnp.ndarray  # [B] int32 fused lengths


def build_fusion_plan(
    input_ids: Sequence[Sequence[int]],
    *,
    labels: Optional[Sequence[Sequence[int]]] = None,
    tokens_per_frame: int = 256,
    max_length: int = 3072,
    pad_to: Optional[int] = None,
    image_token_index: int = IMAGE_TOKEN_INDEX,
) -> FusionPlan:
    """Build the gather plan on host.

    input_ids: per-row token lists containing `image_token_index` sentinels.
    Sentinels consume frames in flat order across the batch (row-major), i.e.
    frame j of the batch feeds the j-th sentinel encountered.
    """
    b = len(input_ids)
    rows = []
    frame_cursor = 0
    fused_lens = []
    for r in range(b):
        ids = list(input_ids[r])
        labs = list(labels[r]) if labels is not None else [0] * len(ids)
        if len(labs) != len(ids):
            raise ValueError(f"row {r}: labels length {len(labs)} != ids {len(ids)}")
        out = []  # (is_vision, text_pos_or_visflat, label)
        text_pos = 0
        for tok, lab in zip(ids, labs):
            if tok == image_token_index:
                for t in range(tokens_per_frame):
                    out.append((True, frame_cursor * tokens_per_frame + t, IGNORE_INDEX))
                frame_cursor += 1
                text_pos += 1  # sentinel occupies one slot in text_ids (zeroed)
            else:
                out.append((False, text_pos, lab))
                text_pos += 1
        out = out[:max_length]
        rows.append(out)
        fused_lens.append(len(out))

    L = pad_to if pad_to is not None else max(fused_lens) if fused_lens else 1
    if L < max(fused_lens, default=0):
        raise ValueError(f"pad_to={L} smaller than fused length {max(fused_lens)}")
    Lt = max((len(r) for r in input_ids), default=1)

    text_ids = np.zeros((b, Lt), np.int32)
    text_gather = np.zeros((b, L), np.int32)
    vis_gather = np.zeros((b, L), np.int32)
    is_vision = np.zeros((b, L), bool)
    attention_mask = np.zeros((b, L), bool)
    labels_out = np.full((b, L), IGNORE_INDEX, np.int32)

    for r in range(b):
        ids = list(input_ids[r])
        text_ids[r, : len(ids)] = [0 if t == image_token_index else t for t in ids]
        for pos, (isv, idx, lab) in enumerate(rows[r]):
            is_vision[r, pos] = isv
            if isv:
                vis_gather[r, pos] = idx
            else:
                text_gather[r, pos] = idx
            labels_out[r, pos] = lab
        attention_mask[r, : fused_lens[r]] = True

    position_ids = np.where(
        attention_mask, np.cumsum(attention_mask, axis=1) - 1, 0
    ).astype(np.int32)

    return FusionPlan(
        text_ids=jnp.asarray(text_ids),
        text_gather=jnp.asarray(text_gather),
        vis_gather=jnp.asarray(vis_gather),
        is_vision=jnp.asarray(is_vision),
        attention_mask=jnp.asarray(attention_mask),
        position_ids=jnp.asarray(position_ids),
        labels=jnp.asarray(labels_out),
        seq_lens=jnp.asarray(fused_lens, jnp.int32),
    )


def fuse(
    text_embeds: jnp.ndarray,  # [B, Lt, D]
    vision_tokens: jnp.ndarray,  # [N_frames, tokens_per_frame, D] (flat batch order)
    plan: FusionPlan,
) -> jnp.ndarray:
    """Splice vision tokens into the embedding sequence. Returns [B, L, D]."""
    d = text_embeds.shape[-1]
    vis_flat = vision_tokens.reshape(-1, d)
    from_text = jnp.take_along_axis(
        text_embeds, plan.text_gather[:, :, None], axis=1
    )
    from_vis = vis_flat[plan.vis_gather]  # [B, L, D]
    return jnp.where(plan.is_vision[:, :, None], from_vis, from_text)


def count_frames(input_ids: Sequence[Sequence[int]],
                 image_token_index: int = IMAGE_TOKEN_INDEX) -> int:
    return sum(sum(1 for t in row if t == image_token_index) for row in input_ids)

"""Weight-management utilities (SURVEY §2 M11).

Rebuilds: scripts/merge_lora_weights.py:11-31 (merge LoRA into a standalone
checkpoint), videollava/model/make_delta.py:13-41 / apply_delta.py:13-37
(base<->target weight deltas), model/consolidate.py:14-19 + model/utils.py:4-22
(checkpoint consolidation + config auto-upgrade). Hub upload
(scripts/upload_weights.py) is intentionally a stub: this deployment has no
egress; `upload_weights` raises with instructions.
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np

from teochat_tpu.checkpoint.orbax_io import load_checkpoint, save_checkpoint
from teochat_tpu.config import TEOChatConfig
from teochat_tpu.train.lora import merge_lora


def merge_lora_weights(model_path: str, save_path: str) -> str:
    """Load an Orbax checkpoint with LoRA leaves, merge, save standalone."""
    params, cfg, _ = load_checkpoint(model_path)
    params = dict(params)
    params["llm"] = merge_lora(params["llm"])
    return save_checkpoint(save_path, params, cfg)


def _tree_binary(a: Dict, b: Dict, op) -> Dict:
    return jax.tree.map(lambda x, y: op(np.asarray(x), np.asarray(y)), a, b)


def make_delta(base_params: Dict, target_params: Dict) -> Dict:
    """delta = target - base (reference make_delta.py:13-41)."""
    return _tree_binary(target_params, base_params, lambda t, b: t - b)


def apply_delta(base_params: Dict, delta_params: Dict) -> Dict:
    """target = base + delta (reference apply_delta.py:13-37)."""
    return _tree_binary(base_params, delta_params, lambda b, d: b + d)


def consolidate_ckpt(src_path: str, dst_path: str) -> str:
    """Re-save a checkpoint in consolidated form with an upgraded config
    (reference consolidate.py:14-19 + auto_upgrade, model/utils.py:4-22)."""
    params, cfg, _ = load_checkpoint(src_path)
    cfg = cfg or TEOChatConfig()
    return save_checkpoint(dst_path, params, cfg)


def upload_weights(*args, **kwargs):
    raise RuntimeError(
        "hub upload is unavailable in this egress-free deployment; copy the "
        "Orbax checkpoint directory and push from a networked machine "
        "(reference scripts/upload_weights.py equivalent)"
    )

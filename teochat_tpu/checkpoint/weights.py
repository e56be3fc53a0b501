"""Weight-management utilities (SURVEY §2 M11).

Rebuilds: scripts/merge_lora_weights.py:11-31 (merge LoRA into a standalone
checkpoint), videollava/model/make_delta.py:13-41 / apply_delta.py:13-37
(base<->target weight deltas), model/consolidate.py:14-19 + model/utils.py:4-22
(checkpoint consolidation + config auto-upgrade), and hub upload
(scripts/upload_weights.py:15-28) with an INJECTED transport: artifact
collection (the checkpoint tree + tokenizer files, repo-relative names) is
pure logic tested offline; the network client is a swappable callable whose
default uses huggingface_hub when available (this image has no egress, so the
default only ever runs elsewhere).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

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


_TOKENIZER_FILES = (
    # what AutoTokenizer.push_to_hub ships for a LLaMA/sentencepiece tokenizer
    "tokenizer.model",
    "tokenizer.json",
    "tokenizer_config.json",
    "special_tokens_map.json",
    "added_tokens.json",
)


def collect_upload_files(
    model_path: str, tokenizer_path: Optional[str] = None
) -> Dict[str, str]:
    """Map repo-relative names -> local paths for everything a hub push ships.

    Mirrors the reference upload (scripts/upload_weights.py:15-28): the model
    artifacts (here: the whole Orbax checkpoint tree + config) plus the
    tokenizer files from `tokenizer_path` (the reference's --model-base).
    Tokenizer files that don't exist are skipped (a fast tokenizer has no
    tokenizer.model, a slow one no tokenizer.json)."""
    if not os.path.isdir(model_path):
        raise FileNotFoundError(f"checkpoint directory not found: {model_path}")
    files: Dict[str, str] = {}
    for root, _, names in os.walk(model_path):
        for name in names:
            local = os.path.join(root, name)
            rel = os.path.relpath(local, model_path)
            files[rel.replace(os.sep, "/")] = local
    if not files:
        raise FileNotFoundError(f"checkpoint directory is empty: {model_path}")
    if tokenizer_path is not None:
        for name in _TOKENIZER_FILES:
            local = os.path.join(tokenizer_path, name)
            if os.path.exists(local):
                files[name] = local
    return files


def _hf_hub_transport(repo_id: str, files: Dict[str, str], private: bool) -> None:
    """Default transport: huggingface_hub (only usable off this machine)."""
    try:
        from huggingface_hub import HfApi
    except ImportError as e:  # pragma: no cover - hf_hub ships with transformers
        raise RuntimeError(
            "hub upload needs huggingface_hub (and network egress); copy the "
            "checkpoint directory and push from a networked machine, or pass "
            "transport="
        ) from e
    api = HfApi()
    api.create_repo(repo_id, private=private, exist_ok=True)
    for rel, local in sorted(files.items()):
        api.upload_file(path_or_fileobj=local, path_in_repo=rel, repo_id=repo_id)


def upload_weights(
    model_path: str,
    repo_id: str,
    *,
    tokenizer_path: Optional[str] = None,
    private: bool = False,
    transport: Optional[Callable[[str, Dict[str, str], bool], None]] = None,
) -> Dict[str, str]:
    """Push a checkpoint (+ tokenizer) to a model hub repo.

    Reference scripts/upload_weights.py:15-28 loads the model and calls
    push_to_hub for model and tokenizer; here the artifact set is collected
    as files and handed to `transport(repo_id, files, private)` — inject a
    fake to test, or any non-HF registry client in production. Returns the
    uploaded file map."""
    files = collect_upload_files(model_path, tokenizer_path)
    (transport or _hf_hub_transport)(repo_id, files, private)
    return files

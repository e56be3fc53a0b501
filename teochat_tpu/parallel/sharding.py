"""Partition-spec rules: Megatron-style TP + ZeRO-style FSDP via GSPMD.

Path-pattern rules map every param in the {'vision','projector','llm'} pytree
to a PartitionSpec over the (data, fsdp, model) mesh:

- column-parallel projections (q/k/v, mlp gate/up, fc1) shard their OUTPUT dim
  on `model` and input dim on `fsdp`;
- row-parallel projections (attn out, mlp down, fc2) shard their INPUT dim on
  `model` and output on `fsdp` (XLA inserts the reduce-scatter/all-reduce);
- embeddings/lm_head shard vocab on `model`, hidden on `fsdp`;
- norms/biases replicate (tiny).

This replaces DeepSpeed ZeRO-2/3 param+optimizer sharding (reference
scripts/zero*.json) — optimizer state inherits the param specs, so "stage 3"
falls out of pjit with no offload machinery.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, spec) — first match wins. Paths look like
# "llm/layers/attn/q/kernel"; stacked layer arrays carry a leading layer dim.
_RULES: Tuple[Tuple[str, P], ...] = (
    # --- LLaMA decoder (stacked [L, ...]) ---
    (r"llm/layers/attn/(q|k|v)/kernel$", P(None, "fsdp", "model")),
    (r"llm/layers/attn/out/kernel$", P(None, "model", "fsdp")),
    (r"llm/layers/mlp/(gate|up)/kernel$", P(None, "fsdp", "model")),
    (r"llm/layers/mlp/down/kernel$", P(None, "model", "fsdp")),
    (r"llm/layers/.*norm.*$", P()),
    (r"llm/embed_tokens/embedding$", P("model", "fsdp")),
    (r"llm/lm_head/kernel$", P("fsdp", "model")),
    (r"llm/final_norm/.*$", P()),
    # --- int8 quant scales follow their kernel's output dim ---
    (r"llm/layers/attn/(q|k|v)/scale$", P(None, "model")),
    (r"llm/layers/attn/out/scale$", P(None, "fsdp")),
    (r"llm/layers/mlp/(gate|up)/scale$", P(None, "model")),
    (r"llm/layers/mlp/down/scale$", P(None, "fsdp")),
    (r"llm/lm_head/scale$", P("model")),
    # --- int4 packed weights (ops/quant.py:153-176). Flat 'packed'
    # [L, in/2, out] mirrors its kernel's spec; tile-contiguous 'packed_tiles'
    # [L, out/bn, in/2, bn] shards the tile axis along the kernel's OUTPUT
    # mesh axis (so packed weights + their scales land on the same devices).
    # NB: multi-chip capacity/TP win applies to the XLA dequant path; the
    # single-chip Pallas kernel would need a shard_map wrapper to run on
    # device-local tiles (not needed until real multi-chip hardware).
    (r"llm/layers/attn/(q|k|v)/packed$", P(None, "fsdp", "model")),
    (r"llm/layers/attn/out/packed$", P(None, "model", "fsdp")),
    (r"llm/layers/mlp/(gate|up)/packed$", P(None, "fsdp", "model")),
    (r"llm/layers/mlp/down/packed$", P(None, "model", "fsdp")),
    (r"llm/lm_head/packed$", P("fsdp", "model")),
    (r"llm/layers/attn/(q|k|v)/packed_tiles$", P(None, "model", "fsdp", None)),
    (r"llm/layers/attn/out/packed_tiles$", P(None, "fsdp", "model", None)),
    (r"llm/layers/mlp/(gate|up)/packed_tiles$", P(None, "model", "fsdp", None)),
    (r"llm/layers/mlp/down/packed_tiles$", P(None, "fsdp", "model", None)),
    (r"llm/lm_head/packed_tiles$", P("model", "fsdp", None)),
    # --- fused q|k|v and gate|up projections (quantize-time concat,
    # ops/quant.py fuse_projections): column-parallel like their parts; the
    # tile axis is the fused OUTPUT dim ---
    (r"llm/layers/(attn/qkv|mlp/gateup)/kernel$", P(None, "fsdp", "model")),
    (r"llm/layers/(attn/qkv|mlp/gateup)/scale$", P(None, "model")),
    (r"llm/layers/(attn/qkv|mlp/gateup)/packed$", P(None, "fsdp", "model")),
    (r"llm/layers/(attn/qkv|mlp/gateup)/packed_tiles$",
     P(None, "model", "fsdp", None)),
    # --- MPT decoder (models/mpt.py; stacked [L, ...], flat layer dicts):
    # Megatron split — packed Wqkv/up column-parallel, out/down row-parallel;
    # biases and int8 scales follow their kernel's output mesh axis ---
    (r"llm/layers/wqkv/kernel$", P(None, "fsdp", "model")),
    (r"llm/layers/out_proj/kernel$", P(None, "model", "fsdp")),
    (r"llm/layers/up_proj/kernel$", P(None, "fsdp", "model")),
    (r"llm/layers/down_proj/kernel$", P(None, "model", "fsdp")),
    (r"llm/layers/(wqkv|up_proj)/(bias|scale)$", P(None, "model")),
    (r"llm/layers/(out_proj|down_proj)/(bias|scale)$", P(None, "fsdp")),
    (r"llm/layers/(norm1|norm2)/.*$", P()),
    (r"llm/wte/embedding$", P("model", "fsdp")),
    # --- Vision tower (stacked [L, ...]) ---
    (r"vision/layers/(temporal_attn|attn)/(q|k|v)/kernel$", P(None, "fsdp", "model")),
    (r"vision/layers/(temporal_attn|attn)/(q|k|v)/bias$", P(None, "model")),
    (r"vision/layers/(temporal_attn|attn)/out/kernel$", P(None, "model", "fsdp")),
    (r"vision/layers/mlp/fc1/kernel$", P(None, "fsdp", "model")),
    (r"vision/layers/mlp/fc1/bias$", P(None, "model")),
    (r"vision/layers/mlp/fc2/kernel$", P(None, "model", "fsdp")),
    (r"vision/(patch_embedding/kernel|position_embedding)$", P(None, "fsdp")),
    # --- Projector ---
    (r"projector/layers/\d+/kernel$", P("fsdp", "model")),
    # --- LoRA adapters: A column-ish, B row-ish ---
    (r".*/lora_a$", P(None, "fsdp", None)),
    (r".*/lora_b$", P(None, None, "model")),
)

_DEFAULT = P()


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def spec_for_path(path_s: str) -> P:
    for pattern, spec in _RULES:
        if re.search(pattern, path_s):
            return spec
    return _DEFAULT


def _fit_spec(spec: P, shape, mesh: Mesh) -> P:
    """Drop mesh axes a leaf dim can't divide (e.g. a 1-tile packed_tiles
    axis over model=2) — GSPMD requires divisibility; replicating that dim
    is the correct degradation."""
    axes = []
    for i, ax in enumerate(spec):
        if ax is None:
            axes.append(None)
            continue
        names = ax if isinstance(ax, tuple) else (ax,)
        size = 1
        for n in names:
            size *= mesh.shape[n]
        axes.append(ax if shape[i] % size == 0 else None)
    return P(*axes)


def param_specs(params: Dict, mesh: Mesh = None) -> Dict:
    """Pytree of PartitionSpecs mirroring `params`.

    With `mesh`, specs are fitted to each leaf (axes whose dim isn't
    divisible by the mesh axis size fall back to replicated)."""

    def leaf_spec(path, leaf):
        path_s = _path_str(path)
        spec = spec_for_path(path_s)
        if (
            path_s.endswith(("lora_a", "lora_b"))
            and leaf.ndim == len(spec) + 1
        ):
            # adapter-stacked multi-LoRA leaf [L, A, in, r]: the extra
            # adapter axis (small, serving-only) replicates; in/rank keep
            # the single-adapter rule's placement
            spec = P(spec[0], None, *spec[1:])
        # drop axes that exceed the leaf's rank (e.g. unstacked variants)
        if len(spec) > leaf.ndim:
            spec = P(*spec[: leaf.ndim])
        if (
            mesh is not None
            and "pipe" in mesh.shape
            and path_s.startswith("llm/layers/")
            and leaf.ndim >= 1
            and (len(spec) == 0 or spec[0] is None)
        ):
            # pipeline parallelism (parallel/pipeline.py): the stacked layer
            # axis shards over `pipe` so each stage's slab is device-resident
            rest = tuple(spec[1:]) if len(spec) else ()
            spec = P("pipe", *rest)
        if mesh is not None:
            spec = _fit_spec(spec, leaf.shape, mesh)
        return spec

    return jax.tree_util.tree_map_with_path(leaf_spec, params)


def shard_params(params: Dict, mesh: Mesh) -> Dict:
    """Place params on the mesh per the rules (device_put with NamedSharding)."""
    specs = param_specs(params, mesh)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def batch_spec(train: bool = False) -> P:
    """Leading-batch activation spec: data(+fsdp) sharded."""
    return P(("data", "fsdp")) if train else P("data")


def cache_spec() -> P:
    """KV cache [L, 2, B, T, H_kv, D]: batch on data, kv heads on model."""
    return P(None, None, "data", None, "model", None)


def constrain(x, mesh: Mesh, spec: P):
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

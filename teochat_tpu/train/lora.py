"""LoRA adapters — functional, pytree-native (the peft replacement).

Reference recipe (train.py:990-1006): r=128, alpha=256, dropout 0.05 (noop at
our bf16 inference), applied to EVERY decoder Linear (find_all_linear_names,
train.py:176-189). Here adapters are extra leaves inside each projection's
param dict — {'lora_a': [L, in, r], 'lora_b': [L, r, out], 'lora_scale'} —
applied in llama._proj as y += (x @ A) @ B * scale. The backbone kernel may be
int8 (LoRA over a quantized base = the reference's 8-bit k-bit training path).

`merge_lora` folds adapters into the kernels, the merge_lora_weights.py
equivalent for deployment.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

LORA_TARGET_GROUPS = ("attn", "mlp")  # all decoder linears (llama layout)
LORA_TARGET_NAMES = {
    "attn": ("q", "k", "v", "out"),
    "mlp": ("gate", "up", "down"),
}
# MPT layout (models/mpt.py): flat projection dicts inside layers
MPT_TARGET_NAMES = ("wqkv", "out_proj", "up_proj", "down_proj")


def add_lora_params(
    rng: jax.Array,
    llm_params: Dict,
    rank: int = 128,
    alpha: float = 256.0,
    dtype=jnp.float32,
    include_lm_head: bool = False,
) -> Dict:
    """Attach zero-initialized LoRA adapters (A ~ N(0, 1/r), B = 0, peft init)."""
    out = {k: v for k, v in llm_params.items()}
    layers = {k: (dict(v) if isinstance(v, dict) else v) for k, v in llm_params["layers"].items()}
    keys = iter(jax.random.split(rng, 16))

    def attach(proj: Dict) -> Dict:
        proj = dict(proj)
        kern = proj["kernel"]
        n_layers, fan_in, fan_out = kern.shape
        proj["lora_a"] = (
            jax.random.normal(next(keys), (n_layers, fan_in, rank)) * (rank ** -0.5)
        ).astype(dtype)
        proj["lora_b"] = jnp.zeros((n_layers, rank, fan_out), dtype)
        # per-layer so lax.scan can slice the leading axis like every
        # other stacked leaf
        proj["lora_scale"] = jnp.full((n_layers,), alpha / rank, jnp.float32)
        return proj

    if "wqkv" in layers:  # MPT backend (reference trains LLaVA-MPT with LoRA)
        for name in MPT_TARGET_NAMES:
            layers[name] = attach(layers[name])
    else:
        for group in LORA_TARGET_GROUPS:
            layers[group] = {
                name: attach(layers[group][name])
                for name in LORA_TARGET_NAMES[group]
            }
    out["layers"] = layers
    if include_lm_head and "lm_head" in out:
        head = dict(out["lm_head"])
        fan_in, fan_out = head["kernel"].shape[-2:]
        head["lora_a"] = (
            jax.random.normal(next(keys), (fan_in, rank)) * (rank ** -0.5)
        ).astype(dtype)
        head["lora_b"] = jnp.zeros((rank, fan_out), dtype)
        head["lora_scale"] = jnp.asarray(alpha / rank, jnp.float32)
        out["lm_head"] = head
    return out


def merge_lora(llm_params: Dict) -> Dict:
    """Fold adapters into kernels; drop the lora leaves (merge_and_unload)."""

    def merge_proj(proj: Dict) -> Dict:
        if "lora_a" not in proj:
            return proj
        a = jnp.asarray(proj["lora_a"], jnp.float32)
        b = jnp.asarray(proj["lora_b"], jnp.float32)
        scale = jnp.asarray(proj["lora_scale"], jnp.float32)
        if scale.ndim == 1:  # stacked per-layer scale -> broadcast over (in, out)
            scale = scale[:, None, None]
        delta = jnp.einsum("...ir,...ro->...io", a, b) * scale
        kern = proj["kernel"]
        if kern.dtype == jnp.int8:
            raise ValueError(
                "cannot merge LoRA into int8 weights; dequantize first or keep "
                "adapters unmerged (the reference also skips merge under 8-bit, "
                "builder.py:65-72)"
            )
        merged = (kern.astype(jnp.float32) + delta).astype(kern.dtype)
        rest = {
            k: v for k, v in proj.items()
            if k not in ("kernel", "lora_a", "lora_b", "lora_scale")
        }  # keep bias (MPT no_bias=False configs) and any other leaves
        return {"kernel": merged, **rest}

    out = {k: v for k, v in llm_params.items()}
    layers = {}
    for gname, group in llm_params["layers"].items():
        if gname in LORA_TARGET_GROUPS:
            layers[gname] = {n: merge_proj(p) for n, p in group.items()}
        elif gname in MPT_TARGET_NAMES:
            layers[gname] = merge_proj(group)
        else:
            layers[gname] = group
    out["layers"] = layers
    if "lm_head" in out and "lora_a" in out["lm_head"]:
        out["lm_head"] = merge_proj(out["lm_head"])
    return out


def stack_lora_adapters(llm_params_list) -> Dict:
    """Stack N single-adapter LLM param trees into ONE multi-LoRA tree.

    Every tree must share the same base weights and LoRA rank; only the
    adapter leaves may differ. The result carries adapter-stacked leaves —
    lora_a [L, A, in, r], lora_b [L, A, r, out], lora_scale [L, A] — which
    llama._proj routes per batch row via the `adapter_route` forward argument
    (serving: BatchEngine submit(..., adapter=i)). Base weights (incl. int8 /
    int4 quantized kernels) are taken from the FIRST tree and shared: the
    adapters are the only per-variant state, so N fine-tunes serve from one
    backbone's HBM footprint plus N rank-r adapter sets.

    Beyond-reference: the reference serves one merged LoRA checkpoint per
    process (builder.py:37-72 merge_and_unload); multi-LoRA serving has no
    reference counterpart.
    """
    if not llm_params_list:
        raise ValueError("stack_lora_adapters needs at least one adapter tree")
    first = llm_params_list[0]

    def stack_proj(projs):
        p0 = dict(projs[0])
        if "lora_a" not in p0:
            return p0
        ranks = {p["lora_a"].shape[-1] for p in projs}
        if len(ranks) != 1:
            raise ValueError(
                f"all adapters must share one LoRA rank; got {sorted(ranks)}"
            )
        p0["lora_a"] = jnp.stack([p["lora_a"] for p in projs], axis=1)
        p0["lora_b"] = jnp.stack([p["lora_b"] for p in projs], axis=1)
        p0["lora_scale"] = jnp.stack(
            [jnp.asarray(p["lora_scale"], jnp.float32) for p in projs], axis=1
        )
        return p0

    out = {k: v for k, v in first.items()}
    layers = {}
    for gname, group in first["layers"].items():
        if gname in LORA_TARGET_GROUPS and isinstance(group, dict) and all(
            isinstance(v, dict) for v in group.values()
        ):
            layers[gname] = {
                n: stack_proj([t["layers"][gname][n] for t in llm_params_list])
                for n in group
            }
        elif gname in MPT_TARGET_NAMES:
            layers[gname] = stack_proj(
                [t["layers"][gname] for t in llm_params_list]
            )
        else:
            layers[gname] = group
    out["layers"] = layers
    return out


def adapter_route(adapter_ids, num_adapters: int) -> jnp.ndarray:
    """[B] adapter indices -> [B, A] one-hot routing matrix; id -1 = base
    model only (all-zero row). The forward's `adapter_route` argument."""
    ids = jnp.asarray(adapter_ids, jnp.int32)
    return jax.nn.one_hot(ids, num_adapters, dtype=jnp.float32) * (
        ids >= 0
    )[..., None].astype(jnp.float32)


def num_stacked_adapters(llm_params) -> int:
    """Adapter count A of a multi-LoRA tree (0 = single-adapter or no LoRA)."""
    layers = llm_params.get("layers", {})
    for gname in (*LORA_TARGET_GROUPS, *MPT_TARGET_NAMES):
        group = layers.get(gname)
        if not isinstance(group, dict):
            continue
        projs = group.values() if "lora_a" not in group else [group]
        for p in projs:
            if isinstance(p, dict) and "lora_a" in p:
                a = p["lora_a"]
                return a.shape[1] if a.ndim == 4 else 0
    return 0


def lora_trainable_filter(path: str) -> bool:
    """Trainable-param predicate for make_train_step: LoRA adapters + the
    projector (reference: LoRA on LLM, mm_projector tuned with its own lr)."""
    return (
        path.endswith("lora_a")
        or path.endswith("lora_b")
        or "/projector/" in path
        or path.startswith("projector/")
    )

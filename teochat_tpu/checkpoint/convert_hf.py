"""HF checkpoint -> JAX pytree converters.

Ingests the reference's checkpoint artifact shapes (SURVEY §5 checkpoint/resume):
merged LLaVA-LLaMA weights (jirvin16/TEOChat layout), the LanguageBind image
tower (HF CLIPVisionModel layout), `mm_projector.bin` adapter dicts, and peft
LoRA adapters + non_lora_trainables.bin (builder.py:37-72 load path).

Everything is numpy in / pytree-of-numpy out; callers place results on device
with the sharding layer. Per-layer HF weights are STACKED along a leading layer
axis to match the scan-over-layers model layout.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Optional

import numpy as np

from teochat_tpu.config import LlamaConfig, ProjectorConfig, VisionConfig


def _np(t: Any) -> np.ndarray:
    """torch.Tensor | np.ndarray -> np.ndarray (fp32 for bf16 safety)."""
    if isinstance(t, np.ndarray):
        return t
    # torch tensor path without importing torch at module scope
    t = t.detach().cpu()
    if str(t.dtype) == "torch.bfloat16":
        t = t.float()
    return t.numpy()


def _stack(sd: Mapping[str, Any], fmt: str, n: int, transpose: bool = False) -> np.ndarray:
    arrs = [_np(sd[fmt.format(i=i)]) for i in range(n)]
    if transpose:
        arrs = [a.T for a in arrs]
    return np.stack(arrs, axis=0)


def convert_clip_vision(sd: Mapping[str, Any], cfg: VisionConfig,
                        prefix: str = "vision_model.") -> Dict:
    """HF CLIPVisionModel state_dict -> vit.py param pytree.

    Handles the LanguageBind video-tower extras (temporal_attn/temporal_ln/
    temporal_embedding) when cfg.add_time_attn.
    """
    p = prefix
    L = cfg.num_layers
    d = cfg.hidden_size

    conv = _np(sd[f"{p}embeddings.patch_embedding.weight"])  # [D,3,P,P]
    patch_kernel = conv.reshape(d, -1).T  # -> [3*P*P, D], flatten order (c,ph,pw)

    def ln(name_fmt: str, stacked: bool) -> Dict:
        if stacked:
            return {
                "scale": _stack(sd, name_fmt + ".weight", L).astype(np.float32),
                "bias": _stack(sd, name_fmt + ".bias", L).astype(np.float32),
            }
        return {
            "scale": _np(sd[name_fmt + ".weight"]).astype(np.float32),
            "bias": _np(sd[name_fmt + ".bias"]).astype(np.float32),
        }

    def attn(base: str) -> Dict:
        return {
            "q": {
                "kernel": _stack(sd, f"{base}.q_proj.weight", L, transpose=True),
                "bias": _stack(sd, f"{base}.q_proj.bias", L),
            },
            "k": {
                "kernel": _stack(sd, f"{base}.k_proj.weight", L, transpose=True),
                "bias": _stack(sd, f"{base}.k_proj.bias", L),
            },
            "v": {
                "kernel": _stack(sd, f"{base}.v_proj.weight", L, transpose=True),
                "bias": _stack(sd, f"{base}.v_proj.bias", L),
            },
            "out": {
                "kernel": _stack(sd, f"{base}.out_proj.weight", L, transpose=True),
                "bias": _stack(sd, f"{base}.out_proj.bias", L),
            },
        }

    layers = {
        "ln1": ln(f"{p}encoder.layers.{{i}}.layer_norm1", True),
        "attn": attn(f"{p}encoder.layers.{{i}}.self_attn"),
        "ln2": ln(f"{p}encoder.layers.{{i}}.layer_norm2", True),
        "mlp": {
            "fc1": {
                "kernel": _stack(sd, f"{p}encoder.layers.{{i}}.mlp.fc1.weight", L, True),
                "bias": _stack(sd, f"{p}encoder.layers.{{i}}.mlp.fc1.bias", L),
            },
            "fc2": {
                "kernel": _stack(sd, f"{p}encoder.layers.{{i}}.mlp.fc2.weight", L, True),
                "bias": _stack(sd, f"{p}encoder.layers.{{i}}.mlp.fc2.bias", L),
            },
        },
    }
    if cfg.add_time_attn:
        layers["temporal_ln"] = ln(f"{p}encoder.layers.{{i}}.temporal_layer_norm1", True)
        layers["temporal_attn"] = attn(f"{p}encoder.layers.{{i}}.temporal_attn")
        # HF shape [1, num_frames, D] -> [num_frames, D], stacked over layers
        layers["temporal_embedding"] = np.stack(
            [
                _np(sd[f"{p}encoder.layers.{i}.temporal_embedding"]).reshape(
                    cfg.num_frames, d
                )
                for i in range(L)
            ],
            axis=0,
        )

    # HF names the pre-LN "pre_layrnorm" (sic)
    pre_key = f"{p}pre_layrnorm" if f"{p}pre_layrnorm.weight" in sd else f"{p}pre_layernorm"
    return {
        "patch_embedding": {"kernel": patch_kernel},
        "class_embedding": _np(sd[f"{p}embeddings.class_embedding"]),
        "position_embedding": _np(sd[f"{p}embeddings.position_embedding.weight"]),
        "pre_layernorm": ln(pre_key, False),
        "post_layernorm": ln(f"{p}post_layernorm", False),
        "layers": layers,
    }


def convert_llama(sd: Mapping[str, Any], cfg: LlamaConfig,
                  prefix: str = "model.") -> Dict:
    """HF LlamaForCausalLM state_dict -> llama.py param pytree."""
    p = prefix
    L = cfg.num_layers

    def proj(base: str) -> Dict:
        return {"kernel": _stack(sd, base + ".weight", L, transpose=True)}

    params = {
        "embed_tokens": {"embedding": _np(sd[f"{p}embed_tokens.weight"])},
        "layers": {
            "input_norm": {"scale": _stack(sd, f"{p}layers.{{i}}.input_layernorm.weight", L)},
            "attn": {
                "q": proj(f"{p}layers.{{i}}.self_attn.q_proj"),
                "k": proj(f"{p}layers.{{i}}.self_attn.k_proj"),
                "v": proj(f"{p}layers.{{i}}.self_attn.v_proj"),
                "out": proj(f"{p}layers.{{i}}.self_attn.o_proj"),
            },
            "post_attn_norm": {
                "scale": _stack(sd, f"{p}layers.{{i}}.post_attention_layernorm.weight", L)
            },
            "mlp": {
                "gate": proj(f"{p}layers.{{i}}.mlp.gate_proj"),
                "up": proj(f"{p}layers.{{i}}.mlp.up_proj"),
                "down": proj(f"{p}layers.{{i}}.mlp.down_proj"),
            },
        },
        "final_norm": {"scale": _np(sd[f"{p}norm.weight"])},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"kernel": _np(sd["lm_head.weight"]).T}
    return params


def convert_projector(sd: Mapping[str, Any], cfg: ProjectorConfig,
                      prefix: str = "model.mm_projector.") -> Dict:
    """mm_projector state dict -> projector.py pytree.

    The reference saves keys like `model.mm_projector.0.weight` (Sequential
    indices 0, 2, 4... with GELU at odd slots) or bare `0.weight`.
    """
    if cfg.depth == 0:
        return {}
    keys = {k[len(prefix):] if k.startswith(prefix) else k: v for k, v in sd.items()}
    if cfg.projector_type == "linear" and "weight" in keys:
        return {"layers": [{"kernel": _np(keys["weight"]).T, "bias": _np(keys["bias"])}]}
    layers = []
    idxs = sorted(
        {int(m.group(1)) for k in keys if (m := re.match(r"^(\d+)\.weight$", k))}
    )
    for i in idxs:
        layers.append({"kernel": _np(keys[f"{i}.weight"]).T, "bias": _np(keys[f"{i}.bias"])})
    if len(layers) != cfg.depth:
        raise ValueError(
            f"projector depth mismatch: found {len(layers)}, config wants {cfg.depth}"
        )
    return {"layers": layers}


_PEFT_NAME_MAP = {
    "self_attn.q_proj": ("attn", "q"),
    "self_attn.k_proj": ("attn", "k"),
    "self_attn.v_proj": ("attn", "v"),
    "self_attn.o_proj": ("attn", "out"),
    "mlp.gate_proj": ("mlp", "gate"),
    "mlp.up_proj": ("mlp", "up"),
    "mlp.down_proj": ("mlp", "down"),
}


def _peft_lora_pairs(lora_sd: Mapping[str, Any]) -> Dict:
    """Parse peft keys (`base_model.model.model.layers.{i}.<module>.lora_A/\
B.weight`) into {(layer, module): {"A": [r, in], "B": [out, r]}}."""
    norm = {}
    for k, v in lora_sd.items():
        k2 = re.sub(r"^(base_model\.model\.)?(model\.)?", "", k)
        k2 = k2.replace(".default.weight", ".weight")
        norm[k2] = v
    pairs = {}
    for k in norm:
        m = re.match(r"^layers\.(\d+)\.(.+)\.lora_A\.weight$", k)
        if m:
            pairs.setdefault((int(m.group(1)), m.group(2)), {})["A"] = norm[k]
        m = re.match(r"^layers\.(\d+)\.(.+)\.lora_B\.weight$", k)
        if m:
            pairs.setdefault((int(m.group(1)), m.group(2)), {})["B"] = norm[k]
    return pairs


def attach_lora_to_llama(
    params: Dict,
    lora_sd: Mapping[str, Any],
    cfg: LlamaConfig,
    rank: Optional[int] = None,
    alpha: Optional[float] = None,
) -> Dict:
    """Attach peft LoRA A/B pairs as UNMERGED adapter leaves.

    The multi-LoRA serving loader (builder.load_multi_lora): the base kernels
    stay untouched (they may be int8/int4 — merging needs fp weights,
    reference builder.py:65-72 skips merge under 8-bit for the same reason)
    and each projection gains lora_a [L, in, r] / lora_b [L, r, out] /
    lora_scale [L] leaves, llama._proj's adapter layout. Projections absent
    from the checkpoint get zero adapters at the shared rank.
    """
    pairs = _peft_lora_pairs(lora_sd)
    if not pairs:
        raise ValueError("no LoRA A/B pairs found in adapter state dict")
    if rank is None:
        rank = _np(next(iter(pairs.values()))["A"]).shape[0]
    alpha = alpha if alpha is not None else 2 * rank
    L = cfg.num_layers

    def stacks(module):
        """(A_stack [L, in, r], B_stack [L, r, out]) for one peft module;
        widths come from the adapter tensors themselves (zero-filled layers
        copy a present layer's shape), so quantized bases need no fp kernel."""
        present = [(l, ab) for (l, m), ab in pairs.items() if m == module]
        if not present:
            raise ValueError(f"adapter has no LoRA pair for {module}")
        a0 = _np(present[0][1]["A"])
        b0 = _np(present[0][1]["B"])
        if a0.shape[0] != rank:
            raise ValueError(
                f"adapter rank mismatch in {module}: {a0.shape[0]} vs {rank}"
            )
        a_rows = [np.zeros((a0.shape[1], rank), np.float32)] * L
        b_rows = [np.zeros((rank, b0.shape[0]), np.float32)] * L
        for l, ab in present:
            a_rows[l] = _np(ab["A"]).astype(np.float32).T
            b_rows[l] = _np(ab["B"]).astype(np.float32).T
        return np.stack(a_rows), np.stack(b_rows)

    def block_diag_b(parts):
        """[L, r, out_i] parts -> [L, len(parts)*r, sum(out_i)] block
        diagonal: the fused-projection adapter (delta_qkv = [xA_qB_q | ...])."""
        L_, r_ = parts[0].shape[:2]
        total = sum(p.shape[2] for p in parts)
        out = np.zeros((L_, len(parts) * r_, total), np.float32)
        col = 0
        for i, p in enumerate(parts):
            out[:, i * r_:(i + 1) * r_, col:col + p.shape[2]] = p
            col += p.shape[2]
        return out

    import jax

    out = jax.tree.map(lambda x: x, params)  # shallow structural copy
    layers = {
        g: (dict(v) if isinstance(v, dict) else v)
        for g, v in out["layers"].items()
    }
    mods = {name: stacks(module)
            for module, (group, name) in _PEFT_NAME_MAP.items()}
    # fused quantized layouts (ops/quant.py fuse_projections) take the
    # block-composed adapter: A columns concatenate (rank 3r / 2r), B goes
    # block-diagonal, so delta == per-projection deltas side by side
    fused = {}
    if "qkv" in layers["attn"]:
        fused["attn", "qkv"] = ("q", "k", "v")
    if "gateup" in layers["mlp"]:
        fused["mlp", "gateup"] = ("gate", "up")
    consumed = {n for parts in fused.values() for n in parts}
    scale = np.full((L,), alpha / rank, np.float32)
    for (group, fname), parts in fused.items():
        proj = dict(layers[group][fname])
        proj["lora_a"] = np.concatenate([mods[n][0] for n in parts], axis=2)
        proj["lora_b"] = block_diag_b([mods[n][1] for n in parts])
        proj["lora_scale"] = scale
        layers[group] = dict(layers[group])
        layers[group][fname] = proj
    for module, (group, name) in _PEFT_NAME_MAP.items():
        if name in consumed:
            continue
        proj = dict(layers[group][name])
        proj["lora_a"], proj["lora_b"] = mods[name]
        proj["lora_scale"] = scale
        layers[group] = dict(layers[group])
        layers[group][name] = proj
    out["layers"] = layers
    return out


def merge_lora_into_llama(
    params: Dict,
    lora_sd: Mapping[str, Any],
    cfg: LlamaConfig,
    scaling: Optional[float] = None,
    rank: Optional[int] = None,
    alpha: Optional[float] = None,
) -> Dict:
    """Merge peft LoRA A/B pairs into the base decoder weights.

    Equivalent to peft `merge_and_unload` as used by the reference's
    merge_lora_weights.py:11-31 / builder.py:65-72: W' = W + (alpha/r) * B @ A.
    Keys look like
    `base_model.model.model.layers.{i}.self_attn.q_proj.lora_A.weight`.
    """
    name_map = {
        "self_attn.q_proj": ("attn", "q"),
        "self_attn.k_proj": ("attn", "k"),
        "self_attn.v_proj": ("attn", "v"),
        "self_attn.o_proj": ("attn", "out"),
        "mlp.gate_proj": ("mlp", "gate"),
        "mlp.up_proj": ("mlp", "up"),
        "mlp.down_proj": ("mlp", "down"),
    }
    # Normalize keys: strip peft prefixes down to "layers.{i}.<module>"
    norm = {}
    for k, v in lora_sd.items():
        k2 = re.sub(r"^(base_model\.model\.)?(model\.)?", "", k)
        k2 = k2.replace(".default.weight", ".weight")
        norm[k2] = v

    pairs = {}
    for k in norm:
        m = re.match(r"^layers\.(\d+)\.(.+)\.lora_A\.weight$", k)
        if m:
            pairs.setdefault((int(m.group(1)), m.group(2)), {})["A"] = norm[k]
        m = re.match(r"^layers\.(\d+)\.(.+)\.lora_B\.weight$", k)
        if m:
            pairs.setdefault((int(m.group(1)), m.group(2)), {})["B"] = norm[k]

    if scaling is None:
        if rank is None or alpha is None:
            # infer rank from the first A matrix; alpha must then be given or
            # default to reference training config alpha=256, r=128
            first = next(iter(pairs.values()))
            rank = _np(first["A"]).shape[0]
            alpha = alpha if alpha is not None else 2 * rank
        scaling = alpha / rank

    import jax

    out = jax.tree.map(lambda x: x, params)  # shallow structural copy
    for (layer_idx, module), ab in sorted(pairs.items()):
        if module not in name_map:
            continue
        group, name = name_map[module]
        A = _np(ab["A"]).astype(np.float32)  # [r, in]
        B = _np(ab["B"]).astype(np.float32)  # [out, r]
        delta = (B @ A).T * scaling  # [in, out]
        kern = out["layers"][group][name]["kernel"]
        kern = np.asarray(kern).copy()
        kern[layer_idx] = kern[layer_idx] + delta.astype(kern.dtype)
        out["layers"][group][name]["kernel"] = kern
    return out

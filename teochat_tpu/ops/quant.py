"""Int8 weight-only quantization for the decoder.

API-parity with the reference's `load_8bit` path (bitsandbytes LLM.int8,
builder.py:94-103, train.py:930-947) rebuilt TPU-natively: symmetric
per-output-channel int8 weights with fp32 scales. Because scales are
per-OUTPUT-channel they commute with the matmul —

    x @ (W_i8 * s) == (x @ W_i8) * s

— so the hot path is a bf16 matmul over int8-loaded weights (XLA fuses the
int8->bf16 convert into the read) followed by one fused multiply. Decode is
HBM-bandwidth-bound; halving weight bytes ~doubles tokens/sec. The projector
and vision tower stay bf16 (the reference's llm_int8_skip_modules parity).

No outlier decomposition: LLM.int8's mixed-precision outlier path is a GPU
workaround for accuracy, so the int8 path here is metric-parity, not
bit-parity (SURVEY §7 hard-parts).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def quantize_kernel(kernel: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """[..., in, out] fp -> {'kernel': int8, 'scale': fp32 [..., out]}."""
    k32 = jnp.asarray(kernel, jnp.float32)
    amax = jnp.max(jnp.abs(k32), axis=-2)  # [..., out]
    scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    q = jnp.round(k32 / scale[..., None, :])
    q = jnp.clip(q, -127, 127).astype(jnp.int8)
    return {"kernel": q, "scale": scale}


def dequantize_kernel(p: Dict[str, jnp.ndarray], dtype=jnp.float32) -> jnp.ndarray:
    return (p["kernel"].astype(jnp.float32) * p["scale"][..., None, :]).astype(dtype)


def quantized_proj(x: jnp.ndarray, p: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """y = (x @ W_i8) * scale, bf16 compute / fp32 accumulation.

    Called inside the layer scan, so kernel is [in, out], scale [out]."""
    y = jnp.einsum(
        "...d,df->...f", x, p["kernel"].astype(x.dtype),
        preferred_element_type=jnp.float32,
    )
    return (y * p["scale"].astype(jnp.float32)).astype(x.dtype)


def quantized_proj_act_i8(x: jnp.ndarray, p: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """w8a8 projection: per-token int8 activations x int8 weights on the MXU.

    The int8 systolic path runs at 2x the bf16 rate on v5e (394 vs 197 TOPS),
    which matters for the compute-bound PREFILL (decode is bandwidth-bound and
    stays w8a16). Per-token symmetric scales: amax over the feature axis, so

        y = (x_i8 @ W_i8) * (scale_x[token] * scale_w[channel])

    with an int32 accumulator. Numerics are metric-parity, not bit-parity —
    bounded by the per-token quantization error (tested in
    tests/test_quant.py::test_act_i8_prefill_logit_bound). The reference's
    bitsandbytes LLM.int8 keeps activations fp16 (GPU outlier decomposition);
    this is the TPU-native 2x-TTFT lever instead.
    """
    x32 = jnp.asarray(x, jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scale_x = jnp.where(amax == 0, 1.0, amax / 127.0)
    x_i8 = jnp.clip(jnp.round(x32 / scale_x), -127, 127).astype(jnp.int8)
    y = jnp.einsum(
        "...d,df->...f", x_i8, p["kernel"],
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    y = y * scale_x * p["scale"].astype(jnp.float32)
    return y.astype(x.dtype)


def _int4_proj_tiled(
    x: jnp.ndarray, p: Dict[str, jnp.ndarray], layer=None
) -> jnp.ndarray:
    from teochat_tpu.ops.int4_matmul import (
        int4_matmul_tiled,
        int4_matmul_tiled_stacked,
        unpack_int4_any,
    )

    tiles, scale = p["packed_tiles"], p["scale"]
    n_tiles, k2, bn = tiles.shape[-3:]
    n_pad = n_tiles * bn
    n_out = scale.shape[-1]  # true (unpadded) output width
    if x.shape[-1] != 2 * k2:
        # quantize-time fan-in padding (_pad_k2): match with zero activations
        x = jnp.pad(
            x, [(0, 0)] * (x.ndim - 1) + [(0, 2 * k2 - x.shape[-1])]
        )
    if jax.default_backend() == "tpu" and tiles.ndim == 4 and layer is not None:
        # layer-stacked path: the kernel block-indexes the layer via scalar
        # prefetch — an XLA dynamic-slice would materialize the whole layer's
        # weights every call (measured ~40% of the int4 decode step)
        m_pad = max(8, ((x.size // (2 * k2) + 7) // 8) * 8)

        def vmem(bk2):
            return 4 * m_pad * bk2 + 5 * bk2 * bn + 6 * m_pad * bn

        cap = int(_os.environ.get("TEOCHAT_INT4_BK2", "8192"))
        candidates = _bk2_candidates(k2)
        bk2 = next(
            (b for b in candidates if b <= cap and vmem(b) <= INT4_VMEM_BUDGET),
            candidates[-1],
        )
        lead = x.shape[:-1]
        scale_pad = (
            jnp.pad(scale, ((0, 0), (0, n_pad - n_out)))
            if n_pad != n_out
            else scale
        )
        y = int4_matmul_tiled_stacked(
            x.reshape(-1, 2 * k2), tiles, scale_pad, layer,
            n_out=n_out, block_k2=bk2,
        )
        return y.reshape(*lead, n_out)
    if tiles.ndim == 4:
        # no TPU backend: slice the layer first, then take the un-tile path
        if layer is None:
            raise ValueError(
                "int4_proj: layer-stacked packed_tiles (ndim=4) require a "
                "layer index; pass layer= or slice the layer axis first"
            )
        tiles = jax.lax.dynamic_index_in_dim(tiles, layer, 0, keepdims=False)
        scale = jax.lax.dynamic_index_in_dim(scale, layer, 0, keepdims=False)
        return _int4_proj_tiled(x, {"packed_tiles": tiles, "scale": scale})
    if jax.default_backend() == "tpu" and tiles.ndim == 3:
        m_pad = max(8, ((x.size // (2 * k2) + 7) // 8) * 8)

        def vmem(bk2):
            return 4 * m_pad * bk2 + 5 * bk2 * bn + 6 * m_pad * bn

        cap = int(_os.environ.get("TEOCHAT_INT4_BK2", "8192"))
        candidates = _bk2_candidates(k2)
        bk2 = next(
            (b for b in candidates
             if b <= cap and vmem(b) <= INT4_VMEM_BUDGET),
            candidates[-1],
        )
        lead = x.shape[:-1]
        scale_pad = (
            jnp.pad(scale, (0, n_pad - n_out)) if n_pad != n_out else scale
        )
        y = int4_matmul_tiled(
            x.reshape(-1, 2 * k2), tiles, scale_pad, n_out=n_out, block_k2=bk2
        )
        return y.reshape(*lead, n_out)
    # reference path: un-tile -> unpack -> matmul
    flat = jnp.moveaxis(tiles, -3, -2).reshape(*tiles.shape[:-3], k2, n_pad)
    w = unpack_int4_any(flat, x.dtype)[..., :n_out]
    y = jnp.einsum("...d,df->...f", x, w, preferred_element_type=jnp.float32)
    return (y * scale.astype(jnp.float32)).astype(x.dtype)


_QUANT_TARGETS = ("attn", "mlp")  # groups inside llm/layers whose kernels quantize


def quantize_llama_params(params: Dict, quantize_lm_head: bool = True) -> Dict:
    """Quantize all decoder projection kernels; norms/embeddings stay as-is.

    Mirrors the reference's choice of quantizing every LLM Linear
    (find_all_linear_names, train.py:176-189) while skipping embeddings.
    """
    out = dict(params)
    layers = dict(params["layers"])
    for group in _QUANT_TARGETS:
        g = {}
        for name, proj in layers[group].items():
            g[name] = quantize_kernel(proj["kernel"])
        layers[group] = g
    out["layers"] = {**layers}
    if quantize_lm_head and "lm_head" in params:
        out["lm_head"] = quantize_kernel(params["lm_head"]["kernel"])
    return out


_VIT_QUANT_GROUPS = ("attn", "temporal_attn", "mlp")


def quantize_vit_params(params: Dict) -> Dict:
    """Quantize the ViT encoder's projection kernels for the w8a8 encode path.

    The vision tower is COMPUTE-bound at serving batch sizes (bs=32 encode
    runs the bf16 MXU at ~51% of peak), so unlike the decode path the win
    here is the int8 systolic rate (2x bf16 on v5e), not bandwidth: both
    weights AND activations quantize, and `vit._dense` dispatches to
    `quantized_proj_act_i8` on the `scale` key. Per-output-channel weight
    scales + per-token activation scales; biases/LayerNorms/embeddings and
    the (flop-trivial) patch embedding stay fp. The reference never
    quantizes its tower (builder.py load_8bit touches only the LLM) — this
    is a TPU-native opt-in for encode-throughput workloads, metric-parity
    not bit-parity (bounded in tests/test_quant.py::test_vit_w8a8_*).
    """
    out = dict(params)
    layers = dict(params["layers"])
    for group in _VIT_QUANT_GROUPS:
        if group not in layers:
            continue
        # Unfused q/k/v on purpose: quantize-time qkv fusion (one [d,3d]
        # int8 matmul, single act quantize) measured SLOWER on v5e — see the
        # A/B note in vit._attn_block.
        g = {}
        for name, proj in layers[group].items():
            q = quantize_kernel(proj["kernel"])
            if "bias" in proj:
                q["bias"] = proj["bias"]
            g[name] = q
        layers[group] = g
    out["layers"] = {**layers}
    return out


def quantize_kernel_host(kernel, int4: bool = False, layer_chunk: int = 8) -> Dict:
    """Quantize a HOST (numpy) stacked kernel with bounded device memory.

    The 7B load path: `layer_chunk` layers upload at a time and quantize
    under jit (the amax/scale/round chain fuses — no fp32 materialization of
    the whole group), so peak HBM during checkpoint ingestion is the
    quantized tree plus ONE chunk (~0.7 GB), never the full fp16 decoder
    (13.5 GB — more than a single v5e chip holds). Un-stacked 2-D kernels
    (lm_head) are small and quantize whole."""
    import numpy as np

    fn = quantize_kernel_int4 if int4 else quantize_kernel
    jfn = jax.jit(fn)
    if getattr(kernel, "ndim", 2) < 3:
        return jax.block_until_ready(jfn(jnp.asarray(kernel)))
    n_layers = kernel.shape[0]
    outs = []
    for i in range(0, n_layers, layer_chunk):
        chunk = jnp.asarray(np.asarray(kernel[i : i + layer_chunk]))
        outs.append(jax.block_until_ready(jfn(chunk)))
        del chunk
    if len(outs) == 1:
        return outs[0]
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)


def quantize_llama_params_host(
    params: Dict,
    int4: bool = False,
    quantize_lm_head: bool = True,
    fuse_projections: bool = True,
    layer_chunk: int = 8,
) -> Dict:
    """quantize_llama_params / _int4 for a HOST (numpy) tree — the 7B-scale
    checkpoint ingestion path (builder.load_pretrained_model).

    Identical math and output layout to the device-tree versions; the
    difference is memory discipline: projections stream to the device in
    layer chunks (quantize_kernel_host) instead of uploading the whole fp16
    decoder first, and int4 q|k|v / gate|up fusion concatenates on the host.
    Non-quantized leaves (norm scales, embeddings) upload as-is at the end."""
    import numpy as np

    layers = dict(params["layers"])

    def _plain(group, names):
        return all(set(layers[group][n].keys()) == {"kernel"} for n in names)

    if int4 and fuse_projections and _plain("attn", ("q", "k", "v")) and _plain(
        "mlp", ("gate", "up")
    ):
        attn, mlp = layers["attn"], layers["mlp"]
        qkv = np.concatenate(
            [np.asarray(attn[n]["kernel"]) for n in ("q", "k", "v")], axis=-1
        )
        layers["attn"] = {
            "qkv": quantize_kernel_host(qkv, int4=True, layer_chunk=layer_chunk),
            "out": quantize_kernel_host(
                attn["out"]["kernel"], int4=True, layer_chunk=layer_chunk
            ),
        }
        del qkv
        gateup = np.concatenate(
            [np.asarray(mlp[n]["kernel"]) for n in ("gate", "up")], axis=-1
        )
        layers["mlp"] = {
            "gateup": quantize_kernel_host(
                gateup, int4=True, layer_chunk=layer_chunk
            ),
            "down": quantize_kernel_host(
                mlp["down"]["kernel"], int4=True, layer_chunk=layer_chunk
            ),
        }
        del gateup
    else:
        for group in _QUANT_TARGETS:
            layers[group] = {
                name: quantize_kernel_host(
                    proj["kernel"], int4=int4, layer_chunk=layer_chunk
                )
                for name, proj in layers[group].items()
            }
    out = dict(params)
    out["layers"] = {**layers}
    if quantize_lm_head and "lm_head" in params:
        out["lm_head"] = quantize_kernel_host(params["lm_head"]["kernel"], int4=int4)
    return jax.tree.map(jnp.asarray, out)


def quantize_mpt_params_host(params: Dict, layer_chunk: int = 8) -> Dict:
    """quantize_mpt_params for a HOST (numpy) tree (see
    quantize_llama_params_host for the memory discipline)."""
    out = dict(params)
    layers = dict(params["layers"])
    for name in ("wqkv", "out_proj", "up_proj", "down_proj"):
        proj = dict(layers[name])
        q = quantize_kernel_host(proj.pop("kernel"), layer_chunk=layer_chunk)
        q.update(proj)  # carry any bias leaf alongside the quantized kernel
        layers[name] = q
    out["layers"] = layers
    return jax.tree.map(jnp.asarray, out)


def quantize_mpt_params(params: Dict) -> Dict:
    """int8 weight-only quantization of the MPT decoder (models/mpt.py):
    the four projection kernels per block quantize (biases, norms, and the
    tied wte embedding stay fp). Same per-channel scale layout as the llama
    quantizer; mpt._dense dispatches on the 'scale' key."""
    out = dict(params)
    layers = dict(params["layers"])
    for name in ("wqkv", "out_proj", "up_proj", "down_proj"):
        proj = dict(layers[name])
        q = quantize_kernel(proj.pop("kernel"))
        q.update(proj)  # carry any bias leaf alongside the quantized kernel
        layers[name] = q
    out["layers"] = layers
    return out


def random_int8_llama(rng: jax.Array, cfg, embed_dtype=jnp.bfloat16) -> Dict:
    """Random int8-weight decoder for benchmarking (no fp32 materialization)."""
    keys = iter(jax.random.split(rng, 32))
    d, i_sz, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    hkv_d = cfg.num_kv_heads * cfg.head_dim

    def qproj(key, fan_in, fan_out):
        k = jax.random.randint(key, (L, fan_in, fan_out), -127, 128, jnp.int8)
        return {"kernel": k, "scale": jnp.full((L, fan_out), 0.02 / 127, jnp.float32)}

    params = {
        "embed_tokens": {
            "embedding": (
                jax.random.normal(next(keys), (cfg.vocab_size, d)) * 0.02
            ).astype(embed_dtype)
        },
        "layers": {
            "input_norm": {"scale": jnp.ones((L, d), jnp.float32)},
            "attn": {
                "q": qproj(next(keys), d, d),
                "k": qproj(next(keys), d, hkv_d),
                "v": qproj(next(keys), d, hkv_d),
                "out": qproj(next(keys), d, d),
            },
            "post_attn_norm": {"scale": jnp.ones((L, d), jnp.float32)},
            "mlp": {
                "gate": qproj(next(keys), d, i_sz),
                "up": qproj(next(keys), d, i_sz),
                "down": qproj(next(keys), i_sz, d),
            },
        },
        "final_norm": {"scale": jnp.ones((d,), jnp.float32)},
        "lm_head": {
            "kernel": jax.random.randint(next(keys), (d, cfg.vocab_size), -127, 128, jnp.int8),
            "scale": jnp.full((cfg.vocab_size,), 0.02 / 127, jnp.float32),
        },
    }
    return params


# ---------------------------------------------------------------- int4 (w4a16)
#
# Beyond-reference: bs=1 decode is HBM-bandwidth-bound (see bench.py roofline
# note), so int4 weight-only nearly doubles single-stream tokens/sec. Two
# nibbles pack into one uint8 along the INPUT dim (even rows in the low
# nibble); dequant is (nibble - 8) * scale with per-output-channel scales.
# This is a TPU-native w4a16 path, not bitsandbytes nf4 (no lookup table).


# Tile width for the tile-contiguous int4 layout. The decode step is
# per-grid-cell-overhead bound (~1 us of fixed cost per Pallas grid cell,
# scripts/bench_int4_kernel.py), so wider tiles (fewer, larger cells) win;
# outputs that don't divide are zero-padded to the tile width (scales stay
# true-width — the kernel wrapper pads/slices). Env-tunable for sweeps.
import os as _os

# 512 measured fastest on the full bs=1 decode loop (v5e, round 3):
# u8 format: 256 -> 148.8, 384 -> 150.1, 512 -> 162.7, 640 -> 147.8,
# 1024 -> 151.6, 2048 -> 144.9 tok/s. v3 i8 format: 512 -> 167.3,
# 1024 (12M VMEM budget) -> 161.6, 2048 -> 156.3.
INT4_TILE_BN = int(_os.environ.get("TEOCHAT_INT4_TILE_BN", "512"))
# VMEM working-set budget for block selection; the scoped limit is 16 MB and
# the estimate errs low, so stay at half by default (env-tunable for sweeps)
INT4_VMEM_BUDGET = int(_os.environ.get("TEOCHAT_INT4_VMEM", str(8 * 1024 * 1024)))


def _pad_k2(k2: int) -> int:
    """Packed fan-in (K/2) padded so large 128-aligned Pallas K blocks exist.

    LLaMA's down projection has K=11008 -> k2=5504 = 43*128 with 43 prime:
    no 128-aligned block divides it except 128 itself, and 128-wide K blocks
    measured ~35% slower per byte than 2048+ (scripts/bench_int4_kernel.py
    block sweep — per-grid-cell overhead dominates). Padding k2 to a multiple
    of 256 guarantees at least one halving step; the zero rows cost +2.3%
    bytes on that projection and decode is ~9% faster overall."""
    if k2 <= 128 or k2 % 256 == 0:
        return k2
    return ((k2 + 255) // 256) * 256


def _bk2_candidates(k2: int):
    """All 128-aligned K blocks dividing k2, largest first (prefill shapes
    need small blocks to fit VMEM next to 640-row activations; decode wants
    the largest)."""
    m = k2 // 128
    return [128 * d for d in range(m, 0, -1) if m % d == 0]


def quantize_kernel_int4(kernel: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """[in, out] fp -> {'packed_tiles': int8 [ceil(out/bn), in/2, bn],
    'scale': [out]}.

    v3 combined-byte packing ((L+8) + 16*H as int8 — ops/int4_matmul.py) in
    the tile-contiguous layout: each bn-wide column band is a dense HBM region
    so the kernel's per-tile DMA streams at full rate, and the byte converts
    to bf16 in one VPU op (measured ~4.5% faster decode than the u8
    split-nibble format it replaces; kernels still accept uint8 tiles from
    older artifacts). Detection is by the 'packed_tiles' key; outputs narrower
    than one tile keep the flat u8 'packed' layout."""
    from teochat_tpu.ops.int4_matmul import pack_int4, pack_int4_tiled_i8

    k32 = jnp.asarray(kernel, jnp.float32)
    fan_in = k32.shape[-2]
    assert fan_in % 2 == 0, "int4 packing needs even fan-in"
    amax = jnp.max(jnp.abs(k32), axis=-2)
    scale = jnp.where(amax == 0, 1.0, amax / 7.0)
    q = jnp.clip(jnp.round(k32 / scale[..., None, :]), -8, 7).astype(jnp.int32)
    n = q.shape[-1]
    if n < INT4_TILE_BN:
        return {"packed": pack_int4(q), "scale": scale}
    # zero-pad fan-in so the kernel gets large aligned K blocks (the zero
    # rows contribute nothing: int4_proj pads x's K axis with zeros to match)
    k2p = _pad_k2(fan_in // 2)
    if 2 * k2p != fan_in:
        q = jnp.pad(
            q, [(0, 0)] * (q.ndim - 2) + [(0, 2 * k2p - fan_in), (0, 0)]
        )
    if q.ndim == 2:
        tiles = pack_int4_tiled_i8(q, INT4_TILE_BN)
    else:
        tiles = jax.vmap(lambda w: pack_int4_tiled_i8(w, INT4_TILE_BN))(q)
    return {"packed_tiles": tiles, "scale": scale}


def unpack_int4(packed: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """[..., in/2, out] packed bytes -> [..., in, out] centered int4 values.

    Dispatches on dtype: int8 = v3 combined byte, uint8 = split nibbles."""
    from teochat_tpu.ops.int4_matmul import unpack_int4_any

    return unpack_int4_any(packed, dtype)


def int4_proj(
    x: jnp.ndarray, p: Dict[str, jnp.ndarray], layer=None
) -> jnp.ndarray:
    """y = (x @ unpack(W_i4)) * scale.

    On TPU routes to the Pallas fused dequant-matmul (reads only packed bytes
    from HBM); elsewhere falls back to an XLA unpack (tests/CPU). `layer`:
    when `p` holds LAYER-STACKED tiles ([L, ...]), selects the layer INSIDE
    the kernel (scalar prefetch) instead of an XLA dynamic-slice."""
    if "packed_tiles" in p:
        return _int4_proj_tiled(x, p, layer)
    packed, scale = p["packed"], p["scale"]
    if packed.ndim == 3 and layer is not None:  # stacked flat layout
        packed = jax.lax.dynamic_index_in_dim(packed, layer, 0, keepdims=False)
        scale = jax.lax.dynamic_index_in_dim(scale, layer, 0, keepdims=False)
    k2, n = packed.shape[-2], packed.shape[-1]
    if (
        jax.default_backend() == "tpu"
        and packed.ndim == 2
        and n % 128 == 0
        and k2 % 128 == 0
    ):
        from teochat_tpu.ops.int4_matmul import int4_matmul

        # block sizes must DIVIDE the dims (a padded reduction block would
        # pollute the accumulator) and the working set must fit VMEM: x lo/hi
        # blocks (4*m*bk2 B bf16) + packed (bk2*bn) + unpacked lo/hi
        # (4*bk2*bn) + fp32 acc (4*m*bn).
        m_pad = max(8, ((x.size // (2 * k2) + 7) // 8) * 8)
        bn = next(b for b in (512, 256, 128) if n % b == 0)

        def vmem(bk2):
            return 4 * m_pad * bk2 + 5 * bk2 * bn + 6 * m_pad * bn

        budget = 8 * 1024 * 1024
        candidates = [k2] + [b for b in (2048, 1024, 512, 256, 128) if k2 % b == 0]
        bk2 = next((b for b in candidates if vmem(b) <= budget), 128)
        lead = x.shape[:-1]
        y = int4_matmul(x.reshape(-1, 2 * k2), packed, scale, block_n=bn, block_k2=bk2)
        return y.reshape(*lead, n)
    w = unpack_int4(packed, x.dtype)
    y = jnp.einsum("...d,df->...f", x, w, preferred_element_type=jnp.float32)
    return (y * scale.astype(jnp.float32)).astype(x.dtype)


def quantize_llama_params_int4(
    params: Dict, quantize_lm_head: bool = True, fuse_projections: bool = True
) -> Dict:
    """Quantize decoder projections to packed int4 (layer-stacked kernels).

    fuse_projections concatenates q|k|v and gate|up along the output dim
    before packing (per-column scales are unchanged by the concat, so the
    math is identical). The int4 decode step is per-pallas-call-overhead
    bound, not VPU-bound (measured: back-to-back kernel calls cost ~15-20us
    of pipeline drain/warmup each; scripts/bench_int4_kernel.py) — fusing
    cuts the calls per layer from 7 to 4. The fused leaves are detected by
    the 'qkv'/'gateup' keys in models/llama.py."""
    out = dict(params)
    layers = dict(params["layers"])

    def _plain(group, names):
        return all(set(layers[group][n].keys()) == {"kernel"} for n in names)

    if fuse_projections and _plain("attn", ("q", "k", "v")) and _plain(
        "mlp", ("gate", "up")
    ):
        attn, mlp = layers["attn"], layers["mlp"]
        qkv = jnp.concatenate(
            [attn[n]["kernel"] for n in ("q", "k", "v")], axis=-1
        )
        gateup = jnp.concatenate(
            [mlp[n]["kernel"] for n in ("gate", "up")], axis=-1
        )
        layers["attn"] = {
            "qkv": quantize_kernel_int4(qkv),
            "out": quantize_kernel_int4(attn["out"]["kernel"]),
        }
        layers["mlp"] = {
            "gateup": quantize_kernel_int4(gateup),
            "down": quantize_kernel_int4(mlp["down"]["kernel"]),
        }
    else:
        for group in _QUANT_TARGETS:
            g = {}
            for name, proj in layers[group].items():
                g[name] = quantize_kernel_int4(proj["kernel"])
            layers[group] = g
    out["layers"] = {**layers}
    if quantize_lm_head and "lm_head" in params:
        out["lm_head"] = quantize_kernel_int4(params["lm_head"]["kernel"])
    return out


def random_int4_llama(rng: jax.Array, cfg, embed_dtype=jnp.bfloat16) -> Dict:
    """Random packed-int4 decoder for benchmarking."""
    keys = iter(jax.random.split(rng, 32))
    d, i_sz, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    hkv_d = cfg.num_kv_heads * cfg.head_dim

    def qproj(key, fan_in, fan_out):
        bn = INT4_TILE_BN
        n_tiles = (fan_out + bn - 1) // bn
        k2 = _pad_k2(fan_in // 2)  # same padded layout real quantize emits
        tiles = jax.random.randint(
            key, (L, n_tiles, k2, bn), -128, 128, jnp.int32
        )
        return {
            "packed_tiles": tiles.astype(jnp.int8),  # v3 combined-byte format
            "scale": jnp.full((L, fan_out), 0.02 / 7, jnp.float32),
        }

    return {
        "embed_tokens": {
            "embedding": (
                jax.random.normal(next(keys), (cfg.vocab_size, d)) * 0.02
            ).astype(embed_dtype)
        },
        "layers": {
            "input_norm": {"scale": jnp.ones((L, d), jnp.float32)},
            "attn": {
                "qkv": qproj(next(keys), d, d + 2 * hkv_d),
                "out": qproj(next(keys), d, d),
            },
            "post_attn_norm": {"scale": jnp.ones((L, d), jnp.float32)},
            "mlp": {
                "gateup": qproj(next(keys), d, 2 * i_sz),
                "down": qproj(next(keys), i_sz, d),
            },
        },
        "final_norm": {"scale": jnp.ones((d,), jnp.float32)},
        "lm_head": {
            "packed_tiles": jax.random.randint(
                next(keys),
                ((cfg.vocab_size + INT4_TILE_BN - 1) // INT4_TILE_BN,
                 d // 2, INT4_TILE_BN),
                -128, 128, jnp.int32,
            ).astype(jnp.int8),
            "scale": jnp.full((cfg.vocab_size,), 0.02 / 7, jnp.float32),
        },
    }

"""Int8 weight-only quantization tests."""

import numpy as np

import jax
import jax.numpy as jnp

from teochat_tpu.config import LlamaConfig
from teochat_tpu.models.llama import embed_tokens, init_llama, llama_forward
from teochat_tpu.ops.quant import (
    dequantize_kernel,
    quantize_kernel,
    quantize_llama_params,
    quantized_proj,
)

CFG = LlamaConfig(
    vocab_size=64, hidden_size=32, intermediate_size=64,
    num_layers=2, num_heads=4, num_kv_heads=4,
)


def test_quantize_roundtrip_error_bounded():
    w = jnp.asarray(np.random.RandomState(0).randn(16, 24), jnp.float32)
    q = quantize_kernel(w)
    assert q["kernel"].dtype == jnp.int8
    w2 = dequantize_kernel(q)
    # per-column max error <= scale/2 (symmetric rounding)
    err = jnp.abs(w - w2)
    assert float(jnp.max(err / q["scale"][None, :])) <= 0.5 + 1e-6


def test_quantized_proj_matches_dequant():
    w = jnp.asarray(np.random.RandomState(1).randn(8, 16), jnp.float32)
    x = jnp.asarray(np.random.RandomState(2).randn(3, 8), jnp.float32)
    q = quantize_kernel(w)
    ref = x @ dequantize_kernel(q)
    got = quantized_proj(x, q)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_int8_forward_close_to_fp32():
    params = init_llama(jax.random.PRNGKey(0), CFG)
    qparams = quantize_llama_params(params)
    ids = jnp.asarray(np.random.RandomState(3).randint(0, 64, (1, 6)))
    pos = jnp.arange(6)[None, :]
    emb = embed_tokens(params, ids)
    ref, _ = llama_forward(params, CFG, emb, position_ids=pos)
    got, _ = llama_forward(qparams, CFG, emb, position_ids=pos)
    # int8 is approximate; logits must correlate strongly
    r = np.corrcoef(np.asarray(ref).ravel(), np.asarray(got).ravel())[0, 1]
    assert r > 0.999, r


def test_int4_roundtrip_and_proj():
    import jax.numpy as jnp

    from teochat_tpu.ops.quant import (
        int4_proj,
        quantize_kernel_int4,
        unpack_int4,
    )

    w = jnp.asarray(np.random.RandomState(4).randn(16, 24), jnp.float32)
    q = quantize_kernel_int4(w)
    assert q["packed"].shape == (8, 24) and q["packed"].dtype == jnp.uint8
    w2 = unpack_int4(q["packed"], jnp.float32) * q["scale"][None, :]
    err = jnp.abs(w - w2)
    assert float(jnp.max(err / q["scale"][None, :])) <= 0.5 + 1e-5

    x = jnp.asarray(np.random.RandomState(5).randn(3, 16), jnp.float32)
    ref = x @ np.asarray(w2)
    got = int4_proj(x, q)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_int4_stacked_tiles_require_layer_index():
    """Layer-stacked packed tiles (4-D) without a layer index is API misuse:
    must raise, not silently mis-shape the un-tile path."""
    import pytest

    from teochat_tpu.ops.quant import int4_proj, quantize_kernel_int4

    w = jnp.asarray(np.random.RandomState(7).randn(16, 24), jnp.float32)
    q = quantize_kernel_int4(w)
    if "packed_tiles" not in q:
        pytest.skip("narrow kernel quantized to flat packed layout")
    stacked = {
        "packed_tiles": jnp.stack([q["packed_tiles"]] * 2),
        "scale": jnp.stack([q["scale"]] * 2),
    }
    with pytest.raises(ValueError, match="layer index"):
        int4_proj(jnp.ones((3, 16), jnp.float32), stacked)
    # with a layer index the stacked path matches the flat one
    got = int4_proj(jnp.ones((3, 16), jnp.float32), stacked, layer=1)
    ref = int4_proj(jnp.ones((3, 16), jnp.float32), q)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_int4_forward_correlates():
    from teochat_tpu.ops.quant import quantize_llama_params_int4

    params = init_llama(jax.random.PRNGKey(0), CFG)
    qparams = quantize_llama_params_int4(params)
    ids = jnp.asarray(np.random.RandomState(6).randint(0, 64, (1, 6)))
    pos = jnp.arange(6)[None, :]
    emb = embed_tokens(params, ids)
    ref, _ = llama_forward(params, CFG, emb, position_ids=pos)
    got, _ = llama_forward(qparams, CFG, emb, position_ids=pos)
    r = np.corrcoef(np.asarray(ref).ravel(), np.asarray(got).ravel())[0, 1]
    assert r > 0.98, r


def test_act_i8_prefill_logit_bound():
    """w8a8 prefill (int8_prefill_activations) must stay close to the w8a16
    path: bounded logit error, same greedy next token on a tiny model."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from teochat_tpu.config import tiny_test_config
    from teochat_tpu.models import llama as llama_mod
    from teochat_tpu.ops.quant import quantize_llama_params

    cfg = tiny_test_config().llm
    params = quantize_llama_params(
        llama_mod.init_llama(jax.random.PRNGKey(0), cfg)
    )
    b, s = 2, 8
    embeds = jnp.asarray(
        np.random.RandomState(0).randn(b, s, cfg.hidden_size) * 0.1, jnp.float32
    )
    pos = jnp.tile(jnp.arange(s, dtype=jnp.int32), (b, 1))
    amask = jnp.ones((b, s), bool)

    def logits_for(flag):
        c = dataclasses.replace(cfg, int8_prefill_activations=flag)
        out, _ = llama_mod.llama_forward(
            params, c, embeds, position_ids=pos, attention_mask=amask
        )
        return np.asarray(out)

    base = logits_for(False)
    w8a8 = logits_for(True)
    denom = np.maximum(np.abs(base).max(), 1e-6)
    rel = np.abs(w8a8 - base).max() / denom
    assert rel < 0.05, f"w8a8 prefill logits diverge: rel={rel}"
    np.testing.assert_array_equal(
        base[:, -1].argmax(-1), w8a8[:, -1].argmax(-1)
    )


def test_int4_fused_matches_unfused():
    """fuse_projections concatenates q|k|v and gate|up before packing;
    per-column scales make the fused math identical to the per-projection
    path (same accumulation order along K)."""
    from teochat_tpu.ops.quant import quantize_llama_params_int4

    params = init_llama(jax.random.PRNGKey(0), CFG)
    qf = quantize_llama_params_int4(params)
    qu = quantize_llama_params_int4(params, fuse_projections=False)
    assert "qkv" in qf["layers"]["attn"] and "gateup" in qf["layers"]["mlp"]
    assert "q" in qu["layers"]["attn"] and "gate" in qu["layers"]["mlp"]
    ids = jnp.asarray(np.random.RandomState(7).randint(0, 64, (2, 5)))
    pos = jnp.tile(jnp.arange(5)[None, :], (2, 1))
    emb = embed_tokens(params, ids)
    fused, _ = llama_forward(qf, CFG, emb, position_ids=pos)
    unfused, _ = llama_forward(qu, CFG, emb, position_ids=pos)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(unfused), atol=1e-5, rtol=1e-5
    )


def test_host_streaming_quantize_matches_eager():
    """quantize_llama_params_host (the 7B chunked-upload ingestion path) must
    match the eager device quantizers, for both int8 and fused int4,
    including the lm_head: integer leaves bit-identical, scales to 1 ULP
    (the host path's jitted quantizer fuses the /127 division, perturbing
    the last mantissa bit)."""
    from teochat_tpu.ops.quant import (
        quantize_llama_params_host,
        quantize_llama_params_int4,
    )

    def check(a, b):
        a, b = np.asarray(a), np.asarray(b)
        if np.issubdtype(a.dtype, np.integer):
            np.testing.assert_array_equal(a, b)
        else:
            np.testing.assert_allclose(a, b, rtol=3e-7)

    cfg = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_layers=3, num_heads=4, num_kv_heads=4, tie_word_embeddings=False,
    )
    params = init_llama(jax.random.PRNGKey(0), cfg)
    host = jax.tree.map(np.asarray, params)

    eager8 = quantize_llama_params(params)
    host8 = quantize_llama_params_host(host, layer_chunk=2)  # ragged chunking
    jax.tree.map(check, eager8, host8)

    eager4 = quantize_llama_params_int4(params)
    host4 = quantize_llama_params_host(host, int4=True, layer_chunk=2)
    jax.tree.map(check, eager4, host4)


def test_vit_w8a8_forward_close_to_fp32():
    """w8a8 vision tower (quantize_vit_params + vit._dense dispatch):
    metric-parity with the fp32 tower — cosine > 0.999 and bounded rel
    error on the select_layer hidden states, for both the image tower and
    the temporal-attention video tower (temporal_attn kernels quantize too)."""
    from teochat_tpu.config import VisionConfig
    from teochat_tpu.models import vit
    from teochat_tpu.ops.quant import quantize_vit_params

    for cfg, bt, frames in (
        (VisionConfig(image_size=28, patch_size=14, hidden_size=64,
                      intermediate_size=128, num_layers=4, num_heads=4),
         2, 1),
        (VisionConfig(image_size=28, patch_size=14, hidden_size=64,
                      intermediate_size=128, num_layers=2, num_heads=4,
                      add_time_attn=True, num_frames=2),
         4, 2),
    ):
        p = vit.init_vit(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(1), (bt, 3, 28, 28))
        ref = vit.vit_forward(p, cfg, x, num_frames=frames)
        q = quantize_vit_params(p)
        got = vit.vit_forward(q, cfg, x, num_frames=frames)
        rel = float(jnp.max(jnp.abs(got - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
        cos = float(jnp.sum(got * ref)
                    / (jnp.linalg.norm(got) * jnp.linalg.norm(ref) + 1e-9))
        assert rel < 0.05, rel
        assert cos > 0.999, cos
        # projection kernels quantized in-place; structure otherwise intact
        assert q["layers"]["attn"]["q"]["kernel"].dtype == jnp.int8
        assert "scale" in q["layers"]["mlp"]["fc1"]
        assert "bias" in q["layers"]["attn"]["q"]
        if cfg.add_time_attn:
            assert q["layers"]["temporal_attn"]["q"]["kernel"].dtype == jnp.int8
        assert q["patch_embedding"]["kernel"].dtype == p["patch_embedding"]["kernel"].dtype


def test_vit_w8a8_full_pipeline_encode():
    """The quantized tower drives the full encode_frames path (tower +
    feature select + projector) without shape/dtype surprises."""
    from teochat_tpu.config import TEOChatConfig, VisionConfig, ProjectorConfig
    from teochat_tpu.models import teochat as teochat_mod, vit
    from teochat_tpu.models.projector import init_projector
    from teochat_tpu.ops.quant import quantize_vit_params
    import dataclasses

    cfg = TEOChatConfig()
    vis = VisionConfig(image_size=28, patch_size=14, hidden_size=64,
                       intermediate_size=128, num_layers=3, num_heads=4)
    proj = dataclasses.replace(cfg.projector, mm_hidden_size=64, hidden_size=32)
    cfg = dataclasses.replace(cfg, vision=vis, projector=proj)
    vp = vit.init_vit(jax.random.PRNGKey(0), vis, dtype=jnp.bfloat16)
    pp = init_projector(jax.random.PRNGKey(1), proj, dtype=jnp.bfloat16)
    frames = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 28, 28), jnp.bfloat16)
    ref = teochat_mod.encode_frames({"vision": vp, "projector": pp}, cfg, frames)
    got = teochat_mod.encode_frames(
        {"vision": quantize_vit_params(vp), "projector": pp}, cfg, frames)
    assert got.shape == ref.shape and got.dtype == ref.dtype
    r, g = ref.astype(jnp.float32), got.astype(jnp.float32)
    cos = float(jnp.sum(r * g) / (jnp.linalg.norm(r) * jnp.linalg.norm(g) + 1e-9))
    assert cos > 0.99, cos

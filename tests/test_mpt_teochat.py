"""LLaVA-MPT end-to-end glue: TEOChat with the MPT backend.

The reference ships LlavaMPTForCausalLM (llava_mpt.py:45-109) as a full model
variant loadable through builder.py:107-133; here the same capability is the
backend dispatch in models/generation.py (backend_embed/backend_forward) +
init_teochat/fuse_embeds/forward_train MPT branches + builder._load_mpt_model.
"""

import dataclasses
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from teochat_tpu.config import (
    GenerationConfig,
    MptConfig,
    ProjectorConfig,
    TEOChatConfig,
    VisionConfig,
    tiny_test_config,
)
from teochat_tpu.constants import IMAGE_TOKEN_INDEX
from teochat_tpu.models import fusion as fusion_mod
from teochat_tpu.models import teochat as teochat_mod
from teochat_tpu.models.llama import init_cache
from teochat_tpu.models.mpt import mpt_forward
from teochat_tpu.models.teochat import TEOChat, init_teochat


def _mpt_teochat_cfg(vocab=96):
    base = tiny_test_config(vocab_size=vocab)
    llm = MptConfig(vocab_size=vocab, d_model=64, n_layers=2, n_heads=4,
                    expansion_ratio=2, max_seq_len=128)
    return dataclasses.replace(base, llm=llm, llm_backend="mpt")


@pytest.fixture(scope="module")
def model():
    cfg = _mpt_teochat_cfg()
    params = init_teochat(jax.random.PRNGKey(0), cfg)
    return TEOChat(cfg, params)


def test_generate_matches_manual_mpt_loop(model):
    """TEOChat.generate through the backend dispatch == stepping mpt_forward
    by hand over the same fused embeds (greedy)."""
    cfg = model.cfg
    rng = np.random.RandomState(0)
    ids = [1, 7, IMAGE_TOKEN_INDEX, 9, 11]
    frames = rng.randn(1, 3, 28, 28).astype(np.float32)
    gen = GenerationConfig(max_new_tokens=6, temperature=0.0, do_sample=False,
                           stop_strings=())
    got = model.generate([ids], frames, gen)[0]

    # manual reference loop (test_mpt_parity.py pattern), unpadded plan
    fused_len = len(ids) + model.tokens_per_frame - 1
    plan = fusion_mod.build_fusion_plan(
        [ids], tokens_per_frame=model.tokens_per_frame,
        max_length=256, pad_to=fused_len,
    )
    vision_tokens = model.encode(frames)
    emb = teochat_mod.multimodal_embeds(
        model.params, cfg, plan, vision_tokens.astype(model._dtype)
    )
    n_new = gen.max_new_tokens
    cache = init_cache(cfg.llm, 1, fused_len + n_new + 1, dtype=model._dtype)
    slots = jnp.arange(fused_len)[None, :]
    kv_mask = (
        jnp.zeros((1, fused_len + n_new + 1), bool).at[:, :fused_len].set(True)
    )
    logits, cache = mpt_forward(
        model.params["llm"], cfg.llm, emb, cache=cache, write_slots=slots,
        kv_mask=kv_mask, logits_mode="last",
        last_index=jnp.asarray([fused_len - 1]),
    )
    from teochat_tpu.models.mpt import mpt_embed

    want = [int(jnp.argmax(logits[0, -1]))]
    for step in range(n_new - 1):
        pos = jnp.asarray([[fused_len + step]])
        kv_mask = kv_mask.at[:, fused_len + step].set(True)
        e = mpt_embed(model.params["llm"], jnp.asarray([[want[-1]]]),
                      dtype=model._dtype)
        logits, cache = mpt_forward(
            model.params["llm"], cfg.llm, e, cache=cache, write_slots=pos,
            kv_mask=kv_mask, logits_mode="last",
        )
        want.append(int(jnp.argmax(logits[0, -1])))
    assert got == want


def test_forward_train_mpt_backend(model):
    """Training CE + grads flow through the MPT branch of forward_train."""
    cfg = model.cfg
    ids = [1, IMAGE_TOKEN_INDEX, 9, 11, 4]
    plan = fusion_mod.build_fusion_plan(
        [ids], tokens_per_frame=model.tokens_per_frame, max_length=64,
        pad_to=16, labels=[[-100, -100, 9, 11, 4]],
    )
    pixels = np.random.RandomState(1).randn(1, 3, 28, 28).astype(np.float32)

    def loss_fn(p):
        return teochat_mod.forward_train(p, cfg, plan, jnp.asarray(pixels))

    loss, grads = jax.value_and_grad(loss_fn)(model.params)
    assert np.isfinite(float(loss))
    g = grads["llm"]["layers"]["wqkv"]["kernel"]
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).max() > 0


@pytest.mark.slow
def test_mpt_spec_matches_plain_greedy(model):
    """Prompt-lookup speculation drives MPT through the spec_verify block
    path: token-identical to plain greedy decode (text, multimodal, and a
    self-repetitive prompt that actually accepts drafts)."""
    rng = np.random.RandomState(2)
    frames = rng.randn(1, 3, 28, 28).astype(np.float32)
    cases = [
        ([[1, 5, 9, 4, 3, 7, 8, 11, 5, 9, 4]], None, 12),
        ([[1, 5, IMAGE_TOKEN_INDEX, 9, 4, 7]], frames, 8),
        ([[1, 5, 6, 7, 8] * 6], None, 20),
    ]
    for ids, fr, max_new in cases:
        base = model.generate(
            ids, fr,
            GenerationConfig(max_new_tokens=max_new, temperature=0.0,
                             do_sample=False, stop_strings=()),
        )
        spec = model.generate(
            ids, fr,
            GenerationConfig(max_new_tokens=max_new, temperature=0.0,
                             do_sample=False, stop_strings=(),
                             speculative_k=4),
        )
        assert spec == base
        assert model.last_spec_stats["steps"] >= 1


@pytest.mark.slow
def test_mpt_spec_sampling_seed_reproducible(model):
    """Exact speculative sampling on MPT: stochastic but per-seed stable."""
    gen = GenerationConfig(max_new_tokens=6, do_sample=True, temperature=1.0,
                           stop_strings=(), speculative_k=4)
    ids = [[1, 5, 9, 4]]
    a = model.generate(ids, None, gen, rng=jax.random.PRNGKey(3))
    b = model.generate(ids, None, gen, rng=jax.random.PRNGKey(3))
    assert a == b


def _tiny_llava_mpt_checkpoint(path):
    torch = pytest.importorskip("torch")
    from tests.test_builder import _write_tokenizer

    os.makedirs(path, exist_ok=True)
    g = torch.Generator().manual_seed(0)

    def w(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    d, vocab, layers = 32, 64, 2
    sd = {
        "transformer.wte.weight": w(vocab, d),
        "transformer.norm_f.weight": torch.ones(d),
    }
    for i in range(layers):
        p = f"transformer.blocks.{i}."
        sd[p + "norm_1.weight"] = torch.ones(d)
        sd[p + "attn.Wqkv.weight"] = w(3 * d, d)
        sd[p + "attn.out_proj.weight"] = w(d, d)
        sd[p + "norm_2.weight"] = torch.ones(d)
        sd[p + "ffn.up_proj.weight"] = w(2 * d, d)
        sd[p + "ffn.down_proj.weight"] = w(d, 2 * d)
    # projector under the MPT model prefix (LlavaMPTModel attribute)
    sd["transformer.mm_projector.0.weight"] = w(d, 16)
    sd["transformer.mm_projector.0.bias"] = torch.zeros(d)
    sd["transformer.mm_projector.2.weight"] = w(d, d)
    sd["transformer.mm_projector.2.bias"] = torch.zeros(d)
    # embedded tiny vision tower (test_builder geometry)
    vt = "transformer.image_tower.vision_model."
    sd[vt + "embeddings.patch_embedding.weight"] = w(16, 3, 14, 14)
    sd[vt + "embeddings.class_embedding"] = w(16)
    sd[vt + "embeddings.position_embedding.weight"] = w(5, 16)
    for n in ("pre_layrnorm", "post_layernorm"):
        sd[vt + n + ".weight"] = torch.ones(16)
        sd[vt + n + ".bias"] = torch.zeros(16)
    e = vt + "encoder.layers.0."
    for n in ["q_proj", "k_proj", "v_proj", "out_proj"]:
        sd[e + f"self_attn.{n}.weight"] = w(16, 16)
        sd[e + f"self_attn.{n}.bias"] = torch.zeros(16)
    for n in ["layer_norm1", "layer_norm2"]:
        sd[e + n + ".weight"] = torch.ones(16)
        sd[e + n + ".bias"] = torch.zeros(16)
    sd[e + "mlp.fc1.weight"] = w(32, 16)
    sd[e + "mlp.fc1.bias"] = torch.zeros(32)
    sd[e + "mlp.fc2.weight"] = w(16, 32)
    sd[e + "mlp.fc2.bias"] = torch.zeros(16)
    torch.save(sd, os.path.join(path, "pytorch_model.bin"))
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump({
            "model_type": "llava_mpt",
            "vocab_size": vocab, "d_model": d, "n_layers": layers,
            "n_heads": 4, "expansion_ratio": 2, "max_seq_len": 128,
            "attn_config": {"alibi": True, "alibi_bias_max": 8},
            "mm_projector_type": "mlp2x_gelu", "mm_hidden_size": 16,
            "mm_use_im_patch_token": False,
            "tokenizer_model_max_length": 128, "max_sequence_length": 128,
        }, f)
    _write_tokenizer(path)


def test_builder_loads_llava_mpt_checkpoint(tmp_path):
    from tests.test_builder import _patch_tiny_vision

    from teochat_tpu import builder as builder_mod
    from teochat_tpu.builder import load_pretrained_model

    path = str(tmp_path / "llava-mpt-tiny")
    _tiny_llava_mpt_checkpoint(path)
    orig = _patch_tiny_vision(None)
    try:
        tokenizer, model, processor, ctx = load_pretrained_model(
            path, None, "llava-mpt-tiny"
        )
    finally:
        builder_mod.load_config = orig
    assert model.cfg.llm_backend == "mpt"
    assert isinstance(model.cfg.llm, MptConfig)
    assert "wte" in model.params["llm"]
    out = model.generate(
        [[1, 5, IMAGE_TOKEN_INDEX, 9]],
        np.random.RandomState(0).randn(1, 3, 28, 28).astype(np.float32),
        GenerationConfig(max_new_tokens=4, temperature=0.0, do_sample=False,
                         stop_strings=()),
    )
    assert len(out[0]) > 0


def test_builder_mpt_load_8bit(tmp_path):
    """load_8bit quantizes the MPT decoder projections (reference loads MPT
    8-bit through bitsandbytes, builder.py:94-103); int4 stays rejected."""
    from tests.test_builder import _patch_tiny_vision

    from teochat_tpu import builder as builder_mod
    from teochat_tpu.builder import load_pretrained_model

    path = str(tmp_path / "llava-mpt-tiny8")
    _tiny_llava_mpt_checkpoint(path)
    orig = _patch_tiny_vision(None)
    try:
        _, model, _, _ = load_pretrained_model(
            path, None, "llava-mpt-tiny8", load_8bit=True
        )
    finally:
        builder_mod.load_config = orig
    wqkv = model.params["llm"]["layers"]["wqkv"]
    assert wqkv["kernel"].dtype == jnp.int8 and "scale" in wqkv
    out = model.generate(
        [[1, 5, 9]], None,
        GenerationConfig(max_new_tokens=3, temperature=0.0, do_sample=False,
                         stop_strings=()),
    )
    assert len(out[0]) > 0
    with pytest.raises(NotImplementedError, match="llama backend"):
        load_pretrained_model(path, None, "llava-mpt-tiny8", load_int4=True)


def test_mpt_int8_logits_close_to_fp(model):
    """Weight-only int8 MPT forward tracks the fp forward (metric parity,
    not bit parity — same contract as the llama int8 path)."""
    from teochat_tpu.models.mpt import mpt_embed
    from teochat_tpu.ops.quant import quantize_mpt_params

    cfg = model.cfg.llm
    ids = np.random.RandomState(0).randint(1, cfg.vocab_size, (2, 9))
    emb = mpt_embed(model.params["llm"], jnp.asarray(ids))
    ref, _ = mpt_forward(model.params["llm"], cfg, emb)
    qp = quantize_mpt_params(model.params["llm"])
    got, _ = mpt_forward(qp, cfg, emb)
    ref, got = np.asarray(ref), np.asarray(got)
    denom = np.maximum(np.abs(ref).max(), 1e-6)
    assert np.abs(ref - got).max() / denom < 0.08
    # greedy argmax agreement on most positions
    agree = (ref.argmax(-1) == got.argmax(-1)).mean()
    assert agree > 0.8


def test_mpt_lora_train_and_merge(model):
    """LoRA attaches to the MPT layout (reference trains LLaVA-MPT with the
    same r=128 recipe), grads flow only through adapters, and merge_lora
    folds the delta back (logits match the adapter forward)."""
    from teochat_tpu.train.lora import (
        add_lora_params, lora_trainable_filter, merge_lora,
    )
    from teochat_tpu.train.trainer import (
        init_train_state, make_optimizer, make_train_step,
    )

    cfg = model.cfg
    # fresh params: the train step donates buffers — training on the shared
    # module fixture would delete its arrays under later tests
    params = init_teochat(jax.random.PRNGKey(5), cfg)
    params["llm"] = add_lora_params(
        jax.random.PRNGKey(1), params["llm"], rank=4, alpha=8.0
    )
    assert "lora_a" in params["llm"]["layers"]["wqkv"]
    # snapshot BEFORE the step: donation deletes the input buffers
    a0 = np.asarray(params["llm"]["layers"]["wqkv"]["lora_a"]).copy()
    k0 = np.asarray(params["llm"]["layers"]["wqkv"]["kernel"]).copy()

    optimizer = make_optimizer(1e-2, total_steps=10)
    state = init_train_state(params, optimizer, lora_trainable_filter)
    step = make_train_step(cfg, optimizer, trainable_filter=lora_trainable_filter)
    ids = [1, IMAGE_TOKEN_INDEX, 9, 11, 4]
    plan = fusion_mod.build_fusion_plan(
        [ids], tokens_per_frame=model.tokens_per_frame, max_length=64,
        pad_to=16, labels=[[-100, -100, 9, 11, 4]],
    )
    pixels = jnp.asarray(
        np.random.RandomState(1).randn(1, 3, 28, 28), jnp.float32
    )
    state, loss = step(state, plan, pixels)
    # step 2: the warmup schedule makes the very first update zero-LR
    state, loss = step(state, plan, pixels)
    assert np.isfinite(float(loss))
    # adapters moved, base kernel frozen
    a1 = np.asarray(state.params["llm"]["layers"]["wqkv"]["lora_a"])
    k1 = np.asarray(state.params["llm"]["layers"]["wqkv"]["kernel"])
    # lora_b starts at zero so first-step grads hit lora_b, not lora_a
    b1 = np.asarray(state.params["llm"]["layers"]["wqkv"]["lora_b"])
    assert np.abs(b1).max() > 0 or np.abs(a1 - a0).max() > 0
    np.testing.assert_array_equal(k0, k1)

    # merge: adapter forward == merged forward
    from teochat_tpu.models.mpt import mpt_embed

    llm = state.params["llm"]
    ids2 = np.random.RandomState(2).randint(1, cfg.llm.vocab_size, (1, 7))
    emb = mpt_embed(llm, jnp.asarray(ids2))
    with_adapters, _ = mpt_forward(llm, cfg.llm, emb)
    merged = merge_lora(llm)
    assert "lora_a" not in merged["layers"]["wqkv"]
    merged_logits, _ = mpt_forward(merged, cfg.llm, emb)
    np.testing.assert_allclose(
        np.asarray(with_adapters), np.asarray(merged_logits),
        atol=2e-2, rtol=2e-2,
    )


def test_chat_serves_mpt_with_kv_sessions(model):
    """MPT chats ride the same KV-reuse sessions as llama (suffix-only
    prefill via the dispatched spec-verify cache path): incremental responses
    match the stateless full-re-prefill Chat turn for turn."""
    from teochat_tpu.data.processing import ImageProcessor
    from teochat_tpu.serve.chat import Chat
    from tests.test_eval_e2e import MockTokenizer

    tok = MockTokenizer()
    m = TEOChat(model.cfg, model.params, tokenizer=tok)
    imgs = [np.random.RandomState(i).randint(0, 255, (40, 40, 3), np.uint8)
            for i in range(2)]

    chat_inc = Chat(model_bundle=(tok, m, ImageProcessor(size=28)))
    assert chat_inc._session is not None
    chat_full = Chat(model_bundle=(tok, m, ImageProcessor(size=28)),
                     incremental=False)
    chat_spec = Chat(model_bundle=(tok, m, ImageProcessor(size=28)))
    for turn, frames in (("What is here?", imgs), ("And now?", [])):
        r_inc = chat_inc.generate(turn, frames, temperature=0.0,
                                  max_new_tokens=4)
        r_full = chat_full.generate(turn, frames, temperature=0.0,
                                    max_new_tokens=4)
        r_spec = chat_spec.generate(turn, frames, temperature=0.0,
                                    max_new_tokens=4, speculative_k=3)
        assert r_inc["response"] == r_full["response"]
        # MPT sessions run the spec_verify suffix path too
        assert r_spec["response"] == r_full["response"]
    assert chat_inc._session.stats["reused_tokens"] > 0


def test_engine_serves_mpt(model):
    """The continuous-batching engine drives MPT through the backend
    dispatch: greedy outputs match TEOChat.generate, monolithic AND chunked
    prefill."""
    import threading

    from teochat_tpu.serve.engine import BatchEngine

    gen = GenerationConfig(max_new_tokens=5, temperature=0.0, do_sample=False,
                           stop_strings=())
    rng = np.random.RandomState(4)
    prompts = []
    for i in range(2):
        ids = [1, IMAGE_TOKEN_INDEX] + list(rng.randint(4, 90, 12 + 6 * i))
        frames = rng.randn(1, 3, 28, 28).astype(np.float32)
        prompts.append((ids, frames))
    expected = [model.generate([ids], fr, gen)[0] for ids, fr in prompts]

    for prefill_chunk in (None, 8):
        engine = BatchEngine(model, max_slots=2, max_len=96, chunk=2,
                             prefill_chunk=prefill_chunk).start()
        try:
            results = [None] * len(prompts)
            threads = []
            for i, (ids, fr) in enumerate(prompts):
                def run(i=i, ids=ids, fr=fr):
                    results[i] = engine.submit(ids, fr, gen)
                t = threading.Thread(target=run)
                t.start()
                threads.append(t)
            for t in threads:
                t.join(timeout=600)
            assert results == expected, f"prefill_chunk={prefill_chunk}"
        finally:
            engine.shutdown()

    # speculative engine: same greedy outputs through the MPT spec chunk
    engine = BatchEngine(model, max_slots=2, max_len=96, chunk=2,
                         speculative_k=3).start()
    try:
        got = [engine.submit(ids, fr, gen) for ids, fr in prompts]
        assert got == expected
    finally:
        engine.shutdown()


def test_mpt_config_json_roundtrip(tmp_path, model):
    """MPT configs survive checkpoint save/load (auto-resume path)."""
    from teochat_tpu.checkpoint.orbax_io import load_checkpoint, save_checkpoint

    cfg = model.cfg
    s = cfg.to_json()
    cfg2 = TEOChatConfig.from_json(s)
    assert isinstance(cfg2.llm, MptConfig) and cfg2.llm == cfg.llm
    assert cfg2.llm_backend == "mpt"

    save_checkpoint(str(tmp_path), model.params, cfg, step=1)
    params_r, cfg_r, _ = load_checkpoint(
        str(tmp_path / "checkpoint-1"), params_template=model.params
    )
    assert isinstance(cfg_r.llm, MptConfig)
    np.testing.assert_array_equal(
        np.asarray(params_r["llm"]["wte"]["embedding"]),
        np.asarray(model.params["llm"]["wte"]["embedding"]),
    )

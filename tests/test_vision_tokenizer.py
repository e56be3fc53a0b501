"""Vision-tokenizer machinery: token adds, embedding resize, prompt wrap.

Covers the reference behaviors of llava_arch.py:348-391
(initialize_vision_tokenizer), builder.py:135-148 (load-time add + resize)
and builder.py:42-45 (LoRA grown-vocab resize), end-to-end on tiny fake
checkpoints.
"""

import dataclasses
import json
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from teochat_tpu.constants import (
    DEFAULT_IM_END_TOKEN,
    DEFAULT_IM_START_TOKEN,
    DEFAULT_IMAGE_TOKEN,
    IMAGE_TOKEN_INDEX,
)
from teochat_tpu.vision_tokenizer import (
    add_vision_tokens,
    initialize_vision_tokenizer,
    resize_token_embeddings,
    wrap_image_tokens,
)


class GrowableMockTokenizer:
    """Word-level mock with HF-style add_tokens/len semantics."""

    bos_token_id = 1

    def __init__(self, vocab_size=16):
        self.vocab = {"<s>": 1, "</s>": 2}
        self._size = vocab_size

    def add_tokens(self, tokens, special_tokens=False):
        added = 0
        for t in tokens:
            if t not in self.vocab:
                self.vocab[t] = self._size
                self._size += 1
                added += 1
        return added

    def __len__(self):
        return self._size

    def __call__(self, text):
        ids = [self.bos_token_id]
        for w in text.split():
            if w not in self.vocab:
                self.vocab[w] = min(self._size - 1, 3 + len(self.vocab))
            ids.append(self.vocab[w])
        return types.SimpleNamespace(input_ids=ids)


def test_wrap_image_tokens():
    s = f"Image 1: {DEFAULT_IMAGE_TOKEN} Image 2: {DEFAULT_IMAGE_TOKEN} what changed?"
    w = wrap_image_tokens(s)
    assert w.count(DEFAULT_IM_START_TOKEN + DEFAULT_IMAGE_TOKEN + DEFAULT_IM_END_TOKEN) == 2
    assert w.startswith("Image 1: " + DEFAULT_IM_START_TOKEN)


def _tiny_llm_params(rng, vocab=16, d=8, tie=False):
    k1, k2 = jax.random.split(jax.random.PRNGKey(rng))
    p = {"embed_tokens": {"embedding": jax.random.normal(k1, (vocab, d))}}
    if not tie:
        p["lm_head"] = {"kernel": jax.random.normal(k2, (d, vocab))}
    return p


def test_resize_grow_mean_init_plain():
    p = _tiny_llm_params(0)
    out = resize_token_embeddings(p, 19)
    emb = np.asarray(out["embed_tokens"]["embedding"])
    assert emb.shape == (19, 8)
    np.testing.assert_allclose(
        emb[16:], np.tile(np.asarray(p["embed_tokens"]["embedding"]).mean(0), (3, 1)),
        rtol=1e-5,
    )
    head = np.asarray(out["lm_head"]["kernel"])
    assert head.shape == (8, 19)
    np.testing.assert_allclose(
        head[:, 16:],
        np.tile(np.asarray(p["lm_head"]["kernel"]).mean(1, keepdims=True), (1, 3)),
        rtol=1e-5,
    )
    # old entries untouched
    np.testing.assert_array_equal(emb[:16], np.asarray(p["embed_tokens"]["embedding"]))
    np.testing.assert_array_equal(head[:, :16], np.asarray(p["lm_head"]["kernel"]))


def test_resize_shrink_truncates():
    p = _tiny_llm_params(1)
    out = resize_token_embeddings(p, 12)
    assert np.asarray(out["embed_tokens"]["embedding"]).shape == (12, 8)
    assert np.asarray(out["lm_head"]["kernel"]).shape == (8, 12)


def test_resize_tied_embeddings_no_head():
    p = _tiny_llm_params(2, tie=True)
    out = resize_token_embeddings(p, 20)
    assert "lm_head" not in out
    assert np.asarray(out["embed_tokens"]["embedding"]).shape == (20, 8)


def test_resize_int8_lm_head_roundtrip():
    from teochat_tpu.ops.quant import dequantize_kernel, quantize_kernel

    p = _tiny_llm_params(3)
    p["lm_head"] = quantize_kernel(p["lm_head"]["kernel"])
    before = np.asarray(dequantize_kernel(p["lm_head"]))
    out = resize_token_embeddings(p, 18)
    assert out["lm_head"]["kernel"].dtype == jnp.int8
    after = np.asarray(dequantize_kernel(out["lm_head"]))
    assert after.shape == (8, 18)
    # untouched columns survive the dequant->requant round trip exactly
    # (per-output-column scales are unchanged)
    np.testing.assert_allclose(after[:, :16], before, rtol=1e-6)


def test_resize_int4_lm_head():
    from teochat_tpu.ops.quant import quantize_kernel_int4
    from teochat_tpu.vision_tokenizer import _dequant_lm_head

    w = jax.random.normal(jax.random.PRNGKey(4), (16, 256))
    p = {
        "embed_tokens": {"embedding": jax.random.normal(jax.random.PRNGKey(5), (256, 16))},
        "lm_head": quantize_kernel_int4(w),
    }
    before = np.asarray(_dequant_lm_head(p["lm_head"]))
    out = resize_token_embeddings(p, 260)
    after = np.asarray(_dequant_lm_head(out["lm_head"]))
    assert after.shape == (16, 260)
    np.testing.assert_allclose(after[:, :256], before, atol=1e-5)


def test_initialize_vision_tokenizer_flags_and_cfg():
    from teochat_tpu.config import TEOChatConfig, LlamaConfig

    tok = GrowableMockTokenizer(vocab_size=16)
    cfg = TEOChatConfig(
        llm=LlamaConfig(
            vocab_size=16, hidden_size=8, intermediate_size=16,
            num_layers=1, num_heads=2, num_kv_heads=2,
        )
    )
    params = {"llm": _tiny_llm_params(6)}
    ma = types.SimpleNamespace(mm_use_im_patch_token=True, mm_use_im_start_end=True)
    cfg2, params2, n_new = initialize_vision_tokenizer(ma, cfg, params, tok)
    # <im_patch> + <im_start> + <im_end> (video variants share <im_patch>,
    # vid_start/end only added by the load-time add_vision_tokens path)
    assert n_new == 3
    assert cfg2.llm.vocab_size == len(tok) == 19
    assert cfg2.mm_use_im_start_end and cfg2.mm_use_im_patch_token
    emb = np.asarray(params2["llm"]["embed_tokens"]["embedding"])
    assert emb.shape == (19, 8)
    np.testing.assert_allclose(
        emb[16:],
        np.tile(np.asarray(params["llm"]["embed_tokens"]["embedding"]).mean(0), (3, 1)),
        rtol=1e-5,
    )


def test_add_vision_tokens_dedupe():
    tok = GrowableMockTokenizer()
    n1 = add_vision_tokens(tok, True, True)
    n2 = add_vision_tokens(tok, True, True)
    assert n1 == 5  # <im_patch>, <im_start>, <im_end>, <vid_start>, <vid_end>
    assert n2 == 0


def test_preprocess_multimodal_wraps():
    from teochat_tpu.data.dataset import DataArguments, preprocess_multimodal

    da = DataArguments(mm_use_im_start_end=True, prompt_strategy="interleave")
    src = [[{"from": "human", "value": "<video>\nWhat changed?"}]]
    out = preprocess_multimodal([list(map(dict, s)) for s in src], da,
                                num_video_images=2)
    v = out[0][0]["value"]
    assert v.count(DEFAULT_IM_START_TOKEN + DEFAULT_IMAGE_TOKEN + DEFAULT_IM_END_TOKEN) == 2
    assert "Image 1: " + DEFAULT_IM_START_TOKEN in v

    # flag off -> byte-identical to the old behavior
    da_off = DataArguments(prompt_strategy="interleave")
    out_off = preprocess_multimodal([list(map(dict, s)) for s in src], da_off,
                                    num_video_images=2)
    assert DEFAULT_IM_START_TOKEN not in out_off[0][0]["value"]


def test_wrapped_prompt_tokenizes_with_sentinels():
    """End-to-end: wrapped text -> tokenizer_image_token keeps one sentinel
    per frame with the start/end ids adjacent."""
    from teochat_tpu.mm_utils import tokenizer_image_token

    tok = GrowableMockTokenizer(vocab_size=32)
    add_vision_tokens(tok, False, True)
    start_id, end_id = tok.vocab[DEFAULT_IM_START_TOKEN], tok.vocab[DEFAULT_IM_END_TOKEN]
    text = wrap_image_tokens(f"look {DEFAULT_IMAGE_TOKEN} now")
    # mock tokenizer is whitespace-split; keep markers as standalone words
    text = text.replace(DEFAULT_IM_START_TOKEN + DEFAULT_IMAGE_TOKEN,
                        DEFAULT_IM_START_TOKEN + " " + DEFAULT_IMAGE_TOKEN)
    text = text.replace(DEFAULT_IMAGE_TOKEN + DEFAULT_IM_END_TOKEN,
                        DEFAULT_IMAGE_TOKEN + " " + DEFAULT_IM_END_TOKEN)
    ids = tokenizer_image_token(text, tok)
    i = ids.index(IMAGE_TOKEN_INDEX)
    assert ids[i - 1] == start_id and ids[i + 1] == end_id


# --------------------------------------------------------- builder round trips

torch = pytest.importorskip("torch")


def test_builder_load_time_token_add(tmp_path):
    from tests.test_builder import (
        _patch_tiny_vision,
        _tiny_hf_config,
        _tiny_llama_sd,
        _write_tokenizer,
    )
    from teochat_tpu import builder as builder_mod
    from teochat_tpu.builder import load_pretrained_model

    path = tmp_path / "ckpt_imse"
    path.mkdir()
    cfg = _tiny_hf_config()
    cfg["mm_use_im_start_end"] = True
    cfg["mm_use_im_patch_token"] = True
    with open(path / "config.json", "w") as f:
        json.dump(cfg, f)
    torch.save(_tiny_llama_sd(), path / "pytorch_model.bin")
    _write_tokenizer(str(path))

    orig = _patch_tiny_vision(None)
    try:
        tokenizer, model, _, _ = load_pretrained_model(str(path), None, "TEOChat-tiny")
    finally:
        builder_mod.load_config = orig
    # 64 base + <im_patch> + <im_start> + <im_end> + <vid_start> + <vid_end>
    assert len(tokenizer) == 69
    emb = np.asarray(model.params["llm"]["embed_tokens"]["embedding"])
    assert emb.shape[0] == 69
    assert model.cfg.llm.vocab_size == 69
    assert model.cfg.mm_use_im_start_end
    # wrapped prompt tokenizes through the REAL tokenizer with markers intact
    from teochat_tpu.mm_utils import tokenizer_image_token

    ids = tokenizer_image_token(wrap_image_tokens("w5 <image> w6"), tokenizer)
    i = ids.index(IMAGE_TOKEN_INDEX)
    assert ids[i - 1] == tokenizer.convert_tokens_to_ids(DEFAULT_IM_START_TOKEN)
    assert ids[i + 1] == tokenizer.convert_tokens_to_ids(DEFAULT_IM_END_TOKEN)
    # and the model generates with the grown vocab
    out = model.generate(
        [ids], np.random.RandomState(0).randn(1, 3, 28, 28).astype(np.float32)
    )
    assert len(out[0]) > 0


def test_builder_lora_grown_vocab(tmp_path):
    """Reference builder.py:42-45: LoRA dir declares a larger vocab than the
    base; embeddings grow and the trained rows from non_lora_trainables win."""
    from tests.test_builder import (
        _patch_tiny_vision,
        _tiny_hf_config,
        _tiny_llama_sd,
        _write_tokenizer,
    )
    from teochat_tpu import builder as builder_mod
    from teochat_tpu.builder import load_pretrained_model

    base = tmp_path / "base"
    base.mkdir()
    with open(base / "config.json", "w") as f:
        json.dump(_tiny_hf_config(), f)
    torch.save(_tiny_llama_sd(), base / "pytorch_model.bin")
    _write_tokenizer(str(base))

    lora_dir = tmp_path / "teochat-lora-imse"
    lora_dir.mkdir()
    cfg = _tiny_hf_config()
    cfg["vocab_size"] = 69  # grown during mm_use_im_start_end training
    cfg["mm_use_im_start_end"] = True
    cfg["mm_use_im_patch_token"] = True
    with open(lora_dir / "config.json", "w") as f:
        json.dump(cfg, f)
    with open(lora_dir / "adapter_config.json", "w") as f:
        json.dump({"r": 4, "lora_alpha": 8}, f)
    g = torch.Generator().manual_seed(11)
    adapter = {
        "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight":
            torch.randn(4, 32, generator=g) * 0.1,
        "base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight":
            torch.randn(32, 4, generator=g) * 0.1,
        "base_model.model.model.layers.1.self_attn.q_proj.lora_A.weight":
            torch.randn(4, 32, generator=g) * 0.1,
        "base_model.model.model.layers.1.self_attn.q_proj.lora_B.weight":
            torch.randn(32, 4, generator=g) * 0.1,
    }
    torch.save(adapter, lora_dir / "adapter_model.bin")
    grown_embed = torch.randn(69, 32, generator=g) * 0.1
    nlt = {
        "base_model.model.model.embed_tokens.weight": grown_embed,
        "base_model.model.model.mm_projector.0.weight": torch.randn(32, 16, generator=g) * 0.1,
        "base_model.model.model.mm_projector.0.bias": torch.zeros(32),
        "base_model.model.model.mm_projector.2.weight": torch.randn(32, 32, generator=g) * 0.1,
        "base_model.model.model.mm_projector.2.bias": torch.zeros(32),
    }
    torch.save(nlt, lora_dir / "non_lora_trainables.bin")
    _write_tokenizer(str(lora_dir))

    orig = _patch_tiny_vision(None)
    try:
        tokenizer, model, _, _ = load_pretrained_model(
            str(lora_dir), str(base), "teochat-lora-imse"
        )
    finally:
        builder_mod.load_config = orig
    assert len(tokenizer) == 69
    emb = np.asarray(model.params["llm"]["embed_tokens"]["embedding"])
    assert emb.shape[0] == 69
    # the trained rows from non_lora_trainables override the mean-init
    np.testing.assert_allclose(
        emb, grown_embed.numpy(), atol=1e-2,  # bf16 cast at load
    )
    out = model.generate([[1, 5, 9]], None)
    assert len(out[0]) >= 0


def test_train_initializes_vision_tokenizer(tmp_path):
    """Smoke: train() with mm_use_im_start_end grows injected params+tokenizer
    and records the flag in the returned config path (dataset wrap covered by
    test_preprocess_multimodal_wraps)."""
    from teochat_tpu.config import TEOChatConfig, LlamaConfig
    from teochat_tpu.train.train import ModelArguments

    tok = GrowableMockTokenizer(vocab_size=16)
    cfg = TEOChatConfig(
        llm=LlamaConfig(
            vocab_size=16, hidden_size=8, intermediate_size=16,
            num_layers=1, num_heads=2, num_kv_heads=2,
        )
    )
    params = {"llm": _tiny_llm_params(7)}
    ma = ModelArguments(mm_use_im_start_end=True, mm_use_im_patch_token=True)
    cfg2, params2, n = initialize_vision_tokenizer(ma, cfg, params, tok)
    assert n == 3 and cfg2.llm.vocab_size == 19
    assert params2["llm"]["embed_tokens"]["embedding"].shape[0] == 19

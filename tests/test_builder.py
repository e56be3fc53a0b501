"""Builder integration: load merged / LoRA / 8-bit checkpoints from disk.

Creates a genuine tiny HF-format checkpoint directory (torch state_dict +
config.json + fast tokenizer.json) and drives builder.load_pretrained_model
through its branches (reference builder.py:27-171 parity).
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from teochat_tpu.builder import load_pretrained_model  # noqa: E402


def _tiny_hf_config():
    return {
        "architectures": ["LlavaLlamaForCausalLM"],
        "model_type": "llava",
        "vocab_size": 64,
        "hidden_size": 32,
        "intermediate_size": 64,
        "num_hidden_layers": 2,
        "num_attention_heads": 4,
        "num_key_value_heads": 4,
        "rms_norm_eps": 1e-5,
        "max_position_embeddings": 128,
        "mm_projector_type": "mlp2x_gelu",
        "mm_hidden_size": 16,
        "mm_vision_select_layer": -2,
        "mm_vision_select_feature": "patch",
        "tokenizer_model_max_length": 256,
        "max_sequence_length": 128,
    }


def _write_tokenizer(path):
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}
    for i in range(3, 64):
        vocab[f"w{i}"] = i
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    tok.save(os.path.join(path, "tokenizer.json"))
    with open(os.path.join(path, "tokenizer_config.json"), "w") as f:
        json.dump({"tokenizer_class": "PreTrainedTokenizerFast",
                   "bos_token": "<s>", "eos_token": "</s>", "unk_token": "<unk>"}, f)


def _tiny_llama_sd(seed=0, vocab=64, d=32, inter=64, layers=2):
    g = torch.Generator().manual_seed(seed)

    def w(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    sd = {
        "model.embed_tokens.weight": w(vocab, d),
        "model.norm.weight": torch.ones(d),
        "lm_head.weight": w(vocab, d),
    }
    for i in range(layers):
        p = f"model.layers.{i}."
        sd[p + "self_attn.q_proj.weight"] = w(d, d)
        sd[p + "self_attn.k_proj.weight"] = w(d, d)
        sd[p + "self_attn.v_proj.weight"] = w(d, d)
        sd[p + "self_attn.o_proj.weight"] = w(d, d)
        sd[p + "mlp.gate_proj.weight"] = w(inter, d)
        sd[p + "mlp.up_proj.weight"] = w(inter, d)
        sd[p + "mlp.down_proj.weight"] = w(d, inter)
        sd[p + "input_layernorm.weight"] = torch.ones(d)
        sd[p + "post_attention_layernorm.weight"] = torch.ones(d)
    # projector (mm_hidden 16 -> 32, mlp2x)
    sd["model.mm_projector.0.weight"] = w(32, 16)
    sd["model.mm_projector.0.bias"] = torch.zeros(32)
    sd["model.mm_projector.2.weight"] = w(32, 32)
    sd["model.mm_projector.2.bias"] = torch.zeros(32)
    # embedded vision tower (tiny CLIP: d=16, 1 layer, patch 14 @ 28px)
    vt = "model.image_tower.vision_model."
    sd[vt + "embeddings.patch_embedding.weight"] = w(16, 3, 14, 14)
    sd[vt + "embeddings.class_embedding"] = w(16)
    sd[vt + "embeddings.position_embedding.weight"] = w(5, 16)
    sd[vt + "pre_layrnorm.weight"] = torch.ones(16)
    sd[vt + "pre_layrnorm.bias"] = torch.zeros(16)
    sd[vt + "post_layernorm.weight"] = torch.ones(16)
    sd[vt + "post_layernorm.bias"] = torch.zeros(16)
    e = vt + "encoder.layers.0."
    for n in ["q_proj", "k_proj", "v_proj", "out_proj"]:
        sd[e + f"self_attn.{n}.weight"] = w(16, 16)
        sd[e + f"self_attn.{n}.bias"] = torch.zeros(16)
    sd[e + "layer_norm1.weight"] = torch.ones(16)
    sd[e + "layer_norm1.bias"] = torch.zeros(16)
    sd[e + "layer_norm2.weight"] = torch.ones(16)
    sd[e + "layer_norm2.bias"] = torch.zeros(16)
    sd[e + "mlp.fc1.weight"] = w(32, 16)
    sd[e + "mlp.fc1.bias"] = torch.zeros(32)
    sd[e + "mlp.fc2.weight"] = w(16, 32)
    sd[e + "mlp.fc2.bias"] = torch.zeros(16)
    return sd


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    path = tmp_path_factory.mktemp("merged_ckpt")
    cfg = _tiny_hf_config()
    # tiny tower geometry so the whole thing runs
    with open(path / "config.json", "w") as f:
        json.dump(cfg, f)
    torch.save(_tiny_llama_sd(), path / "pytorch_model.bin")
    _write_tokenizer(str(path))
    return str(path)


def _patch_tiny_vision(monkeypatch):
    """load_config assumes the production ViT-L tower; shrink it for the test."""
    from teochat_tpu import builder as builder_mod
    from teochat_tpu.config import VisionConfig

    orig = builder_mod.load_config

    def patched(model_path):
        cfg = orig(model_path)
        import dataclasses

        return dataclasses.replace(
            cfg,
            vision=VisionConfig(
                image_size=28, patch_size=14, hidden_size=16,
                intermediate_size=32, num_layers=1, num_heads=4,
            ),
        )

    builder_mod.load_config = patched
    return orig


def test_load_merged_checkpoint(ckpt_dir, monkeypatch):
    from teochat_tpu import builder as builder_mod

    orig = _patch_tiny_vision(monkeypatch)
    try:
        tokenizer, model, processor, ctx = load_pretrained_model(
            ckpt_dir, None, "TEOChat-tiny"
        )
    finally:
        builder_mod.load_config = orig
    assert ctx == 128
    assert tokenizer("w5 w6").input_ids is not None
    assert "image" in processor
    # config-selected video decode backend reaches the processor
    # (reference processing_video.py:26-114 backend switch)
    assert processor["video"].video_decode_backend == "opencv"
    # generate end-to-end from the loaded weights
    out = model.generate(
        [[1, 5, -200, 9]],
        np.random.RandomState(0).randn(1, 3, 28, 28).astype(np.float32),
    )
    assert len(out[0]) > 0


def test_load_8bit_quantizes_decoder(ckpt_dir):
    from teochat_tpu import builder as builder_mod

    orig = _patch_tiny_vision(None)
    try:
        _, model, _, _ = load_pretrained_model(
            ckpt_dir, None, "TEOChat-tiny", load_8bit=True
        )
    finally:
        builder_mod.load_config = orig
    import jax.numpy as jnp

    q = model.params["llm"]["layers"]["attn"]["q"]
    assert q["kernel"].dtype == jnp.int8
    assert "scale" in q


def test_load_4bit_rejected(ckpt_dir):
    with pytest.raises(NotImplementedError):
        load_pretrained_model(ckpt_dir, None, "x", load_4bit=True)


def test_lora_branch(ckpt_dir, tmp_path):
    """LoRA dir + base: adapters merged, non_lora_trainables applied."""
    from teochat_tpu import builder as builder_mod

    lora_dir = tmp_path / "teochat-lora"
    lora_dir.mkdir()
    with open(lora_dir / "config.json", "w") as f:
        json.dump(_tiny_hf_config(), f)
    with open(lora_dir / "adapter_config.json", "w") as f:
        json.dump({"r": 4, "lora_alpha": 8}, f)
    g = torch.Generator().manual_seed(7)
    adapter = {}
    for i in range(2):
        base = f"base_model.model.model.layers.{i}.self_attn.q_proj"
        adapter[base + ".lora_A.weight"] = torch.randn(4, 32, generator=g) * 0.1
        adapter[base + ".lora_B.weight"] = torch.randn(32, 4, generator=g) * 0.1
    torch.save(adapter, lora_dir / "adapter_model.bin")
    nlt = {
        "base_model.model.model.mm_projector.0.weight": torch.randn(32, 16, generator=g) * 0.1,
        "base_model.model.model.mm_projector.0.bias": torch.zeros(32),
        "base_model.model.model.mm_projector.2.weight": torch.randn(32, 32, generator=g) * 0.1,
        "base_model.model.model.mm_projector.2.bias": torch.zeros(32),
    }
    torch.save(nlt, lora_dir / "non_lora_trainables.bin")
    _write_tokenizer(str(lora_dir))

    orig = _patch_tiny_vision(None)
    try:
        _, model_lora, _, _ = load_pretrained_model(
            str(lora_dir), ckpt_dir, "teochat-lora"
        )
        _, model_base, _, _ = load_pretrained_model(ckpt_dir, None, "TEOChat-tiny")
    finally:
        builder_mod.load_config = orig
    q_lora = np.asarray(model_lora.params["llm"]["layers"]["attn"]["q"]["kernel"])
    q_base = np.asarray(model_base.params["llm"]["layers"]["attn"]["q"]["kernel"])
    assert np.abs(q_lora - q_base).max() > 1e-4  # LoRA delta merged
    k_lora = np.asarray(model_lora.params["llm"]["layers"]["attn"]["k"]["kernel"])
    k_base = np.asarray(model_base.params["llm"]["layers"]["attn"]["k"]["kernel"])
    np.testing.assert_allclose(k_lora, k_base, atol=1e-6)  # k untouched
    # non_lora projector applied (differs from base projector)
    p_lora = np.asarray(model_lora.params["projector"]["layers"][0]["kernel"])
    p_base = np.asarray(model_base.params["projector"]["layers"][0]["kernel"])
    assert np.abs(p_lora - p_base).max() > 1e-4


def test_load_int4_quantizes_decoder(ckpt_dir):
    from teochat_tpu import builder as builder_mod

    orig = _patch_tiny_vision(None)
    try:
        _, model, _, _ = load_pretrained_model(
            ckpt_dir, None, "TEOChat-tiny", load_int4=True
        )
    finally:
        builder_mod.load_config = orig
    import jax.numpy as jnp

    # load_int4 fuses q|k|v at quantize time (ops/quant.py fuse_projections)
    qkv = model.params["llm"]["layers"]["attn"]["qkv"]
    assert (
        "packed" in qkv and qkv["packed"].dtype == jnp.uint8
    ) or "packed_tiles" in qkv
    # int4 model still generates
    out = model.generate(
        [[1, 5, 9]], None,
    )
    assert len(out[0]) >= 0


def test_allow_partial_and_initialize_vision_modules(tmp_path):
    """Reference train-time flow (train.py:961 + llava_arch.py:51): load a
    plain LM with allow_partial, then attach tower + projector via
    initialize_vision_modules from --image_tower / --pretrain_mm_mlp_adapter."""
    from types import SimpleNamespace

    from teochat_tpu import builder as builder_mod
    from teochat_tpu.builder import initialize_vision_modules
    from teochat_tpu.models.teochat import TEOChat

    # plain-LM checkpoint: no projector, no vision, no mm config fields
    lm_dir = tmp_path / "plain_lm"
    lm_dir.mkdir()
    cfg_json = _tiny_hf_config()
    for k in ("mm_projector_type", "mm_hidden_size"):
        cfg_json.pop(k)
    with open(lm_dir / "config.json", "w") as f:
        json.dump(cfg_json, f)
    full_sd = _tiny_llama_sd()
    lm_sd = {
        k: v for k, v in full_sd.items()
        if "mm_projector" not in k and "image_tower" not in k
    }
    torch.save(lm_sd, lm_dir / "pytorch_model.bin")
    _write_tokenizer(str(lm_dir))

    # tower checkpoint dir (LanguageBind_Image layout: vision_model.* keys)
    tower_dir = tmp_path / "tower"
    tower_dir.mkdir()
    tower_sd = {
        k.replace("model.image_tower.", ""): v
        for k, v in full_sd.items() if "image_tower" in k
    }
    torch.save(tower_sd, tower_dir / "pytorch_model.bin")

    # pretrained projector file (reference --pretrain_mm_mlp_adapter)
    adapter = tmp_path / "mm_projector.bin"
    torch.save(
        {k: v for k, v in full_sd.items() if "mm_projector" in k}, adapter
    )

    orig = _patch_tiny_vision(None)
    try:
        tokenizer, model, _, _ = load_pretrained_model(
            str(lm_dir), None, "plain-lm", allow_partial=True
        )
    finally:
        builder_mod.load_config = orig
    assert "vision" not in model.params and "projector" not in model.params

    model_args = SimpleNamespace(
        image_tower=str(tower_dir), video_tower=None,
        mm_projector_type="mlp2x_gelu", mm_vision_select_layer=-2,
        mm_vision_select_feature="patch",
        pretrain_mm_mlp_adapter=str(adapter),
    )
    cfg2, params2 = initialize_vision_modules(model_args, model.cfg, model.params)
    assert cfg2.projector.projector_type == "mlp2x_gelu"
    assert cfg2.projector.mm_hidden_size == 16
    assert "vision" in params2 and "projector" in params2
    # pretrained projector rows actually loaded (not fresh-init)
    p0 = np.asarray(params2["projector"]["layers"][0]["kernel"], np.float32)
    np.testing.assert_allclose(
        p0, full_sd["model.mm_projector.0.weight"].numpy().T, atol=2e-2
    )
    # the attached model runs end-to-end
    out = TEOChat(cfg2, params2, tokenizer=tokenizer).generate(
        [[1, 5, -200, 9]],
        np.random.RandomState(0).randn(1, 3, 28, 28).astype(np.float32),
    )
    assert len(out[0]) > 0


def test_initialize_vision_modules_fresh_projector(tmp_path):
    """No pretrain adapter -> projector fresh-init (llava_arch.py:112-118)."""
    from types import SimpleNamespace

    import jax

    from teochat_tpu.builder import initialize_vision_modules
    from teochat_tpu.config import (
        LlamaConfig, ProjectorConfig, TEOChatConfig, VisionConfig,
    )

    vis = VisionConfig(image_size=28, patch_size=14, hidden_size=16,
                       intermediate_size=32, num_layers=1, num_heads=4)
    cfg = TEOChatConfig(
        vision=vis,
        projector=ProjectorConfig(mm_hidden_size=16, hidden_size=32),
        llm=LlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                        num_layers=2, num_heads=4, num_kv_heads=4),
    )
    from teochat_tpu.models.vit import init_vit

    params = {"llm": {}, "vision": init_vit(jax.random.PRNGKey(0), vis)}
    model_args = SimpleNamespace(
        image_tower=None, video_tower=None, mm_projector_type="linear",
        mm_vision_select_layer=-1, mm_vision_select_feature="cls_patch",
        pretrain_mm_mlp_adapter=None,
    )
    cfg2, params2 = initialize_vision_modules(model_args, cfg, params)
    assert cfg2.mm_vision_select_layer == -1
    assert cfg2.mm_vision_select_feature == "cls_patch"
    assert cfg2.projector.projector_type == "linear"
    assert params2["projector"]["layers"][0]["kernel"].shape == (16, 32)

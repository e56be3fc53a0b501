"""Train-driver integration: tiny model, LoRA, a few steps, resume."""

import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from teochat_tpu.config import tiny_test_config
from teochat_tpu.data.dataset import DataArguments
from teochat_tpu.models.teochat import init_teochat
from teochat_tpu.train.train import ModelArguments, TrainingArguments, train
from tests.test_data_pipeline import MockTokenizer, TinyProcessor, _raw_example


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config(vocab_size=256)
    params = init_teochat(jax.random.PRNGKey(0), cfg)
    tok = MockTokenizer()
    data = [_raw_example(2, s) for s in range(6)]
    return cfg, params, tok, data


def _args(tmp_path, **kw):
    base = dict(
        output_dir=str(tmp_path),
        per_device_train_batch_size=2,
        learning_rate=1e-3,
        mm_projector_lr=2e-3,
        logging_steps=1,
        save_steps=2,
        bf16=False,
    )
    base.update(kw)
    ta = TrainingArguments(**base)
    da = DataArguments(image_processor=TinyProcessor())
    ma = ModelArguments()
    return ma, da, ta


def test_lora_training_reduces_loss_and_freezes_backbone(setup, tmp_path):
    cfg, params, tok, data = setup
    ma, da, ta = _args(tmp_path / "run1", lora_enable=True)
    kernel_before = np.asarray(params["llm"]["layers"]["attn"]["q"]["kernel"]).copy()
    vision_before = np.asarray(params["vision"]["layers"]["mlp"]["fc1"]["kernel"]).copy()

    state = train(ma, da, ta, cfg=cfg, params=params, tokenizer=tok,
                  dataset=data, max_steps_override=3)
    assert int(state.step) == 3

    # backbone + tower frozen, LoRA B moved
    np.testing.assert_array_equal(
        np.asarray(state.params["llm"]["layers"]["attn"]["q"]["kernel"]), kernel_before
    )
    np.testing.assert_array_equal(
        np.asarray(state.params["vision"]["layers"]["mlp"]["fc1"]["kernel"]),
        vision_before,
    )
    assert np.abs(np.asarray(state.params["llm"]["layers"]["attn"]["q"]["lora_b"])).max() > 0
    # projector trained (separate lr group)
    assert np.abs(
        np.asarray(state.params["projector"]["layers"][0]["kernel"])
        - np.asarray(params["projector"]["layers"][0]["kernel"])
    ).max() > 0


def test_auto_resume(setup, tmp_path):
    cfg, params, tok, data = setup
    out = tmp_path / "run2"
    ma, da, ta = _args(out, lora_enable=True, save_steps=2)
    train(ma, da, ta, cfg=cfg, params=params, tokenizer=tok,
          dataset=data, max_steps_override=2)
    assert (out / "checkpoint-2").is_dir()

    # second invocation resumes from checkpoint-2
    state = train(ma, da, ta, cfg=cfg, params=params, tokenizer=tok,
                  dataset=data, max_steps_override=4)
    assert int(state.step) == 4


def test_kbit_lora_training_over_int8_backbone(setup, tmp_path):
    """Reference --bits 8 + LoRA recipe: int8 frozen backbone, LoRA grads flow."""
    import jax.numpy as jnp

    from teochat_tpu.ops.quant import quantize_llama_params
    from teochat_tpu.train.lora import add_lora_params

    cfg, params, tok, data = setup
    qparams = dict(params)
    qparams["llm"] = add_lora_params(
        jax.random.PRNGKey(5), quantize_llama_params(params["llm"]), rank=4
    )
    ma, da, ta = _args(tmp_path / "kbit", lora_enable=False)  # LoRA already added
    from teochat_tpu.train.lora import lora_trainable_filter
    from teochat_tpu.train.trainer import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )
    from teochat_tpu.models.fusion import build_fusion_plan
    from teochat_tpu.data.dataset import LazySupervisedDataset, TEOChatCollator, DataArguments

    optimizer = make_optimizer(1e-3, total_steps=10)
    state = init_train_state(qparams, optimizer, lora_trainable_filter)
    step_fn = make_train_step(cfg, optimizer, trainable_filter=lora_trainable_filter)

    ds = LazySupervisedDataset(tok, DataArguments(image_processor=TinyProcessor()), dataset=data)
    collator = TEOChatCollator(tok, tokens_per_frame=cfg.vision.num_patches,
                               seq_buckets=(64, 128))
    plan, pixels = collator([ds[0], ds[1]])
    # step 0 is inside warmup (lr=0); take a few steps so updates land
    for _ in range(3):
        state, loss = step_fn(state, plan, jnp.asarray(pixels, jnp.float32))
    assert np.isfinite(float(loss))
    # int8 kernel untouched; LoRA B moved
    assert state.params["llm"]["layers"]["attn"]["q"]["kernel"].dtype.name == "int8"
    assert np.abs(np.asarray(state.params["llm"]["layers"]["attn"]["q"]["lora_b"])).max() > 0

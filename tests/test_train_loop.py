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

pytestmark = pytest.mark.slow  # heavy suite: excluded from the smoke tier


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


def test_gradient_accumulation_matches_big_batch(setup):
    """accum=4 over four bs=1 micro-batches == one bs=4 step (same rows; rows
    built with identical valid-label counts so per-micro means average to the
    big-batch mean). Recipe parity: train_teochat.sh:26."""
    import optax

    from teochat_tpu.constants import IMAGE_TOKEN_INDEX
    from teochat_tpu.models.fusion import build_fusion_plan
    from teochat_tpu.train.trainer import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    cfg, params, tok, data = setup
    tpf = cfg.vision.num_patches
    rows = [[1, 3 + r, IMAGE_TOKEN_INDEX, 7, 5 + r, 2] for r in range(4)]
    labs = [[-100, -100, -100, -100, 5 + r, 2] for r in range(4)]
    rng = np.random.RandomState(0)
    frames = rng.randn(4, 3, 28, 28).astype(np.float32)

    def run(accum):
        base = make_optimizer(1e-2, total_steps=8, warmup_ratio=0.0)
        opt = optax.MultiSteps(base, every_k_schedule=accum) if accum > 1 else base
        # copy: train_step donates its state, which would delete the shared
        # module-scope params fixture's buffers
        state = init_train_state(jax.tree.map(jnp.copy, params), opt)
        step_fn = make_train_step(cfg, opt)
        # two global steps: step 0 sits at warmup lr=0, step 1 actually moves
        for _ in range(2):
            if accum == 1:
                plan = build_fusion_plan(
                    rows, labels=labs, tokens_per_frame=tpf, pad_to=16
                )
                state, _ = step_fn(state, plan, jnp.asarray(frames))
            else:
                for r in range(4):
                    plan = build_fusion_plan(
                        [rows[r]], labels=[labs[r]], tokens_per_frame=tpf, pad_to=16
                    )
                    state, _ = step_fn(state, plan, jnp.asarray(frames[r : r + 1]))
        return state.params

    p1 = run(1)
    p4 = run(4)
    flat1 = jnp.concatenate([x.ravel() for x in jax.tree.leaves(p1)])
    flat4 = jnp.concatenate([x.ravel() for x in jax.tree.leaves(p4)])
    # fp32 reduction order differs between bs=4 and 4x bs=1 (then Adam
    # normalizes tiny grads), so exact equality is impossible; a semantic bug
    # (sum-vs-mean, dropped micro-batch) diverges at >1e-2 scale
    np.testing.assert_allclose(np.asarray(flat4), np.asarray(flat1), atol=3e-4)
    # and the update actually moved params
    flat0 = jnp.concatenate([x.ravel() for x in jax.tree.leaves(params)])
    assert np.abs(np.asarray(flat1) - np.asarray(flat0)).max() > 1e-6


def test_per_host_batch_sharding_disjoint():
    """_batches with process_index/count: hosts see disjoint, exhaustive index
    streams (reference gets this from torch DistributedSampler world slicing,
    llava_trainer.py:135-148)."""
    from teochat_tpu.train.train import _batches

    dataset = list(range(16))
    taken = {}
    for p in range(2):
        got = list(
            _batches(dataset, lambda xs: tuple(xs), iter(range(16)), 4,
                     process_index=p, process_count=2)
        )
        taken[p] = [i for b in got for i in b]
    assert set(taken[0]) & set(taken[1]) == set()
    assert sorted(taken[0] + taken[1]) == dataset
    assert taken[0] == [0, 1, 2, 3, 8, 9, 10, 11]


def test_train_driver_with_accumulation(setup, tmp_path):
    """End-to-end driver run with gradient_accumulation_steps=2: global steps
    count optimizer updates, not micro-batches."""
    cfg, params, tok, data = setup
    ma, da, ta = _args(tmp_path / "accum", lora_enable=True,
                       per_device_train_batch_size=1,
                       gradient_accumulation_steps=2)
    state = train(ma, da, ta, cfg=cfg, params=params, tokenizer=tok,
                  dataset=data, max_steps_override=2)
    # 2 global steps x accum 2 = 4 micro-batches ran; TrainState.step counts
    # micro invocations, the driver's loop counted 2 global steps
    assert int(state.step) == 4
    assert np.abs(np.asarray(state.params["llm"]["layers"]["attn"]["q"]["lora_b"])).max() > 0


def test_kbit_lora_training_over_int8_backbone(setup, tmp_path):
    """Reference --bits 8 + LoRA recipe: int8 frozen backbone, LoRA grads flow."""
    import jax.numpy as jnp

    from teochat_tpu.ops.quant import quantize_llama_params
    from teochat_tpu.train.lora import add_lora_params

    cfg, params, tok, data = setup
    # deep-copy: the train step donates its state; reusing the fixture's
    # vision/projector buffers would delete them for later tests
    qparams = jax.tree.map(jnp.copy, dict(params))
    qparams["llm"] = add_lora_params(
        jax.random.PRNGKey(5), quantize_llama_params(qparams["llm"]), rank=4
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


def test_sequence_parallel_training_run(setup, tmp_path):
    """Full train() driver with --mesh_sequence wiring: runs steps on a
    (1,2,1,sequence=4) mesh, and the SAVED checkpoint config must NOT carry
    the run-topology sequence_axis (it must load on any topology). After
    train() returns, the ambient mesh is restored."""
    cfg, params, tok, data = setup
    from teochat_tpu.config import MeshConfig, TEOChatConfig

    ma, da, ta = _args(
        tmp_path / "seq", max_steps=2,
        mesh=MeshConfig(data=1, fsdp=2, model=1, sequence=4),
    )
    # copy: train() donates its state through the train step, and earlier
    # tests in this module may already have consumed shared-fixture buffers
    state = train(ma, da, ta, cfg=cfg,
                  params=jax.tree.map(jnp.copy, params), tokenizer=tok,
                  dataset=data, max_steps_override=2)
    assert int(state.step) == 2
    assert dict(jax.sharding.get_abstract_mesh().shape) == {}  # restored
    import glob
    import json
    import os

    cfgs = glob.glob(str(tmp_path / "seq" / "checkpoint-*" / "config.json"))
    assert cfgs
    saved = json.load(open(sorted(cfgs)[-1]))
    assert saved.get("llm", {}).get("sequence_axis") is None


def test_sequence_parallel_single_device_rejected(setup, tmp_path, monkeypatch):
    cfg, params, tok, data = setup
    from teochat_tpu.config import MeshConfig

    monkeypatch.setattr(jax, "device_count", lambda *a, **k: 1)
    ma, da, ta = _args(
        tmp_path / "seq1", max_steps=2,
        mesh=MeshConfig(sequence=2),
    )
    with pytest.raises(ValueError, match="mesh_sequence"):
        train(ma, da, ta, cfg=cfg,
              params=jax.tree.map(jnp.copy, params), tokenizer=tok,
              dataset=data, max_steps_override=2)


def test_pipeline_parallel_training_run(tmp_path):
    """Full train() driver with --mesh_pipe wiring: runs steps on a
    (data=1, fsdp=2, pipe=4) mesh with the layer stack sharded per stage.
    The SAVED checkpoint config must NOT carry the run-topology
    pipeline_axis; the ambient mesh is restored after train()."""
    import dataclasses

    from teochat_tpu.config import MeshConfig

    cfg = tiny_test_config(vocab_size=256)
    cfg = dataclasses.replace(
        cfg, llm=dataclasses.replace(cfg.llm, num_layers=4)  # 4 % pipe == 0
    )
    params = init_teochat(jax.random.PRNGKey(1), cfg)
    tok = MockTokenizer()
    data = [_raw_example(2, s) for s in range(6)]

    ma, da, ta = _args(
        tmp_path / "pipe", max_steps=2,
        mesh=MeshConfig(data=1, fsdp=2, model=1, pipe=4),
        pipeline_microbatches=2,  # batch 2 must divide the microbatch count
    )
    state = train(ma, da, ta, cfg=cfg, params=params, tokenizer=tok,
                  dataset=data, max_steps_override=2)
    assert int(state.step) == 2
    assert dict(jax.sharding.get_abstract_mesh().shape) == {}  # restored
    import glob
    import json

    cfgs = glob.glob(str(tmp_path / "pipe" / "checkpoint-*" / "config.json"))
    assert cfgs
    saved = json.load(open(sorted(cfgs)[-1]))
    assert saved.get("llm", {}).get("pipeline_axis") is None


def test_wandb_writer_degrades_without_wandb(monkeypatch):
    """report_to=wandb must degrade to console logging (writer None) when
    wandb is absent OR unusable — never fail the run (reference
    train.py:925-928 wires wandb through HF Trainer). wandb absence is
    forced via sys.modules so the test holds even on a box where wandb IS
    installed (a None entry makes `import wandb` raise ImportError)."""
    import sys

    from teochat_tpu.train.train import _wandb_writer

    monkeypatch.setitem(sys.modules, "wandb", None)
    assert _wandb_writer("/tmp/does-not-matter") is None

    class _BrokenWandb:
        @staticmethod
        def init(**kwargs):
            raise RuntimeError("no API key / no egress")

    monkeypatch.setitem(sys.modules, "wandb", _BrokenWandb())
    assert _wandb_writer("/tmp/does-not-matter") is None

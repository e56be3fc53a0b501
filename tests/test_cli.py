"""CLI arg-plumbing tests (no training run)."""

import pytest

from teochat_tpu.train.cli import build_parser


def test_train_cli_defaults():
    args = build_parser().parse_args(["--model_name_or_path", "x"])
    assert args.lora_enable and args.lora_r == 128 and args.lora_alpha == 256.0
    assert args.bits == 16 and args.mesh_fsdp == -1
    assert args.prompt_strategy == "interleave"


def test_train_cli_overrides():
    args = build_parser().parse_args(
        ["--model_name_or_path", "x", "--no_lora", "--bits", "8",
         "--mesh_model", "2", "--learning_rate", "1e-5"]
    )
    assert not args.lora_enable
    assert args.bits == 8 and args.mesh_model == 2
    assert args.learning_rate == pytest.approx(1e-5)


def test_train_cli_rejects_bad_bits():
    with pytest.raises(SystemExit):
        build_parser().parse_args(["--model_name_or_path", "x", "--bits", "4"])


def test_train_cli_accepts_reference_script_verbatim():
    """The argv of reference scripts/train_teochat.sh:4-45 parses unchanged."""
    argv = (
        "--bits 8 "
        "--lora_enable True --lora_r 128 --lora_alpha 256 --mm_projector_lr 2e-5 "
        "--deepspeed ./scripts/zero3_offload.json "
        "--model_name_or_path LanguageBind/Video-LLaVA-7B "
        "--version v1 "
        "--data_name jirvin16/TEOChatlas "
        "--data_split train "
        "--image_tower LanguageBind/LanguageBind_Image "
        "--freeze_backbone True "
        "--freeze_mm_mlp_adapter False "
        "--mm_projector_type mlp2x_gelu "
        "--pretrain_mm_mlp_adapter /path/to/mm_projector.bin "
        "--mm_vision_select_layer -2 "
        "--mm_use_im_start_end False "
        "--mm_use_im_patch_token False "
        "--image_aspect_ratio square "
        "--group_by_modality_length True "
        "--bf16 True "
        "--output_dir /tmp/out "
        "--num_train_epochs 2 "
        "--per_device_train_batch_size 1 "
        "--per_device_eval_batch_size 1 "
        '--evaluation_strategy no '
        '--save_strategy steps '
        "--save_steps 2000 "
        "--save_total_limit 10 "
        "--learning_rate 2e-5 "
        "--weight_decay 0. "
        "--warmup_ratio 0.03 "
        '--lr_scheduler_type cosine '
        "--logging_steps 1 "
        "--tf32 True "
        "--model_max_length 2048 --tokenizer_model_max_length 3072 "
        "--gradient_checkpointing True "
        "--dataloader_num_workers 8 "
        "--video_as_image_list True "
        "--prompt_strategy interleave "
        "--chronological_prefix True "
        "--lazy_preprocess True "
        "--report_to wandb "
        "--cache_dir cache_dir"
    ).split()
    args = build_parser().parse_args(argv)
    assert args.bits == 8 and args.lora_enable and args.lora_r == 128
    assert args.freeze_backbone and not args.freeze_mm_mlp_adapter
    assert not args.mm_use_im_start_end and not args.mm_use_im_patch_token
    assert args.mm_projector_type == "mlp2x_gelu"
    assert args.image_tower == "LanguageBind/LanguageBind_Image"
    assert args.model_max_length == 2048
    assert args.tokenizer_model_max_length == 3072
    assert args.dataloader_num_workers == 8
    assert args.lr_scheduler_type == "cosine"
    assert args.data_split == "train"
    assert args.deepspeed == "./scripts/zero3_offload.json"


def test_train_cli_bool_flags_bare_and_valued():
    args = build_parser().parse_args(
        ["--model_name_or_path", "x", "--tune_mm_mlp_adapter",
         "--freeze_backbone", "False"]
    )
    assert args.tune_mm_mlp_adapter and not args.freeze_backbone


def test_lr_scheduler_types():
    import numpy as np

    from teochat_tpu.train.trainer import make_optimizer

    for sched in ("cosine", "linear", "constant", "constant_with_warmup"):
        opt = make_optimizer(1e-4, total_steps=10, lr_scheduler_type=sched)
        params = {"w": np.zeros(3, np.float32)}
        state = opt.init(params)
        opt.update({"w": np.ones(3, np.float32)}, state, params)
    with pytest.raises(ValueError):
        make_optimizer(1e-4, total_steps=10, lr_scheduler_type="nope")


def test_prefetch_preserves_order_and_raises():
    from teochat_tpu.train.train import _prefetch

    assert list(_prefetch(iter(range(100)), depth=4)) == list(range(100))

    def bad():
        yield 1
        raise RuntimeError("boom")

    out = _prefetch(bad(), depth=2)
    assert next(out) == 1
    with pytest.raises(RuntimeError):
        next(out)


def test_eval_cli_parses():
    from teochat_tpu.eval.eval import main as eval_main

    # unknown dataset propagates as ValueError after parsing succeeds
    with pytest.raises(ValueError):
        eval_main(["--dataset_name", "nope", "--model_path", "x"])


def test_max_grad_norm_clips_update():
    """HF Trainer clips grads at max_grad_norm=1.0 (reference trains under
    it); a huge gradient must produce the same update as its normalized
    counterpart."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from teochat_tpu.train.trainer import make_optimizer

    params = {"w": jnp.zeros(4, jnp.float32)}
    big = {"w": jnp.full(4, 1e6, jnp.float32)}
    norm = float(jnp.sqrt(jnp.sum(big["w"] ** 2)))
    scaled = {"w": big["w"] / norm}  # global-norm 1.0

    opt = make_optimizer(1e-3, total_steps=10, max_grad_norm=1.0,
                         warmup_steps=1, lr_scheduler_type="constant")
    u_big, _ = opt.update(big, opt.init(params), params)
    u_scaled, _ = opt.update(scaled, opt.init(params), params)
    np.testing.assert_allclose(
        np.asarray(u_big["w"]), np.asarray(u_scaled["w"]), rtol=1e-5
    )

    # and with the projector-lr group (clip wraps the multi_transform)
    params2 = {"projector": {"w": jnp.zeros(4)}, "llm": {"w": jnp.zeros(4)}}
    big2 = jax.tree.map(lambda x: jnp.full_like(x, 1e6), params2)
    opt2 = make_optimizer(1e-3, projector_lr=1e-4, total_steps=10,
                          max_grad_norm=1.0)
    u2, _ = opt2.update(big2, opt2.init(params2), params2)
    assert all(np.isfinite(np.asarray(v)).all() for v in jax.tree.leaves(u2))


def test_warmup_steps_overrides_ratio():
    import jax.numpy as jnp
    import numpy as np

    from teochat_tpu.train.trainer import make_optimizer

    params = {"w": jnp.zeros(2, jnp.float32)}
    g = {"w": jnp.ones(2, jnp.float32) * 1e-3}
    # warmup_steps=1 -> step 0 already at ~0 LR, step 1 at peak for constant_with_warmup
    opt = make_optimizer(1.0, total_steps=100, warmup_steps=2,
                         lr_scheduler_type="constant_with_warmup",
                         max_grad_norm=None)
    state = opt.init(params)
    u0, state = opt.update(g, state, params)
    u1, state = opt.update(g, state, params)
    # first update is scaled toward zero vs the second (warmup ramp)
    assert np.abs(u0["w"]).max() < np.abs(u1["w"]).max()

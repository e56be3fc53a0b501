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


def test_eval_cli_parses():
    from teochat_tpu.eval.eval import main as eval_main

    # unknown dataset propagates as ValueError after parsing succeeds
    with pytest.raises(ValueError):
        eval_main(["--dataset_name", "nope", "--model_path", "x"])

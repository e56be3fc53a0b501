"""Train CLI: argparse surface over the dataclass configs.

The reference launches `deepspeed videollava/train/train.py --bits 8
--lora_enable ...` (scripts/train_teochat.sh:3-46); here the launcher is plain
`python -m teochat_tpu.train.cli ...` — multi-host SPMD comes from
`jax.distributed.initialize()` + the mesh, not an external launcher.
"""

from __future__ import annotations

import argparse

from teochat_tpu.config import MeshConfig
from teochat_tpu.data.dataset import DataArguments
from teochat_tpu.train.train import ModelArguments, TrainingArguments, train
from teochat_tpu.utils import profile_trace


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TEOChat TPU fine-tuning")
    # model
    p.add_argument("--model_name_or_path", type=str, required=True)
    p.add_argument("--version", type=str, default="v1")
    p.add_argument("--freeze_backbone", action="store_true", default=True)
    p.add_argument("--tune_mm_mlp_adapter", action="store_true")
    p.add_argument("--freeze_mm_mlp_adapter", action="store_true")
    p.add_argument("--mm_vision_select_layer", type=int, default=-2)
    p.add_argument("--pretrain_mm_mlp_adapter", type=str, default=None)
    # reference train_teochat.sh:17 style booleans (accept explicit True/False)
    p.add_argument("--mm_use_im_start_end", type=lambda s: s.lower() == "true",
                   default=False)
    p.add_argument("--mm_use_im_patch_token", type=lambda s: s.lower() == "true",
                   default=True)
    # data
    p.add_argument("--data_name", type=str, default="jirvin16/TEOChatlas")
    p.add_argument("--data_cache_dir", type=str, default=None)
    p.add_argument("--prompt_strategy", type=str, default="interleave")
    p.add_argument("--chronological_prefix", action="store_true", default=True)
    p.add_argument("--image_aspect_ratio", type=str, default=None)
    # training
    p.add_argument("--output_dir", type=str, default="./checkpoints/teochat")
    p.add_argument("--num_train_epochs", type=int, default=1)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--per_device_train_batch_size", type=int, default=4)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--learning_rate", type=float, default=2e-4)
    p.add_argument("--mm_projector_lr", type=float, default=2e-5)
    p.add_argument("--warmup_ratio", type=float, default=0.03)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--logging_steps", type=int, default=10)
    p.add_argument("--save_steps", type=int, default=2000)
    p.add_argument("--save_total_limit", type=int, default=10)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--bits", type=int, default=16, choices=[8, 16])
    p.add_argument("--lora_enable", action="store_true", default=True)
    p.add_argument("--no_lora", dest="lora_enable", action="store_false")
    p.add_argument("--lora_r", type=int, default=128)
    p.add_argument("--lora_alpha", type=float, default=256.0)
    p.add_argument("--group_by_modality_length", action="store_true", default=True)
    p.add_argument("--mesh_data", type=int, default=1)
    p.add_argument("--mesh_fsdp", type=int, default=-1)
    p.add_argument("--mesh_model", type=int, default=1)
    p.add_argument("--mesh_sequence", type=int, default=1,
                   help="context parallelism: shard the sequence over this "
                        "many devices (ring attention)")
    p.add_argument("--mesh_pipe", type=int, default=1,
                   help="pipeline parallelism: shard the layer stack over "
                        "this many stages (GPipe microbatch schedule)")
    p.add_argument("--pipeline_microbatches", type=int, default=None,
                   help="microbatches per pipeline step (default: stage "
                        "count); batch size must divide evenly")
    p.add_argument("--profile_dir", type=str, default=None)
    p.add_argument("--distributed", action="store_true",
                   help="call jax.distributed.initialize() (multi-host)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.distributed:
        import jax

        jax.distributed.initialize()

    model_args = ModelArguments(
        model_name_or_path=args.model_name_or_path,
        version=args.version,
        freeze_backbone=args.freeze_backbone,
        tune_mm_mlp_adapter=args.tune_mm_mlp_adapter,
        freeze_mm_mlp_adapter=args.freeze_mm_mlp_adapter,
        mm_vision_select_layer=args.mm_vision_select_layer,
        pretrain_mm_mlp_adapter=args.pretrain_mm_mlp_adapter,
        mm_use_im_start_end=args.mm_use_im_start_end,
        mm_use_im_patch_token=args.mm_use_im_patch_token,
    )
    data_args = DataArguments(
        data_name=args.data_name,
        data_cache_dir=args.data_cache_dir,
        prompt_strategy=args.prompt_strategy,
        chronological_prefix=args.chronological_prefix,
        image_aspect_ratio=args.image_aspect_ratio,
    )
    training_args = TrainingArguments(
        output_dir=args.output_dir,
        num_train_epochs=args.num_train_epochs,
        max_steps=args.max_steps,
        per_device_train_batch_size=args.per_device_train_batch_size,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        learning_rate=args.learning_rate,
        mm_projector_lr=args.mm_projector_lr,
        warmup_ratio=args.warmup_ratio,
        weight_decay=args.weight_decay,
        logging_steps=args.logging_steps,
        save_steps=args.save_steps,
        save_total_limit=args.save_total_limit,
        seed=args.seed,
        bits=args.bits,
        lora_enable=args.lora_enable,
        lora_r=args.lora_r,
        lora_alpha=args.lora_alpha,
        group_by_modality_length=args.group_by_modality_length,
        mesh=MeshConfig(data=args.mesh_data, fsdp=args.mesh_fsdp,
                        model=args.mesh_model, sequence=args.mesh_sequence,
                        pipe=args.mesh_pipe),
        pipeline_microbatches=args.pipeline_microbatches,
    )
    with profile_trace(args.profile_dir):
        train(model_args, data_args, training_args)


if __name__ == "__main__":
    main()

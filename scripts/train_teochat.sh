#!/bin/bash
# TEOChat training recipe, TPU-native (reference scripts/train_teochat.sh parity).
# DeepSpeed launcher -> plain python; ZeRO-3 -> GSPMD fsdp mesh axis; 8-bit
# bitsandbytes -> int8 weight-only (--bits 8); LoRA r=128 alpha=256.
python -m teochat_tpu.train.cli \
    --model_name_or_path "${MODEL_PATH:-LanguageBind/Video-LLaVA-7B}" \
    --version v1 \
    --data_name "${DATA_NAME:-jirvin16/TEOChatlas}" \
    --prompt_strategy interleave \
    --chronological_prefix \
    --bits 8 \
    --lora_enable --lora_r 128 --lora_alpha 256 \
    --mm_projector_lr 2e-5 \
    --learning_rate 2e-4 \
    --warmup_ratio 0.03 \
    --per_device_train_batch_size "${BATCH_SIZE:-4}" \
    --num_train_epochs 1 \
    --save_steps 2000 --save_total_limit 10 \
    --group_by_modality_length \
    --output_dir "${OUTPUT_DIR:-./checkpoints/teochat}" \
    "$@"

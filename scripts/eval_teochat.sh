#!/bin/bash
# Run the TEOChatlas eval splits (reference scripts/eval_teochat.sh parity).
# Single chip; int8 weights; add --batch_size N for the batched TPU fast path.
DATASETS="${DATASETS:-xbd_loc xbd_dmg_cls s2_det fmow_high_res}"
for ds in $DATASETS; do
    python -m teochat_tpu.eval.eval \
        --dataset_name "$ds" \
        --model_path "${MODEL_PATH:-jirvin16/TEOChat}" \
        --load_8bit \
        --prompt_strategy interleave \
        --chronological_prefix \
        --temperature 0.2 \
        --max_new_tokens 256 \
        "$@"
done

#!/bin/bash
# Continue fine-tuning from an existing TEOChat checkpoint
# (reference scripts/finetune_teochat.sh parity).
MODEL_PATH="${MODEL_PATH:-jirvin16/TEOChat}" exec "$(dirname "$0")/train_teochat.sh" "$@"

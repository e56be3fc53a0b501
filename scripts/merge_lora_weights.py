#!/usr/bin/env python
"""Merge LoRA adapters into a standalone checkpoint
(reference scripts/merge_lora_weights.py:11-31 equivalent, Orbax-native)."""
import argparse

from teochat_tpu.checkpoint.weights import merge_lora_weights

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", required=True)
    p.add_argument("--save-model-path", required=True)
    a = p.parse_args()
    out = merge_lora_weights(a.model_path, a.save_model_path)
    print(f"merged checkpoint written to {out}")

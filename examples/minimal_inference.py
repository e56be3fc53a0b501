"""Minimal end-to-end inference example (tiny random model, no checkpoints).

Drives the exact user flow from the reference README (README.md:113-124):
load_model-style setup -> run_inference_single on a 2-frame temporal sequence.
Defaults to CPU (a tiny random model gains nothing from an accelerator, and
compiling its dozen programs through a remote-TPU tunnel takes minutes);
pass --tpu to run on the default backend. With a real converted checkpoint
directory, replace the tiny-model block with
`teochat_tpu.eval.eval.load_model(path, load_8bit=True)`.
"""

import sys
import types

import numpy as np

if "--tpu" not in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax

from teochat_tpu.config import tiny_test_config
from teochat_tpu.data.processing import ImageProcessor
from teochat_tpu.eval.inference import run_inference_single
from teochat_tpu.models.teochat import TEOChat, init_teochat


class WordTokenizer:
    """Stand-in for the LLaMA sentencepiece tokenizer (offline demo)."""

    bos_token_id = 1
    eos_token_id = 2

    def __init__(self):
        self.vocab = {"<s>": 1, "</s>": 2}
        self.rev = {1: "<s>", 2: "</s>"}

    def __call__(self, text):
        ids = [1]
        for w in text.replace("</s>", " </s> ").split():
            if w not in self.vocab:
                idx = len(self.vocab) + 10
                self.vocab[w] = idx
                self.rev[idx] = w
            ids.append(self.vocab[w])
        return types.SimpleNamespace(input_ids=ids)

    def decode(self, ids):
        return " ".join(self.rev.get(int(i), f"<{int(i)}>") for i in ids)


def main():
    print(f"backend: {jax.default_backend()}")
    cfg = tiny_test_config(vocab_size=512)
    tokenizer = WordTokenizer()
    model = TEOChat(cfg, init_teochat(jax.random.PRNGKey(0), cfg), tokenizer=tokenizer)
    processor = ImageProcessor(size=cfg.vision.image_size)

    frames = [
        np.random.RandomState(0).randint(0, 255, (128, 128, 3), np.uint8),
        np.random.RandomState(1).randint(0, 255, (128, 128, 3), np.uint8),
    ]
    response = run_inference_single(
        model, processor, tokenizer,
        "These are images taken at different times: <video> "
        "Were any buildings damaged?",
        frames,
        timestamps=["2020-02-01", "2020-01-01"],
        temperature=0.0,
        max_new_tokens=16,
    )
    print(f"response: {response!r}")


if __name__ == "__main__":
    main()

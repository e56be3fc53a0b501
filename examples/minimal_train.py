"""Minimal end-to-end fine-tuning run, CPU-friendly.

Builds a tiny plain-LM HF checkpoint + a separate vision-tower dir + a
pretrained-projector file on disk, then drives the SAME flow as
`python -m teochat_tpu.train.cli` / reference scripts/train_teochat.sh:
plain-LM load -> initialize_vision_modules (tower geometry read from the
tower's own config.json, projector from --pretrain_mm_mlp_adapter) -> LoRA +
frozen backbone -> AdamW + schedule + grad clip -> threaded prefetch ->
2 optimizer steps -> checkpoint save. Runs in ~1 min on CPU.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python examples/minimal_train.py
"""

import json
import os
import sys
import tempfile

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")  # never touch the TPU tunnel here

import torch  # noqa: E402  (fake-checkpoint authoring only)


def make_tiny_world(root: str):
    """A plain LM + tower + projector + 2-frame dataset, all on disk."""
    g = torch.Generator().manual_seed(0)

    def w(*s):
        return torch.randn(*s, generator=g) * 0.05

    d, inter, vocab, vd = 32, 64, 64, 16
    lm = os.path.join(root, "plain_lm")
    tower = os.path.join(root, "tower")
    os.makedirs(lm), os.makedirs(tower)

    sd = {"model.embed_tokens.weight": w(vocab, d),
          "model.norm.weight": torch.ones(d), "lm_head.weight": w(vocab, d)}
    for i in range(2):
        p = f"model.layers.{i}."
        for n, shape in [("self_attn.q_proj", (d, d)), ("self_attn.k_proj", (d, d)),
                         ("self_attn.v_proj", (d, d)), ("self_attn.o_proj", (d, d)),
                         ("mlp.gate_proj", (inter, d)), ("mlp.up_proj", (inter, d)),
                         ("mlp.down_proj", (d, inter))]:
            sd[p + n + ".weight"] = w(*shape)
        sd[p + "input_layernorm.weight"] = torch.ones(d)
        sd[p + "post_attention_layernorm.weight"] = torch.ones(d)
    torch.save(sd, os.path.join(lm, "pytorch_model.bin"))
    json.dump(
        {"architectures": ["LlamaForCausalLM"], "vocab_size": vocab,
         "hidden_size": d, "intermediate_size": inter, "num_hidden_layers": 2,
         "num_attention_heads": 4, "num_key_value_heads": 4,
         "rms_norm_eps": 1e-5, "max_position_embeddings": 128,
         "tokenizer_model_max_length": 256, "max_sequence_length": 128},
        open(os.path.join(lm, "config.json"), "w"))

    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    voc = {"<unk>": 0, "<s>": 1, "</s>": 2}
    for i in range(3, vocab):
        voc[f"w{i}"] = i
    tok = Tokenizer(WordLevel(voc, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    tok.save(os.path.join(lm, "tokenizer.json"))
    json.dump({"tokenizer_class": "PreTrainedTokenizerFast", "bos_token": "<s>",
               "eos_token": "</s>", "unk_token": "<unk>"},
              open(os.path.join(lm, "tokenizer_config.json"), "w"))

    # tower checkpoint with its OWN geometry in config.json
    vt = "vision_model."
    tsd = {vt + "embeddings.patch_embedding.weight": w(vd, 3, 14, 14),
           vt + "embeddings.class_embedding": w(vd),
           vt + "embeddings.position_embedding.weight": w(5, vd)}
    for n in ("pre_layrnorm", "post_layernorm"):
        tsd[vt + n + ".weight"] = torch.ones(vd)
        tsd[vt + n + ".bias"] = torch.zeros(vd)
    e = vt + "encoder.layers.0."
    for n in ["q_proj", "k_proj", "v_proj", "out_proj"]:
        tsd[e + f"self_attn.{n}.weight"] = w(vd, vd)
        tsd[e + f"self_attn.{n}.bias"] = torch.zeros(vd)
    for n in ["layer_norm1", "layer_norm2"]:
        tsd[e + n + ".weight"] = torch.ones(vd)
        tsd[e + n + ".bias"] = torch.zeros(vd)
    tsd[e + "mlp.fc1.weight"] = w(2 * vd, vd)
    tsd[e + "mlp.fc1.bias"] = torch.zeros(2 * vd)
    tsd[e + "mlp.fc2.weight"] = w(vd, 2 * vd)
    tsd[e + "mlp.fc2.bias"] = torch.zeros(vd)
    torch.save(tsd, os.path.join(tower, "pytorch_model.bin"))
    json.dump({"vision_config": {"image_size": 28, "patch_size": 14,
               "hidden_size": vd, "intermediate_size": 2 * vd,
               "num_hidden_layers": 1, "num_attention_heads": 4}},
              open(os.path.join(tower, "config.json"), "w"))

    proj = os.path.join(root, "mm_projector.bin")
    torch.save({"model.mm_projector.0.weight": w(d, vd),
                "model.mm_projector.0.bias": torch.zeros(d),
                "model.mm_projector.2.weight": w(d, d),
                "model.mm_projector.2.bias": torch.zeros(d)}, proj)

    from PIL import Image

    frames = []
    for n in ("a.png", "b.png"):
        f = os.path.join(root, n)
        Image.fromarray(
            (np.random.RandomState(0).rand(28, 28, 3) * 255).astype("uint8")
        ).save(f)
        frames.append(f)
    samples = [
        {"id": str(i), "video": frames,
         "conversations": [
             {"from": "human", "value": "<video>\nw5 w6?"},
             {"from": "gpt", "value": f"w{10 + i} w{11 + i}"}]}
        for i in range(8)
    ]
    return lm, tower, proj, samples


def main():
    from teochat_tpu.data.dataset import DataArguments
    from teochat_tpu.train.train import (
        ModelArguments, TrainingArguments, train,
    )

    root = tempfile.mkdtemp(prefix="teochat_min_train_")
    lm, tower, proj, samples = make_tiny_world(root)
    print(f"tiny world in {root}")

    model_args = ModelArguments(
        model_name_or_path=lm, image_tower=tower,
        mm_projector_type="mlp2x_gelu", pretrain_mm_mlp_adapter=proj,
        mm_use_im_patch_token=False,
    )
    data_args = DataArguments(image_aspect_ratio="square")
    training_args = TrainingArguments(
        output_dir=os.path.join(root, "out"), num_train_epochs=1, max_steps=2,
        per_device_train_batch_size=2, learning_rate=2e-4,
        lr_scheduler_type="cosine", dataloader_num_workers=2,
        logging_steps=1, bits=16, lora_r=8, lora_alpha=16.0,
        model_max_length=128, tokenizer_model_max_length=256,
        report_to="none", save_strategy="no",
    )
    state = train(model_args, data_args, training_args, dataset=samples)
    # NB: loss prints as 0.0 here — the word-level toy tokenizer trips the
    # v1 masker's tokenization-mismatch guard (train.py reference :517-523),
    # which zeroes such rows' labels. Real sentencepiece tokenizers don't.
    print(f"done: step={int(state.step)}; checkpoint in {training_args.output_dir}")


if __name__ == "__main__":
    sys.exit(main())

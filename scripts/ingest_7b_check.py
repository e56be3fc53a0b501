"""Prove 7B-scale checkpoint ingestion on this box (round-3 verdict item 3).

Writes a SYNTHETIC HF-format LLaMA-7B checkpoint (sharded fp16 safetensors +
config.json + a minimal fast tokenizer — the jirvin16/TEOChat merged layout,
reference /root/reference/videollava/model/builder.py:90-112), then runs the
REAL load path end-to-end:

    load_pretrained_model(path, load_8bit=True, allow_partial=True)

and reports peak RSS + wall time as one JSON line. The load path under test:
  - builder._LazyStateDict   (per-tensor mmap shard reads, not one eager dict)
  - convert_hf.convert_llama (stacked per-layer conversion)
  - vision_tokenizer resize  (mm_use_im_patch_token grows the vocab by 1)
  - quantize_llama_params_host (layer-chunked host->device streaming quantize)

Weight VALUES are a constant fill (ingestion cost is bytes, not entropy);
writing ~13.5 GB and loading it is the point. Runs on CPU (set before the
jax import) so it can run next to nothing else on the single-client TPU.

Usage: python scripts/ingest_7b_check.py [--dir /tmp/synth7b] [--keep]
"""

import argparse
import json
import os
import resource
import sys
import time

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

# LLaMA-2-7B geometry (config.json of the released TEOChat checkpoint)
VOCAB, D, I, L, HEADS = 32000, 4096, 11008, 32, 32


def write_synthetic_7b(path: str) -> float:
    """Write a sharded fp16 7B checkpoint; returns GB written."""
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)

    def w(shape):  # constant fill: memset-speed, quantizer-safe (amax > 0)
        a = np.empty(shape, np.float16)
        a[:] = 0.01
        return a

    total = 0
    shard, shard_idx, shard_bytes = {}, 1, 0
    # 8 shards of ~1.7 GB keeps per-shard RSS modest for the writer itself
    SHARD_LIMIT = 1_700_000_000

    def flush(final=False):
        nonlocal shard, shard_idx, shard_bytes
        if not shard:
            return
        name = f"model-{shard_idx:05d}.safetensors"
        save_file(shard, os.path.join(path, name))
        shard, shard_bytes = {}, 0
        shard_idx += 1

    def add(key, arr):
        nonlocal shard_bytes, total
        shard[key] = arr
        shard_bytes += arr.nbytes
        total += arr.nbytes
        if shard_bytes >= SHARD_LIMIT:
            flush()

    add("model.embed_tokens.weight", w((VOCAB, D)))
    for i in range(L):
        p = f"model.layers.{i}."
        add(p + "input_layernorm.weight", w((D,)))
        add(p + "self_attn.q_proj.weight", w((D, D)))
        add(p + "self_attn.k_proj.weight", w((D, D)))
        add(p + "self_attn.v_proj.weight", w((D, D)))
        add(p + "self_attn.o_proj.weight", w((D, D)))
        add(p + "post_attention_layernorm.weight", w((D,)))
        add(p + "mlp.gate_proj.weight", w((I, D)))
        add(p + "mlp.up_proj.weight", w((I, D)))
        add(p + "mlp.down_proj.weight", w((D, I)))
    add("model.norm.weight", w((D,)))
    add("lm_head.weight", w((VOCAB, D)))
    # merged-checkpoint projector (reference keys model.mm_projector.{0,2}.*)
    add("model.mm_projector.0.weight", w((D, 1024)))
    add("model.mm_projector.0.bias", w((D,)))
    add("model.mm_projector.2.weight", w((D, D)))
    add("model.mm_projector.2.bias", w((D,)))
    flush(final=True)

    cfg = {
        "architectures": ["LlavaLlamaForCausalLM"],
        "model_type": "llava",
        "hidden_size": D, "intermediate_size": I,
        "num_hidden_layers": L, "num_attention_heads": HEADS,
        "num_key_value_heads": HEADS, "rms_norm_eps": 1e-5,
        "vocab_size": VOCAB, "max_position_embeddings": 4096,
        "rope_theta": 10000.0, "tie_word_embeddings": False,
        "mm_projector_type": "mlp2x_gelu", "mm_hidden_size": 1024,
        "mm_vision_select_layer": -2, "mm_use_im_start_end": False,
        "mm_use_im_patch_token": True,
        "max_sequence_length": 2048,
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f)

    # minimal WordLevel fast tokenizer: AutoTokenizer loads tokenizer.json
    # offline via PreTrainedTokenizerFast
    from tokenizers import Tokenizer, models

    vocab = {f"<t{i}>": i for i in range(VOCAB)}
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<t0>"))
    tok.save(os.path.join(path, "tokenizer.json"))
    with open(os.path.join(path, "tokenizer_config.json"), "w") as f:
        json.dump({"tokenizer_class": "PreTrainedTokenizerFast",
                   "model_max_length": 2048}, f)
    return total / 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/synth7b")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--int4", action="store_true",
                    help="also exercise the packed-int4 load path")
    args = ap.parse_args()

    t0 = time.perf_counter()
    gb = write_synthetic_7b(args.dir)
    t_write = time.perf_counter() - t0
    print(f"# wrote {gb:.1f} GB synthetic checkpoint in {t_write:.0f}s",
          file=sys.stderr, flush=True)

    import jax  # after the platform env var

    from teochat_tpu.builder import load_pretrained_model

    t1 = time.perf_counter()
    tokenizer, model, processor, context_len = load_pretrained_model(
        args.dir, model_name="teochat-7b",
        load_8bit=not args.int4, load_int4=args.int4, allow_partial=True,
    )
    jax.block_until_ready(model.params["llm"])
    t_load = time.perf_counter() - t1

    lk = model.params["llm"]["layers"]
    q = lk["attn"].get("q") or lk["attn"].get("qkv")
    kernel_key = "kernel" if "kernel" in q else (
        "packed_tiles" if "packed_tiles" in q else "packed")
    peak_rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    out = {
        "checkpoint_gb": round(gb, 1),
        "write_s": round(t_write, 1),
        "load_s": round(t_load, 1),
        "peak_rss_gb": round(peak_rss_gb, 1),
        "quantized_dtype": str(q[kernel_key].dtype),
        "vocab_after_vision_tokens": int(len(tokenizer)),
        "embed_rows": int(
            model.params["llm"]["embed_tokens"]["embedding"].shape[0]
        ),
        "backend": jax.default_backend(),
    }
    print(json.dumps(out), flush=True)

    if not args.keep:
        import shutil

        shutil.rmtree(args.dir, ignore_errors=True)


if __name__ == "__main__":
    main()

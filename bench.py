"""Benchmark: flagship TEOChat inference path on one real TPU chip.

Measures the BASELINE.json target metrics on true flagship shapes
(ViT-L/14 @ 224px encoder in bf16; LLaMA-2-7B decoder, int8 weight-only — the
reference evaluates 8-bit, scripts/eval_teochat.sh:10-16):

- decode tokens/sec/chip  (headline; printed as the ONE json line)
- encode frames/sec       (ViT-L/14 batched frame encoding)
- xBD 2-frame e2e latency (encode 2 frames + prefill 640 fused tokens + 32
  new tokens) and p50 TTFT (encode + prefill + first token)

Weights are random (no egress to fetch real checkpoints) — identical compute/
memory traffic to real weights. vs_baseline divides by an A100 reference point
of 20 decode tokens/sec for 7B LLM.int8 (bitsandbytes) inference, the
reference's serving configuration; TEOChat publishes no latency numbers
(BASELINE.md), so that constant is our measured-elsewhere estimate.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

A100_INT8_DECODE_TOK_S = 20.0  # bitsandbytes LLM.int8 7B on A100 (estimate)


def _time(fn, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from teochat_tpu.config import TEOChatConfig
    from teochat_tpu.constants import IMAGE_TOKEN_INDEX
    from teochat_tpu.models import fusion as fusion_mod
    from teochat_tpu.models import generation as gen_mod
    from teochat_tpu.models import llama as llama_mod
    from teochat_tpu.models import teochat as teochat_mod
    from teochat_tpu.models import vit as vit_mod
    from teochat_tpu.ops.quant import random_int8_llama

    assert jax.default_backend() == "tpu", f"bench needs TPU, got {jax.default_backend()}"
    cfg = TEOChatConfig()
    rng = jax.random.PRNGKey(0)

    # --- build flagship params: bf16 tower + projector, int8 7B decoder ---
    vision_params = vit_mod.init_vit(rng, cfg.vision, dtype=jnp.bfloat16)
    from teochat_tpu.models.projector import init_projector

    proj_params = init_projector(rng, cfg.projector, dtype=jnp.bfloat16)
    llm_params = random_int8_llama(rng, cfg.llm)
    params = {"vision": vision_params, "projector": proj_params, "llm": llm_params}

    # --- encode frames/sec (batched multi-frame ViT-L/14) ---
    enc_batch = 16
    frames = jnp.asarray(
        np.random.RandomState(0).randn(enc_batch, 3, 224, 224), jnp.bfloat16
    )
    encode = jax.jit(
        lambda px: teochat_mod.encode_frames(params, cfg, px)
    )
    t_encode = _time(lambda: encode(frames), iters=10)
    frames_per_sec = enc_batch / t_encode

    # --- decode tokens/sec/chip (batch 1, 7B int8, cached) ---
    b = 1
    prompt_len = 640  # 2 frames x 256 + ~128 text: the xBD 2-frame shape
    max_new = 64
    t_max = prompt_len + max_new + 1

    stop = gen_mod.StopSpec(
        keyword_ids=jnp.zeros((1, 1), jnp.int32),
        keyword_lens=jnp.zeros((1,), jnp.int32),
        eos_id=jnp.asarray(-1, jnp.int32),  # never stop: measure full loop
    )

    ids = [[1] + [IMAGE_TOKEN_INDEX, 7] * 2 + list(range(10, 10 + 123))]
    plan = fusion_mod.build_fusion_plan(ids, tokens_per_frame=256, pad_to=prompt_len)
    vision_tokens = encode(frames[:2])
    embeds = teochat_mod.multimodal_embeds(params, cfg, plan, vision_tokens)

    def run_generate(n_new):
        cache = llama_mod.init_cache(cfg.llm, b, t_max, dtype=jnp.bfloat16)
        return gen_mod.generate_tokens(
            params["llm"], cfg.llm, embeds, plan.seq_lens, plan.attention_mask,
            plan.position_ids, cache, stop, jax.random.PRNGKey(0),
            max_new_tokens=n_new, temperature=0.0, do_sample=False,
        )

    # TTFT: encode + prefill + 1 token
    def ttft_fn():
        vt = encode(frames[:2])
        emb = teochat_mod.multimodal_embeds(params, cfg, plan, vt)
        cache = llama_mod.init_cache(cfg.llm, b, t_max, dtype=jnp.bfloat16)
        toks, _ = gen_mod.generate_tokens(
            params["llm"], cfg.llm, emb, plan.seq_lens, plan.attention_mask,
            plan.position_ids, cache, stop, jax.random.PRNGKey(0),
            max_new_tokens=1, temperature=0.0, do_sample=False,
        )
        return toks

    t_ttft = _time(ttft_fn, iters=10)

    # decode rate: (full loop time - prefill-only time) / extra tokens
    t_full = _time(lambda: run_generate(max_new), iters=5)
    t_one = _time(lambda: run_generate(1), iters=5)
    decode_tok_s = (max_new - 1) / (t_full - t_one)

    # e2e latency: 2-frame encode + prefill + 32 tokens
    def e2e_fn():
        vt = encode(frames[:2])
        emb = teochat_mod.multimodal_embeds(params, cfg, plan, vt)
        cache = llama_mod.init_cache(cfg.llm, b, t_max, dtype=jnp.bfloat16)
        toks, _ = gen_mod.generate_tokens(
            params["llm"], cfg.llm, emb, plan.seq_lens, plan.attention_mask,
            plan.position_ids, cache, stop, jax.random.PRNGKey(0),
            max_new_tokens=32, temperature=0.0, do_sample=False,
        )
        return toks

    t_e2e = _time(e2e_fn, iters=5)

    result = {
        "metric": "decode tokens/sec/chip (LLaMA-7B int8, bs=1)",
        "value": round(decode_tok_s, 2),
        "unit": "tokens/s",
        "vs_baseline": round(decode_tok_s / A100_INT8_DECODE_TOK_S, 2),
        "extra": {
            "encode_frames_per_sec_vitL14_bf16": round(frames_per_sec, 1),
            "p50_ttft_s_2frame_640tok": round(t_ttft, 4),
            "xbd_2frame_e2e_latency_s_32newtok": round(t_e2e, 4),
            "prefill_tokens": prompt_len,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

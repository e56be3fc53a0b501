"""Benchmark: flagship TEOChat inference path on one real TPU chip.

Measures the BASELINE.json target metrics on true flagship shapes
(ViT-L/14 @ 224px encoder in bf16; LLaMA-2-7B decoder, int8 weight-only — the
reference evaluates 8-bit, scripts/eval_teochat.sh:10-16):

- decode tokens/sec/chip  (headline; printed as the ONE json line)
- encode frames/sec       (ViT-L/14 batched frame encoding)
- xBD 2-frame e2e latency (encode 2 frames + prefill 640 fused tokens + 32
  new tokens) and p50 TTFT

Weights are random (identical compute/memory traffic to real weights; no
egress to fetch checkpoints). Each phase runs in its own subprocess with one
retry — the TPU tunnel in this environment occasionally drops long-lived
clients. Timings force a device->host scalar fetch so async dispatch cannot
fake results. vs_baseline divides by an A100 reference point of 20 decode
tokens/sec for 7B LLM.int8 (bitsandbytes) inference — the reference's serving
configuration; TEOChat publishes no latency numbers (BASELINE.md).

Roofline note (measured on this chip, round 2): the decode step moves
weights (6.6 GB int8) + KV cache (0.37 GB/row-group) at ~650-660 GB/s
effective (~80% of v5e HBM spec). Round 1 was ~20-45% below this because the
layer scan re-stacked (copied) both full KV-cache buffers every step; the
fori-loop/in-place-scatter cache (models/llama.py) removed that. Single-stream
decode is bandwidth-bound — further bs=1 gains require smaller weights (int4)
or a smaller cache (int8 KV), not better kernels. Batched decode amortizes
each weight read across rows; KV bytes scale with batch.
"""

import json
import os
import signal
import subprocess
import sys
import time

# Persistent compilation cache: the 7B decode-loop program takes minutes to
# compile through the remote TPU tunnel; cache hits make reruns start in
# seconds. Harmless elsewhere.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

A100_INT8_DECODE_TOK_S = 20.0  # bitsandbytes LLM.int8 7B on A100 (estimate)


def _log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def _timeit_all(fn, iters, sync=lambda: None, batches=3):
    """Per-iteration time of each of `batches` batches (sorted ascending);
    sync() forces a scalar device->host fetch (host-only phases pass no
    sync). Returning ALL batch times lets phases publish spread, not just a
    point estimate (tunnel variance vs real regressions, VERDICT r3 #6)."""
    fn()  # warmup / compile
    sync()
    times = []
    for _ in range(batches):
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        sync()
        times.append((time.perf_counter() - t0) / iters)
    return sorted(times)


def _timeit(fn, iters, sync=lambda: None):
    """Median-of-3 batches (see _timeit_all)."""
    return _timeit_all(fn, iters, sync)[1]


# ---------------------------------------------------------------- phases


def phase_encode():
    import numpy as np
    import jax, jax.numpy as jnp
    from teochat_tpu.config import TEOChatConfig
    from teochat_tpu.models import teochat as teochat_mod, vit as vit_mod
    from teochat_tpu.models.projector import init_projector

    cfg = TEOChatConfig()
    vp = vit_mod.init_vit(jax.random.PRNGKey(0), cfg.vision, dtype=jnp.bfloat16)
    pp = init_projector(jax.random.PRNGKey(1), cfg.projector, dtype=jnp.bfloat16)
    params = {"vision": vp, "projector": pp}
    # measured sweet spot (r4 sweep on the tunnel chip, see TODO.md):
    # 16: 604, 32: 657, 64: 635, 128: 580 f/s — 32 is the peak (larger
    # batches start spilling the 257-token activations), so keep 32.
    enc_batch = int(os.environ.get("BENCH_ENC_BATCH", "32"))
    frames = jnp.asarray(
        np.random.RandomState(0).randn(enc_batch, 3, 224, 224), jnp.bfloat16
    )
    out = [None]

    def fn():
        out[0] = teochat_mod.encode_frames(params, cfg, frames)

    def sync():
        float(jnp.sum(out[0]))

    dt = _timeit(fn, iters=20, sync=sync)

    # w8a8 tower (ops/quant.py::quantize_vit_params): encode is
    # compute-bound, so int8 activations ride the v5e MXU's 2x int8 rate.
    # Opt-in (metric-parity, not bit-parity) — reported alongside bf16.
    from teochat_tpu.ops.quant import quantize_vit_params

    params_q = {"vision": quantize_vit_params(vp), "projector": pp}

    def fn_q():
        out[0] = teochat_mod.encode_frames(params_q, cfg, frames)

    dt_q = _timeit(fn_q, iters=20, sync=sync)
    return {
        "encode_s_per_batch": dt,
        "encode_frames_per_sec": enc_batch / dt,
        "encode_frames_per_sec_w8a8": enc_batch / dt_q,
    }


def _build_decode_setup(batch: int = 1, quant: str = "int8",
                        kv_dtype: str = "bfloat16", int8_act: bool = False):
    import dataclasses

    import numpy as np
    import jax, jax.numpy as jnp
    from teochat_tpu.config import TEOChatConfig
    from teochat_tpu.constants import IMAGE_TOKEN_INDEX
    from teochat_tpu.models import fusion as fusion_mod, generation as gen_mod
    from teochat_tpu.models import llama as llama_mod
    from teochat_tpu.ops.quant import random_int4_llama, random_int8_llama

    cfg = TEOChatConfig()
    if int8_act:
        cfg = dataclasses.replace(
            cfg, llm=dataclasses.replace(cfg.llm, int8_prefill_activations=True)
        )
    make = random_int4_llama if quant == "int4" else random_int8_llama
    llm = make(jax.random.PRNGKey(0), cfg.llm)
    jax.block_until_ready(llm)

    prompt_len, max_new = 640, 64
    t_max = prompt_len + max_new + 1
    ids = [[1] + [IMAGE_TOKEN_INDEX, 7] * 2 + list(range(10, 10 + 123))] * batch
    plan = fusion_mod.build_fusion_plan(ids, tokens_per_frame=256, pad_to=prompt_len)
    # stand-in fused embeddings (encode phase measures the tower separately)
    embeds = jnp.asarray(
        np.random.RandomState(1).randn(batch, prompt_len, cfg.llm.hidden_size) * 0.02,
        jnp.bfloat16,
    )
    stop = gen_mod.StopSpec(
        keyword_ids=jnp.zeros((1, 1), jnp.int32),
        keyword_lens=jnp.zeros((1,), jnp.int32),
        eos_id=jnp.asarray(-1, jnp.int32),  # never stop: measure the full loop
    )

    def run_generate(n_new):
        toks, n = gen_mod.generate_tokens(
            llm, cfg.llm, embeds, plan.seq_lens, plan.attention_mask,
            plan.position_ids, None, stop, jax.random.PRNGKey(0),
            max_new_tokens=n_new, temperature=0.0, do_sample=False,
            cache_len=t_max, kv_dtype=kv_dtype,
        )
        return toks

    return run_generate, max_new, prompt_len


def phase_decode():
    import jax.numpy as jnp

    run_generate, max_new, prompt_len = _build_decode_setup()
    out = [None]

    def full():
        out[0] = run_generate(max_new)

    def one():
        out[0] = run_generate(1)

    def sync():
        int(jnp.sum(out[0]))

    t_fulls = _timeit_all(full, iters=3, sync=sync)
    t_full = t_fulls[1]
    _log(f"full {t_full:.3f} (min {t_fulls[0]:.3f} max {t_fulls[-1]:.3f})")
    t_one = _timeit(one, iters=3, sync=sync)
    _log(f"one(prefill+1) {t_one:.3f}")
    # spread: tok/s from each full-loop batch against the median prefill —
    # min/max bound the tunnel/queueing noise on the headline metric
    tok_s = sorted((max_new - 1) / (t - t_one) for t in t_fulls)
    return {
        "decode_tokens_per_sec": tok_s[1],
        "decode_tokens_per_sec_min": tok_s[0],
        "decode_tokens_per_sec_max": tok_s[-1],
        "ttft_s_prefill640_int8": t_one,
        "full_loop_s": t_full,
        "prefill_tokens": prompt_len,
    }


def _phase_decode_batched(batch: int, kv_dtype: str = "bfloat16", tag: str = ""):
    """Serving throughput: `batch` concurrent sequences share each weight read."""
    import jax.numpy as jnp

    run_generate, max_new, _ = _build_decode_setup(batch=batch, kv_dtype=kv_dtype)
    out = [None]

    def full():
        out[0] = run_generate(max_new)

    def one():
        out[0] = run_generate(1)

    def sync():
        int(jnp.sum(out[0]))

    t_full = _timeit(full, iters=3, sync=sync)
    t_one = _timeit(one, iters=3, sync=sync)
    tok_s = batch * (max_new - 1) / (t_full - t_one)
    return {f"decode_tokens_per_sec_bs{batch}{tag}": tok_s}


def phase_decode_bs8():
    return _phase_decode_batched(8)


def phase_decode_bs16():
    return _phase_decode_batched(16)


def phase_decode_bs32():
    # bf16 KV at bs=32 (11.8 GB cache) exceeds HBM next to 6.6 GB weights;
    # e4m3 KV halves it. Decode at this batch is KV-bandwidth-bound anyway.
    return _phase_decode_batched(32, kv_dtype="float8_e4m3fn", tag="_fp8kv")


def phase_ttft_int8act():
    """w8a8 prefill (per-token int8 activations -> int8 MXU at 2x bf16 rate):
    prefill is compute-bound, so TTFT should drop well below the bf16-act
    number. Decode steps are unchanged (bandwidth-bound, w8a16)."""
    import jax.numpy as jnp

    run_generate, max_new, prompt_len = _build_decode_setup(int8_act=True)
    out = [None]

    def one():
        out[0] = run_generate(1)

    def sync():
        int(jnp.sum(out[0]))

    t_one = _timeit(one, iters=3, sync=sync)
    return {"ttft_s_prefill640_int8act": t_one}


def phase_decode_int4():
    """bs=1 decode with packed int4 weights (w4a16): the bandwidth-bound
    single-stream ceiling is ~2x the int8 one. Also timed with an fp8 KV
    cache — KV reads are ~18% of the step's bytes once weights shrink to
    int4, so e4m3 KV is the natural pairing for latency serving."""
    import jax.numpy as jnp

    results = {}
    for kv_dtype, key in (
        ("bfloat16", "decode_tokens_per_sec_int4"),
        ("float8_e4m3fn", "decode_tokens_per_sec_int4_fp8kv"),
    ):
        run_generate, max_new, _ = _build_decode_setup(
            batch=1, quant="int4", kv_dtype=kv_dtype
        )
        out = [None]

        def full():
            out[0] = run_generate(max_new)

        def one():
            out[0] = run_generate(1)

        def sync():
            int(jnp.sum(out[0]))

        t_full = _timeit(full, iters=3, sync=sync)
        t_one = _timeit(one, iters=3, sync=sync)
        results[key] = (max_new - 1) / (t_full - t_one)
    return results


def phase_decode_spec():
    """bs=1 greedy decode with prompt-lookup speculation (k drafted tokens
    verified per step). Decode is weight-bandwidth-bound, so a (k+1)-token
    verify step costs ~one plain step; tokens/s multiplies by the mean
    accepted+1 per step. HONESTY NOTE: random-init weights loop quickly under
    greedy, which inflates n-gram acceptance vs real checkpoints — the
    transferable numbers are `spec_iteration_s` (verify-step cost, weights-
    independent physics) and the tok/s formula; the measured tok/s is an
    upper bound specific to this synthetic prompt. Mean acceptance on real
    EO outputs depends on how much the response echoes the prompt (bbox
    lists, class names do; free text does not)."""
    import dataclasses

    import numpy as np
    import jax, jax.numpy as jnp
    from teochat_tpu.config import TEOChatConfig
    from teochat_tpu.constants import IMAGE_TOKEN_INDEX
    from teochat_tpu.models import fusion as fusion_mod, generation as gen_mod
    from teochat_tpu.ops.quant import random_int8_llama

    cfg = TEOChatConfig()
    llm = random_int8_llama(jax.random.PRNGKey(0), cfg.llm)
    jax.block_until_ready(llm)

    prompt_len, max_new, spec_k = 640, 64, 8
    ids = [[1] + [IMAGE_TOKEN_INDEX, 7] * 2 + list(range(10, 10 + 123))]
    plan = fusion_mod.build_fusion_plan(ids, tokens_per_frame=256, pad_to=prompt_len)
    embeds = jnp.asarray(
        np.random.RandomState(1).randn(1, prompt_len, cfg.llm.hidden_size) * 0.02,
        jnp.bfloat16,
    )
    prompt_ids = np.full((1, max(len(r) for r in ids)), -1, np.int32)
    for i, r in enumerate(ids):
        prompt_ids[i, : len(r)] = r
    stop = gen_mod.StopSpec(
        keyword_ids=jnp.zeros((1, 1), jnp.int32),
        keyword_lens=jnp.zeros((1,), jnp.int32),
        eos_id=jnp.asarray(-1, jnp.int32),
    )
    out = [None]

    def run(n_new, keep_prob=None):
        toks, n, steps, acc = gen_mod.generate_tokens_spec(
            llm, cfg.llm, embeds, plan.seq_lens, plan.attention_mask,
            plan.position_ids, jnp.asarray(prompt_ids),
            jnp.asarray([len(ids[0])], jnp.int32), stop,
            max_new_tokens=n_new, cache_len=prompt_len + n_new + spec_k + 1,
            spec_k=spec_k, draft_keep_prob=keep_prob,
        )
        out[0] = toks
        return steps, acc

    stats = [None]

    def full():
        stats[0] = run(max_new)

    def one():
        run(1)

    def sync():
        int(jnp.sum(out[0]))

    t_full = _timeit(full, iters=3, sync=sync)
    t_one = _timeit(one, iters=3, sync=sync)
    steps, acc = (int(x) for x in stats[0])
    it_s = (t_full - t_one) / max(steps - 1, 1)
    results = {
        "decode_tokens_per_sec_spec_bs1": (max_new - 1) / (t_full - t_one),
        "spec_iteration_s": it_s,
        "spec_steps_for_64_tokens": steps,
        "spec_mean_tokens_per_step": max_new / max(steps, 1),
    }
    # tok/s-vs-acceptance curve: force per-position acceptance ~= keep_prob
    # by corrupting drafts (generation.draft_keep_prob). The keep_prob is a
    # TRACED scalar, so all three rates share one compiled program. This is
    # the transferable number the perfect-acceptance synthetic above is not.
    for rate in (0.75, 0.5, 0.25):
        kp = jnp.float32(rate)

        def full_r():
            stats[0] = run(max_new, kp)

        t_r = _timeit(full_r, iters=3, sync=sync)
        steps_r, _ = (int(x) for x in stats[0])
        pct = int(rate * 100)
        results[f"decode_tokens_per_sec_spec_bs1_acc{pct}"] = (
            (max_new - 1) / (t_r - t_one)
        )
        results[f"spec_tokens_per_step_acc{pct}"] = max_new / max(steps_r, 1)
    return results


def phase_serve():
    """Continuous-batching serving throughput: 8 concurrent requests through
    the BatchEngine (per-request prefill + chunked multiplexed decode + host
    scheduling at chunk boundaries) — the end-to-end serving number, unlike
    decode_bs8 which times the raw decode loop. The reference serves one
    request at a time (gradio Chat)."""
    import threading
    import time as _time

    import jax, jax.numpy as jnp
    from teochat_tpu.config import GenerationConfig, TEOChatConfig
    from teochat_tpu.models import teochat as teochat_mod
    from teochat_tpu.ops.quant import random_int8_llama
    from teochat_tpu.serve.engine import BatchEngine

    cfg = TEOChatConfig()
    llm = random_int8_llama(jax.random.PRNGKey(0), cfg.llm)
    jax.block_until_ready(llm)
    model = teochat_mod.TEOChat(cfg, {"llm": llm})

    n_req, max_new = 8, 64
    gen = GenerationConfig(max_new_tokens=max_new, temperature=0.0,
                           do_sample=False, stop_strings=())
    prompts = [[1] + list(range(10 + i, 10 + i + 120)) for i in range(n_req)]
    # Each chunk call carries ~39 ms of fixed dispatch/tunnel overhead on
    # top of 13.4 ms/step device time, so throughput workloads want bigger
    # chunks; latency-sensitive ones want smaller (admission waits up to one
    # chunk). r4 sweep (aggregate tok/s over 8 streams x 64 new tokens):
    # chunk 8: 336.0, 16: 333.8, 64: 348.5, 128: 238.1 (past max_new the
    # engine decodes tokens nobody needs); chunk=32 repeated runs gave
    # {368.3, 308.3, 299.2} — high cross-process variance, median BELOW
    # chunk=16's stable {333.8, 335.4, 336.0}. Keep 16.
    chunk = int(os.environ.get("BENCH_SERVE_CHUNK", "16"))
    engine = BatchEngine(model, max_slots=8, max_len=512, chunk=chunk).start()
    try:
        engine.submit(prompts[0], None, gen)  # warmup: compile prefill+chunk

        def run_all():
            threads = [
                threading.Thread(target=engine.submit, args=(p, None, gen))
                for p in prompts
            ]
            t0 = _time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            return _time.perf_counter() - t0

        times = sorted(run_all() for _ in range(3))
        dt = times[1]
        return {
            "serve_aggregate_tokens_per_sec_8streams": n_req * max_new / dt,
            "serve_8x64tok_wall_s": dt,
            "serve_max_concurrent": engine.stats["max_concurrent"],
        }
    finally:
        engine.shutdown()


def phase_ttft_turn2():
    """Multi-turn TTFT: with a ~640-token conversation committed in a session
    cache, the next turn prefils only its ~64-token suffix (masked attention
    over the committed KV) instead of re-prefilling everything. Reports the
    suffix prefill+1-token latency — the incremental-session win over the
    reference's re-prefill-every-turn serving (teochat_demo.py:513-546)."""
    import numpy as np
    import jax, jax.numpy as jnp
    from teochat_tpu.config import TEOChatConfig
    from teochat_tpu.models import fusion as fusion_mod, generation as gen_mod
    from teochat_tpu.models import llama as llama_mod
    from teochat_tpu.ops.quant import random_int8_llama

    cfg = TEOChatConfig()
    llm = random_int8_llama(jax.random.PRNGKey(0), cfg.llm)
    jax.block_until_ready(llm)

    committed, suffix_len, max_len = 640, 64, 1024
    cache = llama_mod.init_cache(cfg.llm, 1, max_len, dtype=jnp.bfloat16)
    # commit a 640-token "turn 1" once (not timed)
    emb1 = jnp.asarray(
        np.random.RandomState(0).randn(1, committed, cfg.llm.hidden_size) * 0.02,
        jnp.bfloat16,
    )
    ar = jnp.arange(committed, dtype=jnp.int32)[None]
    _, cache = gen_mod.prefill_full(
        llm, cfg.llm, cache, emb1,
        jnp.asarray([committed], jnp.int32), jnp.ones((1, committed), bool), ar,
    )

    ids2 = [list(range(10, 10 + suffix_len))]
    plan2 = fusion_mod.build_fusion_plan(ids2, tokens_per_frame=256, pad_to=128)
    emb2 = jnp.asarray(
        np.random.RandomState(1).randn(1, 128, cfg.llm.hidden_size) * 0.02,
        jnp.bfloat16,
    )
    state = {"cache": cache, "logits": None}

    def fn():
        # the donated cache is re-threaded through state each call
        state["logits"], state["cache"] = gen_mod.prefill_suffix(
            llm, cfg.llm, state["cache"], emb2,
            jnp.asarray([committed], jnp.int32), plan2.seq_lens,
            plan2.attention_mask, plan2.position_ids,
        )

    def sync():
        float(jnp.sum(state["logits"]))

    dt = _timeit(fn, iters=5, sync=sync)
    return {"ttft_s_turn2_suffix64_over640": dt}


def phase_ttft_prefix():
    """Automatic-prefix-caching TTFT: prompts sharing a 512-token text prefix
    (a long system prompt) seed their KV from the engine's prefix pool and
    prefill only the suffix. Reports miss vs hit TTFT through the full engine
    admission path (queue + encode + prefill + first-token read)."""
    import time as _time

    import jax
    from teochat_tpu.config import GenerationConfig, TEOChatConfig
    from teochat_tpu.models import teochat as teochat_mod
    from teochat_tpu.ops.quant import random_int8_llama
    from teochat_tpu.serve.engine import BatchEngine

    cfg = TEOChatConfig()
    llm = random_int8_llama(jax.random.PRNGKey(0), cfg.llm)
    jax.block_until_ready(llm)
    model = teochat_mod.TEOChat(cfg, {"llm": llm})
    gen = GenerationConfig(max_new_tokens=1, temperature=0.0,
                           do_sample=False, stop_strings=())

    def prefix(base):
        return [1] + list(range(base, base + 511))  # 512-token shared run

    def prompt(base, i):
        return prefix(base) + [2000 + i, 2100 + i, 5 + i]

    engine = BatchEngine(model, max_slots=2, max_len=1024, chunk=4,
                         prefix_cache_slots=4, prefix_min_tokens=32).start()
    try:
        # warm both paths' programs: miss prefill (768 bucket), pool store
        # copy, hit copy + suffix tail (32 bucket)
        engine.submit(prompt(100, 0), None, gen)
        engine.submit(prompt(100, 1), None, gen)

        def timed(base, i):
            t0 = _time.perf_counter()
            engine.submit(prompt(base, i), None, gen)
            return _time.perf_counter() - t0

        # misses: distinct prefixes, same shapes (no recompile)
        miss = sorted(timed(b, 0) for b in (3000, 5000, 7000))[1]
        # hits: fresh suffixes over the already-pooled base=100 prefix
        hit = sorted(timed(100, i) for i in (2, 3, 4))[1]
        saved = engine.stats["prefix_tokens_saved"]
        return {
            "ttft_s_prefix_miss_515tok": miss,
            "ttft_s_prefix_hit_515tok": hit,
            "prefix_hit_ttft_speedup": miss / hit,
            "prefix_tokens_saved": saved,
        }
    finally:
        engine.shutdown()


def phase_train():
    """One LoRA train step on the flagship recipe shapes (reference
    train_teochat.sh: 8-bit backbone + LoRA r=128/a=256 + trainable projector,
    bf16 tower, remat): tokens/sec/chip of supervised training. The reference
    never publishes a training-throughput number; this pins ours."""
    import numpy as np
    import jax, jax.numpy as jnp
    from teochat_tpu.config import TEOChatConfig
    from teochat_tpu.constants import IMAGE_TOKEN_INDEX
    from teochat_tpu.models import fusion as fusion_mod, vit as vit_mod
    from teochat_tpu.models.projector import init_projector
    from teochat_tpu.ops.quant import random_int8_llama
    from teochat_tpu.train import lora as lora_mod
    from teochat_tpu.train import trainer as trainer_mod

    cfg = TEOChatConfig()
    llm = random_int8_llama(jax.random.PRNGKey(0), cfg.llm)
    llm = lora_mod.add_lora_params(
        jax.random.PRNGKey(1), llm, rank=128, alpha=256.0, dtype=jnp.float32
    )
    params = {
        "vision": vit_mod.init_vit(jax.random.PRNGKey(2), cfg.vision, dtype=jnp.bfloat16),
        "projector": init_projector(jax.random.PRNGKey(3), cfg.projector, dtype=jnp.float32),
        "llm": llm,
    }
    jax.block_until_ready(params["llm"])

    batch = int(os.environ.get("BENCH_TRAIN_BS", "2"))
    seq = 640
    ids = [[1] + [IMAGE_TOKEN_INDEX, 7] * 2 + list(range(10, 10 + 123))] * batch
    plan = fusion_mod.build_fusion_plan(
        ids, tokens_per_frame=256, pad_to=seq,
        labels=[[-100] * 5 + r[5:] for r in ids],
    )
    frames = jnp.asarray(
        np.random.RandomState(0).randn(2 * batch, 3, 224, 224), jnp.bfloat16
    )

    optimizer = trainer_mod.make_optimizer(2e-4, projector_lr=2e-5, total_steps=100)
    # donate params: without it the init program holds params twice (input +
    # state output), which OOMs next to the 6.6 GB int8 backbone
    state = jax.jit(
        lambda p: trainer_mod.init_train_state(
            p, optimizer, lora_mod.lora_trainable_filter
        ),
        donate_argnums=0,
    )(params)
    step = trainer_mod.make_train_step(
        cfg, optimizer, trainable_filter=lora_mod.lora_trainable_filter,
        remat=True,
    )
    holder = [state]

    def fn():
        holder[0], loss = step(holder[0], plan, frames)
        fn.loss = loss

    def sync():
        float(fn.loss)

    dt = _timeit(fn, iters=3, sync=sync)
    return {
        f"train_step_s_bs{batch}_seq640": dt,
        "train_tokens_per_sec": batch * seq / dt,
    }


def phase_e2e():
    """2-frame encode + prefill + 32 new tokens, one process: e2e latency."""
    import numpy as np
    import jax, jax.numpy as jnp
    from teochat_tpu.config import TEOChatConfig
    from teochat_tpu.constants import IMAGE_TOKEN_INDEX
    from teochat_tpu.models import fusion as fusion_mod, generation as gen_mod
    from teochat_tpu.models import llama as llama_mod, teochat as teochat_mod
    from teochat_tpu.models import vit as vit_mod
    from teochat_tpu.models.projector import init_projector
    from teochat_tpu.ops.quant import random_int8_llama

    cfg = TEOChatConfig()
    params = {
        "vision": vit_mod.init_vit(jax.random.PRNGKey(0), cfg.vision, dtype=jnp.bfloat16),
        "projector": init_projector(jax.random.PRNGKey(1), cfg.projector, dtype=jnp.bfloat16),
        "llm": random_int8_llama(jax.random.PRNGKey(2), cfg.llm),
    }
    jax.block_until_ready(params["llm"])

    prompt_len, max_new = 640, 32
    ids = [[1] + [IMAGE_TOKEN_INDEX, 7] * 2 + list(range(10, 10 + 123))]
    plan = fusion_mod.build_fusion_plan(ids, tokens_per_frame=256, pad_to=prompt_len)
    frames = jnp.asarray(np.random.RandomState(0).randn(2, 3, 224, 224), jnp.bfloat16)
    stop = gen_mod.StopSpec(
        keyword_ids=jnp.zeros((1, 1), jnp.int32),
        keyword_lens=jnp.zeros((1,), jnp.int32),
        eos_id=jnp.asarray(-1, jnp.int32),
    )
    out = [None]

    def fn():
        vt = teochat_mod.encode_frames(params, cfg, frames)
        emb = teochat_mod.multimodal_embeds(params, cfg, plan, vt)
        toks, _ = gen_mod.generate_tokens(
            params["llm"], cfg.llm, emb, plan.seq_lens, plan.attention_mask,
            plan.position_ids, None, stop, jax.random.PRNGKey(0),
            max_new_tokens=max_new, temperature=0.0, do_sample=False,
            cache_len=prompt_len + max_new + 1,
        )
        out[0] = toks

    def sync():
        int(jnp.sum(out[0]))

    t = _timeit(fn, iters=3, sync=sync)
    return {"xbd_2frame_e2e_latency_s_32newtok": t}


def phase_preprocess():
    """Host-only: native C++ vs PIL image-preprocessing throughput (no TPU).
    The input pipeline feeds the encode phase; frames/sec here bounds how many
    512x640 satellite frames one host core can prepare."""
    import numpy as np

    from teochat_tpu import native
    from teochat_tpu.data.processing import ImageProcessor

    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 256, (512, 640, 3), np.uint8) for _ in range(64)]
    pil_proc = ImageProcessor(use_native=False)

    t_pil = _timeit(lambda: pil_proc.preprocess(frames), iters=3)
    out = {"preprocess_pil_frames_per_sec": len(frames) / t_pil}
    if native.available():
        t_nat = _timeit(
            lambda: native.preprocess_batch(
                frames, 224, pil_proc.image_mean, pil_proc.image_std
            ),
            iters=3,
        )
        out["preprocess_native_frames_per_sec"] = len(frames) / t_nat
    return out


PHASES = {
    "preprocess": phase_preprocess,
    "encode": phase_encode,
    "decode": phase_decode,
    "decode_bs8": phase_decode_bs8,
    "decode_bs16": phase_decode_bs16,
    "decode_bs32": phase_decode_bs32,
    "decode_int4": phase_decode_int4,
    "decode_spec": phase_decode_spec,
    "ttft_int8act": phase_ttft_int8act,
    "ttft_turn2": phase_ttft_turn2,
    "ttft_prefix": phase_ttft_prefix,
    "serve": phase_serve,
    "train": phase_train,
    "e2e": phase_e2e,
}

HOST_ONLY = {"preprocess"}


# Ordered so the BASELINE.json target metrics (decode headline incl. p50
# TTFT, encode, e2e) land first: whatever the wall-clock budget, the final
# JSON line always carries the numbers the driver/judge track. (HOST_ONLY
# phases are hoisted to run before everything — they are seconds of pure
# host work and must land even when the TPU tunnel is wedged.)
PHASE_ORDER = (
    "decode", "encode", "e2e", "preprocess", "decode_bs8", "decode_bs16",
    "decode_bs32", "decode_int4", "serve", "train", "decode_spec",
    "ttft_int8act", "ttft_turn2", "ttft_prefix",
)

# Conservative warm-cache wall-clock estimates per phase (seconds), assuming
# the grouped-child runner (jax import + tunnel backend init paid ONCE per
# child, not per phase). Overwritten by the measured timings in the sidecar
# from the previous run, when present.
PHASE_EST_S = {
    "decode": 60, "encode": 40, "e2e": 40, "serve": 80, "train": 90,
    "decode_int4": 90, "ttft_int8act": 30, "ttft_turn2": 30,
    "decode_spec": 60, "decode_bs8": 40, "decode_bs16": 50,
    "decode_bs32": 60, "preprocess": 15, "ttft_prefix": 60,
}

# Round 2 lesson (BENCH_r02.json rc=124/parsed=null): the 12-phase serial run
# overran the driver's timeout and the final JSON line was never printed.
# Budget so the line ALWAYS lands: skip phases that don't fit, and emit on
# SIGTERM as a last resort.
# Default sized against the driver's observed budget: round 2 was killed at
# phase 9/12 ≈ 15 min in, so the budget is ≥~900 s; 780 s leaves margin.
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "780"))
FINAL_MARGIN_S = 10.0
SIDECAR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "bench_sidecar.json")

_CHILD = [None]  # live phase subprocess, killed by the SIGTERM handler


def _load_sidecar():
    try:
        with open(SIDECAR) as f:
            return json.load(f)
    except Exception:
        return {}


def _save_sidecar(data):
    tmp = SIDECAR + ".tmp"
    with open(tmp, "w") as f:
        json.dump(data, f, indent=1)
    os.replace(tmp, SIDECAR)


def _child_run_phases(names):
    """Child body: run phases SEQUENTIALLY in one process (one jax import +
    one tunnel backend init, amortized over every phase — r4's one-child-per-
    phase runner paid ~20-40 s of init per phase and starved the 780 s budget
    after two failures). Emits one JSON line per phase as it completes, so
    the parent banks each result the moment it exists; a phase that RAISES is
    reported on its line and the child moves on — only a hang/crash kills the
    child (and the parent respawns one for the remaining phases)."""
    import gc
    import traceback

    tpu_needed = any(n not in HOST_ONLY for n in names)
    if tpu_needed:
        import jax

        t0 = time.perf_counter()
        assert (
            jax.default_backend() == "tpu"
        ), f"need tpu, got {jax.default_backend()}"
        # tiny probe: surfaces a wedged tunnel as init time, not phase time
        import jax.numpy as jnp

        float(jnp.ones((8, 8)).sum())
        print(json.dumps({"__init__": round(time.perf_counter() - t0, 1)}),
              flush=True)
    for name in names:
        t0 = time.perf_counter()
        try:
            result = PHASES[name]()
            line = {"__phase__": name, "result": result,
                    "t": round(time.perf_counter() - t0, 1)}
        except Exception as e:  # noqa: BLE001 — report and continue
            traceback.print_exc()
            line = {"__phase__": name, "error": f"{type(e).__name__}: {e}",
                    "t": round(time.perf_counter() - t0, 1)}
        print(json.dumps(line), flush=True)
        gc.collect()  # drop the phase's device buffers before the next one


class _ChildReader:
    """Streams a child's stdout lines through a queue with timeouts."""

    def __init__(self, names, errpath):
        self.errfile = open(errpath, "w")
        self.proc = subprocess.Popen(
            [sys.executable, __file__, "--phases", ",".join(names)],
            stdout=subprocess.PIPE, stderr=self.errfile, text=True,
        )
        _CHILD[0] = self.proc
        self.q = __import__("queue").Queue()
        self._t = __import__("threading").Thread(target=self._pump, daemon=True)
        self._t.start()

    def _pump(self):
        for line in self.proc.stdout:
            self.q.put(line)
        self.q.put(None)  # EOF

    def get(self, timeout):
        import queue as _q

        try:
            return self.q.get(timeout=timeout)
        except _q.Empty:
            return ""

    def kill(self):
        try:
            self.proc.kill()
            self.proc.wait()
        except Exception:
            pass
        _CHILD[0] = None
        self.errfile.close()

    def err_tail(self, n=1500):
        try:
            self.errfile.flush()
            with open(self.errfile.name) as f:
                return f.read()[-n:]
        except Exception:
            return ""


def _run_phases_streamed(names, t_start, timings, results, statuses, errors,
                         prev_ok, save):
    """Parent loop: one grouped child over `names`, per-phase watchdog caps,
    incremental sidecar banking via save(), one respawn per crash (the
    crashed phase is retried once as the new child's first phase)."""
    idx = 0
    crash_retried = set()
    child_n = 0
    while idx < len(names):
        remaining_wall = DEADLINE_S - (time.perf_counter() - t_start) - FINAL_MARGIN_S
        if remaining_wall < 30:
            break
        errpath = f"/tmp/bench_child_{os.getpid()}_{child_n}.err"
        child_n += 1
        reader = _ChildReader(names[idx:], errpath)
        if any(n not in HOST_ONLY for n in names[idx:]):
            # first-line budget covers jax import + tunnel backend init. A
            # wedged tunnel (killed TPU process earlier on the box) clears in
            # 3-15 min of WAITING — killing + respawning restarts the
            # handshake — so the one child gets the whole remaining budget:
            # if the wedge clears at minute 6, warm phases still fit.
            init_cap = min(
                float(os.environ.get("BENCH_INIT_CAP_S", str(DEADLINE_S))),
                remaining_wall,
            )
            t_init = time.perf_counter()
            line = reader.get(init_cap)
            if not line or "__init__" not in line:
                waited = time.perf_counter() - t_init
                tail = reader.err_tail()
                _log(f"child init failed/hung after {waited:.0f}s; "
                     f"stderr: {tail[-300:]}")
                reader.kill()
                errors["__init__"] = tail
                if waited > 60 or child_n >= 3:
                    break  # hang: waiting was the only play; crash x3: give up
                continue  # fast crash (import error etc): one more child
            _log(f"child up: init {line.strip()}")
        crashed = False
        while idx < len(names):
            name = names[idx]
            remaining_wall = (DEADLINE_S - (time.perf_counter() - t_start)
                              - FINAL_MARGIN_S)
            est = 1.2 * timings.get(name, PHASE_EST_S.get(name, 60))
            cap = min(max(2.5 * est, 120.0), remaining_wall)
            if cap < min(est, 30):
                _log(f"deadline: skipping {name} ({remaining_wall:.0f}s left)")
                reader.kill()
                for n in names[idx:]:
                    statuses.setdefault(n, "cached" if n in prev_ok
                                        else "skipped")
                return
            t0 = time.perf_counter()
            line = reader.get(cap)
            if line is None or line == "":
                kind = "exited" if line is None else f"hung past {cap:.0f}s cap"
                tail = reader.err_tail()
                _log(f"phase {name}: child {kind}; stderr tail: {tail[-300:]}")
                errors[name] = tail
                reader.kill()
                crashed = True
                if line is None and name not in crash_retried:
                    crash_retried.add(name)  # one in-place retry via respawn
                else:
                    statuses[name] = ("failed_cached" if name in prev_ok
                                      else "failed")
                    idx += 1
                break
            try:
                msg = json.loads(line)
            except ValueError:
                continue  # stray print from a phase; keep waiting
            if "__phase__" not in msg or msg["__phase__"] != name:
                continue
            if "error" in msg:
                _log(f"phase {name} raised: {msg['error']}")
                errors[name] = msg["error"]
                statuses[name] = ("failed_cached" if name in prev_ok
                                  else "failed")
            else:
                results.update(msg["result"])
                statuses[name] = "ok"
                timings[name] = msg.get("t", round(time.perf_counter() - t0, 1))
                _log(f"phase {name} ok [{timings[name]}s]")
            idx += 1
            save()
        if not crashed:
            reader.kill()
            return
    # deadline or init failure: mark the rest
    for name in names[idx:]:
        statuses.setdefault(name, "cached" if name in prev_ok else "skipped")


# extra-dict spec: (output key, results key, producing phase, round digits).
# _emit_final renders a key as `null` when its phase never produced a value,
# and renames it `<key>_cached` when the value is a PRIOR run's (its phase
# didn't finish "ok" this run) — a failure is never published as a number
# (VERDICT r3: bs32 rendered 0.0 as if measured).
EXTRA_SPEC = (
    ("encode_frames_per_sec_vitL14_bf16", "encode_frames_per_sec", "encode", 1),
    ("encode_frames_per_sec_vitL14_w8a8", "encode_frames_per_sec_w8a8", "encode", 1),
    ("p50_ttft_s_2frame_640tok_int8", "ttft_s_prefill640_int8", "decode", 4),
    ("ttft_s_prefill640_int8act_w8a8", "ttft_s_prefill640_int8act", "ttft_int8act", 4),
    ("xbd_2frame_e2e_latency_s_32newtok", "xbd_2frame_e2e_latency_s_32newtok", "e2e", 4),
    ("decode_tokens_per_sec_min", "decode_tokens_per_sec_min", "decode", 2),
    ("decode_tokens_per_sec_max", "decode_tokens_per_sec_max", "decode", 2),
    ("decode_tokens_per_sec_bs8", "decode_tokens_per_sec_bs8", "decode_bs8", 1),
    ("decode_tokens_per_sec_bs16", "decode_tokens_per_sec_bs16", "decode_bs16", 1),
    ("decode_tokens_per_sec_bs32_fp8kv", "decode_tokens_per_sec_bs32_fp8kv", "decode_bs32", 1),
    ("decode_tokens_per_sec_int4_bs1", "decode_tokens_per_sec_int4", "decode_int4", 1),
    ("decode_tokens_per_sec_int4_fp8kv_bs1", "decode_tokens_per_sec_int4_fp8kv", "decode_int4", 1),
    ("decode_tokens_per_sec_spec_bs1_synthetic", "decode_tokens_per_sec_spec_bs1", "decode_spec", 1),
    ("decode_tokens_per_sec_spec_bs1_acc75", "decode_tokens_per_sec_spec_bs1_acc75", "decode_spec", 1),
    ("decode_tokens_per_sec_spec_bs1_acc50", "decode_tokens_per_sec_spec_bs1_acc50", "decode_spec", 1),
    ("decode_tokens_per_sec_spec_bs1_acc25", "decode_tokens_per_sec_spec_bs1_acc25", "decode_spec", 1),
    ("spec_tokens_per_step_acc75", "spec_tokens_per_step_acc75", "decode_spec", 2),
    ("spec_tokens_per_step_acc50", "spec_tokens_per_step_acc50", "decode_spec", 2),
    ("spec_tokens_per_step_acc25", "spec_tokens_per_step_acc25", "decode_spec", 2),
    ("spec_verify_iteration_s_k8", "spec_iteration_s", "decode_spec", 5),
    ("spec_mean_tokens_per_step", "spec_mean_tokens_per_step", "decode_spec", 2),
    ("train_tokens_per_sec_lora_r128_int8_seq640", "train_tokens_per_sec", "train", 1),
    ("ttft_s_turn2_suffix64_over640", "ttft_s_turn2_suffix64_over640", "ttft_turn2", 4),
    ("serve_aggregate_tokens_per_sec_8streams", "serve_aggregate_tokens_per_sec_8streams", "serve", 1),
    ("preprocess_native_frames_per_sec_host", "preprocess_native_frames_per_sec", "preprocess", 1),
    ("preprocess_pil_frames_per_sec_host", "preprocess_pil_frames_per_sec", "preprocess", 1),
    ("ttft_s_prefix_miss_515tok", "ttft_s_prefix_miss_515tok", "ttft_prefix", 4),
    ("ttft_s_prefix_hit_515tok", "ttft_s_prefix_hit_515tok", "ttft_prefix", 4),
    ("prefix_hit_ttft_speedup", "prefix_hit_ttft_speedup", "ttft_prefix", 2),
)


def _emit_final(results, statuses):
    extra = {"prefill_tokens": results.get("prefill_tokens", 640)}
    for out_key, res_key, phase, digits in EXTRA_SPEC:
        val = results.get(res_key)
        if val is None:
            extra[out_key] = None  # never measured: null, NEVER 0.0
        elif statuses.get(phase) == "ok":
            extra[out_key] = round(val, digits)
        else:  # a previous run's number — stale-marked in the key itself
            extra[out_key + "_cached"] = round(val, digits)
    extra["phases"] = statuses

    decode_tok_s = results.get("decode_tokens_per_sec")
    fresh = statuses.get("decode") == "ok"
    out = {
        "metric": "decode tokens/sec/chip (LLaMA-7B int8, bs=1)",
        "value": round(decode_tok_s, 2) if decode_tok_s is not None else None,
        "unit": "tokens/s",
        "vs_baseline": (
            round(decode_tok_s / A100_INT8_DECODE_TOK_S, 2)
            if decode_tok_s is not None else None
        ),
        "fresh": fresh,  # False: `value` is a prior run's cached measurement
        "extra": extra,
    }
    print(json.dumps(out), flush=True)


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--phases":
        _child_run_phases(sys.argv[2].split(","))
        return
    if len(sys.argv) >= 3 and sys.argv[1] == "--phase":
        # single-phase CLI (CLAUDE.md usage): same child body, bare result
        name = sys.argv[2]
        if name not in HOST_ONLY:
            import jax

            assert (
                jax.default_backend() == "tpu"
            ), f"need tpu, got {jax.default_backend()}"
        result = PHASES[name]()
        print(json.dumps(result), flush=True)
        return

    only = None
    if len(sys.argv) >= 3 and sys.argv[1] == "--only":
        only = sys.argv[2].split(",")

    t_start = time.perf_counter()
    sidecar = _load_sidecar()
    timings = dict(sidecar.get("timings", {}))
    prev_ok = {
        n for n, s in sidecar.get("statuses", {}).items()
        if s in ("ok", "cached")
    }
    # seed from the previous run so a skipped/failed phase reports its last
    # measured value (status says "cached") instead of a hard 0.0 — the
    # driver artifact stays meaningful even when the budget cuts phases
    results = dict(sidecar.get("results", {}))
    statuses = {}
    errors = {}
    emitted = [False]

    def emit_once():
        if not emitted[0]:
            emitted[0] = True
            for name in PHASE_ORDER:
                statuses.setdefault(name, "cached" if name in prev_ok else "skipped")
            _emit_final(results, statuses)

    def on_term(signum, frame):
        _log(f"signal {signum}: emitting final JSON with completed phases")
        child = _CHILD[0]
        if child is not None:
            try:
                child.kill()
            except Exception:
                pass
        emit_once()
        os._exit(0)

    signal.signal(signal.SIGTERM, on_term)
    signal.signal(signal.SIGINT, on_term)

    merged = {**sidecar.get("statuses", {})}

    def save():
        # phases not reached THIS run keep their prior ok/cached standing in
        # the sidecar (their cached results live on)
        _save_sidecar({"timings": timings, "results": results,
                       "statuses": {**merged, **statuses}, "errors": errors})

    # Host-only phases never touch the TPU: they run FIRST (seconds, immune
    # to tunnel wedges) so they always land; the TPU phases share one child.
    names = list(only or PHASE_ORDER)
    host = [n for n in names if n in HOST_ONLY]
    tpu = [n for n in names if n not in HOST_ONLY]
    if host:
        _run_phases_streamed(host, t_start, timings, results, statuses,
                             errors, prev_ok, save)
        save()
    _run_phases_streamed(tpu, t_start, timings, results, statuses, errors,
                         prev_ok, save)
    save()
    emit_once()


if __name__ == "__main__":
    main()

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


def phase_encode_pipeline():
    """SUSTAINED end-to-end encode throughput from raw decoded frames
    (512x640 uint8) to vision tokens — the input pipeline VERDICT r4 #5
    flagged as host-gated (native preprocess 425 f/s < device encode 775).
    Two pipelined paths, both double-buffered one batch deep:

    A) host-native preprocess (C++ fixed-point, bit-exact parity) in a
       worker thread overlapping the device encode of the previous batch —
       sustained ~= min(host, device) on this 1-core box;
    B) DEVICE preprocess (ops/preprocess.py: bicubic resize+crop+normalize
       under jit, metric-parity) — the host only ships uint8 bytes, so the
       encode is no longer gated by host arithmetic at all;
    C) LINK-OPTIMIZED: host resize+crop to 224 uint8 (cv2, metric-parity),
       ship 0.15 MB/frame (6.5x less than path A's fp32, 6.5x less than
       path B's raw uint8), normalize on device.

    Measured environment fact that shapes this phase: the axon tunnel's
    host->device link moves ~35 MB/s (published as h2d_mbps), so shipping
    bytes — not host arithmetic, not device compute — is the gate here.
    On a co-located TPU host (PCIe: tens of GB/s) paths B/C are
    device-bound; path C is the right default either way because it ships
    the fewest bytes per frame."""
    from concurrent.futures import ThreadPoolExecutor

    import numpy as np
    import jax, jax.numpy as jnp
    from teochat_tpu import native
    from teochat_tpu.config import TEOChatConfig
    from teochat_tpu.data.processing import ImageProcessor
    from teochat_tpu.models import teochat as teochat_mod, vit as vit_mod
    from teochat_tpu.models.projector import init_projector
    from teochat_tpu.ops.preprocess import preprocess_frames
    from teochat_tpu.ops.quant import quantize_vit_params

    cfg = TEOChatConfig()
    vp = vit_mod.init_vit(jax.random.PRNGKey(0), cfg.vision, dtype=jnp.bfloat16)
    pp = init_projector(jax.random.PRNGKey(1), cfg.projector, dtype=jnp.bfloat16)
    params = {"vision": quantize_vit_params(vp), "projector": pp}
    jax.block_until_ready(params["vision"])

    nb, bs = 8, 32
    rng = np.random.RandomState(0)
    raw = [rng.randint(0, 256, (bs, 512, 640, 3), np.uint8) for _ in range(nb)]
    proc = ImageProcessor(use_native=False)

    def prep_host(i):
        if native.available():
            return native.preprocess_batch(
                list(raw[i]), 224, proc.image_mean, proc.image_std
            )
        return proc.preprocess(list(raw[i]))["pixel_values"]

    out = [None]

    def run_host_path():
        with ThreadPoolExecutor(max_workers=1) as pool:
            fut = pool.submit(prep_host, 0)
            for i in range(nb):
                px = fut.result()
                if i + 1 < nb:
                    fut = pool.submit(prep_host, i + 1)
                out[0] = teochat_mod.encode_frames(
                    params, cfg, jnp.asarray(px, jnp.bfloat16)
                )

    def run_device_path():
        for i in range(nb):
            x = preprocess_frames(jnp.asarray(raw[i])).astype(jnp.bfloat16)
            out[0] = teochat_mod.encode_frames(params, cfg, x)

    def prep_small(i):
        """Host resize+center-crop to 224 uint8 (cv2 bicubic): the smallest
        byte stream that preserves the frame for device-side normalize."""
        import cv2

        outb = np.empty((bs, 224, 224, 3), np.uint8)
        for j, img in enumerate(raw[i]):
            h, w = img.shape[:2]
            if w <= h:
                nw, nh = 224, max(round(h * 224 / w), 224)
            else:
                nw, nh = max(round(w * 224 / h), 224), 224
            r = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_CUBIC)
            top, left = (nh - 224) // 2, (nw - 224) // 2
            outb[j] = r[top : top + 224, left : left + 224]
        return outb  # numpy — device calls from worker threads wedge the
        # single-client tunnel (measured: a device_put here hung the phase)

    def run_linkopt_path():
        with ThreadPoolExecutor(max_workers=1) as pool:
            fut = pool.submit(prep_small, 0)
            for i in range(nb):
                host_u8 = fut.result()
                if i + 1 < nb:
                    fut = pool.submit(prep_small, i + 1)
                x = preprocess_frames(jnp.asarray(host_u8)).astype(jnp.bfloat16)
                out[0] = teochat_mod.encode_frames(params, cfg, x)

    def sync():
        float(jnp.sum(out[0]))

    results = {}
    # the environment fact first: raw h2d link rate (31 MB of uint8)
    up = [None]

    def h2d():
        up[0] = jax.device_put(raw[0])

    t_up = _timeit(h2d, iters=1, sync=lambda: jax.block_until_ready(up[0]))
    results["h2d_mbps"] = raw[0].nbytes / t_up / 1e6
    t_host = _timeit(run_host_path, iters=1, sync=sync)
    results["encode_sustained_fps_hostpre"] = nb * bs / t_host
    t_dev = _timeit(run_device_path, iters=1, sync=sync)
    results["encode_sustained_fps_devicepre"] = nb * bs / t_dev
    t_link = _timeit(run_linkopt_path, iters=1, sync=sync)
    results["encode_sustained_fps_linkopt"] = nb * bs / t_link

    # device-only reference on the same tower (frames pre-staged on device)
    staged = jnp.asarray(prep_host(0), jnp.bfloat16)

    def run_device_only():
        out[0] = teochat_mod.encode_frames(params, cfg, staged)

    t_ref = _timeit(run_device_only, iters=nb, sync=sync)
    results["encode_frames_per_sec_deviceonly"] = bs / t_ref
    best = max(results["encode_sustained_fps_hostpre"],
               results["encode_sustained_fps_devicepre"],
               results["encode_sustained_fps_linkopt"])
    results["encode_sustained_vs_deviceonly"] = best / (bs / t_ref)
    return results


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

    # roofline inputs: exact weight bytes from the live param pytree; KV
    # bytes one step reads = the full [L, B, t_max, H, D] x2 buffer (masked
    # attention is static-shaped)
    run_generate.weight_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(llm)
    )
    run_generate.kv_bytes = (
        2 * cfg.llm.num_layers * batch * t_max * cfg.llm.num_kv_heads
        * cfg.llm.head_dim * jnp.dtype(kv_dtype).itemsize
    )
    return run_generate, max_new, prompt_len


def _measure_hbm_peak_gbps():
    """Achievable HBM WEIGHT-STREAMING bandwidth on THIS chip — the pattern
    decode is bound by: tall-skinny matmuls that read a fresh 512 MB bf16
    weight panel each (8 distinct panels chained per call = 4.3 GB of reads,
    ~2.5 GFLOP/GB so the MXU is ~2% busy). Elementwise donated-add probes
    were REJECTED as the ceiling: 1-D int8 measured 289 GB/s and 2-D bf16
    388 GB/s — both BELOW the 710 GB/s the real decode step sustains, i.e.
    XLA's elementwise path does not saturate the DMA engines the way
    multi-panel weight streaming does."""
    import jax, jax.numpy as jnp
    from functools import partial

    n, k = 16384, 8
    ws = [jnp.full((n, n), 1e-4, jnp.bfloat16) for _ in range(k)]
    x = jnp.ones((8, n), jnp.bfloat16)

    @partial(jax.jit, static_argnames=("reps",))
    def chain(x, ws, reps):
        acc = jnp.zeros((8, n), jnp.float32)
        for r in range(reps):
            for w in ws:
                acc = acc + (x @ w).astype(jnp.float32)
            # serialize reps through a data dependence: identical reps would
            # be CSE'd into one (first slope probe measured a nonsense
            # 15 TB/s), and VMEM can't hold 4.3 GB, so every rep re-streams
            # all k panels from HBM
            x = x + (acc[:, :1] * 1e-12).astype(jnp.bfloat16)
        return acc

    def run(reps):
        t0 = time.perf_counter()
        out = chain(x, ws, reps)
        float(out[0, 0])
        return time.perf_counter() - t0

    # two-point slope removes the fixed dispatch+fetch round-trip (~40 ms on
    # this tunnel — same order as the streamed bytes themselves, so a single
    # absolute timing under-reads by ~30%). reps (2, 8): the 26 GB delta
    # keeps the slope ~36 ms, well above the few-ms tunnel jitter that made
    # a (1, 4) spread swing 720 -> 1022 GB/s between runs
    run(2), run(8)  # compile both
    t2 = sorted(run(2) for _ in range(5))[2]
    t8 = sorted(run(8) for _ in range(5))[2]
    del ws
    return 6 * k * 2 * n * n / max(t8 - t2, 1e-9) / 1e9


def _roofline_keys(tok_s: float, weight_bytes: int, kv_bytes: float,
                   peak_gbps: float, tag: str = "") -> dict:
    """Effective HBM GB/s of a measured decode rate vs the chip's measured
    stream peak. bytes/step = every weight byte once + the full KV buffer
    (masked attention reads all t_max slots — static shapes)."""
    eff = tok_s * (weight_bytes + kv_bytes) / 1e9
    return {
        f"decode_effective_hbm_gbps{tag}": eff,
        f"decode_pct_of_hbm_peak{tag}": eff / peak_gbps if peak_gbps else None,
    }


def phase_decode():
    import jax, jax.numpy as jnp

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

    # roofline accounting (VERDICT r4 #4): effective HBM GB/s this decode
    # sustains, against the chip's measured stream peak — the artifact
    # tracks the bandwidth gap instead of narrating it
    peak = _measure_hbm_peak_gbps()
    _log(f"hbm stream peak {peak:.0f} GB/s")
    return {
        "decode_tokens_per_sec": tok_s[1],
        "decode_tokens_per_sec_min": tok_s[0],
        "decode_tokens_per_sec_max": tok_s[-1],
        "ttft_s_prefill640_int8": t_one,
        "full_loop_s": t_full,
        "prefill_tokens": prompt_len,
        "hbm_stream_peak_gbps": peak,
        **_roofline_keys(tok_s[1], run_generate.weight_bytes,
                         run_generate.kv_bytes, peak),
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
        if kv_dtype == "bfloat16":
            peak = _measure_hbm_peak_gbps()
            results.update(_roofline_keys(
                results[key], run_generate.weight_bytes,
                run_generate.kv_bytes, peak, tag="_int4",
            ))
    return results


def _eo_tokenize(text, table):
    """Deterministic LLaMA-like tokenization for bench workloads: digits one
    token each, punctuation single, words whole pieces with their leading
    space (SentencePiece's '▁word'). Prompt-lookup acceptance depends only on
    the token SEQUENCE's n-gram self-similarity, which this preserves for the
    EO response shapes that matter (bbox digit/punct streams, echoed class
    names); real ids are irrelevant on random weights. table maps piece->id
    persistently so prompt and response share ids."""
    import re

    ids = []
    for piece in re.findall(r" ?[A-Za-z_-]+| ?\d| ?[^A-Za-z\d ]", text):
        if piece not in table:
            table[piece] = 100 + len(table)
        ids.append(table[piece])
    return ids


# Realistic TEOChat response workloads (reference answer formats:
# eval/detection.py:197-211 bbox lists; classification answers echo a class
# named in the prompt). The ORACLE forces the greedy target to be this
# response (generation.oracle_ids) so the measured acceptance is the true
# prompt-lookup rate on that text with true verify-step costs.
_SPEC_WORKLOADS = {
    # change detection: fresh coordinates, structure self-repeats ("], [" and
    # shared digit prefixes across boxes) — the LOW-acceptance regime
    "detection": (
        "This is a sequence of two satellite images. Identify all buildings"
        " that were constructed between image 1 and image 2. Output the"
        " bounding box of each new building.",
        "[[306, 283, 338, 308], [312, 290, 341, 315], [118, 206, 141, 227],"
        " [123, 212, 147, 231], [305, 117, 331, 139]]",
    ),
    # region-based QA: the answer ECHOES the prompt's bboxes and names classes
    # listed in the prompt — the HIGH-acceptance regime
    "regionqa": (
        "Here are two satellite images. What is the damage level of the"
        " building at [306, 283, 338, 308] and of the building at"
        " [118, 206, 141, 227]? Choose from: no-damage, minor-damage,"
        " major-damage, destroyed. Answer with each bounding box followed"
        " by its damage level.",
        "The building at [306, 283, 338, 308] is classified as minor-damage."
        " The building at [118, 206, 141, 227] is classified as no-damage."
        " Overall, the area around [306, 283, 338, 308] shows minor-damage"
        " to several structures.",
    ),
}


def phase_decode_spec():
    """bs=1 greedy decode with prompt-lookup speculation (k drafted tokens
    verified per step). Decode is weight-bandwidth-bound, so a (k+1)-token
    verify step costs ~one plain step; tokens/s multiplies by the mean
    accepted+1 per step.

    PRIMARY numbers are the realistic-workload ones (oracle-forced TEOChat
    response shapes, measured acceptance — see _SPEC_WORKLOADS); the
    synthetic perfect-acceptance number and the forced-acceptance curve are
    kept as labeled upper-bound/physics references."""
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

    def run(n_new, keep_prob=None, row=None, oracle=None):
        p, pids, plen = (plan, prompt_ids, len(ids[0])) if row is None else row
        toks, n, steps, acc = gen_mod.generate_tokens_spec(
            llm, cfg.llm, embeds, p.seq_lens, p.attention_mask,
            p.position_ids, jnp.asarray(pids),
            jnp.asarray([plen], jnp.int32), stop,
            max_new_tokens=n_new, cache_len=prompt_len + n_new + spec_k + 1,
            spec_k=spec_k, draft_keep_prob=keep_prob, oracle_ids=oracle,
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

    # realistic workloads (PRIMARY): oracle-forced TEOChat response shapes —
    # acceptance is MEASURED, not forced; t_one (prefill+1) is the same
    # program cost for every workload, so it is reused as the baseline
    table = {}
    for wname, (ptext, rtext) in _SPEC_WORKLOADS.items():
        ptoks = _eo_tokenize(ptext, table)[:123]
        rtoks = _eo_tokenize(rtext, table)
        assert len(rtoks) >= max_new, (wname, len(rtoks))
        rtoks = rtoks[:max_new]
        wids = [1] + [IMAGE_TOKEN_INDEX, 7] * 2 + ptoks
        wplan = fusion_mod.build_fusion_plan(
            [wids], tokens_per_frame=256, pad_to=prompt_len
        )
        wpids = np.full((1, prompt_ids.shape[1]), -1, np.int32)
        wpids[0, : len(wids)] = wids
        oracle = np.full((1, max_new), -1, np.int32)
        oracle[0, : len(rtoks)] = rtoks
        row = (wplan, wpids, len(wids))
        orc = jnp.asarray(oracle)

        def full_w():
            stats[0] = run(max_new, row=row, oracle=orc)

        t_w = _timeit(full_w, iters=3, sync=sync)
        steps_w, acc_w = (int(x) for x in stats[0])
        results[f"decode_tokens_per_sec_spec_{wname}"] = (
            (max_new - 1) / (t_w - t_one)
        )
        results[f"spec_acceptance_{wname}"] = acc_w / max(steps_w * spec_k, 1)
        results[f"spec_tokens_per_step_{wname}"] = max_new / max(steps_w, 1)
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


def _measure_mxu_peak_tflops():
    """Achievable bf16 matmul rate on THIS chip: 4 chained 8192^3 matmuls
    (4.4 TFLOP/call, ~20x the tunnel dispatch floor). The MFU denominator —
    measured, not a spec sheet."""
    import jax, jax.numpy as jnp

    n = 8192
    x = jnp.ones((n, n), jnp.bfloat16)
    w = jnp.ones((n, n), jnp.bfloat16) * jnp.bfloat16(1e-4)

    @jax.jit
    def chain(x, w):
        for _ in range(4):
            x = x @ w
        return x

    holder = [None]

    def fn():
        holder[0] = chain(x, w)

    def sync():
        float(holder[0][0, 0])

    dt = _timeit(fn, iters=3, sync=sync)
    holder.clear()
    return 4 * 2 * n**3 / dt / 1e12


def _llm_matmul_params(cfg) -> int:
    """Backbone matmul params (per-token FLOPs = 2x this in a forward):
    q/k/v/o + gate/up/down per layer + the lm_head; embedding lookups move
    bytes, not MXU FLOPs."""
    h, i = cfg.hidden_size, cfg.intermediate_size
    kvh = cfg.num_kv_heads * cfg.head_dim
    per_layer = h * h * 2 + h * kvh * 2 + 3 * h * i
    return cfg.num_layers * per_layer + cfg.vocab_size * h


def _train_mfu(cfg, tok_s: float, seq: int, peak_tflops: float,
               full_finetune: bool) -> float:
    """MODEL-FLOPs utilization (standard MFU: useful FLOPs only — remat's
    recompute is not credited). Per token: fwd 2P; backward 4P when weight
    grads are computed (full finetune) or 2P when only activation grads flow
    through the frozen backbone (LoRA; the LoRA/projector wgrads are <1% of
    P). Attention adds 12*L*h*T_avg (score+context, fwd+bwd)."""
    p = _llm_matmul_params(cfg)
    factor = 6 if full_finetune else 4
    # attention backward (dQ/dK/dV through the scores) runs in FULL in both
    # modes — frozen weights don't shrink it — so the 12x term is
    # mode-independent (the weight-grad factor only scales the projections)
    att = 12 * cfg.num_layers * cfg.num_heads * cfg.head_dim * (seq / 2)
    return tok_s * (factor * p + att) / (peak_tflops * 1e12)


def _ttft_prefix_at(model, plen_tokens: int, max_len: int):
    """Hit/miss TTFT through the engine at one shared-prefix length.
    `model` is built once by the caller: a second 6.6 GB int8 backbone
    alive while the previous point's is still referenced OOMs the chip."""
    import time as _time

    from teochat_tpu.config import GenerationConfig
    from teochat_tpu.serve.engine import BatchEngine

    gen = GenerationConfig(max_new_tokens=1, temperature=0.0,
                           do_sample=False, stop_strings=())

    def prompt(base, i):
        return [1] + list(range(base, base + plen_tokens - 1)) + \
            [2000 + i, 2100 + i, 5 + i]

    # pool of 2: the curve uses one pooled entry; at plen=2048 every cache
    # row costs 1.3 GB next to the 6.6 GB weights, so rows are budgeted
    engine = BatchEngine(model, max_slots=2, max_len=max_len, chunk=4,
                         prefix_cache_slots=2, prefix_min_tokens=32).start()
    try:
        engine.submit(prompt(100, 0), None, gen)
        engine.submit(prompt(100, 1), None, gen)

        def timed(base, i):
            t0 = _time.perf_counter()
            engine.submit(prompt(base, i), None, gen)
            return _time.perf_counter() - t0

        # hits FIRST: the 2-slot pool means later miss stores LRU-evict the
        # shared entry; misses are order-insensitive (pool never matches)
        hit = sorted(timed(100, i) for i in (2, 3, 4))[1]
        miss = sorted(timed(b, 0) for b in (3000, 5000, 7000))[1]
        return miss, hit
    finally:
        engine.shutdown()


def phase_ttft_prefix_curve():
    """Hit/miss TTFT curve over shared-prefix length {128, 1024, 2048} (the
    512 point is the ttft_prefix phase): where does a pooled-prefix hit beat
    a plain prefill? With the FUSED hit program (one dispatch: row copy +
    suffix prefill + sample) a hit saves device prefill compute at every
    length, so the crossover sits at the dispatch floor; the engine's
    prefix_min_tokens (default 256) bypasses the pool below it."""
    import gc

    import jax
    from teochat_tpu.config import TEOChatConfig
    from teochat_tpu.models import teochat as teochat_mod
    from teochat_tpu.ops.quant import random_int8_llama

    cfg = TEOChatConfig()
    llm = random_int8_llama(jax.random.PRNGKey(0), cfg.llm)
    jax.block_until_ready(llm)
    model = teochat_mod.TEOChat(cfg, {"llm": llm})

    out = {}
    for plen, max_len in ((128, 512), (1024, 2048), (2048, 2560)):
        gc.collect()  # drop the previous point's engine cache rows
        try:
            miss, hit = _ttft_prefix_at(model, plen, max_len)
        except Exception as e:  # noqa: BLE001 — curve points are independent
            _log(f"prefix {plen} point failed: {type(e).__name__}: {e}")
            continue
        out[f"ttft_s_prefix_miss_{plen}tok"] = miss
        out[f"ttft_s_prefix_hit_{plen}tok"] = hit
        out[f"prefix_hit_ttft_speedup_{plen}"] = miss / hit
        _log(f"prefix {plen}: miss {miss:.3f} hit {hit:.3f}")
    if not out:
        raise RuntimeError("every prefix-curve point failed")
    return out


def phase_train():
    """LoRA train steps on the flagship recipe shapes (reference
    train_teochat.sh: 8-bit backbone + LoRA r=128/a=256 + trainable projector,
    bf16 tower, remat): tokens/sec/chip + MFU of supervised training, single
    step AND the reference launch config (gradient_accumulation_steps=8,
    train_teochat.sh:26 — optax.MultiSteps exactly as train/train.py:340).
    The reference never publishes a training-throughput number; this pins
    ours."""
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
    peak = _measure_mxu_peak_tflops()
    _log(f"mxu peak {peak:.0f} TFLOP/s")
    tok_s = batch * seq / dt
    results = {
        f"train_step_s_bs{batch}_seq640": dt,
        "train_tokens_per_sec": tok_s,
        "mxu_peak_tflops": peak,
        "train_mfu": _train_mfu(cfg.llm, tok_s, seq, peak,
                                full_finetune=False),
    }

    # reference launch config: grad-accum 8 (every 8th call applies Adam;
    # the other 7 only accumulate — slightly CHEAPER per call, so tokens/s
    # should match or beat the single-step number)
    import optax

    opt8 = optax.MultiSteps(optimizer, every_k_schedule=8)
    state8 = jax.jit(
        lambda p: trainer_mod.init_train_state(
            p, opt8, lora_mod.lora_trainable_filter
        ),
        donate_argnums=0,
    )(holder[0].params)
    holder[0] = None
    step8 = trainer_mod.make_train_step(
        cfg, opt8, trainable_filter=lora_mod.lora_trainable_filter,
        remat=True,
    )
    h8 = [state8]

    def fn8():
        for _ in range(8):
            h8[0], loss = step8(h8[0], plan, frames)
        fn8.loss = loss

    def sync8():
        float(fn8.loss)

    dt8 = _timeit(fn8, iters=1, sync=sync8)
    tok_s8 = 8 * batch * seq / dt8
    results["train_tokens_per_sec_accum8"] = tok_s8
    results["train_mfu_accum8"] = _train_mfu(
        cfg.llm, tok_s8, seq, peak, full_finetune=False
    )
    return results


def phase_train_bf16():
    """bf16 FULL finetune (every LLM + projector weight trains, tower frozen
    — the reference's lora_enable=False path, train.py:274-295): tokens/sec
    + MFU. SIZING HONESTY: 7B full-finetune needs ~2P(params)+2P(grads)+8P
    (fp32 Adam moments) = ~80 GB — it does not fit one 16 GB chip in ANY
    framework (the reference trains 7B with LoRA for the same reason), so
    this phase measures the largest standard shape that fits: a
    TinyLlama-1.1B-geometry backbone (h2048/i5632/L22/kv4) under the
    flagship tower, Adam moments in param dtype, remat."""
    import dataclasses

    import numpy as np
    import jax, jax.numpy as jnp
    from teochat_tpu.config import TEOChatConfig
    from teochat_tpu.constants import IMAGE_TOKEN_INDEX
    from teochat_tpu.models import fusion as fusion_mod, llama as llama_mod
    from teochat_tpu.models import vit as vit_mod
    from teochat_tpu.models.projector import init_projector
    from teochat_tpu.train import trainer as trainer_mod

    cfg = TEOChatConfig()
    cfg = dataclasses.replace(
        cfg,
        llm=dataclasses.replace(
            cfg.llm, hidden_size=2048, intermediate_size=5632, num_layers=22,
            num_heads=32, num_kv_heads=4,
        ),
        projector=dataclasses.replace(cfg.projector, hidden_size=2048),
    )
    params = {
        "vision": vit_mod.init_vit(jax.random.PRNGKey(0), cfg.vision,
                                   dtype=jnp.bfloat16),
        "projector": init_projector(jax.random.PRNGKey(1), cfg.projector,
                                    dtype=jnp.bfloat16),
        "llm": llama_mod.init_llama(jax.random.PRNGKey(2), cfg.llm,
                                    jnp.bfloat16),
    }
    jax.block_until_ready(params["llm"])

    batch, seq = 2, 640
    ids = [[1] + [IMAGE_TOKEN_INDEX, 7] * 2 + list(range(10, 10 + 123))] * batch
    plan = fusion_mod.build_fusion_plan(
        ids, tokens_per_frame=256, pad_to=seq,
        labels=[[-100] * 5 + r[5:] for r in ids],
    )
    frames = jnp.asarray(
        np.random.RandomState(0).randn(2 * batch, 3, 224, 224), jnp.bfloat16
    )

    optimizer = trainer_mod.make_optimizer(2e-5, total_steps=100)
    train_filter = lambda p: not p.startswith("vision")  # noqa: E731
    state = jax.jit(
        lambda p: trainer_mod.init_train_state(p, optimizer, train_filter),
        donate_argnums=0,
    )(params)
    step = trainer_mod.make_train_step(
        cfg, optimizer, trainable_filter=train_filter, remat=True
    )
    holder = [state]

    def fn():
        holder[0], loss = step(holder[0], plan, frames)
        fn.loss = loss

    def sync():
        float(fn.loss)

    dt = _timeit(fn, iters=3, sync=sync)
    peak = _measure_mxu_peak_tflops()
    tok_s = batch * seq / dt
    return {
        "train_tokens_per_sec_bf16full_1b": tok_s,
        "train_mfu_bf16full_1b": _train_mfu(cfg.llm, tok_s, seq, peak,
                                            full_finetune=True),
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


class _BenchTokenizer:
    """Minimal whitespace tokenizer for the eval-throughput phase (weights
    are random so ids only need to be stable and in-vocab)."""

    bos_token_id, eos_token_id = 1, 2

    def __init__(self):
        self.vocab, self.rev = {"<s>": 1, "</s>": 2}, {1: "<s>", 2: "</s>"}

    def __call__(self, text):
        import types

        ids = [1]
        for w in text.split():
            if w not in self.vocab:
                idx = 10 + len(self.vocab) % 30000
                self.vocab[w] = idx
                self.rev[idx] = w
            ids.append(self.vocab[w])
        return types.SimpleNamespace(input_ids=ids)

    def decode(self, ids):
        return " ".join(self.rev.get(int(i), ".") for i in ids)

    def batch_decode(self, ids_batch, skip_special_tokens=True):
        return [self.decode(i) for i in ids_batch]


def phase_eval():
    """Eval-harness throughput on flagship shapes: synthetic 2-frame
    xBD-style examples through eval/inference.py::run_inference_batched at
    batch_size 1 vs 8 — the batched loop + prefetch is the framework's
    structural win over the reference's one-example-at-a-time eval
    (reference hot loop: videollava/eval/inference.py:52-53,100)."""
    import numpy as np
    import jax, jax.numpy as jnp
    from teochat_tpu.config import TEOChatConfig
    from teochat_tpu.data.processing import ImageProcessor
    from teochat_tpu.eval.inference import run_inference_batched
    from teochat_tpu.models import teochat as teochat_mod, vit as vit_mod
    from teochat_tpu.models.projector import init_projector
    from teochat_tpu.ops.quant import random_int8_llama

    cfg = TEOChatConfig()
    params = {
        "vision": vit_mod.init_vit(jax.random.PRNGKey(0), cfg.vision,
                                   dtype=jnp.bfloat16),
        "projector": init_projector(jax.random.PRNGKey(1), cfg.projector,
                                    dtype=jnp.bfloat16),
        "llm": random_int8_llama(jax.random.PRNGKey(2), cfg.llm),
    }
    jax.block_until_ready(params["llm"])
    tok = _BenchTokenizer()
    model = teochat_mod.TEOChat(cfg, params, tokenizer=tok)
    processor = ImageProcessor()

    rng = np.random.RandomState(0)
    n_ex = 16
    dataset = [
        {
            "conversations": [
                {"value": "These are two satellite images of the same area"
                          " before and after a disaster. <video> Is the"
                          f" building at [30{i % 10}, 283, 338, 308] damaged?"},
                {"value": "yes"},
            ],
            "video": [rng.randint(0, 256, (512, 640, 3), np.uint8)
                      for _ in range(2)],
            "timestamp": ["2020-01-01", "2020-03-01"],
            "task": "rqa",
        }
        for i in range(n_ex)
    ]

    results = {}
    for bs in (8, 1):
        def run():
            run_inference_batched(
                dataset, model, tok, processor,
                prompt_strategy="interleave", chronological_prefix=True,
                conv_mode="v1", temperature=0.0, max_new_tokens=16,
                batch_size=bs, progress=False,
            )

        dt = _timeit(run, iters=1)
        results[f"eval_examples_per_sec_bs{bs}"] = n_ex / dt
    results["eval_bs8_vs_bs1"] = (
        results["eval_examples_per_sec_bs8"] / results["eval_examples_per_sec_bs1"]
    )
    return results


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
    "encode_pipeline": phase_encode_pipeline,
    "decode": phase_decode,
    "decode_bs8": phase_decode_bs8,
    "decode_bs16": phase_decode_bs16,
    "decode_bs32": phase_decode_bs32,
    "decode_int4": phase_decode_int4,
    "decode_spec": phase_decode_spec,
    "ttft_int8act": phase_ttft_int8act,
    "ttft_turn2": phase_ttft_turn2,
    "ttft_prefix": phase_ttft_prefix,
    "ttft_prefix_curve": phase_ttft_prefix_curve,
    "serve": phase_serve,
    "train": phase_train,
    "train_bf16": phase_train_bf16,
    "eval": phase_eval,
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
    "decode_bs32", "decode_int4", "ttft_prefix", "serve", "train",
    "decode_spec", "ttft_int8act", "ttft_turn2", "encode_pipeline",
    "train_bf16", "eval", "ttft_prefix_curve",
)

# Conservative warm-cache wall-clock estimates per phase (seconds), assuming
# the grouped-child runner (jax import + tunnel backend init paid ONCE per
# child, not per phase). Overwritten by the measured timings in the sidecar
# from the previous run, when present.
PHASE_EST_S = {
    "decode": 60, "encode": 40, "e2e": 40, "serve": 80, "train": 120,
    "decode_int4": 90, "ttft_int8act": 30, "ttft_turn2": 30,
    "decode_spec": 90, "decode_bs8": 40, "decode_bs16": 50,
    "decode_bs32": 60, "preprocess": 15, "ttft_prefix": 60,
    "ttft_prefix_curve": 180, "encode_pipeline": 120, "train_bf16": 90,
    "eval": 150,
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
            # floor 240 s (overridable): warm estimates don't cover a
            # .jax_cache miss, and uncached 7B compiles through the tunnel
            # take minutes — killing the child mid-compile both fails the
            # phase AND wedges the single-client tunnel for the rest
            floor = float(os.environ.get("BENCH_PHASE_MIN_BUDGET", "240"))
            cap = min(max(2.5 * est, floor), remaining_wall)
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
    ("hbm_stream_peak_gbps", "hbm_stream_peak_gbps", "decode", 0),
    ("decode_effective_hbm_gbps", "decode_effective_hbm_gbps", "decode", 0),
    ("decode_pct_of_hbm_peak", "decode_pct_of_hbm_peak", "decode", 3),
    ("decode_effective_hbm_gbps_int4", "decode_effective_hbm_gbps_int4", "decode_int4", 0),
    ("decode_pct_of_hbm_peak_int4", "decode_pct_of_hbm_peak_int4", "decode_int4", 3),
    ("decode_tokens_per_sec_bs8", "decode_tokens_per_sec_bs8", "decode_bs8", 1),
    ("decode_tokens_per_sec_bs16", "decode_tokens_per_sec_bs16", "decode_bs16", 1),
    ("decode_tokens_per_sec_bs32_fp8kv", "decode_tokens_per_sec_bs32_fp8kv", "decode_bs32", 1),
    ("decode_tokens_per_sec_int4_bs1", "decode_tokens_per_sec_int4", "decode_int4", 1),
    ("decode_tokens_per_sec_int4_fp8kv_bs1", "decode_tokens_per_sec_int4_fp8kv", "decode_int4", 1),
    ("decode_tokens_per_sec_spec_detection", "decode_tokens_per_sec_spec_detection", "decode_spec", 1),
    ("spec_acceptance_detection", "spec_acceptance_detection", "decode_spec", 3),
    ("spec_tokens_per_step_detection", "spec_tokens_per_step_detection", "decode_spec", 2),
    ("decode_tokens_per_sec_spec_regionqa", "decode_tokens_per_sec_spec_regionqa", "decode_spec", 1),
    ("spec_acceptance_regionqa", "spec_acceptance_regionqa", "decode_spec", 3),
    ("spec_tokens_per_step_regionqa", "spec_tokens_per_step_regionqa", "decode_spec", 2),
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
    ("train_mfu_lora_r128_int8", "train_mfu", "train", 3),
    ("train_tokens_per_sec_accum8", "train_tokens_per_sec_accum8", "train", 1),
    ("train_mfu_accum8", "train_mfu_accum8", "train", 3),
    ("mxu_peak_tflops", "mxu_peak_tflops", "train", 0),
    ("train_tokens_per_sec_bf16full_1b", "train_tokens_per_sec_bf16full_1b", "train_bf16", 1),
    ("train_mfu_bf16full_1b", "train_mfu_bf16full_1b", "train_bf16", 3),
    ("encode_sustained_fps_hostpre", "encode_sustained_fps_hostpre", "encode_pipeline", 1),
    ("encode_sustained_fps_devicepre", "encode_sustained_fps_devicepre", "encode_pipeline", 1),
    ("encode_sustained_fps_linkopt", "encode_sustained_fps_linkopt", "encode_pipeline", 1),
    ("encode_frames_per_sec_deviceonly", "encode_frames_per_sec_deviceonly", "encode_pipeline", 1),
    ("h2d_mbps", "h2d_mbps", "encode_pipeline", 1),
    ("encode_sustained_vs_deviceonly", "encode_sustained_vs_deviceonly", "encode_pipeline", 2),
    ("eval_examples_per_sec_bs8", "eval_examples_per_sec_bs8", "eval", 2),
    ("eval_examples_per_sec_bs1", "eval_examples_per_sec_bs1", "eval", 2),
    ("eval_bs8_vs_bs1", "eval_bs8_vs_bs1", "eval", 2),
    ("ttft_s_turn2_suffix64_over640", "ttft_s_turn2_suffix64_over640", "ttft_turn2", 4),
    ("serve_aggregate_tokens_per_sec_8streams", "serve_aggregate_tokens_per_sec_8streams", "serve", 1),
    ("preprocess_native_frames_per_sec_host", "preprocess_native_frames_per_sec", "preprocess", 1),
    ("preprocess_pil_frames_per_sec_host", "preprocess_pil_frames_per_sec", "preprocess", 1),
    ("ttft_s_prefix_miss_515tok", "ttft_s_prefix_miss_515tok", "ttft_prefix", 4),
    ("ttft_s_prefix_hit_515tok", "ttft_s_prefix_hit_515tok", "ttft_prefix", 4),
    ("prefix_hit_ttft_speedup", "prefix_hit_ttft_speedup", "ttft_prefix", 2),
    ("prefix_hit_ttft_speedup_128", "prefix_hit_ttft_speedup_128", "ttft_prefix_curve", 2),
    ("prefix_hit_ttft_speedup_1024", "prefix_hit_ttft_speedup_1024", "ttft_prefix_curve", 2),
    ("prefix_hit_ttft_speedup_2048", "prefix_hit_ttft_speedup_2048", "ttft_prefix_curve", 2),
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

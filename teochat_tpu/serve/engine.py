"""Continuous-batching serving engine: per-request KV slots over one cache.

The reference serves one request at a time through gradio
(teochat_demo.py:466-546). Decode on TPU is bandwidth-bound — every step
re-reads all weights — so concurrent requests are nearly free until KV traffic
dominates; this engine multiplexes up to `max_slots` requests onto ONE
persistent KV cache:

- each request prefills into its own cache row (`cache_row_offset` dus,
  models/llama.py) while other rows keep decoding between chunks;
- decode runs in jitted CHUNKS of `chunk` tokens over all slots (measured on
  the v5e tunnel: each chunk CALL costs ~39 ms fixed dispatch overhead plus
  ~13.4 ms/step of device time at bs=8, so per-token host scheduling would
  cap the engine around 70 tok/s; bigger chunks amortize the fixed cost at
  the cost of admission latency and up to chunk-1 wasted steps after a row
  finishes. r4 sweep, 8 streams x 64 new tokens, aggregate tok/s:
  chunk 8: 336, 16: 334, 64: 349, 128: 238, with chunk=32 repeats
  {368, 308, 299} — cross-process tunnel variance swamps the chunk choice
  in the 8..64 range; the default stays 8 for admission latency);
- admission/completion happens on the host at chunk boundaries: finished rows
  free their slot, queued requests prefill into free slots;
- greedy rows reproduce the single-request outputs EXACTLY (same kernels,
  same masks) — batching changes scheduling, not numerics.

The cache buffer is donated through both the prefill and chunk programs, so
it is updated in place (never copied) across the engine's lifetime.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from functools import partial
from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from teochat_tpu.config import GenerationConfig, TEOChatConfig
from teochat_tpu.models import fusion as fusion_mod
from teochat_tpu.models import llama as llama_mod
from teochat_tpu.models import teochat as teochat_mod
from teochat_tpu.models.generation import backend_embed, backend_forward


# Scheduler state lives ON DEVICE and is donated through every program:
# per-chunk host->device uploads of the small control arrays (positions,
# active, temperature, ...) each cost a dispatch round-trip on the TPU
# tunnel, and round 2 measured ~39 ms of fixed host cost per chunk call.
# The host only ever downloads the emitted tokens; control flow decisions it
# owns (stop strings, max_new_tokens) push back via one tiny _deactivate_slot
# program per request lifetime.
def _init_engine_state(max_slots: int, max_len: int, rng) -> dict:
    return {
        "last_tokens": jnp.zeros((max_slots,), jnp.int32),
        "positions": jnp.zeros((max_slots,), jnp.int32),
        "active": jnp.zeros((max_slots,), bool),
        "temperature": jnp.zeros((max_slots,), jnp.float32),
        "do_sample": jnp.zeros((max_slots,), bool),
        # per-slot token history for prompt-lookup drafting (spec mode)
        "hist": jnp.full((max_slots, max_len), -1, jnp.int32),
        "hist_len": jnp.zeros((max_slots,), jnp.int32),
        # per-slot multi-LoRA adapter index (-1 = base model); consumed by
        # _engine_route when the params carry adapter-stacked leaves
        "adapter": jnp.full((max_slots,), -1, jnp.int32),
        "rng": rng,
    }


def _engine_route(params, adapter_ids):
    """[rows] adapter ids -> [rows, A] route, or None for single-LoRA/plain
    params (A is a static shape property, so this branches at trace time)."""
    from teochat_tpu.train.lora import adapter_route, num_stacked_adapters

    n = num_stacked_adapters(params)
    return adapter_route(adapter_ids, n) if n else None


@partial(jax.jit, donate_argnums=(0,))
def _deactivate_slot(state, slot):
    """Host-decided request completion (stop string / max_new_tokens)."""
    return {
        **state,
        "active": state["active"].at[slot].set(False),
        "temperature": state["temperature"].at[slot].set(0.0),
        "do_sample": state["do_sample"].at[slot].set(False),
    }


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1, 2))
def _prefill_slot(params, cache, state, cfg, plan, vision_tokens, slot,
                  temperature, do_sample, hist_row, hist_n, adapter):
    """Prefill one request into cache row `slot`, sample its first token, and
    activate the slot in the device-resident scheduler state.

    ONE program covers token embedding + vision fusion + decoder prefill +
    sampling + every per-slot state write (each separate dispatch costs
    ~2-5 ms through the TPU tunnel, paid per admission). Returns
    (first sampled token [1], cache, state). The dus write touches only rows
    [slot, slot+1); other rows' K/V are untouched. Right-padded prompts:
    causal attention over the fresh K/V keeps pad keys invisible to valid
    queries; garbage pad outputs are discarded by last_index.
    """
    embeds = teochat_mod.fuse_embeds(params, plan, vision_tokens)
    logits, cache = backend_forward(
        params, cfg, embeds,
        position_ids=plan.position_ids,
        cache=cache,
        write_slots=plan.position_ids,  # unused for contiguous prefill writes
        kv_mask=None,
        logits_mode="last",
        last_index=plan.seq_lens - 1,
        cache_row_offset=slot,
        adapter_route=_engine_route(params, adapter),
    )
    step_rng, rng = jax.random.split(state["rng"])
    tok = _sample_rows(logits[:, 0], step_rng, temperature, do_sample)
    # draft history: prompt ids then the first token (spec mode reads it;
    # writing it unconditionally costs nothing extra inside this program)
    hist = state["hist"].at[slot].set(hist_row)
    hist = hist.at[slot, hist_n].set(tok[0])
    state = {
        "last_tokens": state["last_tokens"].at[slot].set(tok[0]),
        "positions": state["positions"].at[slot].set(plan.seq_lens[0]),
        "active": state["active"].at[slot].set(True),
        "temperature": state["temperature"].at[slot].set(temperature[0]),
        "do_sample": state["do_sample"].at[slot].set(do_sample[0]),
        "hist": hist,
        "hist_len": state["hist_len"].at[slot].set(hist_n + 1),
        "adapter": state["adapter"].at[slot].set(adapter[0]),
        "rng": rng,
    }
    return tok, cache, state


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1,))
def _prefill_chunk_write(params, cache, cfg, emb, pos_ids, slot, adapter):
    """Chunked prefill, non-final chunk: commit this chunk's K/V into cache
    row `slot` at absolute slots pos_ids (contiguous panel write at
    prefill_start), attending the row's committed cache (earlier chunks) —
    no logits, no state. Bounds how long one long-prompt admission can stall
    running decodes: the engine interleaves these with decode chunks."""
    _, cache = backend_forward(
        params, cfg, emb, position_ids=pos_ids, cache=cache,
        write_slots=pos_ids, kv_mask=None, logits_mode="none",
        cache_row_offset=slot, prefill_start=pos_ids[0, 0], attend_cache=True,
        adapter_route=_engine_route(params, adapter),
    )
    return cache


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(1, 2))
def _prefill_slot_tail(params, cache, state, cfg, emb, pos_ids, seq_len,
                       last_index, slot, temperature, do_sample, hist_row,
                       hist_n, adapter):
    """Chunked prefill, final chunk: commit K/V, take the prompt's last-token
    logits (masked attention over all committed chunks), sample the first
    token, and activate the slot — the chunked twin of _prefill_slot."""
    logits, cache = backend_forward(
        params, cfg, emb, position_ids=pos_ids, cache=cache,
        write_slots=pos_ids, kv_mask=None, logits_mode="last",
        last_index=last_index, cache_row_offset=slot,
        prefill_start=pos_ids[0, 0], attend_cache=True,
        adapter_route=_engine_route(params, adapter),
    )
    step_rng, rng = jax.random.split(state["rng"])
    tok = _sample_rows(logits[:, 0], step_rng, temperature, do_sample)
    hist = state["hist"].at[slot].set(hist_row)
    hist = hist.at[slot, hist_n].set(tok[0])
    state = {
        "last_tokens": state["last_tokens"].at[slot].set(tok[0]),
        "positions": state["positions"].at[slot].set(seq_len),
        "active": state["active"].at[slot].set(True),
        "temperature": state["temperature"].at[slot].set(temperature[0]),
        "do_sample": state["do_sample"].at[slot].set(do_sample[0]),
        "hist": hist,
        "hist_len": state["hist_len"].at[slot].set(hist_n + 1),
        "adapter": state["adapter"].at[slot].set(adapter[0]),
        "rng": rng,
    }
    return tok, cache, state


_fuse_embeds = jax.jit(teochat_mod.fuse_embeds)


def _copy_row(cache, src_row, dst_row, length):
    """Copy KV slots [0, length) of cache row src_row into row dst_row.
    Trace-time body shared by the standalone `_copy_cache_row` program (pool
    stores) and the fused hit-path prefill `_prefill_slot_from_prefix`.
    Copying past the prefix's valid slots is harmless (see BatchEngine
    prefix-cache notes: every garbage slot is overwritten by the suffix panel
    or by a decode write before anything attends it)."""
    zero = jnp.asarray(0, jnp.int32)
    starts = (zero, src_row, zero, zero, zero)
    sizes_k = (cache.k.shape[0], 1, length, cache.k.shape[3], cache.k.shape[4])
    k = jax.lax.dynamic_slice(cache.k, starts, sizes_k)
    v = jax.lax.dynamic_slice(cache.v, starts, sizes_k)
    dst = (zero, dst_row, zero, zero, zero)
    return llama_mod.KVCache(
        k=jax.lax.dynamic_update_slice(cache.k, k, dst),
        v=jax.lax.dynamic_update_slice(cache.v, v, dst),
    )


@partial(jax.jit, static_argnames=("length",), donate_argnums=(0,))
def _copy_cache_row(cache, src_row, dst_row, length):
    """Standalone row copy (donated, in place): pool stores and the chunked
    hit path. `length` is bucketed by the caller so compiles stay bounded."""
    return _copy_row(cache, src_row, dst_row, length)


@partial(jax.jit, static_argnames=("cfg", "w", "copy_len"),
         donate_argnums=(1, 2))
def _prefill_slot_from_prefix(params, cache, state, cfg, plan, vision_tokens,
                              src_row, slot, plen, fused_len, w, copy_len,
                              temperature, do_sample, hist_row, hist_n,
                              adapter):
    """Prefix-cache hit, fused into ONE program: copy the pooled prefix row's
    KV [0, copy_len) into cache row `slot`, fuse embeddings, prefill ONLY the
    `w`-token suffix window starting at `plen` (masked attention over the
    seeded prefix KV), sample the first token, and activate the slot.

    Fusing matters for the hit to WIN: each program dispatch costs ~39 ms of
    fixed tunnel/host overhead (see module docstring), and the unfused hit
    path (fuse_embeds + row copy + suffix tail = 3 dispatches) cost as much
    as the miss's single monolithic prefill at a 512-token prefix
    (BENCH_r04: hit 0.206 s vs miss 0.198 s). One dispatch + ~2 ms of device
    copy + a 32-token suffix prefill beats a 768-token full prefill on both
    device time AND dispatch count. `plen` is traced (no recompile per
    distinct pooled length); `w`/`copy_len` are host-bucketed statics."""
    cache = _copy_row(cache, src_row, slot, copy_len)
    embeds = teochat_mod.fuse_embeds(params, plan, vision_tokens)
    # pad by w so the dynamic window [plen, plen+w) is always in bounds
    # (plen < fused_len <= pad_to); the pad tail is positionally garbage but
    # its K/V land past fused_len where decode overwrites before attending
    embeds = jnp.pad(embeds, ((0, 0), (0, w), (0, 0)))
    emb = jax.lax.dynamic_slice(
        embeds, (jnp.asarray(0, jnp.int32), plen, jnp.asarray(0, jnp.int32)),
        (embeds.shape[0], w, embeds.shape[2]),
    )
    pos = plen + jnp.arange(w, dtype=jnp.int32)[None, :]
    logits, cache = backend_forward(
        params, cfg, emb, position_ids=pos, cache=cache,
        write_slots=pos, kv_mask=None, logits_mode="last",
        last_index=(fused_len - 1 - plen)[None], cache_row_offset=slot,
        prefill_start=plen, attend_cache=True,
        adapter_route=_engine_route(params, adapter),
    )
    step_rng, rng = jax.random.split(state["rng"])
    tok = _sample_rows(logits[:, 0], step_rng, temperature, do_sample)
    hist = state["hist"].at[slot].set(hist_row)
    hist = hist.at[slot, hist_n].set(tok[0])
    state = {
        "last_tokens": state["last_tokens"].at[slot].set(tok[0]),
        "positions": state["positions"].at[slot].set(fused_len),
        "active": state["active"].at[slot].set(True),
        "temperature": state["temperature"].at[slot].set(temperature[0]),
        "do_sample": state["do_sample"].at[slot].set(do_sample[0]),
        "hist": hist,
        "hist_len": state["hist_len"].at[slot].set(hist_n + 1),
        "adapter": state["adapter"].at[slot].set(adapter[0]),
        "rng": rng,
    }
    return tok, cache, state


# Suffix-prefill panel widths (prefix-cache hits prefill only [plen, end)):
# bucketing the width bounds jit compiles; smaller low buckets than
# teochat.SEQ_BUCKETS because hit suffixes are often a few dozen tokens.
SUFFIX_BUCKETS = (32, 64, 128, 256, 512, 1024, 2048, 4352)


def _sample_rows(logits, rng, temperature, do_sample):
    """Per-row greedy/temperature sampling. temperature/do_sample: [B] arrays."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    temp = jnp.maximum(temperature, 1e-6)[:, None]
    sampled = jax.random.categorical(rng, logits / temp, axis=-1).astype(jnp.int32)
    use_sample = do_sample & (temperature > 0.0)
    return jnp.where(use_sample, sampled, greedy)


def _sample_rows_excluding(logits, rng, temperature, excluded):
    """Per-row-temperature categorical with one token's mass removed — the
    residual draw of speculative rejection sampling (point-mass proposal).
    logits [B, V]; temperature [B]; excluded [B] token id or -1 (plain)."""
    v = logits.shape[-1]
    lf = logits / jnp.maximum(temperature, 1e-6)[:, None]
    excl = (
        (jnp.arange(v)[None, :] == excluded[:, None]) & (excluded >= 0)[:, None]
    )
    lf = jnp.where(excl, -jnp.inf, lf)
    return jax.random.categorical(rng, lf, axis=-1).astype(jnp.int32)


def _spec_emissions(blk_logits, targets, drafts, greedy_row, temperature,
                    rng):
    """Per-slot emissions + acceptance for one speculative iteration.

    blk_logits [B, k+1, V] target logits for the block [tok, d_1..d_k];
    targets = argmax(blk_logits); drafts [B, k]; greedy_row [B].
    Greedy rows: draft j accepted iff it equals the argmax target; emission
    slot j is targets[:, j]. Sampling rows: draft j accepted with probability
    P_{j}(d_{j+1}) (its target distribution, per-row temperature); an
    accepted slot emits the draft, the first rejected slot emits the RESIDUAL
    sample (draft's mass removed, renormalized), and slot k (all accepted)
    emits a plain sample from P_k — every emitted token is distributed
    exactly as plain per-token sampling (models/generation.py exactness
    argument; no top_p here — the engine's plain path has none either).
    Returns (match [B, k] acceptance per draft, emits [B, k+1]).
    """
    b, k1, _ = blk_logits.shape
    k = k1 - 1
    keys = jax.random.split(rng, k + 2)
    p = jax.nn.softmax(
        blk_logits[:, :k] / jnp.maximum(temperature, 1e-6)[:, None, None],
        axis=-1,
    )
    pd = jnp.take_along_axis(p, drafts[..., None], axis=-1)[..., 0]  # [B, k]
    u = jax.random.uniform(keys[0], pd.shape)
    match = jnp.where(greedy_row[:, None], drafts == targets[:, :k], u < pd)
    emits = []
    for j in range(k + 1):
        if j < k:
            res = _sample_rows_excluding(
                blk_logits[:, j], keys[j + 1], temperature, drafts[:, j]
            )
            emit_s = jnp.where(match[:, j], drafts[:, j], res)
        else:
            emit_s = _sample_rows_excluding(
                blk_logits[:, k], keys[k + 1], temperature,
                jnp.full((b,), -1, jnp.int32),
            )
        emits.append(jnp.where(greedy_row, targets[:, j], emit_s))
    return match, jnp.stack(emits, axis=1)


@partial(jax.jit, static_argnames=("cfg", "chunk", "eos_id", "pad_id"),
         donate_argnums=(1, 2))
def _decode_chunk(params, cache, state, cfg, chunk, eos_id, pad_id):
    """Run `chunk` decode steps over all slots; returns (tokens [B, chunk],
    cache, state). All scheduler inputs live in the donated device `state` —
    the host uploads NOTHING per chunk and downloads only the tokens.

    Inactive rows write their K/V to the trash slot (t_max-1) and emit pad_id.
    A row turning EOS inside the chunk goes inactive immediately (its later
    in-chunk steps are wasted but harmless). String-level stopping happens on
    the host between chunks.
    """
    temperature, do_sample = state["temperature"], state["do_sample"]
    b = state["last_tokens"].shape[0]
    t_max = cache.max_len
    trash = t_max - 1
    route = _engine_route(params, state["adapter"])
    rows = jnp.arange(b)
    h_max = state["hist"].shape[1]

    def step(carry, _):
        tok, pos, act, cache, rng, hist, hl = carry
        step_rng, rng = jax.random.split(rng)
        emb = backend_embed(params, cfg, tok[:, None])
        write = jnp.where(act, pos, trash)[:, None]
        kv_mask = jax.lax.broadcasted_iota(jnp.int32, (b, t_max), 1) <= pos[:, None]
        logits, cache = backend_forward(
            params, cfg, emb, position_ids=pos[:, None], cache=cache,
            write_slots=write, kv_mask=kv_mask, logits_mode="last",
            adapter_route=route,
        )
        nxt = _sample_rows(logits[:, -1], step_rng, temperature, do_sample)
        nxt = jnp.where(act, nxt, pad_id)
        # keep the draft history fresh even in plain chunks, so an
        # adaptive-spec engine's probe chunk drafts from REAL context (two
        # scatters per step — noise next to the 7B forward)
        h_idx = jnp.minimum(hl, h_max - 1)
        hist = hist.at[rows, h_idx].set(jnp.where(act, nxt, hist[rows, h_idx]))
        hl = hl + act.astype(jnp.int32)
        pos = pos + act.astype(jnp.int32)
        act = act & (nxt != eos_id)
        return (nxt, pos, act, cache, rng, hist, hl), nxt

    (tok, positions, active, cache, rng, hist, hl), toks = jax.lax.scan(
        step,
        (state["last_tokens"], state["positions"], state["active"], cache,
         state["rng"], state["hist"], state["hist_len"]),
        None, length=chunk,
    )
    state = {**state, "last_tokens": tok, "positions": positions,
             "active": active, "rng": rng, "hist": hist, "hist_len": hl}
    return toks.T, cache, state


@partial(jax.jit, static_argnames=("cfg", "chunk", "spec_k", "eos_id", "pad_id"),
         donate_argnums=(1, 2))
def _decode_chunk_spec(params, cache, state, cfg, chunk, spec_k, eos_id, pad_id):
    """Speculative decode chunk: `chunk` iterations, each verifying `spec_k`
    prompt-lookup drafts in one (spec_k+1)-token forward per row.

    Greedy rows emit 1..spec_k+1 tokens per iteration (token-identical to the
    plain chunk); sampling rows ALSO emit 1..spec_k+1 via exact speculative
    sampling (accept draft d with probability P(d) at the row's temperature,
    residual sample on rejection — distribution-identical to plain sampling,
    see _spec_emissions). Returns (tokens [B, chunk, spec_k+1],
    counts [B, chunk], cache, state).

    state["hist"]/["hist_len"]: per-slot token history (prompt text ids then
    generated) used for bigram draft lookup — device state, rewritten by the
    slot's prefill program on admission.
    """
    from teochat_tpu.models.generation import _draft_lookup

    temperature, do_sample = state["temperature"], state["do_sample"]
    b = state["last_tokens"].shape[0]
    t_max = cache.max_len
    trash = t_max - 1
    k = spec_k
    rows = jnp.arange(b)
    h_max = state["hist"].shape[1]
    route = _engine_route(params, state["adapter"])

    def step(carry, _):
        tok, pos, act, cache, rng, hist, hist_len = carry
        step_rng, rng = jax.random.split(rng)
        # don't run past the cache (trash slot excluded)
        act = act & (pos + k + 1 < t_max)
        drafts = _draft_lookup(hist, hist_len, k)  # [B, k]
        blk = jnp.concatenate([tok[:, None], drafts], axis=1)  # [B, k+1]
        blk_pos = pos[:, None] + jnp.arange(k + 1)[None, :]
        write = jnp.where(act[:, None], jnp.minimum(blk_pos, trash - 1), trash)
        kv_mask = (
            jax.lax.broadcasted_iota(jnp.int32, (b, t_max), 1)
            <= (pos + k)[:, None]
        )
        emb = backend_embed(params, cfg, blk)
        blk_logits, cache = backend_forward(
            params, cfg, emb, position_ids=blk_pos, cache=cache,
            write_slots=write, kv_mask=kv_mask, logits_mode="all",
            spec_verify=True, adapter_route=route,
        )  # [B, k+1, V]
        targets = jnp.argmax(blk_logits, axis=-1).astype(jnp.int32)
        greedy_row = ~(do_sample & (temperature > 0.0))
        match, emissions = _spec_emissions(
            blk_logits, targets, drafts, greedy_row, temperature, step_rng
        )
        acc = jnp.cumprod(match.astype(jnp.int32), axis=1).astype(bool)

        toks_out = jnp.full((b, k + 1), pad_id, jnp.int32)
        counts = jnp.zeros((b,), jnp.int32)
        stopped = jnp.zeros((b,), bool)  # row hit EOS inside this block
        new_tok = tok
        for j in range(k + 1):
            if j == 0:
                emit = emissions[:, 0]
                valid = act
            else:
                # emission chain: cumulative acceptance, cut at an EOS
                valid = act & acc[:, j - 1] & ~stopped
                emit = emissions[:, j]
            emit = jnp.where(valid, emit, pad_id)
            toks_out = toks_out.at[:, j].set(emit)
            counts = counts + valid.astype(jnp.int32)
            new_tok = jnp.where(valid, emit, new_tok)
            h_idx = jnp.minimum(hist_len, h_max - 1)
            old_h = hist[rows, h_idx]
            hist = hist.at[rows, h_idx].set(jnp.where(valid, emit, old_h))
            hist_len = hist_len + valid.astype(jnp.int32)
            stopped = stopped | (valid & (emit == eos_id))
        pos = pos + counts
        # only EOS (and the capacity guard above) deactivates a row — a
        # rejected draft just ends this iteration's emission chain
        act = act & ~stopped
        return (new_tok, pos, act, cache, rng, hist, hist_len), (toks_out, counts)

    (tok, positions, active, cache, rng, hist, hist_len), (toks, counts) = \
        jax.lax.scan(
            step,
            (state["last_tokens"], state["positions"], state["active"], cache,
             state["rng"], state["hist"], state["hist_len"]),
            None, length=chunk,
        )
    state = {**state, "last_tokens": tok, "positions": positions,
             "active": active, "rng": rng, "hist": hist, "hist_len": hist_len}
    # scan stacks along axis 0: [chunk, B, ...] -> [B, chunk, ...]
    return jnp.swapaxes(toks, 0, 1), counts.T, cache, state


@dataclasses.dataclass
class _Request:
    input_ids: List[int]
    pixel_values: Optional[np.ndarray]
    gen: GenerationConfig
    stop_strings: Sequence[str]
    event: threading.Event
    tokens: List[int] = dataclasses.field(default_factory=list)
    error: Optional[str] = None
    slot: int = -1
    remaining: int = 0
    # streaming: new tokens are pushed per chunk; None terminates the stream
    stream_q: Optional["queue.Queue"] = None
    _streamed: int = 0
    # chunked-prefill progress (None once fully prefilled / for short prompts)
    pf: Optional[dict] = None
    # prefix-cache hit bookkeeping: (matched pool entry, lcp tokens reused);
    # consulted by _maybe_store_prefix to decide replace/store/skip
    prefix_hit: Optional[tuple] = None
    # multi-LoRA adapter index (-1 = base model); routed per slot on device
    adapter: int = -1

    def _push_stream(self, final: bool = False):
        if self.stream_q is None:
            return
        fresh = self.tokens[self._streamed:]
        if fresh:
            self.stream_q.put(fresh)
            self._streamed = len(self.tokens)
        if final:
            self.stream_q.put(None)


class BatchEngine:
    """Continuous-batching scheduler over a TEOChat model.

    submit() is thread-safe and blocks until the request completes (the
    HTTP handler calls it per request; concurrency comes from many handler
    threads sharing the engine).
    """

    def __init__(self, model: teochat_mod.TEOChat, *, max_slots: int = 4,
                 max_len: int = 2048, chunk: int = 8, kv_dtype=None,
                 speculative_k: int = 0,
                 adaptive_spec: bool = True,
                 spec_disable_below: float = 1.3,
                 spec_probe_every: int = 32,
                 prefill_chunk: Optional[int] = None,
                 prefix_cache_slots: int = 0,
                 prefix_min_tokens: int = 256):
        self.model = model
        self.cfg: TEOChatConfig = model.cfg
        self.max_slots = max_slots
        self.max_len = max_len
        self.chunk = chunk
        self.speculative_k = speculative_k
        # Adaptive speculation: prompt-lookup drafting only pays when outputs
        # echo their context (measured on flagship shapes, bench decode_spec:
        # region-QA echo 2.3x at 19.5% acceptance; fresh-coordinate detection
        # 0.94x at 1% — drafting LOSES there). The engine tracks an EMA of
        # tokens emitted per verify iteration across spec chunks; below
        # `spec_disable_below` it falls back to PLAIN decode chunks (same
        # greedy tokens — speculation never changes outputs) and re-probes
        # with one spec chunk every `spec_probe_every` chunks in case the
        # workload turned echo-friendly (e.g. a multi-turn session quoting
        # itself).
        self.adaptive_spec = adaptive_spec
        self.spec_disable_below = spec_disable_below
        self.spec_probe_every = spec_probe_every
        self._spec_ema: Optional[float] = None
        self._spec_on = True
        self._spec_probe_in = 0
        # chunked prefill: prompts longer than this many fused tokens commit
        # their K/V in prefill_chunk-sized pieces, ONE piece per scheduling
        # iteration, so a long admission stalls running decodes by at most
        # one piece (vLLM-style chunked prefill). None = monolithic prefill.
        self.prefill_chunk = prefill_chunk
        # Automatic prefix caching (vLLM-style, beyond the reference): the
        # cache buffer carries `prefix_cache_slots` extra POOL rows after the
        # request slots. A request whose leading TEXT run (token ids before
        # the first <image> sentinel — e.g. the shared TEOChat system prompt)
        # matches a pooled prefix copies that row's KV into its slot (~1 ms
        # device copy) and prefills only the suffix, instead of recomputing
        # the prefix (a full 7B forward over those slots). Text-only prefixes
        # keep the key exact: vision tokens depend on pixel data, text slots
        # [0, plen) depend only on the ids. Token-exact — the suffix prefill
        # is the chunked-prefill program, already exact vs monolithic, and
        # the pooled KV was produced by the same prefill program on the same
        # ids at the same positions. 0 disables (default; decode programs are
        # unchanged either way — extra rows only widen the cache reads' row
        # slice).
        #
        # prefix_min_tokens (the auto-bypass) defaults to 256: the measured
        # hit/miss TTFT curve on the flagship (bench ttft_prefix_curve) shows
        # 0.999x at a 128-token prefix (fixed dispatch/fetch costs dominate
        # a prefill that small) and 1.36x+ at 512 — the crossover sits
        # between, so prefixes shorter than ~256 skip the pool entirely.
        self.prefix_cache_slots = prefix_cache_slots
        self.prefix_min_tokens = prefix_min_tokens
        self._prefix_entries: List[dict] = []  # {key, plen, row, stamp}
        self._prefix_clock = 0
        # multi-LoRA: stacked adapter count (0 = plain/single-LoRA params);
        # per-request `adapter` ids route inside the batched programs
        from teochat_tpu.train.lora import num_stacked_adapters

        self._n_adapters = num_stacked_adapters(model.params["llm"])
        dtype = kv_dtype or model._dtype
        self.cache = llama_mod.init_cache(
            self.cfg.llm, max_slots + prefix_cache_slots, max_len, dtype=dtype
        )
        # all numeric scheduler state is device-resident (donated through the
        # prefill/chunk programs); the host keeps only the request objects
        self._state = _init_engine_state(max_slots, max_len, jax.random.PRNGKey(0))
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._dead: Optional[str] = None  # fatal scheduler error, if any
        self._slots: List[Optional[_Request]] = [None] * max_slots
        # admissions whose first token has been dispatched but not yet read
        self._pending_first: List[tuple] = []
        # the dispatched-but-not-yet-read decode chunk: (snapshot, outputs).
        # Depth-1 pipeline — see _step_once.
        self._inflight: Optional[tuple] = None
        self._lock = threading.Lock()
        self._stop = False
        self._thread: Optional[threading.Thread] = None
        self.stats = {"max_concurrent": 0, "chunks": 0, "requests": 0,
                      "prefix_hits": 0, "prefix_tokens_saved": 0}

    # ------------------------------------------------------------- submit
    def submit(self, input_ids: Sequence[int],
               pixel_values: Optional[np.ndarray] = None,
               gen: Optional[GenerationConfig] = None,
               adapter: int = -1) -> List[int]:
        """Enqueue one request; blocks until done; returns generated ids.

        `adapter` (multi-LoRA models only): LoRA adapter index for this
        request, -1 = base model — requests with different adapters batch
        together in one decode chunk (per-row routing on device)."""
        gen = gen or GenerationConfig()
        req = self._make_request(input_ids, pixel_values, gen, adapter)
        self._check_started()
        # dead-check + enqueue under the lock: the fatal drain (run_forever)
        # also holds it, so a request can never slip into the queue after the
        # one-shot drain and hang its caller
        with self._lock:
            if self._dead:
                raise RuntimeError(f"engine failed: {self._dead}")
            self._queue.put(req)
        req.event.wait()
        if req.error:
            raise RuntimeError(req.error)
        return req.tokens

    def submit_stream(self, input_ids: Sequence[int],
                      pixel_values: Optional[np.ndarray] = None,
                      gen: Optional[GenerationConfig] = None,
                      adapter: int = -1):
        """Enqueue one request; yields lists of fresh token ids per decode
        chunk as they are produced (SSE-friendly). Raises on request error."""
        gen = gen or GenerationConfig()
        req = self._make_request(input_ids, pixel_values, gen, adapter)
        req.stream_q = queue.Queue()
        self._check_started()
        with self._lock:
            if self._dead:
                raise RuntimeError(f"engine failed: {self._dead}")
            self._queue.put(req)
        while True:
            item = req.stream_q.get()
            if item is None:
                break
            yield item
        if req.error:
            raise RuntimeError(req.error)

    def _make_request(self, input_ids, pixel_values, gen,
                      adapter: int = -1) -> _Request:
        fused_len = len(input_ids) + sum(
            1 for t in input_ids if t == fusion_mod.IMAGE_TOKEN_INDEX
        ) * (self.model.tokens_per_frame - 1)
        if fused_len + gen.max_new_tokens + self.speculative_k + 1 > self.max_len:
            raise ValueError(
                f"prompt ({fused_len} fused tokens) + max_new_tokens "
                f"({gen.max_new_tokens}) exceeds engine max_len {self.max_len}"
            )
        if adapter >= 0 and adapter >= self._n_adapters:
            raise ValueError(
                f"adapter {adapter} out of range: model carries "
                f"{self._n_adapters} stacked LoRA adapters"
                + ("" if self._n_adapters else
                   " (stack with train.lora.stack_lora_adapters)")
            )
        return _Request(
            input_ids=list(input_ids), pixel_values=pixel_values, gen=gen,
            stop_strings=gen.stop_strings or (), event=threading.Event(),
            remaining=gen.max_new_tokens, adapter=max(adapter, -1),
        )

    def _check_started(self):
        """submit/submit_stream on a never-started engine would block its
        caller forever (the queue has no consumer) — fail loudly instead."""
        if self._thread is None and not self._dead:
            raise RuntimeError(
                "engine not running: call .start() before submitting "
                "(BatchEngine(...).start())"
            )

    # ------------------------------------------------------------- engine
    def start(self):
        self._thread = threading.Thread(target=self.run_forever, daemon=True)
        self._thread.start()
        return self

    def shutdown(self):
        self._stop = True
        self._queue.put(None)  # wake the loop
        # join (except from the loop thread itself): the daemon thread holds
        # the engine — and through it the params + KV cache — so a caller
        # that shuts down one engine and builds another (bench phases, tests)
        # would otherwise race 2x 7B of live buffers against the allocator
        t = self._thread
        if t is not None and t is not threading.current_thread():
            t.join(timeout=60.0)

    def run_forever(self):
        while not self._stop:
            try:
                made_progress = self._step_once(
                    block=all(s is None for s in self._slots)
                )
            except Exception as e:  # noqa: BLE001 — fatal: fail everything
                # A decode-time error (device OOM, wedged backend, ...) must
                # not hang callers: fail every in-flight and queued request
                # and refuse new ones. The reference has no equivalent (its
                # serving is a single blocking call). Setting _dead and
                # draining happen under the lock submit() enqueues under, so
                # no request can be enqueued after the one-shot drain.
                with self._lock:
                    self._dead = f"{type(e).__name__}: {e}"
                    for slot, req in enumerate(self._slots):
                        if req is not None:
                            self._slots[slot] = None
                            req.error = f"engine failed: {self._dead}"
                            req._push_stream(final=True)
                            req.event.set()
                    while True:
                        try:
                            req = self._queue.get_nowait()
                        except queue.Empty:
                            break
                        if req is not None:
                            req.error = f"engine failed: {self._dead}"
                            req._push_stream(final=True)
                            req.event.set()
                return
            if not made_progress and self._stop:
                return

    # One scheduling iteration, pipelined one chunk deep: dispatch chunk N+1
    # BEFORE reading chunk N's tokens, so the ~39 ms fixed tunnel round-trip
    # of the token download overlaps chunk N+1's device time instead of
    # serializing with it. Chunk N+1 depends only on device-resident state
    # (cache + scheduler state via the donation chain), never on the host's
    # reading of chunk N, so the dispatch is safe; the cost is up to one
    # extra chunk of wasted decode after a HOST-decided stop (stop string /
    # max_new_tokens) — those rows stay active device-side one chunk longer,
    # their tokens are discarded against the dispatch-time snapshot, and
    # position-overflow writes clamp into the trash K/V slot. EOS rows
    # self-deactivate in-program and lose nothing. Admissions' prefills queue
    # behind the in-flight chunk (donation order), adding up to one chunk of
    # device time to TTFT — the --chunk knob trades this against throughput.
    def _step_once(self, block: bool = False) -> bool:
        if block:
            # about to block on the queue: deliver any in-flight chunk first
            # (its requests may finish and their callers are waiting)
            self._flush_inflight()
        admitted = self._admit(block=block)
        if self._pending_first:
            # read fresh admissions' first tokens BEFORE dispatching the next
            # chunk: the tunnel serializes device->host reads behind queued
            # programs, so a fetch issued after the chunk dispatch pays the
            # whole chunk's device time in TTFT (probe: ~45 ms of the ~200 ms
            # engine TTFT). Only when no OTHER slot is mid-decode — then the
            # stall costs nothing (the device would idle through the fetch
            # anyway) and one-token requests free their slot before a chunk
            # wastes decode on them. With other streams running, the fetch
            # rides after the chunk as before (aggregate throughput keeps
            # its one-chunk-deep pipeline; TTFT pays <= one chunk).
            pending_slots = {s for _, s, _ in self._pending_first}
            others_decoding = any(
                r is not None and r.pf is None and s not in pending_slots
                for s, r in enumerate(self._slots)
            )
            # >1 pending = an admission storm (batch benchmark, cold start):
            # those callers measure aggregate throughput, not TTFT — keep the
            # dispatch-first pipeline for them
            if not others_decoding and len(self._pending_first) == 1:
                self._resolve_pending_first()
        # the slots THIS chunk decodes: mid-prefill rows are captured as None
        # (inactive in the device state at dispatch time, they emit pads —
        # even if their prefill completes during the overlap zone below)
        snapshot = [
            r if (r is not None and r.pf is None) else None
            for r in self._slots
        ]
        decoding = any(r is not None for r in snapshot)
        if not decoding:
            # nothing to decode between pieces -> run any in-progress chunked
            # prefills to completion (no running stream to protect)
            self._flush_inflight()
            self._advance_prefills(drain=True)
            self._resolve_pending_first()
            return admitted or any(r is not None for r in self._slots)
        self.stats["max_concurrent"] = max(
            self.stats["max_concurrent"],
            sum(r is not None for r in snapshot),
        )
        chunk_out = self._dispatch_chunk()
        # overlap: encode/plan/prefill-dispatch for queued requests while the
        # chunk runs on device (their slots join the NEXT chunk; `snapshot`
        # keeps this chunk's results off the newly admitted requests).
        # Chunked prefills advance ONE piece per decode chunk, bounding how
        # long any admission can occupy the device between decode chunks.
        self._admit(block=False)
        self._advance_prefills()
        # apply the PREVIOUS chunk's results (already finished on device — the
        # chunk just dispatched is running behind it), then park this one
        prev, self._inflight = self._inflight, (snapshot, chunk_out)
        if prev is not None:
            self._apply_chunk(*prev)
        self._resolve_pending_first()
        return True

    def _flush_inflight(self):
        """Apply the parked in-flight chunk's results (blocking download)."""
        if self._inflight is not None:
            prev, self._inflight = self._inflight, None
            self._apply_chunk(*prev)

    def _admit(self, block: bool) -> bool:
        admitted = False
        while any(s is None for s in self._slots):
            try:
                req = self._queue.get(block=block and not admitted, timeout=5.0 if block else None)
            except queue.Empty:
                break
            if req is None:
                break
            slot = self._slots.index(None)
            self._slots[slot] = req  # reserve before prefill (prefill may finish it)
            req.slot = slot
            try:
                self._prefill(req, slot)
                self.stats["requests"] += 1
                admitted = True
            except Exception as e:  # noqa: BLE001 — surfaced to the caller
                self._slots[slot] = None
                req.error = f"{type(e).__name__}: {e}"
                req._push_stream(final=True)
                req.event.set()
            block = False
        return admitted

    def _prefill(self, req: _Request, slot: int):
        """Dispatch one admission's prefill program (async — the first token
        read is deferred to _resolve_pending_first so admissions overlap the
        running decode chunk's device time)."""
        model, cfg = self.model, self.cfg
        n_frames = fusion_mod.count_frames([req.input_ids])
        if n_frames:
            if req.pixel_values is None or req.pixel_values.shape[0] != n_frames:
                raise ValueError(f"prompt needs {n_frames} frames")
            vision_tokens = model.encode(req.pixel_values)
        else:
            vision_tokens = jnp.zeros(
                (1, model.tokens_per_frame, cfg.llm.hidden_size), model._dtype
            )
        fused_len = len(req.input_ids) + sum(
            1 for t in req.input_ids if t == fusion_mod.IMAGE_TOKEN_INDEX
        ) * (model.tokens_per_frame - 1)
        pad_to = teochat_mod.round_to_bucket(
            min(fused_len, self.max_len), teochat_mod.SEQ_BUCKETS
        )
        pad_to = min(pad_to, self.max_len)
        plan = fusion_mod.build_fusion_plan(
            [req.input_ids], tokens_per_frame=model.tokens_per_frame,
            max_length=self.max_len, pad_to=pad_to,
        )
        # draft history row: prompt text ids (first token appended in-program)
        row = np.full((self.max_len,), -1, np.int32)
        n = min(len(req.input_ids), self.max_len - 1)
        row[:n] = req.input_ids[:n]
        plen, prefix_row, matched = self._prefix_match(req, fused_len)
        if plen:
            req.prefix_hit = (matched, plen)
            # prefix-cache hit: seed the slot's KV [0, plen) from the pool
            # row, then prefill only [plen, ...). Copying past plen is safe —
            # every copied garbage slot is overwritten by the suffix panel
            # (slots < fused_len) or by a decode write at `pos` before the
            # mask slot <= pos admits it (slots >= fused_len).
            self.stats["prefix_hits"] += 1
            self.stats["prefix_tokens_saved"] += plen
            suffix = fused_len - plen
            if not (self.prefill_chunk is not None
                    and suffix > self.prefill_chunk):
                # short suffix: ONE fused program (copy + fuse + suffix
                # prefill + sample + activate) — the dispatch-count win that
                # makes a hit beat a miss (see _prefill_slot_from_prefix)
                w = teochat_mod.round_to_bucket(suffix, SUFFIX_BUCKETS)
                w = min(w, self.max_len - plen)
                tok, self.cache, self._state = _prefill_slot_from_prefix(
                    model.params["llm"], self.cache, self._state, cfg.llm,
                    plan, vision_tokens.astype(model._dtype),
                    jnp.asarray(prefix_row, jnp.int32),
                    jnp.asarray(slot, jnp.int32),
                    jnp.asarray(plen, jnp.int32),
                    jnp.asarray(fused_len, jnp.int32),
                    w, self._copy_len(plen),
                    jnp.asarray([req.gen.temperature], jnp.float32),
                    jnp.asarray([req.gen.do_sample], bool),
                    jnp.asarray(row), jnp.asarray(n, jnp.int32),
                    jnp.asarray([req.adapter], jnp.int32),
                )
                self._pending_first.append((req, slot, tok))
                self._maybe_store_prefix(req, slot)
                return
            self.cache = _copy_cache_row(
                self.cache,
                jnp.asarray(prefix_row, jnp.int32),
                jnp.asarray(slot, jnp.int32),
                self._copy_len(plen),
            )
            embeds = _fuse_embeds(
                model.params["llm"], plan, vision_tokens.astype(model._dtype)
            )
            c = self.prefill_chunk
            nchunks = -(-suffix // c)
            end = plen + nchunks * c
            if embeds.shape[1] < end:
                embeds = jnp.pad(
                    embeds, ((0, 0), (0, end - embeds.shape[1]), (0, 0))
                )
            req.pf = {
                "embeds": embeds[:, plen:end], "next": 0,
                "nchunks": nchunks, "fused_len": fused_len,
                "offset": plen, "hist_row": row, "hist_n": n,
            }
            self._advance_one_prefill(req, slot)
            return
        if self.prefill_chunk is not None and fused_len > self.prefill_chunk:
            # chunked prefill: fuse embeds once, then commit K/V one
            # prefill_chunk piece per scheduling iteration (see _step_once)
            c = self.prefill_chunk
            nchunks = -(-fused_len // c)
            embeds = _fuse_embeds(
                model.params["llm"], plan, vision_tokens.astype(model._dtype)
            )
            total = nchunks * c
            if embeds.shape[1] < total:
                embeds = jnp.pad(embeds, ((0, 0), (0, total - embeds.shape[1]),
                                          (0, 0)))
            req.pf = {
                "embeds": embeds[:, :total], "next": 0, "nchunks": nchunks,
                "fused_len": fused_len, "offset": 0,
                "hist_row": row, "hist_n": n,
            }
            self._advance_one_prefill(req, slot)
            return
        tok, self.cache, self._state = _prefill_slot(
            model.params["llm"], self.cache, self._state, cfg.llm, plan,
            vision_tokens.astype(self.model._dtype),
            jnp.asarray(slot, jnp.int32),
            jnp.asarray([req.gen.temperature], jnp.float32),
            jnp.asarray([req.gen.do_sample], bool),
            jnp.asarray(row), jnp.asarray(n, jnp.int32),
            jnp.asarray([req.adapter], jnp.int32),
        )
        self._pending_first.append((req, slot, tok))
        self._maybe_store_prefix(req, slot)

    # ------------------------------------------------------- prefix cache
    @staticmethod
    def _text_run(input_ids) -> tuple:
        """Leading pure-text token run (the cacheable prefix): ids before the
        first <image> sentinel occupy fused slots [0, len(run)) and depend
        only on the ids — vision tokens would tie the key to pixel data."""
        run = []
        for t in input_ids:
            if t == fusion_mod.IMAGE_TOKEN_INDEX:
                break
            run.append(int(t))
        return tuple(run)

    def _bump(self) -> int:
        self._prefix_clock += 1
        return self._prefix_clock

    def _copy_len(self, plen: int) -> int:
        return min(
            teochat_mod.round_to_bucket(plen, teochat_mod.SEQ_BUCKETS),
            self.max_len,
        )

    def _prefix_match(self, req: _Request, fused_len: int):
        """Longest usable pooled prefix for this prompt; returns
        (plen, pool_row) or (0, -1) on miss. Matching is longest-common-prefix
        against each pooled run — token-exact even when the shared run is a
        strict prefix of both (the system-prompt case: prompts diverge at the
        question), because causal KV at slot i depends only on ids[0..i] at
        the same positions. plen is capped at fused_len - 1 so at least one
        token remains to prefill for logits, and a hit must reuse at least
        prefix_min_tokens to be worth the row copy. Pool entries are keyed by
        (adapter, run): with multi-LoRA params the pooled K/V embed the
        adapter's deltas, so only same-adapter requests may reuse them."""
        if not self.prefix_cache_slots:
            return 0, -1, None
        run = self._text_run(req.input_ids)
        best, best_eff = None, 0
        for e in self._prefix_entries:
            if e["adapter"] != req.adapter:
                continue
            key = e["key"]
            lcp = 0
            for a, b in zip(key, run):
                if a != b:
                    break
                lcp += 1
            eff = min(lcp, fused_len - 1)
            if eff > best_eff:
                best, best_eff = e, eff
        if best is None or best_eff < self.prefix_min_tokens:
            return 0, -1, None
        best["stamp"] = self._bump()
        return best_eff, best["row"], best

    def _maybe_store_prefix(self, req: _Request, slot: int):
        """Pool this request's just-prefilled text prefix (LRU eviction).
        Called after the prefill program is dispatched — the donation chain
        orders the copy-out after the prefill's writes.

        Hit-path policy (req.prefix_hit set): if this run EXTENDS the matched
        entry (the entry's whole key is a prefix of the run), replace that
        entry in place — under LCP matching the longer key subsumes the
        shorter one, so this costs no extra pool row (the multi-turn
        pattern). If instead the run DIVERGED from the entry, pool it only
        when its unique tail is at least prefix_min_tokens — a near-duplicate
        of an already-pooled prefix (shared system prompt, 3-token question
        tail) isn't worth a row copy per request."""
        if not self.prefix_cache_slots:
            return
        run = self._text_run(req.input_ids)
        if len(run) < self.prefix_min_tokens:
            return
        for e in self._prefix_entries:
            if e["key"] == run and e["adapter"] == req.adapter:
                e["stamp"] = self._bump()
                return
        if req.prefix_hit is not None:
            entry, lcp = req.prefix_hit
            alive = any(e is entry for e in self._prefix_entries)
            if alive and entry["plen"] == lcp and len(run) > lcp:
                self.cache = _copy_cache_row(
                    self.cache, jnp.asarray(slot, jnp.int32),
                    jnp.asarray(entry["row"], jnp.int32),
                    self._copy_len(len(run)),
                )
                entry.update(key=run, plen=len(run), stamp=self._bump())
                return
            if len(run) - lcp < self.prefix_min_tokens:
                return
        if len(self._prefix_entries) < self.prefix_cache_slots:
            prow = self.max_slots + len(self._prefix_entries)
        else:
            victim = min(self._prefix_entries, key=lambda e: e["stamp"])
            self._prefix_entries.remove(victim)
            prow = victim["row"]
        self.cache = _copy_cache_row(
            self.cache, jnp.asarray(slot, jnp.int32),
            jnp.asarray(prow, jnp.int32), self._copy_len(len(run)),
        )
        self._prefix_entries.append(
            {"key": run, "plen": len(run), "row": prow, "stamp": self._bump(),
             "adapter": req.adapter}
        )

    def _advance_one_prefill(self, req: _Request, slot: int):
        """Dispatch the next chunked-prefill piece for one request; the final
        piece runs the tail program (first-token sample + slot activation)."""
        pf = req.pf
        c = self.prefill_chunk
        i = pf["next"]
        off = pf.get("offset", 0)  # prefix-cache hit: pieces start at plen
        emb = pf["embeds"][:, i * c:(i + 1) * c]
        pos = jnp.arange(off + i * c, off + (i + 1) * c, dtype=jnp.int32)[None, :]
        if i < pf["nchunks"] - 1:
            self.cache = _prefill_chunk_write(
                self.model.params["llm"], self.cache, self.cfg.llm, emb, pos,
                jnp.asarray(slot, jnp.int32),
                jnp.asarray([req.adapter], jnp.int32),
            )
            pf["next"] = i + 1
        else:
            tok, self.cache, self._state = _prefill_slot_tail(
                self.model.params["llm"], self.cache, self._state,
                self.cfg.llm, emb, pos,
                jnp.asarray(pf["fused_len"], jnp.int32),
                jnp.asarray([pf["fused_len"] - 1 - off - i * c], jnp.int32),
                jnp.asarray(slot, jnp.int32),
                jnp.asarray([req.gen.temperature], jnp.float32),
                jnp.asarray([req.gen.do_sample], bool),
                jnp.asarray(pf["hist_row"]),
                jnp.asarray(pf["hist_n"], jnp.int32),
                jnp.asarray([req.adapter], jnp.int32),
            )
            req.pf = None
            self._pending_first.append((req, slot, tok))
            self._maybe_store_prefix(req, slot)

    def _advance_prefills(self, drain: bool = False):
        """Advance every in-progress chunked prefill by one piece (or, when
        nothing is decoding, all the way — no decode work to interleave)."""
        progressed = True
        while progressed:
            progressed = False
            for slot, req in enumerate(self._slots):
                if req is not None and req.pf is not None:
                    self._advance_one_prefill(req, slot)
                    progressed = True
            if not drain:
                break

    def _resolve_pending_first(self):
        """Read deferred first tokens (blocks until their prefills finish)."""
        pending, self._pending_first = self._pending_first, []
        for req, slot, tok in pending:
            # np.asarray: ONE d2h copy. int(tok[0]) would dispatch a gather
            # program first — an extra tunnel round-trip per admission
            req.tokens.append(int(np.asarray(tok)[0]))
            req.remaining -= 1
            req._push_stream()
            self._finish_if_done(req, slot)

    def _update_spec_mode(self, tokens: int, iterations: int):
        """Adaptive-speculation controller (see __init__): fold one spec
        chunk's tokens-per-iteration into the EMA and flip drafting on/off."""
        if not (self.adaptive_spec and self.speculative_k > 0) or not iterations:
            return
        rate = tokens / iterations
        if not self._spec_on:
            # probe chunk: decide directly on its rate (the stale EMA is why
            # drafting was paused in the first place)
            if rate >= self.spec_disable_below:
                self._spec_on = True
                self._spec_ema = rate
                self.stats["spec_mode_switches"] = (
                    self.stats.get("spec_mode_switches", 0) + 1
                )
            else:
                self._spec_probe_in = self.spec_probe_every
            return
        self._spec_ema = (
            rate if self._spec_ema is None
            else 0.7 * self._spec_ema + 0.3 * rate
        )
        if self._spec_ema < self.spec_disable_below:
            self._spec_on = False
            self._spec_probe_in = self.spec_probe_every
            self.stats["spec_mode_switches"] = (
                self.stats.get("spec_mode_switches", 0) + 1
            )

    def _dispatch_chunk(self):
        """Async-dispatch one decode chunk over the device-resident state.
        Returns a 2-tuple for a speculative chunk, a 1-tuple for a plain one
        (_apply_chunk dispatches on the arity, so an adaptive-spec engine
        can interleave both program kinds)."""
        cfg = self.cfg
        use_spec = self.speculative_k > 0
        if use_spec and self.adaptive_spec and not self._spec_on:
            self._spec_probe_in -= 1
            use_spec = self._spec_probe_in <= 0  # probe chunk re-measures
            if use_spec:
                # re-arm at DISPATCH: the depth-1 pipeline dispatches the
                # NEXT chunk before this probe's verdict applies, so an
                # apply-time-only reset would fire two probes per window
                self._spec_probe_in = self.spec_probe_every
        if use_spec:
            toks3, counts, self.cache, self._state = _decode_chunk_spec(
                self.model.params["llm"], self.cache, self._state, cfg.llm,
                self.chunk, self.speculative_k,
                int(cfg.llm.eos_token_id), int(cfg.llm.pad_token_id),
            )
            return toks3, counts
        toks, self.cache, self._state = _decode_chunk(
            self.model.params["llm"], self.cache, self._state, cfg.llm,
            self.chunk, int(cfg.llm.eos_token_id), int(cfg.llm.pad_token_id),
        )
        return (toks,)

    def _apply_chunk(self, snapshot, chunk_out):
        """Download chunk tokens and hand them to the snapshot's requests."""
        cfg = self.cfg
        if len(chunk_out) == 2:  # speculative chunk (see _dispatch_chunk)
            toks3, counts = chunk_out
            toks3 = np.asarray(toks3)  # [B, chunk, k+1]
            counts = np.asarray(counts)  # [B, chunk]
            emitting = counts > 0
            self.stats["spec_iterations"] = (
                self.stats.get("spec_iterations", 0) + int(emitting.sum())
            )
            self.stats["spec_tokens"] = (
                self.stats.get("spec_tokens", 0) + int(counts.sum())
            )
            self._update_spec_mode(int(counts.sum()), int(emitting.sum()))
            slot_tokens = [
                [int(t) for c in range(self.chunk)
                 for t in toks3[b, c, : counts[b, c]]]
                for b in range(self.max_slots)
            ]
        else:
            toks = np.asarray(chunk_out[0])
            slot_tokens = [list(map(int, toks[b])) for b in range(self.max_slots)]
        self.stats["chunks"] += 1
        for slot, req in enumerate(snapshot):
            if req is None or req.event.is_set() or req.pf is not None:
                # empty slot, a request that finished at its first token
                # before this chunk's results landed, or one still mid-way
                # through a chunked prefill (its row emitted pads)
                continue
            for t in slot_tokens[slot]:
                if req.remaining <= 0:
                    break
                req.tokens.append(int(t))
                req.remaining -= 1
                if int(t) == cfg.llm.eos_token_id or self._hit_stop(req):
                    req.remaining = 0
                    break
            req._push_stream()
            self._finish_if_done(req, slot)

    def _hit_stop(self, req: _Request) -> bool:
        if not req.stop_strings or self.model.tokenizer is None:
            return False
        text = self.model.tokenizer.decode(req.tokens)
        return any(s in text for s in req.stop_strings)

    def _finish_if_done(self, req: _Request, slot: int):
        done = (
            req.remaining <= 0
            or (req.tokens and req.tokens[-1] == self.cfg.llm.eos_token_id)
            or self._hit_stop(req)
        )
        if done:
            self._slots[slot] = None
            # one tiny program per request lifetime pushes the host's stop
            # decision into the device-resident state (EOS rows are already
            # inactive device-side; this is idempotent for them)
            self._state = _deactivate_slot(self._state, jnp.asarray(slot, jnp.int32))
            req._push_stream(final=True)
            req.event.set()

"""Device-side generation: fused prefill + `lax.while_loop` decode.

Replaces the reference's HF `generate()` host loop (inference.py:64-72) with a
single jitted program: prefill writes the KV cache (flash-attention path on
TPU), then a while_loop runs decode steps entirely on device — per-row ragged
slots, greedy/temperature sampling, EOS + multi-token keyword stopping
(KeywordsStoppingCriteria semantics, mm_utils.py:73-104) via a rolling
last-M-token window. No host sync per token.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from teochat_tpu.config import LlamaConfig, MptConfig
from teochat_tpu.models import llama as llama_mod
from teochat_tpu.models.llama import KVCache


# ------------------------------------------------------ backend dispatch
#
# The decode machinery (prefill + while_loop + stopping + sampling) is
# backend-agnostic; only the embedding table and the decoder stack differ.
# cfg's TYPE selects the backend (static under jit: configs are frozen
# dataclasses) — the functional twin of the reference's LlavaLlama /
# LlavaMPT class split (llava_llama.py:33-111, llava_mpt.py:45-109).

def backend_embed(params, cfg, ids, dtype=None):
    if isinstance(cfg, MptConfig):
        from teochat_tpu.models import mpt as mpt_mod

        return mpt_mod.mpt_embed(params, ids, dtype=dtype)
    return llama_mod.embed_tokens(params, ids, dtype=dtype)


def backend_forward(params, cfg, emb, *, position_ids, cache, write_slots,
                    kv_mask, logits_mode, last_index=None,
                    cache_row_offset=0, spec_verify=False, prefill_start=0,
                    attend_cache=False, act_quant_ok=None, adapter_route=None):
    """Cached-path decoder dispatch. MPT ignores position_ids (ALiBi). The
    extended cache contract (per-slot row offsets, spec-verify blocks,
    chunked-prefill offsets) is shared by both backends, as is
    `adapter_route` [B, A] multi-LoRA per-row routing (llama._proj)."""
    if isinstance(cfg, MptConfig):
        from teochat_tpu.models import mpt as mpt_mod

        return mpt_mod.mpt_forward(
            params, cfg, emb, cache=cache, write_slots=write_slots,
            kv_mask=kv_mask, logits_mode=logits_mode, last_index=last_index,
            cache_row_offset=cache_row_offset, spec_verify=spec_verify,
            prefill_start=prefill_start, attend_cache=attend_cache,
            adapter_route=adapter_route,
        )
    return llama_mod.llama_forward(
        params, cfg, emb, position_ids=position_ids, cache=cache,
        write_slots=write_slots, kv_mask=kv_mask, logits_mode=logits_mode,
        last_index=last_index,
        cache_row_offset=cache_row_offset, spec_verify=spec_verify,
        prefill_start=prefill_start, attend_cache=attend_cache,
        act_quant_ok=act_quant_ok,  # w8a8 prefill is a llama-path knob
        adapter_route=adapter_route,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StopSpec:
    """Static stopping data: [K, M] keyword ids (0-padded left) + lengths."""

    keyword_ids: jnp.ndarray  # [K, M] int32, right-aligned (suffix order)
    keyword_lens: jnp.ndarray  # [K] int32
    eos_id: jnp.ndarray  # scalar int32


def make_stop_spec(
    stop_strings: Sequence[str],
    tokenizer,
    eos_id: int,
) -> StopSpec:
    """Tokenize stop strings (dropping a leading BOS) into a static id matrix."""
    bos = getattr(tokenizer, "bos_token_id", None)
    seqs: List[List[int]] = []
    for s in stop_strings:
        ids = list(tokenizer(s).input_ids)
        if len(ids) > 1 and bos is not None and ids[0] == bos:
            ids = ids[1:]
        seqs.append(ids)
    m = max((len(s) for s in seqs), default=1)
    k = max(len(seqs), 1)
    mat = np.zeros((k, m), np.int32)
    lens = np.zeros((k,), np.int32)
    for i, s in enumerate(seqs):
        mat[i, m - len(s):] = s  # right-aligned for suffix compare
        lens[i] = len(s)
    return StopSpec(
        keyword_ids=jnp.asarray(mat),
        keyword_lens=jnp.asarray(lens),
        eos_id=jnp.asarray(eos_id, jnp.int32),
    )


def _keyword_hit(window: jnp.ndarray, spec: StopSpec) -> jnp.ndarray:
    """window: [B, M] last tokens (right-aligned). Returns [B] bool."""
    m = window.shape[1]
    pos = jnp.arange(m)
    # position valid for keyword k iff pos >= M - len_k
    valid = pos[None, :] >= (m - spec.keyword_lens[:, None])  # [K, M]
    eq = window[:, None, :] == spec.keyword_ids[None, :, :]  # [B, K, M]
    hit = jnp.all(eq | ~valid[None], axis=-1)  # [B, K]
    # zero-length rows (padding / "no keywords") must never match
    hit = hit & (spec.keyword_lens > 0)[None, :]
    return jnp.any(hit, axis=-1)


def sample_token(
    logits: jnp.ndarray,  # [B, V] fp32
    rng: jax.Array,
    *,
    temperature: float,
    do_sample: bool,
    top_p: float = 1.0,
) -> jnp.ndarray:
    """Greedy or temperature/top-p sampling. Static branch (python bools)."""
    if not do_sample or temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = _filtered_logits(logits, temperature, top_p)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


def _filtered_logits(logits: jnp.ndarray, temperature: float, top_p: float) -> jnp.ndarray:
    """Temperature-scaled logits with tokens outside the top-p nucleus masked.
    Works on [..., V] (trailing vocab axis)."""
    logits = logits / temperature
    if top_p < 1.0:
        sorted_logits = jnp.flip(jnp.sort(logits, axis=-1), axis=-1)
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens until cumulative prob exceeds top_p (always keep top-1)
        cutoff_idx = jnp.sum(cum < top_p, axis=-1)  # [...]
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[..., None], axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return logits


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_new_tokens", "temperature", "do_sample", "top_p", "pad_id",
        "cache_len", "kv_dtype",
    ),
)
def generate_tokens(
    params,
    cfg: LlamaConfig,
    inputs_embeds: jnp.ndarray,  # [B, S, D] fused prompt embeddings
    seq_lens: jnp.ndarray,  # [B] true prompt lengths
    attention_mask: jnp.ndarray,  # [B, S] prompt validity
    position_ids: jnp.ndarray,  # [B, S]
    cache: Optional[KVCache],  # zeroed cache, max_len >= S + max_new_tokens
    stop: StopSpec,
    rng: jax.Array,
    *,
    max_new_tokens: int,
    temperature: float = 0.0,
    do_sample: bool = False,
    top_p: float = 1.0,
    pad_id: int = 0,
    cache_len: Optional[int] = None,
    kv_dtype: str = "bfloat16",
    adapter_route: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (tokens [B, max_new_tokens] (pad_id after stop), n_generated [B]).

    Generated tokens INCLUDE the stop keyword (the reference decodes then strips
    '</s>', inference.py:75-77); callers strip via the tokenizer.

    Pass `cache=None` with a static `cache_len` to allocate the KV cache
    INSIDE the program: an argument cache is double-buffered by XLA (input +
    working copy — 2x HBM at large batch), an internal one is a single temp.
    `kv_dtype='float8_e4m3fn'` halves cache bytes (opt-in: decode is
    KV-bandwidth-bound at batch, and e4m3 KV is metric-safe but not bit-exact).
    """
    b, s, _ = inputs_embeds.shape
    if cache is None:
        from teochat_tpu.models.llama import init_cache

        cache = init_cache(cfg, b, cache_len, dtype=jnp.dtype(kv_dtype))
    t_max = cache.max_len

    # Padded prompt positions carry position_id 0; routing them to slot 0 would
    # scatter garbage over the real first token's K/V (last-write-wins). They
    # write to a dedicated trash slot (t_max-1, always masked out) instead —
    # callers size the cache with one spare slot.
    trash = t_max - 1
    slots = jnp.where(attention_mask, position_ids, trash)
    kv_mask = jax.lax.broadcasted_iota(jnp.int32, (b, t_max), 1) < seq_lens[:, None]
    # prefill
    logits, cache = backend_forward(
        params, cfg, inputs_embeds,
        position_ids=position_ids, cache=cache, write_slots=slots,
        kv_mask=kv_mask,
        logits_mode="last", last_index=seq_lens - 1,
        adapter_route=adapter_route,
    )
    tokens, n_gen, _ = _run_decode_loop(
        params, cfg, cache, logits[:, -1], seq_lens, stop, rng,
        max_new_tokens=max_new_tokens, temperature=temperature,
        do_sample=do_sample, top_p=top_p, pad_id=pad_id,
        emb_dtype=inputs_embeds.dtype, adapter_route=adapter_route,
    )
    return tokens, n_gen


def _run_decode_loop(params, cfg, cache, logits0, start_pos, stop, rng, *,
                     max_new_tokens, temperature, do_sample, top_p, pad_id,
                     emb_dtype, adapter_route=None):
    """The shared decode while_loop: sample from logits0, feed, repeat.

    start_pos: [B] cache slot of the first generated token per row (all prior
    slots hold committed K/V). Returns (tokens [B, max_new_tokens], n_gen [B],
    cache). Called inside a jit context (generate_tokens / decode_with_cache).
    """
    b = start_pos.shape[0]
    t_max = cache.max_len
    m = stop.keyword_ids.shape[1]

    def step_fn(state):
        (step, cur_rng, cache, tokens, window, done, n_gen, logits) = state
        step_rng, next_rng = jax.random.split(cur_rng)
        tok = sample_token(
            logits, step_rng,
            temperature=temperature, do_sample=do_sample, top_p=top_p,
        )
        tok = jnp.where(done, pad_id, tok)
        tokens = tokens.at[:, step].set(tok)
        window = jnp.concatenate([window[:, 1:], tok[:, None]], axis=1)
        n_gen = n_gen + jnp.where(done, 0, 1)
        newly_done = (tok == stop.eos_id) | _keyword_hit(window, stop)
        done = done | newly_done

        pos = start_pos + step  # [B]
        kv_mask = jax.lax.broadcasted_iota(jnp.int32, (b, t_max), 1) <= pos[:, None]
        emb = backend_embed(params, cfg, tok[:, None], dtype=emb_dtype)
        logits, cache = backend_forward(
            params, cfg, emb, position_ids=pos[:, None], cache=cache,
            write_slots=pos[:, None], kv_mask=kv_mask, logits_mode="last",
            adapter_route=adapter_route,
        )
        return (step + 1, next_rng, cache, tokens, window, done, n_gen,
                logits[:, -1])

    def cond_fn(state):
        step, _, _, _, _, done, _, _ = state
        return (step < max_new_tokens) & ~jnp.all(done)

    tokens0 = jnp.full((b, max_new_tokens), pad_id, jnp.int32)
    window0 = jnp.full((b, m), -1, jnp.int32)
    state = (
        jnp.asarray(0), rng, cache, tokens0, window0,
        jnp.zeros((b,), bool), jnp.zeros((b,), jnp.int32), logits0,
    )
    state = jax.lax.while_loop(cond_fn, step_fn, state)
    (_, _, cache, tokens, _, _, n_gen, _) = state
    return tokens, n_gen, cache


# ------------------------------------------------ incremental (session) API
#
# Multi-turn chat re-renders the whole conversation each turn; the reference
# re-prefills it all through HF generate (teochat_demo.py:513-546). Here a
# session keeps ONE KV cache across turns (serve/session.py): turn N+1
# prefills only the suffix after the longest committed prefix, attending to
# the cached conversation — vision tokens included, so frames are encoded
# exactly once per conversation.


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(2,))
def prefill_full(params, cfg, cache, embeds, seq_lens, attention_mask,
                 position_ids, adapter_route=None):
    """Prefill a fresh conversation into an (empty) session cache.

    Returns (last-token logits [B, V], cache). Contiguous panel writes +
    flash attention (same fast path as generate_tokens' prefill)."""
    t_max = cache.max_len
    b = embeds.shape[0]
    trash = t_max - 1
    slots = jnp.where(attention_mask, position_ids, trash)
    kv_mask = jax.lax.broadcasted_iota(jnp.int32, (b, t_max), 1) < seq_lens[:, None]
    logits, cache = backend_forward(
        params, cfg, embeds, position_ids=position_ids, cache=cache,
        write_slots=slots, kv_mask=kv_mask,
        logits_mode="last", last_index=seq_lens - 1,
        adapter_route=adapter_route,
    )
    return logits[:, -1], cache


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(2,))
def prefill_suffix(params, cfg, cache, embeds, start, seq_lens,
                   attention_mask, position_ids, adapter_route=None):
    """Prefill a conversation SUFFIX against committed cache contents.

    embeds/position_ids/attention_mask/seq_lens describe the right-padded
    suffix alone (positions 0-based within the suffix); `start` [B] is the
    fused cache slot where the suffix begins. Runs the spec_verify decode
    mode: per-slot scatter writes + masked attention over the whole cache, so
    suffix queries see the committed conversation. Returns
    (last-token logits [B, V], cache)."""
    t_max = cache.max_len
    b = embeds.shape[0]
    trash = t_max - 1
    abs_pos = start[:, None] + position_ids
    slots = jnp.where(attention_mask, abs_pos, trash)
    kv_mask = (
        jax.lax.broadcasted_iota(jnp.int32, (b, t_max), 1)
        < (start + seq_lens)[:, None]
    )
    logits, cache = backend_forward(
        params, cfg, embeds, position_ids=abs_pos, cache=cache,
        write_slots=slots, kv_mask=kv_mask, logits_mode="last",
        last_index=seq_lens - 1, spec_verify=True,
        # a suffix prefill is a PREFILL: keep the w8a8 activation path so
        # sessions match the stateless full-prefill numerics when
        # int8_prefill_activations is enabled (verify blocks pin bf16)
        act_quant_ok=True,
        adapter_route=adapter_route,
    )
    return logits[:, -1], cache


@partial(
    jax.jit,
    static_argnames=(
        "max_new_tokens", "temperature", "do_sample", "top_p", "pad_id", "cfg",
    ),
    donate_argnums=(2,),
)
def decode_with_cache(params, cfg, cache, logits0, start_pos, stop, rng, *,
                      max_new_tokens, temperature=0.0, do_sample=False,
                      top_p=1.0, pad_id=0, adapter_route=None):
    """Decode continuing from prefilled logits over an existing cache.

    Returns (tokens, n_gen, cache) — the cache keeps the generated tokens'
    K/V (all but the last sampled token's), enabling the next session turn."""
    emb_dtype = cache.dtype if cache.dtype != jnp.dtype("float8_e4m3fn") else jnp.bfloat16
    return _run_decode_loop(
        params, cfg, cache, logits0, start_pos, stop, rng,
        max_new_tokens=max_new_tokens, temperature=temperature,
        do_sample=do_sample, top_p=top_p, pad_id=pad_id, emb_dtype=emb_dtype,
        adapter_route=adapter_route,
    )


# ------------------------------------------------- prompt-lookup speculation
#
# Decode on TPU is weight-bandwidth-bound: a forward over s tokens reads the
# same HBM bytes as a forward over 1. Verifying k drafted tokens in one
# (k+1)-token "spec_verify" pass (llama.py / mpt.py — the loop dispatches
# through backend_embed/backend_forward) therefore costs ~one decode step;
# every accepted draft is a nearly-free extra token. Drafts come from the
# prompt+history itself (prompt-lookup / n-gram drafting — no draft model):
# EO responses echo prompt substrings heavily (bbox coordinate lists, class
# names, "Image N" phrases), which is exactly where n-gram lookup hits.
# Greedy-only: emitted tokens are verified against the target model's own
# argmax, so the output is token-identical to plain greedy decode (same
# weights, same fp32 softmax path — spec_verify also pins bf16 activations so
# w8a8 prefill quantization never leaks into the targets). Caveat: "identical"
# holds up to floating-point argmax ties — the (k+1)-token verify program may
# reduce matmuls in a different order than the 1-token program, and an
# exactly-tied logit pair can flip (observed only on random-init test models;
# real checkpoints separate the argmax by far more than the reduction noise).
#
# The reference has no speculative path (HF generate one token at a time,
# inference.py:64-72); this is a beyond-reference capability.


def _ngram_match_start(hist: jnp.ndarray, hist_len: jnp.ndarray, n: int) -> jnp.ndarray:
    """Most recent earlier occurrence of the last n tokens of each row.

    Returns [B] int32: the index where the continuation starts (match start
    + n), or -1 if the row has no earlier occurrence.
    """
    b, h = hist.shape
    rows = jnp.arange(b)
    idx = jnp.arange(h - n + 1)
    m = jnp.ones((b, h - n + 1), bool)
    for j in range(n):
        qj = hist[rows, jnp.maximum(hist_len - n + j, 0)]
        m &= hist[:, j : h - n + 1 + j] == qj[:, None]
    # exclude the query window itself (and anything overlapping its end)
    m &= idx[None, :] <= (hist_len - n - 1)[:, None]
    m &= (hist_len >= n + 1)[:, None]
    best = jnp.max(jnp.where(m, idx, -1), axis=1)
    return jnp.where(best >= 0, best + n, -1)


def _draft_lookup(hist: jnp.ndarray, hist_len: jnp.ndarray, k: int) -> jnp.ndarray:
    """Prompt-lookup drafting: trigram-first, bigram fallback.

    hist: [B, H] token history (prompt text ids then generated ids; pads and
    image sentinels are negative, so they never match). Finds the most recent
    earlier occurrence of the last 3 tokens (falling back to the last 2) and
    proposes the k tokens that followed it — the longer match has fewer false
    continuations, the shorter one keeps coverage. Rows without any match
    draft zeros (rejected by verification at the cost of nothing — the verify
    pass runs regardless).
    Returns [B, k] int32 draft ids (always valid embedding indices).
    """
    b, h = hist.shape
    start3 = _ngram_match_start(hist, hist_len, 3)
    start2 = _ngram_match_start(hist, hist_len, 2)
    start = jnp.where(start3 >= 0, start3, start2)
    gidx = jnp.clip(start[:, None] + jnp.arange(k)[None, :], 0, h - 1)
    d = jnp.take_along_axis(hist, gidx, axis=1)
    usable = (start >= 0)[:, None] & (gidx <= (hist_len - 1)[:, None]) & (d >= 0)
    return jnp.where(usable, d, 0).astype(jnp.int32)


def _sample_excluding(logits, rng, temperature, top_p, excluded):
    """Sample from the (temperature/top-p filtered) distribution with one
    token's mass removed and the rest renormalized — the RESIDUAL of
    speculative rejection sampling against a point-mass proposal.
    excluded: [B] token id, or -1 for no exclusion (plain sampling)."""
    lf = _filtered_logits(logits, temperature, top_p)
    v = lf.shape[-1]
    excl = (
        (jnp.arange(v)[None, :] == excluded[:, None]) & (excluded >= 0)[:, None]
    )
    lf = jnp.where(excl, -jnp.inf, lf)
    return jax.random.categorical(rng, lf, axis=-1).astype(jnp.int32)


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_new_tokens", "pad_id", "cache_len", "kv_dtype", "spec_k",
        "temperature", "do_sample", "top_p",
    ),
)
def generate_tokens_spec(
    params,
    cfg: LlamaConfig,
    inputs_embeds: jnp.ndarray,  # [B, S, D] fused prompt embeddings
    seq_lens: jnp.ndarray,  # [B] true fused prompt lengths
    attention_mask: jnp.ndarray,  # [B, S] prompt validity
    position_ids: jnp.ndarray,  # [B, S]
    prompt_ids: jnp.ndarray,  # [B, S_text] text token ids (pad/sentinel < 0)
    prompt_id_lens: jnp.ndarray,  # [B] valid text ids per row
    stop: StopSpec,
    rng: Optional[jax.Array] = None,
    *,
    max_new_tokens: int,
    pad_id: int = 0,
    cache_len: Optional[int] = None,
    kv_dtype: str = "bfloat16",
    spec_k: int = 4,
    temperature: float = 0.0,
    do_sample: bool = False,
    top_p: float = 1.0,
    draft_keep_prob: Optional[jnp.ndarray] = None,
    oracle_ids: Optional[jnp.ndarray] = None,
    adapter_route: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decode with prompt-lookup speculation (greedy or sampling).

    draft_keep_prob: OPTIONAL traced scalar in [0, 1] — benchmarking knob
    that randomly corrupts each drafted token with prob (1 - p) before
    verification, simulating a target acceptance rate on synthetic weights
    (bench.py measures the tok/s-vs-acceptance curve with it). None (the
    default, production) drafts verbatim; the corruption branch is not
    traced. Corruption never changes OUTPUT correctness — wrong drafts are
    rejected by verification exactly like naturally-wrong ones.

    oracle_ids: OPTIONAL [B, max_new_tokens] int32 — benchmarking knob that
    makes the greedy TARGET sequence be these tokens (positions < 0 fall back
    to the model argmax) while every forward pass still runs in full (the
    argmax stays fused into the target via a data-dependent `where`, so XLA
    cannot dead-code the verify logits). With random-init weights the model's
    own greedy output is meaningless text; forcing the target to a REAL
    TEOChat response shape (bbox lists, class-name answers — reference
    response formats: videollava/eval/detection.py:197-211) measures the
    TRUE prompt-lookup acceptance rate on that workload with true device
    step costs. Production (None) is untraced and unchanged.

    Returns (tokens [B, max_new_tokens], n_gen [B], steps, drafts_accepted) —
    `steps` is the number of verify iterations actually run (scalar int32);
    tokens/s speedup over plain decode is ~ max_new_tokens_emitted / steps.

    Greedy (do_sample=False / temperature 0): token-identical to
    generate_tokens(..., do_sample=False) — drafts are accepted iff they
    equal the model's own argmax.

    Sampling (do_sample=True, temperature > 0): exact speculative sampling
    against the point-mass draft proposal — draft d is accepted with
    probability P_target(d) (temperature/top-p filtered), and on rejection
    the next token is drawn from the residual distribution (P with d's mass
    removed, renormalized), so every emitted token is distributed EXACTLY as
    plain sampling. Outputs are not seed-reproducible vs generate_tokens
    (different randomness consumption), only distribution-identical.
    """
    b, s, _ = inputs_embeds.shape
    from teochat_tpu.models.llama import init_cache

    if rng is None:
        rng = jax.random.PRNGKey(0)

    cache = init_cache(cfg, b, cache_len, dtype=jnp.dtype(kv_dtype))
    t_max = cache.max_len

    trash = t_max - 1
    slots = jnp.where(attention_mask, position_ids, trash)
    kv_mask = jax.lax.broadcasted_iota(jnp.int32, (b, t_max), 1) < seq_lens[:, None]
    logits, cache = backend_forward(
        params, cfg, inputs_embeds,
        position_ids=position_ids, cache=cache, write_slots=slots,
        kv_mask=kv_mask,
        logits_mode="last", last_index=seq_lens - 1,
        adapter_route=adapter_route,
    )
    tokens, n_gen, steps, accepted, _ = _run_spec_decode_loop(
        params, cfg, cache, logits[:, -1], seq_lens, prompt_ids,
        prompt_id_lens, stop, rng,
        max_new_tokens=max_new_tokens, pad_id=pad_id, spec_k=spec_k,
        temperature=temperature, do_sample=do_sample, top_p=top_p,
        emb_dtype=inputs_embeds.dtype, draft_keep_prob=draft_keep_prob,
        oracle_ids=oracle_ids, adapter_route=adapter_route,
    )
    return tokens, n_gen, steps, accepted


def _run_spec_decode_loop(params, cfg, cache, logits0, start_pos, prompt_ids,
                          prompt_id_lens, stop, rng, *, max_new_tokens,
                          pad_id, spec_k, temperature, do_sample, top_p,
                          emb_dtype, draft_keep_prob=None, oracle_ids=None,
                          adapter_route=None):
    """The speculative decode while_loop (called inside a jit context).

    start_pos: [B] cache slot of the first generated token per row (all prior
    slots hold committed K/V — a fresh prefill or a session's committed
    conversation). prompt_ids/prompt_id_lens seed the draft-lookup history.
    Returns (tokens, n_gen, steps, accepted, cache).
    """
    b = start_pos.shape[0]
    t_max = cache.max_len
    m = stop.keyword_ids.shape[1]
    k = spec_k
    rows = jnp.arange(b)
    sampling = do_sample and temperature > 0.0

    h_max = prompt_ids.shape[1] + max_new_tokens
    hist0 = jnp.concatenate(
        [
            jnp.asarray(prompt_ids, jnp.int32),
            jnp.full((b, max_new_tokens), -1, jnp.int32),
        ],
        axis=1,
    )
    # prompt ids are left-aligned with -1 pads at the tail (build_fusion_plan
    # keeps text order), so hist positions [0, prompt_id_lens) are real ids.

    def record(tokens, n_gen, hist, hist_len, window, done, tok, valid):
        """Append `tok` where `valid`; returns updated buffers (one token)."""
        t_idx = jnp.minimum(n_gen, max_new_tokens - 1)
        old_t = tokens[rows, t_idx]
        tokens = tokens.at[rows, t_idx].set(jnp.where(valid, tok, old_t))
        h_idx = jnp.minimum(hist_len, h_max - 1)
        old_h = hist[rows, h_idx]
        hist = hist.at[rows, h_idx].set(jnp.where(valid, tok, old_h))
        win_new = jnp.concatenate([window[:, 1:], tok[:, None]], axis=1)
        window = jnp.where(valid[:, None], win_new, window)
        hit = (tok == stop.eos_id) | _keyword_hit(window, stop)
        done = done | (valid & hit)
        n_gen = n_gen + valid.astype(jnp.int32)
        hist_len = hist_len + valid.astype(jnp.int32)
        done = done | (n_gen >= max_new_tokens)
        return tokens, n_gen, hist, hist_len, window, done

    def step_fn(state):
        (cache, tokens, window, done, n_gen, hist, hist_len, logits,
         cur_rng, rejected, steps, accepted) = state
        # the carried logits continue the last recorded token's context;
        # `rejected` is the draft the previous iteration's chain rejected
        # (sampling: tok0 must come from the residual distribution)
        if sampling:
            tok_rng, u_rng, next_rng = jax.random.split(cur_rng, 3)
            tok0 = _sample_excluding(logits, tok_rng, temperature, top_p,
                                     rejected)
        else:
            u_rng, next_rng = cur_rng, cur_rng
            tok0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            if oracle_ids is not None:
                # bench-only: the target sequence is the oracle where it has
                # tokens; the where keeps the argmax (and thus the full
                # forward) live against dead-code elimination
                o0 = oracle_ids[rows, jnp.minimum(n_gen, max_new_tokens - 1)]
                tok0 = jnp.where(o0 >= 0, o0, tok0)
        tok0 = jnp.where(done, pad_id, tok0)
        pos0 = start_pos + n_gen  # cache slot of tok0, per row
        valid0 = ~done
        tokens, n_gen, hist, hist_len, window, done = record(
            tokens, n_gen, hist, hist_len, window, done, tok0, valid0
        )
        drafts = _draft_lookup(hist, hist_len, k)  # [B, k]
        if draft_keep_prob is not None:
            # bench-only acceptance forcing: corrupt each draft with prob
            # (1 - keep); a corrupted draft (+1) never equals the target, so
            # the per-position acceptance rate ~= keep on echo-happy weights
            ckey = jax.random.fold_in(rng, steps)
            u = jax.random.uniform(ckey, drafts.shape)
            wrong = (drafts + 1) % cfg.vocab_size  # stay a valid embed index
            drafts = jnp.where(u < draft_keep_prob, drafts, wrong)

        blk = jnp.concatenate([tok0[:, None], drafts], axis=1)  # [B, k+1]
        blk_pos = pos0[:, None] + jnp.arange(k + 1)[None, :]
        blk_pos = jnp.minimum(blk_pos, t_max - 2)  # stay off the trash slot
        kv_mask = (
            jax.lax.broadcasted_iota(jnp.int32, (b, t_max), 1)
            <= (pos0 + k)[:, None]
        )
        emb = backend_embed(params, cfg, blk, dtype=emb_dtype)
        blk_logits, cache = backend_forward(
            params, cfg, emb, position_ids=blk_pos, cache=cache,
            write_slots=blk_pos, kv_mask=kv_mask, logits_mode="all",
            spec_verify=True, adapter_route=adapter_route,
        )  # [B, k+1, V]

        if sampling:
            # accept draft j with prob P_{j-1}(d_j) — exact speculative
            # sampling against the point-mass (deterministic) draft proposal
            p = jax.nn.softmax(
                _filtered_logits(blk_logits[:, :k], temperature, top_p),
                axis=-1,
            )  # [B, k, V]
            pd = jnp.take_along_axis(p, drafts[..., None], axis=-1)[..., 0]
            u = jax.random.uniform(u_rng, (b, k))
            match = u < pd
        else:
            # draft j is correct iff it equals the greedy target after
            # position j-1 (AND all earlier drafts matched — cumprod below)
            targets = jnp.argmax(blk_logits, axis=-1).astype(jnp.int32)
            if oracle_ids is not None:
                # target at draft j is the oracle's output slot n_gen + j
                # (n_gen here already counts tok0, recorded above)
                oidx = jnp.clip(
                    n_gen[:, None] + jnp.arange(k)[None, :],
                    0, max_new_tokens - 1,
                )
                otgt = jnp.take_along_axis(oracle_ids, oidx, axis=1)
                targets = targets.at[:, :k].set(
                    jnp.where(otgt >= 0, otgt, targets[:, :k])
                )
            match = drafts == targets[:, :k]
        acc = jnp.cumprod(match.astype(jnp.int32), axis=1).astype(bool)
        rec = jnp.zeros((b,), jnp.int32)  # drafts recorded this iteration
        for j in range(k):
            valid = acc[:, j] & ~done
            tokens, n_gen, hist, hist_len, window, done = record(
                tokens, n_gen, hist, hist_len, window, done,
                drafts[:, j], valid,
            )
            rec = rec + valid.astype(jnp.int32)
        accepted = accepted + jnp.sum(rec)
        # next iteration samples from the logits after the last recorded
        # token; if the chain stopped on a STATISTICAL rejection (not a
        # done/max cap), the rejected draft's mass must be excluded there
        logits = blk_logits[rows, rec]
        if sampling:
            first_try = drafts[rows, jnp.minimum(rec, k - 1)]
            was_rejected = (rec < k) & ~match[rows, jnp.minimum(rec, k - 1)]
            rejected = jnp.where(was_rejected, first_try, -1)
        return (cache, tokens, window, done, n_gen, hist, hist_len, logits,
                next_rng, rejected, steps + 1, accepted)

    def cond_fn(state):
        done = state[3]
        return ~jnp.all(done)

    tokens0 = jnp.full((b, max_new_tokens), pad_id, jnp.int32)
    window0 = jnp.full((b, m), -1, jnp.int32)
    state = (
        cache, tokens0, window0, jnp.zeros((b,), bool),
        jnp.zeros((b,), jnp.int32), hist0,
        jnp.asarray(prompt_id_lens, jnp.int32), logits0,
        rng, jnp.full((b,), -1, jnp.int32),
        jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
    )
    state = jax.lax.while_loop(cond_fn, step_fn, state)
    (cache, tokens, _, _, n_gen, _, _, _, _, _, steps, accepted) = state
    return tokens, n_gen, steps, accepted, cache


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_new_tokens", "pad_id", "spec_k", "temperature",
        "do_sample", "top_p",
    ),
    donate_argnums=(2,),
)
def decode_with_cache_spec(params, cfg, cache, logits0, start_pos,
                           prompt_ids, prompt_id_lens, stop, rng, *,
                           max_new_tokens, pad_id=0, spec_k=4,
                           temperature=0.0, do_sample=False, top_p=1.0,
                           adapter_route=None):
    """Speculative decode continuing over an existing (session) cache.

    Same contract as decode_with_cache plus prompt-lookup speculation:
    prompt_ids seeds the draft history with the FULL conversation so far
    (earlier turns included — multi-turn chats echo themselves heavily).
    The caller must size the cache with spec_k extra slots beyond
    start_pos + max_new_tokens (plus the trash slot). Returns
    (tokens, n_gen, steps, accepted, cache)."""
    emb_dtype = (
        cache.dtype
        if cache.dtype != jnp.dtype("float8_e4m3fn") else jnp.bfloat16
    )
    return _run_spec_decode_loop(
        params, cfg, cache, logits0, start_pos, prompt_ids, prompt_id_lens,
        stop, rng,
        max_new_tokens=max_new_tokens, pad_id=pad_id, spec_k=spec_k,
        temperature=temperature, do_sample=do_sample, top_p=top_p,
        emb_dtype=emb_dtype, adapter_route=adapter_route,
    )

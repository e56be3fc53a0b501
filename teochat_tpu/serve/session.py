"""Incremental multi-turn decoding: one KV cache per chat session.

The reference demo re-renders the whole conversation each turn and re-prefills
it through HF generate (teochat_demo.py:513-546) — turn-N TTFT grows with the
entire history, and every frame is re-encoded every turn. A `ChatSession`
keeps one persistent KV cache: each turn finds the longest committed token
prefix of the newly rendered conversation, prefills only the suffix after it
(`generation.prefill_suffix` — masked attention over the committed cache), and
decodes in place. Frames inside the reused prefix are never re-encoded.

Robustness: reuse is by longest-common-prefix over token ids, so BPE boundary
effects from re-tokenizing the joined conversation (or user-edited history)
degrade gracefully — the session just re-prefills from the divergence point.
Token parity: a session turn produces the same tokens as a stateless
`TEOChat.generate` on the full conversation (up to floating-point argmax ties
between the suffix-prefill and full-prefill program shapes; see
models/generation.py).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from teochat_tpu.config import GenerationConfig
from teochat_tpu.models import fusion as fusion_mod
from teochat_tpu.models import generation as gen_mod
from teochat_tpu.models import llama as llama_mod
from teochat_tpu.models import teochat as teochat_mod


def _count_sentinels(ids: Sequence[int]) -> int:
    return sum(1 for t in ids if t == fusion_mod.IMAGE_TOKEN_INDEX)


class ChatSession:
    """One conversation's persistent KV cache over a TEOChat model."""

    def __init__(self, model: teochat_mod.TEOChat, *, max_len: int = 4096):
        self.model = model
        self.max_len = max_len
        # KV allocated LAZILY on the first turn: an idle session costs no HBM
        # (a 7B/4096 bf16 cache is ~2.1 GB — multi-session servers keep many)
        self.cache = None
        self.tokens: List[int] = []  # full rendered conversation (token ids)
        self.kv_len = 0  # leading tokens of `tokens` whose K/V are committed
        self.stats = {"turns": 0, "reused_tokens": 0, "prefilled_tokens": 0}

    # ------------------------------------------------------------ helpers
    def _fused_len(self, n_tokens: int) -> int:
        sent = _count_sentinels(self.tokens[:n_tokens])
        return n_tokens + sent * (self.model.tokens_per_frame - 1)

    def reset(self):
        self.cache = None  # dropped; reallocated on the next turn
        self.tokens = []
        self.kv_len = 0

    def _ensure_cache(self):
        if self.cache is None:
            self.cache = llama_mod.init_cache(
                self.model.cfg.llm, 1, self.max_len, dtype=self.model._dtype
            )

    # ------------------------------------------------------------ generate
    def generate(
        self,
        input_ids: Sequence[int],
        pixel_values: Optional[np.ndarray],  # frames for ALL sentinels, flat
        gen: Optional[GenerationConfig] = None,
        rng: Optional[jax.Array] = None,
    ) -> List[int]:
        """One turn: `input_ids` is the FULL rendered conversation so far
        (same contract as TEOChat.generate with a single row). Returns the
        generated ids (stop string included)."""
        model, cfg = self.model, self.model.cfg
        gen = gen or GenerationConfig()
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        input_ids = list(input_ids)

        n_sent = _count_sentinels(input_ids)
        if n_sent:
            if pixel_values is None or pixel_values.shape[0] != n_sent:
                got = None if pixel_values is None else pixel_values.shape[0]
                raise ValueError(f"conversation needs {n_sent} frames, got {got}")

        # longest committed prefix of the new conversation
        lcp = 0
        for a, b in zip(self.tokens, input_ids):
            if a != b:
                break
            lcp += 1
        reuse = min(lcp, self.kv_len)
        if reuse >= len(input_ids):  # degenerate: nothing new to prefill
            reuse = len(input_ids) - 1
        delta = input_ids[reuse:]
        start_tok = self._fused_len(reuse)

        # frames for sentinels inside the delta only
        sent_prefix = _count_sentinels(input_ids[:reuse])
        delta_sent = n_sent - sent_prefix
        if delta_sent:
            vision = model.encode(pixel_values[sent_prefix:])
        else:
            vision = jnp.zeros(
                (1, model.tokens_per_frame, cfg.llm.hidden_size), model._dtype
            )

        fused_delta = len(delta) + _count_sentinels(delta) * (
            model.tokens_per_frame - 1
        )
        spec_k = gen.speculative_k
        if start_tok + fused_delta + gen.max_new_tokens + spec_k + 1 > self.max_len:
            raise ValueError(
                f"session cache full: {start_tok} committed + {fused_delta} new "
                f"+ {gen.max_new_tokens} generated + {spec_k} draft slots + 1 "
                f"spare exceeds max_len {self.max_len}"
            )
        self._ensure_cache()
        pad_to = min(
            teochat_mod.round_to_bucket(fused_delta, teochat_mod.SEQ_BUCKETS),
            self.max_len,
        )
        plan = fusion_mod.build_fusion_plan(
            [delta], tokens_per_frame=model.tokens_per_frame,
            max_length=self.max_len, pad_to=pad_to,
        )
        embeds = teochat_mod.multimodal_embeds(model.params, cfg, plan, vision)

        llm = model.params["llm"]
        if reuse == 0:
            logits, self.cache = gen_mod.prefill_full(
                llm, cfg.llm, self.cache, embeds, plan.seq_lens,
                plan.attention_mask, plan.position_ids,
            )
        else:
            logits, self.cache = gen_mod.prefill_suffix(
                llm, cfg.llm, self.cache, embeds,
                jnp.asarray([start_tok], jnp.int32), plan.seq_lens,
                plan.attention_mask, plan.position_ids,
            )

        if self.model.tokenizer is not None and gen.stop_strings:
            stop = gen_mod.make_stop_spec(
                gen.stop_strings, self.model.tokenizer, cfg.llm.eos_token_id
            )
        else:
            stop = gen_mod.StopSpec(
                keyword_ids=jnp.zeros((1, 1), jnp.int32),
                keyword_lens=jnp.zeros((1,), jnp.int32),
                eos_id=jnp.asarray(cfg.llm.eos_token_id, jnp.int32),
            )
        start_pos = jnp.asarray([start_tok], jnp.int32) + plan.seq_lens
        if spec_k > 0:
            # prompt-lookup speculation seeded with the FULL conversation —
            # earlier turns are prime draft material (chats echo themselves)
            width = teochat_mod.round_to_bucket(
                len(input_ids), teochat_mod.SEQ_BUCKETS
            )
            hist_ids = np.full((1, width), -1, np.int32)
            hist_ids[0, : len(input_ids)] = input_ids
            tokens, n_gen, steps, accepted, self.cache = (
                gen_mod.decode_with_cache_spec(
                    llm, cfg.llm, self.cache, logits, start_pos,
                    jnp.asarray(hist_ids),
                    jnp.asarray([len(input_ids)], jnp.int32), stop, rng,
                    max_new_tokens=gen.max_new_tokens,
                    pad_id=cfg.llm.pad_token_id,
                    spec_k=spec_k,
                    temperature=gen.temperature,
                    do_sample=gen.do_sample,
                    top_p=gen.top_p,
                )
            )
            self.stats["spec_steps"] = (
                self.stats.get("spec_steps", 0) + int(steps)
            )
            self.stats["spec_accepted"] = (
                self.stats.get("spec_accepted", 0) + int(accepted)
            )
        else:
            tokens, n_gen, self.cache = gen_mod.decode_with_cache(
                llm, cfg.llm, self.cache, logits, start_pos, stop, rng,
                max_new_tokens=gen.max_new_tokens,
                temperature=gen.temperature,
                do_sample=gen.do_sample and gen.temperature > 0.0,
                top_p=gen.top_p,
                pad_id=cfg.llm.pad_token_id,
            )
        out = np.asarray(tokens)[0, : int(np.asarray(n_gen)[0])].tolist()

        self.tokens = input_ids + out
        # prefill commits every prompt token's K/V; decode commits every
        # generated token's except the last sampled one (never fed back)
        self.kv_len = len(self.tokens) - 1 if out else len(input_ids)
        self.stats["turns"] += 1
        self.stats["reused_tokens"] += reuse
        self.stats["prefilled_tokens"] += len(delta)
        return out

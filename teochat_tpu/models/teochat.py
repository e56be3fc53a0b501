"""TEOChat flagship model: frozen CLIP tower + projector + LLaMA decoder.

The TPU-native equivalent of LlavaLlamaForCausalLM + LlavaMetaForCausalLM
(reference llava_llama.py:40-111, llava_arch.py:27-346): a params pytree
{'vision','projector','llm'} and pure jitted entry points, with a thin
imperative wrapper for the harnesses. Shapes are bucketed so XLA compiles a
small, reused set of programs instead of one per example (the static-shape
answer to the reference's ragged fusion, SURVEY §7 hard-parts).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from teochat_tpu.config import GenerationConfig, TEOChatConfig
from teochat_tpu.models import fusion as fusion_mod
from teochat_tpu.models import generation as gen_mod
from teochat_tpu.models import llama as llama_mod
from teochat_tpu.models import projector as proj_mod
from teochat_tpu.models import vit as vit_mod

Params = Dict

# Prefill-length buckets (fused tokens): 16 frames x 257 + text fits in 3072+1024
SEQ_BUCKETS = (128, 256, 512, 768, 1024, 1536, 2048, 3072, 4352)
FRAME_BUCKETS = (1, 2, 4, 8, 16)


def round_to_bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return ((n + 511) // 512) * 512


def init_teochat(rng: jax.Array, cfg: TEOChatConfig, dtype=jnp.float32) -> Params:
    r1, r2, r3 = jax.random.split(rng, 3)
    from teochat_tpu.config import MptConfig

    if isinstance(cfg.llm, MptConfig):  # LLaVA-MPT variant (llava_mpt.py:45)
        from teochat_tpu.models.mpt import init_mpt

        llm = init_mpt(r3, cfg.llm, dtype)
    else:
        llm = llama_mod.init_llama(r3, cfg.llm, dtype)
    return {
        "vision": vit_mod.init_vit(r1, cfg.vision, dtype),
        "projector": proj_mod.init_projector(r2, cfg.projector, dtype),
        "llm": llm,
    }


@partial(jax.jit, static_argnames=("cfg", "num_frames"))
def encode_frames(
    params: Params, cfg: TEOChatConfig, pixel_values: jnp.ndarray, num_frames: int = 1
) -> jnp.ndarray:
    """[N, 3, H, W] -> [N, tokens_per_frame, D_llm] (encode_images + projector,
    reference llava_arch.py:137-140)."""
    hidden = vit_mod.vit_forward(
        params["vision"], cfg.vision, pixel_values,
        select_layer=cfg.mm_vision_select_layer, num_frames=num_frames,
    )
    feats = vit_mod.select_features(hidden, cfg.mm_vision_select_feature)
    return proj_mod.projector_forward(params["projector"], cfg.projector, feats)


def fuse_embeds(
    llm_params: Params, plan: fusion_mod.FusionPlan, vision_tokens: jnp.ndarray
) -> jnp.ndarray:
    """Token embeddings + vision splice -> [B, L, D] (trace-time helper;
    shared by multimodal_embeds and the serving engine's fused prefill)."""
    # backend dispatch on the params layout: MPT uses a tied "wte" table
    if "wte" in llm_params:
        from teochat_tpu.models.mpt import mpt_embed

        text_emb = mpt_embed(llm_params, plan.text_ids, dtype=vision_tokens.dtype)
    else:
        text_emb = llama_mod.embed_tokens(
            llm_params, plan.text_ids, dtype=vision_tokens.dtype
        )
    return fusion_mod.fuse(text_emb, vision_tokens, plan)


@partial(jax.jit, static_argnames=("cfg",))
def multimodal_embeds(
    params: Params, cfg: TEOChatConfig, plan: fusion_mod.FusionPlan,
    vision_tokens: jnp.ndarray,
) -> jnp.ndarray:
    """Token embeddings + vision splice -> [B, L, D]."""
    return fuse_embeds(params["llm"], plan, vision_tokens)


@partial(jax.jit, static_argnames=("cfg", "remat"))
def forward_train(
    params: Params, cfg: TEOChatConfig, plan: fusion_mod.FusionPlan,
    pixel_values: jnp.ndarray, remat: bool = False,
) -> jnp.ndarray:
    """Training forward: returns mean next-token cross-entropy over valid labels
    (the reference delegates this to HF's shifted CE, llava_llama.py:56-99).
    `remat` rematerializes decoder layers in the backward pass (the HF
    gradient-checkpointing equivalent, reference train.py:977-988)."""
    vision_tokens = encode_frames(params, cfg, pixel_values)
    embeds = multimodal_embeds(params, cfg, plan, vision_tokens)
    from teochat_tpu.config import MptConfig

    if isinstance(cfg.llm, MptConfig):
        from teochat_tpu.models.mpt import mpt_forward

        # MPT trains PREFIX-LM style in the reference only via converters it
        # never uses for LLaVA-MPT; the causal path matches llava_mpt.py.
        logits, _ = mpt_forward(
            params["llm"], cfg.llm, embeds,
            attention_mask=plan.attention_mask, remat=remat,
        )
    else:
        logits, _ = llama_mod.llama_forward(
            params["llm"], cfg.llm, embeds,
            position_ids=plan.position_ids, attention_mask=plan.attention_mask,
            right_padded=True,  # right-padded fusion plans enable flash vjp
            remat=remat,
        )
    shift_logits = logits[:, :-1]
    shift_labels = plan.labels[:, 1:]
    valid = shift_labels != fusion_mod.IGNORE_INDEX
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    tok_lp = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    return -(tok_lp * valid).sum() / jnp.maximum(valid.sum(), 1)


class TEOChat:
    """Imperative shell for the harnesses (eval/serve/train drivers)."""

    def __init__(self, cfg: TEOChatConfig, params: Params, tokenizer=None):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self._dtype = jnp.dtype(cfg.dtype)
        # filled by generate() when prompt-lookup speculation runs
        self.last_spec_stats: Optional[Dict] = None

    @property
    def tokens_per_frame(self) -> int:
        n = self.cfg.vision.num_patches
        return n if self.cfg.mm_vision_select_feature == "patch" else n + 1

    def encode(self, pixel_values: np.ndarray) -> jnp.ndarray:
        """Encode N frames (bucketed to avoid recompiles)."""
        n = pixel_values.shape[0]
        nb = round_to_bucket(n, FRAME_BUCKETS)
        if nb != n:
            pad = np.zeros((nb - n,) + pixel_values.shape[1:], pixel_values.dtype)
            pixel_values = np.concatenate([pixel_values, pad], axis=0)
        toks = encode_frames(
            self.params, self.cfg, jnp.asarray(pixel_values, self._dtype)
        )
        return toks[:n]

    def generate(
        self,
        input_ids: Sequence[Sequence[int]],
        pixel_values: Optional[np.ndarray],  # [N_frames, 3, H, W] flat batch order
        gen: Optional[GenerationConfig] = None,
        rng: Optional[jax.Array] = None,
        stop_spec: Optional[gen_mod.StopSpec] = None,
        adapters: Optional[Sequence[int]] = None,
    ) -> List[List[int]]:
        """Batched generate; returns generated ids per row (stop string included).

        `adapters` (multi-LoRA params only — train/lora.py
        stack_lora_adapters): per-row adapter index, -1 = base model."""
        gen = gen or GenerationConfig()
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        cfg = self.cfg
        adapter_route = None
        if adapters is not None:
            from teochat_tpu.train import lora as lora_mod

            n_adapters = lora_mod.num_stacked_adapters(self.params["llm"])
            if not n_adapters:
                raise ValueError(
                    "adapters= given but params carry no adapter-stacked "
                    "LoRA leaves (use train.lora.stack_lora_adapters)"
                )
            adapter_route = lora_mod.adapter_route(adapters, n_adapters)

        n_frames = fusion_mod.count_frames(input_ids)
        if n_frames:
            if pixel_values is None or pixel_values.shape[0] != n_frames:
                got = None if pixel_values is None else pixel_values.shape[0]
                raise ValueError(f"prompt needs {n_frames} frames, got {got}")
            vision_tokens = self.encode(pixel_values)
        else:
            vision_tokens = jnp.zeros(
                (1, self.tokens_per_frame, cfg.llm.hidden_size), self._dtype
            )

        fused_len = max(
            len(r) + sum(1 for t in r if t == fusion_mod.IMAGE_TOKEN_INDEX)
            * (self.tokens_per_frame - 1)
            for r in input_ids
        )
        pad_to = round_to_bucket(
            min(fused_len, cfg.tokenizer_model_max_length), SEQ_BUCKETS
        )
        plan = fusion_mod.build_fusion_plan(
            input_ids,
            tokens_per_frame=self.tokens_per_frame,
            max_length=cfg.tokenizer_model_max_length,
            pad_to=pad_to,
        )
        embeds = multimodal_embeds(self.params, cfg, plan, vision_tokens)

        b = len(input_ids)
        if stop_spec is None:
            if self.tokenizer is not None and gen.stop_strings:
                stop_spec = gen_mod.make_stop_spec(
                    gen.stop_strings, self.tokenizer, cfg.llm.eos_token_id
                )
            else:
                stop_spec = gen_mod.StopSpec(
                    keyword_ids=jnp.zeros((1, 1), jnp.int32),
                    keyword_lens=jnp.zeros((1,), jnp.int32),
                    eos_id=jnp.asarray(cfg.llm.eos_token_id, jnp.int32),
                )

        # cache is allocated inside the program (+1 spare slot: padded prefill
        # tokens park their K/V there — generation trash-slot note)
        if gen.speculative_k > 0:
            # prompt-lookup speculation: greedy runs are token-identical to
            # the plain path; sampling runs are distribution-exact (residual
            # rejection sampling) but consume randomness differently, so they
            # are not seed-reproducible vs the plain path.
            # prompt_ids' width is a traced shape of the jitted loop — bucket
            # it like the fused embeds so eval sweeps reuse compiled programs
            s_text = round_to_bucket(
                max(len(r) for r in input_ids), SEQ_BUCKETS
            )
            prompt_ids = np.full((b, s_text), -1, np.int32)
            for i, r in enumerate(input_ids):
                prompt_ids[i, : len(r)] = r
            prompt_lens = np.asarray([len(r) for r in input_ids], np.int32)
            tokens, n_gen, steps, accepted = gen_mod.generate_tokens_spec(
                self.params["llm"], cfg.llm, embeds,
                plan.seq_lens, plan.attention_mask, plan.position_ids,
                jnp.asarray(prompt_ids), jnp.asarray(prompt_lens),
                stop_spec, rng,
                max_new_tokens=gen.max_new_tokens,
                pad_id=cfg.llm.pad_token_id,
                cache_len=pad_to + gen.max_new_tokens + gen.speculative_k + 1,
                kv_dtype=str(jnp.dtype(self._dtype)),
                spec_k=gen.speculative_k,
                temperature=gen.temperature,
                do_sample=gen.do_sample,
                top_p=gen.top_p,
                draft_keep_prob=(
                    None if gen.speculative_draft_keep_prob is None
                    else jnp.float32(gen.speculative_draft_keep_prob)
                ),
                adapter_route=adapter_route,
            )
            self.last_spec_stats = {
                "steps": int(steps), "drafts_accepted": int(accepted),
                "tokens": int(np.asarray(n_gen).sum()),
            }
        else:
            tokens, n_gen = gen_mod.generate_tokens(
                self.params["llm"], cfg.llm, embeds,
                plan.seq_lens, plan.attention_mask, plan.position_ids,
                None, stop_spec, rng,
                max_new_tokens=gen.max_new_tokens,
                temperature=gen.temperature,
                do_sample=gen.do_sample,
                top_p=gen.top_p,
                pad_id=cfg.llm.pad_token_id,
                cache_len=pad_to + gen.max_new_tokens + 1,
                kv_dtype=str(jnp.dtype(self._dtype)),
                adapter_route=adapter_route,
            )
        tokens = np.asarray(tokens)
        n_gen = np.asarray(n_gen)
        return [tokens[i, : n_gen[i]].tolist() for i in range(b)]

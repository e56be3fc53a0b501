"""Sharded train step: fully-sharded params + optimizer state via GSPMD.

The ZeRO-3 replacement (reference scripts/zero3*.json + llava_trainer.py):
params are placed with parallel/sharding.py rules; optimizer state initialized
*inside* jit inherits those shardings through propagation (zeros_like of a
sharded arg), so param + Adam moments are sharded over the fsdp axis with no
gather/offload machinery. Gradient remat replaces HF gradient checkpointing.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from teochat_tpu.config import TEOChatConfig
from teochat_tpu.models import fusion as fusion_mod
from teochat_tpu.models import teochat as teochat_mod


class TrainState(NamedTuple):
    params: Dict
    opt_state: Any
    step: jnp.ndarray


def _is_none(x) -> bool:
    return x is None


def partition_params(params: Dict, trainable_filter) -> Tuple[Dict, Dict]:
    """Split params into (trainable, frozen) pytrees of the same structure,
    with None at the complementary leaves (equinox partition style).

    This matters beyond ergonomics: gradients are only computed for trainable
    leaves (int8/int4 quantized backbone weights are not differentiable) and
    optimizer moments are only allocated for them (full-7B Adam moments would
    be ~54 GB the k-bit LoRA recipe never needs).
    """
    from teochat_tpu.parallel.sharding import _path_str

    mask = jax.tree_util.tree_map_with_path(
        lambda path, _: bool(trainable_filter(_path_str(path))), params
    )
    trainable = jax.tree.map(lambda m, p: p if m else None, mask, params)
    frozen = jax.tree.map(lambda m, p: None if m else p, mask, params)
    return trainable, frozen


def combine_params(trainable: Dict, frozen: Dict) -> Dict:
    return jax.tree.map(
        lambda a, b: b if a is None else a, trainable, frozen, is_leaf=_is_none
    )


def make_optimizer(
    learning_rate: float = 2e-4,
    *,
    projector_lr: Optional[float] = None,
    warmup_ratio: float = 0.03,
    total_steps: int = 10000,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    lr_scheduler_type: str = "cosine",
    max_grad_norm: Optional[float] = 1.0,
    warmup_steps: int = 0,
) -> optax.GradientTransformation:
    """AdamW + warmup + decay schedule (reference train_teochat.sh:31-34,
    --lr_scheduler_type cosine), with the separate mm_projector learning-rate
    group (llava_trainer.py:150-237). Scheduler names follow HF SchedulerType:
    cosine | linear | constant | constant_with_warmup. max_grad_norm=1.0 is
    the HF Trainer default the reference trains under (global-norm clip before
    Adam); warmup_steps > 0 overrides warmup_ratio (HF semantics)."""

    def schedule(lr):
        warmup = warmup_steps or max(int(total_steps * warmup_ratio), 1)
        if lr_scheduler_type == "cosine":
            return optax.warmup_cosine_decay_schedule(
                init_value=0.0, peak_value=lr, warmup_steps=warmup,
                decay_steps=total_steps, end_value=0.0,
            )
        if lr_scheduler_type == "linear":
            return optax.join_schedules(
                [
                    optax.linear_schedule(0.0, lr, warmup),
                    optax.linear_schedule(
                        lr, 0.0, max(total_steps - warmup, 1)
                    ),
                ],
                [warmup],
            )
        if lr_scheduler_type == "constant":
            return optax.constant_schedule(lr)
        if lr_scheduler_type == "constant_with_warmup":
            return optax.join_schedules(
                [optax.linear_schedule(0.0, lr, warmup),
                 optax.constant_schedule(lr)],
                [warmup],
            )
        raise ValueError(f"unsupported lr_scheduler_type: {lr_scheduler_type}")

    clip = (
        [optax.clip_by_global_norm(max_grad_norm)]
        if max_grad_norm and max_grad_norm > 0
        else []
    )
    base = optax.adamw(schedule(learning_rate), b1=b1, b2=b2, weight_decay=weight_decay)
    if projector_lr is None:
        return optax.chain(*clip, base)
    proj = optax.adamw(schedule(projector_lr), b1=b1, b2=b2, weight_decay=weight_decay)

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "projector"
            if any(getattr(p, "key", None) == "projector" for p in path)
            else "base",
            params,
        )

    # clip on the FULL grad tree before the per-group transforms (HF clips
    # the global norm across all parameter groups, llava_trainer inherits it)
    return optax.chain(
        *clip, optax.multi_transform({"base": base, "projector": proj}, label_fn)
    )


def init_train_state(
    params: Dict,
    optimizer: optax.GradientTransformation,
    trainable_filter: Optional[Callable[[str], bool]] = None,
) -> TrainState:
    """Call under jit with sharded params so moments inherit param shardings.

    With a trainable_filter, optimizer state covers only the trainable subtree."""
    if trainable_filter is None:
        opt_state = optimizer.init(params)
    else:
        trainable, _ = partition_params(params, trainable_filter)
        opt_state = optimizer.init(trainable)
    return TrainState(params=params, opt_state=opt_state, step=jnp.asarray(0))


def make_train_step(
    cfg: TEOChatConfig,
    optimizer: optax.GradientTransformation,
    *,
    trainable_filter: Optional[Callable[[str], bool]] = None,
    remat: bool = False,
) -> Callable:
    """Build the jitted train step.

    trainable_filter(path)->bool freezes params — the reference freezes the
    tower always and the LLM backbone under LoRA (train.py:974-1006).
    Gradients flow ONLY to trainable leaves (the int8/int4 k-bit backbone is
    not differentiable) and the optimizer update runs on that subtree.
    `remat` rematerializes decoder layers (HF gradient-checkpointing stand-in).
    """

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(
        state: TrainState, plan: fusion_mod.FusionPlan, pixel_values: jnp.ndarray
    ) -> Tuple[TrainState, jnp.ndarray]:
        if trainable_filter is None:
            def loss_fn(params):
                return teochat_mod.forward_train(
                    params, cfg, plan, pixel_values, remat=remat
                )

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
        else:
            trainable, frozen = partition_params(state.params, trainable_filter)

            def loss_fn(trainable):
                params = combine_params(trainable, frozen)
                return teochat_mod.forward_train(
                    params, cfg, plan, pixel_values, remat=remat
                )

            loss, grads = jax.value_and_grad(loss_fn)(trainable)
            updates, opt_state = optimizer.update(grads, state.opt_state, trainable)
            new_trainable = optax.apply_updates(trainable, updates)
            params = combine_params(new_trainable, frozen)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step

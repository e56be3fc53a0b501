"""GPipe-style pipeline parallelism over a `pipe` mesh axis.

The reference has no pipeline parallelism (SURVEY §2.4: model-code parallelism
is delegated entirely to DeepSpeed ZeRO, which shards optimizer state, not
layers). This module adds the TPU-native layer-sharding lever the stacked
param convention was built for: every decoder layer leaf already carries a
leading [L, ...] axis, so "stage s holds layers [s·L/P, (s+1)·L/P)" is just a
`PartitionSpec("pipe", ...)` — no parameter surgery. Activations flow
stage-to-stage over neighbor ICI links via `jax.lax.ppermute` in the classic
GPipe microbatch rotation: M microbatches drain through P stages in M + P - 1
steps (bubble fraction (P-1)/(M+P-1)).

Differentiable end-to-end: the schedule is a `lax.scan`, ppermute's transpose
is the reverse rotation, and the final psum's transpose broadcasts cotangents
back to the last stage — `jax.grad` through a pipelined forward matches the
non-pipelined grads exactly (tests/test_pipeline.py asserts fwd and bwd
parity on an 8-device CPU mesh).

Composition: the `pipe` axis nests with data/fsdp/model GSPMD sharding (the
shard_map here is manual only over `pipe`; the other mesh axes stay
automatic). It does NOT compose with `sequence_axis` (ring attention inside a
pipeline stage would nest shard_maps) — llama_forward rejects that combo.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def pipelined_scan_blocks(
    layers,  # pytree of stacked [L, ...] leaves (the repo-wide convention)
    block_fn: Callable,  # (x, layer_params, *mb_args) -> x
    x: jnp.ndarray,  # [B, S, D]
    batched_args: Sequence[Optional[jnp.ndarray]] = (),  # each [B, ...]
    *,
    axis_name: str = "pipe",
    num_microbatches: Optional[int] = None,
) -> jnp.ndarray:
    """Run all L layers over x with the layer axis sharded on `axis_name`.

    Trace-time wrapper (call inside jit under an active mesh, like
    ring_attention.ring_self_attention): shard_map splits the stacked layer
    leaves' leading axis across the pipeline stages and runs the microbatch
    rotation. Returns the full [B, S, D] result, replicated over the axis.

    `batched_args` are per-example operands (leading dim B — RoPE tables,
    padding masks, ALiBi has none) that each stage indexes for the microbatch
    it is currently processing; None entries pass through as None.

    The batch is split into `num_microbatches` (default: the stage count)
    equal microbatches; B must divide evenly. Each scan step, stage s
    processes microbatch t - s: stage 0 injects fresh input, inner stages
    consume the neighbor ppermute from step t-1, the last stage records its
    result. Fill/drain bubbles compute on zero inputs (rms_norm(0) is finite)
    and are never written out.
    """
    mesh = jax.sharding.get_abstract_mesh()
    if axis_name not in mesh.shape:
        raise ValueError(
            f"pipeline axis {axis_name!r} not in the active mesh {mesh.shape}"
        )
    p = mesh.shape[axis_name]
    n_layers = jax.tree.leaves(layers)[0].shape[0]
    if n_layers % p:
        raise ValueError(f"{n_layers} layers not divisible by {axis_name}={p}")
    m = num_microbatches or p
    b = x.shape[0]
    if b % m:
        raise ValueError(f"batch {b} not divisible by {m} microbatches")
    mb = b // m

    def split(a):  # [B, ...] -> [M, mb, ...]
        return a.reshape(m, mb, *a.shape[1:])

    xs = split(x)
    present = [i for i, a in enumerate(batched_args) if a is not None]
    args_s = tuple(split(batched_args[i]) for i in present)

    def stage_fn(local_layers, xs, *args_s):
        stage = jax.lax.axis_index(axis_name)

        def run_local(x_in, mb_args):
            full_args = [None] * len(batched_args)
            for slot, a in zip(present, mb_args):
                full_args[slot] = a

            def body(carry, lp):
                return block_fn(carry, lp, *full_args), None

            y, _ = jax.lax.scan(body, x_in, local_layers)
            return y

        # partial perm: stage 0 receives zeros (unused — it injects fresh
        # microbatches), so no wrap-around link is scheduled
        perm = [(i, i + 1) for i in range(p - 1)]

        def step(carry, t):
            recv, out_buf = carry
            # stage s processes microbatch t - s at step t (clip keeps the
            # index in range during fill/drain; those results are discarded)
            mb_idx = jnp.clip(t - stage, 0, m - 1)
            take = lambda a: jax.lax.dynamic_index_in_dim(
                a, mb_idx, 0, keepdims=False
            )
            x_in = jnp.where(stage == 0, take(xs), recv)
            y = run_local(x_in, tuple(take(a) for a in args_s))
            out_idx = jnp.clip(t - (p - 1), 0, m - 1)
            write = jnp.logical_and(stage == p - 1, t >= p - 1)
            prev = jax.lax.dynamic_index_in_dim(out_buf, out_idx, 0,
                                                keepdims=False)
            out_buf = jax.lax.dynamic_update_index_in_dim(
                out_buf, jnp.where(write, y, prev), out_idx, 0
            )
            recv = jax.lax.ppermute(y, axis_name, perm) if p > 1 else y
            return (recv, out_buf), None

        init = (jnp.zeros_like(xs[0]), jnp.zeros_like(xs))
        (_, out_buf), _ = jax.lax.scan(step, init, jnp.arange(m + p - 1))
        # results live on the last stage; broadcast so downstream (final
        # norm / lm_head / loss) runs replicated over the pipe axis. One
        # activation all-reduce per forward — the GPipe price of keeping the
        # head/loss unsharded. (A loss-on-last-stage variant would trade
        # this for a scalar psum; not needed at parity scale.)
        return jax.lax.psum(
            jnp.where(stage == p - 1, out_buf, jnp.zeros_like(out_buf)),
            axis_name,
        )

    layer_specs = jax.tree.map(lambda _: P(axis_name), layers)
    rep = P()
    fn = jax.shard_map(
        stage_fn,
        in_specs=(layer_specs, rep) + (rep,) * len(args_s),
        out_specs=rep,
        check_vma=False,  # psum makes the output replicated; skip the proof
        axis_names={axis_name},  # manual only over pipe; data/fsdp/model stay auto
    )
    out = fn(layers, xs, *args_s)
    return out.reshape(b, *x.shape[1:])

"""Microbench: ViT attention variants on TPU ([32, 257, 16, 64] bf16).

Times a jitted scan of dependent calls (same harness trick as
bench_int4_kernel.py). Compares XLA materialized attention against Pallas
one-shot variants.
"""

from __future__ import annotations

import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, S, H, D = 32, 257, 16, 64
ITERS = 100
_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


# --------------------------------------------------- variant A: current (pad+flatten)
def call_current(q, k, v):
    from teochat_tpu.ops.vit_attention import vit_attention

    return vit_attention(q, k, v, impl="pallas")


# --------------------------------------------------- variant B: no-pad, [B,S,H,D] blocks
def _kernel_b(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0]  # [S, bh, D]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((1,), (1,))),
        preferred_element_type=jnp.float32,
    ) * scale  # [bh, Sq, Sk]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        (p / l).astype(v.dtype), v, (((2,), (0,)), ((0,), (1,))),
        preferred_element_type=jnp.float32,
    )  # [bh, Sq, D]
    o_ref[0] = jnp.swapaxes(o, 0, 1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bh",))
def call_b(q, k, v, bh=8):
    b, s, h, d = q.shape
    scale = d ** -0.5
    grid = (b, h // bh)
    return pl.pallas_call(
        functools.partial(_kernel_b, scale=scale),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, s, bh, d), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec((1, s, bh, d), lambda i, j: (i, 0, j, 0)),
            pl.BlockSpec((1, s, bh, d), lambda i, j: (i, 0, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, s, bh, d), lambda i, j: (i, 0, j, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(q, k, v)


# ------------------------------------------- variant C: flattened rows, one head/cell
def _kernel_c(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0]  # [S, D]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [Sq, Sk]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot((p / l).astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


@jax.jit
def call_c(q, k, v):
    b, s, h, d = q.shape
    scale = d ** -0.5
    qf = jnp.swapaxes(q, 1, 2).reshape(b * h, s, d)
    kf = jnp.swapaxes(k, 1, 2).reshape(b * h, s, d)
    vf = jnp.swapaxes(v, 1, 2).reshape(b * h, s, d)
    out = pl.pallas_call(
        functools.partial(_kernel_c, scale=scale),
        out_shape=jax.ShapeDtypeStruct(qf.shape, q.dtype),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, s, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, s, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, s, d), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, s, d), lambda i: (i, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(qf, kf, vf)
    return jnp.swapaxes(out.reshape(b, h, s, d), 1, 2)


# ---------------------------------------------------------------- XLA baseline
@jax.jit
def call_xla(q, k, v):
    from teochat_tpu.ops.attention import xla_attention

    return xla_attention(q, k, v, causal=False)


def time_variant(name, call, q, k, v):
    @jax.jit
    def loop(q0):
        def body(qc, _):
            y = call(qc, k, v)
            return qc + y * jnp.bfloat16(1e-30), ()

        qf, _ = jax.lax.scan(body, q0, None, length=ITERS)
        return qf.sum()

    try:
        loop(q).block_until_ready()
    except Exception as e:
        print(f"{name:12s} FAILED: {str(e)[:140]}")
        return
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        loop(q).block_until_ready()
        times.append((time.perf_counter() - t0) / ITERS)
    ms = sorted(times)[1] * 1e3
    print(f"{name:12s} {ms:7.3f} ms/call")


def main():
    print(f"backend={jax.default_backend()}")
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(B, S, H, D), jnp.bfloat16)
    k = jnp.asarray(rs.randn(B, S, H, D), jnp.bfloat16)
    v = jnp.asarray(rs.randn(B, S, H, D), jnp.bfloat16)

    ref = np.asarray(call_xla(q, k, v), np.float32)
    for name, fn in [("current", call_current), ("b_nopad", call_b),
                     ("c_flat", call_c)]:
        try:
            got = np.asarray(fn(q, k, v), np.float32)
            err = np.max(np.abs(got - ref))
            print(f"{name:12s} max_err={err:.3e}")
        except Exception as e:
            print(f"{name:12s} corr FAILED: {str(e)[:140]}")

    time_variant("xla", lambda qq, kk, vv: call_xla(qq, kk, vv), q, k, v)
    time_variant("current", call_current, q, k, v)
    time_variant("b_nopad", call_b, q, k, v)
    time_variant("c_flat", call_c, q, k, v)


if __name__ == "__main__":
    main()

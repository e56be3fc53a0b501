"""MPT from-scratch parameter-init registry (TPU-native).

Reference: /root/reference/videollava/model/language_model/mpt/param_init_fns.py
(MODEL_INIT_REGISTRY :181, generic_param_init_fn_ :28, fused_init_helper_ :17)
and configuration_mpt.py:5 (init_config_defaults). The reference walks torch
modules and mutates weights in place; here each scheme resolves to a pure
``init_fn(key, shape, fan_in, fan_out) -> array`` and ``init_mpt_params``
builds the stacked-per-layer pytree functionally (one vmapped sample per
kernel — layers differ by fold-in of the layer axis into the shape, matching
how this repo stacks leaves for ``lax.scan``).

Semantics carried over exactly:
- residual projections (attn ``out_proj``, mlp ``down_proj`` — the reference
  sets ``module._is_residual`` on both, attention.py:61, blocks.py:27) are
  divided by ``init_div_is_residual`` (True -> sqrt(2*n_layers), numeric ->
  itself, False -> 1.0; param_init_fns.py:33-43);
- the fused Wqkv kernel is initialized per Q/K/V split so each split sees its
  own fan (fused_init_helper_ :17-27);
- the embedding uses ``emb_init_std`` (normal) else ``emb_init_uniform_lim``
  (uniform, scalar lim means symmetric) else the scheme's linear init fn with
  torch's (num_embeddings, dim) fan convention (param_init_fns.py:57-84);
- norm scales are ones, all biases zeros (:85-91) — except ``default_``,
  which reproduces torch's module defaults (kaiming_uniform a=sqrt(5) on the
  whole weight, bias ~ U(-1/sqrt(fan_in), +), embedding ~ N(0,1)) and applies
  no residual division (:10-15).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

# configuration_mpt.py:5 — merged under user-provided keys
INIT_CONFIG_DEFAULTS: Dict[str, Any] = {
    "name": "kaiming_normal_",
    "fan_mode": "fan_in",
    "init_nonlinearity": "relu",
    "init_div_is_residual": True,
    "emb_init_std": None,
    "emb_init_uniform_lim": None,
    "init_std": None,
    "init_gain": 0.0,
}

InitFn = Callable[[jax.Array, tuple, int, int], jnp.ndarray]


def _calculate_gain(nonlinearity: str, a: float = 0.0) -> float:
    """torch.nn.init.calculate_gain subset used by the kaiming schemes."""
    linear_fns = (
        "linear", "conv1d", "conv2d", "conv3d",
        "conv_transpose1d", "conv_transpose2d", "conv_transpose3d", "sigmoid",
    )
    if nonlinearity in linear_fns:
        return 1.0
    if nonlinearity == "tanh":
        return 5.0 / 3
    if nonlinearity == "relu":
        return math.sqrt(2.0)
    if nonlinearity == "leaky_relu":
        return math.sqrt(2.0 / (1 + a * a))
    raise ValueError(f"Unsupported nonlinearity {nonlinearity}")


def _normal_init(std: float) -> InitFn:
    def f(key, shape, fan_in, fan_out):
        return jax.random.normal(key, shape) * std

    return f


def _kaiming_uniform_init(a: float, fan_mode: str, nonlinearity: str) -> InitFn:
    gain = _calculate_gain(nonlinearity, a)

    def f(key, shape, fan_in, fan_out):
        fan = fan_in if fan_mode == "fan_in" else fan_out
        bound = gain * math.sqrt(3.0 / fan)
        return jax.random.uniform(key, shape, minval=-bound, maxval=bound)

    return f


def _kaiming_normal_init(a: float, fan_mode: str, nonlinearity: str) -> InitFn:
    gain = _calculate_gain(nonlinearity, a)

    def f(key, shape, fan_in, fan_out):
        fan = fan_in if fan_mode == "fan_in" else fan_out
        return jax.random.normal(key, shape) * (gain / math.sqrt(fan))

    return f


def _xavier_uniform_init(gain: float) -> InitFn:
    def f(key, shape, fan_in, fan_out):
        bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, minval=-bound, maxval=bound)

    return f


def _xavier_normal_init(gain: float) -> InitFn:
    def f(key, shape, fan_in, fan_out):
        std = gain * math.sqrt(2.0 / (fan_in + fan_out))
        return jax.random.normal(key, shape) * std

    return f


def _resolve_div_is_residual(val, n_layers: int) -> float:
    """param_init_fns.py:33-43 (incl. the numeric-string branch)."""
    if val is False:
        return 1.0
    if val is True:
        return math.sqrt(2 * n_layers)
    if isinstance(val, (int, float)):
        return float(val)
    if isinstance(val, str) and val.isnumeric():
        return float(val)
    raise ValueError(
        f"Expected init_div_is_residual to be boolean or numeric, got {val}"
    )


def _resolve_scheme(ic: Dict[str, Any], d_model: int, n_layers: int):
    """Return (linear init_fn, div_is_residual float). Raises on unknown
    name / missing init_std like the reference (:131-135, train :181)."""
    name = ic["name"]
    div = _resolve_div_is_residual(ic.get("init_div_is_residual", True), n_layers)
    gain = float(ic.get("init_gain", 0.0))
    fan_mode = ic.get("fan_mode", "fan_in")
    nonlin = ic.get("init_nonlinearity", "relu")
    if name == "baseline_":
        if ic.get("init_std") is None:
            raise ValueError(
                "You must set model.init_config['init_std'] to a float value "
                "to use the default initialization scheme."
            )
        return _normal_init(float(ic["init_std"])), div
    if name == "small_init_":
        return _normal_init(math.sqrt(2 / (5 * d_model))), div
    if name == "neox_init_":
        # small_init with residual div n_layers/sqrt(10) (:142-154)
        return _normal_init(math.sqrt(2 / (5 * d_model))), n_layers / math.sqrt(10)
    if name == "kaiming_uniform_":
        return _kaiming_uniform_init(gain, fan_mode, nonlin), div
    if name == "kaiming_normal_":
        return _kaiming_normal_init(gain, fan_mode, nonlin), div
    if name == "xavier_uniform_":
        return _xavier_uniform_init(gain), div
    if name == "xavier_normal_":
        return _xavier_normal_init(gain), div
    raise ValueError(f"Initialization scheme {name} not found in registry.")


MODEL_INIT_REGISTRY = (
    "default_", "baseline_", "kaiming_uniform_", "kaiming_normal_",
    "neox_init_", "small_init_", "xavier_uniform_", "xavier_normal_",
)


def init_mpt_params(
    rng: jax.Array, cfg, dtype=jnp.float32, init_config: Optional[dict] = None
) -> dict:
    """Build MPT params under a named init scheme (stacked-layer pytree,
    same layout as ``mpt.init_mpt``). ``init_config`` keys follow the
    reference's configuration_mpt.py:5 defaults."""
    ic = dict(INIT_CONFIG_DEFAULTS)
    ic.update(init_config or getattr(cfg, "init_config", None) or {})
    name = ic.get("name")
    if name is None:
        raise ValueError(f"init_config={ic!r} 'name' needs to be set.")
    if name not in MODEL_INIT_REGISTRY:
        raise ValueError(f"Initialization scheme {name} not found in registry.")

    d, L = cfg.d_model, cfg.n_layers
    h = cfg.n_heads
    hd = d // h
    n_kv = 1 if cfg.attn_type == "multiquery_attention" else h
    ffn = cfg.expansion_ratio * d

    keys = iter(jax.random.split(rng, 32))

    if name == "default_":
        # torch module defaults (:10-15): Linear.reset_parameters is
        # kaiming_uniform(a=sqrt(5)) over the WHOLE weight (no fused split,
        # no residual division); Embedding is N(0,1).
        lin_fn = _kaiming_uniform_init(math.sqrt(5.0), "fan_in", "leaky_relu")
        div = 1.0
        emb_fn = _normal_init(1.0)
        default_bias = True
    else:
        lin_fn, div = _resolve_scheme(ic, d, L)
        emb_std = ic.get("emb_init_std")
        emb_lim = ic.get("emb_init_uniform_lim")
        if emb_std is not None:
            emb_fn = _normal_init(float(emb_std))
        elif emb_lim is not None:
            lim = emb_lim
            if isinstance(lim, (list, tuple)):
                if len(lim) > 2:
                    raise ValueError(
                        f"Uniform init requires a min and a max limit. "
                        f"User input: {lim}."
                    )
                a, b = float(lim[0]), float(lim[1])
            else:
                a, b = -float(lim), float(lim)

            def emb_fn(key, shape, fan_in, fan_out, _a=a, _b=b):
                return jax.random.uniform(key, shape, minval=_a, maxval=_b)
        else:
            emb_fn = lin_fn
        default_bias = False

    def dense(fan_in, fan_out, is_residual=False, fused_splits=None):
        shape = (L, fan_in, fan_out)
        if fused_splits and name != "default_":
            # per-split init so each split sees its own fan (:17-27)
            bounds = (0, *fused_splits, fan_out)
            parts = [
                lin_fn(next(keys), (L, fan_in, e - s), fan_in, e - s)
                for s, e in zip(bounds[:-1], bounds[1:])
            ]
            w = jnp.concatenate(parts, axis=-1)
        else:
            w = lin_fn(next(keys), shape, fan_in, fan_out)
        if is_residual:
            w = w / div
        p = {"kernel": w.astype(dtype)}
        if not cfg.no_bias:
            if default_bias:
                bound = 1.0 / math.sqrt(fan_in)
                p["bias"] = jax.random.uniform(
                    next(keys), (L, fan_out), minval=-bound, maxval=bound
                ).astype(dtype)
            else:
                p["bias"] = jnp.zeros((L, fan_out), dtype)
        return p

    def ln():
        p = {"scale": jnp.ones((L, d), jnp.float32)}
        if not cfg.no_bias:
            p["bias"] = jnp.zeros((L, d), jnp.float32)
        return p

    final_norm = {"scale": jnp.ones((d,), jnp.float32)}
    if not cfg.no_bias:
        final_norm["bias"] = jnp.zeros((d,), jnp.float32)

    # torch Embedding weight is (num_embeddings, dim): fan_in=dim (size(1))
    emb = emb_fn(next(keys), (cfg.vocab_size, d), d, cfg.vocab_size)

    return {
        "wte": {"embedding": emb.astype(dtype)},
        "layers": {
            "norm1": ln(),
            "wqkv": dense(d, d + 2 * n_kv * hd, fused_splits=(d, d + n_kv * hd)),
            "out_proj": dense(d, d, is_residual=True),
            "norm2": ln(),
            "up_proj": dense(d, ffn),
            "down_proj": dense(ffn, d, is_residual=True),
        },
        "final_norm": final_norm,
    }

"""MPT param-init registry parity (reference mpt/param_init_fns.py,
configuration_mpt.py:5) + adapt_tokenizer_for_denoising
(reference mpt/adapt_tokenizer.py)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from teochat_tpu.config import MptConfig
from teochat_tpu.models.mpt import adapt_tokenizer_for_denoising, init_mpt
from teochat_tpu.models.mpt_init import init_mpt_params


def _tiny_cfg(**kw):
    base = dict(
        vocab_size=128, d_model=64, n_layers=3, n_heads=4,
        expansion_ratio=2, max_seq_len=64,
    )
    base.update(kw)
    return MptConfig(**base)


def test_registry_dispatch_and_structure():
    """init_mpt with cfg.init_config routes to the registry; tree layout is
    identical to the plain init (scan contract: leading layer axis)."""
    cfg_plain = _tiny_cfg()
    cfg_named = _tiny_cfg(init_config={"name": "kaiming_normal_"})
    p0 = init_mpt(jax.random.PRNGKey(0), cfg_plain)
    p1 = init_mpt(jax.random.PRNGKey(0), cfg_named)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    for a, b in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1)):
        assert a.shape == b.shape and a.dtype == b.dtype


def test_kaiming_normal_residual_division():
    """Default scheme: kaiming_normal(relu) std=sqrt(2/fan_in); residual
    projections further divided by sqrt(2*n_layers)
    (param_init_fns.py:33-43, attention.py out_proj._is_residual)."""
    cfg = _tiny_cfg(n_layers=8, d_model=256, n_heads=8)
    p = init_mpt_params(jax.random.PRNGKey(1), cfg)
    d, L = cfg.d_model, cfg.n_layers
    up = np.asarray(p["layers"]["up_proj"]["kernel"], np.float64)
    out = np.asarray(p["layers"]["out_proj"]["kernel"], np.float64)
    exp_std = math.sqrt(2.0 / d)  # gain sqrt(2) / sqrt(fan_in)
    assert abs(up.std() - exp_std) / exp_std < 0.05
    assert abs(out.std() - exp_std / math.sqrt(2 * L)) / exp_std < 0.05
    # non-residual vs residual differ exactly by the div factor in scale
    assert out.std() < up.std() / 2


def test_baseline_requires_init_std_and_matches():
    with pytest.raises(ValueError):
        init_mpt_params(
            jax.random.PRNGKey(0), _tiny_cfg(),
            init_config={"name": "baseline_"},
        )
    p = init_mpt_params(
        jax.random.PRNGKey(0), _tiny_cfg(d_model=256),
        init_config={"name": "baseline_", "init_std": 0.03,
                     "init_div_is_residual": False},
    )
    w = np.asarray(p["layers"]["up_proj"]["kernel"], np.float64)
    assert abs(w.std() - 0.03) / 0.03 < 0.05


def test_neox_small_init_and_div():
    """neox = small_init std sqrt(2/(5d)) with residual div n_layers/sqrt(10)
    (param_init_fns.py:142-154)."""
    cfg = _tiny_cfg(d_model=256, n_layers=10)
    p = init_mpt_params(jax.random.PRNGKey(2), cfg,
                        init_config={"name": "neox_init_"})
    std = math.sqrt(2 / (5 * cfg.d_model))
    up = np.asarray(p["layers"]["up_proj"]["kernel"], np.float64)
    out = np.asarray(p["layers"]["out_proj"]["kernel"], np.float64)
    assert abs(up.std() - std) / std < 0.05
    exp_out = std / (cfg.n_layers / math.sqrt(10))
    assert abs(out.std() - exp_out) / exp_out < 0.05


def test_embedding_overrides():
    cfg = _tiny_cfg(vocab_size=512, d_model=128)
    p = init_mpt_params(
        jax.random.PRNGKey(3), cfg,
        init_config={"name": "small_init_", "emb_init_std": 0.5},
    )
    e = np.asarray(p["wte"]["embedding"], np.float64)
    assert abs(e.std() - 0.5) / 0.5 < 0.05

    p = init_mpt_params(
        jax.random.PRNGKey(4), cfg,
        init_config={"name": "small_init_", "emb_init_uniform_lim": 0.2},
    )
    e = np.asarray(p["wte"]["embedding"], np.float64)
    assert e.min() >= -0.2 and e.max() <= 0.2
    assert abs(e.std() - 0.2 / math.sqrt(3)) < 0.02

    with pytest.raises(ValueError):
        init_mpt_params(
            jax.random.PRNGKey(5), cfg,
            init_config={"name": "small_init_",
                         "emb_init_uniform_lim": (0.1, 0.2, 0.3)},
        )


def test_default_scheme_torch_module_defaults():
    """default_ = torch reset_parameters: N(0,1) embedding, kaiming_uniform
    a=sqrt(5) linears (bound 1/sqrt(fan_in)), no residual division."""
    cfg = _tiny_cfg(d_model=256)
    p = init_mpt_params(jax.random.PRNGKey(6), cfg,
                        init_config={"name": "default_"})
    e = np.asarray(p["wte"]["embedding"], np.float64)
    assert abs(e.std() - 1.0) < 0.05
    up = np.asarray(p["layers"]["up_proj"]["kernel"], np.float64)
    out = np.asarray(p["layers"]["out_proj"]["kernel"], np.float64)
    bound = 1.0 / math.sqrt(cfg.d_model)
    assert up.max() <= bound + 1e-9 and up.min() >= -bound - 1e-9
    # no residual division under default_
    assert abs(out.std() - up.std()) / up.std() < 0.05


def test_fused_wqkv_per_split_fans():
    """Multiquery Wqkv: Q split (width d) and K/V splits (width head_dim) get
    their own xavier bounds (fused_init_helper_ :17-27)."""
    cfg = _tiny_cfg(d_model=128, n_heads=8, attn_type="multiquery_attention")
    p = init_mpt_params(
        jax.random.PRNGKey(7), cfg,
        init_config={"name": "xavier_uniform_", "init_gain": 1.0},
    )
    w = np.asarray(p["layers"]["wqkv"]["kernel"], np.float64)
    d, hd = cfg.d_model, cfg.d_model // cfg.n_heads
    q, kv = w[..., :d], w[..., d:]
    bound_q = math.sqrt(6.0 / (d + d))
    bound_kv = math.sqrt(6.0 / (d + hd))
    assert abs(np.abs(q).max() - bound_q) / bound_q < 0.05
    assert abs(np.abs(kv).max() - bound_kv) / bound_kv < 0.05
    assert np.abs(kv).max() > np.abs(q).max()  # smaller fan -> larger bound


def test_unknown_scheme_rejected():
    with pytest.raises(ValueError):
        init_mpt_params(jax.random.PRNGKey(0), _tiny_cfg(),
                        init_config={"name": "made_up_"})
    with pytest.raises(ValueError):
        init_mpt_params(jax.random.PRNGKey(0), _tiny_cfg(),
                        init_config={"name": "small_init_",
                                     "init_div_is_residual": "not-a-number"})


def test_initialized_params_run_forward():
    from teochat_tpu.models.mpt import mpt_embed, mpt_forward

    cfg = _tiny_cfg(init_config={"name": "kaiming_normal_"})
    p = init_mpt(jax.random.PRNGKey(8), cfg, dtype=jnp.float32)
    ids = jnp.array([[1, 2, 3, 4]], jnp.int32)
    h = mpt_embed(p, ids)
    logits, _ = mpt_forward(p, cfg, h)
    assert logits.shape == (1, 4, cfg.vocab_size)
    assert bool(jnp.isfinite(logits).all())


def test_adapt_tokenizer_for_denoising(tmp_path):
    """Sentinels + pad token + sentinel_token_ids (adapt_tokenizer.py:6-23)."""
    transformers = pytest.importorskip("transformers")
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    vocab = {"<unk>": 0, "hello": 1, "world": 2}
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    tok.save(str(tmp_path / "tokenizer.json"))
    t = transformers.PreTrainedTokenizerFast(
        tokenizer_file=str(tmp_path / "tokenizer.json"), unk_token="<unk>"
    )
    adapt_tokenizer_for_denoising(t)
    assert t.pad_token == "<pad>" and t.pad_token_id is not None
    assert len(t.sentinel_token_ids) == 100
    assert len(set(t.sentinel_token_ids)) == 100
    before = len(t)
    adapt_tokenizer_for_denoising(t)  # idempotent
    assert len(t) == before

"""Weight-management utils: LoRA merge to standalone ckpt, deltas, consolidate."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from teochat_tpu.checkpoint.orbax_io import load_checkpoint, save_checkpoint
from teochat_tpu.checkpoint.weights import (
    apply_delta,
    consolidate_ckpt,
    make_delta,
    merge_lora_weights,
    upload_weights,
)
from teochat_tpu.config import tiny_test_config
from teochat_tpu.models.teochat import init_teochat
from teochat_tpu.train.lora import add_lora_params


def test_merge_lora_weights_roundtrip(tmp_path):
    cfg = tiny_test_config()
    params = init_teochat(jax.random.PRNGKey(0), cfg)
    params["llm"] = add_lora_params(jax.random.PRNGKey(1), params["llm"], rank=4)
    # make the adapters nonzero so the merge changes weights
    params["llm"]["layers"]["attn"]["q"]["lora_b"] = (
        jnp.ones_like(params["llm"]["layers"]["attn"]["q"]["lora_b"]) * 0.01
    )
    src = save_checkpoint(str(tmp_path / "lora_ckpt"), params, cfg)
    out = merge_lora_weights(src, str(tmp_path / "merged"))
    merged, cfg2, _ = load_checkpoint(out)
    assert "lora_a" not in merged["llm"]["layers"]["attn"]["q"]
    assert cfg2 is not None
    base_q = np.asarray(params["llm"]["layers"]["attn"]["q"]["kernel"])
    merged_q = np.asarray(merged["llm"]["layers"]["attn"]["q"]["kernel"])
    assert np.abs(merged_q - base_q).max() > 1e-5


def test_make_apply_delta_roundtrip():
    cfg = tiny_test_config()
    base = init_teochat(jax.random.PRNGKey(0), cfg)
    target = init_teochat(jax.random.PRNGKey(1), cfg)
    delta = make_delta(base, target)
    recon = apply_delta(base, delta)
    a = np.asarray(recon["llm"]["layers"]["attn"]["q"]["kernel"])
    b = np.asarray(target["llm"]["layers"]["attn"]["q"]["kernel"])
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_consolidate(tmp_path):
    cfg = tiny_test_config()
    params = init_teochat(jax.random.PRNGKey(0), cfg)
    src = save_checkpoint(str(tmp_path / "src"), params, cfg)
    out = consolidate_ckpt(src, str(tmp_path / "dst"))
    re_params, re_cfg, _ = load_checkpoint(out)
    assert re_cfg is not None
    np.testing.assert_allclose(
        np.asarray(re_params["projector"]["layers"][0]["kernel"]),
        np.asarray(params["projector"]["layers"][0]["kernel"]),
    )


def test_upload_stub():
    with pytest.raises(RuntimeError, match="egress-free"):
        upload_weights()

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


def test_upload_weights_injected_transport(tmp_path):
    """Artifact collection is real; the network client is injected."""
    cfg = tiny_test_config()
    params = init_teochat(jax.random.PRNGKey(0), cfg)
    ckpt = save_checkpoint(str(tmp_path / "ckpt"), params, cfg)
    tok_dir = tmp_path / "tok"
    tok_dir.mkdir()
    (tok_dir / "tokenizer_config.json").write_text("{}")
    (tok_dir / "special_tokens_map.json").write_text("{}")

    calls = []

    def fake_transport(repo_id, files, private):
        calls.append((repo_id, dict(files), private))

    files = upload_weights(
        ckpt, "someone/teochat-tpu", tokenizer_path=str(tok_dir),
        private=True, transport=fake_transport,
    )
    assert calls and calls[0][0] == "someone/teochat-tpu" and calls[0][2]
    # every file under the checkpoint tree ships, with repo-relative names
    import os

    expected = set()
    for root, _, names in os.walk(ckpt):
        for n in names:
            expected.add(
                os.path.relpath(os.path.join(root, n), ckpt).replace(os.sep, "/")
            )
    assert expected and expected <= set(files)
    assert all(os.sep not in rel or os.sep == "/" for rel in files)
    # tokenizer files present; the nonexistent ones skipped
    assert "tokenizer_config.json" in files
    assert "tokenizer.model" not in files


def test_upload_weights_missing_dir(tmp_path):
    with pytest.raises(FileNotFoundError):
        upload_weights(str(tmp_path / "nope"), "r/r", transport=lambda *a: None)

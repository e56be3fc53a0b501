"""Pipeline parallelism (parallel/pipeline.py): parity vs the plain scan.

Runs on the conftest 8-virtual-device CPU mesh. The GPipe microbatch rotation
applies exactly the same layer ops in the same order as the sequential scan,
so forward logits AND parameter gradients must match to fp32 tolerance.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from teochat_tpu.config import LlamaConfig, MeshConfig
from teochat_tpu.models.llama import init_llama, llama_forward
from teochat_tpu.parallel.mesh import create_mesh
from teochat_tpu.parallel.sharding import param_specs, shard_params

pytestmark = pytest.mark.slow  # heavy suite: excluded from the smoke tier


def _cfg(**kw):
    base = dict(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_layers=8,
        num_heads=4,
        num_kv_heads=4,
        max_position_embeddings=64,
    )
    base.update(kw)
    return LlamaConfig(**base)


def _pipe_mesh(p=4, extra=None):
    cfg = MeshConfig(pipe=p, **(extra or {}))
    n = p * int(np.prod(list((extra or {}).values()))) if extra else p
    return create_mesh(cfg, devices=jax.devices()[:n])


def _inputs(cfg, b=4, s=16, seed=0):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.randn(b, s, cfg.hidden_size) * 0.1, jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(s), (b, s))
    return x, pos


def _fwd(params, cfg, x, pos, mask=None):
    logits, _ = llama_forward(
        params, cfg, x, position_ids=pos, attention_mask=mask,
        right_padded=mask is None,
    )
    return logits


@pytest.mark.parametrize("microbatches", [None, 2, 4])
def test_pipeline_forward_matches_scan(microbatches):
    cfg = _cfg()
    params = init_llama(jax.random.PRNGKey(0), cfg, jnp.float32)
    x, pos = _inputs(cfg)
    ref = _fwd(params, cfg, x, pos)

    mesh = _pipe_mesh(4)
    pcfg = dataclasses.replace(
        cfg, pipeline_axis="pipe", pipeline_microbatches=microbatches
    )
    with jax.set_mesh(mesh):
        sharded = shard_params({"llm": params}, mesh)["llm"]
        got = jax.jit(lambda p: _fwd(p, pcfg, x, pos))(sharded)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_forward_with_padding_mask():
    """Non-right-padded batches: the padding mask rides with its microbatch."""
    cfg = _cfg()
    params = init_llama(jax.random.PRNGKey(1), cfg, jnp.float32)
    x, pos = _inputs(cfg, seed=2)
    mask = jnp.asarray(
        np.random.RandomState(3).rand(*x.shape[:2]) > 0.2, jnp.bool_
    )
    ref = _fwd(params, cfg, x, pos, mask)

    mesh = _pipe_mesh(4)
    pcfg = dataclasses.replace(cfg, pipeline_axis="pipe")
    with jax.set_mesh(mesh):
        got = jax.jit(lambda p: _fwd(p, pcfg, x, pos, mask))(params)
    # compare only valid positions: masked rows see different attention
    valid = np.asarray(mask)[:, :, None]
    np.testing.assert_allclose(
        np.asarray(got) * valid, np.asarray(ref) * valid,
        rtol=2e-5, atol=2e-5,
    )


def test_pipeline_gradients_match_scan():
    cfg = _cfg()
    params = init_llama(jax.random.PRNGKey(4), cfg, jnp.float32)
    x, pos = _inputs(cfg, b=4, s=8, seed=5)
    probe = jnp.asarray(
        np.random.RandomState(6).randn(4, 8, cfg.vocab_size) * 0.01,
        jnp.float32,
    )

    def loss(p, c):
        return jnp.sum(_fwd(p, c, x, pos) * probe)

    ref_grads = jax.grad(lambda p: loss(p, cfg))(params)

    mesh = _pipe_mesh(4)
    pcfg = dataclasses.replace(cfg, pipeline_axis="pipe")
    with jax.set_mesh(mesh):
        got_grads = jax.jit(jax.grad(lambda p: loss(p, pcfg)))(params)

    flat_ref = jax.tree_util.tree_leaves_with_path(ref_grads)
    flat_got = jax.tree.leaves(got_grads)
    assert len(flat_ref) == len(flat_got)
    for (path, r), g in zip(flat_ref, flat_got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=5e-5, atol=5e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_pipeline_composes_with_data_axis():
    """pipe=4 x data=2 on 8 devices: GSPMD batch sharding around the
    shard_map (manual only over pipe)."""
    cfg = _cfg()
    params = init_llama(jax.random.PRNGKey(7), cfg, jnp.float32)
    x, pos = _inputs(cfg, b=8, s=8, seed=8)
    ref = _fwd(params, cfg, x, pos)

    mesh = create_mesh(MeshConfig(data=2, pipe=4), devices=jax.devices())
    pcfg = dataclasses.replace(cfg, pipeline_axis="pipe")
    with jax.set_mesh(mesh):
        sharded = shard_params({"llm": params}, mesh)["llm"]
        got = jax.jit(lambda p: _fwd(p, pcfg, x, pos))(sharded)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_spec_shards_layer_axis():
    mesh = create_mesh(MeshConfig(pipe=4), devices=jax.devices()[:4])
    cfg = _cfg()
    params = {"llm": init_llama(jax.random.PRNGKey(0), cfg, jnp.float32)}
    specs = param_specs(params, mesh)
    assert specs["llm"]["layers"]["attn"]["q"]["kernel"][0] == "pipe"
    assert specs["llm"]["layers"]["input_norm"]["scale"][0] == "pipe"
    # unstacked leaves stay off the pipe axis
    assert "pipe" not in (specs["llm"]["final_norm"]["scale"] or ())


def test_pipeline_rejects_bad_shapes():
    cfg = _cfg(num_layers=6)  # 6 % 4 != 0
    params = init_llama(jax.random.PRNGKey(0), cfg, jnp.float32)
    x, pos = _inputs(cfg)
    mesh = _pipe_mesh(4)
    pcfg = dataclasses.replace(cfg, pipeline_axis="pipe")
    with jax.set_mesh(mesh):
        with pytest.raises(ValueError, match="not divisible"):
            jax.jit(lambda p: _fwd(p, pcfg, x, pos)).eval_shape(params)

    cfg = _cfg()
    params = init_llama(jax.random.PRNGKey(0), cfg, jnp.float32)
    x, pos = _inputs(cfg, b=3)  # 3 % 4 microbatches
    with jax.set_mesh(mesh):
        with pytest.raises(ValueError, match="not divisible"):
            jax.jit(lambda p: _fwd(p, pcfg, x, pos)).eval_shape(params)


def test_pipeline_rejects_sequence_combo():
    cfg = dataclasses.replace(
        _cfg(), pipeline_axis="pipe", sequence_axis="sequence"
    )
    params = init_llama(jax.random.PRNGKey(0), cfg, jnp.float32)
    x, pos = _inputs(cfg)
    with pytest.raises(ValueError, match="cannot be combined"):
        _fwd(params, cfg, x, pos)


def test_pipeline_mpt_forward_matches_scan():
    """The MPT backend rides the same pipeline (ALiBi bias closes over the
    block; only the padding mask travels with its microbatch)."""
    from teochat_tpu.config import MptConfig
    from teochat_tpu.models.mpt import init_mpt, mpt_forward

    cfg = MptConfig(
        vocab_size=128, d_model=32, n_layers=8, n_heads=4, max_seq_len=64
    )
    params = init_mpt(jax.random.PRNGKey(9), cfg, jnp.float32)
    rs = np.random.RandomState(10)
    x = jnp.asarray(rs.randn(4, 16, cfg.d_model) * 0.1, jnp.float32)
    mask = jnp.asarray(rs.rand(4, 16) > 0.2, jnp.bool_)

    ref, _ = mpt_forward(params, cfg, x, attention_mask=mask)

    mesh = _pipe_mesh(4)
    pcfg = dataclasses.replace(cfg, pipeline_axis="pipe")
    with jax.set_mesh(mesh):
        got, _ = jax.jit(
            lambda p: mpt_forward(p, pcfg, x, attention_mask=mask)
        )(params)
    valid = np.asarray(mask)[:, :, None]
    np.testing.assert_allclose(
        np.asarray(got) * valid, np.asarray(ref) * valid,
        rtol=2e-5, atol=2e-5,
    )

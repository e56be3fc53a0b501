"""Partition-rule unit tests + mesh construction."""

import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

from teochat_tpu.config import MeshConfig, tiny_test_config
from teochat_tpu.models.teochat import init_teochat
from teochat_tpu.parallel.mesh import create_mesh, local_mesh
from teochat_tpu.parallel.sharding import param_specs, shard_params, spec_for_path


def test_spec_rules():
    assert spec_for_path("llm/layers/attn/q/kernel") == P(None, "fsdp", "model")
    assert spec_for_path("llm/layers/attn/out/kernel") == P(None, "model", "fsdp")
    assert spec_for_path("llm/layers/mlp/down/kernel") == P(None, "model", "fsdp")
    assert spec_for_path("llm/embed_tokens/embedding") == P("model", "fsdp")
    assert spec_for_path("llm/layers/input_norm/scale") == P()
    assert spec_for_path("llm/layers/attn/q/lora_a") == P(None, "fsdp", None)
    assert spec_for_path("vision/layers/mlp/fc1/kernel") == P(None, "fsdp", "model")
    assert spec_for_path("projector/layers/0/kernel") == P("fsdp", "model")
    assert spec_for_path("anything/else") == P()


def test_param_specs_rank_clipped():
    cfg = tiny_test_config()
    params = init_teochat(jax.random.PRNGKey(0), cfg)
    specs = param_specs(params)
    # every spec's rank fits its leaf
    for spec, leaf in zip(jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P)),
                          jax.tree.leaves(params)):
        assert len(spec) <= leaf.ndim


def test_create_mesh_variants():
    devices = jax.devices()
    assert len(devices) == 8  # conftest virtual mesh
    m = create_mesh(MeshConfig(data=2, fsdp=2, model=2))
    assert dict(zip(m.axis_names, m.devices.shape)) == {"data": 2, "fsdp": 2, "model": 2}
    m2 = create_mesh(MeshConfig(data=1, fsdp=-1, model=2))
    assert m2.devices.shape == (1, 4, 2)
    with pytest.raises(ValueError):
        create_mesh(MeshConfig(data=3, fsdp=1, model=1))
    with pytest.raises(ValueError):
        create_mesh(MeshConfig(data=-1, fsdp=-1, model=1))
    assert local_mesh().devices.shape == (1, 8, 1)


def test_shard_params_places_on_mesh():
    cfg = tiny_test_config()
    params = init_teochat(jax.random.PRNGKey(0), cfg)
    mesh = create_mesh(MeshConfig(data=1, fsdp=4, model=2))
    sharded = shard_params(params, mesh)
    q = sharded["llm"]["layers"]["attn"]["q"]["kernel"]
    # fsdp axis shards fan-in (64/4), model shards fan-out (64/2)
    shard_shapes = {s.data.shape for s in q.addressable_shards}
    assert shard_shapes == {(cfg.llm.num_layers, 64 // 4, 64 // 2)}

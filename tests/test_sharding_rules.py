"""Partition-rule unit tests + mesh construction."""

import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

from teochat_tpu.config import MeshConfig, tiny_test_config
from teochat_tpu.models.teochat import init_teochat
from teochat_tpu.parallel.mesh import create_mesh, local_mesh
from teochat_tpu.parallel.sharding import param_specs, shard_params, spec_for_path

pytestmark = pytest.mark.slow  # heavy suite: excluded from the smoke tier


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


def test_spec_rules_int4():
    # flat packed mirrors the kernel orientation
    assert spec_for_path("llm/layers/attn/q/packed") == P(None, "fsdp", "model")
    assert spec_for_path("llm/layers/mlp/down/packed") == P(None, "model", "fsdp")
    assert spec_for_path("llm/lm_head/packed") == P("fsdp", "model")
    # tiled layout [L, out/bn, in/2, bn]: tile axis follows the output dim
    assert spec_for_path("llm/layers/attn/q/packed_tiles") == P(None, "model", "fsdp", None)
    assert spec_for_path("llm/layers/attn/out/packed_tiles") == P(None, "fsdp", "model", None)
    assert spec_for_path("llm/layers/mlp/up/packed_tiles") == P(None, "model", "fsdp", None)
    assert spec_for_path("llm/layers/mlp/down/packed_tiles") == P(None, "fsdp", "model", None)
    assert spec_for_path("llm/lm_head/packed_tiles") == P("model", "fsdp", None)
    # int4 scales hit the same rules as int8 scales (same leaf name)
    assert spec_for_path("llm/layers/attn/q/scale") == P(None, "model")
    assert spec_for_path("llm/layers/mlp/down/scale") == P(None, "fsdp")


def _quantized_forward_equivalence(quantize_fn, cfg_kwargs):
    """Quantized decoder logits on a (2,2,2) mesh == single-device logits."""
    import dataclasses

    import jax.numpy as jnp

    from teochat_tpu.config import tiny_test_config
    from teochat_tpu.models import llama as llama_mod

    cfg = dataclasses.replace(tiny_test_config().llm, **cfg_kwargs)
    params = llama_mod.init_llama(jax.random.PRNGKey(0), cfg)
    qparams = quantize_fn(params)
    b, s = 2, 8
    embeds = jnp.asarray(
        np.random.RandomState(0).randn(b, s, cfg.hidden_size), jnp.float32
    )
    pos = jnp.tile(jnp.arange(s, dtype=jnp.int32), (b, 1))
    amask = jnp.ones((b, s), bool)

    def fwd(p, e):
        logits, _ = llama_mod.llama_forward(
            p, cfg, e, position_ids=pos, attention_mask=amask
        )
        return logits

    ref = np.asarray(jax.jit(fwd)(qparams, embeds))
    mesh = create_mesh(MeshConfig(data=2, fsdp=2, model=2))
    wrapped = shard_params({"llm": qparams}, mesh)["llm"]
    with jax.set_mesh(mesh):
        got = np.asarray(jax.jit(fwd)(wrapped, embeds))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_int8_decoder_sharded_matmul_equivalence():
    from teochat_tpu.ops.quant import quantize_llama_params

    _quantized_forward_equivalence(quantize_llama_params, {})


def test_int4_tiled_decoder_sharded_matmul_equivalence():
    # dims multiples of 256 so quantization takes the tiled ('packed_tiles')
    # layout and the tile axis actually shards over model=2 (>=2 tiles/proj)
    from teochat_tpu.ops.quant import quantize_llama_params_int4

    _quantized_forward_equivalence(
        quantize_llama_params_int4,
        dict(hidden_size=512, intermediate_size=1024, num_heads=8,
             num_kv_heads=8, vocab_size=512),
    )


def test_int4_flat_packed_sharded():
    """Small dims fall back to the flat 'packed' layout; it must still shard."""
    from teochat_tpu.ops.quant import quantize_llama_params_int4

    _quantized_forward_equivalence(quantize_llama_params_int4, {})


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


def test_speculative_decode_sharded_equivalence():
    """generate_tokens_spec on a (2,2,2) mesh emits the same tokens as on a
    single device — the spec_verify scatter/masked-attention path must stay
    correct under GSPMD param sharding (multi-chip speculative serving)."""
    import jax.numpy as jnp

    from teochat_tpu.models import generation as gen_mod
    from teochat_tpu.models import llama as llama_mod

    cfg = tiny_test_config().llm
    params = llama_mod.init_llama(jax.random.PRNGKey(0), cfg)
    b, s = 2, 8
    embeds = jnp.asarray(
        np.random.RandomState(0).randn(b, s, cfg.hidden_size) * 0.1, jnp.float32
    )
    pos = jnp.tile(jnp.arange(s, dtype=jnp.int32), (b, 1))
    amask = jnp.ones((b, s), bool)
    seq_lens = jnp.asarray([s, s], jnp.int32)
    prompt_ids = jnp.asarray(
        np.random.RandomState(1).randint(3, 50, (b, s)), jnp.int32
    )
    stop = gen_mod.StopSpec(
        keyword_ids=jnp.zeros((1, 1), jnp.int32),
        keyword_lens=jnp.zeros((1,), jnp.int32),
        eos_id=jnp.asarray(-1, jnp.int32),
    )

    def run(p):
        toks, n, steps, acc = gen_mod.generate_tokens_spec(
            p, cfg, embeds, seq_lens, amask, pos, prompt_ids,
            jnp.asarray([s, s], jnp.int32), stop,
            max_new_tokens=6, cache_len=s + 6 + 3 + 1, spec_k=3,
        )
        return toks, n

    ref_toks, ref_n = (np.asarray(x) for x in run(params))
    mesh = create_mesh(MeshConfig(data=2, fsdp=2, model=2))
    sharded = shard_params({"llm": params}, mesh)["llm"]
    with jax.set_mesh(mesh):
        got_toks, got_n = (np.asarray(x) for x in run(sharded))
    assert got_n.tolist() == ref_n.tolist()
    assert got_toks.tolist() == ref_toks.tolist()


def test_suffix_prefill_sharded_equivalence():
    """prefill_suffix logits on the mesh match single-device (incremental
    sessions under sharded params)."""
    import jax.numpy as jnp

    from teochat_tpu.models import generation as gen_mod
    from teochat_tpu.models import llama as llama_mod

    cfg = tiny_test_config().llm
    params = llama_mod.init_llama(jax.random.PRNGKey(1), cfg)
    rs = np.random.RandomState(2)
    emb1 = jnp.asarray(rs.randn(1, 8, cfg.hidden_size) * 0.1, jnp.float32)
    emb2 = jnp.asarray(rs.randn(1, 8, cfg.hidden_size) * 0.1, jnp.float32)
    ar = jnp.arange(8, dtype=jnp.int32)[None]
    ones = jnp.ones((1, 8), bool)
    lens = jnp.asarray([8], jnp.int32)

    def run(p):
        cache = llama_mod.init_cache(cfg, 1, 32, dtype=jnp.float32)
        _, cache = gen_mod.prefill_full(p, cfg, cache, emb1, lens, ones, ar)
        logits, _ = gen_mod.prefill_suffix(
            p, cfg, cache, emb2, jnp.asarray([8], jnp.int32), lens, ones, ar
        )
        return logits

    ref = np.asarray(run(params))
    mesh = create_mesh(MeshConfig(data=2, fsdp=2, model=2))
    sharded = shard_params({"llm": params}, mesh)["llm"]
    with jax.set_mesh(mesh):
        got = np.asarray(run(sharded))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_spec_rules_mpt():
    assert spec_for_path("llm/layers/wqkv/kernel") == P(None, "fsdp", "model")
    assert spec_for_path("llm/layers/out_proj/kernel") == P(None, "model", "fsdp")
    assert spec_for_path("llm/layers/up_proj/kernel") == P(None, "fsdp", "model")
    assert spec_for_path("llm/layers/down_proj/kernel") == P(None, "model", "fsdp")
    assert spec_for_path("llm/layers/wqkv/scale") == P(None, "model")
    assert spec_for_path("llm/layers/down_proj/bias") == P(None, "fsdp")
    assert spec_for_path("llm/layers/norm1/scale") == P()
    assert spec_for_path("llm/wte/embedding") == P("model", "fsdp")
    assert spec_for_path("llm/layers/wqkv/lora_a") == P(None, "fsdp", None)


def test_mpt_sharded_train_step():
    """A sharded MPT train step on the (2,2,2) mesh: params actually placed
    by the MPT rules, loss finite, logits match the unsharded forward."""
    import dataclasses

    import jax.numpy as jnp

    from teochat_tpu.config import MptConfig
    from teochat_tpu.models import fusion as fusion_mod
    from teochat_tpu.models import teochat as teochat_mod
    from teochat_tpu.constants import IMAGE_TOKEN_INDEX
    from teochat_tpu.train.trainer import (
        init_train_state, make_optimizer, make_train_step,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    base = tiny_test_config(vocab_size=96)
    cfg = dataclasses.replace(
        base,
        llm=MptConfig(vocab_size=96, d_model=64, n_layers=2, n_heads=4,
                      expansion_ratio=2, max_seq_len=128),
        llm_backend="mpt",
    )
    params = init_teochat(jax.random.PRNGKey(0), cfg)
    mesh = create_mesh(MeshConfig(data=2, fsdp=2, model=2))
    with jax.set_mesh(mesh):
        sharded = shard_params(params, mesh)
        spec = sharded["llm"]["layers"]["wqkv"]["kernel"].sharding.spec
        assert tuple(spec) == (None, "fsdp", "model")
        optimizer = make_optimizer(1e-3, total_steps=10)
        state = jax.jit(lambda p: init_train_state(p, optimizer))(sharded)
        step = make_train_step(cfg, optimizer)
        ids = [[1, IMAGE_TOKEN_INDEX, 9, 11], [1, IMAGE_TOKEN_INDEX, 7, 8],
               [1, IMAGE_TOKEN_INDEX, 5, 6], [1, IMAGE_TOKEN_INDEX, 3, 4]]
        labels = [[-100, -100, 9, 11], [-100, -100, 7, 8],
                  [-100, -100, 5, 6], [-100, -100, 3, 4]]
        plan = fusion_mod.build_fusion_plan(
            ids, labels=labels, tokens_per_frame=cfg.vision.num_patches,
            pad_to=16,
        )
        pixels = jnp.asarray(
            np.random.RandomState(0).randn(4, 3, 28, 28), jnp.float32
        )
        state, loss = step(state, plan, pixels)
        assert np.isfinite(float(loss))

"""Ring attention (context parallelism): exact match vs full attention.

Runs on the conftest 8-virtual-device CPU mesh; the ring schedule and the
ppermute rotation are identical to what executes over ICI on a pod slice.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from teochat_tpu.ops.attention import xla_attention
from teochat_tpu.parallel.ring_attention import (

    context_parallel_attention,
    ring_attention,
)

pytestmark = pytest.mark.slow  # heavy suite: excluded from the smoke tier


def _mesh(n=8):
    return Mesh(np.array(jax.devices()[:n]).reshape(n), ("sequence",))


def _qkv(b=2, s=64, h=4, d=16, seed=0):
    rs = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rs.randn(b, s, h, d) * 0.5, jnp.float32)
    return mk(), mk(), mk()


@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_full_attention(causal):
    q, k, v = _qkv()
    ref = xla_attention(q, k, v, causal=causal)
    got = context_parallel_attention(q, k, v, _mesh(), causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ring_uneven_length_rejected():
    q, k, v = _qkv(s=60)
    with pytest.raises(ValueError, match="not divisible"):
        context_parallel_attention(q, k, v, _mesh())


def test_ring_gradients_match():
    """The scan-based ring must be differentiable and match full-attention
    gradients (long-context TRAINING, not just inference)."""
    q, k, v = _qkv(b=1, s=32, h=2, d=8, seed=3)
    mesh = _mesh(4)

    def loss_ring(q, k, v):
        out = context_parallel_attention(q, k, v, mesh, causal=True)
        return jnp.sum(out * out)

    def loss_full(q, k, v):
        out = xla_attention(q, k, v, causal=True)
        return jnp.sum(out * out)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_full = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    for gr, gf in zip(g_ring, g_full):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gf),
                                   rtol=2e-4, atol=2e-4)


def test_ring_attention_smaller_axis():
    """Works on a 2-device ring (the minimal rotation)."""
    q, k, v = _qkv(s=16, seed=5)
    ref = xla_attention(q, k, v, causal=True)
    got = context_parallel_attention(q, k, v, _mesh(2), causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_decoder_sequence_parallel_forward_matches():
    """LlamaConfig.sequence_axis: the cache-free decoder forward under a
    ('sequence',) mesh must match the single-device run (context-parallel
    training wiring, llama.py cache-free branch)."""
    import dataclasses

    from teochat_tpu.config import tiny_test_config
    from teochat_tpu.models import llama as llama_mod

    base_cfg = tiny_test_config().llm
    params = llama_mod.init_llama(jax.random.PRNGKey(0), base_cfg)
    b, s = 2, 32
    rs = np.random.RandomState(0)
    embeds = jnp.asarray(rs.randn(b, s, base_cfg.hidden_size) * 0.1, jnp.float32)
    pos = jnp.tile(jnp.arange(s, dtype=jnp.int32), (b, 1))
    ones = jnp.ones((b, s), bool)

    def fwd(cfg):
        def f(p, e):
            logits, _ = llama_mod.llama_forward(
                p, cfg, e, position_ids=pos, attention_mask=ones,
                right_padded=True,
            )
            return logits
        return f

    ref = np.asarray(jax.jit(fwd(base_cfg))(params, embeds))
    seq_cfg = dataclasses.replace(base_cfg, sequence_axis="sequence")
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("sequence",))
    with jax.set_mesh(mesh):
        got = np.asarray(jax.jit(fwd(seq_cfg))(params, embeds))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_decoder_sequence_parallel_grads_match():
    """Training gradients through the context-parallel decoder match the
    unsharded ones (long-context TRAINING end-to-end)."""
    import dataclasses

    from teochat_tpu.config import tiny_test_config
    from teochat_tpu.models import llama as llama_mod

    base_cfg = tiny_test_config().llm
    params = llama_mod.init_llama(jax.random.PRNGKey(1), base_cfg)
    b, s = 1, 16
    rs = np.random.RandomState(2)
    embeds = jnp.asarray(rs.randn(b, s, base_cfg.hidden_size) * 0.1, jnp.float32)
    pos = jnp.tile(jnp.arange(s, dtype=jnp.int32), (b, 1))
    ones = jnp.ones((b, s), bool)
    labels = jnp.asarray(rs.randint(1, base_cfg.vocab_size, (b, s)), jnp.int32)

    def loss_fn(cfg):
        def f(p, e):
            logits, _ = llama_mod.llama_forward(
                p, cfg, e, position_ids=pos, attention_mask=ones,
                right_padded=True,
            )
            logp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.mean(
                jnp.take_along_axis(logp, labels[..., None], axis=-1)
            )
        return f

    g_ref = jax.jit(jax.grad(loss_fn(base_cfg)))(params, embeds)
    seq_cfg = dataclasses.replace(base_cfg, sequence_axis="sequence")
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("sequence",))
    with jax.set_mesh(mesh):
        g_seq = jax.jit(jax.grad(loss_fn(seq_cfg)))(params, embeds)
    flat_ref = jax.tree.leaves(g_ref)
    flat_seq = jax.tree.leaves(g_seq)
    for a, c in zip(flat_ref, flat_seq):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   rtol=3e-4, atol=3e-4)


def test_create_mesh_sequence_axis():
    from teochat_tpu.config import MeshConfig
    from teochat_tpu.parallel import create_mesh

    m = create_mesh(MeshConfig(data=1, fsdp=2, model=1, sequence=4))
    assert dict(zip(m.axis_names, m.devices.shape)) == {
        "data": 1, "fsdp": 2, "model": 1, "sequence": 4}
    # default sequence=1 keeps the 3-axis layout
    m3 = create_mesh(MeshConfig(data=2, fsdp=2, model=2))
    assert m3.axis_names == ("data", "fsdp", "model")


def test_train_step_sequence_parallel_loss_matches():
    """A full sharded LoRA train step with the sequence axis active produces
    the same loss as the unsharded step — the trainer-level wiring
    (--mesh_sequence) end to end."""
    import dataclasses

    from teochat_tpu.config import MeshConfig, tiny_test_config
    from teochat_tpu.constants import IMAGE_TOKEN_INDEX
    from teochat_tpu.models import fusion as fusion_mod
    from teochat_tpu.models.teochat import init_teochat
    from teochat_tpu.parallel import create_mesh, shard_params
    from teochat_tpu.train.trainer import (
        init_train_state, make_optimizer, make_train_step,
    )

    cfg = tiny_test_config()
    params = init_teochat(jax.random.PRNGKey(0), cfg)
    tpf = cfg.vision.num_patches
    ids = [[1, 5, IMAGE_TOKEN_INDEX, 9, 7, 2, 4, 3]]
    labels = [[-100, -100, -100, -100, 7, 2, 4, 3]]
    plan = fusion_mod.build_fusion_plan(
        ids, labels=labels, tokens_per_frame=tpf, pad_to=16
    )
    pixels = jnp.asarray(
        np.random.RandomState(0).randn(1, 3, 28, 28), jnp.float32
    )
    optimizer = make_optimizer(1e-3, total_steps=10)

    def one_step(run_cfg, p):
        state = jax.jit(lambda q: init_train_state(q, optimizer))(p)
        step = make_train_step(run_cfg, optimizer)
        _, loss = step(state, plan, pixels)
        return float(loss)

    ref = one_step(cfg, params)
    seq_cfg = dataclasses.replace(
        cfg, llm=dataclasses.replace(cfg.llm, sequence_axis="sequence")
    )
    mesh = create_mesh(MeshConfig(data=1, fsdp=2, model=1, sequence=4))
    with jax.set_mesh(mesh):
        sharded = shard_params(params, mesh)
        got = one_step(seq_cfg, sharded)
    assert abs(got - ref) < 2e-3, (got, ref)


def test_ring_gqa_matches_full_attention():
    """GQA ring: Hkv-wide blocks rotate; grouped einsum serves each group."""
    rs = np.random.RandomState(21)
    q = jnp.asarray(rs.randn(2, 64, 4, 16) * 0.5, jnp.float32)
    k = jnp.asarray(rs.randn(2, 64, 2, 16) * 0.5, jnp.float32)
    v = jnp.asarray(rs.randn(2, 64, 2, 16) * 0.5, jnp.float32)
    ref = xla_attention(q, k, v, causal=True)
    got = context_parallel_attention(q, k, v, _mesh(), causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ring_gqa_gradients_match():
    rs = np.random.RandomState(22)
    q = jnp.asarray(rs.randn(1, 32, 4, 8) * 0.5, jnp.float32)
    k = jnp.asarray(rs.randn(1, 32, 1, 8) * 0.5, jnp.float32)  # MQA extreme
    v = jnp.asarray(rs.randn(1, 32, 1, 8) * 0.5, jnp.float32)
    mesh = _mesh(4)

    def loss_ring(q, k, v):
        return jnp.sum(context_parallel_attention(q, k, v, mesh, causal=True) ** 2)

    def loss_full(q, k, v):
        return jnp.sum(xla_attention(q, k, v, causal=True) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_full = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    for gr, gf in zip(g_ring, g_full):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gf),
                                   rtol=2e-4, atol=2e-4)

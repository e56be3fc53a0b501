"""Multi-LoRA serving: adapter-stacked LoRA leaves routed per batch row.

Beyond-reference: the reference loads ONE merged LoRA checkpoint per process
(builder.py:37-72 merge_and_unload); here N adapters share one backbone and a
[B, A] route mixes them per row (llama._proj / train/lora.stack_lora_adapters).
Correctness bar: a one-hot route row must reproduce the single-adapter model
token-exactly, and a -1 (all-zero) row must reproduce the base model.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from teochat_tpu.config import GenerationConfig, tiny_test_config
from teochat_tpu.constants import IMAGE_TOKEN_INDEX
from teochat_tpu.models import generation as gen_mod
from teochat_tpu.models import llama as llama_mod
from teochat_tpu.models.teochat import TEOChat, init_teochat
from teochat_tpu.train import lora as lora_mod

RANK = 4


def _randomize_lora(llm, seed):
    """Give the zero-init adapters random B matrices so they change outputs."""
    rng = np.random.RandomState(seed)

    def go(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = go(v)
            elif k == "lora_b":
                out[k] = jnp.asarray(
                    rng.randn(*v.shape) * 0.05, v.dtype
                )
            else:
                out[k] = v
        return out

    return go(llm)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config()
    params = init_teochat(jax.random.PRNGKey(0), cfg)
    base = params["llm"]
    adapters = [
        _randomize_lora(
            lora_mod.add_lora_params(
                jax.random.PRNGKey(i + 1), base, rank=RANK, alpha=2.0 * RANK
            ),
            seed=10 + i,
        )
        for i in range(3)
    ]
    multi = lora_mod.stack_lora_adapters(adapters)
    return cfg, params, base, adapters, multi


def test_stacking_shapes_and_count(setup):
    cfg, _, base, adapters, multi = setup
    L = cfg.llm.num_layers
    q = multi["layers"]["attn"]["q"]
    assert q["lora_a"].shape[:2] == (L, 3)
    assert q["lora_b"].shape[:2] == (L, 3)
    assert q["lora_scale"].shape == (L, 3)
    assert lora_mod.num_stacked_adapters(multi) == 3
    assert lora_mod.num_stacked_adapters(base) == 0
    assert lora_mod.num_stacked_adapters(adapters[0]) == 0


def test_rank_mismatch_rejected(setup):
    cfg, _, base, adapters, _ = setup
    other = lora_mod.add_lora_params(
        jax.random.PRNGKey(9), base, rank=RANK * 2
    )
    with pytest.raises(ValueError, match="rank"):
        lora_mod.stack_lora_adapters([adapters[0], other])


def test_route_helper():
    r = lora_mod.adapter_route([1, -1, 0], 3)
    assert r.shape == (3, 3)
    np.testing.assert_allclose(
        np.asarray(r), [[0, 1, 0], [0, 0, 0], [1, 0, 0]]
    )


def _fwd(llm, cfg, x, pos, route=None):
    logits, _ = llama_mod.llama_forward(
        llm, cfg.llm, x, position_ids=pos,
        attention_mask=jnp.ones(x.shape[:2], bool), adapter_route=route,
    )
    return np.asarray(logits)


def test_forward_one_hot_matches_single_adapter(setup):
    cfg, _, base, adapters, multi = setup
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 5, cfg.llm.hidden_size), jnp.float32)
    pos = jnp.arange(5)[None, :].repeat(2, 0)
    for i in range(3):
        route = lora_mod.adapter_route([i, i], 3)
        got = _fwd(multi, cfg, x, pos, route)
        want = _fwd(adapters[i], cfg, x, pos)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_forward_negative_id_is_base_model(setup):
    cfg, _, base, adapters, multi = setup
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 4, cfg.llm.hidden_size), jnp.float32)
    pos = jnp.arange(4)[None, :]
    got = _fwd(multi, cfg, x, pos, lora_mod.adapter_route([-1], 3))
    want = _fwd(base, cfg, x, pos)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_forward_mixed_rows(setup):
    """Different adapters in ONE batch: each row matches its own model."""
    cfg, _, base, adapters, multi = setup
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(3, 4, cfg.llm.hidden_size), jnp.float32)
    pos = jnp.arange(4)[None, :].repeat(3, 0)
    got = _fwd(multi, cfg, x, pos, lora_mod.adapter_route([0, 2, -1], 3))
    np.testing.assert_allclose(
        got[0], _fwd(adapters[0], cfg, x[:1], pos[:1])[0], rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        got[1], _fwd(adapters[2], cfg, x[1:2], pos[:1])[0], rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        got[2], _fwd(base, cfg, x[2:], pos[:1])[0], rtol=2e-4, atol=2e-4
    )


def test_multi_params_without_route_raises(setup):
    cfg, _, _, _, multi = setup
    x = jnp.zeros((1, 4, cfg.llm.hidden_size), jnp.float32)
    pos = jnp.arange(4)[None, :]
    with pytest.raises(ValueError, match="adapter_route"):
        _fwd(multi, cfg, x, pos, None)


def test_generate_per_row_adapters(setup):
    """TEOChat.generate(adapters=[...]) is token-exact vs each single-adapter
    model generating alone (cached decode path, mixed batch)."""
    cfg, params, base, adapters, multi = setup
    gen = GenerationConfig(max_new_tokens=6, temperature=0.0, do_sample=False,
                           stop_strings=())
    rows = [[1, 5, IMAGE_TOKEN_INDEX, 9, 4], [1, 7, IMAGE_TOKEN_INDEX, 3, 2]]
    frames = np.random.RandomState(3).randn(2, 3, 28, 28).astype(np.float32)

    multi_model = TEOChat(cfg, {**params, "llm": multi})
    got = multi_model.generate(rows, frames, gen, adapters=[0, 1])

    for i, r in enumerate(got):
        single = TEOChat(cfg, {**params, "llm": adapters[i]})
        want = single.generate([rows[i]], frames[i : i + 1], gen)[0]
        assert r == want, (i, r, want)


def test_generate_spec_adapters_token_exact(setup):
    """Greedy speculative decoding with a route equals plain routed decode."""
    cfg, params, _, adapters, multi = setup
    rows = [[1, 5, IMAGE_TOKEN_INDEX, 9, 4]]
    frames = np.random.RandomState(4).randn(1, 3, 28, 28).astype(np.float32)
    multi_model = TEOChat(cfg, {**params, "llm": multi})
    plain = multi_model.generate(
        rows, frames,
        GenerationConfig(max_new_tokens=6, temperature=0.0, do_sample=False,
                         stop_strings=()),
        adapters=[1],
    )
    spec = multi_model.generate(
        rows, frames,
        GenerationConfig(max_new_tokens=6, temperature=0.0, do_sample=False,
                         stop_strings=(), speculative_k=3),
        adapters=[1],
    )
    assert plain == spec


def test_generate_adapters_on_plain_params_raises(setup):
    cfg, params, _, _, _ = setup
    model = TEOChat(cfg, params)
    with pytest.raises(ValueError, match="adapter"):
        model.generate([[1, 5, 9]], None,
                       GenerationConfig(max_new_tokens=2), adapters=[0])


@pytest.mark.slow
def test_engine_mixed_adapters_token_exact(setup):
    """Requests with different adapters batch in ONE engine and each matches
    its single-adapter model's engine output (per-row routing on device)."""
    import threading

    from teochat_tpu.models.teochat import TEOChat
    from teochat_tpu.serve.engine import BatchEngine

    cfg, params, base, adapters, multi = setup
    gen = GenerationConfig(max_new_tokens=5, temperature=0.0, do_sample=False,
                           stop_strings=())
    rows = [[1, 5, IMAGE_TOKEN_INDEX, 9, 4],
            [1, 7, IMAGE_TOKEN_INDEX, 3, 2, 8],
            [1, 2, IMAGE_TOKEN_INDEX, 6]]
    frames = [np.random.RandomState(40 + i).randn(1, 3, 28, 28)
              .astype(np.float32) for i in range(3)]
    ids = [0, 2, -1]

    expected = []
    for r, f, a in zip(rows, frames, ids):
        llm = base if a < 0 else adapters[a]
        expected.append(
            TEOChat(cfg, {**params, "llm": llm}).generate([r], f, gen)[0]
        )

    engine = BatchEngine(
        TEOChat(cfg, {**params, "llm": multi}), max_slots=3, max_len=64,
        chunk=2,
    ).start()
    try:
        results = [None] * 3
        threads = []
        for i in range(3):
            def run(i=i):
                results[i] = engine.submit(rows[i], frames[i], gen,
                                           adapter=ids[i])
            t = threading.Thread(target=run)
            t.start()
            threads.append(t)
        for t in threads:
            t.join(timeout=600)
    finally:
        engine.shutdown()
    assert results == expected, (results, expected)


@pytest.mark.slow
def test_engine_adapter_out_of_range(setup):
    from teochat_tpu.models.teochat import TEOChat
    from teochat_tpu.serve.engine import BatchEngine

    cfg, params, _, _, multi = setup
    engine = BatchEngine(TEOChat(cfg, {**params, "llm": multi}), max_slots=1,
                         max_len=32)
    with pytest.raises(ValueError, match="out of range"):
        engine.submit([1, 5], None, GenerationConfig(max_new_tokens=1),
                      adapter=7)
    engine_plain = BatchEngine(TEOChat(cfg, params), max_slots=1, max_len=32)
    with pytest.raises(ValueError, match="stacked LoRA"):
        engine_plain.submit([1, 5], None, GenerationConfig(max_new_tokens=1),
                            adapter=0)


@pytest.mark.slow
def test_prefix_cache_is_adapter_keyed(setup):
    """A pooled prefix computed under adapter 0 must NOT seed an adapter-1
    request (K/V embed the adapter deltas); same-adapter reuse still hits."""
    from teochat_tpu.models.teochat import TEOChat
    from teochat_tpu.serve.engine import BatchEngine

    cfg, params, base, adapters, multi = setup
    gen = GenerationConfig(max_new_tokens=4, temperature=0.0, do_sample=False,
                           stop_strings=())
    shared = [1] + list(range(40, 60))  # 21-token shared text prefix

    def prompt(i):
        return shared + [100 + i, 5]

    engine = BatchEngine(
        TEOChat(cfg, {**params, "llm": multi}), max_slots=2, max_len=64,
        chunk=2, prefix_cache_slots=2, prefix_min_tokens=8,
    ).start()
    try:
        a0_first = engine.submit(prompt(0), None, gen, adapter=0)
        assert engine.stats["prefix_hits"] == 0
        a1 = engine.submit(prompt(1), None, gen, adapter=1)
        # different adapter: the adapter-0 pool row must not match
        assert engine.stats["prefix_hits"] == 0
        a0_again = engine.submit(prompt(2), None, gen, adapter=0)
        assert engine.stats["prefix_hits"] == 1  # same-adapter hit
    finally:
        engine.shutdown()

    # every output token-exact vs the single-adapter models
    for r, a, got in [(prompt(0), 0, a0_first), (prompt(1), 1, a1),
                      (prompt(2), 0, a0_again)]:
        want = TEOChat(cfg, {**params, "llm": adapters[a]}).generate(
            [r], None, gen
        )[0]
        assert got == want, (a, got, want)


def _fake_peft_dir(tmpdir, cfg, rank, seed, alpha=None):
    """Write a peft-layout adapter checkpoint (numpy safetensors) to disk."""
    import json as _json
    import os

    from safetensors.numpy import save_file

    rng = np.random.RandomState(seed)
    d = cfg.llm.hidden_size
    i_sz = cfg.llm.intermediate_size
    hkv = cfg.llm.num_kv_heads * cfg.llm.head_dim
    widths = {
        "self_attn.q_proj": (d, d), "self_attn.k_proj": (d, hkv),
        "self_attn.v_proj": (d, hkv), "self_attn.o_proj": (d, d),
        "mlp.gate_proj": (d, i_sz), "mlp.up_proj": (d, i_sz),
        "mlp.down_proj": (i_sz, d),
    }
    sd = {}
    for layer in range(cfg.llm.num_layers):
        for mod, (fi, fo) in widths.items():
            pre = f"base_model.model.model.layers.{layer}.{mod}"
            sd[f"{pre}.lora_A.weight"] = (
                rng.randn(rank, fi) * 0.1
            ).astype(np.float32)
            sd[f"{pre}.lora_B.weight"] = (
                rng.randn(fo, rank) * 0.1
            ).astype(np.float32)
    os.makedirs(tmpdir, exist_ok=True)
    save_file(sd, os.path.join(tmpdir, "adapter_model.safetensors"))
    with open(os.path.join(tmpdir, "adapter_config.json"), "w") as f:
        _json.dump({"r": rank, "lora_alpha": alpha or 2 * rank}, f)
    return sd


def test_attach_matches_merge(setup, tmp_path):
    """attach_lora_to_llama (unmerged leaves) == merge_lora_into_llama
    (folded weights) on an fp base: same logits."""
    from teochat_tpu.checkpoint import convert_hf

    cfg, params, base, _, _ = setup
    sd = _fake_peft_dir(str(tmp_path / "a0"), cfg, rank=RANK, seed=0)

    attached = convert_hf.attach_lora_to_llama(base, sd, cfg.llm, rank=RANK,
                                               alpha=2 * RANK)
    merged = convert_hf.merge_lora_into_llama(
        jax.tree.map(np.asarray, base), sd, cfg.llm, rank=RANK, alpha=2 * RANK
    )
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 4, cfg.llm.hidden_size), jnp.float32)
    pos = jnp.arange(4)[None, :]
    got = _fwd(attached, cfg, x, pos)
    want = _fwd(jax.tree.map(jnp.asarray, merged), cfg, x, pos)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_load_multi_lora_int4_fused(setup, tmp_path):
    """load_multi_lora over a packed-int4 FUSED-projection backbone (the only
    quantizer that fuses q|k|v / gate|up): adapters ride the block-composed
    qkv/gateup layout and route per row."""
    from teochat_tpu.builder import load_multi_lora
    from teochat_tpu.checkpoint import convert_hf
    from teochat_tpu.models.teochat import TEOChat
    from teochat_tpu.ops.quant import quantize_llama_params_int4

    cfg, params, base, _, _ = setup
    dirs = []
    sds = []
    for i in range(2):
        d = str(tmp_path / f"ad{i}")
        sds.append(_fake_peft_dir(d, cfg, rank=RANK, seed=30 + i))
        dirs.append(d)

    q8 = quantize_llama_params_int4(base)
    assert "qkv" in q8["layers"]["attn"], "fused int4 layout expected"
    model8 = TEOChat(cfg, {**params, "llm": q8})
    multi_model = load_multi_lora(model8, dirs)
    assert lora_mod.num_stacked_adapters(multi_model.params["llm"]) == 2
    # the fused qkv projection carries the block-composed adapter (rank 3r)
    assert (
        multi_model.params["llm"]["layers"]["attn"]["qkv"]["lora_a"].shape[-1]
        == 3 * RANK
    )

    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(2, 4, cfg.llm.hidden_size), jnp.float32)
    pos = jnp.arange(4)[None, :].repeat(2, 0)
    got = _fwd(multi_model.params["llm"], cfg, x, pos,
               lora_mod.adapter_route([0, 1], 2))

    # reference: the SAME adapter attached singly (no adapter axis) over the
    # SAME quantized base — the single-LoRA path the suite already trusts
    for i in range(2):
        single = convert_hf.attach_lora_to_llama(
            q8, sds[i], cfg.llm, rank=RANK, alpha=2 * RANK
        )
        want = _fwd(single, cfg, x[i : i + 1], pos[:1])
        np.testing.assert_allclose(got[i], want[0], rtol=2e-3, atol=2e-3)


def test_mpt_forward_one_hot_matches_single(setup):
    """Backend uniformity: MPT multi-LoRA routes like LLaMA."""
    from teochat_tpu.config import MptConfig
    from teochat_tpu.models import mpt as mpt_mod

    cfg = MptConfig(d_model=32, n_heads=4, n_layers=2, vocab_size=64,
                    max_seq_len=64)
    base = mpt_mod.init_mpt(jax.random.PRNGKey(0), cfg)
    ads = [
        _randomize_lora(
            lora_mod.add_lora_params(jax.random.PRNGKey(i + 1), base,
                                     rank=RANK),
            seed=20 + i,
        )
        for i in range(2)
    ]
    multi = lora_mod.stack_lora_adapters(ads)
    assert lora_mod.num_stacked_adapters(multi) == 2

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 4, cfg.d_model), jnp.float32)
    route = lora_mod.adapter_route([1, 0], 2)
    got, _ = mpt_mod.mpt_forward(multi, cfg, x, adapter_route=route)
    want1, _ = mpt_mod.mpt_forward(ads[1], cfg, x[:1])
    want0, _ = mpt_mod.mpt_forward(ads[0], cfg, x[1:])
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want1[0]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want0[0]),
                               rtol=2e-4, atol=2e-4)

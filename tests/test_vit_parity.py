"""ViT numerical parity vs HF CLIPVisionModel (tiny random init, fp32)."""

import numpy as np
import pytest

import jax.numpy as jnp

from teochat_tpu.checkpoint.convert_hf import convert_clip_vision
from teochat_tpu.config import VisionConfig
from teochat_tpu.models.vit import (

    init_vit,
    resize_position_embedding,
    select_features,
    vit_forward,
)

pytestmark = pytest.mark.slow  # heavy suite: excluded from the smoke tier

TINY = VisionConfig(
    image_size=28,
    patch_size=14,
    hidden_size=32,
    intermediate_size=64,
    num_layers=3,
    num_heads=4,
)


@pytest.fixture(scope="module")
def hf_model():
    torch = pytest.importorskip("torch")
    from transformers import CLIPVisionConfig, CLIPVisionModel

    torch.manual_seed(0)
    hf_cfg = CLIPVisionConfig(
        image_size=TINY.image_size,
        patch_size=TINY.patch_size,
        hidden_size=TINY.hidden_size,
        intermediate_size=TINY.intermediate_size,
        num_hidden_layers=TINY.num_layers,
        num_attention_heads=TINY.num_heads,
        hidden_act="quick_gelu",
    )
    model = CLIPVisionModel(hf_cfg).eval()
    return model


def test_vit_matches_hf_hidden_states(hf_model):
    import torch

    params = convert_clip_vision(hf_model.state_dict(), TINY)
    x = np.random.RandomState(0).randn(2, 3, 28, 28).astype(np.float32)

    with torch.no_grad():
        hf_out = hf_model(torch.from_numpy(x), output_hidden_states=True)

    for select_layer in [-2, -1, -3]:
        ours = vit_forward(params, TINY, jnp.asarray(x), select_layer=select_layer)
        ref = hf_out.hidden_states[select_layer].numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5, rtol=1e-4)


def test_select_features(hf_model):
    params = convert_clip_vision(hf_model.state_dict(), TINY)
    x = jnp.zeros((1, 3, 28, 28))
    h = vit_forward(params, TINY, x)
    assert select_features(h, "patch").shape == (1, TINY.num_patches, 32)
    assert select_features(h, "cls_patch").shape == (1, TINY.num_patches + 1, 32)
    with pytest.raises(ValueError):
        select_features(h, "bogus")


def test_init_shapes_match_converted(hf_model):
    import jax

    converted = convert_clip_vision(hf_model.state_dict(), TINY)
    ours = init_vit(jax.random.PRNGKey(0), TINY)
    ref_shapes = jax.tree.map(lambda a: a.shape, converted)
    our_shapes = jax.tree.map(lambda a: a.shape, ours)
    del our_shapes["layers"]  # compare non-layer leaves first for clarity
    del ref_shapes["layers"]
    assert our_shapes == ref_shapes


def test_temporal_tower_runs():
    import jax

    cfg = VisionConfig(
        image_size=28,
        patch_size=14,
        hidden_size=32,
        intermediate_size=64,
        num_layers=2,
        num_heads=4,
        add_time_attn=True,
        num_frames=4,
    )
    params = init_vit(jax.random.PRNGKey(1), cfg)
    bt = 2 * 4  # B=2, T=4 folded
    x = jnp.asarray(np.random.RandomState(1).randn(bt, 3, 28, 28), jnp.float32)
    out = vit_forward(params, cfg, x, num_frames=4, select_layer=-1)
    assert out.shape == (bt, cfg.num_patches + 1, 32)
    # t=1 path (no temporal embedding added) must also run
    out1 = vit_forward(params, cfg, x[:2], num_frames=1, select_layer=-1)
    assert out1.shape == (2, cfg.num_patches + 1, 32)


def test_resize_position_embedding():
    pos = jnp.asarray(np.random.RandomState(0).randn(5, 8), jnp.float32)  # 2x2 grid
    out = resize_position_embedding(pos, 2, 4)
    assert out.shape == (17, 8)
    np.testing.assert_allclose(out[0], pos[0])

"""Vision tower wrappers + builder dispatch.

API-parity layer over the single parameterized ViT in vit.py, replacing the
reference's tower classes (LanguageBindImageTower
languagebind/__init__.py:94-173, LanguageBindVideoTower :176-259, CLIPVisionTower
clip_encoder.py:7-78) and the name-dispatched builder
(multimodal_encoder/builder.py:7-24). One implementation, five modality
surfaces: image/video differ only in `add_time_attn`; depth/thermal reuse the
image tower geometry (the reference's five vendored CLIP copies are config
clones, SURVEY §2 M6).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from teochat_tpu.config import VisionConfig
from teochat_tpu.models import vit as vit_mod


class VisionTower:
    """Frozen tower facade: __call__(frames) -> selected features.

    Mirrors LanguageBindImageTower's surface: `hidden_size`, `num_patches`,
    `select_layer`, `select_feature`, lazy `load_model()`, and a forward that
    accepts [N, 3, H, W] frames (or [B, T, 3, H, W] video when temporal).
    """

    def __init__(self, cfg: VisionConfig, params: Optional[Dict] = None,
                 select_layer: int = -2, select_feature: str = "patch"):
        self.cfg = cfg
        self.params = params
        self.select_layer = select_layer
        self.select_feature = select_feature
        self.is_loaded = params is not None

    # --- properties matching languagebind/__init__.py:167-173 ---
    @property
    def hidden_size(self) -> int:
        return self.cfg.hidden_size

    @property
    def num_patches(self) -> int:
        return self.cfg.num_patches

    def load_model(self, params: Optional[Dict] = None, rng=None, dtype=jnp.float32):
        """Attach weights (converted checkpoint or random init)."""
        if params is not None:
            self.params = params
        elif self.params is None:
            self.params = vit_mod.init_vit(
                rng if rng is not None else jax.random.PRNGKey(0), self.cfg, dtype
            )
        self.is_loaded = True
        return self

    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """[N, 3, H, W] -> [N, tokens, D] selected features (frames folded)."""
        assert self.is_loaded, "tower not loaded; call load_model()"
        hidden = vit_mod.vit_forward(
            self.params, self.cfg, images, select_layer=self.select_layer
        )
        return vit_mod.select_features(hidden, self.select_feature)

    def encode_videos(self, videos: jnp.ndarray) -> jnp.ndarray:
        """[B, T, 3, H, W] -> [B, T, tokens, D].

        Temporal attention runs over the T axis when cfg.add_time_attn
        (reference encode_videos llava_arch.py:142-146 + the video tower's
        (b t) folding, modeling_video.py:631-648).
        """
        assert self.is_loaded, "tower not loaded; call load_model()"
        b, t = videos.shape[:2]
        flat = videos.reshape((b * t,) + videos.shape[2:])
        hidden = vit_mod.vit_forward(
            self.params, self.cfg, flat,
            select_layer=self.select_layer, num_frames=t,
        )
        feats = vit_mod.select_features(hidden, self.select_feature)
        return feats.reshape(b, t, feats.shape[1], feats.shape[2])


def build_vision_tower(
    tower_name: str,
    *,
    base_cfg: Optional[VisionConfig] = None,
    select_layer: int = -2,
    select_feature: str = "patch",
    **kwargs,
) -> VisionTower:
    """Name-dispatched tower construction (reference builder.py:7-16 +
    languagebind dispatch). All names map onto the one ViT implementation:

    - *LanguageBind_Video* -> temporal-attention tower (add_time_attn)
    - *LanguageBind_Image* / openai/* / laion/* / depth / thermal -> image tower
    """
    cfg = base_cfg or VisionConfig()
    name = tower_name.lower()
    if "video" in name:
        cfg = dataclasses.replace(cfg, add_time_attn=True)
    elif "audio" in name:
        # LanguageBind_Audio runs the SAME CLIP stack over rectangular mel
        # spectrograms: image_size = [num_mel_bins, target_length] with the
        # position table resized (reference modeling_audio.py:795-846;
        # LanguageBind release geometry 126 x 1036 -> 9 x 74 patches at p=14).
        cfg = dataclasses.replace(
            cfg, add_time_attn=False,
            image_size=(
                kwargs.get("num_mel_bins", 126),
                kwargs.get("target_length", 1036),
            ),
        )
    elif any(k in name for k in ("image", "openai", "laion", "depth", "thermal", "clip")):
        # depth/thermal are geometry clones of the image tower (their
        # modeling_{depth,thermal}.py files are byte-near copies of
        # modeling_image.py; only preprocessing differs, data/processing_extra)
        cfg = dataclasses.replace(cfg, add_time_attn=False)
    else:
        raise ValueError(f"Unknown vision tower: {tower_name}")
    return VisionTower(cfg, select_layer=select_layer, select_feature=select_feature)


def build_video_tower(tower_name: str = "LanguageBind_Video_merge", **kwargs) -> VisionTower:
    """Reference multimodal_encoder/builder.py:18-24 equivalent."""
    return build_vision_tower(tower_name, **kwargs)

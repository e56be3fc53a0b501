"""Device-side batched image preprocessing.

The host pipeline (data/processing.py) mirrors the reference transform
byte-for-byte for parity; this module is the high-throughput device path:
decoded uint8 frames are shipped to the TPU once and resize/crop/normalize run
batched under jit (bicubic via jax.image, elementwise normalize fused by XLA
into the ViT's first matmul). Used by the batched eval loop when frames share
a source resolution.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp

from teochat_tpu.constants import (
    OPENAI_DATASET_MEAN,
    OPENAI_DATASET_STD,
    VISION_IMAGE_SIZE,
)


@partial(jax.jit, static_argnames=("size",))
def preprocess_frames(
    frames_u8: jnp.ndarray,  # [N, H, W, 3] uint8
    size: int = VISION_IMAGE_SIZE,
) -> jnp.ndarray:
    """[N, H, W, 3] uint8 -> [N, 3, size, size] float32 (CLIP-normalized).

    Matches the reference transform order (scale -> bicubic shorter-side
    resize -> center crop -> normalize, processing_image.py:15-25) with the
    resize/crop fused into one bicubic resample of the centered crop window.
    """
    n, h, w, _ = frames_u8.shape
    x = frames_u8.astype(jnp.float32) / 255.0

    # bicubic shorter-side resize, then center crop — the host pipeline's
    # two-step order (shapes are static, so this branches at trace time)
    if w <= h:
        new_w, new_h = size, max(int(round(h * size / w)), size)
    else:
        new_w, new_h = max(int(round(w * size / h)), size), size
    x = jax.image.resize(x, (n, new_h, new_w, 3), method="bicubic")
    top = (new_h - size) // 2
    left = (new_w - size) // 2
    x = x[:, top : top + size, left : left + size, :]

    mean = jnp.asarray(OPENAI_DATASET_MEAN, jnp.float32)
    std = jnp.asarray(OPENAI_DATASET_STD, jnp.float32)
    x = (x - mean) / std
    return jnp.clip(x, -10, 10).transpose(0, 3, 1, 2)

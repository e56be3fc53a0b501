"""Native C++ preprocessing: PIL-bit-exact resample + fused crop/normalize.

The exactness contract is load-bearing: data/processing.py's PIL path is the
host-parity reference (torchvision Resize/CenterCrop/Normalize semantics,
reference processing_image.py:15-25); the native fast path must never drift
from it, so these tests assert EQUALITY, not closeness.
"""

import numpy as np
import pytest

from teochat_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native preprocess library unavailable"
)


GEOMETRIES = [
    (100, 150, 224, 300),   # upscale both
    (512, 640, 224, 280),   # downscale (antialiased support)
    (224, 224, 224, 224),   # identity
    (50, 40, 179, 224),     # upscale tall
    (1024, 768, 224, 168),  # big downscale
    (33, 77, 523, 224),     # extreme aspect
]


@pytest.mark.parametrize("h,w,oh,ow", GEOMETRIES)
def test_resize_bit_exact_vs_pil(h, w, oh, ow):
    from PIL import Image

    src = np.random.RandomState(h * w).randint(0, 256, (h, w, 3), np.uint8)
    pil = np.asarray(Image.fromarray(src).resize((ow, oh), Image.BICUBIC))
    nat = native.resize_bicubic(src, oh, ow)
    np.testing.assert_array_equal(pil, nat)


def test_pipeline_exact_vs_pil_path():
    from teochat_tpu.data.processing import ImageProcessor

    rng = np.random.RandomState(7)
    frames = [
        rng.randint(0, 256, (h, w, 3), np.uint8)
        for h, w in [(512, 640), (480, 480), (224, 398), (1024, 768),
                     (300, 225), (224, 224)]
    ]
    pil_proc = ImageProcessor(use_native=False)
    ref = pil_proc.preprocess(frames)["pixel_values"]
    nat = native.preprocess_batch(
        frames, pil_proc.size, pil_proc.image_mean, pil_proc.image_std
    )
    np.testing.assert_array_equal(ref, nat)
    # and through the processor's automatic fast path
    auto = ImageProcessor().preprocess(frames)["pixel_values"]
    np.testing.assert_array_equal(ref, auto)


def test_pipeline_tiny_geometry():
    """Tiny test-tower geometry (size=28) goes through the same path."""
    from teochat_tpu.data.processing import ImageProcessor

    rng = np.random.RandomState(3)
    frames = [rng.randint(0, 256, (41, 67, 3), np.uint8)]
    ref = ImageProcessor(size=28, use_native=False).preprocess(frames)
    nat = ImageProcessor(size=28).preprocess(frames)
    np.testing.assert_array_equal(ref["pixel_values"], nat["pixel_values"])
    assert nat["pixel_values"].shape == (1, 3, 28, 28)


def test_preprocess_batch_rejects_bad_shape():
    with pytest.raises(ValueError):
        native.preprocess_batch(
            [np.zeros((10, 10), np.uint8)], 224, (0, 0, 0), (1, 1, 1)
        )


def test_threaded_matches_single():
    rng = np.random.RandomState(11)
    frames = [rng.randint(0, 256, (128, 96, 3), np.uint8) for _ in range(9)]
    a = native.preprocess_batch(frames, 64, (0.5, 0.5, 0.5), (0.25, 0.25, 0.25),
                                n_threads=1)
    b = native.preprocess_batch(frames, 64, (0.5, 0.5, 0.5), (0.25, 0.25, 0.25),
                                n_threads=4)
    np.testing.assert_array_equal(a, b)

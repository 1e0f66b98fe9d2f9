"""Golden tests: our matmul-based resize must match OpenCV exactly (quirk Q2).

cv2 is the oracle the reference actually uses (float32 path, INTER_CUBIC A=-0.75,
no antialias; INTER_NEAREST for the PCA upscale).
"""

import cv2
import numpy as np
import pytest

from dinov2_tpu.image.preprocess import classify_preprocess, feature_preprocess
from dinov2_tpu.image.resize import resize_bicubic, resize_nearest

MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


@pytest.mark.parametrize(
    "src,dst",
    [
        ((480, 640), (256, 256)),  # downscale (classify path)
        ((100, 80), (256, 256)),  # upscale
        ((37, 37), (40, 40)),  # pos-embed-style grid upscale
        ((37, 37), (16, 16)),  # pos-embed-style grid downscale
        ((224, 224), (238, 238)),  # feature-path one-extra-patch resize
        ((3, 5), (7, 9)),  # tiny, exercises border clamping hard
    ],
)
def test_bicubic_matches_cv2(src, dst, rng):
    img = rng.standard_normal((*src, 3)).astype(np.float32)
    want = cv2.resize(img, (dst[1], dst[0]), interpolation=cv2.INTER_CUBIC)
    got = np.asarray(resize_bicubic(img, dst[0], dst[1]))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bicubic_single_channel_grid(rng):
    """The pos-embed interpolation path resizes (M, M, D) feature grids."""
    grid = rng.standard_normal((37, 37, 8)).astype(np.float32)
    got = np.asarray(resize_bicubic(grid, 30, 44))
    for c in range(8):
        want = cv2.resize(grid[..., c], (44, 30), interpolation=cv2.INTER_CUBIC)
        np.testing.assert_allclose(got[..., c], want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("src,dst", [((16, 16), (224, 224)), ((33, 47), (100, 100))])
def test_nearest_matches_cv2(src, dst, rng):
    img = (rng.uniform(0, 255, (*src, 3))).astype(np.float32)
    want = cv2.resize(img, (dst[1], dst[0]), interpolation=cv2.INTER_NEAREST)
    got = np.asarray(resize_nearest(img, dst[0], dst[1]))
    np.testing.assert_array_equal(got, want)


def _cv2_classify_preprocess_rgb(img_rgb_u8):
    """Scalar transcription of dino_classify_preprocess (dinov2.cpp:106-132),
    restated in RGB (the reference runs BGR and swaps at upload, quirk Q1)."""
    image = img_rgb_u8.astype(np.float32) / 255.0
    image = cv2.resize(image, (256, 256), interpolation=cv2.INTER_CUBIC)
    off = (256 - 224) // 2
    image = image[off : off + 224, off : off + 224]
    return (image - MEAN) / STD


def test_classify_preprocess_matches_reference(rng):
    img = rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
    want = _cv2_classify_preprocess_rgb(img)
    got = np.asarray(classify_preprocess(img))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_feature_preprocess_matches_reference(rng):
    patch = 14
    img = rng.integers(0, 256, (280, 280, 3), dtype=np.uint8)  # exact multiple
    image = img.astype(np.float32) / 255.0
    # quirk Q4: rounds UP one extra patch even though 280 is a multiple of 14
    new = ((280 // patch + 1) * patch, (280 // patch + 1) * patch)
    want = cv2.resize(image, (new[1], new[0]), interpolation=cv2.INTER_CUBIC)
    want = (want - MEAN) / STD
    got = np.asarray(feature_preprocess(img, patch))
    assert got.shape == (294, 294, 3)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_batched_preprocess(rng):
    imgs = rng.integers(0, 256, (4, 96, 128, 3), dtype=np.uint8)
    got = np.asarray(classify_preprocess(imgs))
    assert got.shape == (4, 224, 224, 3)
    for i in range(4):
        np.testing.assert_allclose(
            got[i], _cv2_classify_preprocess_rgb(imgs[i]), rtol=1e-4, atol=1e-5
        )

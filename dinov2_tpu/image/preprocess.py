"""On-device image preprocessing (the XLA equivalent of the reference's OpenCV path).

Reference behavior:
  - classify: float/255 -> bicubic resize to 256x256 -> center-crop 224 ->
    per-channel ImageNet normalize (/root/reference/dinov2.cpp:106-132). The 256/224
    sizes are fixed regardless of model img_size (quirk Q9).
  - features: float/255 -> bicubic resize to (dim//patch + 1)*patch — always rounds
    UP one extra patch, even for exact multiples (quirk Q4) -> normalize
    (/root/reference/dinov2.cpp:135-156).
  - channel order: the reference ingests BGR and swaps (quirk Q1); this pipeline is
    RGB-native end to end — callers hand us RGB uint8/float arrays and the
    normalization constants are indexed in RGB order, which lands on the exact same
    numbers the reference applies.

All functions are batch-first, jit-safe (static output sizes), and run on device.
"""

from __future__ import annotations

import jax.numpy as jnp

from dinov2_tpu.image.resize import resize_bicubic
from dinov2_tpu.models.config import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD

CLASSIFY_RESIZE = 256
CLASSIFY_CROP = 224


def normalize(img: jnp.ndarray) -> jnp.ndarray:
    """(…, H, W, 3) float RGB in [0,1] -> ImageNet-standardized."""
    mean = jnp.asarray(IMAGENET_DEFAULT_MEAN, dtype=jnp.float32)
    std = jnp.asarray(IMAGENET_DEFAULT_STD, dtype=jnp.float32)
    return (img - mean) / std


def to_float(img: jnp.ndarray) -> jnp.ndarray:
    if img.dtype == jnp.uint8:
        return img.astype(jnp.float32) / 255.0
    return img.astype(jnp.float32)


def classify_preprocess(img: jnp.ndarray) -> jnp.ndarray:
    """uint8/float RGB (..., H, W, 3) -> (..., 224, 224, 3) normalized."""
    x = to_float(img)
    x = resize_bicubic(x, CLASSIFY_RESIZE, CLASSIFY_RESIZE)
    off = (CLASSIFY_RESIZE - CLASSIFY_CROP) // 2
    x = x[..., off : off + CLASSIFY_CROP, off : off + CLASSIFY_CROP, :]
    return normalize(x)


def feature_target_size(height: int, width: int, patch_size: int) -> tuple[int, int]:
    """Quirk Q4: (dim//patch + 1) * patch — one extra patch even on exact multiples."""
    return (
        (height // patch_size + 1) * patch_size,
        (width // patch_size + 1) * patch_size,
    )


def feature_preprocess(img: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """uint8/float RGB (..., H, W, 3) -> resized-to-patch-multiple, normalized."""
    h, w = img.shape[-3], img.shape[-2]
    th, tw = feature_target_size(h, w, patch_size)
    x = to_float(img)
    x = resize_bicubic(x, th, tw)
    return normalize(x)

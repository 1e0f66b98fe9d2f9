"""OpenCV-compatible resize as dense matmuls (MXU-friendly, jit-safe).

The reference preprocesses with cv2.resize(INTER_CUBIC) on float32 images
(/root/reference/dinov2.cpp:106-156) and interpolates positional embeddings the
same way (dinov2.cpp:159-225). OpenCV's float path uses the Catmull-Rom-like
cubic kernel with A = -0.75, sample centers at (i+0.5)*scale-0.5, replicated
borders, and NO antialiasing on downscale — which differs from both
`jax.image.resize` (Keys A=-0.5) and PIL (antialiased). Quirk Q2 in SURVEY.md.

Because a separable resize is linear, each axis is exactly a (dst, src) weight
matrix; we build those matrices in numpy at trace time (shapes are static under
jit) and apply them as two matmuls. This is both bit-faithful to OpenCV and the
fastest formulation on TPU for the small grids involved.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_A = -0.75  # OpenCV's fixed bicubic coefficient


def _cubic_coeffs(t: np.ndarray) -> np.ndarray:
    """OpenCV interpolateCubic: 4 tap weights for fractional offset t in [0,1)."""
    w0 = ((_A * (t + 1) - 5 * _A) * (t + 1) + 8 * _A) * (t + 1) - 4 * _A
    w1 = ((_A + 2) * t - (_A + 3)) * t * t + 1
    w2 = ((_A + 2) * (1 - t) - (_A + 3)) * (1 - t) * (1 - t) + 1
    w3 = 1.0 - w0 - w1 - w2
    return np.stack([w0, w1, w2, w3], axis=-1)


@functools.lru_cache(maxsize=256)
def cubic_resize_matrix(src: int, dst: int) -> np.ndarray:
    """(dst, src) float32 matrix M with out = M @ in, matching cv2 INTER_CUBIC."""
    scale = src / dst
    fx = (np.arange(dst, dtype=np.float64) + 0.5) * scale - 0.5
    sx = np.floor(fx).astype(np.int64)
    t = fx - sx
    # border handling: out-of-range taps are clamped to the edge pixel
    # (BORDER_REPLICATE); the fractional offset t is kept as-is.
    coeffs = _cubic_coeffs(t)  # (dst, 4)
    m = np.zeros((dst, src), dtype=np.float64)
    rows = np.arange(dst)
    for k in range(4):
        idx = np.clip(sx - 1 + k, 0, src - 1)
        np.add.at(m, (rows, idx), coeffs[:, k])
    return m.astype(np.float32)


@functools.lru_cache(maxsize=256)
def nearest_resize_index(src: int, dst: int) -> np.ndarray:
    """cv2 INTER_NEAREST source index per dst pixel: floor(i * src/dst), clamped."""
    scale = src / dst
    idx = np.floor(np.arange(dst) * scale).astype(np.int64)
    return np.minimum(idx, src - 1)


def resize_bicubic(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """cv2.resize(..., INTER_CUBIC) on float images; img is (..., H, W, C)."""
    h, w = img.shape[-3], img.shape[-2]
    mh = jnp.asarray(cubic_resize_matrix(h, out_h))
    mw = jnp.asarray(cubic_resize_matrix(w, out_w))
    x = img.astype(jnp.float32)
    # rows: contract H against (out_h, H); cols likewise. HIGHEST precision keeps
    # the MXU path f32-accurate (cv2 parity); these matmuls are tiny vs the ViT.
    hi = jax.lax.Precision.HIGHEST
    x = jnp.einsum("Oh,...hwc->...Owc", mh, x, precision=hi)
    x = jnp.einsum("Ow,...hwc->...hOc", mw, x, precision=hi)
    return x


def resize_nearest(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """cv2.resize(..., INTER_NEAREST); img is (..., H, W, C)."""
    h, w = img.shape[-3], img.shape[-2]
    ih = jnp.asarray(nearest_resize_index(h, out_h))
    iw = jnp.asarray(nearest_resize_index(w, out_w))
    return img[..., ih, :, :][..., :, iw, :]


def resize_grid_bicubic(grid: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bicubic resize of a (H, W, D) feature grid (used for pos-embed interp)."""
    return resize_bicubic(grid, out_h, out_w)

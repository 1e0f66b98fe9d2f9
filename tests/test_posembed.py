"""Pos-embed interpolation parity vs the reference algorithm
(interpolate_pos_embed, /root/reference/dinov2.cpp:159-225): per-hidden-channel
cv2 INTER_CUBIC resize of the (M, M) grid, CLS row copied verbatim, early-return
on equal patch counts."""

import cv2
import numpy as np

import jax.numpy as jnp

from dinov2_tpu.image.posembed import interpolate_pos_embed


def _reference_interp(pos_embed: np.ndarray, m: int, h: int, w: int) -> np.ndarray:
    """Loop-based transcription of the reference semantics (RGB-free, pure math)."""
    hidden = pos_embed.shape[1]
    if h * w == m * m:
        return pos_embed.copy()
    out = np.zeros((h * w + 1, hidden), dtype=np.float32)
    out[0] = pos_embed[0]
    for c in range(hidden):
        grid = pos_embed[1:, c].reshape(m, m)
        resized = cv2.resize(grid, (w, h), interpolation=cv2.INTER_CUBIC)
        out[1:, c] = resized.ravel()
    return out


def test_upscale_matches_reference(rng):
    m, hidden = 16, 24
    pos = rng.standard_normal((m * m + 1, hidden)).astype(np.float32)
    want = _reference_interp(pos, m, 20, 23)
    got = np.asarray(interpolate_pos_embed(jnp.asarray(pos), m, (20, 23)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_downscale_matches_reference(rng):
    m, hidden = 37, 8
    pos = rng.standard_normal((m * m + 1, hidden)).astype(np.float32)
    want = _reference_interp(pos, m, 16, 16)
    got = np.asarray(interpolate_pos_embed(jnp.asarray(pos), m, (16, 16)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_equal_count_early_return(rng):
    """The reference early-returns on equal COUNTS even for different shapes."""
    m, hidden = 6, 4
    pos = rng.standard_normal((m * m + 1, hidden)).astype(np.float32)
    got = np.asarray(interpolate_pos_embed(jnp.asarray(pos), m, (4, 9)))  # 36 == 36
    np.testing.assert_array_equal(got, pos)


def test_cls_row_untouched(rng):
    m, hidden = 8, 16
    pos = rng.standard_normal((m * m + 1, hidden)).astype(np.float32)
    got = np.asarray(interpolate_pos_embed(jnp.asarray(pos), m, (10, 10)))
    np.testing.assert_allclose(got[0], pos[0], rtol=1e-6)
    assert got.shape == (101, hidden)

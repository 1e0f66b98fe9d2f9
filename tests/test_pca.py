"""PCA visualization parity vs cv2.PCA (the reference's implementation,
inference.cpp:76-99). Eigenvector sign is arbitrary (quirk Q11), so projections
are compared up to per-component sign."""

import cv2
import numpy as np

import jax.numpy as jnp

from dinov2_tpu.image.pca import pca_project, pca_to_u8_grid, pca_visualization


def test_projection_matches_cv2_up_to_sign(rng):
    tokens = rng.standard_normal((100, 32)).astype(np.float32)
    eigvecs = cv2.PCACompute(tokens, mean=None, maxComponents=3)[1]  # (3, 32)
    want = (tokens - tokens.mean(axis=0)) @ eigvecs.T

    got = np.asarray(pca_project(jnp.asarray(tokens), 3))
    assert got.shape == want.shape
    for c in range(3):
        a, b = got[:, c], want[:, c]
        err_same = np.abs(a - b).max()
        err_flip = np.abs(a + b).max()
        assert min(err_same, err_flip) < 1e-3, f"component {c}"


def test_u8_grid_minmax(rng):
    proj = rng.standard_normal((12 * 10, 3)).astype(np.float32)
    grid = np.asarray(pca_to_u8_grid(jnp.asarray(proj), (12, 10)))
    assert grid.shape == (12, 10, 3)
    assert grid.dtype == np.uint8
    assert grid.min() == 0 and grid.max() == 255
    # matches cv2.normalize(..., 0, 255, NORM_MINMAX) global scaling
    want = cv2.normalize(proj, None, 0, 255, cv2.NORM_MINMAX, cv2.CV_8U)
    np.testing.assert_allclose(
        grid.reshape(-1, 3).astype(int), want.astype(int), atol=1
    )


def test_visualization_shape(rng):
    tokens = jnp.asarray(rng.standard_normal((8 * 9, 64)), jnp.float32)
    vis = np.asarray(pca_visualization(tokens, (8, 9), (8 * 14, 9 * 14)))
    assert vis.shape == (112, 126, 3)
    assert vis.dtype == np.uint8


def test_visualization_batch_matches_single(rng):
    from dinov2_tpu.image.pca import pca_visualization_batch

    tokens = jnp.asarray(rng.standard_normal((3, 8 * 9, 64)), jnp.float32)
    batched = np.asarray(pca_visualization_batch(tokens, (8, 9), (112, 126)))
    assert batched.shape == (3, 112, 126, 3) and batched.dtype == np.uint8
    for i in range(3):
        single = np.asarray(pca_visualization(tokens[i], (8, 9), (112, 126)))
        np.testing.assert_array_equal(batched[i], single)

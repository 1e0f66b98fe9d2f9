"""PCA feature visualization (reference: cv::PCA path, /root/reference/inference.cpp:76-99).

The reference computes a 3-component PCA over patch tokens (rows = patches),
projects, min-max normalizes the WHOLE projected matrix to u8 (global, not
per-component — NORM_MINMAX over all elements), reshapes to the patch grid as a
3-channel image, and nearest-upscales to the input size.

Eigenvector sign is arbitrary (quirk Q11); we canonicalize each component so its
largest-magnitude loading is positive, making output deterministic across runs.
Everything runs on device in f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dinov2_tpu.image.resize import resize_nearest


def pca_project(patch_tokens: jnp.ndarray, n_components: int = 3) -> jnp.ndarray:
    """(N, D) -> (N, n_components) PCA projection with sign canonicalization."""
    x = patch_tokens.astype(jnp.float32)
    mean = x.mean(axis=0, keepdims=True)
    xc = x - mean
    cov = jnp.dot(xc.T, xc, preferred_element_type=jnp.float32)
    eigvals, eigvecs = jnp.linalg.eigh(cov)  # ascending
    comps = eigvecs[:, -n_components:][:, ::-1]  # (D, k), top-k first
    # canonical sign: largest-|loading| entry of each component is positive
    idx = jnp.argmax(jnp.abs(comps), axis=0)
    signs = jnp.sign(comps[idx, jnp.arange(n_components)])
    comps = comps * signs
    return jnp.dot(xc, comps, preferred_element_type=jnp.float32)


def pca_to_u8_grid(projected: jnp.ndarray, grid_hw: tuple[int, int]) -> jnp.ndarray:
    """(N, 3) -> (h, w, 3) uint8 via global min-max normalization (NORM_MINMAX)."""
    h, w = grid_hw
    lo = projected.min()
    hi = projected.max()
    scaled = (projected - lo) / jnp.maximum(hi - lo, 1e-12) * 255.0
    # cv::normalize to CV_8U rounds to nearest
    u8 = jnp.clip(jnp.round(scaled), 0, 255).astype(jnp.uint8)
    return u8.reshape(h, w, 3)


@functools.partial(jax.jit, static_argnames=("grid_hw", "out_hw"))
def pca_visualization(
    patch_tokens: jnp.ndarray, grid_hw: tuple[int, int], out_hw: tuple[int, int]
) -> jnp.ndarray:
    """Full reference post-processing: project -> u8 grid -> nearest upscale.
    Jitted whole (one dispatch per frame — matters for the realtime loop)."""
    proj = pca_project(patch_tokens, 3)
    grid = pca_to_u8_grid(proj, grid_hw)
    return resize_nearest(grid, out_hw[0], out_hw[1])


@functools.partial(jax.jit, static_argnames=("grid_hw", "out_hw"))
def pca_visualization_batch(
    patch_tokens: jnp.ndarray,
    grid_hw: tuple[int, int],
    out_hw: tuple[int, int] | None = None,
) -> jnp.ndarray:
    """(B, N, D) -> (B, h, w, 3) uint8: the per-image PCA pipeline vmapped over
    the batch (each image keeps its OWN PCA basis and min-max range, matching
    the reference's per-image cv::PCA, /root/reference/inference.cpp:76-99).
    One device dispatch for the whole batch — the eigh/project/normalize chain
    runs as B independent lanes instead of a host loop of tiny programs.

    out_hw=None (or == grid_hw) skips the on-device nearest upscale and
    returns patch-grid-sized images: the device->host transfer is then ~p²
    (=196) times smaller, and the host replicates pixels instead (exactly the
    reference's division of labor, inference.cpp:95-97 — it PCAs at grid size
    and INTER_NEAREST-upscales on the CPU)."""
    def one(t):
        grid = pca_to_u8_grid(pca_project(t, 3), grid_hw)
        if out_hw is None or tuple(out_hw) == tuple(grid_hw):
            return grid
        return resize_nearest(grid, out_hw[0], out_hw[1])

    return jax.vmap(one)(patch_tokens)


def resize_nearest_host(grid_u8, out_h: int, out_w: int):
    """(..., h, w, 3) uint8 -> (..., out_h, out_w, 3) with cv2 INTER_NEAREST
    semantics (source index = floor(dst * src/dst), clamped) on the host.

    This is the reference's final PCA step — the grid-sized visualization is
    nearest-resized straight to the ORIGINAL image size
    (/root/reference/inference.cpp:89-91), which is generally a non-integer
    scale factor, so plain pixel replication is not enough."""
    import numpy as np

    grid_u8 = np.asarray(grid_u8)
    h, w = grid_u8.shape[-3], grid_u8.shape[-2]
    iy = np.minimum((np.arange(out_h) * (h / out_h)).astype(np.int64), h - 1)
    ix = np.minimum((np.arange(out_w) * (w / out_w)).astype(np.int64), w - 1)
    return grid_u8[..., iy[:, None], ix[None, :], :]

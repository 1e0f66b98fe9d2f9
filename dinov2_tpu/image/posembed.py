"""Positional-embedding interpolation (the reference's interpolate_pos_embed,
/root/reference/dinov2.cpp:159-225 — there a per-call CPU/OpenCV loop over hidden
channels; here one on-device bicubic matmul over the whole (M, M, D) grid, traced
into the jitted forward so it costs ~nothing and never touches the host).

Semantics preserved exactly:
  - CLS row (index 0) is copied verbatim, never interpolated.
  - Early-return when the new patch COUNT equals the original count
    (the reference compares counts, not shapes — dinov2.cpp:176-179).
  - Bicubic = OpenCV INTER_CUBIC (A=-0.75), see image/resize.py.
"""

from __future__ import annotations

import jax.numpy as jnp

from dinov2_tpu.image.resize import resize_bicubic


def interpolate_pos_embed(
    pos_embed: jnp.ndarray, orig_grid: int, new_hw: tuple[int, int]
) -> jnp.ndarray:
    """(M*M+1, D) -> (h*w+1, D) for the runtime patch grid (h, w)."""
    h, w = new_hw
    m = orig_grid
    if h * w == m * m:  # reference early-return on equal counts
        return pos_embed
    d = pos_embed.shape[-1]
    cls_row = pos_embed[:1]
    grid = pos_embed[1:].reshape(m, m, d)
    grid = resize_bicubic(grid, h, w)
    return jnp.concatenate([cls_row, grid.reshape(h * w, d)], axis=0)

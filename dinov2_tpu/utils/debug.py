"""Debug utilities.

print_tensor mirrors the reference's print_t_f32 (/root/reference/dinov2.cpp:73-97):
dims, first/last-n elements, and an element-sum "checksum" — kept format-compatible
so traces can be diffed against the reference's debug output.

check_finite is the sanitizer the reference lacks (SURVEY.md §5 "race detection /
sanitizers"): enable with DINOV2_TPU_DEBUG_NAN=1 to assert all pytree leaves are
finite after a forward pass.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def print_tensor(title: str, t, n: int = 10) -> None:
    arr = np.asarray(t, dtype=np.float32)
    # ggml ne[] order: innermost dimension first (print_t_f32 prints
    # ne[0..3], /root/reference/dinov2.cpp:76) — a (197, 384) activation
    # must print "dims: 384 197 1 1" or the diff-against-reference fails
    dims = list(reversed(arr.shape)) + [1] * (4 - arr.ndim)
    print(title)
    print(f"dims: {dims[0]} {dims[1]} {dims[2]} {dims[3]} f32")
    flat = arr.ravel()
    k = min(n, flat.size)
    print(f"First & Last {n} elements:")
    print(" ".join(f"{v:.5f}" for v in flat[:k]))
    print(" ".join(f"{v:.5f}" for v in flat[-k:]))
    print(f"sum:  {flat.sum(dtype=np.float64):f}\n")


def nan_debug_enabled() -> bool:
    return bool(os.environ.get("DINOV2_TPU_DEBUG_NAN"))


def check_finite(tree, where: str = "") -> None:
    """Raise if any leaf contains NaN/inf. No-op unless DINOV2_TPU_DEBUG_NAN=1."""
    if not nan_debug_enabled():
        return
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and not np.isfinite(arr).all():
            raise FloatingPointError(
                f"non-finite values at {where}{jax.tree_util.keystr(path)}"
            )

"""Measure the slab-attention backward routes (VERDICT r2 item 10).

The slab VJP recomputes through either the vanilla math (HBM (B,H,T,T)
scores in the backward) or flash_attention (FA-2 Pallas backward kernels,
no HBM scores) — routed by token count (ops/fused_attention.py::_slab_bwd).
This times jax.grad through slab_attention for both routes at slab-sized T
to locate the crossover that sets _SLAB_BWD_FLASH_MIN_T.

Usage: python scripts/bench_slab_bwd.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from dinov2_tpu.utils.cache import enable_compilation_cache


def timed_grad(fn, x, iters=10, repeats=2):
    g = jax.jit(jax.grad(fn))
    float(jnp.sum(g(x)))  # compile + force (block_until_ready is unreliable
    # through the axon tunnel — a scalar transfer is the only true barrier)
    best = float("inf")
    for r in range(repeats):
        xf = x * (1.0 + 1e-6 * (r + 1))
        float(jnp.sum(xf))
        t0 = time.perf_counter()
        for _ in range(iters):
            xf = g(xf)  # data dependence across iters
        float(jnp.sum(xf))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    enable_compilation_cache()
    from dinov2_tpu.ops.fused_attention import slab_attention

    rng = np.random.default_rng(0)
    d, heads = 768, 12
    for t, b in ((257, 64), (512, 16), (640, 16)):
        qkv = jnp.asarray(
            rng.standard_normal((b, t, 3 * d)) * 0.05, jnp.bfloat16
        )
        scale = 1.0 / (d // heads) ** 0.5

        def loss(s):
            return jnp.sum(slab_attention(s, heads, scale) ** 2)

        row = []
        for mode in ("vanilla", "flash"):
            os.environ["DINOV2_TPU_SLAB_BWD"] = mode
            ms = timed_grad(loss, qkv)
            row.append(f"{mode}={ms:.2f}ms")
        print(f"t={t} b={b}: " + "  ".join(row), flush=True)


if __name__ == "__main__":
    main()

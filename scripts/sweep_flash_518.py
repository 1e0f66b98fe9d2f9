"""Isolated flash-attention block sweep at the 518px shape (T=1370, ViT-L).

The round-3 ablation (scripts/profile_518.py) attributes ~43 of 85.6 ms to the
flash kernel core at ~17% MFU — both GEMMs cap at 50% MXU utilization (hd=64
contraction / output width), but the residual 3x needs explaining. This sweeps
block_q (the picker currently lands on bq=128, bk=1408) and times the kernel
alone with the bench methodology.

Usage: python scripts/sweep_flash_518.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np

import dinov2_tpu.ops.flash_attention as fa

sys.path.insert(0, str(Path(__file__).resolve().parent))
from profile_mfu import timed_scan  # noqa: E402


def main():
    from dinov2_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    b, t, h, hd = 8, 1370, 16, 64
    rng = np.random.default_rng(0)
    q, k, v = [
        jnp.asarray(rng.standard_normal((b, t, h, hd)), jnp.bfloat16)
        for _ in range(3)
    ]
    scale = 1.0 / hd**0.5
    float(jnp.sum(jnp.ones((8, 128))))

    gflop = 4 * b * h * t * t * hd / 1e9  # true (unpadded) attention flops

    for bqmax in (128, 256, 512, 1024, 2048):
        bq, bk, tp = fa._pick_blocks(t, hd, bqmax)
        # k/v as arguments, not closure constants (compile-payload bloat)
        ms = timed_scan(
            lambda p, qx, bm=bqmax: fa.flash_attention(qx, p[0], p[1], scale, bm),
            (k, v), q,
        )
        print(
            f"block_q<={bqmax:4d} -> (bq={bq}, bk={bk}, tp={tp}): "
            f"{ms:7.2f} ms  ~{gflop / ms:5.1f} TF/s (~{gflop / ms / 197 * 100:4.1f}% MFU)",
            flush=True,
        )

    # vanilla for reference (HBM (B,H,T,T) scores round-trip)
    from dinov2_tpu.ops.attention import vanilla_attention

    ms = timed_scan(lambda p, qx: vanilla_attention(qx, p[0], p[1], scale), (k, v), q)
    print(f"vanilla XLA          : {ms:7.2f} ms  ~{gflop / ms:5.1f} TF/s "
          f"(~{gflop / ms / 197 * 100:4.1f}% MFU)", flush=True)


if __name__ == "__main__":
    main()

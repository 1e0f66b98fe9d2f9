"""Isolate the pack-2 slab kernel's Mosaic compile cost on the live TPU.

The full-model bench (scripts/bench_opts.py with DINOV2_TPU_ATT_PACK2=1) hit
two 900-1800s timeouts without ever printing — this compiles ONE slab
attention call at the ViT-S classify shape, with nb swept from 1 up, printing
wall time per phase so the pathology is attributable (Mosaic compile vs
execute vs tunnel).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("DINOV2_TPU_ATT_PACK2", "1")

import jax
import jax.numpy as jnp
import numpy as np

from dinov2_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from dinov2_tpu.ops.fused_attention import _pick_nb, slab_attention

B, T, D, NH = 64, 257, 384, 6  # ViT-S classify


def main() -> None:
    nbs = [int(v) for v in sys.argv[1:]] or [1, _pick_nb(B, T, D, 2)]
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((B, T, 3 * D)), jnp.bfloat16)
    scale = 1.0 / (D // NH) ** 0.5
    for nb in dict.fromkeys(nbs):
        os.environ["DINOV2_TPU_SLAB_NB"] = str(nb)
        t0 = time.perf_counter()
        f = jax.jit(lambda q: slab_attention(q, NH, scale)).lower(qkv)
        t1 = time.perf_counter()
        c = f.compile()
        t2 = time.perf_counter()
        out = c(qkv)
        jax.block_until_ready(out)
        t3 = time.perf_counter()
        print(
            f"nb={nb}: lower {t1 - t0:.1f}s  compile {t2 - t1:.1f}s  "
            f"first-run {t3 - t2:.2f}s  finite={bool(jnp.isfinite(out).all())}",
            flush=True,
        )


if __name__ == "__main__":
    main()

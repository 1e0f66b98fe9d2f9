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


def micro() -> None:
    """Compile ONE pair core in a minimal pallas_call (t=257, single pair) —
    bisects Mosaic cost: if this alone is slow, the pathology is the pair
    core's misaligned (t, 2t) tiles, not the slab kernel's unrolling."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from dinov2_tpu.ops.fused_attention import _pair_softmax_pv

    rng = np.random.default_rng(0)
    t, hd = T, 64
    scale = 1.0 / hd**0.5

    def kern(q_ref, k_ref, v_ref, o_ref):
        o_ref[...] = _pair_softmax_pv(
            q_ref[...], k_ref[...], v_ref[...], scale
        ).astype(o_ref.dtype)

    args = [
        jnp.asarray(rng.standard_normal((t, 2 * hd)), jnp.bfloat16)
        for _ in range(3)
    ]
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((t, 2 * hd), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=jax.default_backend() == "cpu",
    )
    t0 = time.perf_counter()
    lowered = jax.jit(f).lower(*args)
    t1 = time.perf_counter()
    c = lowered.compile()
    t2 = time.perf_counter()
    out = c(*args)
    jax.block_until_ready(out)
    t3 = time.perf_counter()
    print(
        f"micro(one pair, t={t}): lower {t1 - t0:.1f}s  compile {t2 - t1:.1f}s"
        f"  first-run {t3 - t2:.2f}s  finite={bool(jnp.isfinite(out).all())}",
        flush=True,
    )


def main() -> None:
    argv = sys.argv[1:]
    if argv and argv[0] == "--micro":
        micro()
        argv = argv[1:]
        if not argv:
            return
    nbs = [int(v) for v in argv] or [1, _pick_nb(B, T, D, 2)]
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

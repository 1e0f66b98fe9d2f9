"""On-chip numerics check: slab/flash attention paths vs the vanilla einsum.

Runs the full ViT forward on the real TPU in bf16 with flash_attention set to
"slab", "flash", and False on the same input and reports max prob / CLS
deltas (the r2 baseline for slab-vs-vanilla was 6.7e-5 max prob delta).

Usage: python scripts/check_slab_numerics_tpu.py [small|base]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax.numpy as jnp

from dinov2_tpu.models.config import PRESETS, DinoConfig
from dinov2_tpu.models.params import init_params
from dinov2_tpu.models.vit import ModelOptions, forward
from dinov2_tpu.utils.cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    size = sys.argv[1] if len(sys.argv) > 1 else "base"
    cfg = PRESETS[size]
    cfg = DinoConfig(**{**cfg.__dict__, "num_classes": 1000})
    params = init_params(cfg, seed=0, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 224, 224, 3)), jnp.float32)

    outs = {}
    for path in (False, "slab", "flash"):
        opts = ModelOptions(
            parity="reference", compute_dtype=jnp.bfloat16, flash_attention=path
        )
        out = forward(params, x, cfg, opts, classify=True)
        outs[path] = {k: np.asarray(v) for k, v in out.items()}

    base = outs[False]
    ok = True
    for path in ("slab", "flash"):
        dp = np.abs(outs[path]["probs"] - base["probs"]).max()
        dc = np.abs(outs[path]["cls_token"] - base["cls_token"]).max()
        t1 = (
            outs[path]["probs"].argmax(-1) == base["probs"].argmax(-1)
        ).all()
        good = dp < 2e-3 and t1
        ok &= bool(good)
        print(
            f"{path}: probs max|Δ|={dp:.6f} cls max|Δ|={dc:.5f} "
            f"top1 {'match' if t1 else 'DIFFER'} {'OK' if good else 'FAIL'}",
            flush=True,
        )
    print("SLAB NUMERICS", "OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

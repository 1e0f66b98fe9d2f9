"""On-device validation of the fused-quant kernels (all five ggml formats).

For each format: write a synthetic ViT-S-shaped checkpoint, quantize it, load
it twice (quant_mode="dequant" vs "fused"), run both jitted forwards on the
SAME input on the real TPU, and report max|Δ| of CLS features and probs.

The script FORCES the Mosaic kernel routes (DINOV2_TPU_QUANT_SLAB=kernel for
the quant half-layer kernel, DINOV2_TPU_QUANT_BACKEND=pallas for the
per-matmul fused kernels) — with default env the round-3 "auto" routing runs
the transient-XLA-dequant routes instead, and the kernels this script exists
to validate would never execute.

Usage: python scripts/validate_quant_tpu.py [small|base] [formats...]
"""

from __future__ import annotations

import os
import sys
import tempfile
from pathlib import Path

os.environ.setdefault("DINOV2_TPU_QUANT_SLAB", "kernel")
os.environ.setdefault("DINOV2_TPU_QUANT_BACKEND", "pallas")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax.numpy as jnp

from dinov2_tpu.io.synthetic import write_synthetic_gguf
from dinov2_tpu.models.config import PRESETS, DinoConfig
from dinov2_tpu.models.params import load_params
from dinov2_tpu.models.vit import ModelOptions, forward
from dinov2_tpu.quant.quantize import quantize_gguf


def main():
    from dinov2_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = sys.argv[1:]
    size = args[0] if args and args[0] in PRESETS else "small"
    fmts = [a for a in args if a.startswith("q")] or [
        "q4_0", "q4_1", "q5_0", "q5_1", "q8_0"
    ]
    cfg = PRESETS[size]
    cfg = DinoConfig(**{**cfg.__dict__, "num_classes": 1000})
    tmp = Path(tempfile.mkdtemp(prefix="dinov2-valq-"))
    src = tmp / "m.gguf"
    write_synthetic_gguf(src, cfg, seed=11)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 224, 224, 3)), jnp.float32)
    opts = ModelOptions(parity="reference", compute_dtype=jnp.bfloat16)

    ok = True
    for fmt in fmts:
        qpath = tmp / f"m.{fmt}.gguf"
        quantize_gguf(src, qpath, fmt)
        outs = {}
        for mode in ("dequant", "fused"):
            loaded = load_params(qpath, dtype=jnp.bfloat16, quant_mode=mode)
            out = forward(loaded.params, x, loaded.config, opts, classify=True)
            outs[mode] = {k: np.asarray(v) for k, v in out.items()}
        dcls = np.abs(outs["fused"]["cls_token"] - outs["dequant"]["cls_token"]).max()
        dpro = np.abs(outs["fused"]["probs"] - outs["dequant"]["probs"]).max()
        t5f = outs["fused"]["probs"][0].argsort()[::-1][:5]
        t5d = outs["dequant"]["probs"][0].argsort()[::-1][:5]
        agree = (t5f == t5d).all()
        # fused dequantizes weights at bf16 granularity in-kernel vs the f32
        # dequant-at-load: expect bf16-level CLS deltas. top-5 agreement is
        # reported but NOT gating — synthetic random weights give near-uniform
        # probs (~1/1000 each), where a 3e-5 delta legitimately permutes ranks
        good = dcls < 0.25 and dpro < 5e-3
        ok &= bool(good)
        print(
            f"{fmt}: cls max|Δ|={dcls:.4f} probs max|Δ|={dpro:.5f} "
            f"top5 {'match' if agree else 'DIFFER'} "
            f"{'OK' if good else 'FAIL'}",
            flush=True,
        )
    print("QUANT VALIDATION", "OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

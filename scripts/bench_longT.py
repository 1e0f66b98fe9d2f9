"""Exercise the flash kernel at the sequence lengths it exists for (VERDICT r4
item 4).

SUITE_RESULTS measures flash only at T=257-1370, where the slab path wins
anyway. This runs genuine long-T feature extraction on ViT-B — 1022px
(73x73 grid -> 5330 tokens) and 1302px (93x93 -> 8650 tokens) — where the
(T, T) softmax tile cannot fit VMEM (T=5330: 113 MB f32 per head-row) and the
KV-blocked online-softmax flash kernel (ops/flash_attention.py) is the only
feasible Pallas path. This is the `ggml_flash_attn_ext` analog doing the job
the reference built it for (/root/reference/dinov2.cpp:499-525: the -fa path
for long sequences).

Legs:
  1. bench rows: auto-routed forward (flash at T>=1024) at 1022px b1/b2 and
     1302px b1, ms/image + patch-tok/s.
  2. on-chip parity: flash vs XLA vanilla attention at 1022px b1 — max |d|
     on CLS and patch-token features (vanilla materializes the (12, 5330,
     5330) f32 scores in HBM, ~1.4 GB transient — feasible, just slow).

Output: `RESULTS_JSON {...}`. CPU-side parity at long T lives in
tests/test_flash_long_t.py (interpret mode).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from dinov2_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from scripts.tpu_suite import scan_timed  # noqa: E402

from dinov2_tpu.models.config import PRESETS, DinoConfig  # noqa: E402
from dinov2_tpu.models.params import init_params  # noqa: E402
from dinov2_tpu.models.vit import ModelOptions, forward_features  # noqa: E402


def main() -> None:
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    results: dict = {}

    cfg0 = PRESETS["base"]
    cfg = DinoConfig(**{**cfg0.__dict__, "num_classes": 0})
    params = init_params(cfg, seed=0, dtype=jnp.bfloat16)

    # --- leg 1: bench rows (auto path -> flash at these T) ------------------
    for px, b in ((1022, 1), (1022, 2), (1302, 1)):
        t = (px // cfg.patch_size) ** 2 + 1
        x = jnp.asarray(rng.standard_normal((b, px, px, 3)), jnp.float32)
        opts = ModelOptions(parity="reference", compute_dtype=jnp.bfloat16)

        def body(params, c):
            tokens = forward_features(params, c, cfg, opts)
            return c + (1e-8 * jnp.mean(tokens[:, 0])).astype(c.dtype)

        key = f"base-{px}px-b{b}-flash"
        try:
            dt = scan_timed(body, x, iters=5, params=params)
            results[key] = {
                "tokens": t,
                "ms_per_image": round(dt * 1e3 / b, 1),
                "img_per_s": round(b / dt, 2),
                "patch_tok_per_s": round(b * (t - 1) / dt),
            }
            print(key, results[key], flush=True)
        except Exception as e:  # noqa: BLE001
            results[key] = {"error": str(e)[:160]}
            print(key, "FAILED", str(e)[:160], flush=True)

    # --- leg 2: on-chip flash-vs-vanilla parity at 1022px b1 ----------------
    px, b = 1022, 1
    x = jnp.asarray(rng.standard_normal((b, px, px, 3)), jnp.float32)
    try:
        out = {}
        for name, fa in (("flash", True), ("vanilla", False)):
            opts = ModelOptions(
                parity="reference", compute_dtype=jnp.bfloat16, flash_attention=fa
            )
            tokens = jax.jit(
                lambda p, c, opts=opts: forward_features(p, c, cfg, opts)
            )(params, x)
            out[name] = np.asarray(tokens, np.float32)
        d = np.abs(out["flash"] - out["vanilla"])
        scale = float(np.abs(out["vanilla"]).max())
        results["parity-1022px"] = {
            "max_abs_diff": round(float(d.max()), 5),
            "max_rel_to_peak": round(float(d.max()) / scale, 6),
            "cls_max_abs_diff": round(float(d[:, 0].max()), 5),
        }
        print("parity-1022px", results["parity-1022px"], flush=True)
    except Exception as e:  # noqa: BLE001
        results["parity-1022px"] = {"error": str(e)[:160]}
        print("parity FAILED", str(e)[:160], flush=True)

    print("\nRESULTS_JSON " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()

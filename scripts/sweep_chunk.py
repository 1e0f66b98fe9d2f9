"""Validate the _batch_chunk heuristic beyond the one tuned shape (VERDICT r4
item 5).

Round 4 tuned models/vit.py::_batch_chunk (sequential lax.map chunks of 8 at
T>=1024) on exactly ViT-L@518 feature mode. This sweep measures chunk OFF vs
chunk 8 across:

  - ViT-B@518  feature mode (T=1370, same gate, different width)
  - ViT-L@518  feature mode (the tuned shape, re-measured same-session)
  - ViT-g@224  classify     (T=257 — below the gate; verifies whole-batch is
                             genuinely right for long models at classify T)

at b8/16/32/64 each. Chunking is applied IN-SCRIPT (a local lax.map wrapper
around forward_features) rather than via DINOV2_TPU_BATCH_CHUNK, because
`forward`'s jit cache is keyed on shapes only — an env flip between calls of
the same shape would silently reuse the first trace.

Output: one `RESULTS_JSON {...}` line, keys `{size}-{px}-b{batch}-{off|c8}`.
Timing follows the bench.py contract (data-dependent jitted scan, fresh input
per repeat, min over repeats; reference "graph computation took",
/root/reference/inference.cpp:62-68).
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
from dinov2_tpu.models.vit import ModelOptions, forward_features, forward_head  # noqa: E402

SWEEP = [
    # (preset, px, classify, batches)
    ("base", 518, False, (8, 16, 32, 64)),
    ("large", 518, False, (8, 16, 32, 64)),
    ("giant", 224, True, (8, 16, 32, 64)),
]
CHUNK = 8


def main() -> None:
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    results: dict[str, dict] = {}

    for preset, px, classify, batches in SWEEP:
        cfg0 = PRESETS[preset]
        cfg = DinoConfig(**{**cfg0.__dict__, "num_classes": 1000 if classify else 0})
        params = init_params(cfg, seed=0, dtype=jnp.bfloat16)
        opts = ModelOptions(parity="reference", compute_dtype=jnp.bfloat16)

        def probe_of(tokens, params):
            if classify:
                return forward_head(params, tokens, cfg, opts)
            return tokens[:, 0]

        for b in batches:
            x = jnp.asarray(rng.standard_normal((b, px, px, 3)), jnp.float32)
            for tag, chunk in (("off", None), (f"c{CHUNK}", CHUNK)):
                if chunk is not None and (b <= chunk or b % chunk):
                    continue

                def body(params, c, chunk=chunk):
                    if chunk is None:
                        tokens = forward_features(params, c, cfg, opts)
                    else:
                        xs = c.reshape(b // chunk, chunk, *c.shape[1:])
                        tokens = jax.lax.map(
                            lambda xx: forward_features(params, xx, cfg, opts), xs
                        )
                        tokens = tokens.reshape(b, *tokens.shape[2:])
                    probe = probe_of(tokens, params)
                    return c + (1e-8 * jnp.mean(probe)).astype(c.dtype)

                key = f"{preset}-{px}-b{b}-{tag}"
                try:
                    dt = scan_timed(body, x, iters=10, params=params)
                    results[key] = {
                        "ms_per_batch": round(dt * 1e3, 2),
                        "img_per_s": round(b / dt, 1),
                    }
                    print(key, results[key], flush=True)
                except Exception as e:  # noqa: BLE001
                    results[key] = {"error": str(e)[:160]}
                    print(key, "FAILED", str(e)[:160], flush=True)

    print("\nRESULTS_JSON " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()

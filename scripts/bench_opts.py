"""Production-forward A/B benchmark over ModelOptions knobs.

Times dinov2_tpu.models.vit.forward (the exact path bench.py / the engine jit)
with the bench.py methodology — one jitted lax.scan with a data dependence
across iterations, fresh buffer per repeat, min over repeats (the axon tunnel
has multi-hundred-ms random stalls; docs/TPU_NOTES.md).

Usage:
  python scripts/bench_opts.py --size small --batch 64 \
      baseline fuse_mlp            # named option sets, timed in order

Option sets: baseline, fuse_mlp, hf, vanilla, flash (extend OPTION_SETS).
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 30
REPEATS = 3


def option_sets(base: dict) -> dict:
    return {
        "baseline": dict(base),
        "fuse_mlp": {**base, "fuse_mlp": True},
        "vanilla": {**base, "flash_attention": False},
        "flash": {**base, "flash_attention": True},
        "hf": {**base, "parity": "hf"},
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="small")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("sets", nargs="*", default=["baseline"])
    args = ap.parse_args()

    from dinov2_tpu.models.config import PRESETS, DinoConfig
    from dinov2_tpu.models.params import init_params
    from dinov2_tpu.models.vit import ModelOptions, forward
    from dinov2_tpu.utils.cache import enable_compilation_cache

    # validate set names BEFORE any device work: a typo must fail instantly,
    # not after a multi-second param init + transfer through the tunnel
    sets = option_sets(dict(parity="reference", compute_dtype=jnp.bfloat16))
    unknown = [s for s in args.sets if s not in sets]
    if unknown:
        sys.exit(f"unknown option sets {unknown}; choose from {sorted(sets)}")

    enable_compilation_cache()
    base = PRESETS[args.size]
    config = DinoConfig(**{**base.__dict__, "num_classes": 1000})
    params = init_params(config, seed=0, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((args.batch, args.img, args.img, 3)), dtype=jnp.float32
    )
    float(jnp.sum(jnp.ones((8, 128))))  # warm the transfer path

    for name in args.sets:
        opts = ModelOptions(**sets[name])
        fwd = partial(forward, config=config, opts=opts, classify=True)

        def loop(params, img):
            def body(carry, _):
                out = fwd(params, carry)
                probs = out["probs"]
                return carry + (1e-8 * jnp.mean(probs)).astype(carry.dtype), None

            c, _ = jax.lax.scan(body, img, None, length=ITERS)
            return jnp.sum(c)

        jloop = jax.jit(loop)
        jax.block_until_ready(jloop(params, x))
        best = float("inf")
        for r in range(REPEATS):
            xf = x * (1.0 + 1e-6 * (r + 1))
            jax.block_until_ready(xf)
            t0 = time.perf_counter()
            float(jloop(params, xf))
            best = min(best, time.perf_counter() - t0)
        ms = best / ITERS * 1e3
        print(
            f"{name:12s} {ms:7.2f} ms/batch  {args.batch / ms * 1e3:7.0f} img/s",
            flush=True,
        )


if __name__ == "__main__":
    main()

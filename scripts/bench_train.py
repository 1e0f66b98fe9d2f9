"""Single-chip training-step benchmark (forward + backward + AdamW).

The reference (lavaman131/dinov2.cpp) is inference-only; training is this
framework's TPU-native extension (parallel/train.py). This script produces the
on-chip receipt for it: ms/step, img/s, and approximate MFU for the full
train step, using the bench.py methodology (one jitted lax.scan whose carry is
the train state itself — a real data dependence, so XLA cannot cache steps —
min over repeats to dodge tunnel noise).

MFU accounting: matmul FLOPs of a training step ~= 3x the forward's
(forward + weight-grad + input-grad GEMMs); optimizer + LN + softmax are
elementwise/VPU and excluded, matching scripts/profile_mfu.py's forward
accounting. With remat=True the recompute forward adds ~1x more (4x total) —
the printed MFU uses the *useful* 3x so remat honestly shows as lower MFU.

Usage: python scripts/bench_train.py [small|base] [batch]
Env: DINOV2_TRAIN_REMAT=1 to benchmark the remat variant too.
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
import optax

from dinov2_tpu.models.config import PRESETS, DinoConfig
from dinov2_tpu.models.params import init_params
from dinov2_tpu.models.vit import ModelOptions
from dinov2_tpu.parallel.train import Trainer

ITERS = 20
REPEATS = 3
PEAK_TFS = 197.0  # v5e bf16


def bench_step(trainer, params, opt_state, images, labels):
    step = trainer._train_step

    def loop(params, opt_state, images):
        def body(carry, _):
            p, o = carry
            p, o, m = step(p, o, images, labels)
            return (p, o), m["loss"]

        (_, _), losses = jax.lax.scan(
            body, (params, opt_state), None, length=ITERS
        )
        return losses[-1]

    jloop = jax.jit(loop)
    jax.block_until_ready(jloop(params, opt_state, images))  # compile
    best = float("inf")
    for r in range(REPEATS):
        imgs = images * (1.0 + 1e-6 * (r + 1))
        jax.block_until_ready(imgs)
        t0 = time.perf_counter()
        loss = float(jloop(params, opt_state, imgs))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1e3, loss  # ms per step


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "base"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    base = PRESETS[size]
    config = DinoConfig(**{**base.__dict__, "num_classes": 1000})

    # forward matmul FLOPs per image (same accounting as profile_mfu.py)
    t = (224 // config.patch_size) ** 2 + 1 + config.num_register_tokens
    d = config.hidden_size
    gflop_fwd = config.num_hidden_layers * (
        2 * t * d * 4 * d + 4 * t * t * d + 2 * 2 * t * d * 4 * d
    ) / 1e9

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((batch, 224, 224, 3)), dtype=jnp.float32
    )
    labels = jnp.asarray(rng.integers(0, 1000, size=(batch,)), dtype=jnp.int32)
    float(jnp.sum(jnp.ones((8, 128))))  # warm the transfer path

    variants = [("train", False)]
    if os.environ.get("DINOV2_TRAIN_REMAT", "0") == "1":
        variants.append(("train+remat", True))

    print(f"size={size} batch={batch} fwd={gflop_fwd:.1f} GFLOP/img "
          f"(train ~{3 * gflop_fwd:.1f})", flush=True)
    for name, remat in variants:
        opts = ModelOptions(
            parity="reference", compute_dtype=jnp.bfloat16, remat=remat
        )
        params = init_params(config, seed=0, dtype=jnp.float32)
        trainer = Trainer(
            config=config,
            opts=opts,
            optimizer=optax.adamw(1e-4),
            mesh=None,
            preprocess_in_step=False,
        )
        params, opt_state = trainer.place(params)
        ms, loss = bench_step(trainer, params, opt_state, images, labels)
        tfs = 3 * gflop_fwd * batch / ms  # GFLOP/batch / ms == TF/s
        print(
            f"{name:12s} {ms:8.2f} ms/step  {batch / ms * 1e3:7.0f} img/s  "
            f"~{tfs:5.1f} TF/s  ~{tfs / PEAK_TFS * 100:4.1f}% MFU  "
            f"(final loss {loss:.4f})",
            flush=True,
        )


if __name__ == "__main__":
    main()

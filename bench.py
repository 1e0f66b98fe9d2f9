"""Driver benchmark: ViT-B/14 batched classification throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "img/s", "vs_baseline": N}

Baseline: the reference dinov2.cpp runs ViT-B/14 fp16 at 200 ms/image on a
24-thread i9-14900HX (BASELINE.md) = 5 img/s. vs_baseline = ours / 5.

Methodology mirrors the reference's timed region (forward compute only, device-
synchronized; preprocessing excluded there, excluded here): ``ITERS`` batched
forwards run as ONE jitted lax.scan whose carry is data-dependent on each
iteration's output (loop-invariant hoisting / async-dispatch undercounting are
both impossible), batch 64 @ 224px, bf16. Each timed repeat uses a FRESH input
buffer and is closed by a scalar device->host transfer (the axon tunnel can
serve repeated identical executions from cache and its sync can return early —
see docs/TPU_NOTES.md); the minimum over repeats is reported (tunnel has
multi-hundred-ms random stalls). Weight values don't affect op speed, so
weights are random with the real ViT-B/14 structure.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

BATCH = 64
ITERS = 50
REPEATS = 3
BASELINE_IMG_S = 5.0  # 200 ms/image, BASELINE.md ViT-B/14 fp16

# The axon tunnel is single-client: an orphaned remote compile from an earlier
# process can leave new claims bouncing UNAVAILABLE for a long stretch
# (docs/TPU_NOTES.md). A failed backend init is cached inside a JAX process,
# so the claim probe runs in a SUBPROCESS with bounded retries before this
# process touches jax at all; only claim-probe success lets the benchmark run.
#
# The schedule escalates: killing a timed-out probe is itself a killed client,
# which re-wedges the next init for 15-40 min (docs/TPU_NOTES.md), so for a
# fixed total budget ONE long sit-through attempt beats many short ones. The
# short first attempt catches the healthy-tunnel case cheaply; the long second
# can sit through an entire wedge-recovery window without being killed mid-init.
CLAIM_SCHEDULE_S = tuple(
    int(s)
    for s in os.environ.get("DINOV2_TPU_CLAIM_SCHEDULE", "300,1500").split(",")
    if s.strip()
)
CLAIM_SLEEP_S = int(os.environ.get("DINOV2_TPU_CLAIM_SLEEP_S", "120"))

_PROBE = (
    "import jax, jax.numpy as jnp\n"
    "x = jnp.ones((256, 256))\n"
    "(x @ x).block_until_ready()\n"
    "print('CLAIM_OK', flush=True)\n"
)


def wait_for_device() -> None:
    """Block until a subprocess can claim the device and run one matmul.

    An EMPTY DINOV2_TPU_CLAIM_SCHEDULE ("" or ",") skips the probe entirely —
    the escape hatch for a known-healthy device — instead of falling through
    to the 'unreachable' exit without ever probing."""
    import subprocess

    if not CLAIM_SCHEDULE_S:
        print("bench: claim probe disabled (empty schedule)", file=sys.stderr)
        return
    attempts = len(CLAIM_SCHEDULE_S)
    for attempt, timeout_s in enumerate(CLAIM_SCHEDULE_S, start=1):
        try:
            proc = subprocess.run(
                [sys.executable, "-c", _PROBE],
                timeout=timeout_s,
                capture_output=True,
                text=True,
            )
            if proc.returncode == 0 and "CLAIM_OK" in proc.stdout:
                return
            detail = (proc.stderr or "").strip().splitlines()
            detail = detail[-1] if detail else f"rc={proc.returncode}"
        except subprocess.TimeoutExpired:
            detail = f"claim probe timed out after {timeout_s}s"
        print(
            f"bench: device claim attempt {attempt}/{attempts} failed"
            f" ({detail}); sleeping {CLAIM_SLEEP_S}s",
            file=sys.stderr,
            flush=True,
        )
        if attempt < attempts:
            time.sleep(CLAIM_SLEEP_S)
    print("bench: device unreachable after all claim attempts", file=sys.stderr)
    raise SystemExit(2)


def main() -> None:
    wait_for_device()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dinov2_tpu.utils.cache import enable_compilation_cache

    # first-of-kind Pallas compiles through the tunnel can stall for many
    # minutes; the persistent cache makes driver reruns hit warm artifacts
    enable_compilation_cache()

    from dinov2_tpu.models.config import PRESETS, DinoConfig
    from dinov2_tpu.models.params import init_params
    from dinov2_tpu.models.vit import ModelOptions, forward

    base = PRESETS["base"]
    config = DinoConfig(**{**base.__dict__, "num_classes": 1000})
    params = init_params(config, seed=0, dtype=jnp.bfloat16)
    # flash_attention defaults to "auto": on TPU at classify shapes this picks
    # the fused slab-attention kernel (ops/fused_attention.py — whole per-image
    # sequence in VMEM, no HBM scores round-trip), measured 2828 vs 1987 img/s
    # against the vanilla path on v5e (docs/TPU_NOTES.md)
    opts = ModelOptions(parity="reference", compute_dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, 224, 224, 3)), dtype=jnp.float32)

    # warm the device->host transfer path (first transfer per process is slow
    # through the tunnel; all timed repeats then pay only ~30 ms for the sync)
    float(jnp.sum(jnp.ones((8, 128))))

    def make_loop(opts):
        # params MUST be a jit argument, not a closure: closed-over arrays are
        # embedded as HLO constants (megabytes of compile payload; the tunnel's
        # compile endpoint rejects large models with HTTP 413)
        def loop(params, x):
            def body(carry, _):
                probs = forward(params, carry, config, opts, classify=True)["probs"]
                # tiny data dependence into the next input so XLA cannot hoist
                # or elide any iteration
                return carry + (1e-8 * jnp.mean(probs)).astype(carry.dtype), None

            c, _ = jax.lax.scan(body, x, None, length=ITERS)
            return jnp.sum(c)

        return jax.jit(loop)

    loop = make_loop(opts)
    jax.block_until_ready(loop(params, x))  # compile + warmup

    best = float("inf")
    for r in range(REPEATS):
        xf = x * (1.0 + 1e-6 * (r + 1))  # fresh buffer defeats any result cache
        jax.block_until_ready(xf)
        start = time.perf_counter()
        float(loop(params, xf))  # scalar transfer forces true completion
        best = min(best, time.perf_counter() - start)

    img_s = BATCH * ITERS / best
    print(
        json.dumps(
            {
                "metric": "ViT-B/14 batched classification throughput (1 chip)",
                "value": round(img_s, 2),
                "unit": "img/s",
                "vs_baseline": round(img_s / BASELINE_IMG_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

"""Probe: is W8A8 int8 matmul on the MXU materially faster than bf16 on v5e?

Decides whether a `quant-mode int8` (per-row-scale W8A8 serving mode) is worth
building. The reference publishes q8_0 speed tables (README.md:291-409) where
quantization SLOWS inference (its win is memory, not time); on TPU the MXU's
native s8xs8->s32 path is rated 2x bf16 (v5e: 394 TOPS int8 vs 197 TFLOPS
bf16), so int8 could be the first quant mode that beats dense SPEED.

Pattern per (m, k, n) shape — an MLP-like up/down GEMM pair so the lax.scan
carry chains through both matmuls with no reductions, slices, or hoistable
work (slice-of-dot would let XLA shrink the GEMM; a full mean would add an
HBM pass comparable to the GEMM itself):

  1. bf16:     y = x @ W1^T + b ; z = y @ W2^T        (today's pattern)
  2. s8s8s32:  int8 carry, int8 GEMMs, shift+cast requantize between
               (MXU ceiling: almost pure GEMM)
  3. w8a8:     per-row dynamic activation quantize -> int8 GEMM -> f32
               rescale (s_x outer s_w) -> bias -> bf16, twice
               (the full candidate mode, quantize cost included)

min-of-5 over a 20-iter scan; per-GEMM ms and TFLOP/s (2*2mkn per step).
Prints one JSON line per (shape, pattern).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from dinov2_tpu.utils.cache import enable_compilation_cache

ITERS = 20
REPEATS = 5

# (label, M, K, N) — classify T=257; ViT-B d=768 mlp=3072, ViT-S, ViT-g
SHAPES = [
    ("vit-b mlp b64", 64 * 257, 768, 3072),
    ("vit-b qkv-ish b64", 64 * 257, 768, 2304),
    ("vit-s mlp b64", 64 * 257, 384, 1536),
    ("vit-g mlp b32", 32 * 257, 1536, 6144),
]


def timed(fn, x, *consts) -> float:
    """bench.py's anti-caching contract: the axon tunnel can serve repeated
    identical executions from cache and its sync can return early, so every
    timed repeat gets a FRESH input buffer and is closed by a SCALAR
    device->host transfer (float(...)) that cannot complete early."""
    jax.block_until_ready(fn(x, *consts))  # compile + warm
    best = float("inf")
    for r in range(REPEATS):
        if x.dtype == jnp.int8:
            xf = x + jnp.int8(r + 1)
        else:
            xf = x * (1.0 + 1e-6 * (r + 1))
        jax.block_until_ready(xf)
        t0 = time.perf_counter()
        float(fn(xf, *consts))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def scan_loop(step):
    def loop(x, *consts):
        def body(carry, _):
            return step(carry, *consts), None

        c, _ = jax.lax.scan(body, x, None, length=ITERS)
        return jnp.sum(c.astype(jnp.float32))

    return jax.jit(loop)


def quantize_rows(x: jnp.ndarray):
    """Per-row symmetric dynamic int8 quantization (the candidate mode's
    activation path): s = absmax/127 per row, codes = round(x/s)."""
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1, keepdims=True)
    sx = jnp.maximum(ax, 1e-12) * (1.0 / 127.0)
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    return x8, sx


def main() -> None:
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    shapes = SHAPES
    if "--tiny" in sys.argv:  # CPU smoke: prove the patterns trace + run
        shapes = [("tiny", 256, 128, 256)]
    for label, m, k, n in shapes:
        x = jnp.asarray(rng.standard_normal((m, k)) * 0.1, dtype=jnp.bfloat16)
        w1 = jnp.asarray(rng.standard_normal((n, k)) * 0.02, dtype=jnp.bfloat16)
        w2 = jnp.asarray(rng.standard_normal((k, n)) * 0.02, dtype=jnp.bfloat16)
        b1 = jnp.asarray(rng.standard_normal((n,)), dtype=jnp.bfloat16)
        x8 = jnp.asarray(rng.integers(-127, 128, (m, k)), dtype=jnp.int8)
        w1_8 = jnp.asarray(rng.integers(-127, 128, (n, k)), dtype=jnp.int8)
        w2_8 = jnp.asarray(rng.integers(-127, 128, (k, n)), dtype=jnp.int8)
        s1 = jnp.asarray(np.abs(rng.standard_normal((n,))) * 1e-3 + 1e-4, dtype=jnp.float32)
        s2 = jnp.asarray(np.abs(rng.standard_normal((k,))) * 1e-3 + 1e-4, dtype=jnp.float32)

        gflop_step = 2 * 2 * m * k * n / 1e9  # two GEMMs per step

        def bf16_pair(xc, w1c, w2c, b1c):
            y = jnp.dot(xc, w1c.T, preferred_element_type=xc.dtype) + b1c
            z = jnp.dot(y, w2c.T, preferred_element_type=xc.dtype)
            # keep the carry finite across 20 chained pairs
            return (z * 0.01).astype(xc.dtype)

        def s8_dot(a8, wc8):
            return jax.lax.dot_general(
                a8, wc8, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )

        def int8_pair(x8c, w1c8, w2c8):
            y = s8_dot(x8c, w1c8)
            y8 = jax.lax.shift_right_arithmetic(y, 8).astype(jnp.int8)
            z = s8_dot(y8, w2c8)
            return jax.lax.shift_right_arithmetic(z, 8).astype(jnp.int8)

        def w8a8_pair(xc, w1c8, s1c, b1c, w2c8, s2c):
            a8, sa = quantize_rows(xc)
            y = s8_dot(a8, w1c8).astype(jnp.float32) * sa * s1c[None, :]
            y = (y + b1c.astype(jnp.float32)).astype(xc.dtype)
            b8, sb = quantize_rows(y)
            z = s8_dot(b8, w2c8).astype(jnp.float32) * sb * s2c[None, :]
            return (z * 0.01).astype(xc.dtype)

        t_bf16 = timed(scan_loop(bf16_pair), x, w1, w2, b1)
        t_raw = timed(scan_loop(int8_pair), x8, w1_8, w2_8)
        t_full = timed(scan_loop(w8a8_pair), x, w1_8, s1, b1, w2_8, s2)
        for name, t in (("bf16", t_bf16), ("s8s8s32", t_raw), ("w8a8", t_full)):
            print(
                json.dumps(
                    {
                        "shape": label,
                        "mkn": [m, k, n],
                        "pattern": name,
                        "ms_per_gemm": round(t * 1e3 / 2, 4),
                        "tflops": round(gflop_step / t / 1e3, 1),
                        "vs_bf16": round(t_bf16 / t, 3),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()

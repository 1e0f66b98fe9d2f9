"""GELU cost + bit-parity probe (ViT-S MLP shapes, v5e).

1. Times elementwise chains over the ViT-S b64 fc1 activation (16448, 1536)
   with the bench methodology: identity / gelu_tanh_f16 (production) /
   exp2-sigmoid variant / plain tanh gelu.
2. Exhaustively checks the exp2-sigmoid form against f16(gelu_tanh(f16(x)))
   over ALL 65536 f16 bit patterns — equality means it IS ggml's LUT.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 50
REPEATS = 3
_LOG2E = 1.4426950408889634


def gelu_sigmoid_f16(y: jnp.ndarray) -> jnp.ndarray:
    """f16-LUT tanh-GELU via the exact identity 0.5*(1+tanh(z)) = sigmoid(2z),
    with exp(-2z) evaluated as exp2 (the native TPU transcendental):
      z = sqrt(2/pi) * (x + 0.044715 x^3);  gelu = x / (1 + exp2(-2*log2e*z))
    """
    x = y.astype(jnp.float16).astype(jnp.float32)
    c2 = -2.0 * _LOG2E * 0.7978845608028654
    z = x * (c2 + (c2 * 0.044715) * (x * x))
    g = x / (1.0 + jnp.exp2(z))
    return g.astype(jnp.float16).astype(y.dtype)


def timed(fn, x):
    def loop(x):
        def body(c, _):
            return c + 1e-8 * fn(c), None

        c, _ = jax.lax.scan(body, x, None, length=ITERS)
        return jnp.sum(c)

    j = jax.jit(loop)
    jax.block_until_ready(j(x))
    best = float("inf")
    for r in range(REPEATS):
        xf = x * (1.0 + 1e-6 * (r + 1))
        jax.block_until_ready(xf)
        t0 = time.perf_counter()
        float(j(xf))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1e3


def main() -> None:
    from dinov2_tpu.ops.qmatmul import gelu_tanh_f16

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((16448, 1536)), jnp.bfloat16)
    print(f"identity      {timed(lambda v: v, x):7.3f} ms", flush=True)
    print(f"gelu_tanh_f16 {timed(gelu_tanh_f16, x):7.3f} ms", flush=True)
    print(f"gelu_sigmoid  {timed(gelu_sigmoid_f16, x):7.3f} ms", flush=True)
    print(f"gelu_tanh     {timed(lambda v: jax.nn.gelu(v, approximate=True), x):7.3f} ms", flush=True)
    print(f"gelu_erf      {timed(lambda v: jax.nn.gelu(v, approximate=False), x):7.3f} ms", flush=True)

    # exhaustive f16 bit-parity: every finite f16 value
    bits = np.arange(65536, dtype=np.uint16)
    vals = bits.view(np.float16)
    finite = np.isfinite(vals)
    xs = jnp.asarray(vals[finite].astype(np.float32))
    ref = jax.jit(gelu_tanh_f16)(xs)
    new = jax.jit(gelu_sigmoid_f16)(xs)
    ref16 = np.asarray(ref, dtype=np.float16)
    new16 = np.asarray(new, dtype=np.float16)
    same = (ref16.view(np.uint16) == new16.view(np.uint16)) | (
        np.isnan(ref16) & np.isnan(new16)
    )
    bad = np.flatnonzero(~same)
    print(f"exhaustive f16 parity: {len(bad)} / {same.size} mismatches", flush=True)
    if len(bad):
        v = vals[finite][bad]
        print("first mismatches:", [(float(a), float(r), float(n)) for a, r, n in
              zip(v[:8], ref16[bad[:8]], new16[bad[:8]])], flush=True)


if __name__ == "__main__":
    main()

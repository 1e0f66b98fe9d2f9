"""Pallas fused attention kernel for the DINOv2 encoder (TPU).

This replaces the reference's optional ggml flash-attention path
(/root/reference/dinov2.cpp:499-525, quirk Q8: there the seq is padded to a
multiple of 32 and K/V are cast to fp16). ViT sequences are short (257 tokens at
224px classify up to ~1374 at 518px feature mode), so the full K/V for one
(batch, head) fits comfortably in VMEM: the kernel keeps Q-blocking for
pipelining but consumes K/V whole — a single fused
   scores = q·kᵀ -> mask -> softmax(f32) -> p·v
with no (T, T) HBM materialization, which is exactly the memory behavior flash
attention buys at these lengths. Softmax runs in f32; matmuls hit the MXU in the
input dtype.

Padding: T is padded to a lane multiple (128); padded KEY columns are masked to
-inf before the softmax so they receive zero weight; padded QUERY rows compute
garbage that the caller slices off. This keeps numerics identical to the
unpadded vanilla path (unlike the reference's flash path, which is "less
accurate" — README:264).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, t_actual: int):
    q = q_ref[0]  # (BQ, hd)
    k = k_ref[0]  # (Tp, hd)
    v = v_ref[0]  # (Tp, hd)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < t_actual, s, NEG_INF)

    # f32 softmax over keys
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / denom

    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    block_q: int = 512,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """(B, T, H, hd) q/k/v -> (B, T, H, hd), numerics-matched to vanilla MHSA."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    b, t, h, hd = q.shape
    tp = _round_up(t, LANE)
    bq = min(block_q, tp)
    while tp % bq != 0:
        bq //= 2

    def prep(x):
        x = x.transpose(0, 2, 1, 3).reshape(b * h, t, hd)
        return jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))

    qf, kf, vf = prep(q), prep(k), prep(v)

    grid = (b * h, tp // bq)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, t_actual=t),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, hd), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, hd), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, hd), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bq, hd), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, tp, hd), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * tp * tp * hd,
            bytes_accessed=3 * b * h * tp * hd * q.dtype.itemsize
            + b * h * tp * hd * q.dtype.itemsize,
            transcendentals=b * h * tp * tp,
        ),
    )(qf, kf, vf)

    out = out[:, :t].reshape(b, h, t, hd).transpose(0, 2, 1, 3)
    return out

"""Pallas flash attention for the DINOv2 encoder (TPU): online softmax, KV-blocked.

This replaces the reference's optional ggml flash-attention path
(/root/reference/dinov2.cpp:499-525, quirk Q8: there the seq is padded to a
multiple of 32 and K/V are cast to fp16, "less accurate"). Here the kernel is
numerics-identical to the vanilla path: padded key columns are masked before the
softmax, statistics (m, l) and the accumulator are f32, and the matmuls hit the
MXU in the input dtype.

Structure (standard flash forward, cf. jax.experimental.pallas.ops.tpu):
  grid = (batch*heads, q_blocks, kv_blocks), kv innermost ("arbitrary");
  VMEM scratch carries the running max m, normalizer l, and output accumulator
  across KV steps. For ViT-sized sequences (257..1500 tokens) a single KV block
  covers the whole sequence and the loop degenerates to one fused pass; for
  large feature-mode inputs (high-resolution images -> 10k+ tokens) the KV
  blocking keeps the scores tile inside VMEM where the naive (T, T) softmax
  cannot run at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)  # avoids exp(-inf - -inf) NaNs
_VMEM_BUDGET = 10 * 1024 * 1024


def _attn_kernel(
    q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, scale, t_actual, bk
):
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (bq, hd)
    k = k_ref[0]  # (bk, hd)
    v = v_ref[0]  # (bk, hd)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * bk
    s = jnp.where(col < t_actual, s, NEG_INF)

    m_prev = m_scr[:, :1]  # (bq, 1), lane-broadcast storage
    l_prev = l_scr[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)  # (bq, bk)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scr[...] = acc_scr[...] * alpha + pv
    m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(kv_idx == pl.num_programs(2) - 1)
    def _finish():
        l = l_scr[:, :1]
        inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_scr[...] * inv).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_blocks(tp: int, hd: int, block_q: int) -> tuple[int, int]:
    """Choose (bq, bk) so the f32 scores tile + K/V tiles fit in VMEM."""
    bq = min(block_q, tp)
    bk = min(tp, 2048)
    while bq * bk * 4 + 2 * bk * hd * 2 + bq * (hd * 4 + 2 * LANE * 4) > _VMEM_BUDGET:
        if bk >= bq and bk > LANE:
            bk //= 2
        elif bq > LANE:
            bq //= 2
        else:
            break
    return max(LANE // 16, bq), max(LANE, bk)


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
    bq, bk = _pick_blocks(_round_up(t, LANE), hd, block_q)
    tp = _round_up(t, max(bq, bk))

    def prep(x):
        x = x.transpose(0, 2, 1, 3).reshape(b * h, t, hd)
        return jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))

    qf, kf, vf = prep(q), prep(k), prep(v)

    grid = (b * h, tp // bq, tp // bk)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, t_actual=t, bk=bk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, hd), lambda i, j, _: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, hd), lambda i, _, kv: (i, kv, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, hd), lambda i, _, kv: (i, kv, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bq, hd), lambda i, j, _: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, tp, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, LANE), jnp.float32),  # running max m
            pltpu.VMEM((bq, LANE), jnp.float32),  # running normalizer l
            pltpu.VMEM((bq, hd), jnp.float32),  # output accumulator
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * tp * tp * hd,
            bytes_accessed=4 * b * h * tp * hd * q.dtype.itemsize,
            transcendentals=b * h * tp * tp,
        ),
    )(qf, kf, vf)

    out = out[:, :t].reshape(b, h, t, hd).transpose(0, 2, 1, 3)
    return out

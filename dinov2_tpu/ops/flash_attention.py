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

    # stats live lane-broadcast in (bq, LANE) scratch; recover the per-row value
    # with a full-width reduction (1-lane slice reads mislower on Mosaic)
    m_prev = jnp.max(m_scr[...], axis=-1, keepdims=True)  # (bq, 1)
    l_prev = jnp.max(l_scr[...], axis=-1, keepdims=True)
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
        l = jnp.max(l_scr[...], axis=-1, keepdims=True)
        inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_scr[...] * inv).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_blocks(t: int, hd: int, block_q: int) -> tuple[int, int, int]:
    """Choose (bq, bk, tp) with the grid invariant tp % bq == tp % bk == 0
    (violating it silently drops Q blocks -> garbage output rows) and the f32
    scores tile + K/V tiles inside the VMEM budget. bq is a power of two; bk is
    a multiple of bq."""
    t_lanes = _round_up(t, LANE)

    def plan(bq):
        # per-KV-column VMEM cost: one f32 scores column (bq*4) + one K and one
        # V row, DOUBLE-buffered by the Mosaic pipeline (2 * 2*hd*2 = 8*hd);
        # fixed cost: double-buffered q and o tiles + m/l/acc scratch
        fixed = 4 * bq * hd + 4 * bq * hd + bq * (hd * 4 + 2 * LANE * 4)
        bk_budget = (_VMEM_BUDGET - fixed) // (bq * 4 + 8 * hd)
        bk = min(_round_up(t_lanes, bq), (bk_budget // bq) * bq)
        if bk < bq:
            return None
        return bq, bk, _round_up(t, bk)

    candidates = []
    bq = LANE
    while bq <= min(block_q, _round_up(t_lanes, LANE)):
        p = plan(bq)
        if p is not None:
            candidates.append(p)
        bq *= 2
    if not candidates:  # degenerate: even bq=LANE over budget — take it anyway
        bk = LANE
        return LANE, bk, _round_up(t, bk)
    # minimal padded score area; larger bq breaks ties (better MXU utilization)
    return min(candidates, key=lambda p: (p[2], -p[0]))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    block_q: int = 512,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """(B, T, H, hd) q/k/v -> (B, T, H, hd), numerics-matched to vanilla MHSA.

    Differentiable: the custom VJP runs the fused Pallas kernel forward and a
    recompute-based backward through the reference softmax-attention math (the
    flash forward saves only q/k/v — the same memory profile as full remat; at
    ViT sequence lengths the (T, T) backward intermediates are cheap)."""
    return _flash_forward(q, k, v, scale, block_q, interpret)


def _flash_forward(q, k, v, scale, block_q=512, interpret=None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    b, t, h, hd = q.shape
    bq, bk, tp = _pick_blocks(t, hd, block_q)

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


def _flash_fwd(q, k, v, scale, block_q, interpret):
    return _flash_forward(q, k, v, scale, block_q, interpret), (q, k, v)


def _flash_bwd(scale, block_q, interpret, residuals, g):
    from dinov2_tpu.ops.attention import vanilla_attention

    q, k, v = residuals
    _, vjp = jax.vjp(lambda q, k, v: vanilla_attention(q, k, v, scale), q, k, v)
    return vjp(g)


flash_attention.defvjp(_flash_fwd, _flash_bwd)

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


def _attn_kernel(*refs, scale, t_actual, bk, with_lse=False, kv_axis=2):
    if with_lse:
        q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr = refs
    else:
        q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr = refs
        lse_ref = None
    kv_idx = pl.program_id(kv_axis)

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

    @pl.when(kv_idx == pl.num_programs(kv_axis) - 1)
    def _finish():
        l = jnp.max(l_scr[...], axis=-1, keepdims=True)
        inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_scr[...] * inv).astype(o_ref.dtype)
        if lse_ref is not None:
            # (b·h, tp, 8) storage: tokens on the sublane axis, the value
            # replicated over an 8-wide last dim. Mosaic requires block
            # last-two dims divisible by (8, 128) OR equal to the array dims
            # — with the last dim exactly 8 == the array dim, ANY bq%8 q
            # block maps (the previous (b·h, 8, tp) layout forced bq%128,
            # locking the T=1370 training forward out of the bq=704 divisor
            # blocks the inference path uses)
            m = jnp.max(m_scr[...], axis=-1)  # (bq,)
            lse = m + jnp.log(jnp.maximum(jnp.max(l_scr[...], axis=-1), 1e-30))
            lse_ref[0] = jnp.broadcast_to(lse[:, None], lse_ref.shape[1:])


def _attn_kernel_1kv(
    q_ref, k_ref, v_ref, bias_ref, o_ref, ok_ref, *, scale, nh, safe, check
):
    """Single-KV-block specialization: when one KV block covers the whole
    (padded) sequence there is no online rescaling — no running m/l scratch,
    no alpha, no init/finish phases. The flash kernel is VPU-bound at hd=64
    (~10 elementwise passes per score element vs 2.6 ps of MXU work, round-3
    sweep: 13-15% MFU at T=1370); this shares the MXU-augmented core
    (fused_attention._head_softmax_pv): the pad mask rides the scores
    contraction as `bias_ref` ((tp, 1), -BIG at padded keys), the normalizer
    rides the PV matmul — 5 (t, t) VPU passes total. `nh` heads per grid
    cell (unrolled) lets Mosaic interleave one head's VPU softmax chain with
    the next head's MXU matmuls — one head per cell leaves the two units
    strictly serialized by data dependence."""
    from dinov2_tpu.ops.fused_attention import (
        _check_finite,
        _head_softmax_pv,
        _write_flag,
    )

    ok = jnp.int32(1)
    for hh in range(nh):
        r = _head_softmax_pv(
            q_ref[hh], k_ref[hh], v_ref[hh], scale, bias_ref[...], safe=safe
        )
        if check:
            ok = ok & _check_finite(r)
        o_ref[hh] = r.astype(o_ref.dtype)
    _write_flag(ok_ref, ok)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_blocks(t: int, hd: int, block_q: int) -> tuple[int, int, int]:
    """Choose (bq, bk, tp) with the grid invariant tp % bq == tp % bk == 0
    (violating it silently drops Q blocks -> garbage output rows) and the f32
    scores tile + K/V tiles inside the VMEM budget. bk is a multiple of bq.

    Candidates are powers of two PLUS exact divisors of the lane-rounded T
    (round 3): at T=1370 the pow2 picker lands bq=128 -> 1408 grid cells/call
    whose ~1.1 µs/cell VPU+DMA overhead dwarfs the 0.47 µs of MXU work (the
    core measured 13.6% MFU); bq=704 divides tp=1408 exactly — 4.5x fewer
    cells, zero extra padding. The logsumexp sidecar (training) rides
    (1, bq, 8) blocks of a (b·h, tp, 8) array, so it imposes no extra bq
    constraint."""
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

    cand_bq = set()
    bq = LANE
    while bq <= min(block_q, _round_up(t_lanes, LANE)):
        cand_bq.add(bq)
        bq *= 2
    div = 1
    while t_lanes // div >= LANE:
        bq = t_lanes // div
        if bq * div == t_lanes and bq % 8 == 0 and bq <= block_q:
            cand_bq.add(bq)
        div *= 2
    candidates = [p for p in (plan(bq) for bq in sorted(cand_bq)) if p is not None]
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
    block_q: int = 2048,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """(B, T, H, hd) q/k/v -> (B, T, H, hd), numerics-matched to vanilla MHSA.

    Differentiable with dedicated Pallas backward kernels (FlashAttention-2
    structure): the forward saves q/k/v, O, and the per-row logsumexp; the
    backward streams dQ / dK / dV in KV- and Q-blocked kernels without ever
    materializing the (T, T) score matrix in HBM — long-sequence training
    (10k+ tokens) has the same memory profile as the forward."""
    return _flash_forward(q, k, v, scale, block_q, interpret)


def flash_unsafe_core_active(t: int, hd: int, block_q: int = 2048) -> bool:
    """True iff _flash_forward (inference, no lse) would take the single-KV
    specialization — the only flash path that runs the unsafe CLS-shift core
    and can trip the rescue flag. The multi-KV online-softmax kernel is
    numerically safe by construction, so callers arming the whole-stack
    rescue (models/vit.py::forward_features) must not pay the duplicated
    branch when this is False.

    hd % 128 == 0 never reaches _flash_forward at all: self_attention routes
    it to flash_attention_slab (ops/attention.py), whose kernel is safe by
    construction — without this gate the caller would trace the layer stack
    twice and pay the per-forward isfinite reduce for a rescue that cannot
    trigger."""
    if hd % 128 == 0:
        return False
    bq, bk, tp = _pick_blocks(t, hd, block_q)
    return bk == tp


def _flash_forward(q, k, v, scale, block_q=2048, interpret=None, with_lse=False):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    b, t, h, hd = q.shape
    bq, bk, tp = _pick_blocks(t, hd, block_q)

    def prep(x):
        x = x.transpose(0, 2, 1, 3).reshape(b * h, t, hd)
        return jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))

    qf, kf, vf = prep(q), prep(k), prep(v)

    if not with_lse and bk == tp:
        # single KV block covers the (padded) sequence: the specialized
        # kernel drops the online-softmax machinery (see _attn_kernel_1kv);
        # -1e30 (not -f32max) so the bias survives bf16 augmentation and
        # f32 accumulation without overflow
        bias = jnp.where(
            jnp.arange(tp) < t, 0.0, -1e30
        ).astype(jnp.float32)[:, None]
        # heads per cell: enough unrolled iterations for MXU/VPU interleave,
        # bounded by VMEM ((nh, tp, hd) k/v tiles) and head-count divisibility
        nh = 1
        for cand in (2, 4):
            if (b * h) % cand == 0 and cand * tp * hd * 2 * q.dtype.itemsize * 2 < 2**21:
                nh = cand

        from dinov2_tpu.ops.fused_attention import _rescue, _sm3_mode

        def call(safe):
            check = not safe and _sm3_mode() == "rescue"
            return pl.pallas_call(
                functools.partial(
                    _attn_kernel_1kv, scale=scale, nh=nh, safe=safe, check=check
                ),
                grid=(b * h // nh, tp // bq),
                in_specs=[
                    pl.BlockSpec((nh, bq, hd), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((nh, tp, hd), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((nh, tp, hd), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((tp, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=(
                    pl.BlockSpec(
                        (nh, bq, hd), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
                    ),
                    # one (8, 128) int32 flag tile per cell, 2D grid flattened
                    # (see fused_attention._flag_specs for the layout rules)
                    pl.BlockSpec(
                        (8, 128),
                        lambda i, j, _g2=tp // bq: (i * _g2 + j, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ),
                out_shape=(
                    jax.ShapeDtypeStruct((b * h, tp, hd), q.dtype),
                    jax.ShapeDtypeStruct(
                        ((b * h // nh) * (tp // bq) * 8, 128), jnp.int32
                    ),
                ),
                interpret=interpret,
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel"),
                ),
                cost_estimate=pl.CostEstimate(
                    flops=4 * b * h * tp * tp * hd,
                    bytes_accessed=4 * b * h * tp * hd * q.dtype.itemsize,
                    transcendentals=b * h * tp * tp,
                ),
            )(qf, kf, vf, bias)

        out = _rescue(call, t, has_bias=True)
        return out[:, :t].reshape(b, h, t, hd).transpose(0, 2, 1, 3)

    out_specs = pl.BlockSpec((1, bq, hd), lambda i, j, _: (i, j, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b * h, tp, hd), q.dtype)
    if with_lse:
        out_specs = [
            out_specs,
            pl.BlockSpec(
                (1, bq, 8), lambda i, j, _: (i, j, 0), memory_space=pltpu.VMEM
            ),
        ]
        out_shape = [out_shape, jax.ShapeDtypeStruct((b * h, tp, 8), jnp.float32)]

    grid = (b * h, tp // bq, tp // bk)
    result = pl.pallas_call(
        functools.partial(
            _attn_kernel, scale=scale, t_actual=t, bk=bk, with_lse=with_lse
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, hd), lambda i, j, _: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, hd), lambda i, _, kv: (i, kv, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, hd), lambda i, _, kv: (i, kv, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
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

    if with_lse:
        out, lse = result
        return out[:, :t].reshape(b, h, t, hd).transpose(0, 2, 1, 3), lse
    return result[:, :t].reshape(b, h, t, hd).transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# Slab-consuming flash forward (round 3, the 518px feature-mode lever)
# ---------------------------------------------------------------------------
#
# At T=1370 (518px feature extraction, the reference's marquee shape,
# /root/reference/dinov2.cpp:135-156) the standard flash wrapper pays four HBM
# transposes per layer: split_heads + three (B,T,H,hd)->(B·H,T,hd) preps and
# the inverse on the output (~5 x 22 MB at ViT-L b8). This variant reads the
# (B, T, 3D) fused-qkv slab DIRECTLY — the per-(head, block) q/k/v tiles are
# just BlockSpec index maps into the slab (feature offset h·hd is block index
# h at width hd), and the output tiles write straight into a (B, T, D) slab.
# Zero layout changes in HBM; the kernel body is the identical _attn_kernel.


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def flash_attention_slab(
    qkv: jnp.ndarray,
    num_heads: int,
    scale: float,
    block_q: int = 512,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """(B, T, 3D) fused-qkv slab -> (B, T, D), transpose-free flash attention.

    Numerics identical to flash_attention (same kernel body). Differentiable:
    the VJP re-splits heads and runs the FA-2 backward kernels.

    Reach: callers gate this on hd % 128 == 0 (Mosaic's lane-divisibility
    rule for the per-head strided slab views) — every stock DINOv2 preset has
    hd=64, so no current preset takes this path in production (the standard
    head-split wrapper pays the HBM transpose instead); it exists for
    hd%128==0 configs and is kept covered by interpret-mode tests."""
    return _flash_slab_forward(qkv, num_heads, scale, block_q, interpret)


def _flash_slab_forward(qkv, num_heads, scale, block_q=512, interpret=None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t, three_d = qkv.shape
    d = three_d // 3
    hd = d // num_heads
    bq, bk, tp = _pick_blocks(t, hd, block_q)
    if tp != t:
        qkv = jnp.pad(qkv, ((0, 0), (0, tp - t), (0, 0)))

    h = num_heads
    in_specs = [
        pl.BlockSpec((1, bq, hd), lambda i, hh, j, r: (i, j, hh), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk, hd), lambda i, hh, j, r: (i, r, h + hh), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk, hd), lambda i, hh, j, r: (i, r, 2 * h + hh), memory_space=pltpu.VMEM),
    ]
    out = pl.pallas_call(
        functools.partial(
            _attn_kernel, scale=scale, t_actual=t, bk=bk, kv_axis=3
        ),
        grid=(b, h, tp // bq, tp // bk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, bq, hd), lambda i, hh, j, r: (i, j, hh), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, tp, d), qkv.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, LANE), jnp.float32),
            pltpu.VMEM((bq, LANE), jnp.float32),
            pltpu.VMEM((bq, hd), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * tp * tp * hd,
            bytes_accessed=qkv.size * qkv.dtype.itemsize * 4 // 3,
            transcendentals=b * h * tp * tp,
        ),
    )(qkv, qkv, qkv)
    return out[:, :t] if tp != t else out


def _flash_slab_fwd(qkv, num_heads, scale, block_q, interpret):
    return _flash_slab_forward(qkv, num_heads, scale, block_q, interpret), (qkv,)


def _flash_slab_bwd(num_heads, scale, block_q, interpret, residuals, g):
    (qkv,) = residuals
    b, t, three_d = qkv.shape
    d = three_d // 3

    def f(s):
        from dinov2_tpu.ops.attention import split_heads

        q, k, v = split_heads(s, num_heads)
        return flash_attention(q, k, v, scale, block_q, interpret).reshape(b, t, d)

    _, vjp = jax.vjp(f, qkv)
    return vjp(g)


flash_attention_slab.defvjp(_flash_slab_fwd, _flash_slab_bwd)


# ---------------------------------------------------------------------------
# Backward kernels (FlashAttention-2 structure)
# ---------------------------------------------------------------------------
#
# The forward saves q/k/v + per-row logsumexp; D = rowsum(dO ∘ O) is a cheap
# XLA elementwise-reduce. Two kernels then stream over the (T, T) score space
# without ever materializing it in HBM:
#   dKV: grid (b·h, kv_blocks, q_blocks), q innermost — recompute p from
#        (q, k, lse), accumulate dV += pᵀ·dO and dK += dSᵀ·q with
#        dS = p ∘ (dO·vᵀ − D) · scale.
#   dQ:  grid (b·h, q_blocks, kv_blocks), kv innermost — dQ += dS·k · scale.
# For ViT-length sequences the recompute-based fallback (jax.vjp through the
# vanilla math) is equally fast; these kernels matter for long-sequence
# (10k+ token) training where the (T, T) intermediates cannot exist.


def _bwd_p_ds(q, kk, vv, do, lse_tile, d_tile, *, scale, col0, t_actual):
    """Shared recompute: returns (p, dS) for one (bq, bk) tile, masked.
    lse_tile/d_tile arrive value-replicated (bq, 8); reduce to (bq, 1)."""
    lse_row = jnp.max(lse_tile, axis=1, keepdims=True)  # (bq, 1)
    d_row = jnp.max(d_tile, axis=1, keepdims=True)
    s = jax.lax.dot_general(
        q, kk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + col0
    s = jnp.where(col < t_actual, s, NEG_INF)
    p = jnp.exp(s - lse_row)  # (bq, bk); 0 at masked cols
    dp = jax.lax.dot_general(
        do, vv, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - d_row) * scale
    return p, ds


def _dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, d_ref, dk_ref, dv_ref,
    dk_scr, dv_scr, *, scale, t_actual, bk,
):
    q_idx = pl.program_id(2)

    @pl.when(q_idx == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    do = do_ref[0].astype(jnp.float32)
    p, ds = _bwd_p_ds(
        q, k_ref[0], v_ref[0], do_ref[0], lse_ref[0], d_ref[0],
        scale=scale, col0=pl.program_id(1) * bk, t_actual=t_actual,
    )
    dv_scr[...] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # pᵀ · dO -> (bk, hd)
    dk_scr[...] += jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # dSᵀ · q -> (bk, hd)

    @pl.when(q_idx == pl.num_programs(2) - 1)
    def _finish():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, d_ref, dq_ref, dq_scr,
    *, scale, t_actual, bk,
):
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    _, ds = _bwd_p_ds(
        q_ref[0], k_ref[0], v_ref[0], do_ref[0], lse_ref[0], d_ref[0],
        scale=scale, col0=kv_idx * bk, t_actual=t_actual,
    )
    dq_scr[...] += jax.lax.dot_general(
        ds, k_ref[0].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # dS · k -> (bq, hd)

    @pl.when(kv_idx == pl.num_programs(2) - 1)
    def _finish():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


def _flash_backward(q, k, v, o, lse, g, scale, block_q=2048, interpret=None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t, h, hd = q.shape
    bq, bk, tp = _pick_blocks(t, hd, block_q)

    def prep(x):
        x = x.transpose(0, 2, 1, 3).reshape(b * h, t, hd)
        return jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))

    qf, kf, vf, of, gf = prep(q), prep(k), prep(v), prep(o), prep(g)
    # lse arrives (b·h, tp, 8) value-replicated from the forward
    lse_f = lse
    # D = rowsum(dO ∘ O) — O(T·hd), plain XLA; same replicated storage
    d_rows = jnp.sum(gf.astype(jnp.float32) * of.astype(jnp.float32), axis=-1)
    d_rows = jnp.broadcast_to(d_rows[:, :, None], (b * h, tp, 8))

    qkv_spec_q = pl.BlockSpec((1, bq, hd), lambda i, j, r: (i, r, 0), memory_space=pltpu.VMEM)
    qkv_spec_kv = pl.BlockSpec((1, bk, hd), lambda i, j, r: (i, j, 0), memory_space=pltpu.VMEM)
    row_spec_q = pl.BlockSpec((1, bq, 8), lambda i, j, r: (i, r, 0), memory_space=pltpu.VMEM)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, t_actual=t, bk=bk),
        grid=(b * h, tp // bk, tp // bq),
        in_specs=[qkv_spec_q, qkv_spec_kv, qkv_spec_kv, qkv_spec_q, row_spec_q, row_spec_q],
        out_specs=[
            pl.BlockSpec((1, bk, hd), lambda i, j, r: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, hd), lambda i, j, r: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, tp, hd), k.dtype),
            jax.ShapeDtypeStruct((b * h, tp, hd), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, hd), jnp.float32),
            pltpu.VMEM((bk, hd), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qf, kf, vf, gf, lse_f, d_rows)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, t_actual=t, bk=bk),
        grid=(b * h, tp // bq, tp // bk),
        in_specs=[
            pl.BlockSpec((1, bq, hd), lambda i, j, r: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, hd), lambda i, j, r: (i, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, hd), lambda i, j, r: (i, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, hd), lambda i, j, r: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 8), lambda i, j, r: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 8), lambda i, j, r: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bq, hd), lambda i, j, r: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, tp, hd), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, hd), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qf, kf, vf, gf, lse_f, d_rows)

    def unprep(x):
        return x[:, :t].reshape(b, h, t, hd).transpose(0, 2, 1, 3)

    return unprep(dq), unprep(dk), unprep(dv)


def _flash_fwd(q, k, v, scale, block_q, interpret):
    out, lse = _flash_forward(q, k, v, scale, block_q, interpret, with_lse=True)
    return out, (q, k, v, out, lse)


def _flash_bwd(scale, block_q, interpret, residuals, g):
    q, k, v, o, lse = residuals
    return _flash_backward(q, k, v, o, lse, g, scale, block_q, interpret)


flash_attention.defvjp(_flash_fwd, _flash_bwd)

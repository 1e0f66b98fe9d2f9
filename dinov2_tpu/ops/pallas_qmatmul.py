"""Pallas fused dequant-matmul: y = x @ Wᵀ with W as int8 codes + block scales.

The TPU analog of ggml's quantized matmul kernels (SURVEY.md C23): the weight
stays quantized in HBM; each grid step DMAs an int8 code tile + its f32 scales
into VMEM, dequantizes in-register (codes*d (+m), block size 32 along the
contraction axis), and feeds the MXU — the dense bf16 weight never exists in
HBM.

Layout notes (see quant/blocks.py::unpack_codes): codes are (out, in) int8 with
zero-points pre-subtracted, scales (out, in/32) f32. The scale broadcast uses
pltpu.repeat along the lane axis.

Grid: (M/bm, N/bn); the full contraction K rides inside one program (DINOv2 K ≤
~8k → an int8 (bn, K) tile is ≤ 2 MB, well inside VMEM), so there is no
accumulator carry between grid steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QK = 32


def _block_indicator(nb: int, k: int) -> jnp.ndarray:
    """E (nb, k) with E[b, j] = (j // 32 == b), built from 2D iotas. Both
    jnp.repeat and broadcast+reshape crash the Mosaic compiler on v5e; matmuls
    against this indicator lower cleanly onto the MXU and are negligible FLOPs."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb, k), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (nb, k), 1)
    return (cols // QK == rows).astype(jnp.float32)


def _expand_scales(d: jnp.ndarray) -> jnp.ndarray:
    """(bn, K/32) per-block scales -> (bn, K) elementwise block broadcast: d @ E."""
    bn, nb = d.shape
    e = _block_indicator(nb, nb * QK)
    out = jax.lax.dot_general(
        d.astype(jnp.float32), e, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,  # Mosaic requires a 32-bit matmul acc
    )
    return out.astype(d.dtype)


def _block_sums(x: jnp.ndarray) -> jnp.ndarray:
    """(bm, K) -> (bm, K/32) per-block sums: x @ Eᵀ (reshape-free for Mosaic)."""
    bm, k = x.shape
    e = _block_indicator(k // QK, k)
    return jax.lax.dot_general(
        x.astype(jnp.float32), e, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _kernel_sym(x_ref, codes_ref, d_ref, o_ref, w_scr):
    # grid is (n_blocks, m_blocks) with m INNER: the dequantized weight tile is
    # built once per N tile (m==0) into VMEM scratch and reused across M blocks
    @pl.when(pl.program_id(1) == 0)
    def _dequant():
        w = codes_ref[:].astype(jnp.bfloat16)  # (bn, K)
        d = d_ref[:].astype(jnp.bfloat16)  # (bn, K//32)
        w_scr[...] = w * _expand_scales(d)

    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w_scr[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _kernel_affine(x_ref, codes_ref, d_ref, m_ref, o_ref, w_scr):
    # affine formats (q4_1/q5_1): w = codes*d + m with m constant per 32-block.
    # By linearity x @ wᵀ = x @ (codes*d)ᵀ + blocksums(x) @ mᵀ, where
    # blocksums(x)[i, b] = Σ_{k in block b} x[i, k] — exact, no broadcast of m.
    @pl.when(pl.program_id(1) == 0)
    def _dequant():
        w = codes_ref[:].astype(jnp.bfloat16)
        d = d_ref[:].astype(jnp.bfloat16)
        w_scr[...] = w * _expand_scales(d)

    x = x_ref[:]  # (bm, K)
    acc = jax.lax.dot_general(
        x, w_scr[...], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    xs = _block_sums(x)  # (bm, K/32) f32
    # the min-correction matmul is tiny (nb = K/32 contraction) — keep it f32 so
    # the affine formats match the dequantized reference within bf16 noise
    acc = acc + jax.lax.dot_general(
        xs, m_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[:] = acc.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


_VMEM_BUDGET = 10 * 1024 * 1024  # leave headroom under the ~16 MB/core VMEM


def _vmem_bytes(bm: int, bn: int, k: int, x_itemsize: int, affine: bool) -> int:
    nb = k // QK
    return (
        bm * k * x_itemsize  # x tile
        + bn * k  # int8 codes tile
        + bn * k * 2  # dequantized bf16 weight tile
        + bn * nb * 4 * (2 if affine else 1)  # scales (+ mins)
        + bm * bn * 4  # f32 accumulator/output tile
    )


def quant_matmul_pallas(
    x: jnp.ndarray,
    ql,
    block_m: int = 1024,
    block_n: int = 768,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """x (..., K) @ QuantLinear(out=N, in=K)ᵀ -> (..., N).

    Default blocks (1024, 768) measured fastest on v5e for ViT shapes — the
    fused kernel there outruns both XLA dequant-then-matmul and the dense bf16
    matmul (packed weights read fewer HBM bytes). Blocks shrink automatically
    to stay inside the VMEM budget.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    n, k = ql.shape
    lead = x.shape[:-1]
    m = 1
    for s in lead:
        m *= s
    x2 = x.reshape(m, k)

    # choose MXU-aligned blocks, then pad the operands up to block multiples
    # (padding is sliced off at the end; never shrink blocks below 8/128)
    bm = max(8, min(block_m, _round_up(m, 8)))
    bn = max(128, min(block_n, _round_up(n, 128)))
    # shrink to the VMEM budget (alternate halving the larger block)
    while (
        _vmem_bytes(bm, bn, k, x2.dtype.itemsize, ql.m is not None) > _VMEM_BUDGET
        and (bm > 8 or bn > 128)
    ):
        if bm >= bn and bm > 8:
            bm = max(8, bm // 2)
        else:
            bn = max(128, bn // 2)
    mp = _round_up(m, bm)
    np_ = _round_up(n, bn)

    if mp != m:
        x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))
    codes, d, mm = ql.codes, ql.d, ql.m
    if np_ != n:
        codes = jnp.pad(codes, ((0, np_ - n), (0, 0)))
        d = jnp.pad(d, ((0, np_ - n), (0, 0)))
        if mm is not None:
            mm = jnp.pad(mm, ((0, np_ - n), (0, 0)))

    # grid: N outer, M inner — the kernel dequantizes each weight tile once
    # (at m==0) into VMEM scratch and reuses it across all M blocks
    grid = (np_ // bn, mp // bm)
    nb = k // QK
    in_specs = [
        pl.BlockSpec((bm, k), lambda n, m: (m, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bn, k), lambda n, m: (n, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bn, nb), lambda n, m: (n, 0), memory_space=pltpu.VMEM),
    ]
    operands = [x2, codes, d]
    kernel = _kernel_sym
    if mm is not None:
        in_specs.append(
            pl.BlockSpec((bn, nb), lambda n, m: (n, 0), memory_space=pltpu.VMEM)
        )
        operands.append(mm)
        kernel = _kernel_affine

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bm, bn), lambda n, m: (m, n), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
        scratch_shapes=[pltpu.VMEM((bn, k), jnp.bfloat16)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * k,
            bytes_accessed=mp * k * x.dtype.itemsize + np_ * k + np_ * nb * 4,
            transcendentals=0,
        ),
    )(*operands)

    return out[:m, :n].reshape(*lead, n)

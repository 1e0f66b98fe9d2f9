"""Pallas fused dequant-matmul: y = x @ Wᵀ with W kept quantized in HBM.

The TPU analog of ggml's quantized matmul kernels (SURVEY.md C23): the dense
bf16 weight never exists in HBM. Two weight layouts (models/params.py):

  int8 SoA (q5_1, and any format on demand): codes (out, in) int8 with
    zero-points pre-subtracted + f32 per-block scales (+ mins). ~1.1 B/weight.

  packed (q4_0/q4_1/q5_0): the ORIGINAL ggml nibble packing (out, in/2) uint8
    (+ u16 5th-bit planes for q5_0). The activation's K axis is permuted once
    outside the kernel so each nibble plane is a contiguous half-K segment —
    no in-kernel lane shuffles. 0.56-0.69 B/weight, ggml-parity footprint.

Grid: (N/bn, M/bm) with M INNER — each weight tile is dequantized ONCE into
VMEM scratch (at m==0) and reused across all M blocks; the full contraction K
rides inside one program (DINOv2 K ≤ ~8k fits VMEM easily). Scale/bit
broadcasts are expressed as iota-indicator matmuls: jnp.repeat,
broadcast+reshape, u16 casts, and array jnp.exp2 all miscompile or are
unsupported on the v5e Mosaic compiler (see docs/TPU_NOTES.md).
"""

from __future__ import annotations

import functools

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


def _epilogue(acc: jnp.ndarray, b_ref, activation: str | None, out_dtype):
    """Matmul epilogue: cast to the output dtype, add the bias tile, apply the
    activation — all in VMEM. Order matches the XLA path exactly (qmatmul.py::
    apply_linear casts the f32 accumulator to the compute dtype, then adds the
    compute-dtype bias; models/vit.py applies GELU in the compute dtype), so
    fused-epilogue results are bit-compatible with the unfused ones."""
    y = acc.astype(out_dtype)
    if b_ref is not None:
        y = y + b_ref[:].astype(out_dtype)
    # gelu_tanh_f16 reaches this kernel in interpret mode only (real f16
    # casts); on TPU quant_matmul_pallas rewrites it to the Veltkamp
    # emulation (Mosaic has no f16 casts)
    from dinov2_tpu.ops.qmatmul import apply_activation

    return apply_activation(y, activation)


def _make_kernel_sym(activation, has_bias):
    def _kernel_sym(*refs):
        x_ref, codes_ref, d_ref = refs[0], refs[1], refs[2]
        b_ref = refs[3] if has_bias else None
        o_ref, w_scr = refs[3 + int(has_bias)], refs[4 + int(has_bias)]

        # grid is (n_blocks, m_blocks) with m INNER: the dequantized weight tile
        # is built once per N tile (m==0) into VMEM scratch, reused across M
        @pl.when(pl.program_id(1) == 0)
        def _dequant():
            w = codes_ref[:].astype(jnp.bfloat16)  # (bn, K)
            d = d_ref[:].astype(jnp.bfloat16)  # (bn, K//32)
            w_scr[...] = w * _expand_scales(d)

        acc = jax.lax.dot_general(
            x_ref[:], w_scr[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[:] = _epilogue(acc, b_ref, activation, o_ref.dtype)

    return _kernel_sym


def _make_kernel_affine(activation, has_bias):
    def _kernel_affine(*refs):
        # affine formats (q4_1/q5_1): w = codes*d + m with m constant per
        # 32-block. By linearity x @ wᵀ = x @ (codes*d)ᵀ + blocksums(x) @ mᵀ,
        # where blocksums(x)[i, b] = Σ_{k in block b} x[i, k] — exact, no
        # broadcast of m.
        x_ref, codes_ref, d_ref, m_ref = refs[0], refs[1], refs[2], refs[3]
        b_ref = refs[4] if has_bias else None
        o_ref, w_scr = refs[4 + int(has_bias)], refs[5 + int(has_bias)]

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
        # the min-correction matmul is tiny (nb = K/32 contraction) — keep it
        # f32 so affine formats match the dequantized reference within bf16 noise
        acc = acc + jax.lax.dot_general(
            xs, m_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        o_ref[:] = _epilogue(acc, b_ref, activation, o_ref.dtype)

    return _kernel_affine


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# True 4-bit path (packed q4_0/q4_1/q5_0 nibbles stay packed in HBM)
# ---------------------------------------------------------------------------
#
# Codes arrive in NATURAL-ORDER planes (models/params.py::_soa_from_blocks
# repacks ggml's block-local nibbles at load): byte j holds weight element j in
# its lo nibble and element j+K/2 in its hi nibble. The matmul runs as two
# half-K GEMMs over the planes with the activation untouched — round 1 instead
# permuted the activation's K axis with a jnp.take before every quantized
# matmul, an (M, K) HBM gather that dominated the fused path's cost at batch 64
# (docs/TPU_NOTES.md round-2 notes).


def _expand_scales_plane(d: jnp.ndarray, k2: int, offset: int) -> jnp.ndarray:
    """(bn, K/32) per-block scales -> (bn, K/2) plane broadcast: lane j of a
    natural-order plane is weight element j+offset, i.e. block (j+offset)//32."""
    bn, nb = d.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb, k2), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (nb, k2), 1)
    e = ((cols + offset) // QK == rows).astype(jnp.float32)
    out = jax.lax.dot_general(
        d.astype(jnp.float32), e, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out.astype(jnp.bfloat16)


_QH_LANES = 8  # lanes per 5th-bit word (u8 — exact in bf16, see params.py)


def _fifth_bits(qh, k2: int) -> jnp.ndarray:
    """(bn, K/16) uint8 5th-bit words (ref or array) -> (bn, K/2) f32 0/1 bit
    per lane.

    Words are per-plane natural order (one u8 per 8 consecutive lanes,
    models/params.py::_natural_plane_words). A u8 word (≤ 255) is EXACT in
    bfloat16, so the indicator-matmul broadcast runs at DEFAULT MXU precision
    — the previous u16 layout needed precision=HIGHEST (6-pass f32 emulation
    on the bf16-native MXU), which dominated the q5 fused-path cost. The
    per-lane bit is then floor(word * 2^-(lane%8)) mod 2 — pure f32 VPU ops,
    no variable integer shifts for Mosaic to choke on."""
    bn, nw = qh.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (nw, k2), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (nw, k2), 1)
    e = (cols // _QH_LANES == rows).astype(jnp.float32)
    # Mosaic has no u8->f32 cast; hop through int32 (values <= 255, exact)
    words = jax.lax.dot_general(
        qh[:].astype(jnp.int32).astype(jnp.float32), e, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bn, k2)
    shift = jax.lax.broadcasted_iota(jnp.int32, words.shape, 1) % _QH_LANES
    # exact 2^-shift via an 8-way select: jnp.exp2 on arrays lowers through
    # exp(x*ln2) and is NOT exact (drops bits at large exponents)
    scale = jnp.zeros_like(words)
    for i in range(_QH_LANES):
        scale = scale + jnp.where(shift == i, jnp.float32(2.0**-i), 0.0)
    return jnp.mod(jnp.floor(words * scale), 2.0)


def _dequant_packed_halves(qs_ref, d_ref, qhlo_ref, qhhi_ref, zero: int, k2: int):
    """Shared packed dequant: returns the (bn, K/2) lo/hi bf16 weight planes
    (natural order: lo plane lane j = element j, hi plane lane j = element
    j + K/2)."""
    qs = qs_ref[:].astype(jnp.int32)
    ds_lo = _expand_scales_plane(d_ref[:], k2, 0)
    ds_hi = _expand_scales_plane(d_ref[:], k2, k2)
    lo = (qs & 0xF).astype(jnp.float32)
    hi = (qs >> 4).astype(jnp.float32)
    if qhlo_ref is not None:
        lo = lo + 16.0 * _fifth_bits(qhlo_ref, k2)
        hi = hi + 16.0 * _fifth_bits(qhhi_ref, k2)
    wlo = (lo - zero).astype(jnp.bfloat16) * ds_lo
    whi = (hi - zero).astype(jnp.bfloat16) * ds_hi
    return wlo, whi


def _make_packed_kernel(
    zero: int, k2: int, has_m: bool, has_qh: bool, activation=None, has_bias=False
):
    def kernel(*refs):
        x_ref, qs_ref, d_ref = refs[0], refs[1], refs[2]
        i = 3
        m_ref = refs[i] if has_m else None
        i += int(has_m)
        qhlo_ref = refs[i] if has_qh else None
        qhhi_ref = refs[i + 1] if has_qh else None
        i += 2 * int(has_qh)
        b_ref = refs[i] if has_bias else None
        i += int(has_bias)
        o_ref, w_scr = refs[i], refs[i + 1]

        @pl.when(pl.program_id(1) == 0)
        def _dequant():
            wlo, whi = _dequant_packed_halves(
                qs_ref, d_ref, qhlo_ref, qhhi_ref, zero, k2
            )
            w_scr[:, :k2] = wlo
            w_scr[:, k2:] = whi

        x = x_ref[:]
        acc = jax.lax.dot_general(
            x, w_scr[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if has_m:
            # x is in natural element order, so the per-32-block sums for the
            # affine min-correction are plain consecutive-lane sums
            xs = _block_sums(x)
            acc = acc + jax.lax.dot_general(
                xs, m_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        o_ref[:] = _epilogue(acc, b_ref, activation, o_ref.dtype)

    return kernel


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
    bias: jnp.ndarray | None = None,
    activation: str | None = None,
) -> jnp.ndarray:
    """x (..., K) @ QuantLinear(out=N, in=K)ᵀ (+ bias, + activation) -> (..., N).

    Default blocks (1024, 768) measured fastest on v5e for ViT shapes — the
    fused kernel there outruns both XLA dequant-then-matmul and the dense bf16
    matmul (packed weights read fewer HBM bytes). Blocks shrink automatically
    to stay inside the VMEM budget.

    bias/activation run in the kernel epilogue (VMEM): without this, every
    quantized matmul pays a separate XLA elementwise pass over the (M, N)
    output — ~450 MB/layer of HBM traffic at the ViT-B b64 shape, the dominant
    cost of round 1's fused-quant large-batch gap (docs/TPU_NOTES.md).
    activation: None | "gelu_tanh" | "gelu_erf".
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if activation == "gelu_tanh_f16" and not interpret:
        activation = "gelu_tanh_f16_veltkamp"  # Mosaic has no f16 casts

    # dims from the ARRAYS, not the static ql.shape aux: under shard_map the
    # leaves are per-device shards while the aux still carries the global shape
    n = ql.codes.shape[0]
    k = ql.codes.shape[1] * (2 if getattr(ql, "packed", False) else 1)
    lead = x.shape[:-1]
    m = 1
    for s in lead:
        m *= s
    x2 = x.reshape(m, k)

    # choose MXU-aligned blocks (never shrink below 8/128); operands are NOT
    # padded — Pallas masks partial edge blocks on store, and every output
    # element depends only on its own (row, col), so garbage in the padded
    # region of a partial block can never leak into real outputs. Round 1
    # jnp.pad'ed x to a block multiple, a ~25 MB copy per matmul at the ViT-B
    # b64 shape (M=16448 % 1024 != 0).
    bm = max(8, min(block_m, _round_up(m, 8)))
    bn = max(128, min(block_n, _round_up(n, 128)))
    # The q5 5th-bit expansion crashes the v5e Mosaic remote compiler at
    # large tiles (the "k2=1536 bug family"); re-bisected for the u8-word
    # kernel and the fastest SURVIVING block shapes measured in the full
    # scanned model:
    #   k >= 3072 (k2 >= 1536): bn > 128 crashes for BOTH q5 formats -> 128.
    #   q5_1 otherwise: (bm=1024, bn=768) crashes; (512, 768) compiles and
    #     beats (1024, 384) by ~6% at the ViT-B b64 shape -> shrink bm.
    #   q5_0 at k < 3072: full (1024, 768) blocks are stable.
    # DINOV2_TPU_Q5_BN_CAP overrides bn (escape hatch for Mosaic regressions).
    if getattr(ql, "packed", False) and ql.qh_lo is not None:
        import os

        cap = int(os.environ.get("DINOV2_TPU_Q5_BN_CAP", "0"))
        if cap:
            bn = min(bn, cap)
        if k >= 3072:
            bn = min(bn, 128)
        elif ql.m is not None:
            while bm * bn > 512 * 768 and bm > 8:
                bm //= 2
    # shrink to the VMEM budget (alternate halving whichever block can still
    # shrink — halving only "the larger" spins forever when bm < bn with bn
    # already at its 128 floor, e.g. k >= ~20k)
    while (
        _vmem_bytes(bm, bn, k, x2.dtype.itemsize, ql.m is not None) > _VMEM_BUDGET
        and (bm > 8 or bn > 128)
    ):
        if bm >= bn and bm > 8:
            bm = max(8, bm // 2)
        elif bn > 128:
            bn = max(128, bn // 2)
        else:
            bm = max(8, bm // 2)
    mp = _round_up(m, bm)
    np_ = _round_up(n, bn)
    codes, d, mm = ql.codes, ql.d, ql.m

    # grid: N outer, M inner — the kernel dequantizes each weight tile once
    # (at m==0) into VMEM scratch and reuses it across all M blocks
    grid = (np_ // bn, mp // bm)
    nb = k // QK
    kc = codes.shape[1]  # k (int8 SoA) or k//2 (packed nibbles)
    in_specs = [
        pl.BlockSpec((bm, k), lambda n, m: (m, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bn, kc), lambda n, m: (n, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bn, nb), lambda n, m: (n, 0), memory_space=pltpu.VMEM),
    ]
    operands = [x2, codes, d]
    has_bias = bias is not None
    b2 = bias.reshape(1, n).astype(x.dtype) if has_bias else None

    def _append_bias():
        if has_bias:
            in_specs.append(
                pl.BlockSpec((1, bn), lambda n, m: (0, n), memory_space=pltpu.VMEM)
            )
            operands.append(b2)

    if getattr(ql, "packed", False):
        from dinov2_tpu.io.gguf import GGMLType

        gt = GGMLType(ql.ggml_type)
        zero = {GGMLType.Q4_0: 8, GGMLType.Q5_0: 16}.get(gt, 0)
        has_qh = ql.qh_lo is not None
        if mm is not None:
            in_specs.append(
                pl.BlockSpec((bn, nb), lambda n, m: (n, 0), memory_space=pltpu.VMEM)
            )
            operands.append(mm)
        if has_qh:
            for qh in (ql.qh_lo, ql.qh_hi):
                in_specs.append(
                    pl.BlockSpec(
                        (bn, qh.shape[1]), lambda n, m: (n, 0),
                        memory_space=pltpu.VMEM,
                    )
                )
                operands.append(qh)
        _append_bias()
        kernel = _make_packed_kernel(
            zero, k // 2, mm is not None, has_qh, activation, has_bias
        )
    elif mm is not None:
        in_specs.append(
            pl.BlockSpec((bn, nb), lambda n, m: (n, 0), memory_space=pltpu.VMEM)
        )
        operands.append(mm)
        _append_bias()
        kernel = _make_kernel_affine(activation, has_bias)
    else:
        _append_bias()
        kernel = _make_kernel_sym(activation, has_bias)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bm, bn), lambda n, m: (m, n), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((bn, k), jnp.bfloat16)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * k,
            bytes_accessed=mp * k * x.dtype.itemsize + np_ * kc + np_ * nb * 4,
            transcendentals=0,
        ),
    )(*operands)

    return out.reshape(*lead, n)

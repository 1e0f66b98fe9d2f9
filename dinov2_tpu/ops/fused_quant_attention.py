"""Fused-QUANT attention half-layer (Pallas, TPU): LN1 + QKV matmul +
slab attention + proj + LayerScale + residual with the weights kept GGML
-QUANTIZED in HBM.

Round 2's largest measured gap (VERDICT r2): fused-quant models ran the
per-matmul dequant kernels (ops/pallas_qmatmul.py) plus a separate slab
-attention kernel, paying the HBM attention round-trip the dense path's
half-layer kernel (ops/fused_attention.py::slab_layer_block) eliminates —
fused q4_0 29.3 ms vs 22.4 ms dequant-at-load at the ViT-B/14 b64 bench shape.

This kernel composes the two: the half-layer body is IDENTICAL to
_slab_layer_kernel, but the (D, 3D)/(D, D) weight tiles arrive as packed
ggml planes (or int8 SoA) and are dequantized ONCE per pallas_call into
persistent VMEM scratch at grid cell 0 — the same fetch-once trick as
pallas_qmatmul's m==0 dequant, lifted to the whole layer. The dense bf16
weight never exists in HBM (packed bytes are the only weight traffic:
0.56-1.1 B/weight vs 2 B dense), and the qkv slab / LN output / attention
output never exist in HBM either.

Numerics: the in-kernel dequant does the int->f32 cast, f32 scale multiply
(+ f32 min add for the affine formats) and a single compute-dtype cast —
ops/qmatmul.py::dequant_weight's ordering. On CPU/interpret this is exact vs
dequant_weight; on the TPU MXU the indicator-matmul scale broadcast rounds at
bf16 granularity (identical to the existing per-matmul fused kernels in
ops/pallas_qmatmul.py — dequant accuracy is unchanged vs round 2).

Reference capability: quantized inference is first-class in the reference
(/root/reference/dinov2.cpp:414-427 quantize; 239-352 quantized load); there
is no reference analog of this kernel (ggml fuses nothing across ops).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dinov2_tpu.ops.fused_attention import (
    MAX_SLAB_TOKENS,
    _aug_active,
    _attention_heads_sliced,
    _check_finite,
    _flag_specs,
    _layer_budget,
    _pick_image_blocks,
    _rescue,
    _sm3_mode,
    _write_flag,
)
from dinov2_tpu.ops.pallas_qmatmul import QK, _fifth_bits

# dequant row-chunk: the q5 5th-bit indicator expansion crashes the v5e Mosaic
# compiler at large tiles ("k2=1536 bug family", ops/pallas_qmatmul.py); 768
# rows matches the largest measured-stable qmatmul weight tile
_DEQ_ROWS = 768


def _ql_meta(ql) -> dict:
    """Static descriptor of a QuantLinear's kernel-side layout."""
    packed = bool(getattr(ql, "packed", False))
    zero = 0
    if packed and ql.m is None:
        zero = 16 if ql.qh_lo is not None else 8
    return {
        "packed": packed,
        "zero": zero,
        "has_m": ql.m is not None,
        "has_qh": packed and ql.qh_lo is not None,
        "out": ql.codes.shape[0],
        "k": ql.codes.shape[1] * (2 if packed else 1),
    }


def _ql_operands(ql) -> list:
    ops = [ql.codes, ql.d]
    if ql.m is not None:
        ops.append(ql.m)
    if getattr(ql, "packed", False) and ql.qh_lo is not None:
        ops.extend([ql.qh_lo, ql.qh_hi])
    return ops


def _ql_specs(meta: dict) -> list:
    """Constant-index-map BlockSpecs (whole tensor resident, fetched once)."""
    out, k = meta["out"], meta["k"]
    nb = k // QK
    kc = k // 2 if meta["packed"] else k
    specs = [
        pl.BlockSpec((out, kc), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((out, nb), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    if meta["has_m"]:
        specs.append(pl.BlockSpec((out, nb), lambda i: (0, 0), memory_space=pltpu.VMEM))
    if meta["has_qh"]:
        specs.extend(
            pl.BlockSpec((out, k // 16), lambda i: (0, 0), memory_space=pltpu.VMEM)
            for _ in range(2)
        )
    return specs


def _ql_vmem_bytes(meta: dict, itemsize: int = 2) -> int:
    """Resident bytes: quant operands + the dequantized compute-dtype scratch."""
    out, k = meta["out"], meta["k"]
    nb = k // QK
    n = (k // 2 if meta["packed"] else k) * out  # codes
    n += out * nb * 4 * (2 if meta["has_m"] else 1)  # d (+ m)
    if meta["has_qh"]:
        n += 2 * out * (k // 16)
    return n + out * k * itemsize  # + dequantized scratch


def _expand_plane_f32(d: jnp.ndarray, k2: int, offset: int) -> jnp.ndarray:
    """(r, K/32) f32 per-block scales -> (r, K/2) natural-order plane broadcast
    (f32, no bf16 cast — the dequant must match dequant_weight's f32 math)."""
    r, nb = d.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb, k2), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (nb, k2), 1)
    e = ((cols + offset) // QK == rows).astype(jnp.float32)
    return jax.lax.dot_general(
        d, e, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _expand_blocks_f32(d: jnp.ndarray, k: int) -> jnp.ndarray:
    """(r, K/32) f32 -> (r, K) elementwise block broadcast (SoA layout)."""
    r, nb = d.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb, k), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (nb, k), 1)
    e = (cols // QK == rows).astype(jnp.float32)
    return jax.lax.dot_general(
        d, e, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dequant_into(scr, refs: dict, meta: dict):
    """Dequantize a whole QuantLinear into (out, k) bf16 VMEM scratch,
    _DEQ_ROWS rows at a time. f32 math + single bf16 cast = dequant_weight."""
    out, k = meta["out"], meta["k"]
    k2 = k // 2
    for ofs in range(0, out, _DEQ_ROWS):
        sl = slice(ofs, min(ofs + _DEQ_ROWS, out))
        d = refs["d"][sl]
        if meta["packed"]:
            qs = refs["codes"][sl].astype(jnp.int32)
            lo = (qs & 0xF).astype(jnp.float32)
            hi = (qs >> 4).astype(jnp.float32)
            if meta["has_qh"]:
                lo = lo + 16.0 * _fifth_bits(refs["qh_lo"][sl], k2)
                hi = hi + 16.0 * _fifth_bits(refs["qh_hi"][sl], k2)
            if meta["zero"]:
                lo = lo - meta["zero"]
                hi = hi - meta["zero"]
            wlo = lo * _expand_plane_f32(d, k2, 0)
            whi = hi * _expand_plane_f32(d, k2, k2)
            if meta["has_m"]:
                wlo = wlo + _expand_plane_f32(refs["m"][sl], k2, 0)
                whi = whi + _expand_plane_f32(refs["m"][sl], k2, k2)
            scr[sl, :k2] = wlo.astype(scr.dtype)
            scr[sl, k2:] = whi.astype(scr.dtype)
        else:
            w = refs["codes"][sl].astype(jnp.float32) * _expand_blocks_f32(d, k)
            if meta["has_m"]:
                w = w + _expand_blocks_f32(refs["m"][sl], k)
            scr[sl, :] = w.astype(scr.dtype)


def _take_ql_refs(refs, i: int, meta: dict) -> tuple[dict, int]:
    out = {"codes": refs[i], "d": refs[i + 1]}
    i += 2
    if meta["has_m"]:
        out["m"] = refs[i]
        i += 1
    if meta["has_qh"]:
        out["qh_lo"], out["qh_hi"] = refs[i], refs[i + 1]
        i += 2
    return out, i


def _quant_layer_kernel(
    *refs, num_heads, scale, d, nb, eps, qkv_meta, proj_meta, safe, check
):
    x_ref, lns_ref, lnb_ref = refs[0], refs[1], refs[2]
    i = 3
    qkv_refs, i = _take_ql_refs(refs, i, qkv_meta)
    bq_ref = refs[i]
    i += 1
    proj_refs, i = _take_ql_refs(refs, i, proj_meta)
    bp_ref, ls_ref = refs[i], refs[i + 1]
    o_ref, ok_ref = refs[i + 2], refs[i + 3]
    a_scr, wq_scr, wp_scr = refs[i + 4], refs[i + 5], refs[i + 6]
    ok = jnp.int32(1)

    # weights dequantize ONCE per pallas_call (persistent VMEM scratch); the
    # grid dimension is "arbitrary" so cell 0 is guaranteed to run first
    @pl.when(pl.program_id(0) == 0)
    def _dequant():
        _dequant_into(wq_scr, qkv_refs, qkv_meta)
        _dequant_into(wp_scr, proj_refs, proj_meta)

    for b in range(nb):
        xb = x_ref[b]  # (t, d)
        x32 = xb.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
        h32 = (x32 - mu) * jax.lax.rsqrt(var + eps)
        h = (h32 * lns_ref[:] + lnb_ref[:]).astype(xb.dtype)
        # scratch is (out, in): contract on dim 1 of both (no transpose)
        acc = jax.lax.dot_general(
            h, wq_scr[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        qkv = acc.astype(xb.dtype) + bq_ref[:].astype(xb.dtype)  # (t, 3d)

        def write(lo, hi, val, b=b):
            a_scr[b, :, lo:hi] = val.astype(a_scr.dtype)

        _attention_heads_sliced(
            lambda lo, hi: qkv[:, lo:hi], qkv.shape[0], d, num_heads, scale,
            safe, write,
        )
        acc = jax.lax.dot_general(
            a_scr[b], wp_scr[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if check:  # attention inf/NaN propagates through the proj matmul
            ok = ok & _check_finite(acc)
        y = acc.astype(o_ref.dtype) + bp_ref[:].astype(o_ref.dtype)
        o_ref[b] = xb + y * ls_ref[:].astype(o_ref.dtype)
    _write_flag(ok_ref, ok)


def _quant_layer_cost(
    nb: int, t: int, d: int, itemsize: int, qkv_meta: dict, proj_meta: dict
) -> int:
    xio = nb * t * d * itemsize
    qkv_val = nb * t * 3 * d * itemsize
    ln32 = nb * t * d * 4
    scores = -(-t // 8) * 8 * -(-t // 128) * 128 * 4
    weights = _ql_vmem_bytes(qkv_meta, itemsize) + _ql_vmem_bytes(proj_meta, itemsize)
    return 2 * 2 * xio + xio + qkv_val + ln32 + weights + 2 * scores


def fits_slab_layer_quant(t: int, d: int, itemsize: int, qkv_ql, proj_ql) -> bool:
    return (
        t <= MAX_SLAB_TOKENS
        and _quant_layer_cost(1, t, d, itemsize, _ql_meta(qkv_ql), _ql_meta(proj_ql))
        < _layer_budget()
    )


def slab_layer_block_quant(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    qkv_ql,
    b_qkv: jnp.ndarray,
    proj_ql,
    b_proj: jnp.ndarray,
    ls1: jnp.ndarray,
    num_heads: int,
    scale: float,
    eps: float,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """x + ls1 * proj(slab_attention(qkv(LN(x)))) with qkv/proj QuantLinear.

    Inference-only (no VJP: quantized weights are not trained; training runs
    the dense path). See module docstring for the dequant-once design."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t, d = x.shape
    qkv_meta, proj_meta = _ql_meta(qkv_ql), _ql_meta(proj_ql)
    if (
        qkv_meta["k"] != d
        or qkv_meta["out"] != 3 * d
        or proj_meta["k"] != d
        or proj_meta["out"] != d
    ):
        raise ValueError(
            f"quant layer kernel shape mismatch: x d={d}, "
            f"qkv {qkv_meta['out']}x{qkv_meta['k']}, "
            f"proj {proj_meta['out']}x{proj_meta['k']}"
        )
    nb = _pick_image_blocks(
        b, lambda nb: _quant_layer_cost(nb, t, d, x.dtype.itemsize, qkv_meta, proj_meta)
    )

    row = lambda v: v.reshape(1, -1).astype(jnp.float32)
    in_specs = [
        pl.BlockSpec((nb, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        *_ql_specs(qkv_meta),
        pl.BlockSpec((1, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        *_ql_specs(proj_meta),
        pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [
        x, row(ln_scale), row(ln_bias),
        *_ql_operands(qkv_ql), row(b_qkv),
        *_ql_operands(proj_ql), row(b_proj), row(ls1),
    ]

    flag_spec, flag_shape = _flag_specs(b // nb)

    def call(safe):
        check = not safe and _sm3_mode() == "rescue" and _aug_active(t)
        return pl.pallas_call(
            functools.partial(
                _quant_layer_kernel, num_heads=num_heads, scale=scale, d=d, nb=nb,
                eps=eps, qkv_meta=qkv_meta, proj_meta=proj_meta,
                safe=safe, check=check,
            ),
            grid=(b // nb,),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((nb, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                flag_spec,
            ),
            out_shape=(jax.ShapeDtypeStruct((b, t, d), x.dtype), flag_shape),
            scratch_shapes=[
                pltpu.VMEM((nb, t, d), x.dtype),  # attention output
                pltpu.VMEM((3 * d, d), x.dtype),  # dequantized qkv weight
                pltpu.VMEM((d, d), x.dtype),  # dequantized proj weight
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                # "arbitrary": cells run in order, so the cell-0 dequant is
                # guaranteed to precede every use of the weight scratch
                dimension_semantics=("arbitrary",),
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * t * t * d + 2 * b * t * d * (3 * d + d),
                bytes_accessed=2 * x.size * x.dtype.itemsize
                + _ql_vmem_bytes(qkv_meta) + _ql_vmem_bytes(proj_meta),
                transcendentals=b * num_heads * t * t,
            ),
        )(*operands)

    return _rescue(call, t)


def quant_layer_reference(
    x, ln_scale, ln_bias, qkv_ql, b_qkv, proj_ql, b_proj, ls1, num_heads, scale, eps
):
    """Unfused-ordering reference: dense half-layer reference on dequantized
    weights (what quant_mode="dequant" computes)."""
    from dinov2_tpu.ops.fused_attention import _slab_layer_reference
    from dinov2_tpu.ops.qmatmul import dequant_weight

    wq = dequant_weight(qkv_ql, x.dtype).T
    wp = dequant_weight(proj_ql, x.dtype).T
    return _slab_layer_reference(
        x, ln_scale, ln_bias, wq, b_qkv, wp, b_proj, ls1, num_heads, scale, eps
    )

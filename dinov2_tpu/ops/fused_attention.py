"""Fused short-sequence attention on the qkv slab (Pallas, TPU).

Motivation (profiled on v5e, scripts/profile_mfu.py): at the flagship bench
shape (ViT-B/14, batch 64, T=257) the XLA vanilla attention core costs ~14 ms of
a ~32 ms forward — it materializes the (B, H, T, T) scores round-trip in HBM,
with the T=257 lane dim padded to 384 (50% wasted bandwidth). The existing
flash kernel (ops/flash_attention.py) is built for LONG sequences: it needs
(B, H, T, hd)-major inputs, costing four HBM transposes per call, and its
(b*h, q_blocks) grid leaves tiny per-cell work at T=257.

This kernel instead consumes the fused-QKV projection output directly — the
(B, T, 3D) "slab", exactly as the qkv matmul writes it (reference layout:
[q; k; v] along features, /root/reference/dinov2.cpp:469-497) — and keeps the
whole per-image sequence in VMEM:

  grid = (B,); block = the full (T, 3D) slab of one image.
  For each head (static Python loop): slice q/k/v from the slab at 64-lane
  offsets, scores = q @ k^T (f32), full-row softmax (no online rescaling — the
  row is entirely resident), out = p @ v, write to the (T, D) output slab.

No transposes, no HBM scores, no masking (blocks cover the arrays exactly, so
all shapes are logical). Numerics match vanilla_attention: f32 scores, the
same scale-after-matmul order, f32 softmax, bf16 PV matmul with f32 accumulate.

Scope: T * 3D * 2B (the double-buffered slab) must fit VMEM — e.g. ViT-g
(D=1536, T=257) is ~2.4 MB/buffer, fine; 518px feature mode (T=1370, ViT-L
D=1024) is ~8.4 MB/buffer, still OK; native-res 12k-token inputs belong to the
flash kernel. use_fused_slab() picks per shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# above this, the full (T, T) f32 scores tile stresses VMEM; use the flash path
MAX_SLAB_TOKENS = 2048
_VMEM_BUDGET = 12 * 1024 * 1024


_LOG2E = 1.4426950408889634


def _aug_min_t() -> int:
    """Sequence length at/above which the SLAB kernels use the MXU-augmented
    softmax core (see _head_softmax_pv); below it the classic VPU row-sum
    core runs. The 1kv flash path always uses the augmented core regardless
    of this gate: its pad-mask bias rides the scores contraction, and the
    classic core has no masking (the gate governs only the slab kernels).

    Measured on v5e (ViT-B b64 img/s at T=257 / per-layer attention ms at
    T=1370): classic 2978 / 2.06; 4-pass (row-max) augmented 2958 / ~1.76;
    3-pass CLS-shift augmented 3105 / 1.72. With the flag+rescue safety
    (round 4) the 3-pass core is safe at every shape, so the default is 0 =
    always augmented. Read at trace time; DINOV2_TPU_AUG_MIN_T overrides
    (e.g. 512 restores the round-3 gate for A/Bs)."""
    import os

    return int(os.environ.get("DINOV2_TPU_AUG_MIN_T", "0"))


def _is_pow2(x: float) -> bool:
    from math import frexp

    m, _ = frexp(x)
    return x > 0 and m == 0.5


def _pv_f32() -> bool:
    """A/B knob: keep the probability tile in f32 through the PV GEMM
    (saves the (t, t) astype VPU pass; costs MXU passes). Default off."""
    import os

    return os.environ.get("DINOV2_TPU_PV_F32", "0") == "1"


def _finite_div(num, l) -> jnp.ndarray:
    """num / l with rows forced to NaN when the normalizer l is non-finite.

    Closes the silent-zero band of the CLS-shift core (round-4 self-review):
    every exp2 term of a row can be individually finite (< 2^128) while their
    SUM overflows to inf inside the PV GEMM accumulation — then
    finite_lane / inf == 0 is finite, the kernel's isfinite flag would NOT
    trip, and the row would return silently all-zero. Poisoning the row with
    NaN preserves the safety invariant the rescue relies on: EVERY overflow
    lands non-finite in the kernel output (see the SAFETY note below).
    Cost: one (t, 1) isfinite + one (t, hd) select — negligible next to the
    (t, t) tile passes; applied only on the unsafe CLS-shift path."""
    return jnp.where(jnp.isfinite(l), num / l, jnp.float32(jnp.nan))


def _head_softmax_pv(q, k, v, scale, bias_col=None, safe=False) -> jnp.ndarray:
    """One head's attention core, shared by every slab kernel and the
    single-KV flash path: (t, hd) q/k/v -> (t, hd) f32
    softmax(q·kᵀ·scale [+ bias])·v.

    The attention core is VPU-bound at hd=64 (round-3 sweep: ~10 elementwise
    passes over the (t, t) tile vs 2.6 ps/element of MXU work), so everything
    that CAN ride the idle MXU does (round 3):
      - the optional pad-mask `bias_col` ((t_k, 1), -BIG at padded keys) is an
        extra CONTRACTION column — q gains a ones-column, k gains the bias
        column — so masking costs zero VPU passes;
      - the softmax normalizer l is a ones-column in v: the PV matmul emits
        [p·v | l] in one pass, deleting the VPU row-sum over the (t, t) tile;
      - both augmentations pad the contraction to the full 128 MXU lanes
        (zeros contribute exactly 0), lifting the hd=64 GEMMs from 50% to
        full lane utilization.
    Remaining (t, t) VPU passes: sub, exp2, astype — 3 (the CLS-column shift
    replaces the row-max reduce; see the SAFETY note below). Power-of-two
    scales (head_dim 64 -> 1/8 for every DINOv2 size) fold EXACTLY into bf16
    q (pure exponent shift); exp2 is the TPU-native transcendental.

    With the 3-pass core the augmented branch wins at EVERY measured shape
    (ViT-B b64 T=257: 3105 vs 2978 classic), so _aug_min_t defaults to 0;
    DINOV2_TPU_AUG_MIN_T=512 restores the round-3 classic-below-512 gate."""
    t, hd = q.shape
    tk = k.shape[0]
    if _is_pow2(scale):
        q = q * jnp.asarray(scale, q.dtype)
        post_scale = None
    else:
        post_scale = scale
    if tk < _aug_min_t() and bias_col is None:
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if post_scale is not None:
            s = s * post_scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2((s - m) * _LOG2E)
        l = jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return pv / l
    # Augmented branch, 3 full-tile VPU passes (sub, exp2, astype):
    # log2(e) folds into q alongside any residual scale (one (t, hd) pass,
    # 22x smaller than the tile, replacing the full-tile *LOG2E multiply; in
    # bf16 this rounds the combined scale to 8 bits — a <=2^-9 uniform
    # logit-temperature perturbation, inside the existing bf16 storage
    # noise; exact in f32).
    #
    # The per-row shift is the CLS-COLUMN score s[:, 0] instead of the row
    # max (softmax is shift-invariant, so ANY finite per-row shift is exact
    # in f32 — and key 0 is never a padded column: it is CLS in both the
    # slab kernels and the 1kv flash block). That deletes the full-tile
    # max-reduce — measured on v5e ViT-B b64: 3105 img/s (this 3-pass core)
    # vs 2978 classic / 2958 with the max-reduce. The shift is the (t, 1)
    # lane-0 slice of the scores tile (the same register pattern as a
    # keepdims reduce result; a bf16 matmul against k_aug's CLS row fails
    # Mosaic verification — bf16->f32 vector.broadcast on the 1-row
    # operand).
    #
    # SAFETY (VERDICT r3 item 1): when a row's logit spread vs CLS exceeds
    # 128 log2 units (untrained/rogue checkpoints — the synthetic std-0.5
    # fixtures hit ±370), exp2(s - s0) overflows to inf and the result goes
    # inf/NaN. The normalizer always contains the CLS term exp2(0)=1, so
    # l >= 1 and 0/0 underflow is impossible. Overflow has TWO modes: a
    # per-cell exp2 overflow (spread >= 128) lands inf/NaN in the output
    # directly, and in the narrow band just below (spread ~ 128 - log2(t))
    # every term is finite but their SUM — the normalizer GEMM column —
    # overflows, where finite_lane / inf would be a silently-WRONG finite 0;
    # _finite_div poisons those rows to NaN, so every overflow lands
    # non-finite in the kernel's output. The
    # rescue is OUTSIDE the kernel: each kernel ANDs an isfinite check over
    # its per-image result into a per-cell flag tile (~1/12 of a tile pass),
    # and the wrapper re-runs the whole pallas_call with safe=True (the
    # row-max shift) under an XLA-level lax.cond only when a flag tripped.
    # An IN-kernel lax.cond fallback was measured at 2540 img/s — Mosaic's
    # cond breaks the per-head MXU/VPU software pipelining — vs 3105 for
    # flag+rescue; DINOV2_TPU_SM3 picks {rescue (default), unsafe, max}.
    c = _LOG2E if post_scale is None else post_scale * _LOG2E
    q = q * jnp.asarray(c, q.dtype)
    aug = -(-(hd + 1) // 128) * 128
    q_aug = jnp.concatenate(
        [q, jnp.ones((t, 1), q.dtype), jnp.zeros((t, aug - hd - 1), q.dtype)],
        axis=1,
    )
    bias_part = (
        bias_col.astype(k.dtype)
        if bias_col is not None
        else jnp.zeros((tk, 1), k.dtype)
    )
    k_aug = jnp.concatenate(
        [k, bias_part, jnp.zeros((tk, aug - hd - 1), k.dtype)], axis=1
    )
    s = jax.lax.dot_general(
        q_aug, k_aug, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # log2-domain scores; masked cols = bias (-BIG)
    v_aug = jnp.concatenate(
        [v, jnp.ones((tk, 1), v.dtype), jnp.zeros((tk, aug - hd - 1), v.dtype)],
        axis=1,
    )
    unsafe_shift = not (safe or _sm3_mode() == "max")
    if unsafe_shift:
        shift = s[:, 0:1]  # (t, 1) CLS-column scores
    else:
        shift = jnp.max(s, axis=-1, keepdims=True)  # exact, can't overflow
    p = jnp.exp2(s - shift)
    # DINOV2_TPU_PV_F32=1: feed the PV GEMM the f32 probabilities directly,
    # deleting the third full-tile VPU pass (the (t, t) f32->bf16 astype) at
    # the cost of an f32-precision matmul (multiple bf16 MXU passes) — a
    # candidate trade on the VPU-bound d=384 shapes where the MXU idles
    # through the attention window. A/B knob; default off until measured.
    if _pv_f32():
        pv = jax.lax.dot_general(
            p, v_aug.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v_aug, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    l = pv[:, hd : hd + 1]
    if unsafe_shift:
        # with the row-max shift p <= 1 so l <= tk and cannot overflow;
        # only the CLS-shift path needs the normalizer-overflow poison
        return _finite_div(pv[:, :hd], l)
    return pv[:, :hd] / l


_SM3_OVERRIDE: str | None = None


def _sm3_mode() -> str:
    """Safety mode of the 3-pass softmax core (read at trace time):
    'rescue' (default — unsafe core + per-cell overflow flag + XLA-level
    safe re-run per kernel call), 'unsafe' (no flag/rescue), 'max' (always
    the exact row-max core, 2958 img/s ViT-B b64).

    The per-call flag check was measured to cost the whole 3-pass win at
    T=257 (2977 vs 3105 img/s — the scalar reduce serializes against the
    per-head pipeline), so the model forward does NOT use it: forward
    _features traces its layers under sm3_override('unsafe'), checks
    isfinite(sum(tokens)) ONCE after the layer scan (overflow provably
    propagates through proj/LN/GELU/residual to the final tokens), and
    lax.cond-reruns the whole stack under sm3_override('max') iff it
    tripped (models/vit.py::forward_features). Direct ops-level callers
    keep the per-call rescue."""
    if _SM3_OVERRIDE is not None:
        return _SM3_OVERRIDE
    import os

    return os.environ.get("DINOV2_TPU_SM3", "rescue")


class sm3_override:
    """Trace-time override of the softmax-core safety mode (see _sm3_mode).
    `None` leaves the ambient mode in place."""

    def __init__(self, mode: str | None):
        self.mode = mode

    def __enter__(self):
        global _SM3_OVERRIDE
        self.prev = _SM3_OVERRIDE
        if self.mode is not None:
            _SM3_OVERRIDE = self.mode

    def __exit__(self, *exc):
        global _SM3_OVERRIDE
        _SM3_OVERRIDE = self.prev


def _check_finite(acc) -> jnp.ndarray:
    """Per-cell overflow predicate as an int32 scalar (for the SMEM flag).

    Mosaic's isfinite (`tpu.weird`) only accepts f32 input; bf16 tiles (e.g.
    the plain slab kernel's output ref) must be upcast first — the cast maps
    bf16 inf/NaN to f32 inf/NaN, so the predicate is unchanged."""
    if acc.dtype != jnp.float32:
        acc = acc.astype(jnp.float32)
    return jnp.all(jnp.isfinite(acc)).astype(jnp.int32)


def _pick_image_blocks(b: int, cost_fn, budget: int | None = None) -> int:
    """Images per grid cell: bigger blocks amortize per-cell DMA setup,
    subject to the kernel's VMEM cost model.

    Candidates up to 16 (round 3: at ViT-S the d=384 cost model admits nb=8;
    measured on v5e — see docs/TPU_NOTES.md). Env overrides for experiments:
    DINOV2_TPU_SLAB_NB caps nb, DINOV2_TPU_SLAB_VMEM replaces the budget."""
    import os

    env_budget = os.environ.get("DINOV2_TPU_SLAB_VMEM")
    if env_budget:
        budget = int(env_budget)
    elif budget is None:
        budget = _LAYER_VMEM_BUDGET
    cap = int(os.environ.get("DINOV2_TPU_SLAB_NB", "16"))
    nb = 1
    for cand in (2, 4, 8, 16):
        if cand <= cap and b % cand == 0 and cost_fn(cand) < budget:
            nb = cand
    return nb


def _attention_heads_sliced(slab, t, d, num_heads, scale, safe, write) -> None:
    """Shared head loop of the slab kernels: `slab(lo, hi)` returns the
    (t, hi-lo) lane-slice of one image's (t, 3d) qkv slab (ref or value);
    each head-range output goes to `write(lo, hi, value)`.

    One core per head, always. A two-heads-per-GEMM pair core for hd=64
    (pack2, VERDICT r3 item 4 / r4 item 3) was built, interpret-verified,
    lane-aligned — and then refused by Mosaic on chip: the block-diagonal
    K assembly hits `Not implemented: result/input offset mismatch on
    non-concat dimension` (tpu.concatenate with vpad offsets; probe
    receipt in docs/TPU_NOTES.md round 5, step 10). Deleted rather than
    shipped dead; see git history (round 4) for the implementation."""
    hd = d // num_heads
    for h in range(num_heads):
        q = slab(h * hd, (h + 1) * hd)
        k = slab(d + h * hd, d + (h + 1) * hd)
        v = slab(2 * d + h * hd, 2 * d + (h + 1) * hd)
        write(h * hd, (h + 1) * hd, _head_softmax_pv(q, k, v, scale, safe=safe))


def _attention_heads(qkv_ref, b, d, num_heads, scale, safe, write) -> None:
    _attention_heads_sliced(
        lambda lo, hi: qkv_ref[b, :, lo:hi], qkv_ref.shape[1], d, num_heads,
        scale, safe, write,
    )


def _slab_kernel(qkv_ref, o_ref, ok_ref, *, num_heads, scale, d, nb, safe, check):
    ok = jnp.int32(1)
    for b in range(nb):
        def write(lo, hi, val, b=b):
            o_ref[b, :, lo:hi] = val.astype(o_ref.dtype)

        _attention_heads(qkv_ref, b, d, num_heads, scale, safe, write)
        if check:
            ok = ok & _check_finite(o_ref[b])
    _write_flag(ok_ref, ok)


def _block_cost(nb: int, t: int, d: int, itemsize: int = 2) -> int:
    slab = nb * t * 3 * d * itemsize
    out = nb * t * d * itemsize
    scores = -(-t // 8) * 8 * -(-t // 128) * 128 * 4  # physical f32 tile
    return 2 * (slab + out) + 2 * scores


def fits_slab(t: int, d: int, itemsize: int = 2) -> bool:
    """Whether the per-image slab (double-buffered in+out) + one f32 scores tile
    fits the VMEM budget."""
    return t <= MAX_SLAB_TOKENS and _block_cost(1, t, d, itemsize) < _VMEM_BUDGET


def _pick_nb(b: int, t: int, d: int, itemsize: int = 2) -> int:
    """Images per grid cell: bigger blocks amortize per-cell DMA setup (measured
    on v5e: nb=4 beats nb=1 by ~8% at the ViT-B bench shape) subject to VMEM."""
    return _pick_image_blocks(
        b, lambda nb: _block_cost(nb, t, d, itemsize), _VMEM_BUDGET
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def slab_attention(
    qkv: jnp.ndarray,
    num_heads: int,
    scale: float,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """(B, T, 3D) fused-qkv slab -> (B, T, D) attention output slab.

    Differentiable via recompute (same policy as flash_attention: the backward
    re-runs the reference math under jax.vjp; at slab-sized T the (T, T)
    backward intermediates are cheap)."""
    return _slab_forward(qkv, num_heads, scale, interpret)


def _aug_active(t: int, has_bias: bool = False) -> bool:
    """Trace-time: does this shape run the augmented (CLS-shift) core?"""
    return has_bias or t >= _aug_min_t()


def _rescue(call, t: int, has_bias: bool = False):
    """Flag-based overflow rescue around a slab pallas_call (see the SAFETY
    note in _head_softmax_pv): `call(safe)` -> (out, flags). Runs the fast
    CLS-shift kernel; iff any per-cell flag tripped (rogue logits overflowed
    exp2), re-runs the whole call with the exact row-max core under an
    XLA-level lax.cond — one branch executes at runtime, so trained
    checkpoints pay only the in-kernel isfinite AND (~1/12 tile pass)."""
    mode = _sm3_mode()
    if mode == "max" or not _aug_active(t, has_bias):
        return call(True)[0] if mode == "max" else call(False)[0]
    out, flags = call(False)
    if mode == "unsafe":
        return out
    return jax.lax.cond(
        jnp.min(flags) == 1, lambda: out, lambda: call(True)[0]
    )


def _flag_specs(grid: int):
    """(out_spec, out_shape) for the per-cell overflow flag.

    One (8, 128) int32 VMEM tile per grid cell — the minimum legal block
    (Mosaic's divisibility rule applies to outputs in every memory space; a
    (1, 1) SMEM block of a (G, 1) array is rejected, and a single shared
    SMEM scalar would be a cross-cell write race under 'parallel'
    semantics). 4 KB/cell of writeback is noise next to the slabs."""
    spec = pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return spec, jax.ShapeDtypeStruct((grid * 8, 128), jnp.int32)


def _write_flag(ok_ref, ok) -> None:
    ok_ref[...] = jnp.broadcast_to(ok, ok_ref.shape).astype(jnp.int32)


def _slab_forward(qkv, num_heads, scale, interpret=None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t, three_d = qkv.shape
    d = three_d // 3
    nb = _pick_nb(b, t, d, qkv.dtype.itemsize)
    flag_spec, flag_shape = _flag_specs(b // nb)

    def call(safe):
        check = not safe and _sm3_mode() == "rescue" and _aug_active(t)
        return pl.pallas_call(
            functools.partial(
                _slab_kernel, num_heads=num_heads, scale=scale, d=d, nb=nb,
                safe=safe, check=check,
            ),
            grid=(b // nb,),
            in_specs=[
                pl.BlockSpec(
                    (nb, t, three_d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                )
            ],
            out_specs=(
                pl.BlockSpec((nb, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                flag_spec,
            ),
            out_shape=(jax.ShapeDtypeStruct((b, t, d), qkv.dtype), flag_shape),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * t * t * d,
                bytes_accessed=qkv.size * qkv.dtype.itemsize * 4 // 3,
                transcendentals=b * num_heads * t * t,
            ),
        )(qkv)

    return _rescue(call, t)


def _slab_reference(qkv, num_heads, scale):
    """Unfused reference math (for the VJP recompute and interpret checks)."""
    from dinov2_tpu.ops.attention import split_heads, vanilla_attention

    b, t, three_d = qkv.shape
    q, k, v = split_heads(qkv, num_heads)
    return vanilla_attention(q, k, v, scale).reshape(b, t, three_d // 3)


# ---------------------------------------------------------------------------
# Slab attention + output projection + LayerScale + residual, one kernel
# ---------------------------------------------------------------------------
#
# After the attention core, XLA's path writes the (B, T, D) attention slab to
# HBM, re-reads it for the proj matmul, and writes the projected slab again
# (LayerScale/residual fuse into the proj epilogue). Keeping proj in the same
# kernel removes one slab write + one slab read per layer (~50 MB at the
# ViT-B/14 b64 bench shape) and feeds the MXU straight from VMEM.


def _slab_proj_kernel(
    x_ref, qkv_ref, w_ref, bb_ref, ls_ref, o_ref, ok_ref, a_scr,
    *, num_heads, scale, d, nb, safe, check,
):
    ok = jnp.int32(1)
    for b in range(nb):
        def write(lo, hi, val, b=b):
            a_scr[b, :, lo:hi] = val.astype(a_scr.dtype)

        _attention_heads(qkv_ref, b, d, num_heads, scale, safe, write)
        # proj + bias + LayerScale + residual, numerics-ordered exactly like the
        # XLA path (ops/qmatmul.py::apply_linear + models/vit.py): f32 matmul
        # accumulate -> cast to compute dtype -> +bias -> *ls -> +residual
        acc = jax.lax.dot_general(
            a_scr[b], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if check:  # attention inf/NaN propagates through the proj matmul
            ok = ok & _check_finite(acc)
        y = acc.astype(o_ref.dtype) + bb_ref[:].astype(o_ref.dtype)
        o_ref[b] = x_ref[b] + y * ls_ref[:].astype(o_ref.dtype)
    _write_flag(ok_ref, ok)


def _proj_block_cost(nb: int, t: int, d: int, itemsize: int = 2) -> int:
    slab = nb * t * 3 * d * itemsize
    xio = nb * t * d * itemsize  # residual in, output out, attention scratch
    scores = -(-t // 8) * 8 * -(-t // 128) * 128 * 4
    return 2 * (slab + 2 * xio) + xio + d * d * itemsize + 2 * scores


def fits_slab_proj(t: int, d: int, itemsize: int = 2) -> bool:
    return t <= MAX_SLAB_TOKENS and _proj_block_cost(1, t, d, itemsize) < _VMEM_BUDGET


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def slab_attention_block(
    x: jnp.ndarray,
    qkv: jnp.ndarray,
    w_proj: jnp.ndarray,
    b_proj: jnp.ndarray,
    ls1: jnp.ndarray,
    num_heads: int,
    scale: float,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """x + LayerScale * (slab_attention(qkv) @ w_proj + b_proj), one kernel.

    x: (B, T, D) residual stream; qkv: (B, T, 3D) fused-qkv slab;
    w_proj: (D, D) stored (in, out) like every dense kernel; b_proj/ls1: (D,).
    Differentiable via recompute, like slab_attention."""
    return _slab_block_forward(x, qkv, w_proj, b_proj, ls1, num_heads, scale, interpret)


def _slab_block_forward(x, qkv, w_proj, b_proj, ls1, num_heads, scale, interpret=None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t, three_d = qkv.shape
    d = three_d // 3
    nb = _pick_image_blocks(
        b, lambda nb: _proj_block_cost(nb, t, d, qkv.dtype.itemsize), _VMEM_BUDGET
    )

    flag_spec, flag_shape = _flag_specs(b // nb)

    def call(safe):
        check = not safe and _sm3_mode() == "rescue" and _aug_active(t)
        return pl.pallas_call(
            functools.partial(
                _slab_proj_kernel, num_heads=num_heads, scale=scale, d=d, nb=nb,
                safe=safe, check=check,
            ),
            grid=(b // nb,),
            in_specs=[
                pl.BlockSpec((nb, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((nb, t, three_d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((nb, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                flag_spec,
            ),
            out_shape=(jax.ShapeDtypeStruct((b, t, d), x.dtype), flag_shape),
            scratch_shapes=[pltpu.VMEM((nb, t, d), qkv.dtype)],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * t * t * d + 2 * b * t * d * d,
                bytes_accessed=(qkv.size + 2 * x.size) * qkv.dtype.itemsize + d * d * 2,
                transcendentals=b * num_heads * t * t,
            ),
        )(x, qkv, w_proj.astype(qkv.dtype), b_proj.reshape(1, d), ls1.reshape(1, d))

    return _rescue(call, t)


# ---------------------------------------------------------------------------
# Whole attention half-layer in one kernel: LN1 + QKV matmul + slab attention
# + proj + bias + LayerScale + residual.
# ---------------------------------------------------------------------------
#
# Beyond slab_attention_block, this also pulls the pre-LN and the fused-QKV
# projection into the kernel: the (B, T, 3D) qkv slab never exists in HBM
# (~78 MB written + read per ViT-B b64 layer) and the LN output round-trip
# disappears too. The (D, 3D) and (D, D) weight tiles use constant index
# maps, so Mosaic's pipeliner fetches them once per pallas_call, not per grid
# cell. Numerics keep the exact unfused ordering: f32 LN stats, f32 matmul
# accumulate -> compute-dtype cast -> bias -> attention -> proj -> bias ->
# LayerScale -> residual.


def _slab_layer_kernel(
    x_ref, lns_ref, lnb_ref, wq_ref, bq_ref, wp_ref, bp_ref, ls_ref,
    o_ref, ok_ref, a_scr, *, num_heads, scale, d, nb, eps, safe, check,
):
    hd = d // num_heads
    ok = jnp.int32(1)
    for b in range(nb):
        xb = x_ref[b]  # (t, d)
        x32 = xb.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
        h32 = (x32 - mu) * jax.lax.rsqrt(var + eps)
        h = (h32 * lns_ref[:] + lnb_ref[:]).astype(xb.dtype)
        acc = jax.lax.dot_general(
            h, wq_ref[:], (((1,), (0,)), ((), ())),
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
            a_scr[b], wp_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if check:  # attention inf/NaN propagates through the proj matmul
            ok = ok & _check_finite(acc)
        y = acc.astype(o_ref.dtype) + bp_ref[:].astype(o_ref.dtype)
        o_ref[b] = xb + y * ls_ref[:].astype(o_ref.dtype)
    _write_flag(ok_ref, ok)


def _layer_block_cost(nb: int, t: int, d: int, itemsize: int = 2) -> int:
    xio = nb * t * d * itemsize
    qkv_val = nb * t * 3 * d * itemsize
    ln32 = nb * t * d * 4
    scores = -(-t // 8) * 8 * -(-t // 128) * 128 * 4
    weights = 3 * d * d * itemsize + d * d * itemsize
    return 2 * 2 * xio + xio + qkv_val + ln32 + weights + 2 * scores


# The half-layer kernel gets a higher budget than the general 12 MB: its cost
# model is tighter (weights counted once — constant index maps aren't double
# -buffered) and nb=2 at ViT-B (13.4 MB modeled) compiles on v5e and measures
# ~7% faster than nb=1 (per-cell DMA amortization).
_LAYER_VMEM_BUDGET = 14 * 1024 * 1024


def _layer_budget() -> int:
    """Half-layer kernel VMEM budget; DINOV2_TPU_SLAB_VMEM overrides (the
    same env _pick_image_blocks honors), so budget experiments flip BOTH the
    fits gates and the nb choice consistently."""
    import os

    env = os.environ.get("DINOV2_TPU_SLAB_VMEM")
    return int(env) if env else _LAYER_VMEM_BUDGET


def fits_slab_layer(t: int, d: int, itemsize: int = 2) -> bool:
    return (
        t <= MAX_SLAB_TOKENS
        and _layer_block_cost(1, t, d, itemsize) < _layer_budget()
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def slab_layer_block(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w_qkv: jnp.ndarray,
    b_qkv: jnp.ndarray,
    w_proj: jnp.ndarray,
    b_proj: jnp.ndarray,
    ls1: jnp.ndarray,
    num_heads: int,
    scale: float,
    eps: float,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """x + ls1 * proj(slab_attention(qkv(LN(x)))), one Pallas kernel.

    x: (B, T, D); w_qkv: (D, 3D) and w_proj: (D, D) stored (in, out);
    ln_scale/ln_bias/b_proj/ls1: (D,), b_qkv: (3D,). Differentiable via
    recompute through the unfused reference ordering."""
    return _slab_layer_forward(
        x, ln_scale, ln_bias, w_qkv, b_qkv, w_proj, b_proj, ls1,
        num_heads, scale, eps, interpret,
    )


def _slab_layer_forward(
    x, ln_scale, ln_bias, w_qkv, b_qkv, w_proj, b_proj, ls1,
    num_heads, scale, eps, interpret=None,
):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t, d = x.shape
    nb = _pick_image_blocks(
        b, lambda nb: _layer_block_cost(nb, t, d, x.dtype.itemsize)
    )

    row = lambda v: v.reshape(1, -1).astype(jnp.float32)
    flag_spec, flag_shape = _flag_specs(b // nb)

    def call(safe):
        check = not safe and _sm3_mode() == "rescue" and _aug_active(t)
        return pl.pallas_call(
            functools.partial(
                _slab_layer_kernel, num_heads=num_heads, scale=scale, d=d, nb=nb,
                eps=eps, safe=safe, check=check,
            ),
            grid=(b // nb,),
            in_specs=[
                pl.BlockSpec((nb, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((nb, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                flag_spec,
            ),
            out_shape=(jax.ShapeDtypeStruct((b, t, d), x.dtype), flag_shape),
            scratch_shapes=[pltpu.VMEM((nb, t, d), x.dtype)],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * t * t * d + 2 * b * t * d * (3 * d + d),
                bytes_accessed=2 * x.size * x.dtype.itemsize + 4 * d * d * 2,
                transcendentals=b * num_heads * t * t,
            ),
        )(
            x, row(ln_scale), row(ln_bias), w_qkv.astype(x.dtype),
            row(b_qkv), w_proj.astype(x.dtype), row(b_proj), row(ls1),
        )

    return _rescue(call, t)


def _slab_layer_reference(
    x, ln_scale, ln_bias, w_qkv, b_qkv, w_proj, b_proj, ls1, num_heads, scale, eps
):
    """Unfused ordering: vit.layer_norm + apply_linear + slab reference."""
    x32 = x.astype(jnp.float32)
    mu = x32.mean(axis=-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(axis=-1, keepdims=True)
    h = ((x32 - mu) * jax.lax.rsqrt(var + eps) * ln_scale + ln_bias).astype(x.dtype)
    # f32 accumulate then cast, matching the kernel's ordering on ALL backends
    # (on CPU-interpret a compute-dtype preferred_element_type would accumulate
    # in bf16, diverging the recompute-VJP from the kernel forward)
    qkv = jnp.dot(h, w_qkv.astype(h.dtype), preferred_element_type=jnp.float32)
    qkv = qkv.astype(h.dtype) + b_qkv.astype(h.dtype)
    return _slab_block_reference(x, qkv, w_proj, b_proj, ls1, num_heads, scale)


def _slab_layer_fwd(
    x, ln_scale, ln_bias, w_qkv, b_qkv, w_proj, b_proj, ls1,
    num_heads, scale, eps, interpret,
):
    out = _slab_layer_forward(
        x, ln_scale, ln_bias, w_qkv, b_qkv, w_proj, b_proj, ls1,
        num_heads, scale, eps, interpret,
    )
    return out, (x, ln_scale, ln_bias, w_qkv, b_qkv, w_proj, b_proj, ls1)


def _slab_layer_bwd(num_heads, scale, eps, interpret, residuals, g):
    _, vjp = jax.vjp(
        lambda *a: _slab_layer_reference(*a, num_heads, scale, eps), *residuals
    )
    return vjp(g)


slab_layer_block.defvjp(_slab_layer_fwd, _slab_layer_bwd)


# ---------------------------------------------------------------------------
# MLP half-layer in one kernel: LN2 + fc1 + GELU + fc2 + LayerScale + residual
# ---------------------------------------------------------------------------
#
# The (B, T, 4D) fc1 output is the single largest activation in the encoder
# (~100 MB written + read per ViT-B b64 layer). The kernel streams it in
# D-wide chunks of the hidden axis that never leave VMEM: for each chunk c,
# h_c = GELU(LN(x) @ W1[:, c]) and the fc2 accumulator gains h_c @ W2[c, :]
# — f32 accumulation, so the chunked contraction matches the monolithic
# matmul to reassociation noise. Weight tiles ride constant index maps
# (fetched once per pallas_call).


def _norm_mlp_activation(activation) -> str:
    """Accept the legacy bool (True=tanh approx) or an activation name
    ("gelu_tanh" | "gelu_erf" | "gelu_tanh_f16" — the ggml fp16-LUT parity
    variant, ops/qmatmul.py::gelu_tanh_f16)."""
    if activation is True:
        return "gelu_tanh"
    if activation is False:
        return "gelu_erf"
    return activation


def _mlp_act(y: jnp.ndarray, activation: str) -> jnp.ndarray:
    from dinov2_tpu.ops.qmatmul import apply_activation

    return apply_activation(y, activation)


def _slab_mlp_kernel(
    x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref, ls_ref,
    o_ref, *, d, dh, nb, eps, approximate_gelu,
):
    n_chunks = dh // d
    for b in range(nb):
        xb = x_ref[b]
        x32 = xb.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
        h32 = (x32 - mu) * jax.lax.rsqrt(var + eps)
        h = (h32 * lns_ref[:] + lnb_ref[:]).astype(xb.dtype)
        acc = jnp.zeros((xb.shape[0], d), jnp.float32)
        for c in range(n_chunks):
            a1 = jax.lax.dot_general(
                h, w1_ref[:, c * d : (c + 1) * d], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            g = a1.astype(xb.dtype) + b1_ref[:, c * d : (c + 1) * d].astype(xb.dtype)
            g = _mlp_act(g, approximate_gelu)
            acc = acc + jax.lax.dot_general(
                g, w2_ref[c * d : (c + 1) * d, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        y = acc.astype(o_ref.dtype) + b2_ref[:].astype(o_ref.dtype)
        o_ref[b] = xb + y * ls_ref[:].astype(o_ref.dtype)


def _mlp_block_cost(nb: int, t: int, d: int, dh: int, itemsize: int = 2) -> int:
    xio = nb * t * d * itemsize
    weights = 2 * d * dh * itemsize
    ln32 = nb * t * d * 4
    chunk = t * d * (4 + itemsize)  # f32 fc1 chunk acc + bf16 gelu chunk
    acc = t * d * 4
    return 2 * 2 * xio + weights + ln32 + chunk + acc


# --- flat (row-major) MLP half-layer -----------------------------------------
#
# The MLP half-layer is ROW-INDEPENDENT (LN, fc1, GELU, fc2, LayerScale,
# residual all act per token), so the kernel does not need the (B, T, D) image
# structure at all: flattening to (B*T, D) lets the grid cut the token axis at
# sublane-aligned offsets and run fc1 as one (rc, D)x(D, DH) GEMM with the
# full DH=4D output width — vs the per-image variant's m=257 GEMMs chunked to
# D-wide tiles (measured a tie vs XLA at ViT-S b64; the flat variant is what
# actually cashes the (T, 4D) HBM round-trip saving — docs/TPU_NOTES.md r4).


def _slab_mlp_flat_kernel(
    x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref, ls_ref,
    o_ref, *, d, dh, eps, approximate_gelu, row_chunk,
):
    rows = x_ref.shape[0]
    for r0 in range(0, rows, row_chunk):
        r1 = min(r0 + row_chunk, rows)
        xb = x_ref[r0:r1]
        x32 = xb.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
        h32 = (x32 - mu) * jax.lax.rsqrt(var + eps)
        h = (h32 * lns_ref[:] + lnb_ref[:]).astype(xb.dtype)
        a1 = jax.lax.dot_general(
            h, w1_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        g = a1.astype(xb.dtype) + b1_ref[:].astype(xb.dtype)
        g = _mlp_act(g, approximate_gelu)
        acc = jax.lax.dot_general(
            g, w2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = acc.astype(o_ref.dtype) + b2_ref[:].astype(o_ref.dtype)
        o_ref[r0:r1] = xb + y * ls_ref[:].astype(o_ref.dtype)


_MLP_ROW_CHUNK = 256  # fc1/fc2 GEMM m per in-kernel step (sublane-aligned)


def _mlp_flat_cost(m: int, d: int, dh: int, itemsize: int = 2) -> int:
    io = m * d * itemsize
    weights = 2 * d * dh * itemsize
    rc = min(m, _MLP_ROW_CHUNK)
    inter = rc * (10 * d + 6 * dh)  # f32 LN + h + f32 a1 + g + f32 acc
    return 2 * 2 * io + weights + inter


def _pick_flat_rows(total: int, d: int, dh: int, itemsize: int = 2) -> int | None:
    """Largest sublane-aligned divisor of the flattened token count whose
    block fits the VMEM budget (None: shape can't run the flat kernel)."""
    best = None
    i = 1
    while i * i <= total:
        if total % i == 0:
            for m in (i, total // i):
                if m % 8 == 0 and _mlp_flat_cost(m, d, dh, itemsize) < _layer_budget():
                    if best is None or m > best:
                        best = m
        i += 1
    return best


def fits_slab_mlp(t: int, d: int, dh: int, itemsize: int = 2) -> bool:
    return (
        t <= MAX_SLAB_TOKENS
        and dh % d == 0
        and _mlp_block_cost(1, t, d, dh, itemsize) < _layer_budget()
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def slab_mlp_block(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    ls2: jnp.ndarray,
    approximate_gelu: bool,
    eps: float,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """x + ls2 * fc2(GELU(fc1(LN(x)))), one Pallas kernel; the (T, 4D) fc1
    activation never exists in HBM. w1: (D, DH), w2: (DH, D) stored (in, out);
    requires DH % D == 0 (true for every DINOv2 MLP: DH = 4D)."""
    return _slab_mlp_forward(
        x, ln_scale, ln_bias, w1, b1, w2, b2, ls2, approximate_gelu, eps,
        interpret,
    )


def _slab_mlp_forward(
    x, ln_scale, ln_bias, w1, b1, w2, b2, ls2, approximate_gelu, eps,
    interpret=None,
):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    approximate_gelu = _norm_mlp_activation(approximate_gelu)
    if approximate_gelu == "gelu_tanh_f16" and not interpret:
        approximate_gelu = "gelu_tanh_f16_veltkamp"  # Mosaic has no f16 casts
    b, t, d = x.shape
    dh = w1.shape[1]
    if dh % d:
        raise ValueError(
            f"slab_mlp_block needs hidden dim {dh} divisible by {d} "
            "(the hidden axis streams through VMEM in D-wide chunks)"
        )

    import os

    flat_mode = os.environ.get("DINOV2_TPU_MLP_FLAT", "auto")
    m = None
    if flat_mode != "off":
        m = _pick_flat_rows(b * t, d, dh, x.dtype.itemsize)
    if m is not None:
        return _slab_mlp_flat(
            x, ln_scale, ln_bias, w1, b1, w2, b2, ls2, approximate_gelu, eps,
            interpret, m,
        )

    nb = _pick_image_blocks(
        b, lambda nb: _mlp_block_cost(nb, t, d, dh, x.dtype.itemsize)
    )

    row = lambda v: v.reshape(1, -1).astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(
            _slab_mlp_kernel, d=d, dh=dh, nb=nb, eps=eps,
            approximate_gelu=approximate_gelu,
        ),
        grid=(b // nb,),
        in_specs=[
            pl.BlockSpec((nb, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, dh), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dh, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (nb, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * t * d * dh,
            bytes_accessed=2 * x.size * x.dtype.itemsize + 2 * d * dh * 2,
            transcendentals=b * t * dh,
        ),
    )(
        x, row(ln_scale), row(ln_bias), w1.astype(x.dtype), row(b1),
        w2.astype(x.dtype), row(b2), row(ls2),
    )


def _slab_mlp_flat(
    x, ln_scale, ln_bias, w1, b1, w2, b2, ls2, approximate_gelu, eps,
    interpret, m,
):
    b, t, d = x.shape
    dh = w1.shape[1]
    rows = b * t
    row = lambda v: v.reshape(1, -1).astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(
            _slab_mlp_flat_kernel, d=d, dh=dh, eps=eps,
            approximate_gelu=approximate_gelu,
            row_chunk=min(m, _MLP_ROW_CHUNK),
        ),
        grid=(rows // m,),
        in_specs=[
            pl.BlockSpec((m, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, dh), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dh, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * rows * d * dh,
            bytes_accessed=2 * x.size * x.dtype.itemsize + 2 * d * dh * 2,
            transcendentals=rows * dh,
        ),
    )(
        x.reshape(rows, d), row(ln_scale), row(ln_bias), w1.astype(x.dtype),
        row(b1), w2.astype(x.dtype), row(b2), row(ls2),
    )
    return out.reshape(b, t, d)


def _slab_mlp_reference(
    x, ln_scale, ln_bias, w1, b1, w2, b2, ls2, approximate_gelu, eps
):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(axis=-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(axis=-1, keepdims=True)
    h = ((x32 - mu) * jax.lax.rsqrt(var + eps) * ln_scale + ln_bias).astype(x.dtype)
    # f32 accumulate then cast (kernel-ordering match on non-TPU backends too)
    a1 = jnp.dot(h, w1.astype(h.dtype), preferred_element_type=jnp.float32)
    g = _mlp_act(
        a1.astype(h.dtype) + b1.astype(h.dtype),
        _norm_mlp_activation(approximate_gelu),
    )
    y = jnp.dot(g, w2.astype(h.dtype), preferred_element_type=jnp.float32)
    y = y.astype(x.dtype) + b2.astype(x.dtype)
    return x + y * ls2.astype(x.dtype)


def _slab_mlp_fwd(x, lns, lnb, w1, b1, w2, b2, ls2, approximate_gelu, eps, interpret):
    out = _slab_mlp_forward(
        x, lns, lnb, w1, b1, w2, b2, ls2, approximate_gelu, eps, interpret
    )
    return out, (x, lns, lnb, w1, b1, w2, b2, ls2)


def _slab_mlp_bwd(approximate_gelu, eps, interpret, residuals, g):
    _, vjp = jax.vjp(
        lambda *a: _slab_mlp_reference(*a, approximate_gelu, eps), *residuals
    )
    return vjp(g)


slab_mlp_block.defvjp(_slab_mlp_fwd, _slab_mlp_bwd)


def _slab_block_reference(x, qkv, w_proj, b_proj, ls1, num_heads, scale):
    """Unfused reference math: matches apply_linear + encoder_layer ordering."""
    out = _slab_reference(qkv, num_heads, scale)
    y = jnp.dot(out, w_proj.astype(out.dtype), preferred_element_type=jnp.float32)
    y = y.astype(x.dtype) + b_proj.astype(x.dtype)
    return x + y * ls1.astype(x.dtype)


def _slab_block_fwd(x, qkv, w_proj, b_proj, ls1, num_heads, scale, interpret):
    out = _slab_block_forward(x, qkv, w_proj, b_proj, ls1, num_heads, scale, interpret)
    return out, (x, qkv, w_proj, b_proj, ls1)


def _slab_block_bwd(num_heads, scale, interpret, residuals, g):
    x, qkv, w_proj, b_proj, ls1 = residuals
    _, vjp = jax.vjp(
        lambda x_, s_, w_, b_, l_: _slab_block_reference(
            x_, s_, w_, b_, l_, num_heads, scale
        ),
        x, qkv, w_proj, b_proj, ls1,
    )
    return vjp(g)


slab_attention_block.defvjp(_slab_block_fwd, _slab_block_bwd)


def _slab_fwd(qkv, num_heads, scale, interpret):
    return _slab_forward(qkv, num_heads, scale, interpret), (qkv,)


# Backward-path routing (VERDICT r2 item 10): below this token count the
# recompute-vanilla VJP is used (its (T, T) HBM intermediates are cheap and
# its grads are bit-comparable to the reference math); at or above it the
# recompute goes through flash_attention, whose custom VJP runs the dedicated
# FA-2 Pallas backward kernels (ops/flash_attention.py) — no (B, H, T, T)
# scores in HBM. Crossover measured on v5e (docs/TPU_NOTES.md round 3);
# override with DINOV2_TPU_SLAB_BWD=vanilla|flash for experiments.
_SLAB_BWD_FLASH_MIN_T = 512


def _slab_bwd_fn(num_heads: int, scale: float, t: int, interpret):
    import os

    mode = os.environ.get("DINOV2_TPU_SLAB_BWD")
    use_flash = (
        mode == "flash"
        if mode in ("flash", "vanilla")
        else (
            t >= _SLAB_BWD_FLASH_MIN_T
            and not interpret
            and jax.default_backend() == "tpu"
        )
    )
    if not use_flash:
        return lambda s: _slab_reference(s, num_heads, scale)
    from dinov2_tpu.ops.flash_attention import flash_attention

    def f(s):
        from dinov2_tpu.ops.attention import split_heads

        b, tt, three_d = s.shape
        q, k, v = split_heads(s, num_heads)
        return flash_attention(q, k, v, scale).reshape(b, tt, three_d // 3)

    return f


def _slab_bwd(num_heads, scale, interpret, residuals, g):
    (qkv,) = residuals
    _, vjp = jax.vjp(_slab_bwd_fn(num_heads, scale, qkv.shape[1], interpret), qkv)
    return vjp(g)


slab_attention.defvjp(_slab_fwd, _slab_bwd)

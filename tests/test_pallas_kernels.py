"""Pallas kernel numerics tests (interpret mode on the CPU backend).

Oracles: the vanilla einsum attention and the XLA dequant-matmul path.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dinov2_tpu.io.gguf import GGMLType
from dinov2_tpu.models.params import QuantLinear
from dinov2_tpu.ops.attention import vanilla_attention
from dinov2_tpu.ops.flash_attention import flash_attention
from dinov2_tpu.ops.pallas_qmatmul import quant_matmul_pallas
from dinov2_tpu.ops.qmatmul import dequant_weight
from dinov2_tpu.quant.blocks import quantize, unpack_codes


@pytest.mark.parametrize("t,heads", [(257, 2), (100, 3)])
def test_flash_matches_vanilla_f32(t, heads, rng):
    b, hd = 2, 32
    q = jnp.asarray(rng.standard_normal((b, t, heads, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, heads, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, heads, hd)), jnp.float32)
    scale = 1.0 / hd**0.5
    want = np.asarray(vanilla_attention(q, k, v, scale))
    got = np.asarray(flash_attention(q, k, v, scale, block_q=128, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_flash_bf16_close_to_f32(rng):
    b, t, h, hd = 1, 130, 2, 64
    qkv = [rng.standard_normal((b, t, h, hd)).astype(np.float32) for _ in range(3)]
    scale = 1.0 / hd**0.5
    want = np.asarray(
        vanilla_attention(*[jnp.asarray(a) for a in qkv], scale)
    )
    got = np.asarray(
        flash_attention(
            *[jnp.asarray(a, jnp.bfloat16) for a in qkv], scale, interpret=True
        )
    ).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=0.1, atol=0.05)


def test_flash_multi_kv_block_online_softmax(rng, monkeypatch):
    """Force multiple KV blocks so the online-softmax rescaling path runs."""
    import dinov2_tpu.ops.flash_attention as fa

    monkeypatch.setattr(fa, "_VMEM_BUDGET", 300_000)  # tiny budget -> small bq/bk
    b, t, h, hd = 1, 300, 2, 32
    q, k, v = [
        jnp.asarray(rng.standard_normal((b, t, h, hd)), jnp.float32)
        for _ in range(3)
    ]
    scale = 1.0 / hd**0.5
    bq, bk, tp = fa._pick_blocks(t, hd, 512)
    assert tp % bq == 0 and tp % bk == 0
    assert tp // bk >= 2  # really multi-block
    want = np.asarray(vanilla_attention(q, k, v, scale))
    got = np.asarray(fa.flash_attention(q, k, v, scale, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_flash_gradients_match_vanilla(rng):
    """custom_vjp: grads through the flash path equal the vanilla-math grads."""
    import jax

    b, t, h, hd = 1, 130, 2, 32
    q, k, v = [
        jnp.asarray(rng.standard_normal((b, t, h, hd)), jnp.float32)
        for _ in range(3)
    ]
    scale = 1.0 / hd**0.5

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale, 128, True) ** 2)

    def loss_vanilla(q, k, v):
        return jnp.sum(vanilla_attention(q, k, v, scale) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gv = jax.grad(loss_vanilla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gv):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)


def _make_ql(rng, n, k, t):
    w = (rng.standard_normal((n, k)) * 0.5).astype(np.float32)
    raw = quantize(w, t)
    codes, d, m = unpack_codes(raw, t, (n, k))
    return QuantLinear(
        codes=jnp.asarray(codes),
        d=jnp.asarray(d),
        m=jnp.asarray(m) if m is not None else None,
        ggml_type=int(t),
        shape=(n, k),
    )


@pytest.mark.parametrize("t", [GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0,
                               GGMLType.Q5_1, GGMLType.Q8_0])
def test_pallas_qmatmul_matches_dequant(t, rng):
    n, k, m = 160, 128, 24  # n deliberately not a lane multiple (exercises padding)
    ql = _make_ql(rng, n, k, t)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    want = np.asarray(x @ dequant_weight(ql, jnp.float32).T)
    got = np.asarray(quant_matmul_pallas(x, ql, block_m=8, block_n=128, interpret=True))
    # kernel dequantizes in bf16 before the MXU: ~0.4% relative tolerance
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=0.15)


@pytest.mark.parametrize(
    "t", [GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1]
)
def test_pallas_qmatmul_packed_nibbles(t, rng):
    """True 4-bit path: nibbles stay packed; activation K-permutation trick."""
    from dinov2_tpu.io.gguf import GGUFTensor
    from dinov2_tpu.models.params import _soa_from_blocks

    n, k, m = 160, 256, 24
    w = (rng.standard_normal((n, k)) * 0.5).astype(np.float32)
    raw = quantize(w, t)
    ql = _soa_from_blocks(GGUFTensor("w", (n, k), t, raw))
    assert ql.packed and ql.codes.shape == (n, k // 2)

    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    want = np.asarray(x @ dequant_weight(ql, jnp.float32).T)
    got = np.asarray(quant_matmul_pallas(x, ql, block_m=8, block_n=128, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=0.15)
    # and the packed dequant itself matches the block decoder
    from dinov2_tpu.quant.blocks import dequantize

    np.testing.assert_allclose(
        np.asarray(dequant_weight(ql, jnp.float32)),
        dequantize(raw, t, (n, k)),
        rtol=1e-6, atol=1e-6,
    )


def test_pallas_qmatmul_batched_shape(rng):
    ql = _make_ql(rng, 128, 64, GGMLType.Q8_0)
    x = jnp.asarray(rng.standard_normal((2, 5, 64)), jnp.float32)
    got = quant_matmul_pallas(x, ql, interpret=True)
    assert got.shape == (2, 5, 128)
    want = np.asarray(x @ dequant_weight(ql, jnp.float32).T)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-2, atol=0.15)


# ---------------------------------------------------------------------------
# fused slab attention (ops/fused_attention.py)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "b,t,heads,d",
    [(2, 257, 12, 768), (4, 37, 4, 256), (1, 130, 6, 384),
     # t=640 >= the aug gate: exercises the MXU-augmented softmax core
     # (normalizer via the ones-column PV matmul) without a bias column
     (1, 640, 4, 256)],
)
def test_slab_matches_vanilla_f32(b, t, heads, d, rng):
    from dinov2_tpu.ops.fused_attention import _slab_reference, slab_attention

    qkv = jnp.asarray(rng.standard_normal((b, t, 3 * d)), jnp.float32)
    scale = 1.0 / (d // heads) ** 0.5
    want = np.asarray(_slab_reference(qkv, heads, scale))
    got = np.asarray(slab_attention(qkv, heads, scale, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def _narrow_band_qkv(t, heads, d, logit_gap=123.0):
    """qkv whose non-CLS logits sit `logit_gap` log2 units above the CLS
    column: each exp2(s - s0) term is finite (< 2^128) but their sum over the
    keys overflows f32 — the normalizer-overflow band between per-cell
    overflow (gap >= 128) and safety (gap small enough that t terms fit)."""
    hd = d // heads
    scale = 1.0 / hd**0.5
    qk = logit_gap / (scale * np.log2(np.e))
    qkv = np.zeros((1, t, 3 * d), np.float32)
    qkv[:, :, 0::hd][:, :, :heads] = 1.0  # q: unit vector on dim 0, all heads
    qkv[:, 1:, d::hd][:, :, :heads] = qk  # non-CLS keys: dim 0 = qk
    qkv[:, :, 2 * d :] = 1e-3  # v small so the PV lanes stay finite
    return jnp.asarray(qkv), scale


def test_slab_pv_f32_matches(rng, monkeypatch):
    """DINOV2_TPU_PV_F32=1 (PV GEMM consumes the f32 probability tile,
    deleting the astype pass) must be numerically equivalent — strictly more
    precise than the default bf16-cast path."""
    from dinov2_tpu.ops.fused_attention import _slab_reference, slab_attention

    b, t, heads, d = 2, 96, 4, 256
    qkv = jnp.asarray(rng.standard_normal((b, t, 3 * d)), jnp.float32)
    scale = 1.0 / (d // heads) ** 0.5
    want = np.asarray(_slab_reference(qkv, heads, scale))
    monkeypatch.setenv("DINOV2_TPU_PV_F32", "1")
    got = np.asarray(slab_attention(qkv, heads, scale, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_slab_normalizer_overflow_poisoned(rng):
    """Round-4 self-review fix: in the CLS-shift core every exp2 term can be
    finite while their SUM (the softmax normalizer, a GEMM column) overflows
    to inf — finite_lane / inf == 0 is finite, so without _finite_div the
    isfinite flag never trips and the row returns silently all-zero. The
    poison must turn the row NaN inside the kernel so the rescue re-runs
    with the exact row-max shift."""
    from dinov2_tpu.ops.fused_attention import (
        _finite_div, _slab_reference, slab_attention,
    )

    t, heads, d = 640, 2, 128
    qkv, scale = _narrow_band_qkv(t, heads, d)
    want = np.asarray(_slab_reference(qkv, heads, scale))
    assert np.isfinite(want).all() and abs(want).max() > 1e-4
    got = np.asarray(slab_attention(qkv, heads, scale, interpret=True))
    assert np.isfinite(got).all()
    # without the poison the overflowed rows come back all-zero
    assert abs(got).max() > 1e-4
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # the poison itself: finite normalizer passes through, inf turns NaN
    num = jnp.ones((4, 2), jnp.float32)
    l_ok = jnp.full((4, 1), 2.0, jnp.float32)
    l_inf = jnp.full((4, 1), np.inf, jnp.float32)
    np.testing.assert_array_equal(np.asarray(_finite_div(num, l_ok)), 0.5)
    assert np.isnan(np.asarray(_finite_div(num, l_inf))).all()


def test_slab_augmented_overflow_fallback(rng):
    """The 3-pass CLS-shift softmax core (t >= aug gate) overflows exp2 when a
    row's logit spread vs the CLS column exceeds 128 log2 units; the in-kernel
    lax.cond fallback must recover the exact row-max result (the rogue-
    checkpoint safety contract, VERDICT r3 item 1)."""
    from dinov2_tpu.ops.fused_attention import _slab_reference, slab_attention

    b, t, heads, d = 1, 640, 4, 256
    qkv = np.asarray(rng.standard_normal((b, t, 3 * d)), np.float32)
    # Blow up only the CLS KEY: s[:, 0] lands at ~±500 while every other
    # logit stays O(1). Rows where s0 << row-max make exp2(s - s0) overflow
    # (spread >> 128 log2 units) -> the lax.cond fallback must fire; the
    # surviving softmax is well-conditioned, so the comparison stays tight.
    qkv[:, 0, d : 2 * d] *= 500.0 / (d // heads) ** 0.5
    qkv = jnp.asarray(qkv)
    scale = 1.0 / (d // heads) ** 0.5
    want = np.asarray(_slab_reference(qkv, heads, scale))
    got = np.asarray(slab_attention(qkv, heads, scale, interpret=True))
    assert np.isfinite(got).all()
    # |s0| ~ 500 leaves ~1e-4 log2-domain rounding in the shifted scores
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_slab_multi_image_blocks(rng):
    """b=4 exercises the nb>1 grid (images-per-cell DMA amortization)."""
    from dinov2_tpu.ops.fused_attention import _pick_nb, _slab_reference, slab_attention

    b, t, heads, d = 4, 64, 4, 128
    assert _pick_nb(b, t, d, 4) > 1
    qkv = jnp.asarray(rng.standard_normal((b, t, 3 * d)), jnp.float32)
    got = np.asarray(slab_attention(qkv, heads, 0.125, interpret=True))
    want = np.asarray(_slab_reference(qkv, heads, 0.125))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_slab_grad_matches_reference(rng):
    from dinov2_tpu.ops.fused_attention import _slab_reference, slab_attention

    import jax

    qkv = jnp.asarray(rng.standard_normal((1, 37, 3 * 64)), jnp.float32)
    g1 = jax.grad(lambda s: jnp.sum(slab_attention(s, 4, 0.25, True) ** 2))(qkv)
    g2 = jax.grad(lambda s: jnp.sum(_slab_reference(s, 4, 0.25) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


def test_slab_full_model_matches_vanilla(rng):
    """Whole tiny ViT forward with flash_attention='slab' (interpreted kernel)
    equals the vanilla path."""
    import jax

    from dinov2_tpu.models.config import DinoConfig
    from dinov2_tpu.models.params import init_params
    from dinov2_tpu.models.vit import ModelOptions, forward

    config = DinoConfig(hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
                        num_classes=4, patch_size=14, img_size=70)
    params = init_params(config, seed=0, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 70, 70, 3)), jnp.float32)
    o_van = forward(params, x, config,
                    ModelOptions(compute_dtype=jnp.float32, flash_attention=False),
                    classify=True)
    o_slab = forward(params, x, config,
                     ModelOptions(compute_dtype=jnp.float32, flash_attention="slab"),
                     classify=True)
    for k in ("cls_token", "probs"):
        np.testing.assert_allclose(
            np.asarray(o_slab[k]), np.asarray(o_van[k]), rtol=1e-4, atol=1e-5
        )


def test_fits_slab_budget():
    from dinov2_tpu.ops.fused_attention import fits_slab

    assert fits_slab(257, 768)        # ViT-B classify
    assert fits_slab(257, 1536)       # ViT-g classify
    # 518px feature mode (T=1370): the (T, T) f32 scores tile alone is ~7.8 MB,
    # over the VMEM budget -> the online-softmax flash kernel takes over
    assert not fits_slab(1370, 384)
    assert not fits_slab(12000, 1024)  # native-res features -> flash kernel


def test_slab_block_matches_unfused(rng):
    """slab_attention_block (attention + proj + bias + LayerScale + residual in
    one kernel) must match the unfused ordering bit-for-bit in f32."""
    import jax
    from dinov2_tpu.ops.fused_attention import (
        _slab_block_reference,
        slab_attention_block,
    )

    b, t, heads, d = 2, 37, 4, 64
    x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    qkv = jnp.asarray(rng.standard_normal((b, t, 3 * d)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((d, d)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(d), jnp.float32)
    ls = jnp.asarray(rng.uniform(0.1, 1.0, d), jnp.float32)
    scale = 1.0 / (d // heads) ** 0.5

    got = np.asarray(slab_attention_block(x, qkv, w, bias, ls, heads, scale, True))
    want = np.asarray(_slab_block_reference(x, qkv, w, bias, ls, heads, scale))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    # gradient flows through the recompute VJP
    def loss(x, qkv, w):
        return jnp.sum(slab_attention_block(x, qkv, w, bias, ls, heads, scale, True) ** 2)

    gx, gq, gw = jax.grad(loss, argnums=(0, 1, 2))(x, qkv, w)
    for g in (gx, gq, gw):
        assert np.isfinite(np.asarray(g)).all()


def test_flash_backward_kernels_match_autodiff(rng):
    """Dedicated dQ/dKV flash backward kernels (FlashAttention-2 structure)
    must match jax.vjp through the vanilla math; T=157 exercises pad masking."""
    import jax
    from dinov2_tpu.ops.attention import vanilla_attention
    from dinov2_tpu.ops.flash_attention import _flash_backward, _flash_forward

    b, t, h, hd = 2, 157, 3, 64
    q, k, v, g = (
        jnp.asarray(rng.standard_normal((b, t, h, hd)), jnp.float32)
        for _ in range(4)
    )
    scale = 1.0 / hd**0.5
    _, vjp = jax.vjp(lambda q, k, v: vanilla_attention(q, k, v, scale), q, k, v)
    want = vjp(g)
    out, lse = _flash_forward(q, k, v, scale, interpret=True, with_lse=True)
    got = _flash_backward(q, k, v, out, lse, g, scale, interpret=True)
    for a, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(w), atol=2e-6)


def test_slab_layer_block_matches_unfused(rng):
    """Full half-layer kernel (LN + qkv + attention + proj + LayerScale +
    residual) must match the unfused ordering in f32, grads flow."""
    import jax
    from dinov2_tpu.ops.fused_attention import (
        _slab_layer_reference,
        slab_layer_block,
    )

    b, t, heads, d = 2, 37, 4, 64
    x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    lns = jnp.asarray(rng.uniform(0.5, 1.5, d), jnp.float32)
    lnb = jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32)
    wq = jnp.asarray(rng.standard_normal((d, 3 * d)) * 0.05, jnp.float32)
    bq = jnp.asarray(rng.standard_normal(3 * d) * 0.1, jnp.float32)
    wp = jnp.asarray(rng.standard_normal((d, d)) * 0.05, jnp.float32)
    bp = jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32)
    ls = jnp.asarray(rng.uniform(0.1, 1.0, d), jnp.float32)
    scale, eps = 0.25, 1e-6

    got = np.asarray(
        slab_layer_block(x, lns, lnb, wq, bq, wp, bp, ls, heads, scale, eps, True)
    )
    want = np.asarray(
        _slab_layer_reference(x, lns, lnb, wq, bq, wp, bp, ls, heads, scale, eps)
    )
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)

    def loss(x, wq, wp):
        return jnp.sum(
            slab_layer_block(x, lns, lnb, wq, bq, wp, bp, ls, heads, scale, eps, True) ** 2
        )

    grads = jax.grad(loss, argnums=(0, 1, 2))(x, wq, wp)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()


def test_slab_mlp_block_matches_unfused(rng):
    """MLP half-layer kernel (LN + fc1 + GELU + fc2 + LayerScale + residual,
    hidden axis chunked through VMEM) must match the unfused ordering."""
    import jax
    from dinov2_tpu.ops.fused_attention import (
        _slab_mlp_reference,
        slab_mlp_block,
    )

    b, t, d = 2, 37, 64
    dh = 4 * d
    x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    lns = jnp.asarray(rng.uniform(0.5, 1.5, d), jnp.float32)
    lnb = jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((d, dh)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(dh) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((dh, d)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32)
    ls = jnp.asarray(rng.uniform(0.1, 1.0, d), jnp.float32)

    for approx in (True, False):
        got = np.asarray(
            slab_mlp_block(x, lns, lnb, w1, b1, w2, b2, ls, approx, 1e-6, True)
        )
        want = np.asarray(
            _slab_mlp_reference(x, lns, lnb, w1, b1, w2, b2, ls, approx, 1e-6)
        )
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)

    def loss(x, w1, w2):
        return jnp.sum(
            slab_mlp_block(x, lns, lnb, w1, b1, w2, b2, ls, True, 1e-6, True) ** 2
        )

    grads = jax.grad(loss, argnums=(0, 1, 2))(x, w1, w2)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()


def test_slab_mlp_flat_route_matches_per_image(rng, monkeypatch):
    """When b*t has a sublane-aligned divisor that fits VMEM, the MLP
    half-layer flattens to (B*T, D) and cuts the token axis directly
    (_slab_mlp_flat); result must equal the per-image route and the unfused
    reference."""
    from dinov2_tpu.ops import fused_attention as fa

    b, t, d = 2, 64, 64  # b*t = 128: flat route eligible (m % 8 == 0)
    dh = 4 * d
    assert fa._pick_flat_rows(b * t, d, dh, 4) is not None
    x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    lns = jnp.asarray(rng.uniform(0.5, 1.5, d), jnp.float32)
    lnb = jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((d, dh)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(dh) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((dh, d)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32)
    ls = jnp.asarray(rng.uniform(0.1, 1.0, d), jnp.float32)
    args = (x, lns, lnb, w1, b1, w2, b2, ls, True, 1e-6, True)

    flat = np.asarray(fa.slab_mlp_block(*args))
    monkeypatch.setenv("DINOV2_TPU_MLP_FLAT", "off")
    per_image = np.asarray(fa.slab_mlp_block(*args))
    want = np.asarray(_ref_mlp(fa, *args[:-1]))
    np.testing.assert_allclose(flat, want, rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(flat, per_image, rtol=2e-6, atol=2e-6)


def _ref_mlp(fa, x, lns, lnb, w1, b1, w2, b2, ls, approx, eps):
    return fa._slab_mlp_reference(x, lns, lnb, w1, b1, w2, b2, ls, approx, eps)


# ---------------------------------------------------------------------------
# fused-QUANT attention half-layer (ops/fused_quant_attention.py)
# ---------------------------------------------------------------------------


def _make_ql_any(rng, n, k, t, packed):
    from dinov2_tpu.io.gguf import GGUFTensor
    from dinov2_tpu.models.params import _soa_from_blocks

    w = (rng.standard_normal((n, k)) * 0.5).astype(np.float32)
    raw = quantize(w, t)
    if packed:
        return _soa_from_blocks(GGUFTensor("w", (n, k), t, raw))
    return _make_ql(rng, n, k, t)


@pytest.mark.parametrize("t", [GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0,
                               GGMLType.Q5_1, GGMLType.Q8_0])
def test_quant_layer_kernel_matches_dequant_reference(t, rng):
    """The fused-quant half-layer kernel (in-kernel dequant-once-into-scratch)
    must match the dense half-layer reference run on dequantized weights —
    all five ggml formats, packed layouts where they exist."""
    from dinov2_tpu.ops.fused_quant_attention import (
        fits_slab_layer_quant,
        quant_layer_reference,
        slab_layer_block_quant,
    )

    b, tt, heads, d = 2, 37, 4, 64
    packed = t != GGMLType.Q8_0
    qkv_ql = _make_ql_any(rng, 3 * d, d, t, packed)
    proj_ql = _make_ql_any(rng, d, d, t, packed)
    assert fits_slab_layer_quant(tt, d, 4, qkv_ql, proj_ql)

    x = jnp.asarray(rng.standard_normal((b, tt, d)), jnp.float32)
    lns = jnp.asarray(rng.uniform(0.5, 1.5, d), jnp.float32)
    lnb = jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32)
    bq = jnp.asarray(rng.standard_normal(3 * d) * 0.1, jnp.float32)
    bp = jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32)
    ls = jnp.asarray(rng.uniform(0.1, 1.0, d), jnp.float32)
    scale = 1.0 / (d // heads) ** 0.5

    got = np.asarray(
        slab_layer_block_quant(
            x, lns, lnb, qkv_ql, bq, proj_ql, bp, ls, heads, scale, 1e-6, True
        )
    )
    want = np.asarray(
        quant_layer_reference(
            x, lns, lnb, qkv_ql, bq, proj_ql, bp, ls, heads, scale, 1e-6
        )
    )
    # the kernel contracts (t,d)x(out,in) on dim 1 while the reference runs
    # x @ W: same math, different f32 reduction order -> ~1e-5 reassociation
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_quant_layer_kernel_multi_image_blocks(rng):
    """nb>1 grid: the cell-0 dequant must serve every later grid cell."""
    from dinov2_tpu.ops.fused_quant_attention import (
        _pick_image_blocks,
        _ql_meta,
        _quant_layer_cost,
        quant_layer_reference,
        slab_layer_block_quant,
    )

    b, tt, heads, d = 4, 32, 2, 64
    qkv_ql = _make_ql_any(rng, 3 * d, d, GGMLType.Q4_0, True)
    proj_ql = _make_ql_any(rng, d, d, GGMLType.Q4_0, True)
    nb = _pick_image_blocks(
        b,
        lambda nb: _quant_layer_cost(nb, tt, d, 4, _ql_meta(qkv_ql), _ql_meta(proj_ql)),
    )
    assert nb > 1

    x = jnp.asarray(rng.standard_normal((b, tt, d)), jnp.float32)
    lns = jnp.ones(d, jnp.float32)
    lnb = jnp.zeros(d, jnp.float32)
    bq = jnp.asarray(rng.standard_normal(3 * d) * 0.1, jnp.float32)
    bp = jnp.zeros(d, jnp.float32)
    ls = jnp.ones(d, jnp.float32)
    got = np.asarray(
        slab_layer_block_quant(
            x, lns, lnb, qkv_ql, bq, proj_ql, bp, ls, heads, 0.125, 1e-6, True
        )
    )
    want = np.asarray(
        quant_layer_reference(
            x, lns, lnb, qkv_ql, bq, proj_ql, bp, ls, heads, 0.125, 1e-6
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_quant_model_slab_routing_matches_xla(rng, tmp_path, monkeypatch):
    """Full fused-quant forward with the slab route (interpreted kernels) vs
    the XLA dequant-then-matmul path: the routing in models/vit.py must hand
    the quantized layers to slab_layer_block_quant without changing results."""
    import jax

    from dinov2_tpu.io.synthetic import write_synthetic_gguf
    from dinov2_tpu.models.config import DinoConfig
    from dinov2_tpu.models.params import load_params
    from dinov2_tpu.models.vit import ModelOptions, forward
    from dinov2_tpu.quant.quantize import quantize_gguf

    config = DinoConfig(hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
                        num_classes=4, patch_size=14, img_size=70)
    src = tmp_path / "m.gguf"
    dst = tmp_path / "m.q4_0.gguf"
    write_synthetic_gguf(src, config, seed=7)
    quantize_gguf(src, dst, GGMLType.Q4_0)

    loaded = load_params(dst, dtype=jnp.float32, quant_mode="fused")
    x = jnp.asarray(rng.standard_normal((2, 70, 70, 3)), jnp.float32)

    opts_slab = ModelOptions(parity="hf", flash_attention="slab",
                             compute_dtype=jnp.float32)
    opts_van = ModelOptions(parity="hf", flash_attention=False,
                            compute_dtype=jnp.float32)
    monkeypatch.setenv("DINOV2_TPU_QUANT_BACKEND", "xla")
    want = forward(loaded.params, x, loaded.config, opts_van, classify=True)
    # auto route (transient-dequant into the dense kernel) AND the forced
    # in-kernel quant-kernel route must both match the unfused path. Env
    # knobs are read at TRACE time; distinct batch sizes force a fresh trace
    # per mode (same jit cache key otherwise).
    for slab_mode, nb in (("auto", 2), ("kernel", 1)):
        monkeypatch.setenv("DINOV2_TPU_QUANT_SLAB", slab_mode)
        got = forward(loaded.params, x[:nb], loaded.config, opts_slab, classify=True)
        for key in ("cls_token", "probs"):
            np.testing.assert_allclose(
                np.asarray(got[key]), np.asarray(want[key])[:nb],
                rtol=5e-5, atol=5e-5, err_msg=f"slab_mode={slab_mode} {key}",
            )


def test_slab_backward_flash_route_matches_vanilla(rng, monkeypatch):
    """The slab VJP's flash route (FA-2 Pallas backward kernels) must produce
    the same gradients as the recompute-vanilla route."""
    import jax

    from dinov2_tpu.ops.fused_attention import slab_attention

    qkv = jnp.asarray(rng.standard_normal((1, 130, 3 * 128)), jnp.float32)

    def loss(s):
        return jnp.sum(slab_attention(s, 4, 1.0 / (32**0.5), True) ** 2)

    monkeypatch.setenv("DINOV2_TPU_SLAB_BWD", "vanilla")
    g_van = np.asarray(jax.grad(loss)(qkv))
    monkeypatch.setenv("DINOV2_TPU_SLAB_BWD", "flash")
    g_fla = np.asarray(jax.grad(loss)(qkv))
    np.testing.assert_allclose(g_fla, g_van, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("t,heads,d", [(257, 12, 768), (300, 4, 256)])
def test_flash_slab_matches_vanilla(t, heads, d, rng):
    """Slab-consuming flash wrapper (per-head BlockSpec index maps into the
    (B, T, 3D) slab, no HBM transposes) must match the vanilla reference."""
    from dinov2_tpu.ops.fused_attention import _slab_reference
    from dinov2_tpu.ops.flash_attention import flash_attention_slab

    b = 2
    qkv = jnp.asarray(rng.standard_normal((b, t, 3 * d)), jnp.float32)
    scale = 1.0 / (d // heads) ** 0.5
    want = np.asarray(_slab_reference(qkv, heads, scale))
    got = np.asarray(
        flash_attention_slab(qkv, heads, scale, 128, True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_flash_slab_grad_matches_reference(rng):
    import jax

    from dinov2_tpu.ops.fused_attention import _slab_reference
    from dinov2_tpu.ops.flash_attention import flash_attention_slab

    qkv = jnp.asarray(rng.standard_normal((1, 130, 3 * 128)), jnp.float32)
    scale = 1.0 / (32**0.5)
    g1 = jax.grad(
        lambda s: jnp.sum(flash_attention_slab(s, 4, scale, 128, True) ** 2)
    )(qkv)
    g2 = jax.grad(lambda s: jnp.sum(_slab_reference(s, 4, scale) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


def test_quant_model_dequant_slab_route_matches_xla(rng, tmp_path, monkeypatch):
    """DINOV2_TPU_QUANT_SLAB=dequant: per-layer XLA dequant into the DENSE
    half-layer kernel (the measured-fastest batched route) must match the
    unfused XLA path."""
    import jax

    from dinov2_tpu.io.synthetic import write_synthetic_gguf
    from dinov2_tpu.models.config import DinoConfig
    from dinov2_tpu.models.params import load_params
    from dinov2_tpu.models.vit import ModelOptions, forward
    from dinov2_tpu.quant.quantize import quantize_gguf

    config = DinoConfig(hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
                        num_classes=4, patch_size=14, img_size=70)
    src = tmp_path / "m.gguf"
    dst = tmp_path / "m.q5_1.gguf"
    write_synthetic_gguf(src, config, seed=9)
    quantize_gguf(src, dst, GGMLType.Q5_1)

    loaded = load_params(dst, dtype=jnp.float32, quant_mode="fused")
    x = jnp.asarray(rng.standard_normal((2, 70, 70, 3)), jnp.float32)
    opts_slab = ModelOptions(parity="hf", flash_attention="slab",
                             compute_dtype=jnp.float32)
    opts_van = ModelOptions(parity="hf", flash_attention=False,
                            compute_dtype=jnp.float32)
    monkeypatch.setenv("DINOV2_TPU_QUANT_BACKEND", "xla")
    want = forward(loaded.params, x, loaded.config, opts_van, classify=True)
    monkeypatch.setenv("DINOV2_TPU_QUANT_SLAB", "dequant")
    got = forward(loaded.params, x, loaded.config, opts_slab, classify=True)
    for key in ("cls_token", "probs"):
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(want[key]), rtol=5e-5, atol=5e-5
        )


def test_flash_rescue_gate_matches_1kv_condition():
    """forward_features arms the whole-stack rescue for the flash path only
    when the single-KV specialization (the one flash kernel that runs the
    unsafe CLS-shift core) would actually be taken; the multi-KV
    online-softmax kernel is safe by construction and must not pay the
    duplicated rescue branch."""
    from dinov2_tpu.ops.flash_attention import (
        _pick_blocks,
        flash_unsafe_core_active,
    )

    for t in (257, 640, 1370):  # every DINOv2 preset shape: single KV block
        bq, bk, tp = _pick_blocks(t, 64, 2048)
        assert bk == tp
        assert flash_unsafe_core_active(t, 64)
    for t in (4096, 16384):  # native-resolution territory: multi-KV, safe
        assert not flash_unsafe_core_active(t, 64)


def test_pallas_qmatmul_huge_k_terminates(rng):
    """The VMEM shrink loop used to spin forever at k >= ~20k: with bm < bn
    and bn already at its 128 floor, 'halve the larger block' made no
    progress. Default block sizes (no block_m/block_n override) must both
    terminate and stay correct."""
    n, k, m = 128, 20480, 4
    ql = _make_ql(rng, n, k, GGMLType.Q8_0)
    x = jnp.asarray(rng.standard_normal((m, k)) * 0.05, jnp.float32)
    want = np.asarray(x @ dequant_weight(ql, jnp.float32).T)
    got = np.asarray(quant_matmul_pallas(x, ql, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=0.6)


def test_flash_unsafe_core_inactive_for_slab_head_dims():
    """hd % 128 == 0 routes to flash_attention_slab (safe by construction),
    so the rescue predicate must be False there — forward_features would
    otherwise trace the whole layer stack twice for a rescue that can never
    trigger."""
    from dinov2_tpu.ops.flash_attention import flash_unsafe_core_active

    assert flash_unsafe_core_active(257, 128) is False
    assert flash_unsafe_core_active(257, 256) is False

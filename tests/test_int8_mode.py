"""W8A8 int8 serving mode (quant_mode='int8'): container, matmul, routing.

TPU-native capability with no reference analog — the reference's quant modes
trade speed for memory on CPU (/root/reference/README.md quant tables); int8
feeds the MXU's native s8xs8->s32 path, so it is the one mode that can BEAT
dense bf16 speed. These tests pin the numerics contracts on CPU; speed is
measured on chip (docs/TPU_NOTES.md round 5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dinov2_tpu.io.gguf import GGMLType, GGUFReader, GGUFTensor
from dinov2_tpu.io.synthetic import write_synthetic_gguf
from dinov2_tpu.models.config import DinoConfig
from dinov2_tpu.models.params import Int8Linear, _int8_from_tensor, load_params
from dinov2_tpu.ops.qmatmul import (
    dequant_weight,
    int8_matmul,
    quantize_rows_int8,
)
from dinov2_tpu.quant.quantize import quantize_gguf
from dinov2_tpu.runtime.engine import DinoEngine

TINY = DinoConfig(
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=2,
    num_classes=4,
    patch_size=14,
    img_size=70,
)


@pytest.fixture(scope="module")
def tiny_gguf(tmp_path_factory):
    path = tmp_path_factory.mktemp("ckpt-int8") / "tiny.gguf"
    return write_synthetic_gguf(path, TINY, seed=3)


def _il_from_dense(w: np.ndarray) -> Int8Linear:
    s = np.maximum(np.abs(w).max(axis=1) / 127.0, 1e-12)
    codes = np.clip(np.rint(w / s[:, None]), -127, 127).astype(np.int8)
    return Int8Linear(
        codes=jnp.asarray(codes), s=jnp.asarray(s, jnp.float32), shape=w.shape
    )


def test_quantize_rows_reconstruction(rng):
    x = rng.standard_normal((5, 33)).astype(np.float32) * 3.0
    x8, sx = quantize_rows_int8(jnp.asarray(x))
    rec = np.asarray(x8, np.float32) * np.asarray(sx)
    # per-element error <= half a quantization step of that row
    step = np.abs(x).max(axis=1, keepdims=True) / 127.0
    assert (np.abs(rec - x) <= step / 2 + 1e-9).all()
    # extremes map to exactly +-127
    assert np.abs(np.asarray(x8)).max() == 127


def test_quantize_rows_zero_row():
    x8, sx = quantize_rows_int8(jnp.zeros((2, 8)))
    assert np.asarray(x8).max() == 0 and np.isfinite(np.asarray(sx)).all()


def test_int8_from_tensor_roundtrip(rng):
    w = rng.standard_normal((16, 32)).astype(np.float32)
    t = GGUFTensor(
        name="w", shape=(16, 32), ggml_type=GGMLType.F32,
        data=w.view(np.uint8).ravel(),
    )
    il = _int8_from_tensor(t)
    assert il.codes.dtype == jnp.int8 and il.shape == (16, 32)
    rec = np.asarray(dequant_weight(il, jnp.float32))
    step = np.abs(w).max(axis=1, keepdims=True) / 127.0
    assert (np.abs(rec - w) <= step / 2 + 1e-9).all()


def test_int8_from_tensor_refuses_nonfinite():
    w = np.full((4, 8), np.nan, dtype=np.float32)
    t = GGUFTensor(
        name="w", shape=(4, 8), ggml_type=GGMLType.F32,
        data=w.view(np.uint8).ravel(),
    )
    with pytest.raises(ValueError, match="non-finite"):
        _int8_from_tensor(t)


def test_int8_matmul_matches_emulated_reference(rng):
    """The int8 GEMM itself is EXACT (int32 accumulation): the full matmul
    must equal the f32 product of the two dequantized operands tightly."""
    x = rng.standard_normal((3, 7, 64)).astype(np.float32)
    w = rng.standard_normal((48, 64)).astype(np.float32)
    bias = rng.standard_normal((48,)).astype(np.float32)
    il = _il_from_dense(w)

    y = int8_matmul(jnp.asarray(x), il, bias=jnp.asarray(bias))

    x8, sx = quantize_rows_int8(jnp.asarray(x))
    xe = np.asarray(x8, np.float32) * np.asarray(sx)
    we = np.asarray(il.codes, np.float32) * np.asarray(il.s)[:, None]
    expect = xe @ we.T + bias
    np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-5, atol=1e-5)


def test_int8_matmul_close_to_dense(rng):
    """End-to-end W8A8 error stays within the coarse 8-bit envelope."""
    x = rng.standard_normal((4, 64)).astype(np.float32)
    w = (rng.standard_normal((32, 64)) * 0.05).astype(np.float32)
    il = _il_from_dense(w)
    y = np.asarray(int8_matmul(jnp.asarray(x), il))
    dense = x @ w.T
    denom = np.abs(dense).max() + 1e-9
    assert np.abs(y - dense).max() / denom < 0.02


def test_int8_linear_is_jit_and_scan_compatible(rng):
    w = rng.standard_normal((32, 64)).astype(np.float32)
    il = _il_from_dense(w)
    leaves, treedef = jax.tree_util.tree_flatten(il)
    il2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert il2.shape == il.shape

    @jax.jit
    def f(ql, x):
        return int8_matmul(x, ql)

    x = jnp.asarray(rng.standard_normal((2, 64)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(f(il, x)), np.asarray(int8_matmul(x, il)), rtol=1e-6
    )


def test_load_params_int8_any_ftype(tiny_gguf):
    """int8 is a runtime mode: it must requantize from an F16 file (the
    fused mode downgrade at load must NOT catch it)."""
    loaded = load_params(tiny_gguf, dtype=jnp.float32, quant_mode="int8")
    qkv = loaded.params["layers"]["qkv"]["kernel"]
    assert getattr(qkv, "int8_per_row", False)
    assert qkv.codes.dtype == jnp.int8
    # stacked along the layer axis
    assert qkv.codes.shape[0] == TINY.num_hidden_layers
    assert not loaded.quantized  # int8 never takes the fused shard_map paths


def test_int8_engine_matches_dequant(tiny_gguf, rng):
    img = rng.integers(0, 256, (2, 70, 70, 3), dtype=np.uint8)
    ref = DinoEngine(tiny_gguf, dtype=jnp.float32).classify_probs(img)
    q = DinoEngine(tiny_gguf, dtype=jnp.float32, quant_mode="int8").classify_probs(img)
    assert np.abs(q - ref).max() < 0.15
    assert (q.argmax(-1) == ref.argmax(-1)).all()
    np.testing.assert_allclose(q.sum(-1), 1.0, rtol=1e-5)


def test_int8_from_quantized_file(tiny_gguf, tmp_path, rng):
    """int8 requantizes THROUGH the exact ggml dequant of a q8_0 source."""
    qpath = tmp_path / "tiny-q8.gguf"
    quantize_gguf(tiny_gguf, qpath, "q8_0")
    img = rng.integers(0, 256, (1, 70, 70, 3), dtype=np.uint8)
    ref = DinoEngine(qpath, dtype=jnp.float32, quant_mode="dequant").classify_probs(img)
    q = DinoEngine(qpath, dtype=jnp.float32, quant_mode="int8").classify_probs(img)
    assert np.abs(q - ref).max() < 0.15
    assert (q.argmax(-1) == ref.argmax(-1)).all()


def test_int8_unfused_path_matches_slab_route(tiny_gguf, rng, monkeypatch):
    """DINOV2_TPU_QUANT_SLAB=off forces the true int8 GEMM path (the one the
    giant SwiGLU models take); it must agree with the transient-dequant slab
    route to W8A8 precision."""
    img = rng.integers(0, 256, (1, 70, 70, 3), dtype=np.uint8)
    slab = DinoEngine(tiny_gguf, dtype=jnp.float32, quant_mode="int8").classify_probs(img)
    monkeypatch.setenv("DINOV2_TPU_QUANT_SLAB", "off")
    unfused = DinoEngine(tiny_gguf, dtype=jnp.float32, quant_mode="int8").classify_probs(img)
    # routes differ by activation quantization (slab dequants weights but
    # keeps f32 activations) — same envelope as quantize_roundtrip
    assert np.abs(slab - unfused).max() < 0.1
    assert (slab.argmax(-1) == unfused.argmax(-1)).all()


def test_int8_swiglu_forward(tmp_path, rng):
    """Giant-style SwiGLU MLP (the unfused path where int8 GEMMs actually
    run in production) classifies sanely under int8."""
    cfg = DinoConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_classes=4,
        patch_size=14,
        img_size=70,
        use_swiglu_ffn=True,
    )
    path = write_synthetic_gguf(tmp_path / "swiglu.gguf", cfg, seed=5)
    img = rng.integers(0, 256, (1, 70, 70, 3), dtype=np.uint8)
    ref = DinoEngine(path, dtype=jnp.float32).classify_probs(img)
    q = DinoEngine(path, dtype=jnp.float32, quant_mode="int8").classify_probs(img)
    assert np.abs(q - ref).max() < 0.15
    assert (q.argmax(-1) == ref.argmax(-1)).all()


def test_int8_feature_mode(tiny_gguf, rng):
    """Patch features under int8 stay within the 8-bit envelope of dense."""
    img = rng.integers(0, 256, (1, 70, 70, 3), dtype=np.uint8)
    ref = DinoEngine(tiny_gguf, dtype=jnp.float32).extract_features(img)
    q = DinoEngine(tiny_gguf, dtype=jnp.float32, quant_mode="int8").extract_features(img)
    rp, qp = np.asarray(ref["patch_tokens"]), np.asarray(q["patch_tokens"])
    denom = np.abs(rp).max() + 1e-9
    assert np.abs(qp - rp).max() / denom < 0.05


def test_export_refuses_int8_params(tiny_gguf, tmp_path):
    from dinov2_tpu.io.export import export_gguf

    loaded = load_params(tiny_gguf, dtype=jnp.float32, quant_mode="int8")
    with pytest.raises(ValueError, match="int8"):
        export_gguf(tmp_path / "out.gguf", loaded.params, loaded.config)

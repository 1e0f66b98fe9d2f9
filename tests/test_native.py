"""Native C++ codec vs numpy reference: bit-exact equivalence.

Builds csrc/libdinogguf.so once per session (skips if no compiler)."""

import numpy as np
import pytest

from dinov2_tpu.io.gguf import GGMLType
from dinov2_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not (native.available() or native.build_native()),
    reason="native codec unavailable (no g++?)",
)

ALL_TYPES = [GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1, GGMLType.Q8_0]


def _numpy_only(monkeypatch):
    """Route the next quant/blocks calls through the numpy path."""
    monkeypatch.setenv("DINOV2_TPU_NO_NATIVE", "1")
    native._lib = None  # force re-dispatch


def _native_again(monkeypatch):
    monkeypatch.delenv("DINOV2_TPU_NO_NATIVE")
    native._lib = None


@pytest.fixture
def data(rng):
    return (rng.standard_normal((32, 256)) * rng.uniform(0.01, 4)).astype(np.float32)


@pytest.mark.parametrize("t", ALL_TYPES)
def test_quantize_bitexact(t, data, monkeypatch):
    from dinov2_tpu.quant import blocks

    got = native.quantize(data, int(t))
    _numpy_only(monkeypatch)
    want = blocks.quantize(data, t)
    _native_again(monkeypatch)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("t", ALL_TYPES)
def test_dequantize_bitexact(t, data, monkeypatch):
    from dinov2_tpu.quant import blocks

    raw = blocks.quantize(data, t)
    got = native.dequantize(raw, int(t), data.shape)
    _numpy_only(monkeypatch)
    want = blocks.dequantize(raw, t, data.shape)
    _native_again(monkeypatch)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("t", ALL_TYPES)
def test_unpack_codes_bitexact(t, data, monkeypatch):
    from dinov2_tpu.quant import blocks

    raw = blocks.quantize(data, t)
    got = native.unpack_codes(raw, int(t), data.shape)
    _numpy_only(monkeypatch)
    want = blocks.unpack_codes(raw, t, data.shape)
    _native_again(monkeypatch)
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])
    if want[2] is None:
        assert got[2] is None
    else:
        np.testing.assert_array_equal(got[2], want[2])


def test_fp16_conversion_bitexact(rng):
    x = rng.standard_normal(4096).astype(np.float16)
    got = native.fp16_to_fp32(x)
    np.testing.assert_array_equal(got, x.astype(np.float32))


def test_fp16_special_values():
    x = np.array([0.0, -0.0, np.inf, -np.inf, 65504, 6e-8, 1e-7], dtype=np.float16)
    got = native.fp16_to_fp32(x)
    np.testing.assert_array_equal(got, x.astype(np.float32))


def test_validate(rng):
    from dinov2_tpu.quant import blocks

    x = rng.standard_normal((2, 32)).astype(np.float32)
    raw = blocks.quantize(x, GGMLType.Q4_0)
    assert native.validate(raw, int(GGMLType.Q4_0))
    bad = raw.copy()
    bad[0:2] = np.array([0x00, 0x7E], dtype=np.uint8)
    assert not native.validate(bad, int(GGMLType.Q4_0))

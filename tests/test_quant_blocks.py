"""Block-quantization codec tests.

Oracle: an independent scalar (per-element, loop-based) transcription of ggml's
reference quantizers, checked bit-for-bit against the vectorized implementation.
"""

import numpy as np
import pytest

from dinov2_tpu.io.gguf import GGMLType
from dinov2_tpu.quant.blocks import (
    QK,
    block_dtype,
    dequantize,
    quantize,
    validate_quantized,
)

ALL_TYPES = [GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1, GGMLType.Q8_0]


def scalar_quantize_block(x, t):
    """Loop-based transcription of ggml's quantize_row_*_ref for one 32-block."""
    out = np.zeros(1, dtype=block_dtype(t))[0]
    if t in (GGMLType.Q4_0, GGMLType.Q5_0):
        amax, maxv = 0.0, 0.0
        for v in x:
            if abs(v) > amax:
                amax, maxv = abs(v), v
        div = -8.0 if t == GGMLType.Q4_0 else -16.0
        top = 15 if t == GGMLType.Q4_0 else 31
        half = 8.5 if t == GGMLType.Q4_0 else 16.5
        d = maxv / div
        idv = 1.0 / d if d else 0.0
        out["d"] = np.float16(d)
        q = [min(top, int(v * idv + half)) for v in x]
    elif t in (GGMLType.Q4_1, GGMLType.Q5_1):
        mn, mx = float(x.min()), float(x.max())
        steps = 15.0 if t == GGMLType.Q4_1 else 31.0
        top = int(steps)
        d = (mx - mn) / steps
        idv = 1.0 / d if d else 0.0
        out["d"] = np.float16(d)
        out["m"] = np.float16(mn)
        q = [min(top, int((v - mn) * idv + 0.5)) for v in x]
    else:  # Q8_0
        amax = max(abs(float(v)) for v in x)
        d = amax / 127.0
        idv = 1.0 / d if d else 0.0
        out["d"] = np.float16(d)
        # ggml's roundf = half-AWAY-from-zero; np.round is half-to-even and
        # diverges on exact half-step ties (e.g. v*idv == 2.5)
        out["qs"] = [
            int(np.sign(v) * np.floor(abs(float(v) * idv) + 0.5)) for v in x
        ]
        return out

    out["qs"] = [(q[j] & 0xF) | ((q[16 + j] & 0xF) << 4) for j in range(16)]
    if t in (GGMLType.Q5_0, GGMLType.Q5_1):
        qh = 0
        for j in range(16):
            qh |= ((q[j] & 0x10) >> 4) << j
            qh |= ((q[16 + j] & 0x10) >> 4) << (j + 16)
        out["qh"] = np.uint32(qh)
    return out


@pytest.mark.parametrize("t", ALL_TYPES)
def test_bitexact_vs_scalar_reference(t, rng):
    x = (rng.standard_normal((8, 2 * QK)) * rng.uniform(0.01, 3)).astype(np.float32)
    raw = quantize(x, t)
    got = raw.view(block_dtype(t))
    flat = x.reshape(-1, QK)
    for i in range(flat.shape[0]):
        want = scalar_quantize_block(flat[i], t)
        for name in block_dtype(t).names:
            np.testing.assert_array_equal(
                got[i][name], want[name], err_msg=f"{t.name} block {i} field {name}"
            )


@pytest.mark.parametrize("t", ALL_TYPES)
def test_roundtrip_error_bound(t, rng):
    x = rng.standard_normal((64, 128)).astype(np.float32)
    raw = quantize(x, t)
    deq = dequantize(raw, t, x.shape)
    assert deq.shape == x.shape
    # error per block bounded by ~1 quantization step
    steps = {"Q4_0": 8, "Q4_1": 15, "Q5_0": 16, "Q5_1": 31, "Q8_0": 127}[t.name]
    blocks = x.reshape(-1, QK)
    scale = np.abs(blocks).max(axis=1, keepdims=True) / steps
    err = np.abs(deq.reshape(-1, QK) - blocks)
    assert (err <= scale * 1.01 + 1e-6).all()


@pytest.mark.parametrize("t", ALL_TYPES)
def test_quantize_idempotent_on_dequantized(t, rng):
    """dequantize(quantize(x)) is a fixed point structure-wise: sizes stable."""
    x = rng.standard_normal((4, 64)).astype(np.float32)
    raw = quantize(x, t)
    deq = dequantize(raw, t, x.shape)
    raw2 = quantize(deq, t)
    assert raw.nbytes == raw2.nbytes


@pytest.mark.parametrize("t", ALL_TYPES)
def test_validate(t, rng):
    x = rng.standard_normal((2, QK)).astype(np.float32)
    raw = quantize(x, t)
    assert validate_quantized(raw, t)
    bad = raw.copy()
    # corrupt the first fp16 scale to NaN
    bad[0:2] = np.array([0x00, 0x7E], dtype=np.uint8)  # fp16 NaN
    assert not validate_quantized(bad, t)


def test_zero_block():
    x = np.zeros((1, QK), dtype=np.float32)
    for t in ALL_TYPES:
        deq = dequantize(quantize(x, t), t, x.shape)
        np.testing.assert_array_equal(deq, x)


def test_dequantize_bf16(rng):
    """BF16 is a type the reader supports (GGUFTensor.as_numpy decodes it);
    the public quant.dequantize must too, not KeyError."""
    x = rng.standard_normal((4, 32)).astype(np.float32)
    bf = ((x.view(np.uint32) + 0x8000) >> 16).astype(np.uint16)  # rne-ish
    out = dequantize(bf.view(np.uint8).ravel(), GGMLType.BF16, x.shape)
    assert out.dtype == np.float32 and out.shape == x.shape
    np.testing.assert_allclose(out, x, atol=0.05, rtol=0.02)


def test_validate_routes_native(rng, monkeypatch):
    """validate_quantized follows the module's native-when-available
    convention like quantize/dequantize/unpack_codes (it used to always take
    the numpy scan), and both paths agree on good and corrupted blocks."""
    from dinov2_tpu.utils import native

    x = rng.standard_normal((2, 64)).astype(np.float32)
    raw = quantize(x, GGMLType.Q4_1)
    bad = raw.copy()
    bad[0:2] = np.frombuffer(np.float16(np.inf).tobytes(), np.uint8)  # d=inf

    results = {}
    for forced in (False, True):
        if forced and not native.available():
            break
        monkeypatch.setattr(native, "available", lambda f=forced: f)
        results[forced] = (
            validate_quantized(raw, GGMLType.Q4_1),
            validate_quantized(bad, GGMLType.Q4_1),
        )
    for good_ok, bad_ok in results.values():
        assert good_ok is True and bad_ok is False


def test_quantize_rejects_non_finite(rng):
    """ggml's absmax loop skips NaN, so the native codec would compute a
    finite scale, PASS row validation, and silently write garbage codes —
    while the numpy argmax path picks the NaN and fails validation. The one
    consistent (and honest) behavior is refusing non-finite input up front,
    identically on both paths."""
    for bad in (np.nan, np.inf, -np.inf):
        x = rng.standard_normal((2, 64)).astype(np.float32)
        x[1, 7] = bad
        for t in ALL_TYPES:
            with pytest.raises(ValueError, match="non-finite"):
                quantize(x, t)

"""Failure-detection tests: malformed GGUF files must fail loudly and typed
(the reference asserts/crashes on malformed files — dinov2.cpp:58,65; we raise).
"""

import struct

import numpy as np
import pytest

from dinov2_tpu.io.gguf import GGMLType, GGUFReader, GGUFWriter, ggml_nbytes


def test_bad_magic(tmp_path):
    p = tmp_path / "bad.gguf"
    p.write_bytes(b"NOPE" + b"\x00" * 64)
    with pytest.raises(ValueError, match="not a GGUF file"):
        GGUFReader(p)


def test_unsupported_version(tmp_path):
    p = tmp_path / "v99.gguf"
    p.write_bytes(b"GGUF" + struct.pack("<IQQ", 99, 0, 0))
    with pytest.raises(ValueError, match="unsupported GGUF version"):
        GGUFReader(p)


def test_truncated_header(tmp_path):
    p = tmp_path / "trunc.gguf"
    p.write_bytes(b"GGUF" + struct.pack("<I", 3) + b"\x01")
    with pytest.raises(EOFError):
        GGUFReader(p)


def test_truncated_kv(tmp_path):
    p = tmp_path / "tkv.gguf"
    # header claims 1 kv, then cuts off mid key
    p.write_bytes(b"GGUF" + struct.pack("<IQQ", 3, 0, 1) + struct.pack("<Q", 100))
    with pytest.raises(EOFError):
        GGUFReader(p)


def test_block_misaligned_tensor_rejected(tmp_path, rng):
    w = GGUFWriter(tmp_path / "x.gguf")
    raw = np.zeros(18, dtype=np.uint8)
    with pytest.raises(ValueError, match="not a multiple"):
        w.add_tensor("t", raw, GGMLType.Q4_0, (1, 33))  # 33 not divisible by 32


def test_wrong_byte_count_rejected(tmp_path):
    w = GGUFWriter(tmp_path / "y.gguf")
    raw = np.zeros(10, dtype=np.uint8)
    with pytest.raises(ValueError, match="expected"):
        w.add_tensor("t", raw, GGMLType.Q4_0, (1, 32))


def test_nbytes_accounting():
    assert ggml_nbytes(GGMLType.Q4_0, (2, 64)) == 2 * 2 * 18
    assert ggml_nbytes(GGMLType.F16, (3, 5)) == 30
    assert ggml_nbytes(GGMLType.Q8_0, (32,)) == 34


def test_missing_required_kv(tmp_path):
    """A GGUF without hparams keys must raise a KeyError at config load."""
    from dinov2_tpu.models.config import DinoConfig

    w = GGUFWriter(tmp_path / "nokv.gguf")
    w.add_uint32("hidden_size", 64)  # missing the rest
    w.write()
    r = GGUFReader(tmp_path / "nokv.gguf")
    with pytest.raises(KeyError):
        DinoConfig.from_gguf_kv(r.kv)
    r.close()

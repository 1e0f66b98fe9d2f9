"""GGUF reader/writer roundtrip tests (format parity with the reference schema)."""

import struct

import numpy as np
import pytest

from dinov2_tpu.io.gguf import (
    GGUFValueType,
    GGMLType,
    GGUFReader,
    GGUFWriter,
    ggml_nbytes,
)
from dinov2_tpu.quant.blocks import quantize


def test_roundtrip_kv_and_tensors(tmp_path, rng):
    path = tmp_path / "model.gguf"
    w = GGUFWriter(path, arch="dinov2")
    w.add_uint32("hidden_size", 384)
    w.add_uint32("num_hidden_layers", 12)
    w.add_string("0", "tench, Tinca tinca")
    w.add_string("1", "goldfish, Carassius auratus")
    w.add_kv("eps", 1e-6, None)

    t2d = rng.standard_normal((64, 128)).astype(np.float16)
    t1d = rng.standard_normal((64,)).astype(np.float32)
    t4d = rng.standard_normal((1, 64, 1, 1)).astype(np.float32)
    w.add_tensor("encoder.layer.0.mlp.fc1.weight", t2d)
    w.add_tensor("encoder.layer.0.mlp.fc1.bias", t1d)
    w.add_tensor("embeddings.patch_embeddings.projection.bias", t4d)
    w.write()

    r = GGUFReader(path)
    assert r.kv["general.architecture"] == "dinov2"
    assert r.kv["hidden_size"] == 384
    assert r.kv["0"] == "tench, Tinca tinca"
    assert r.kv["eps"] == pytest.approx(1e-6)

    got = r.tensors["encoder.layer.0.mlp.fc1.weight"]
    assert got.ggml_type == GGMLType.F16
    assert got.shape == (64, 128)
    np.testing.assert_array_equal(got.as_numpy(), t2d.astype(np.float32))

    got1d = r.tensors["encoder.layer.0.mlp.fc1.bias"]
    assert got1d.shape == (64,)
    np.testing.assert_array_equal(got1d.as_numpy(), t1d)

    got4d = r.tensors["embeddings.patch_embeddings.projection.bias"]
    assert got4d.shape == (1, 64, 1, 1)
    r.close()


def test_quantized_tensor_roundtrip(tmp_path, rng):
    path = tmp_path / "q.gguf"
    x = rng.standard_normal((16, 64)).astype(np.float32)
    raw = quantize(x, GGMLType.Q4_0)
    assert raw.nbytes == ggml_nbytes(GGMLType.Q4_0, (16, 64))

    w = GGUFWriter(path)
    w.add_uint32("ftype", int(GGMLType.Q4_0))
    w.add_tensor("w", raw, GGMLType.Q4_0, (16, 64))
    w.write()

    r = GGUFReader(path)
    t = r.tensors["w"]
    assert t.ggml_type == GGMLType.Q4_0
    assert t.shape == (16, 64)
    deq = t.as_numpy()
    assert deq.shape == (16, 64)
    # quantization error bound for q4_0: |x - deq| <= |d| (half-step 8.5 rounding)
    assert np.abs(deq - x).max() < np.abs(x).max() / 8 + 1e-3
    r.close()


def test_alignment_and_offsets(tmp_path, rng):
    """Tensor data offsets must be 32-byte aligned regardless of tensor sizes."""
    path = tmp_path / "align.gguf"
    w = GGUFWriter(path)
    # 1D f32 of odd length -> 4*3=12 bytes, forces padding before the next tensor
    w.add_tensor("a", np.ones(3, dtype=np.float32))
    b = rng.standard_normal((8, 32)).astype(np.float16)
    w.add_tensor("b", b)
    w.write()

    r = GGUFReader(path)
    np.testing.assert_array_equal(r.tensors["a"].as_numpy(), np.ones(3, dtype=np.float32))
    np.testing.assert_array_equal(r.tensors["b"].as_numpy(), b.astype(np.float32))
    r.close()


def test_upstream_gguf_package_interop(tmp_path):
    """If the upstream `gguf` pip package is available, verify cross-reads.

    It is not installed in this environment; the test self-skips then. The format
    is covered by the byte-level roundtrip tests above either way.
    """
    gguf = pytest.importorskip("gguf")

    path = tmp_path / "up.gguf"
    wr = gguf.GGUFWriter(path=str(path), arch="dinov2")
    wr.add_uint32("hidden_size", 384)
    data = np.arange(64, dtype=np.float32).reshape(8, 8)
    wr.add_tensor("t", data)
    wr.write_header_to_file()
    wr.write_kv_data_to_file()
    wr.write_tensors_to_file()
    wr.close()

    r = GGUFReader(path)
    assert r.kv["hidden_size"] == 384
    np.testing.assert_array_equal(r.tensors["t"].as_numpy(), data)
    r.close()


def _pack_str(s: str) -> bytes:
    b = s.encode()
    return struct.pack("<Q", len(b)) + b


def test_reader_on_foreign_bytes(tmp_path):
    """Parse a GGUF v3 byte stream hand-built with struct (independent of
    GGUFWriter), following the exact layout the upstream `gguf` package and
    ggml's gguf_init_from_file agree on (/root/reference/dinov2.cpp:263-272).
    Proves the reader against foreign bytes without the pip package."""
    kv = b""
    # u32 scalar
    kv += _pack_str("hidden_size") + struct.pack("<II", 4, 384)
    # STRING
    kv += _pack_str("general.architecture") + struct.pack("<I", 8) + _pack_str("dinov2")
    # INT32 ARRAY (type 9, elem 5)
    kv += _pack_str("ids") + struct.pack("<IIQ", 9, 5, 3) + struct.pack("<3i", -1, 0, 7)
    # FLOAT32 scalar
    kv += _pack_str("eps") + struct.pack("<If", 6, 1e-6)

    t = np.arange(64, dtype=np.float16).reshape(8, 8)
    # tensor info: name, n_dims, ne[] (fastest-moving first), type (F16=1), offset
    info = _pack_str("w") + struct.pack("<I", 2) + struct.pack("<2Q", 8, 8)
    info += struct.pack("<IQ", 1, 0)

    header = struct.pack("<4sIQQ", b"GGUF", 3, 1, 4)
    head = header + kv + info
    pad = (-len(head)) % 32
    blob = head + b"\x00" * pad + t.tobytes()
    path = tmp_path / "foreign.gguf"
    path.write_bytes(blob)

    r = GGUFReader(path)
    assert r.kv["hidden_size"] == 384
    assert r.kv["general.architecture"] == "dinov2"
    assert r.kv["ids"] == [-1, 0, 7]
    assert r.kv_array_types["ids"] == GGUFValueType.INT32
    assert r.kv["eps"] == pytest.approx(1e-6)
    np.testing.assert_array_equal(r.tensors["w"].as_numpy(), t.astype(np.float32))
    r.close()


def test_array_elem_type_preserved_by_quantize(tmp_path, rng):
    """quantize_gguf's KV copy must round-trip an INT32 array as INT32 (not
    re-infer UINT32 from the first element)."""
    from dinov2_tpu.quant.quantize import quantize_gguf

    src = tmp_path / "src.gguf"
    w = GGUFWriter(src)
    w.add_uint32("ftype", int(GGMLType.F16))
    w.add_kv("ids", [1, 2, 3], GGUFValueType.ARRAY, elem_type=GGUFValueType.INT32)
    w.add_tensor("a.weight", rng.standard_normal((8, 64)).astype(np.float16))
    w.write()

    dst = tmp_path / "dst.gguf"
    quantize_gguf(src, dst, GGMLType.Q8_0)
    r = GGUFReader(dst)
    assert r.kv["ids"] == [1, 2, 3]
    assert r.kv_array_types["ids"] == GGUFValueType.INT32
    assert r.tensors["a.weight"].ggml_type == GGMLType.Q8_0
    r.close()

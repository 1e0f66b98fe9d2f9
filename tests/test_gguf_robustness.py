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


def test_fuzz_truncations_and_corruptions(tmp_path, rng):
    """Randomized robustness sweep: any truncation of a valid GGUF, and
    random single-byte corruptions of its header/KV region, must raise a
    typed error (ValueError/EOFError/KeyError/UnicodeDecodeError) promptly —
    never hang, crash the process, or return a silently-broken reader."""
    from dinov2_tpu.io.gguf import GGUFReader
    from dinov2_tpu.io.synthetic import write_synthetic_gguf
    from dinov2_tpu.models.config import DinoConfig

    cfg = DinoConfig(hidden_size=64, num_hidden_layers=1, num_attention_heads=2,
                     num_classes=2, patch_size=14, img_size=70)
    src = tmp_path / "good.gguf"
    write_synthetic_gguf(src, cfg, seed=5)
    data = src.read_bytes()
    GGUFReader(src)  # sanity: the pristine file parses

    ok_errors = (ValueError, EOFError, KeyError, IndexError, UnicodeDecodeError,
                 OverflowError, MemoryError, struct.error)
    path = tmp_path / "fuzz.gguf"

    # truncations across the whole file, denser near the header
    cuts = sorted(set(
        list(range(0, 200, 7))
        + [int(v) for v in rng.integers(200, len(data) - 1, size=40)]
    ))
    for cut in cuts:
        path.write_bytes(data[:cut])
        try:
            r = GGUFReader(path)
            # a parseable truncation must still expose consistent tensors
            for t in r.tensors.values():
                t.as_numpy()
        except ok_errors:
            pass

    # single-byte corruptions in the header + KV region
    for off in rng.integers(4, min(2000, len(data)), size=60):
        buf = bytearray(data)
        buf[off] ^= 0xFF
        path.write_bytes(bytes(buf))
        try:
            r = GGUFReader(path)
            for t in r.tensors.values():
                t.as_numpy()
        except ok_errors:
            pass


def test_reader_closes_fd_on_parse_error(tmp_path):
    """A constructor failure (bad magic, truncated header, duplicate names)
    must close the fd and mmap of the half-built reader — a long-lived server
    scanning untrusted files would otherwise exhaust file descriptors."""
    import os

    path = tmp_path / "bad.gguf"
    path.write_bytes(b"NOPE" + b"\0" * 64)

    def open_fds():
        return len(os.listdir("/proc/self/fd"))

    before = open_fds()
    for _ in range(8):
        with pytest.raises(ValueError):
            GGUFReader(path)
    assert open_fds() <= before

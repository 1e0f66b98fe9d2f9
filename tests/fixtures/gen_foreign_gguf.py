"""Generate tests/fixtures/foreign_v3.gguf — a GGUF v3 file hand-packed with
struct, byte-for-byte following the public GGUF layout that the upstream `gguf`
Python package (used by the reference converter,
/root/reference/scripts/dinov2-to-gguf.py) and ggml's `gguf_init_from_file`
(/root/reference/dinov2.cpp:263-272) agree on.

The upstream package cannot be installed in this egress-less environment, so
this generator serves as the "foreign writer": it shares NO code with
dinov2_tpu.io.gguf (raw struct.pack only) and deliberately makes layout
choices our writer never makes (non-default general.alignment=64, KV types our
converter never emits: INT64 scalar, FLOAT32/STRING/INT32 arrays, BOOL).

Deterministic: re-running reproduces the committed fixture exactly.
"""

from __future__ import annotations

import struct
from pathlib import Path

OUT = Path(__file__).parent / "foreign_v3.gguf"
ALIGN = 64


def s(v: str) -> bytes:
    b = v.encode("utf-8")
    return struct.pack("<Q", len(b)) + b


def kv_scalar(key: str, vtype: int, fmt: str, value) -> bytes:
    return s(key) + struct.pack("<I", vtype) + struct.pack(fmt, value)


def kv_string(key: str, value: str) -> bytes:
    return s(key) + struct.pack("<I", 8) + s(value)


def kv_array(key: str, elem_type: int, packed_elems: list[bytes]) -> bytes:
    return (
        s(key)
        + struct.pack("<I", 9)  # ARRAY
        + struct.pack("<IQ", elem_type, len(packed_elems))
        + b"".join(packed_elems)
    )


def main() -> None:
    kvs = [
        kv_string("general.architecture", "dinov2"),
        kv_scalar("general.alignment", 4, "<I", ALIGN),  # UINT32, non-default
        kv_scalar("hidden_size", 4, "<I", 64),  # UINT32
        kv_scalar("eps", 6, "<f", 1e-6),  # FLOAT32
        kv_scalar("has_registers", 7, "<?", True),  # BOOL
        kv_scalar("big_offset", 11, "<q", -12345678901),  # INT64
        kv_array("ids", 5, [struct.pack("<i", v) for v in (-1, 0, 7)]),  # INT32[]
        kv_array("labels", 8, [s("tench"), s("goldfish")]),  # STRING[]
        kv_array("scales", 6, [struct.pack("<f", v) for v in (0.5, 2.0)]),
    ]

    # tensor payloads ------------------------------------------------------
    # a.bias: F32 (3,) — odd byte length forces inter-tensor padding
    a = struct.pack("<3f", 0.5, -1.25, 3.0)
    # b.weight: F16 (4, 32) — value i/16 at flat index i (f16-exact)
    import numpy as np  # noqa: PLC0415 — only for f16 encoding of the payload

    b = (np.arange(128, dtype=np.float16) / np.float16(16.0)).tobytes()
    # c.weight: Q4_0 (2, 32) — one ggml block per row: f16 scale d then 16
    # nibble-packed bytes (element j lo nibble, element j+16 hi nibble),
    # dequant = (q - 8) * d
    c = b""
    for d, base in ((1.0, 0), (0.25, 1)):
        qs = bytes(((base + j) % 16) | ((((base + j) * 3) % 16) << 4) for j in range(16))
        c += np.float16(d).tobytes() + qs

    tensors = [
        ("a.bias", (3,), 0, a),  # F32
        ("b.weight", (32, 4), 1, b),  # F16, ne fastest-first = (32, 4)
        ("c.weight", (32, 2), 2, c),  # Q4_0, blocks along ne[0]=32
    ]

    # tensor-info section: name | n_dims u32 | ne u64[] | ggml_type u32 | offset u64
    infos, data = [], b""
    for name, ne, gtype, payload in tensors:
        pad = (-len(data)) % ALIGN
        data += b"\x00" * pad
        infos.append(
            s(name)
            + struct.pack("<I", len(ne))
            + struct.pack(f"<{len(ne)}Q", *ne)
            + struct.pack("<IQ", gtype, len(data))
        )
        data += payload

    head = struct.pack("<4sIQQ", b"GGUF", 3, len(tensors), len(kvs))
    head += b"".join(kvs) + b"".join(infos)
    head += b"\x00" * ((-len(head)) % ALIGN)  # pad to data-section alignment
    OUT.write_bytes(head + data)
    print(f"wrote {OUT} ({len(head) + len(data)} bytes)")


if __name__ == "__main__":
    main()

"""AOT deployment artifacts: serialize the traced+lowered forward to disk.

The reference rebuilds its ggml compute graph from the model-building C++ on
every predict call (`/root/reference/dinov2.cpp:900-910`); the TPU analog of
that per-process cost is Python tracing + XLA lowering at startup. This module
pays it ONCE, offline: `export_forward` traces the jitted forward at a fixed
(batch, height, width) bucket and serializes the lowered StableHLO — plus a
self-describing JSON header (model config, parity/numerics options, shapes,
jax version) — into a single artifact file. A serving host then
`load_artifact(path)`s and calls it with the weight pytree; none of the
model-building Python runs at load, and shape/dtype contracts are enforced by
the serialized calling convention.

Cross-platform by default: artifacts are lowered for BOTH "tpu" and "cpu"
(`jax.export` multi-platform lowering), so one artifact exported on a CPU-only
build box runs unchanged on the TPU serving fleet (and its numerics can be
smoke-checked on CPU). The backend's machine-code compile still happens at
load time — that step is per-chip-generation and is covered by the persistent
XLA compilation cache (utils/cache.py) — what the artifact removes is the
Python/tracing/lowering half of cold start, and the need to ship model code.

Format: b"DAOT" magic, u8 version, u32 header length, UTF-8 JSON header,
raw `jax.export` blob. The header is readable with `aot_info(path)` without
touching jax at all (deployment tooling can inventory artifacts cheaply).
"""

from __future__ import annotations

import json
import struct
from dataclasses import asdict
from pathlib import Path
from typing import Any

_MAGIC = b"DAOT"
_VERSION = 1


def _opts_meta(opts) -> dict:
    d = asdict(opts)
    d["compute_dtype"] = str(getattr(opts.compute_dtype, "__name__", opts.compute_dtype))
    return d


_SERIALIZATION_REGISTERED = False


def _register_serializations() -> None:
    """Make custom pytree nodes serializable by jax.export (idempotent).

    QuantLinear (models/params.py) is a registered pytree node, but
    jax.export additionally needs a stable serialized name + auxdata codec to
    embed the calling convention — required for fused-quant artifacts, where
    the packed uint8 code planes and f32 scales are the weight leaves."""
    global _SERIALIZATION_REGISTERED
    if _SERIALIZATION_REGISTERED:
        return
    from jax import export as jexport

    from dinov2_tpu.models.params import QuantLinear

    jexport.register_pytree_node_serialization(
        QuantLinear,
        serialized_name="dinov2_tpu.models.params.QuantLinear",
        serialize_auxdata=lambda aux: json.dumps(
            [aux[0], list(aux[1]), aux[2]]
        ).encode("utf-8"),
        deserialize_auxdata=lambda b: (
            (lambda v: (v[0], tuple(v[1]), v[2]))(json.loads(b.decode("utf-8")))
        ),
    )
    _SERIALIZATION_REGISTERED = True


def export_forward(
    params,
    config,
    opts,
    batch: int,
    height: int,
    width: int,
    classify: bool = True,
    platforms: tuple[str, ...] = ("tpu", "cpu"),
    extra_meta: dict | None = None,
) -> bytes:
    """Trace + lower `models.vit.forward` at one static shape bucket and
    return the serialized artifact bytes.

    `params` may be the real weight pytree or a matching pytree of
    `jax.ShapeDtypeStruct`s — only shapes/dtypes are consumed; weights are
    NOT embedded (they stay in the GGUF, loaded independently at serving
    time), so artifacts are small (~100 KB-1 MB of StableHLO, not model-sized).
    """
    import jax
    from jax import export as jexport

    from dinov2_tpu.models.vit import forward

    _register_serializations()

    pshape = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params
    )
    xshape = jax.ShapeDtypeStruct((batch, height, width, 3), jax.numpy.float32)

    def fn(p, x):
        return forward(p, x, config, opts, classify=classify)

    exp = jexport.export(jax.jit(fn), platforms=tuple(platforms))(pshape, xshape)
    blob = exp.serialize()

    header = {
        "kind": "dinov2_tpu.forward",
        "model": {
            k: v for k, v in asdict(config).items() if not k.startswith("_")
        },
        "opts": _opts_meta(opts),
        "classify": classify,
        "input": {"batch": batch, "height": height, "width": width, "channels": 3},
        "platforms": list(platforms),
        "jax_version": jax.__version__,
    }
    if extra_meta:
        header.update(extra_meta)
    hbytes = json.dumps(header, sort_keys=True).encode("utf-8")
    return _MAGIC + struct.pack("<BI", _VERSION, len(hbytes)) + hbytes + blob


def save_artifact(path: str | Path, data: bytes) -> None:
    Path(path).write_bytes(data)


def _parse_header(raw: bytes, name: str) -> tuple[dict, int]:
    """(header dict, offset of the jax.export blob) from artifact bytes."""
    if raw[:4] != _MAGIC:
        raise ValueError(f"{name}: not a dinov2-tpu AOT artifact (bad magic)")
    if len(raw) < 9:
        raise ValueError(f"{name}: truncated artifact (header prefix cut short)")
    version, hlen = struct.unpack_from("<BI", raw, 4)
    if version != _VERSION:
        raise ValueError(f"{name}: unsupported artifact version {version}")
    if len(raw) < 9 + hlen:
        raise ValueError(f"{name}: truncated artifact (header cut short)")
    return json.loads(raw[9 : 9 + hlen].decode("utf-8")), 9 + hlen


def aot_info(path: str | Path) -> dict:
    """Read an artifact's JSON header without importing jax (cheap inventory)."""
    return _parse_header(Path(path).read_bytes(), str(path))[0]


class AotForward:
    """A loaded artifact: `meta` (the JSON header) + `__call__(params, x)`.

    Calls go through the serialized calling convention — mismatched shapes,
    dtypes, or pytree structure raise at call time with jax.export's
    contract errors rather than silently retracing (there is nothing to
    retrace: the artifact is one fixed program)."""

    def __init__(self, meta: dict, exported):
        self.meta = meta
        self._exported = exported

    def __call__(self, params, x):
        return self._exported.call(params, x)


def load_artifact(path: str | Path) -> AotForward:
    from jax import export as jexport

    _register_serializations()
    raw = Path(path).read_bytes()
    meta, blob_off = _parse_header(raw, str(path))
    return AotForward(meta, jexport.deserialize(raw[blob_off:]))

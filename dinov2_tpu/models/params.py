"""GGUF -> JAX parameter pytree.

Maps the reference tensor naming (see /root/reference/dinov2.cpp:629-821 for every
`model.tensors.at(...)` site) into a functional, batch-first pytree. Encoder layers
are STACKED along a leading axis so the forward pass runs as one `lax.scan` — one
compiled layer body regardless of depth (compile time and HLO size stay flat from
ViT-S/12-layer to ViT-g/40-layer).

Linear kernels are stored (in, out) so the forward is `x @ W + b` (MXU-friendly,
no transposes in the hot path). The GGUF/torch layout is (out, in); we transpose
once at load.

Quantized checkpoints load in one of two modes:
  - "dequant": decode blocks to `dtype` at load (fastest steady-state; weights live
    in HBM at bf16).
  - "fused": keep ggml blocks packed; matmuls run through the Pallas fused
    dequant-matmul kernel (minimum HBM footprint, ~4-8x smaller weights).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from dinov2_tpu.io.gguf import GGMLType, GGUFReader, GGUFTensor, QUANTIZED_TYPES
from dinov2_tpu.models.config import DinoConfig, id2label_from_kv

@jax.tree_util.register_pytree_node_class
@dataclass
class QuantLinear:
    """A ggml-quantized linear weight in TPU-kernel layout (structure-of-arrays).

    Two on-device layouts (ops/pallas_qmatmul.py consumes both):

    packed=False ("int8 SoA", all five formats):
      codes: (out, in) int8, zero-point pre-subtracted for the symmetric
             formats, so dequant is `codes*d` (+ `m` for q4_1/q5_1)

    packed=True ("true 4/5-bit", q4_0/q4_1/q5_0/q5_1): codes are nibble-packed
      (out, in//2) uint8 in NATURAL-ORDER planes — byte j holds weight element
      j (lo nibble) and element j+in/2 (hi nibble). ggml's block-local packing
      (elements 32b+j / 32b+16+j per byte) is repacked to this layout once at
      load; the kernel then runs two half-K GEMMs over the planes with the
      activation's K axis UNTOUCHED (round 1 permuted the activation with a
      jnp.take per matmul — an HBM gather that cost ~1.3 ms/layer at the ViT-B
      b64 shape). For the q5 formats the per-element 5th bits travel as two
      uint8 planes qh_lo/qh_hi (out, in//16), one byte per 8 consecutive
      lanes of each plane — values ≤ 255 broadcast EXACTLY through a
      default-precision bf16 indicator matmul in-kernel (u16 words would need
      precision=HIGHEST, 6x the MXU passes), then a vector shift extracts
      each lane's bit. HBM cost: 0.56-0.75 B/weight, ~the ggml blocks.

    d: (out, in//32) float32 per-block scales
    m: (out, in//32) float32 per-block mins or None
    """

    codes: jnp.ndarray
    d: jnp.ndarray
    m: jnp.ndarray | None
    ggml_type: int  # static
    shape: tuple[int, int]  # static (out, in)
    packed: bool = False  # static
    qh_lo: jnp.ndarray | None = None  # (out, in//16) uint8, q5 packed only
    qh_hi: jnp.ndarray | None = None

    def tree_flatten(self):
        children = (self.codes, self.d, self.m, self.qh_lo, self.qh_hi)
        aux = (self.ggml_type, self.shape, self.packed)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        codes, d, m, qh_lo, qh_hi = children
        return cls(
            codes=codes, d=d, m=m, ggml_type=aux[0], shape=aux[1], packed=aux[2],
            qh_lo=qh_lo, qh_hi=qh_hi,
        )


@jax.tree_util.register_pytree_node_class
@dataclass
class Int8Linear:
    """A W8A8 serving-mode linear weight: per-output-row symmetric int8.

    TPU-native quantization with NO reference analog: the MXU has a native
    s8xs8->s32 path (2x the bf16 rate on v5e), so this is the one weight form
    whose matmul can be FASTER than dense bf16 — ggml's block formats cannot
    feed it because their scales vary along the contraction axis (a per-32
    rescale inside the K-sum would need K/32 separate GEMMs). Built at LOAD
    time from any checkpoint ftype (fp16/fp32 or any ggml block format) by
    per-row absmax requantization — it is a runtime mode (quant_mode="int8"),
    not a GGUF on-disk format, so checkpoint interop is untouched.

    codes: (out, in) int8, symmetric (no zero-point)
    s:     (out,) float32 per-row scale; dense w ~= codes * s[:, None]

    Activations are quantized dynamically per token row at matmul time
    (ops/qmatmul.py::int8_matmul). int8_per_row is the dispatch marker —
    deliberately NOT `ggml_type`, so this container can never be misrouted
    into the ggml block-layout kernels (pallas_qmatmul, fused_quant_attention,
    tp_fused)."""

    codes: jnp.ndarray
    s: jnp.ndarray
    shape: tuple[int, int]  # static (out, in)

    int8_per_row = True  # class-level dispatch marker

    def tree_flatten(self):
        return (self.codes, self.s), (self.shape,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(codes=children[0], s=children[1], shape=aux[0])


def _int8_from_tensor(t: GGUFTensor) -> Int8Linear:
    """Per-row symmetric int8 requantization of a 2D weight (host-side, once
    at load). Sources: fp16/fp32 directly; ggml block formats via their exact
    dequantization (quant/blocks.py) — so an int8 model derived from a q8_0
    file sees the same dense values the dequant path would."""
    arr = np.asarray(t.as_numpy(), dtype=np.float32)
    if arr.ndim != 2:
        raise ValueError(f"int8 mode needs a 2D weight, got {arr.shape}")
    if not np.isfinite(arr).all():
        raise ValueError("int8 requantization refuses non-finite weights")
    s = np.abs(arr).max(axis=1) / 127.0
    s = np.maximum(s, 1e-12)
    codes = np.clip(np.rint(arr / s[:, None]), -127, 127).astype(np.int8)
    return Int8Linear(
        codes=jnp.asarray(codes),
        s=jnp.asarray(s, dtype=jnp.float32),
        shape=(int(arr.shape[0]), int(arr.shape[1])),
    )


# All four sub-8-bit formats run fully packed (see ops/pallas_qmatmul.py).
# Round 1's q5_1 Mosaic crash (5th-bit planes + affine blocksums at k2 >= 1536
# with bn > 128) no longer reproduces with the round-2 kernel (natural-order
# planes, no activation permutation, fused epilogue) — verified compile + run
# at the exact previously-crashing shape (m=16448, n=768, k=3072) on v5e.
_PACKED_TYPES = (GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1)


def decode_packed_planes(codes, qh_lo, qh_hi, zero: int, xp):
    """Decode natural-order nibble planes (+ optional u8 5th-bit words) back to
    integer codes: (..., out, k/2) uint8 -> (..., out, k) int32, zero-point
    subtracted when `zero` != 0.

    THE single source of truth for the packed layout (inverse of the packing
    below): byte j = element j (lo nibble) | element j+k/2 (hi nibble); qh
    word g covers plane lanes [8g, 8g+8). `xp` is numpy (host, e.g.
    parallel/tp_fused.py row-split conversion) or jax.numpy (on-device,
    ops/qmatmul.py::dequant_weight)."""
    lo = (codes & 0xF).astype(xp.int32)
    hi = (codes >> 4).astype(xp.int32)
    if qh_lo is not None:
        shifts = xp.arange(8, dtype=xp.uint32)

        def bits(words):
            b = (words.astype(xp.uint32)[..., None] >> shifts) & 1
            return b.reshape(*words.shape[:-1], words.shape[-1] * 8).astype(
                xp.int32
            )

        lo = lo | (bits(qh_lo) << 4)
        hi = hi | (bits(qh_hi) << 4)
    q = xp.concatenate([lo, hi], axis=-1)
    if zero:
        q = q - zero
    return q


def _natural_plane_words(bits: np.ndarray) -> np.ndarray:
    """(out, half_k) 0/1 bits -> (out, half_k//8) uint8, one byte per 8
    consecutive lanes, bit i of word g = bits[:, 8g+i].

    u8 (not u16) on purpose: values <= 255 are EXACT in bfloat16, so the
    in-kernel indicator-matmul broadcast runs at default MXU precision —
    u16 words needed precision=HIGHEST (6-pass f32 emulation), the dominant
    cost of the q5 fused path (docs/TPU_NOTES.md round-2 q5 numbers)."""
    o, hk = bits.shape
    w = bits.astype(np.uint32).reshape(o, hk // 8, 8)
    return (w << np.arange(8, dtype=np.uint32)).sum(axis=2).astype(np.uint8)


def _soa_from_blocks(t: GGUFTensor) -> QuantLinear:
    from dinov2_tpu.quant.blocks import block_dtype, unpack_codes

    import os

    out_dim, in_dim = t.shape
    gt = GGMLType(t.ggml_type)
    packed_types = _PACKED_TYPES
    if os.environ.get("DINOV2_TPU_Q5_LAYOUT", "packed") == "soa":
        # legacy knob: in round 2 the q5 PACKED kernels paid 15-38% for the
        # in-kernel 5th-bit expansion + Mosaic block caps, and int8-SoA q5
        # (~1.06 B/weight) ran at q8_0 speed. Round 3's transient-dequant
        # routing erased the gap (q5 within 0.5% of q4_0 at 0.69-0.75
        # B/weight, docs/BENCH_TABLES.md) — packed stays the default; the
        # knob remains for forced-Pallas (DINOV2_TPU_QUANT_BACKEND=pallas)
        # experiments where the old trade-off still applies
        packed_types = (GGMLType.Q4_0, GGMLType.Q4_1)
    if gt in packed_types:
        # repack ggml's block-local nibbles (byte j of block b = elements
        # 32b+j lo / 32b+16+j hi) into natural-order planes (byte j = elements
        # j lo / j+in/2 hi): the matmul kernel then needs NO activation
        # permutation. Scales/mins lift out as f32; q5 5th bits become
        # per-plane u8 words (u8, not u16 — see _natural_plane_words).
        # One-time host work at load.
        nb = in_dim // 32
        blocks = t.data.view(np.uint8).view(block_dtype(gt)).reshape(out_dim, nb)
        d = jnp.asarray(blocks["d"].astype(np.float32))
        m = (
            jnp.asarray(blocks["m"].astype(np.float32))
            if "m" in blocks.dtype.names
            else None
        )
        qs = blocks["qs"]  # (out, nb, 16)
        elems = np.empty((out_dim, nb, 32), dtype=np.uint8)
        elems[..., :16] = qs & 0xF
        elems[..., 16:] = qs >> 4
        elems = elems.reshape(out_dim, in_dim)
        half = in_dim // 2
        codes = jnp.asarray(elems[:, :half] | (elems[:, half:] << 4))
        qh_lo = qh_hi = None
        if "qh" in blocks.dtype.names:
            qh = blocks["qh"].astype(np.uint32)  # bit r = 5th bit of element 32b+r
            bits = (
                (qh[..., None] >> np.arange(32, dtype=np.uint32)) & 1
            ).reshape(out_dim, in_dim).astype(np.uint8)
            qh_lo = jnp.asarray(_natural_plane_words(bits[:, :half]))
            qh_hi = jnp.asarray(_natural_plane_words(bits[:, half:]))
        return QuantLinear(
            codes=codes, d=d, m=m, ggml_type=int(gt), shape=(out_dim, in_dim),
            packed=True, qh_lo=qh_lo, qh_hi=qh_hi,
        )
    codes, d, m = unpack_codes(t.data, gt, t.shape)
    return QuantLinear(
        codes=jnp.asarray(codes),
        d=jnp.asarray(d),
        m=jnp.asarray(m) if m is not None else None,
        ggml_type=int(gt),
        shape=(out_dim, in_dim),
    )


@dataclass
class LoadedModel:
    config: DinoConfig
    params: dict[str, Any]
    id2label: dict[int, str]
    has_classifier: bool
    quantized: bool


def _dense(t: GGUFTensor, dtype) -> jnp.ndarray:
    return jnp.asarray(t.as_numpy(), dtype=dtype)


def _upload_f16(t: GGUFTensor, dtype) -> jnp.ndarray:
    """Upload an F16 tensor's raw mmap bytes directly (no host fp16->f32
    expansion, half the host->device transfer) and cast on device. Falls back
    to the host path for non-F16 types or f32 targets."""
    if t.ggml_type != GGMLType.F16 or dtype == jnp.float32:
        return jnp.asarray(t.as_numpy(), dtype=dtype)
    raw = t.data.view("<f2").reshape(t.shape)
    return jnp.asarray(raw).astype(dtype)


def _linear(
    tensors: dict[str, GGUFTensor], name: str, dtype, quant_mode: str
) -> dict[str, Any]:
    """Load `{name}.weight` (+`.bias`) as an (in, out) kernel dict."""
    w = tensors[f"{name}.weight"]
    b = tensors.get(f"{name}.bias")
    out: dict[str, Any] = {}
    if quant_mode == "int8":
        out["kernel"] = _int8_from_tensor(w)  # kept (out, in); matmul transposes
    elif w.ggml_type in QUANTIZED_TYPES and quant_mode == "fused":
        out["kernel"] = _soa_from_blocks(w)  # kept (out, in); kernel transposes
    elif w.ggml_type == GGMLType.F16 and dtype != jnp.float32:
        # transpose on device too: the host-side .T would force an f16 copy
        out["kernel"] = _upload_f16(w, dtype).T
    else:
        out["kernel"] = jnp.asarray(w.as_numpy().T, dtype=dtype)
    if b is not None:
        out["bias"] = _dense(b, jnp.float32)
    return out


def _stack(dicts: list[dict[str, Any]]) -> dict[str, Any]:
    """Stack a list of identically-structured pytrees along a new leading axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *dicts)


def init_params(
    config: DinoConfig, seed: int = 0, dtype=jnp.bfloat16, scale: float = 0.02
) -> dict[str, Any]:
    """Random-init a parameter pytree with the exact load_params structure
    (used by benchmarks, the graft entry, and training-from-scratch; per-op speed
    does not depend on weight values)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    d = config.hidden_size
    p = config.patch_size
    inter = int(d * config.mlp_ratio)
    sh = config.swiglu_hidden_dim
    n_pos = config.num_model_patches + 1

    def w(*shape, f32=False):
        return jnp.asarray(
            rng.standard_normal(shape) * scale, dtype=jnp.float32 if f32 else dtype
        )

    def ones(*shape):
        return jnp.ones(shape, dtype=jnp.float32)

    def zeros(*shape):
        return jnp.zeros(shape, dtype=jnp.float32)

    params: dict[str, Any] = {
        "patch_embed": {"kernel": w(p * p * 3, d), "bias": zeros(d)},
        "cls_token": w(d, f32=True),
        "pos_embed": w(n_pos, d, f32=True),
        "final_norm": {"scale": ones(d), "bias": zeros(d)},
    }
    if config.num_register_tokens > 0:
        params["register_tokens"] = w(config.num_register_tokens, d, f32=True)

    def layer(_):
        mlp = (
            {"win": {"kernel": w(d, 2 * sh), "bias": zeros(2 * sh)},
             "wout": {"kernel": w(sh, d), "bias": zeros(d)}}
            if config.swiglu
            else {"fc1": {"kernel": w(d, inter), "bias": zeros(inter)},
                  "fc2": {"kernel": w(inter, d), "bias": zeros(d)}}
        )
        return {
            "norm1": {"scale": ones(d), "bias": zeros(d)},
            "qkv": {"kernel": w(d, 3 * d), "bias": zeros(3 * d)},
            "proj": {"kernel": w(d, d), "bias": zeros(d)},
            "ls1": ones(d),
            "norm2": {"scale": ones(d), "bias": zeros(d)},
            "mlp": mlp,
            "ls2": ones(d),
        }

    params["layers"] = _stack([layer(i) for i in range(config.num_hidden_layers)])
    if config.num_classes > 0:
        params["classifier"] = {
            "kernel": w(2 * d, config.num_classes),
            "bias": zeros(config.num_classes),
        }
    return params


def load_params(
    path: str | Path,
    dtype=jnp.bfloat16,
    quant_mode: str = "dequant",
) -> LoadedModel:
    """Load a GGUF checkpoint (reference- or self-produced) into a pytree."""
    reader = GGUFReader(path)
    kv, tensors = reader.kv, reader.tensors
    config = DinoConfig.from_gguf_kv(kv)
    id2label = id2label_from_kv(kv, config.num_classes)

    ftype = GGMLType(config.ftype)
    quantized = ftype in QUANTIZED_TYPES
    if not quantized and quant_mode == "fused":
        # "fused" needs ggml blocks to keep packed; "int8" requantizes from
        # ANY source ftype (it is a runtime mode, not an on-disk format)
        quant_mode = "dequant"

    p: dict[str, Any] = {}

    # Patch embedding: conv weight (D, C, P, P) -> (P*P*C, D) matmul kernel, so a
    # patch flattened (py, px, c) hits the MXU as one (P*P*C)-long contraction.
    # (ggml_conv_2d_sk_p0 equivalent, /root/reference/dinov2.cpp:636-643.)
    wp = tensors["embeddings.patch_embeddings.projection.weight"].as_numpy()
    d_model, c_in, ph, pw = wp.shape
    p["patch_embed"] = {
        "kernel": jnp.asarray(
            wp.transpose(2, 3, 1, 0).reshape(ph * pw * c_in, d_model), dtype=dtype
        ),
        "bias": jnp.asarray(
            tensors["embeddings.patch_embeddings.projection.bias"]
            .as_numpy()
            .reshape(-1),
            dtype=jnp.float32,
        ),
    }

    p["cls_token"] = jnp.asarray(
        tensors["embeddings.cls_token"].as_numpy().reshape(-1), dtype=jnp.float32
    )
    p["pos_embed"] = jnp.asarray(
        tensors["embeddings.position_embeddings"]
        .as_numpy()
        .reshape(-1, config.hidden_size),
        dtype=jnp.float32,
    )
    if config.num_register_tokens > 0:
        p["register_tokens"] = jnp.asarray(
            tensors["embeddings.register_tokens"]
            .as_numpy()
            .reshape(-1, config.hidden_size),
            dtype=jnp.float32,
        )

    layers = []
    swiglu = config.swiglu or "encoder.layer.0.mlp.weights_in.weight" in tensors
    for i in range(config.num_hidden_layers):
        base = f"encoder.layer.{i}"
        layer: dict[str, Any] = {
            "norm1": {
                "scale": _dense(tensors[f"{base}.norm1.weight"], jnp.float32),
                "bias": _dense(tensors[f"{base}.norm1.bias"], jnp.float32),
            },
            "qkv": _linear(tensors, f"{base}.attention.attention.qkv", dtype, quant_mode),
            "proj": _linear(tensors, f"{base}.attention.output.dense", dtype, quant_mode),
            "ls1": _dense(tensors[f"{base}.layer_scale1.lambda1"], jnp.float32),
            "norm2": {
                "scale": _dense(tensors[f"{base}.norm2.weight"], jnp.float32),
                "bias": _dense(tensors[f"{base}.norm2.bias"], jnp.float32),
            },
            "ls2": _dense(tensors[f"{base}.layer_scale2.lambda1"], jnp.float32),
        }
        if swiglu:
            layer["mlp"] = {
                "win": _linear(tensors, f"{base}.mlp.weights_in", dtype, quant_mode),
                "wout": _linear(tensors, f"{base}.mlp.weights_out", dtype, quant_mode),
            }
        else:
            layer["mlp"] = {
                "fc1": _linear(tensors, f"{base}.mlp.fc1", dtype, quant_mode),
                "fc2": _linear(tensors, f"{base}.mlp.fc2", dtype, quant_mode),
            }
        layers.append(layer)
    p["layers"] = _stack(layers)

    p["final_norm"] = {
        "scale": _dense(tensors["layernorm.weight"], jnp.float32),
        "bias": _dense(tensors["layernorm.bias"], jnp.float32),
    }

    has_classifier = "classifier.weight" in tensors
    if has_classifier:
        p["classifier"] = _linear(tensors, "classifier", dtype, quant_mode)

    if swiglu:
        updates: dict[str, Any] = {}
        if config.use_swiglu_ffn is None:
            updates["use_swiglu_ffn"] = True
        if config.swiglu_hidden is None:
            # infer the real FFN hidden size from the weights so checkpoints
            # that deviate from the HF sizing rule (swiglu_hidden_dim's
            # formula) round-trip through init_params/write_synthetic_gguf
            # with the true GEMM shapes
            updates["swiglu_hidden"] = (
                tensors["encoder.layer.0.mlp.weights_in.weight"].shape[0] // 2
            )
        if updates:
            config = DinoConfig(**{**config.__dict__, **updates})

    reader.close()
    return LoadedModel(
        config=config,
        params=p,
        id2label=id2label,
        has_classifier=has_classifier,
        quantized=quantized and quant_mode == "fused",
    )

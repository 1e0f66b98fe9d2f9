"""Quantized linear apply: on-device dequant + matmul.

Two paths:
  - "xla": unpack ggml blocks with jnp bit ops, cast to compute dtype, matmul.
    Simple, correct everywhere (CPU tests + TPU); XLA fuses the unpack into the
    weight read but does materialize the dequantized tile.
  - "pallas": fused dequant-matmul kernel (dinov2_tpu.ops.pallas_qmatmul) that
    dequantizes ggml blocks in VMEM right before feeding the MXU — weights stay
    packed in HBM (the TPU analog of ggml's quantized CPU kernels, SURVEY.md C23).

Reference behavior being reproduced: quantized inference where 2D `.*weight`
tensors are ggml blocks and everything else stays fp16/fp32
(/root/reference/dinov2.cpp:227-236, 355-453).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp



def dequant_weight(ql, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Decode a QuantLinear to a dense (out, in) weight on device:
    w = codes*d (+ m for the min/offset formats). Handles both the int8-SoA
    layout and the packed-nibble layout (models/params.py::QuantLinear)."""
    out_dim, in_dim = ql.shape
    nb = in_dim // 32
    if getattr(ql, "packed", False):
        qs = ql.codes.reshape(out_dim, nb, 16)
        lo = (qs & 0xF).astype(jnp.int32)
        hi = (qs >> 4).astype(jnp.int32)
        if ql.qh_lo is not None:  # q5 formats: merge the 5th-bit planes
            shifts = jnp.arange(16, dtype=jnp.uint32)
            bits_lo = ((ql.qh_lo.astype(jnp.uint32)[..., None] >> shifts) & 1)
            bits_hi = ((ql.qh_hi.astype(jnp.uint32)[..., None] >> shifts) & 1)
            lo = lo | (bits_lo << 4).astype(jnp.int32)
            hi = hi | (bits_hi << 4).astype(jnp.int32)
        q = jnp.concatenate([lo, hi], axis=-1).astype(jnp.float32)
        if ql.m is None:  # symmetric zero points
            q = q - (16.0 if ql.qh_lo is not None else 8.0)
    else:
        q = ql.codes.astype(jnp.float32).reshape(out_dim, nb, 32)
    w = q * ql.d[..., None]
    if ql.m is not None:
        w = w + ql.m[..., None]
    return w.reshape(out_dim, in_dim).astype(dtype)


def quant_matmul(x: jnp.ndarray, ql, backend: str = "auto") -> jnp.ndarray:
    """y = x @ W^T where W is a packed (out, in) QuantLinear."""
    if backend == "pallas" or (
        backend == "auto" and jax.default_backend() == "tpu"
    ):
        try:
            from dinov2_tpu.ops.pallas_qmatmul import quant_matmul_pallas

            return quant_matmul_pallas(x, ql)
        except (ImportError, NotImplementedError):
            pass
    w = dequant_weight(ql, dtype=x.dtype)
    return jnp.dot(x, w.T, preferred_element_type=jnp.float32).astype(x.dtype)


def apply_linear(x: jnp.ndarray, layer: dict, backend: str = "auto") -> jnp.ndarray:
    """Apply a linear layer whose kernel is either dense (in, out) or QuantLinear.

    The matmul accumulates f32 on the MXU regardless of the requested output
    dtype; emitting the compute dtype directly lets XLA fuse the bias add into
    the matmul epilogue (a separate f32 add+convert pass costs ~13% of the
    whole ViT forward — measured via jax.profiler, docs/TPU_NOTES.md)."""
    kernel = layer["kernel"]
    if hasattr(kernel, "ggml_type"):  # QuantLinear
        y = quant_matmul(x, kernel, backend=backend)
    else:
        y = jnp.dot(x, kernel, preferred_element_type=x.dtype)
    if "bias" in layer:
        y = y + layer["bias"].astype(x.dtype)
    return y

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

import os

import jax
import jax.numpy as jnp


def _resolve_backend(backend: str) -> str:
    """Resolve the "auto" quantized-matmul backend: the env override
    DINOV2_TPU_QUANT_BACKEND ("pallas" | "xla") wins (tests use it to force the
    interpret-mode Pallas kernel on CPU), else pallas on TPU, xla elsewhere.
    Read at trace time — each jit cache entry bakes the choice in."""
    if backend != "auto":
        return backend
    env = os.environ.get("DINOV2_TPU_QUANT_BACKEND")
    if env in ("pallas", "xla"):
        return env
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def dequant_weight(ql, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Decode a QuantLinear to a dense (out, in) weight on device:
    w = codes*d (+ m for the min/offset formats). Handles both the int8-SoA
    layout and the packed-nibble layout (models/params.py::QuantLinear).
    Dims come from the arrays (shard_map passes per-device shards whose
    static ql.shape aux still holds the global shape)."""
    out_dim = ql.codes.shape[0]
    in_dim = ql.codes.shape[1] * (2 if getattr(ql, "packed", False) else 1)
    nb = in_dim // 32
    if getattr(ql, "packed", False):
        from dinov2_tpu.models.params import decode_packed_planes

        zero = 0 if ql.m is not None else (16 if ql.qh_lo is not None else 8)
        q = decode_packed_planes(ql.codes, ql.qh_lo, ql.qh_hi, zero, jnp)
        q = q.astype(jnp.float32).reshape(out_dim, nb, 32)
    else:
        q = ql.codes.astype(jnp.float32).reshape(out_dim, nb, 32)
    w = q * ql.d[..., None]
    if ql.m is not None:
        w = w + ql.m[..., None]
    return w.reshape(out_dim, in_dim).astype(dtype)


def _apply_activation(y: jnp.ndarray, activation: str | None) -> jnp.ndarray:
    if activation == "gelu_tanh":
        return jax.nn.gelu(y, approximate=True)
    if activation == "gelu_erf":
        return jax.nn.gelu(y, approximate=False)
    if activation is not None:
        raise ValueError(f"unknown activation {activation!r}")
    return y


def quant_matmul(
    x: jnp.ndarray,
    ql,
    backend: str = "auto",
    bias: jnp.ndarray | None = None,
    activation: str | None = None,
) -> jnp.ndarray:
    """y = x @ W^T (+ bias, + activation) where W is a (out, in) QuantLinear.
    THE quantized-matmul dispatch point: Pallas fused kernel (bias/activation
    in the epilogue) when available, else XLA dequant-then-matmul."""
    if _resolve_backend(backend) == "pallas":
        try:
            from dinov2_tpu.ops.pallas_qmatmul import quant_matmul_pallas
        except (ImportError, NotImplementedError):
            pass
        else:
            return quant_matmul_pallas(x, ql, bias=bias, activation=activation)
    w = dequant_weight(ql, dtype=x.dtype)
    y = jnp.dot(x, w.T, preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return _apply_activation(y, activation)


def apply_linear(
    x: jnp.ndarray,
    layer: dict,
    backend: str = "auto",
    activation: str | None = None,
) -> jnp.ndarray:
    """Apply a linear layer whose kernel is either dense (in, out) or QuantLinear,
    optionally followed by an activation (None | "gelu_tanh" | "gelu_erf").

    The matmul accumulates f32 on the MXU regardless of the requested output
    dtype; emitting the compute dtype directly lets XLA fuse the bias add into
    the matmul epilogue (a separate f32 add+convert pass costs ~13% of the
    whole ViT forward — measured via jax.profiler, docs/TPU_NOTES.md). For the
    Pallas quantized path, bias AND activation ride in the kernel epilogue —
    otherwise each quantized matmul pays a separate XLA elementwise pass over
    the (M, N) output (the round-1 fused-quant large-batch gap)."""
    kernel = layer["kernel"]
    if hasattr(kernel, "ggml_type"):  # QuantLinear -> single dispatch point
        return quant_matmul(
            x, kernel, backend=backend,
            bias=layer.get("bias"), activation=activation,
        )
    y = jnp.dot(x, kernel, preferred_element_type=x.dtype)
    if "bias" in layer:
        y = y + layer["bias"].astype(x.dtype)
    return _apply_activation(y, activation)

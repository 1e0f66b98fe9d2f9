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
    """Resolve the quantized-matmul backend. An explicit argument wins, then
    the env override DINOV2_TPU_QUANT_BACKEND ("pallas" | "xla" — tests use
    it to force the interpret-mode Pallas kernels on CPU). "auto" resolves to
    "xla" on EVERY backend since round 3: per-call XLA dequant + dense matmul
    measured faster than the fused Pallas kernels at every shape on v5e,
    including their best conceivable case (giant b1 9.98 vs 10.17 ms; ViT-B
    b64 whole-model 26.6 -> 24.3 — docs/TPU_NOTES.md r3; in-kernel dequant
    serializes VPU work against the matmuls while the transient dense weight
    costs only a ~5-19 MB/layer HBM round-trip). The packed GGUF blocks stay
    the only persistent weight form in HBM either way. Read at trace time —
    each jit cache entry bakes the choice in."""
    if backend != "auto":
        return backend
    env = os.environ.get("DINOV2_TPU_QUANT_BACKEND")
    if env in ("pallas", "xla"):
        return env
    return "xla"


def dequant_weight(ql, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Decode a QuantLinear to a dense (out, in) weight on device:
    w = codes*d (+ m for the min/offset formats). Handles both the int8-SoA
    layout and the packed-nibble layout (models/params.py::QuantLinear), plus
    the per-row Int8Linear serving layout (codes * s[:, None] — the transient
    route that feeds int8 weights into the dense slab kernels).
    Dims come from the arrays (shard_map passes per-device shards whose
    static ql.shape aux still holds the global shape)."""
    if getattr(ql, "int8_per_row", False):
        return (ql.codes.astype(jnp.float32) * ql.s[:, None]).astype(dtype)
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


def gelu_tanh_f16(y: jnp.ndarray) -> jnp.ndarray:
    """ggml_gelu bit-parity: ggml evaluates tanh-GELU through an fp16 lookup
    table (vendored runtime, consumed at /root/reference/dinov2.cpp:566) —
    table[i] = f16(gelu_tanh_f32(f16_frombits(i))). Semantically that is
    f16(gelu_tanh(f16(x))): two cheap casts around the f32 op (they fuse into
    the elementwise chain under XLA). Closes the last ~1e-3/activation gap to
    the reference in parity="reference" mode (docs/PARITY.md)."""
    y16 = y.astype(jnp.float16)
    g = jax.nn.gelu(y16.astype(jnp.float32), approximate=True)
    return g.astype(jnp.float16).astype(y.dtype)


def gelu_tanh_f16_veltkamp(y: jnp.ndarray) -> jnp.ndarray:
    """Mosaic-safe emulation of gelu_tanh_f16 for Pallas kernel epilogues: the
    v5e Mosaic compiler has NO f16 casts (bf16->f16 raises NotImplementedError,
    f32->f16 crashes the remote compiler), so kernels round to the f16 grid
    with Veltkamp splits instead — c = v*(2^13+1); c - (c - v) is v rounded to
    24-13 = 11 significand bits, exactly f16's significand. Identical to the
    real-cast version everywhere except the f16-SUBNORMAL band (|v| < 6.1e-5,
    absolute deviation < ~3e-8) and round-to-even corner ties — both invisible
    at bf16 compute precision. Input rounding f16(x) is exact for bf16 inputs
    (8 significand bits <= 11) and Veltkamp-approximated for f32 inputs."""

    def round11(v):
        c = v * 8193.0
        return c - (c - v)

    v = y.astype(jnp.float32)
    if y.dtype != jnp.bfloat16:
        # f16(x) is exact for bf16 inputs (8 significand bits <= 11); the
        # input split only does work for f32 inputs — skip the 2 VPU passes
        v = round11(v)
    g = jax.nn.gelu(v, approximate=True)
    return round11(g).astype(y.dtype)


def apply_activation(y: jnp.ndarray, activation: str | None) -> jnp.ndarray:
    """The ONE home of activation-name dispatch — the XLA path here, the slab
    kernels (fused_attention._mlp_act) and the Pallas matmul epilogue
    (pallas_qmatmul._epilogue) all route through it, so a new activation
    lands on every path at once. Pure jnp, safe inside Pallas kernels."""
    if activation is None:
        return y
    if activation == "gelu_tanh":
        return jax.nn.gelu(y, approximate=True)
    if activation == "gelu_erf":
        return jax.nn.gelu(y, approximate=False)
    if activation == "gelu_tanh_f16":
        return gelu_tanh_f16(y)
    if activation == "gelu_tanh_f16_veltkamp":
        return gelu_tanh_f16_veltkamp(y)
    raise ValueError(f"unknown activation {activation!r}")


_apply_activation = apply_activation  # internal callers predate the rename


def quantize_rows_int8(x: jnp.ndarray):
    """Dynamic per-row symmetric int8 activation quantization: for each
    trailing-axis row, s = absmax/127 and codes = rint(x/s). |x/s| <= 127 by
    construction, so no clip is needed; all-zero rows hit the 1e-12 floor and
    produce zero codes. Returns (codes int8, scales f32 with keepdims)."""
    xf = x.astype(jnp.float32)
    ax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.maximum(ax, 1e-12) * (1.0 / 127.0)
    return jnp.round(xf / sx).astype(jnp.int8), sx


def int8_matmul(
    x: jnp.ndarray,
    il,
    bias: jnp.ndarray | None = None,
    activation: str | None = None,
) -> jnp.ndarray:
    """y = x @ W^T for a per-row Int8Linear: dynamic per-token activation
    quantization -> native s8xs8->s32 MXU matmul -> f32 rescale by the outer
    product of the two scale vectors. The int8 GEMM runs at ~2x the bf16 MXU
    rate on v5e (measured +21-43% at ViT GEMM shapes including the quantize
    and rescale passes — scripts/probe_int8.py); XLA fuses the quantize into
    the preceding elementwise chain and the rescale/bias/activation into the
    matmul epilogue."""
    x8, sx = quantize_rows_int8(x)
    acc = jax.lax.dot_general(
        x8, il.codes,
        (((x8.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * sx * il.s
    y = y.astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return _apply_activation(y, activation)


def quant_matmul(
    x: jnp.ndarray,
    ql,
    backend: str = "auto",
    bias: jnp.ndarray | None = None,
    activation: str | None = None,
) -> jnp.ndarray:
    """y = x @ W^T (+ bias, + activation) where W is a (out, in) QuantLinear.
    THE quantized-matmul dispatch point: "auto" = per-call XLA dequant +
    dense matmul (the measured-fastest route at every shape — see
    _resolve_backend); the fused Pallas kernels (bias/activation in the
    epilogue, weight traffic packed end-to-end) run when explicitly
    requested."""
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
    if getattr(kernel, "int8_per_row", False):  # Int8Linear -> W8A8 MXU path
        return int8_matmul(
            x, kernel, bias=layer.get("bias"), activation=activation
        )
    if hasattr(kernel, "ggml_type"):  # QuantLinear -> single dispatch point
        return quant_matmul(
            x, kernel, backend=backend,
            bias=layer.get("bias"), activation=activation,
        )
    y = jnp.dot(x, kernel, preferred_element_type=x.dtype)
    if "bias" in layer:
        y = y + layer["bias"].astype(x.dtype)
    return _apply_activation(y, activation)

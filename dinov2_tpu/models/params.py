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

jax.tree_util.register_pytree_node.__doc__  # keep linters quiet about jax import


@jax.tree_util.register_pytree_node_class
@dataclass
class QuantLinear:
    """A packed ggml-quantized linear weight, layout structure-of-arrays.

    qs: (out, in//2) uint8 packed nibbles (or (out, in) int8 for q8_0)
    d:  (out, in//32) float32 per-block scales
    m:  (out, in//32) float32 per-block mins (q4_1/q5_1) or None
    qh: (out, in//32) uint32 5th-bit planes (q5_0/q5_1) or None
    """

    qs: jnp.ndarray
    d: jnp.ndarray
    m: jnp.ndarray | None
    qh: jnp.ndarray | None
    ggml_type: int  # static
    shape: tuple[int, int]  # static (out, in)

    def tree_flatten(self):
        children = (self.qs, self.d, self.m, self.qh)
        aux = (self.ggml_type, self.shape)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        qs, d, m, qh = children
        return cls(qs=qs, d=d, m=m, qh=qh, ggml_type=aux[0], shape=aux[1])


def _soa_from_blocks(t: GGUFTensor) -> QuantLinear:
    from dinov2_tpu.quant.blocks import block_dtype

    out_dim, in_dim = t.shape
    blocks = t.data.view(np.uint8).view(block_dtype(GGMLType(t.ggml_type)))
    nb = in_dim // 32
    blocks = blocks.reshape(out_dim, nb)
    d = jnp.asarray(blocks["d"].astype(np.float32))
    m = (
        jnp.asarray(blocks["m"].astype(np.float32))
        if "m" in blocks.dtype.names
        else None
    )
    qh = (
        jnp.asarray(blocks["qh"].astype(np.uint32))
        if "qh" in blocks.dtype.names
        else None
    )
    qs_field = blocks["qs"]
    if t.ggml_type == GGMLType.Q8_0:
        qs = jnp.asarray(qs_field.reshape(out_dim, in_dim).view(np.int8))
    else:
        qs = jnp.asarray(qs_field.reshape(out_dim, in_dim // 2))
    return QuantLinear(
        qs=qs, d=d, m=m, qh=qh, ggml_type=int(t.ggml_type), shape=(out_dim, in_dim)
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


def _linear(
    tensors: dict[str, GGUFTensor], name: str, dtype, quant_mode: str
) -> dict[str, Any]:
    """Load `{name}.weight` (+`.bias`) as an (in, out) kernel dict."""
    w = tensors[f"{name}.weight"]
    b = tensors.get(f"{name}.bias")
    out: dict[str, Any] = {}
    if w.ggml_type in QUANTIZED_TYPES and quant_mode == "fused":
        out["kernel"] = _soa_from_blocks(w)  # kept (out, in); kernel transposes
    else:
        out["kernel"] = jnp.asarray(w.as_numpy().T, dtype=dtype)
    if b is not None:
        out["bias"] = _dense(b, jnp.float32)
    return out


def _stack(dicts: list[dict[str, Any]]) -> dict[str, Any]:
    """Stack a list of identically-structured pytrees along a new leading axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *dicts)


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
    if not quantized:
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
    swiglu = config.swiglu or f"encoder.layer.0.mlp.weights_in.weight" in tensors
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

    if swiglu and config.use_swiglu_ffn is None:
        config = DinoConfig(**{**config.__dict__, "use_swiglu_ffn": True})

    reader.close()
    return LoadedModel(
        config=config,
        params=p,
        id2label=id2label,
        has_classifier=has_classifier,
        quantized=quantized and quant_mode == "fused",
    )

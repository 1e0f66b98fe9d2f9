"""Megatron tensor-parallel inference with FUSED quantized matmuls (shard_map).

The annotation-based TP path (parallel/mesh.py::param_pspecs + GSPMD) cannot
shard through `pallas_call` (no partitioning rule), so fused-quant inference
under a 'model' mesh runs as ONE jitted shard_map program with explicit
Megatron collectives — the classic column/row split, one psum per block:

  - qkv / fc1 / weights_in are COLUMN-split (out axis). Quantized weights
    split cleanly here in ANY layout: codes/d/m/qh are all out-major, so an
    out-shard is a contiguous row block. The fused-qkv (and fused SwiGLU
    weights_in) rows are PERMUTED once at load so a contiguous S-way split
    hands each shard its own heads' [q; k; v] sections (resp. its [in1; in2]
    halves) — attention then runs per-device on num_heads/S heads with the
    unmodified slab/flash/vanilla kernels.
  - proj / fc2 / weights_out are ROW-split (in axis). Nibble-packed codes
    cannot split on `in` (lo/hi plane elements share bytes), so these convert
    to the int8-SoA layout at load (codes (out, in) int8; d/m (out, in/32))
    which splits at any 32-aligned boundary. The affine min-correction is
    linear in x, so per-shard partials psum exactly.
  - biases of row-split layers add AFTER the psum; everything else
    (norms, embeddings, LayerScale, head) is replicated compute.

Reference has no distributed execution at all (SURVEY.md §2.3); this is the
TPU-native completion of quantized + tensor-parallel serving (giant-model
latency with packed weights).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dinov2_tpu.models.config import DinoConfig
from dinov2_tpu.models.params import QuantLinear
from dinov2_tpu.models.vit import (
    ModelOptions,
    embed_tokens,
    forward_head,
    layer_norm,
)
from dinov2_tpu.ops.attention import resolve_attention_path, split_heads, vanilla_attention
from dinov2_tpu.ops.qmatmul import apply_linear


# ---------------------------------------------------------------------------
# Param preparation (host side, once at engine construction)
# ---------------------------------------------------------------------------


def _to_soa(ql: QuantLinear) -> QuantLinear:
    """Packed-nibble QuantLinear -> int8-SoA (host numpy; row-split needs it).
    Single source of truth for the plane layout: models/params.py::
    decode_packed_planes (shared with ops/qmatmul.py::dequant_weight)."""
    if not ql.packed:
        return ql
    from dinov2_tpu.models.params import decode_packed_planes

    zero = 0 if ql.m is not None else (16 if ql.qh_lo is not None else 8)
    q = decode_packed_planes(
        np.asarray(ql.codes),
        None if ql.qh_lo is None else np.asarray(ql.qh_lo),
        None if ql.qh_hi is None else np.asarray(ql.qh_hi),
        zero,
        np,
    )
    return QuantLinear(
        codes=jnp.asarray(q.astype(np.int8)),
        d=ql.d,
        m=ql.m,
        ggml_type=ql.ggml_type,
        shape=ql.shape,
        packed=False,
    )


def _section_perm(out_dim: int, sections: int, shards: int) -> np.ndarray | None:
    """Row permutation so a contiguous `shards`-way split of the fused
    [sec0; sec1; ...] out axis gives each shard its slice of EVERY section.
    None when the permutation is the identity (single section)."""
    if sections == 1:
        return None
    sz = out_dim // sections
    if sz % shards:
        raise ValueError(
            f"section size {sz} (out={out_dim}/{sections}) does not split "
            f"over tp={shards}"
        )
    per = sz // shards
    perm = [
        sec * sz + s * per + j
        for s in range(shards)
        for sec in range(sections)
        for j in range(per)
    ]
    return np.asarray(perm)


def _permute_out(x, perm: np.ndarray, axis: int):
    return jnp.take(jnp.asarray(x), jnp.asarray(perm), axis=axis)


def _permute_linear(layer: dict, perm: np.ndarray | None) -> dict:
    """Apply an out-axis permutation to a (stacked) linear layer dict whose
    kernel is a QuantLinear with a leading L axis (out = axis 1)."""
    if perm is None:  # identity (single-section layers like fc1)
        return layer
    ql = layer["kernel"]
    out = dict(layer)
    out["kernel"] = QuantLinear(
        codes=_permute_out(ql.codes, perm, 1),
        d=_permute_out(ql.d, perm, 1),
        m=None if ql.m is None else _permute_out(ql.m, perm, 1),
        ggml_type=ql.ggml_type,
        shape=ql.shape,
        packed=ql.packed,
        qh_lo=None if ql.qh_lo is None else _permute_out(ql.qh_lo, perm, 1),
        qh_hi=None if ql.qh_hi is None else _permute_out(ql.qh_hi, perm, 1),
    )
    if "bias" in layer:
        out["bias"] = _permute_out(layer["bias"], perm, 1)
    return out


def _col_specs(ql: QuantLinear, axis: str):
    """Spec pytree for a column-split stacked QuantLinear (out = axis 1)."""
    s = P(None, axis, None)
    return QuantLinear(
        codes=s, d=s, m=None if ql.m is None else s,
        ggml_type=ql.ggml_type, shape=ql.shape, packed=ql.packed,
        qh_lo=None if ql.qh_lo is None else s,
        qh_hi=None if ql.qh_hi is None else s,
    )


def _row_specs(ql: QuantLinear, axis: str):
    """Spec pytree for a row-split stacked int8-SoA QuantLinear (in = axis 2)."""
    s = P(None, None, axis)
    return QuantLinear(
        codes=s, d=s, m=None if ql.m is None else s,
        ggml_type=ql.ggml_type, shape=ql.shape, packed=False,
    )


def tp_prepare_params(
    params: Any, config: DinoConfig, tp: int, axis: str = "model"
) -> tuple[Any, Any]:
    """Rewrite the fused-quant param pytree for Megatron TP and build the
    matching shard_map in_specs tree. Returns (params_tp, specs)."""
    if config.num_attention_heads % tp:
        raise ValueError(
            f"{config.num_attention_heads} heads do not split over tp={tp}"
        )
    layers = dict(params["layers"])
    d_model = config.hidden_size

    def check_quant(name):
        if not hasattr(layers[name]["kernel"], "ggml_type"):
            raise ValueError(f"tp_fused expects quantized {name}")

    for name in ("qkv", "proj"):
        check_quant(name)
    # the MLP kernels must be quantized too, and the row-split ones must split
    # at 32-block boundaries — raise ValueError HERE (not AttributeError later
    # in _to_soa/shard_map placement) so DinoEngine's fallback-to-dequant fires
    mlp_names = (
        ("win", "wout") if "win" in params["layers"]["mlp"] else ("fc1", "fc2")
    )
    for name in mlp_names:
        if not hasattr(params["layers"]["mlp"][name]["kernel"], "ggml_type"):
            raise ValueError(f"tp_fused expects quantized mlp.{name}")

    def check_row_split(name, ql):
        in_dim = ql.shape[1]
        if in_dim % (tp * 32):
            raise ValueError(
                f"{name} in-dim {in_dim} does not split at 32-block "
                f"boundaries over tp={tp}"
            )

    check_row_split(mlp_names[1], params["layers"]["mlp"][mlp_names[1]]["kernel"])

    layers["qkv"] = _permute_linear(layers["qkv"], _section_perm(3 * d_model, 3, tp))
    proj = dict(layers["proj"])
    proj["kernel"] = _to_soa(proj["kernel"])
    if proj["kernel"].codes.shape[2] % (tp * 32):
        raise ValueError("proj in-dim does not split at 32-block boundaries")
    layers["proj"] = proj

    mlp = dict(layers["mlp"])
    if "win" in mlp:  # SwiGLU (giant): fused [in1; in2] halves
        mlp["win"] = _permute_linear(mlp["win"], _section_perm(
            mlp["win"]["kernel"].codes.shape[1], 2, tp
        ))
        wout = dict(mlp["wout"])
        wout["kernel"] = _to_soa(wout["kernel"])
        mlp["wout"] = wout
    else:
        mlp["fc1"] = _permute_linear(mlp["fc1"], _section_perm(
            mlp["fc1"]["kernel"].codes.shape[1], 1, tp
        ))
        fc2 = dict(mlp["fc2"])
        fc2["kernel"] = _to_soa(fc2["kernel"])
        mlp["fc2"] = fc2
    layers["mlp"] = mlp

    params_tp = dict(params)
    params_tp["layers"] = layers

    # spec tree: replicate everything, then overwrite the split leaves
    specs = jax.tree_util.tree_map(lambda _: P(), params_tp)
    lspecs = specs["layers"]
    lspecs["qkv"] = dict(lspecs["qkv"])
    lspecs["qkv"]["kernel"] = _col_specs(layers["qkv"]["kernel"], axis)
    if "bias" in layers["qkv"]:
        lspecs["qkv"]["bias"] = P(None, axis)
    lspecs["proj"] = dict(lspecs["proj"])
    lspecs["proj"]["kernel"] = _row_specs(layers["proj"]["kernel"], axis)
    mspec = dict(lspecs["mlp"])
    if "win" in layers["mlp"]:
        mspec["win"] = {"kernel": _col_specs(layers["mlp"]["win"]["kernel"], axis)}
        if "bias" in layers["mlp"]["win"]:
            mspec["win"]["bias"] = P(None, axis)
        mspec["wout"] = dict(mspec["wout"])
        mspec["wout"]["kernel"] = _row_specs(layers["mlp"]["wout"]["kernel"], axis)
    else:
        mspec["fc1"] = {"kernel": _col_specs(layers["mlp"]["fc1"]["kernel"], axis)}
        if "bias" in layers["mlp"]["fc1"]:
            mspec["fc1"]["bias"] = P(None, axis)
        mspec["fc2"] = dict(mspec["fc2"])
        mspec["fc2"]["kernel"] = _row_specs(layers["mlp"]["fc2"]["kernel"], axis)
    lspecs["mlp"] = mspec
    specs["layers"] = lspecs
    return params_tp, specs


def tp_place_params(params_tp: Any, specs: Any, mesh: Mesh) -> Any:
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params_tp, specs
    )


# ---------------------------------------------------------------------------
# The shard_map forward
# ---------------------------------------------------------------------------


def _attention_core(qkv: jnp.ndarray, local_heads: int, head_dim: int, opts) -> jnp.ndarray:
    b, t, three_dl = qkv.shape
    dl = three_dl // 3
    scale = 1.0 / (head_dim**0.5)
    path = resolve_attention_path(opts.flash_attention, t, dl, qkv.dtype.itemsize)
    if path == "slab":
        from dinov2_tpu.ops.fused_attention import slab_attention

        return slab_attention(qkv, local_heads, scale)
    q, k, v = split_heads(qkv, local_heads)
    if path == "flash":
        from dinov2_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, scale).reshape(b, t, dl)
    return vanilla_attention(q, k, v, scale).reshape(b, t, dl)


def _tp_encoder_layer(x, layer, config, opts, axis):
    head_dim = config.head_dim
    h = layer_norm(x, layer["norm1"], config.eps)
    qkv = apply_linear(h, layer["qkv"])  # (B, T, 3*D/S) local columns
    local_heads = qkv.shape[-1] // 3 // head_dim
    out = _attention_core(qkv, local_heads, head_dim, opts)
    part = apply_linear(out, {"kernel": layer["proj"]["kernel"]})  # partial (B,T,D)
    att = jax.lax.psum(part, axis)
    if "bias" in layer["proj"]:
        att = att + layer["proj"]["bias"].astype(att.dtype)
    x = x + att * layer["ls1"].astype(x.dtype)

    h = layer_norm(x, layer["norm2"], config.eps)
    mlp = layer["mlp"]
    if "win" in mlp:
        hh = apply_linear(h, mlp["win"])
        x1, x2 = jnp.split(hh, 2, axis=-1)
        hh = jax.nn.silu(x1) * x2
        part = apply_linear(hh, {"kernel": mlp["wout"]["kernel"]})
        y = jax.lax.psum(part, axis)
        if "bias" in mlp["wout"]:
            y = y + mlp["wout"]["bias"].astype(y.dtype)
    else:
        hh = apply_linear(h, mlp["fc1"], activation=opts.gelu_activation)
        part = apply_linear(hh, {"kernel": mlp["fc2"]["kernel"]})
        y = jax.lax.psum(part, axis)
        if "bias" in mlp["fc2"]:
            y = y + mlp["fc2"]["bias"].astype(y.dtype)
    return x + y * layer["ls2"].astype(x.dtype)


def make_tp_forward(
    specs: Any,
    config: DinoConfig,
    opts: ModelOptions,
    mesh: Mesh,
    axis: str = "model",
):
    """Build jitted tensor-parallel fused-quant forwards {classify: fn}.

    fn(params_tp, x) -> output dict; numerics match the single-device fused
    forward (same kernels, same order; psums add exact partials). Batch is
    additionally sharded over a 'data' axis when the mesh has one."""
    data_axes = [a for a in mesh.axis_names if a != axis]
    xspec = P(data_axes[0]) if data_axes else P()

    def staged(classify, params, x):
        tokens = embed_tokens(params, x, config, opts)

        def body(carry, layer):
            return _tp_encoder_layer(carry, layer, config, opts, axis), None

        tokens, _ = jax.lax.scan(body, tokens, params["layers"])
        tokens = layer_norm(
            tokens.astype(jnp.float32), params["final_norm"], config.eps
        )
        out = {
            "cls_token": tokens[:, 0],
            "patch_tokens": tokens[:, 1 + config.num_register_tokens :],
        }
        if classify:
            out["probs"] = forward_head(params, tokens, config, opts)
        return out

    return {
        classify: jax.jit(
            jax.shard_map(
                partial(staged, classify),
                mesh=mesh,
                in_specs=(specs, xspec),
                out_specs=xspec,
                check_vma=False,
            )
        )
        for classify in (False, True)
    }

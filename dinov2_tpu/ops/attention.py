"""Multi-head self-attention for the DINOv2 encoder.

Behavioral reference: /root/reference/dinov2.cpp:458-554 — fused-QKV projection,
scale = 1/sqrt(head_dim) applied to the logits, non-causal softmax, output dense.
The reference has two paths (vanilla matmul-softmax and a padded ggml
flash-attention, quirk Q8); here the two paths are a batched einsum formulation
(XLA fuses it) and a Pallas online-softmax flash kernel for TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dinov2_tpu.ops.qmatmul import apply_linear


def split_heads(qkv: jnp.ndarray, num_heads: int) -> tuple[jnp.ndarray, ...]:
    """(B, T, 3D) fused-qkv -> three (B, T, H, hd) tensors.

    The fused layout is [q; k; v] along the feature axis (converter fuses with
    torch.cat([q,k,v], dim=0), dinov2-to-gguf.py:94).
    """
    b, t, three_d = qkv.shape
    d = three_d // 3
    q, k, v = jnp.split(qkv, 3, axis=-1)
    hd = d // num_heads
    shape = (b, t, num_heads, hd)
    return q.reshape(shape), k.reshape(shape), v.reshape(shape)


def vanilla_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float
) -> jnp.ndarray:
    """(B, T, H, hd) -> (B, T, H, hd); softmax in float32."""
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    weights = jax.nn.softmax(scores * scale, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd",
        weights.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(v.dtype)


def resolve_attention_path(flash, t: int, d: int, itemsize: int = 2) -> str:
    """Resolve the attention-path choice to "slab" | "flash" | "vanilla".

    "auto" picks per shape from v5e measurements (docs/TPU_NOTES.md):
      - the fused slab kernel (ops/fused_attention.py) wins whenever the whole
        per-image sequence fits VMEM (all classify shapes and 518px feature
        mode on S/B) — it skips the HBM scores round-trip AND the head
        split/merge transposes;
      - the online-softmax flash kernel handles long sequences beyond the slab
        budget (native-resolution feature inputs, 10k+ tokens);
      - non-TPU backends take the vanilla einsum path (Pallas would interpret).
    Explicit True keeps the reference's `-fa` meaning (flash kernel); False
    forces vanilla."""
    if flash is True:
        return "flash"
    if flash is False:
        return "vanilla"
    if flash in ("slab", "vanilla", "flash"):
        return flash
    if jax.default_backend() != "tpu":
        return "vanilla"
    from dinov2_tpu.ops.fused_attention import fits_slab

    # itemsize matters: an f32 slab doubles the VMEM footprint vs bf16, and
    # picking "slab" past the budget is a runtime Mosaic allocation failure
    if fits_slab(t, d, itemsize):
        return "slab"
    return "flash" if t >= 1024 else "vanilla"


def use_flash(flash, t: int, d: int) -> bool:
    """Back-compat shim: whether the resolved path is a Pallas kernel."""
    return resolve_attention_path(flash, t, d) != "vanilla"


def self_attention_block(
    x_res: jnp.ndarray,
    x_norm: jnp.ndarray,
    qkv_params: dict,
    proj_params: dict,
    ls1: jnp.ndarray,
    num_heads: int,
    flash=False,
) -> jnp.ndarray:
    """Residual attention block: x_res + ls1 * proj(attention(qkv(x_norm))).

    On the slab path with a dense proj, the output projection + bias +
    LayerScale + residual ride INSIDE the Pallas kernel
    (ops/fused_attention.py::slab_attention_block) — skipping one attention
    -slab write + read of HBM per layer. Quantized proj (fused-quant mode) and
    the flash/vanilla paths keep the unfused ordering (same numerics)."""
    b, t, d = x_norm.shape
    hd = d // num_heads
    scale = 1.0 / (hd**0.5)
    proj_kernel = proj_params["kernel"]
    if (
        resolve_attention_path(flash, t, d, x_norm.dtype.itemsize) == "slab"
        and "bias" in proj_params
    ):
        from dinov2_tpu.ops.fused_attention import (
            fits_slab_proj,
            slab_attention_block,
        )

        if fits_slab_proj(t, d, x_norm.dtype.itemsize):
            if hasattr(proj_kernel, "ggml_type") or getattr(
                proj_kernel, "int8_per_row", False
            ):
                # quantized proj at shapes past the full quant half-layer
                # kernel's VMEM budget (e.g. ViT-L): per-layer XLA dequant
                # into the proj-fused slab kernel still beats the unfused
                # route — the attention slab's HBM write+read (~16.8 MB at
                # ViT-L b16) dwarfs the 2x1 MB dense-proj round-trip.
                # Same env knob and default as models/vit.py: any mode but
                # "off" takes it (there is no in-kernel-quant variant of the
                # proj-epilogue kernel, so "kernel" degrades to this too)
                import os

                if os.environ.get("DINOV2_TPU_QUANT_SLAB", "auto") == "off":
                    proj_kernel = None
                else:
                    from dinov2_tpu.ops.qmatmul import dequant_weight

                    proj_kernel = dequant_weight(proj_kernel, x_norm.dtype).T
            if proj_kernel is not None:
                qkv = apply_linear(x_norm, qkv_params)
                return slab_attention_block(
                    x_res, qkv, proj_kernel, proj_params["bias"], ls1,
                    num_heads, scale,
                )
    out = self_attention(x_norm, qkv_params, proj_params, num_heads, flash=flash)
    return x_res + out * ls1.astype(x_res.dtype)


def self_attention(
    x: jnp.ndarray,
    qkv_params: dict,
    proj_params: dict,
    num_heads: int,
    flash=False,
) -> jnp.ndarray:
    """Full MHSA block: fused-qkv -> attention core -> output projection.
    `flash`: True | False | "auto" (see use_flash)."""
    b, t, d = x.shape
    hd = d // num_heads
    scale = 1.0 / (hd**0.5)

    qkv = apply_linear(x, qkv_params)
    path = resolve_attention_path(flash, t, d, x.dtype.itemsize)

    if path == "slab":
        from dinov2_tpu.ops.fused_attention import slab_attention

        out = slab_attention(qkv, num_heads, scale)
    elif path == "flash" and hd % 128 == 0:
        # transpose-free slab-consuming flash: only legal when per-head tiles
        # satisfy Mosaic's lane-divisibility rule (hd % 128); DINOv2's hd=64
        # takes the head-looped variant below via the standard wrapper
        from dinov2_tpu.ops.flash_attention import flash_attention_slab

        out = flash_attention_slab(qkv, num_heads, scale)
    else:
        q, k, v = split_heads(qkv, num_heads)
        if path == "flash":
            from dinov2_tpu.ops.flash_attention import flash_attention

            out = flash_attention(q, k, v, scale)
            out = out.reshape(b, t, d)
        else:
            out = vanilla_attention(q, k, v, scale).reshape(b, t, d)
    return apply_linear(out, proj_params)

"""DINOv2 ViT forward pass — functional, batch-first, scan-over-layers.

Behavioral reference: /root/reference/dinov2.cpp
  - patch embed + token assembly: 629-686 (conv-as-matmul; CLS concat; pos-embed
    add; register tokens spliced AFTER the pos add so they get no positional
    embedding — quirk in SURVEY.md C8)
  - encoder layer: 688-750 (pre-LN, MHSA, LayerScale, residual; LN2, MLP or
    SwiGLU, LayerScale2, residual; SwiGLU iff giant — quirk Q6)
  - final LN + output taps: 754-789 (feature mode drops CLS+registers from
    patch_tokens; classify mode drops only CLS — quirk Q5)
  - classification head: 792-821 (pooled = sum(patch_tokens)/n_img_embd² — the
    MODEL-grid count, not the runtime count — quirk Q3; concat(CLS, pooled);
    linear classifier; softmax)

TPU-first design: batch is a leading axis everywhere; encoder layers are stacked
and driven by one `lax.scan`; norms/softmax in f32, matmuls in the compute dtype
(bf16 by default) on the MXU; the whole thing is one jittable function.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from dinov2_tpu.image.posembed import interpolate_pos_embed
from dinov2_tpu.models.config import DinoConfig
from dinov2_tpu.ops.attention import self_attention_block
from dinov2_tpu.ops.qmatmul import apply_linear


@dataclass(frozen=True)
class ModelOptions:
    """Static numerics/parity switches (hashable; part of the jit cache key)."""

    parity: str = "reference"  # "reference" replicates ggml quirks; "hf" matches HF
    flash_attention: Any = "auto"  # True | False | "auto" (per-shape, see ops/attention.py)
    compute_dtype: Any = jnp.bfloat16
    remat: bool = False  # rematerialize encoder layers (training memory/FLOPs trade)
    fuse_mlp: bool = False  # MLP half-layer Pallas kernel: measured a net ~2%
    # LOSS at ViT-B b64 on v5e (the per-image m=257 GEMMs inside the kernel
    # lose more MXU efficiency than the saved (T, 4D) HBM round-trip gains —
    # XLA batches the whole (B·T, D) GEMM); kept for HBM-constrained setups
    sequence_parallel: bool = False  # shard the token axis on the 'model' mesh
    # axis between attention blocks (Megatron-SP); requires a mesh context with
    # a 'model' axis (jax.sharding.set_mesh). XLA inserts the all-gather before
    # attention and the reduce-scatter after.

    @property
    def gelu_approximate(self) -> bool:
        # ggml_gelu is the tanh approximation; HF Dinov2 uses exact erf GELU.
        return self.parity == "reference"

    @property
    def gelu_activation(self) -> str:
        """Activation name for apply_linear. Reference mode replicates ggml's
        fp16-LUT tanh-GELU exactly — f16(gelu_tanh(f16(x))), see
        ops/qmatmul.py::gelu_tanh_f16; HF mode is exact erf GELU."""
        return "gelu_tanh_f16" if self.parity == "reference" else "gelu_erf"


def layer_norm(x: jnp.ndarray, p: dict, eps: float) -> jnp.ndarray:
    """ggml_norm + affine (dinov2.cpp:694-700): stats in f32."""
    x32 = x.astype(jnp.float32)
    mu = x32.mean(axis=-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def mlp_block(x: jnp.ndarray, p: dict, activation: str) -> jnp.ndarray:
    """fc1 -> GELU -> fc2 (dinov2.cpp:556-575). The GELU is requested through
    apply_linear so quantized fc1 runs it in the Pallas kernel epilogue (dense
    fc1 applies the identical activation; XLA fuses it either way)."""
    h = apply_linear(x, p["fc1"], activation=activation)
    return apply_linear(h, p["fc2"])


def swiglu_block(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """weights_in -> split halves -> SiLU(x1)*x2 -> weights_out (dinov2.cpp:577-614)."""
    h = apply_linear(x, p["win"])
    x1, x2 = jnp.split(h, 2, axis=-1)
    h = jax.nn.silu(x1) * x2  # compute dtype; fuses
    return apply_linear(h, p["wout"])


def _sequence_shard(x: jnp.ndarray, opts: ModelOptions) -> jnp.ndarray:
    """Sequence-parallel activation constraint: tokens sharded on 'model' for
    the norm/MLP segments (no-op unless opts.sequence_parallel)."""
    if not opts.sequence_parallel:
        return x
    from jax.sharding import PartitionSpec as P

    return jax.lax.with_sharding_constraint(x, P("data", "model", None))


def _attention_half_layer(
    x: jnp.ndarray, layer: dict, config: DinoConfig, opts: ModelOptions
) -> jnp.ndarray:
    """norm1 -> attention -> proj -> LayerScale -> residual, maximally fused.

    On the TPU slab path with dense weights the WHOLE half-layer runs as one
    Pallas kernel (ops/fused_attention.py::slab_layer_block): LN + fused-QKV
    matmul + per-head attention + proj + bias + LayerScale + residual — the
    (B, T, 3D) qkv slab and the LN output never exist in HBM. Falls back to
    the slab-with-proj-epilogue kernel, then to the unfused paths, keeping
    identical numerics ordering at every level."""
    from dinov2_tpu.ops.attention import resolve_attention_path

    heads = config.num_attention_heads
    b, t, d = x.shape
    qkv_k = layer["qkv"]["kernel"]
    proj_k = layer["proj"]["kernel"]
    qkv_quant = hasattr(qkv_k, "ggml_type")
    proj_quant = hasattr(proj_k, "ggml_type")
    qkv_int8 = getattr(qkv_k, "int8_per_row", False)
    proj_int8 = getattr(proj_k, "int8_per_row", False)
    if (
        resolve_attention_path(opts.flash_attention, t, d, x.dtype.itemsize)
        == "slab"
        and "bias" in layer["qkv"]
        and "bias" in layer["proj"]
    ):
        from dinov2_tpu.ops.fused_attention import (
            fits_slab_layer,
            slab_layer_block,
        )

        scale = 1.0 / (d // heads) ** 0.5
        if not (qkv_quant or proj_quant or qkv_int8 or proj_int8):
            if fits_slab_layer(t, d, x.dtype.itemsize):
                return slab_layer_block(
                    x, layer["norm1"]["scale"], layer["norm1"]["bias"],
                    qkv_k, layer["qkv"]["bias"], proj_k, layer["proj"]["bias"],
                    layer["ls1"], heads, scale, config.eps,
                )
        elif qkv_int8 and proj_int8:
            # W8A8 mode at slab shapes: per-row transient dequant (codes*s,
            # two cheap VPU passes) into the DENSE half-layer kernel — the
            # slab fusion's removed HBM round-trips (qkv slab + attention
            # output) outweigh the int8 GEMM's MXU-rate win, which only
            # applies where the GEMMs are unfused (giant SwiGLU, over-budget
            # shapes — those fall through to int8_matmul via apply_linear).
            # Same "off" knob as the ggml routes so A/B runs measure the
            # truly-unfused int8 path.
            import os

            if os.environ.get(
                "DINOV2_TPU_QUANT_SLAB", "auto"
            ) != "off" and fits_slab_layer(t, d, x.dtype.itemsize):
                from dinov2_tpu.ops.qmatmul import dequant_weight

                return slab_layer_block(
                    x, layer["norm1"]["scale"], layer["norm1"]["bias"],
                    dequant_weight(qkv_k, x.dtype).T, layer["qkv"]["bias"],
                    dequant_weight(proj_k, x.dtype).T, layer["proj"]["bias"],
                    layer["ls1"], heads, scale, config.eps,
                )
        elif qkv_quant and proj_quant:
            # Fused-quant attention half-layer, two routes (both remove the
            # HBM attention round-trip that round 2's quant path still paid —
            # the 1.27x fused-vs-dequant gap, VERDICT r2). Measured q4_0 on
            # v5e (docs/TPU_NOTES.md r3; round-2 fused was 29.3 ms at b64):
            #   "kernel"  = in-kernel dequant-once-into-VMEM-scratch
            #               (ops/fused_quant_attention.py):
            #               b1 2.07 / b8 5.10 / b64 24.3 ms
            #   "dequant" = per-layer XLA dequant into the DENSE half-layer
            #               kernel (transient weights):
            #               b1 1.95 / b8 4.37 / b64 23.6 ms
            # The transient-dequant route wins at EVERY batch size — the
            # in-kernel dequant serializes per-layer VPU work against the
            # layer compute, which hurts more the smaller the batch, while
            # the transient dense weights cost only ~11 MB/layer of traffic.
            # "auto" therefore always prefers it; the in-kernel kernel stays
            # behind DINOV2_TPU_QUANT_SLAB=kernel ("off" disables both).
            import os

            mode = os.environ.get("DINOV2_TPU_QUANT_SLAB", "auto")
            from dinov2_tpu.ops.fused_quant_attention import (
                fits_slab_layer_quant,
                slab_layer_block_quant,
            )
            from dinov2_tpu.ops.qmatmul import dequant_weight

            kernel_fits = mode == "kernel" and fits_slab_layer_quant(
                t, d, x.dtype.itemsize, qkv_k, proj_k
            )
            # "kernel" falls back to the dequant route where the quant kernel
            # exceeds its VMEM budget (e.g. ViT-L) — same chain as "auto", so
            # forced A/B runs never silently measure a third route
            dequant_fits = mode in ("auto", "dequant", "kernel") and fits_slab_layer(
                t, d, x.dtype.itemsize
            )
            if kernel_fits:
                return slab_layer_block_quant(
                    x, layer["norm1"]["scale"], layer["norm1"]["bias"],
                    qkv_k, layer["qkv"]["bias"], proj_k, layer["proj"]["bias"],
                    layer["ls1"], heads, scale, config.eps,
                )
            if dequant_fits:
                return slab_layer_block(
                    x, layer["norm1"]["scale"], layer["norm1"]["bias"],
                    dequant_weight(qkv_k, x.dtype).T, layer["qkv"]["bias"],
                    dequant_weight(proj_k, x.dtype).T, layer["proj"]["bias"],
                    layer["ls1"], heads, scale, config.eps,
                )
    h = layer_norm(x, layer["norm1"], config.eps)
    # LayerScale + residual in the compute dtype (keeps the whole residual
    # stream fusable; ls values are O(1e-5..1), well inside bf16 range); on
    # the slab path proj+bias+ls+residual run inside the attention kernel
    return self_attention_block(
        x, h, layer["qkv"], layer["proj"], layer["ls1"],
        heads, flash=opts.flash_attention,
    )


def encoder_layer(
    x: jnp.ndarray, layer: dict, config: DinoConfig, opts: ModelOptions
) -> jnp.ndarray:
    x = _sequence_shard(x, opts)
    x = _attention_half_layer(x, layer, config, opts)
    return _mlp_half_layer(x, layer, config, opts)


def _mlp_half_layer(
    x: jnp.ndarray, layer: dict, config: DinoConfig, opts: ModelOptions
) -> jnp.ndarray:
    """norm2 -> MLP -> LayerScale -> residual. On the TPU slab path with dense
    MLP weights the whole half-layer is one Pallas kernel
    (ops/fused_attention.py::slab_mlp_block) — the (T, 4D) fc1 activation
    never exists in HBM. SwiGLU, quantized weights, and over-budget shapes
    keep the unfused path with identical numerics ordering."""
    b, t, d = x.shape
    mlp = layer["mlp"]
    if opts.fuse_mlp and not config.swiglu:
        from dinov2_tpu.ops.attention import resolve_attention_path

        if (
            resolve_attention_path(opts.flash_attention, t, d, x.dtype.itemsize)
            == "slab"
            and "bias" in mlp["fc1"]
            and "bias" in mlp["fc2"]
        ):
            from dinov2_tpu.ops.fused_attention import (
                fits_slab_mlp,
                slab_mlp_block,
            )

            import os

            fc1_k, fc2_k = mlp["fc1"]["kernel"], mlp["fc2"]["kernel"]
            # Int8Linear rides the same transient-dequant-into-slab route as
            # the ggml formats (dequant_weight handles both); "off" exposes
            # the unfused int8_matmul path for A/B runs
            fc1_quant = hasattr(fc1_k, "ggml_type") or getattr(
                fc1_k, "int8_per_row", False
            )
            fc2_quant = hasattr(fc2_k, "ggml_type") or getattr(
                fc2_k, "int8_per_row", False
            )
            if fc1_quant != fc2_quant:
                fc1_k = None  # mixed dense/quant MLP: no fused route
            elif fc1_quant and os.environ.get("DINOV2_TPU_QUANT_SLAB") == "off":
                # same knob as the attention half-layer: "off" disables EVERY
                # fused-quant slab route, so an A/B baseline is truly unfused
                fc1_k = None
            elif fc1_quant:
                # VERDICT r2 item 5 (quantized MLP-fusion experiment): both
                # weights resident in VMEM as packed codes + dequant scratch
                # costs ~16.6 MB at ViT-B (over budget — the in-kernel variant
                # cannot fit), so the only viable fused-quant MLP is per-layer
                # XLA dequant into the dense kernel. Measured on v5e: see
                # docs/TPU_NOTES.md (round 3) for the verdict.
                from dinov2_tpu.ops.qmatmul import dequant_weight

                fc1_k = dequant_weight(fc1_k, x.dtype).T
                fc2_k = dequant_weight(fc2_k, x.dtype).T
            if fc1_k is not None:
                dh = fc1_k.shape[-1]
                if fits_slab_mlp(t, d, dh, x.dtype.itemsize):
                    return slab_mlp_block(
                        x, layer["norm2"]["scale"], layer["norm2"]["bias"],
                        fc1_k, mlp["fc1"]["bias"], fc2_k, mlp["fc2"]["bias"],
                        layer["ls2"], opts.gelu_activation, config.eps,
                    )
    h = layer_norm(x, layer["norm2"], config.eps)
    if config.swiglu:
        h = swiglu_block(h, layer["mlp"])
    else:
        h = mlp_block(h, layer["mlp"], opts.gelu_activation)
    return x + h * layer["ls2"].astype(x.dtype)


def embed_tokens(
    params: dict, x: jnp.ndarray, config: DinoConfig, opts: ModelOptions
) -> jnp.ndarray:
    """Preprocessed images (B, H, W, 3) -> token sequence (B, 1+R+N, D)."""
    b, h, w, c = x.shape
    p = config.patch_size
    gh, gw = h // p, w // p

    # stride-p conv == per-patch flatten + matmul (patch pixels ordered (py, px, c)
    # to match the kernel layout produced in models/params.py)
    dtype = opts.compute_dtype
    patches = x.reshape(b, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
    patches = patches.reshape(b, gh * gw, p * p * c).astype(dtype)
    tokens = jnp.dot(
        patches, params["patch_embed"]["kernel"], preferred_element_type=jnp.float32
    )
    tokens = tokens + params["patch_embed"]["bias"]

    pos = interpolate_pos_embed(params["pos_embed"], config.n_img_embd, (gh, gw))

    cls = params["cls_token"][None, None, :] + pos[None, :1]
    tokens = tokens + pos[None, 1:]
    cls = jnp.broadcast_to(cls, (b, 1, tokens.shape[-1]))

    parts = [cls.astype(dtype), tokens.astype(dtype)]
    if config.num_register_tokens > 0:
        reg = jnp.broadcast_to(
            params["register_tokens"][None],
            (b, config.num_register_tokens, tokens.shape[-1]),
        )
        parts.insert(1, reg.astype(dtype))  # after pos-add: registers get no pos-embed
    return jnp.concatenate(parts, axis=1)


def forward_features(
    params: dict, x: jnp.ndarray, config: DinoConfig, opts: ModelOptions
) -> jnp.ndarray:
    """(B, H, W, 3) preprocessed -> final-normed tokens (B, 1+R+N, D) in f32.

    Softmax-core safety (round 4): when the attention path uses the 3-pass
    CLS-shift core (ops/fused_attention.py::_head_softmax_pv), the layers are
    traced with the PER-CALL rescue disabled (its flag reduce was measured to
    cost the core's whole win) and replaced by ONE whole-stack check here: an
    exp2 overflow provably propagates as inf/NaN through proj, LayerScale,
    residual, LN and GELU to the scan output, so isfinite(sum(tokens)) after
    the scan catches an overflow in ANY layer, and the lax.cond re-runs the
    stack with the exact row-max core only then. Trained checkpoints pay one
    ~25 MB reduce per forward (~0.15%); rogue checkpoints get exact results."""
    tokens = embed_tokens(params, x, config, opts)

    from dinov2_tpu.ops.attention import resolve_attention_path
    from dinov2_tpu.ops.fused_attention import (
        _aug_active,
        _sm3_mode,
        sm3_override,
    )

    def run_layers(tokens, mode=None):
        def body(carry, layer):
            return encoder_layer(carry, layer, config, opts), None

        if opts.remat:
            body = jax.checkpoint(body)
        with sm3_override(mode):
            out, _ = jax.lax.scan(body, tokens, params["layers"])
        return out

    b, t, d = tokens.shape
    path = resolve_attention_path(opts.flash_attention, t, d, tokens.dtype.itemsize)
    if path == "flash":
        from dinov2_tpu.ops.flash_attention import flash_unsafe_core_active

        flash_unsafe = flash_unsafe_core_active(
            t, d // config.num_attention_heads
        )
    else:
        flash_unsafe = False
    if _sm3_mode() == "rescue" and (
        (path == "slab" and _aug_active(t)) or flash_unsafe
    ):
        fast = run_layers(tokens, "unsafe")
        ok = jnp.isfinite(jnp.sum(fast.astype(jnp.float32)))
        tokens = jax.lax.cond(
            ok, lambda: fast, lambda: run_layers(tokens, "max")
        )
    else:
        tokens = run_layers(tokens)
    tokens = layer_norm(
        tokens.astype(jnp.float32), params["final_norm"], config.eps
    )
    return tokens


def head_logits(
    params: dict, tokens: jnp.ndarray, config: DinoConfig, opts: ModelOptions
) -> jnp.ndarray:
    """Final tokens -> classifier logits (B, num_classes), f32.

    Parity divergence on pooling:
      - "reference": registers INCLUDED (dinov2.cpp:770-776, quirk Q5) and the
        divisor is the MODEL-grid patch count n_img_embd², not the runtime
        count (quirk Q3, dinov2.cpp:800-803).
      - "hf": registers EXCLUDED (Dinov2WithRegistersForImageClassification:
        "cls and register tokens should not be included in patch tokens") and a
        true mean. The reference's include-registers behavior matches an older
        transformers version; current HF differs.
    """
    cls = tokens[:, 0]
    if opts.parity == "reference":
        patch = tokens[:, 1:]  # registers included
        pooled = patch.sum(axis=1) / float(config.n_img_embd**2)
    else:
        patch = tokens[:, 1 + config.num_register_tokens :]
        pooled = patch.mean(axis=1)
    feats = jnp.concatenate([cls, pooled], axis=-1)
    return apply_linear(feats, params["classifier"]).astype(jnp.float32)


def forward_head(
    params: dict, tokens: jnp.ndarray, config: DinoConfig, opts: ModelOptions
) -> jnp.ndarray:
    """Final tokens -> class probabilities (softmax over head_logits,
    dinov2.cpp:815)."""
    return jax.nn.softmax(head_logits(params, tokens, config, opts), axis=-1)


def _batch_chunk(b: int, t: int) -> int | None:
    """Images per in-flight group for the single-chip inference entry.

    At the 518px feature shape (T=1370, ViT-L) per-image throughput DEGRADES
    past b8 (round 3: b8 108.4 / b16 105.4 / b32 91.7 img/s) — the whole-batch
    schedule keeps every image's qkv slab live at once and XLA's scheduler
    trades HBM locality for parallelism the chip can't use (b8 already
    saturates the pipeline). Running big batches as sequential lax.map chunks
    of the saturating size restores the b8 schedule per chunk. Gated to long
    sequences; classify shapes (T=257) scale cleanly with batch and stay
    whole-batch. DINOV2_TPU_BATCH_CHUNK overrides (0 disables).

    Non-multiples of 8 chunk at the largest divisor of b in [4, 8] (half the
    saturating size keeps the pipeline mostly fed and still beats the
    degraded whole-batch schedule); primes and b <= 8 stay whole-batch."""
    import os

    env = os.environ.get("DINOV2_TPU_BATCH_CHUNK")
    if env is not None:
        c = int(env)
        return c if c > 0 else None
    if t < 1024 or b <= 8:
        return None
    for cand in (8, 7, 6, 5, 4):
        if b % cand == 0:
            return cand
    return None


@partial(jax.jit, static_argnames=("config", "opts", "classify"))
def forward(
    params: dict,
    x: jnp.ndarray,
    config: DinoConfig,
    opts: ModelOptions,
    classify: bool = False,
) -> dict[str, jnp.ndarray]:
    """Full jitted forward. Returns f32 outputs:
    cls_token (B, D); patch_tokens (B, N, D) — feature-mode tap, registers and CLS
    dropped (quirk Q5); probs (B, classes) when classify=True.

    Large batches at long T run as sequential lax.map chunks (_batch_chunk);
    the sharded training path (parallel/train.py) calls forward_features
    directly and is untouched."""
    b = x.shape[0]
    t = (
        (x.shape[1] // config.patch_size) * (x.shape[2] // config.patch_size)
        + 1
        + config.num_register_tokens
    )
    chunk = _batch_chunk(b, t)
    if chunk is not None and b > chunk and b % chunk == 0:
        xs = x.reshape(b // chunk, chunk, *x.shape[1:])
        tokens = jax.lax.map(
            lambda xx: forward_features(params, xx, config, opts), xs
        )
        tokens = tokens.reshape(b, *tokens.shape[2:])
    else:
        tokens = forward_features(params, x, config, opts)
    out = {
        "cls_token": tokens[:, 0],
        "patch_tokens": tokens[:, 1 + config.num_register_tokens :],
    }
    if classify:
        out["probs"] = forward_head(params, tokens, config, opts)
    return out

"""MFU ablation profiler for the flagship bench shape (ViT-B/14, b64, 224px).

Times the full forward plus surgically ablated variants on the real TPU with the
bench.py methodology (one jitted lax.scan with a data dependence across
iterations, fresh buffer per repeat, min over repeats). The deltas between
variants attribute wall time to attention core, LayerNorms, and epilogues —
cheaper and more robust in this tunneled environment than a trace viewer.

Usage:  python scripts/profile_mfu.py [variant ...]
Variants: full flash slab qkvonly noln bf16ln nomlp isolated (default: all)
Unknown variant names are rejected. DINOV2_PROFILE_SIZE=small|base|large picks
the model (default base; GFLOP/img adjusts).
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from dinov2_tpu.models.config import PRESETS, DinoConfig
from dinov2_tpu.models.params import init_params
from dinov2_tpu.models.vit import ModelOptions, embed_tokens, layer_norm
from dinov2_tpu.ops.attention import self_attention, vanilla_attention
from dinov2_tpu.ops.qmatmul import apply_linear

BATCH = 64
ITERS = 30
REPEATS = 3


def timed_scan(fn, params, x):
    """bench.py methodology: scan ITERS data-dependent iterations."""

    def loop(params, x):
        def body(carry, _):
            out = fn(params, carry)
            return carry + (1e-8 * jnp.mean(out)).astype(carry.dtype), None

        c, _ = jax.lax.scan(body, x, None, length=ITERS)
        return jnp.sum(c)

    jloop = jax.jit(loop)
    jax.block_until_ready(jloop(params, x))
    best = float("inf")
    for r in range(REPEATS):
        xf = x * (1.0 + 1e-6 * (r + 1))
        jax.block_until_ready(xf)
        t0 = time.perf_counter()
        float(jloop(params, xf))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1e3  # ms per call


def make_forward(config, opts, attn="vanilla", ln="f32", mlp=True):
    """Configurable ViT-B forward over tokens for ablations."""

    def ln_fn(x, p):
        if ln == "f32":
            return layer_norm(x, p, config.eps)
        if ln == "bf16":
            mu = x.mean(axis=-1, keepdims=True)
            var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
            y = (x - mu) * jax.lax.rsqrt(var + config.eps)
            return y * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)
        return x  # "none"

    def layer(x, lp):
        h = ln_fn(x, lp["norm1"])
        if attn == "vanilla":
            h = self_attention(h, lp["qkv"], lp["proj"], config.num_attention_heads, flash=False)
        elif attn == "flash":
            h = self_attention(h, lp["qkv"], lp["proj"], config.num_attention_heads, flash=True)
        elif attn == "slab":
            h = self_attention(h, lp["qkv"], lp["proj"], config.num_attention_heads, flash="slab")
        elif attn == "qkvonly":  # qkv+proj matmuls kept, attention core skipped
            qkv = apply_linear(h, lp["qkv"])
            h = apply_linear(qkv[..., : x.shape[-1]], lp["proj"])
        x = x + h * lp["ls1"].astype(x.dtype)
        h = ln_fn(x, lp["norm2"])
        if mlp:
            h = apply_linear(h, lp["mlp"]["fc1"])
            h = jax.nn.gelu(h, approximate=True)
            h = apply_linear(h, lp["mlp"]["fc2"])
        x = x + h * lp["ls2"].astype(x.dtype)
        return x

    def fwd(params, img):
        tokens = embed_tokens(params, img, config, opts)
        tokens, _ = jax.lax.scan(lambda c, lp: (layer(c, lp), None), tokens, params["layers"])
        tokens = layer_norm(tokens.astype(jnp.float32), params["final_norm"], config.eps)
        return tokens[:, 0]

    return fwd


def main():
    from dinov2_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    known = {"full", "flash", "slab", "qkvonly", "noln", "bf16ln", "nomlp", "isolated"}
    which = set(sys.argv[1:]) or (known - {"nomlp"})  # slab = production path
    unknown = which - known
    if unknown:
        sys.exit(f"unknown variants {sorted(unknown)}; choose from {sorted(known)}")
    import os

    size = os.environ.get("DINOV2_PROFILE_SIZE", "base")
    base = PRESETS[size]
    config = DinoConfig(**{**base.__dict__, "num_classes": 1000})
    opts = ModelOptions(parity="reference", compute_dtype=jnp.bfloat16)
    params = init_params(config, seed=0, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, 224, 224, 3)), dtype=jnp.float32)
    float(jnp.sum(jnp.ones((8, 128))))  # warm transfer path

    # matmul+attention FLOPs per image at 224px classify for the MFU print
    t = (224 // config.patch_size) ** 2 + 1 + config.num_register_tokens
    d = config.hidden_size
    gflop_img = config.num_hidden_layers * (
        2 * t * d * 4 * d + 4 * t * t * d + 2 * 2 * t * d * 4 * d
    ) / 1e9
    results = {}

    def report(name, ms):
        tfs = gflop_img * BATCH / ms  # GFLOP/batch / ms = TF/s
        results[name] = ms
        print(f"{name:12s} {ms:7.2f} ms/batch  {BATCH / ms * 1e3:7.0f} img/s  "
              f"~{tfs:5.1f} TF/s  ~{tfs / 197 * 100:4.1f}% MFU", flush=True)

    variants = {
        "full": dict(attn="vanilla", ln="f32"),
        "flash": dict(attn="flash", ln="f32"),
        "slab": dict(attn="slab", ln="f32"),
        "qkvonly": dict(attn="qkvonly", ln="f32"),
        "noln": dict(attn="vanilla", ln="none"),
        "bf16ln": dict(attn="vanilla", ln="bf16"),
        "nomlp": dict(attn="vanilla", ln="f32", mlp=False),
    }
    for name, kw in variants.items():
        if name in which:
            report(name, timed_scan(make_forward(config, opts, **kw), params, x))

    if "isolated" in which:
        # isolated attention core at the model shape (B, T, H, hd)
        b, t, h, hd = BATCH, 257, config.num_attention_heads, 64
        q = jnp.asarray(rng.standard_normal((b, t, h, hd)), dtype=jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, t, h, hd)), dtype=jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, t, h, hd)), dtype=jnp.bfloat16)

        # k/v travel as ARGUMENTS: closing over ~25 MB tensors embeds them as
        # HLO constants — a huge compile payload through the tunnel (the
        # anti-pattern tpu_suite.scan_timed's docstring bans)
        ms = timed_scan(
            lambda p, qx: vanilla_attention(qx, p[0], p[1], 0.125), (k, v), q
        )
        print(f"{'iso-vanilla':12s} {ms:7.2f} ms/call", flush=True)

        from dinov2_tpu.ops.flash_attention import flash_attention

        ms = timed_scan(
            lambda p, qx: flash_attention(qx, p[0], p[1], 0.125), (k, v), q
        )
        print(f"{'iso-flash':12s} {ms:7.2f} ms/call", flush=True)

    if "full" in results and "qkvonly" in results:
        print(f"attention core cost: {results['full'] - results['qkvonly']:.2f} ms")
    if "full" in results and "noln" in results:
        print(f"LN cost:             {results['full'] - results['noln']:.2f} ms")

    # XLA's own cost model for the full forward
    from dinov2_tpu.models.vit import forward

    lowered = jax.jit(
        partial(forward, config=config, opts=opts, classify=True)
    ).lower(params, jnp.zeros((BATCH, 224, 224, 3), jnp.float32))
    ca = lowered.compile().cost_analysis()
    if ca:
        print(f"XLA cost_analysis: flops={ca.get('flops', 0):.3e} "
              f"bytes={ca.get('bytes accessed', 0):.3e}")


if __name__ == "__main__":
    main()

"""MFU ablation profiler for the 518px feature-extraction shape (T=1370).

The reference's marquee feature mode (/root/reference/dinov2.cpp:135-156).
Model-input 518x518 at patch 14 → 37x37 grid → T = 1369 + CLS = 1370 (no
registers) — the docs/SUITE_RESULTS.json "large-518" shape. ViT-L/14, batch 8.
Variants isolate the flash attention core, the head-split/merge HBM layout
cost around it, the MLP, and the f32 LNs at long T. Methodology:
scripts/profile_mfu.py (data-dependent jitted scan, min over repeats).

Usage: python scripts/profile_518.py [variant ...]
Variants: flash layoutonly qkvonly nomlp noln (default: all)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from dinov2_tpu.models.config import PRESETS, DinoConfig
from dinov2_tpu.models.params import init_params
from dinov2_tpu.models.vit import ModelOptions, embed_tokens, layer_norm
from dinov2_tpu.ops.attention import split_heads
from dinov2_tpu.ops.qmatmul import apply_linear

sys.path.insert(0, str(Path(__file__).resolve().parent))
from profile_mfu import timed_scan  # noqa: E402

BATCH = 8
SIZE = 518  # 37x37 grid + 1 extra patch row/col (Q4) -> handled by caller shape


def make_forward(config, opts, attn="flash", mlp=True, ln="f32"):
    heads = config.num_attention_heads

    def ln_fn(x, p):
        return layer_norm(x, p, config.eps) if ln == "f32" else x

    def layer(x, lp):
        h = ln_fn(x, lp["norm1"])
        b, t, d = h.shape
        scale = 1.0 / (d // heads) ** 0.5
        qkv = apply_linear(h, lp["qkv"])
        if attn == "flash":
            from dinov2_tpu.ops.flash_attention import flash_attention

            q, k, v = split_heads(qkv, heads)
            out = flash_attention(q, k, v, scale).reshape(b, t, d)
        elif attn == "layoutonly":
            # the flash wrapper's HBM layout work WITHOUT the kernel: head
            # split + (B,T,H,hd)->(B*H,T,hd) transpose, barrier (stops XLA
            # cancelling the pair), inverse transpose + merge
            hh = heads
            q, k, v = split_heads(qkv, hh)
            pre = [a.transpose(0, 2, 1, 3).reshape(b * hh, t, d // hh)
                   for a in (q, k, v)]
            pre = jax.lax.optimization_barrier(pre)
            out = pre[0].reshape(b, hh, t, d // hh).transpose(0, 2, 1, 3)
            out = out.reshape(b, t, d) + 0 * (
                jnp.sum(pre[1][0, 0]) + jnp.sum(pre[2][0, 0])
            ).astype(x.dtype)
        elif attn == "qkvonly":
            out = qkv[..., :d]
        else:
            raise ValueError(attn)
        h = apply_linear(out, lp["proj"])
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
    known = {"flash", "layoutonly", "qkvonly", "nomlp", "noln"}
    which = set(sys.argv[1:]) or known
    unknown = which - known
    if unknown:
        sys.exit(f"unknown variants {sorted(unknown)}; choose from {sorted(known)}")
    base = PRESETS["large"]
    config = DinoConfig(**{**base.__dict__, "num_classes": 0})
    opts = ModelOptions(parity="reference", compute_dtype=jnp.bfloat16)
    params = init_params(config, seed=0, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, SIZE, SIZE, 3)), dtype=jnp.float32)
    float(jnp.sum(jnp.ones((8, 128))))

    t = (SIZE // config.patch_size) ** 2 + 1
    # ~FLOPs per image at this shape (matmuls + attention) for the MFU print
    d = config.hidden_size
    l = config.num_hidden_layers
    flops_img = l * (2 * t * d * (4 * d) + 4 * t * t * d + 2 * 2 * t * d * 4 * d)
    gflop_img = flops_img / 1e9

    variants = {
        "flash": dict(attn="flash"),
        "layoutonly": dict(attn="layoutonly"),
        "qkvonly": dict(attn="qkvonly"),
        "nomlp": dict(attn="flash", mlp=False),
        "noln": dict(attn="flash", ln="none"),
    }
    results = {}
    for name, kw in variants.items():
        if name not in which:
            continue
        ms = timed_scan(make_forward(config, opts, **kw), params, x)
        tfs = gflop_img * BATCH / ms
        results[name] = ms
        print(f"{name:10s} {ms:8.2f} ms/batch  {BATCH / ms * 1e3:6.1f} img/s  "
              f"~{tfs:5.1f} TF/s  ~{tfs / 197 * 100:4.1f}% MFU", flush=True)

    if "layoutonly" in results and "qkvonly" in results:
        print(f"head-split/merge layout cost: "
              f"{results['layoutonly'] - results['qkvonly']:.2f} ms/batch")
    if "flash" in results and "qkvonly" in results:
        print(f"attention total (layout+kernel): "
              f"{results['flash'] - results['qkvonly']:.2f} ms")
    if "flash" in results and "nomlp" in results:
        print(f"MLP cost:            {results['flash'] - results['nomlp']:.2f} ms")
    if "flash" in results and "noln" in results:
        print(f"LN cost:             {results['flash'] - results['noln']:.2f} ms")


if __name__ == "__main__":
    main()

"""Consolidated TPU measurement suite (run on the real chip, one process).

Collects: ViT-B/14 throughput at several batch sizes (flash vs vanilla), ViT-L
feature-mode 518px, quantized-matmul kernel timings vs XLA-dequant and dense,
and flash-attention timings at classify/feature sequence lengths. Prints one
JSON blob at the end. Designed to run unattended: no device->host transfers
until the end (the axon tunnel's first transfer costs ~1-8 min).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

RESULTS: dict = {}


def scan_timed(body, x, iters=20, repeats=2, params=None):
    """Robust under the axon tunnel (docs/TPU_NOTES.md): one jitted scan with a
    data-dependent carry, FRESH input per repeat, scalar transfer to force
    completion, min over repeats. Pass weight pytrees via `params` — closures
    embed them as HLO constants (huge compile payloads; see TPU_NOTES)."""

    @jax.jit
    def loop(params, x):
        c, _ = jax.lax.scan(
            lambda c, _: (body(c) if params is None else body(params, c), 0.0),
            x, None, length=iters,
        )
        return jnp.sum(c)

    jax.block_until_ready(loop(params, x))
    best = float("inf")
    for r in range(repeats):
        xf = x * (1.0 + 1e-6 * (r + 1))
        jax.block_until_ready(xf)
        t0 = time.perf_counter()
        float(loop(params, xf))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def bench_forward(modes=("auto", True, False), batches_override=None):
    from dinov2_tpu.models.config import PRESETS, DinoConfig
    from dinov2_tpu.models.params import init_params
    from dinov2_tpu.models.vit import ModelOptions, forward

    rng = np.random.default_rng(0)
    out = RESULTS.setdefault("forward", {})
    for preset, px, batches, classify in [
        ("base", 224, batches_override or [1, 8, 32, 64, 128], True),
        ("small", 224, [64], True),
        ("large", 518, [8], False),
    ]:
        cfg0 = PRESETS[preset]
        cfg = DinoConfig(**{**cfg0.__dict__, "num_classes": 1000 if classify else 0})
        params = init_params(cfg, seed=0, dtype=jnp.bfloat16)
        # "auto" resolves to the fused slab kernel at these shapes when it
        # fits VMEM (ops/attention.py::resolve_attention_path) — the
        # production default; flash/vanilla rows are the explicit overrides
        for flash in modes:
            name = {True: "flash", False: "vanilla", "auto": "slab"}[flash]
            opts = ModelOptions(
                parity="reference", compute_dtype=jnp.bfloat16, flash_attention=flash
            )
            for b in batches:
                x = jnp.asarray(
                    rng.standard_normal((b, px, px, 3)), dtype=jnp.float32
                )

                def body(params, c):
                    o = forward(params, c, cfg, opts, classify=classify)
                    probe = o["probs"] if classify else o["cls_token"]
                    return c + (1e-8 * jnp.mean(probe)).astype(c.dtype)

                try:
                    dt = scan_timed(body, x, iters=10, params=params)
                    key = f"{preset}-{px}px-b{b}-{name}"
                    out[key] = {
                        "ms_per_batch": round(dt * 1e3, 3),
                        "img_per_s": round(b / dt, 1),
                    }
                    print(key, out[key], flush=True)
                except Exception as e:  # noqa: BLE001
                    out[f"{preset}-{px}px-b{b}-{name}"] = f"FAILED {str(e)[:120]}"


def bench_qmatmul():
    from dinov2_tpu.io.gguf import GGMLType
    from dinov2_tpu.models.params import QuantLinear
    from dinov2_tpu.ops.pallas_qmatmul import quant_matmul_pallas
    from dinov2_tpu.ops.qmatmul import dequant_weight
    from dinov2_tpu.quant.blocks import quantize, unpack_codes

    rng = np.random.default_rng(0)
    n, k, m = 2304, 768, 2048
    w = (rng.standard_normal((n, k)) * 0.5).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    wd = jnp.asarray(w.T, jnp.bfloat16)
    out = {}

    def matmul_body(fn):
        # chain output back into the (m, k) input so the scan is data-dependent
        def body(c):
            y = fn(c)  # (m, n)
            return c + (1e-8 * jnp.mean(y)).astype(c.dtype)

        return body

    dense = lambda c: jnp.dot(c, wd, preferred_element_type=jnp.float32).astype(
        jnp.bfloat16
    )
    dt = scan_timed(matmul_body(dense), x, iters=50)
    out["dense_bf16"] = {"ms": round(dt * 1e3, 4), "tflops": round(2 * m * n * k / dt / 1e12, 1)}
    print("dense", out["dense_bf16"], flush=True)

    for t_ in [GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1, GGMLType.Q8_0]:
        raw = quantize(w, t_)
        codes, d, mm = unpack_codes(raw, t_, (n, k))
        ql = QuantLinear(
            codes=jnp.asarray(codes),
            d=jnp.asarray(d),
            m=jnp.asarray(mm) if mm is not None else None,
            ggml_type=int(t_),
            shape=(n, k),
        )
        g_xla = lambda c, ql=ql: jnp.dot(
            c, dequant_weight(ql, jnp.bfloat16).T, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)
        entry = {}
        dt = scan_timed(matmul_body(g_xla), x, iters=50)
        entry["xla_dequant_ms"] = round(dt * 1e3, 4)
        for bm, bn in [(512, 512), (1024, 768)]:
            try:
                g = lambda c, ql=ql, bm=bm, bn=bn: quant_matmul_pallas(
                    c, ql, block_m=bm, block_n=bn
                )
                dt = scan_timed(matmul_body(g), x, iters=50)
                entry[f"pallas_{bm}x{bn}_ms"] = round(dt * 1e3, 4)
            except Exception as e:  # noqa: BLE001
                entry[f"pallas_{bm}x{bn}_ms"] = f"FAILED {str(e)[:80]}"
        out[t_.name] = entry
        print(t_.name, entry, flush=True)
    RESULTS["qmatmul"] = out


def bench_attention():
    from dinov2_tpu.ops.attention import vanilla_attention
    from dinov2_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(0)
    out = {}
    for b, t, h, hd, tag in [
        (64, 257, 12, 64, "classify-b64"),
        (8, 1370, 16, 64, "feature518-b8"),
    ]:
        q, k, v = [
            jnp.asarray(rng.standard_normal((b, t, h, hd)), jnp.bfloat16)
            for _ in range(3)
        ]
        scale = 1 / hd**0.5
        entry = {}
        for name, fn in [
            ("flash", lambda c: flash_attention(c, c, c, scale)),
            ("vanilla", lambda c: vanilla_attention(c, c, c, scale)),
        ]:
            try:
                dt = scan_timed(
                    lambda c, fn=fn: fn(c) * 0.5 + c * 0.5, q, iters=30
                )
                entry[name + "_ms"] = round(dt * 1e3, 3)
            except Exception as e:  # noqa: BLE001
                entry[name + "_ms"] = f"FAILED {str(e)[:80]}"
        out[tag] = entry
        print(tag, entry, flush=True)
    RESULTS["attention"] = out


if __name__ == "__main__":
    import argparse

    # persistent compilation cache: this is the longest queue job (3 attention
    # modes x ~7 forward shapes + kernel benches); a rerun after a tunnel drop
    # must hit warm artifacts instead of repaying every multi-minute compile
    from dinov2_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--sections", default="forward,attention,qmatmul",
        help="comma list of forward,attention,qmatmul",
    )
    ap.add_argument(
        "--modes", default="slab,flash,vanilla",
        help="forward attention modes to sweep (slab=auto policy)",
    )
    ap.add_argument("--batches", default=None,
                    help="override the base-model batch sweep, e.g. 8,64")
    args = ap.parse_args()
    mode_map = {"slab": "auto", "auto": "auto", "flash": True, "vanilla": False}
    modes = tuple(mode_map[m.strip()] for m in args.modes.split(","))
    batches = [int(b) for b in args.batches.split(",")] if args.batches else None

    print("backend:", jax.default_backend(), flush=True)
    sections = {s.strip() for s in args.sections.split(",")}
    if "forward" in sections:
        bench_forward(modes=modes, batches_override=batches)
    if "attention" in sections:
        bench_attention()
    if "qmatmul" in sections:
        bench_qmatmul()
    print("\nRESULTS_JSON " + json.dumps(RESULTS), flush=True)

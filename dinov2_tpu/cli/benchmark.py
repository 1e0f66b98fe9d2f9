"""`dinov2-benchmark` — throughput/latency sweep with markdown output.

Reference analogs: scripts/benchmark.py (PyTorch baseline, markdown table) and
scripts/benchmark.sh (per-size, per-quant sweep averaging N runs) in
/root/reference. Differences by design: measurements run on-device with a
data-dependent jitted scan (see bench.py methodology), weights come from
synthetic GGUFs when no checkpoint is given (no network in this environment;
op speed is weight-value independent), and batch is a swept axis (the TPU wins
come from batching, SURVEY.md §6 north star).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np


def _tree_device_bytes(tree) -> int:
    """Actual HBM bytes of the live param buffers (quantized layouts included)."""
    import jax

    return sum(
        leaf.nbytes for leaf in jax.tree_util.tree_leaves(tree)
        if hasattr(leaf, "nbytes")
    )


def _bench_model(model_path, batch_sizes, iters, dtype_name, flash, quant_mode, px=224):
    import jax
    import jax.numpy as jnp

    from dinov2_tpu.models.params import load_params
    from dinov2_tpu.models.vit import ModelOptions, forward

    dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32}[dtype_name]
    loaded = load_params(model_path, dtype=dtype, quant_mode=quant_mode)
    opts = ModelOptions(
        parity="reference", compute_dtype=dtype, flash_attention=flash
    )
    classify = loaded.has_classifier
    weights_mb = _tree_device_bytes(loaded.params) / 2**20

    # warm the device->host transfer path once (tunnel quirk, docs/TPU_NOTES.md)
    float(jnp.sum(jnp.ones((8, 128))))

    rows = []
    for batch in batch_sizes:
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((batch, px, px, 3)),
            dtype=jnp.float32,
        )

        # params as a jit ARGUMENT (closures embed weights as HLO constants);
        # fresh input per repeat + scalar transfer to force true completion
        def loop(params, x):
            def body(carry, _):
                out = forward(params, carry, loaded.config, opts, classify=classify)
                probe = out["probs"] if classify else out["cls_token"]
                return carry + (1e-8 * jnp.mean(probe)).astype(carry.dtype), None

            c, _ = jax.lax.scan(body, x, None, length=iters)
            return jnp.sum(c)

        # AOT compile so XLA's buffer assignment is measurable: the reference
        # reports peak RSS per configuration (/root/reference/scripts/
        # benchmark.sh:73-78); the TPU like-for-like is the compiled program's
        # HBM plan (weights ride as arguments, temps = activation workspace)
        compiled = jax.jit(loop).lower(loaded.params, x).compile()
        mem = compiled.memory_analysis()
        if mem is not None and getattr(mem, "peak_memory_in_bytes", 0):
            # peak_memory_in_bytes includes argument (weight) buffers — checked
            # empirically on v5e: a 64 MB-arg program reports >= 64 MB peak
            peak_mb = mem.peak_memory_in_bytes / 2**20
            temp_mb = mem.temp_size_in_bytes / 2**20
        else:  # backend without buffer-assignment reporting
            peak_mb = temp_mb = None

        jax.block_until_ready(compiled(loaded.params, x))  # warmup run
        best = float("inf")
        for r in range(2):
            xf = x * (1.0 + 1e-6 * (r + 1))
            jax.block_until_ready(xf)
            t0 = time.perf_counter()
            float(compiled(loaded.params, xf))
            best = min(best, time.perf_counter() - t0)
        ms_per_batch = best / iters * 1e3
        dt = best
        rows.append(
            {
                "batch": batch,
                "ms_per_batch": round(ms_per_batch, 3),
                "ms_per_image": round(ms_per_batch / batch, 3),
                "images_per_sec": round(batch * iters / dt, 1),
                "hbm_weights_mb": round(weights_mb, 1),
                "hbm_peak_mb": None if peak_mb is None else round(peak_mb, 1),
                "hbm_temp_mb": None if temp_mb is None else round(temp_mb, 1),
            }
        )
    return loaded.config, rows


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-m", "--model", default=None, help="GGUF checkpoint to benchmark")
    p.add_argument("--size", default="base", choices=["small", "base", "large", "giant"],
                   help="synthetic model size when no checkpoint is given")
    p.add_argument("--batch-sizes", default="1,8,32,64")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    p.add_argument("--quant", default=None,
                   help="also quantize+benchmark: comma list of q4_0,q4_1,q5_0,q5_1,q8_0")
    p.add_argument("--quant-mode", default="dequant",
                   choices=["dequant", "fused", "int8"])
    p.add_argument("-fa", "--flash-attn", action="store_true")
    p.add_argument("--registers", type=int, default=0,
                   help="synthetic checkpoints: number of register tokens "
                        "(the reference benches reg and no-reg variants, "
                        "README.md:291-409)")
    p.add_argument("--px", type=int, default=224,
                   help="input resolution fed to the forward (224 classify, "
                        "518 feature mode)")
    p.add_argument("--features", action="store_true",
                   help="synthetic checkpoints: no classifier head — bench the "
                        "backbone feature tap instead of classify")
    p.add_argument("--json", action="store_true", help="emit JSON instead of markdown")
    args = p.parse_args(argv)

    import shutil
    import tempfile

    batch_sizes = [int(b) for b in args.batch_sizes.split(",")]
    tmpdir = Path(tempfile.mkdtemp(prefix="dinov2-bench-"))
    try:
        return _run(args, batch_sizes, tmpdir)
    finally:
        # synthetic + quantized checkpoints can be multi-GB (giant); repeated
        # sweeps must not fill /tmp
        shutil.rmtree(tmpdir, ignore_errors=True)


def _run(args, batch_sizes, tmpdir: Path) -> int:
    if args.model:
        model_path = Path(args.model)
    else:
        from dinov2_tpu.io.synthetic import write_synthetic_gguf
        from dinov2_tpu.models.config import PRESETS, DinoConfig

        cfg = PRESETS[args.size]
        cfg = DinoConfig(**{
            **cfg.__dict__,
            "num_classes": 0 if args.features else 1000,
            "num_register_tokens": args.registers,
        })
        model_path = tmpdir / f"{args.size}.gguf"
        print(f"writing synthetic {args.size} checkpoint...", file=sys.stderr)
        write_synthetic_gguf(model_path, cfg)

    if args.model:
        # honor --quant-mode for a user-supplied checkpoint (it may already be
        # quantized; load_params falls back to dequant for fp16/fp32 files)
        # and label the row by the file's actual ftype instead of "f16"
        from dinov2_tpu.io.gguf import GGMLType, GGUFReader

        with GGUFReader(model_path) as r:
            # % 1000 strips the old-convention quant-version factor, matching
            # DinoConfig.from_gguf_kv (dinov2.cpp:307) — GGMLType(2002) raises
            base_label = GGMLType(
                int(r.kv.get("ftype", GGMLType.F16)) % 1000
            ).name.lower()
        variants = [(base_label, model_path, args.quant_mode)]
    elif args.quant_mode == "int8":
        # int8 is a runtime mode that applies to ANY ftype, including the
        # synthetic f16 checkpoint — unlike "fused", which needs ggml blocks
        # and would silently downgrade to dequant here
        variants = [("f16-int8", model_path, "int8")]
    else:
        variants = [("f16", model_path, "dequant")]
    if args.quant:
        from dinov2_tpu.quant.quantize import quantize_gguf

        for q in args.quant.split(","):
            qpath = tmpdir / f"{model_path.stem}-{q}.gguf"
            print(f"quantizing {q}...", file=sys.stderr)
            quantize_gguf(model_path, qpath, q.strip())
            variants.append((q, qpath, args.quant_mode))

    results = {}
    for name, path, qmode in variants:
        print(f"benchmarking {name}...", file=sys.stderr)
        _, rows = _bench_model(
            path, batch_sizes, args.iters, args.dtype,
            True if args.flash_attn else "auto", qmode, px=args.px
        )
        results[name] = rows

    if args.json:
        print(json.dumps(results, indent=2))
    else:
        for name, rows in results.items():
            print(f"\n### {name}\n")
            print(
                "| batch | ms/batch | ms/image | images/sec "
                "| weights MB | peak HBM MB | temps MB |"
            )
            print(
                "|------:|---------:|---------:|-----------:"
                "|-----------:|------------:|---------:|"
            )
            for r in rows:
                fmt = lambda v: "-" if v is None else v
                print(
                    f"| {r['batch']} | {r['ms_per_batch']} | "
                    f"{r['ms_per_image']} | {r['images_per_sec']} | "
                    f"{fmt(r['hbm_weights_mb'])} | {fmt(r['hbm_peak_mb'])} | "
                    f"{fmt(r['hbm_temp_mb'])} |"
                )
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Same-host PyTorch-CPU baseline benchmark (reference P2 analog).

Reproduces the methodology of /root/reference/scripts/benchmark.py:96-165 on
THIS machine, so the speedup tables have a locally measured denominator
instead of numbers quoted from the reference README (recorded in BASELINE.md):

  - HF `transformers` DINOv2 classification model, SDPA attention, eval mode
  - 224x224 ImageNet-normalized input (the torchvision eval-preset math:
    bicubic resize-256 -> center-crop 224 -> /255 -> mean/std)
  - thread pinning via torch.set_num_threads + threadpoolctl
  - N timed iterations, first dropped as warm-up
  - peak process RSS via resource.getrusage (ru_maxrss, KiB on Linux)

Two timings are reported per model size:
  - `load+fwd` — the reference's timed region, which (quirk of the upstream
    script, /root/reference/scripts/benchmark.py:96-106) re-instantiates the
    model INSIDE the loop, so it times load + one forward;
  - `fwd` — forward only, matching the "graph computation took" contract this
    repo's img/s numbers use (/root/reference/inference.cpp:62-68). This is
    the honest (more conservative) denominator for speedup claims.

No network: models are built from `Dinov2ForImageClassification(config)` with
random weights — dense-op speed is weight-value independent, and `load+fwd`
times state-dict-free construction (a lower bound on the reference's
from_pretrained, which also reads a checkpoint from disk cache).

Usage: python scripts/benchmark_torch.py [--sizes small,base] [--iters 10]
       [--threads N] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import resource
import sys
import time

import numpy as np

SIZES = {
    # hidden, layers, heads, mlp ratio handled by transformers defaults
    "small": dict(hidden_size=384, num_hidden_layers=12, num_attention_heads=6),
    "base": dict(hidden_size=768, num_hidden_layers=12, num_attention_heads=12),
    "large": dict(hidden_size=1024, num_hidden_layers=24, num_attention_heads=16),
    "giant": dict(
        hidden_size=1536,
        num_hidden_layers=40,
        num_attention_heads=24,
        use_swiglu_ffn=True,
    ),
}


def _build(size: str, torch):
    from transformers import Dinov2Config, Dinov2ForImageClassification

    cfg = Dinov2Config(
        image_size=518,
        patch_size=14,
        num_labels=1000,
        attn_implementation="sdpa",
        **SIZES[size],
    )
    model = Dinov2ForImageClassification(cfg)
    model.eval()
    return model


def bench_size(size: str, iters: int, torch) -> dict:
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    x = torch.from_numpy(
        rng.standard_normal((1, 3, 224, 224)).astype(np.float32)
    )

    # reference methodology: model construction inside the timed loop
    load_fwd_times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        model = _build(size, torch)
        with torch.inference_mode():
            F.softmax(model(pixel_values=x).logits, dim=-1)
        load_fwd_times.append(time.perf_counter() - t0)

    # forward-only (the "graph computation took" contract)
    model = _build(size, torch)
    fwd_times = []
    with torch.inference_mode():
        for _ in range(iters):
            t0 = time.perf_counter()
            F.softmax(model(pixel_values=x).logits, dim=-1)
            fwd_times.append(time.perf_counter() - t0)

    drop = 1 if iters > 1 else 0  # first iteration = warm-up, like the reference
    rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    return {
        "size": size,
        "load_fwd_ms": round(float(np.mean(load_fwd_times[drop:])) * 1e3, 1),
        "fwd_ms": round(float(np.mean(fwd_times[drop:])) * 1e3, 1),
        "fwd_ms_min": round(float(np.min(fwd_times[drop:])) * 1e3, 1),
        "images_per_sec": round(1.0 / float(np.mean(fwd_times[drop:])), 2),
        "peak_rss_mb": round(rss_mb, 1),
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sizes", default="small,base")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--threads", type=int, default=None)
    p.add_argument("--json", default=None, help="also write results to this path")
    args = p.parse_args(argv)

    import torch

    if args.threads:
        torch.set_num_threads(args.threads)
    try:
        from threadpoolctl import threadpool_limits
    except ImportError:  # pragma: no cover
        threadpool_limits = None

    sizes = [s.strip() for s in args.sizes.split(",") if s.strip()]
    rows = []
    if len(sizes) > 1:
        # one subprocess per size: ru_maxrss is a PROCESS-LIFETIME high-water
        # mark, so an in-process sweep latches the largest size's RSS onto
        # every later row (e.g. --sizes giant,small reported ~5 GB for small).
        # The reference methodology also runs one process per config
        # (benchmark.sh's /usr/bin/time per run).
        import subprocess
        import tempfile
        from pathlib import Path

        for size in sizes:
            with tempfile.TemporaryDirectory() as td:
                out = Path(td) / "one.json"
                cmd = [sys.executable, __file__, "--sizes", size,
                       "--iters", str(args.iters), "--json", str(out)]
                if args.threads:
                    cmd += ["--threads", str(args.threads)]
                r = subprocess.run(cmd, stdout=subprocess.DEVNULL)
                if r.returncode != 0:
                    return r.returncode
                rows.extend(json.loads(out.read_text())["results"])
    else:
        for size in sizes:
            print(f"benchmarking torch-cpu {size}...", file=sys.stderr)
            if threadpool_limits is not None and args.threads:
                with threadpool_limits(limits=args.threads):
                    rows.append(bench_size(size, args.iters, torch))
            else:
                rows.append(bench_size(size, args.iters, torch))

    meta = {
        "torch_version": torch.__version__,
        "threads": torch.get_num_threads(),
        "device": "cpu",
    }
    print(f"\ntorch {meta['torch_version']}, {meta['threads']} threads, CPU\n")
    print("| model | load+fwd ms | fwd ms (mean) | fwd ms (min) | img/s | peak RSS MB |")
    print("|-------|------------:|--------------:|-------------:|------:|------------:|")
    for r in rows:
        print(
            f"| {r['size']} | {r['load_fwd_ms']} | {r['fwd_ms']} | "
            f"{r['fwd_ms_min']} | {r['images_per_sec']} | {r['peak_rss_mb']} |"
        )
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"meta": meta, "results": rows}, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())

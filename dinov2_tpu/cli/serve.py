"""`dinov2-serve` — batching HTTP inference server.

New TPU-native capability (the reference has no serving daemon): coalesces
concurrent requests into batched forwards. See runtime/server.py."""

from __future__ import annotations

import argparse
import sys

from dinov2_tpu.cli._common import add_common_args, dtype_of, mesh_axes_of


def _warmup_buckets(spec: str, max_batch: int) -> list[int]:
    """Parse --warmup into the sorted batch buckets to precompile."""
    if spec == "0":
        return []
    if spec == "full":
        out, b = [], 1
        while b < max_batch:
            out.append(b)
            b *= 2
        out.append(b)  # the bucket that covers max_batch itself
        return out
    try:
        vals = sorted({int(v) for v in spec.split(",") if v.strip()})
    except ValueError:
        raise SystemExit(f"--warmup {spec!r}: expected '0', 'full', or a comma list of ints")
    if any(v < 1 for v in vals):
        raise SystemExit(f"--warmup {spec!r}: buckets must be >= 1")
    # the batcher never builds a batch beyond max_batch, so the largest
    # reachable program is the bucket covering max_batch — warming past it
    # would burn boot time (~69 s/bucket uncached) on dead programs
    cap, usable = 1, []
    while cap < max_batch:
        cap *= 2
    for v in vals:
        if v > cap:
            import sys

            print(f"warmup: dropping bucket {v} (> max reachable bucket {cap} "
                  f"for --max-batch {max_batch})", file=sys.stderr)
        else:
            usable.append(v)
    return usable


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max-batch", type=int, default=32)
    p.add_argument("--max-wait-ms", type=float, default=5.0)
    p.add_argument("--max-body-mb", type=float, default=32.0,
                   help="reject request bodies larger than this (413)")
    p.add_argument("--max-side", type=int, default=4096,
                   help="reject images with a side longer than this (400); "
                   "every new image size compiles its own program")
    p.add_argument("--warmup", default="1", metavar="SPEC",
                   help="batch buckets to precompile at boot: a comma list "
                   "(e.g. 1,8,32), 'full' = every power-of-2 bucket up to "
                   "--max-batch, or '0' = none. The forward program is keyed "
                   "by batch bucket (engine._bucket), so this removes the "
                   "first-request compile stall at each coalescing level "
                   "(measured 69 s uncached through the TPU tunnel, "
                   "docs/TPU_NOTES.md round 3)")
    args = p.parse_args(argv)

    from dinov2_tpu.runtime.engine import DinoEngine
    from dinov2_tpu.runtime.server import BatchingServer

    engine = DinoEngine(
        args.model,
        dtype=dtype_of(args),
        quant_mode=args.quant_mode,
        parity=args.parity,
        flash_attention=True if args.flash_attn else "auto",
        data_parallel=args.data_parallel,
        mesh_axes=mesh_axes_of(args),
    )
    if engine.loaded.has_classifier:
        for b in _warmup_buckets(args.warmup, args.max_batch):
            engine.warmup((256, 256), batch=b, classify=True)

    server = BatchingServer(
        engine,
        host=args.host,
        port=args.port,
        max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms,
        topk=args.topk,
        max_body_mb=args.max_body_mb,
        max_side=args.max_side,
    )
    print(f"serving on http://{args.host}:{server.port}", file=sys.stderr)
    server.serve_forever()
    return 0


if __name__ == "__main__":
    sys.exit(main())

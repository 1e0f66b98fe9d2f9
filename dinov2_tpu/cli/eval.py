"""`dinov2-eval` — batched classification over a directory of images.

Throughput-oriented batch analog of running the reference's `inference -c` in a
loop: threaded JPEG decode overlaps device compute (runtime/loader.py), batches
run as single MXU-bound forwards, results stream out as JSON lines
(path, top-k labels+probs). With --labels (a JSON {filename: class_index} map)
also reports top-1/top-5 accuracy.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

from dinov2_tpu.cli._common import add_common_args, dtype_of, mesh_axes_of


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--dir", required=True, help="directory of images (recursive)")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--decode-threads", type=int, default=8)
    p.add_argument("--labels", default=None, help="JSON {filename: class_index}")
    p.add_argument("--output", default="-", help="JSONL output path (- = stdout)")
    args = p.parse_args(argv)

    from dinov2_tpu.runtime.engine import DinoEngine
    from dinov2_tpu.runtime.loader import BatchLoader, list_images

    engine = DinoEngine(
        args.model,
        dtype=dtype_of(args),
        quant_mode=args.quant_mode,
        parity=args.parity,
        flash_attention=True if args.flash_attn else "auto",
        data_parallel=args.data_parallel,
        mesh_axes=mesh_axes_of(args),
    )

    paths = list_images(args.dir)
    if not paths:
        print(f"no images under {args.dir}", file=sys.stderr)
        return 1
    # cubic-float host resize = the reference's float/255 -> INTER_CUBIC order
    # (dinov2.cpp:106-121); the on-device 256->256 bicubic is then the identity,
    # so batched eval classifies the exact same pixels as single-image classify.
    loader = BatchLoader(
        paths,
        batch_size=args.batch,
        size=(256, 256),
        num_threads=args.decode_threads,
        interpolation="cubic-float",
    )

    labels = None
    if args.labels:
        labels = {k: int(v) for k, v in json.loads(Path(args.labels).read_text()).items()}

    out = sys.stdout if args.output == "-" else open(args.output, "w")
    total = top1 = top5 = 0
    t0 = time.perf_counter()
    for batch_paths, images in loader:
        probs = engine.classify_probs(images)
        for path, row in zip(batch_paths, probs):
            # ranking independent of -k: the top-5 metric must not silently
            # become top-k when the user prints fewer than 5 classes
            ranked = row.argsort()[::-1]
            idx = ranked[: args.topk]
            rec = {
                "path": str(path),
                "topk": [
                    [engine.id2label.get(int(i), str(int(i))), float(row[i])]
                    for i in idx
                ],
            }
            if labels is not None and path.name in labels:
                want = labels[path.name]
                total += 1
                top1 += int(ranked[0] == want)
                top5 += int(want in ranked[:5])
                rec["label"] = want
            out.write(json.dumps(rec) + "\n")
    dt = time.perf_counter() - t0
    print(
        f"{len(paths)} images in {dt:.2f}s = {len(paths) / dt:.1f} img/s",
        file=sys.stderr,
    )
    if total:
        print(
            f"top-1 {top1 / total:.4f}  top-5 {top5 / total:.4f}  (n={total})",
            file=sys.stderr,
        )
    if out is not sys.stdout:
        out.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())

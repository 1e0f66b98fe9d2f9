"""`dinov2-inference` — one-shot classify / feature-extract+PCA.

Reference: /root/reference/inference.cpp. Same user surface: classify prints the
top-k " > label : prob" lines; feature mode writes the PCA visualization image;
the compute bracket is reported as "graph computation took X ms" on stderr (the
reference's benchmark.sh regex-scrapes exactly that line)."""

from __future__ import annotations

import argparse
import sys

from dinov2_tpu.cli._common import add_common_args, dtype_of, load_image_rgb, mesh_axes_of, save_image_rgb


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    parser.add_argument("--batch", type=int, default=1,
                        help="replicate the input to this batch size (throughput mode)")
    parser.add_argument("--profile", default=None, metavar="DIR",
                        help="capture a jax.profiler trace of the timed run into DIR")
    args = parser.parse_args(argv)

    from dinov2_tpu.runtime.engine import DinoEngine

    img = load_image_rgb(args.inp)

    engine = DinoEngine(
        args.model,
        dtype=dtype_of(args),
        quant_mode=args.quant_mode,
        parity=args.parity,
        flash_attention=True if args.flash_attn else "auto",
        data_parallel=args.data_parallel,
        mesh_axes=mesh_axes_of(args),
    )

    import numpy as np

    batch = np.repeat(img[None], args.batch, axis=0)

    import contextlib

    profile_ctx = contextlib.nullcontext()
    if args.profile:
        import jax

        profile_ctx = jax.profiler.trace(args.profile)

    if args.classify:
        engine.classify_probs(batch)  # warmup/compile
        with profile_ctx:
            results = engine.classify(batch, topk=args.topk)
        print(file=sys.stderr)
        for label, prob in results[0]:
            print(f" > {label} : {prob:.2f}")
    else:
        engine.pca_visualization(img)  # warmup/compile of the fused PCA program
        with profile_ctx:
            vis = engine.pca_visualization(img)
        save_image_rgb(args.out, vis)
        print(f"wrote PCA visualization to {args.out}", file=sys.stderr)

    print(
        f"graph computation took {engine.last_compute_ms:.2f} ms", file=sys.stderr
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

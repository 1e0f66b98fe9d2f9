"""`dinov2-convert` — HuggingFace checkpoint -> GGUF.

Reference: /root/reference/scripts/dinov2-to-gguf.py (same tensor naming/dtype
policy; see dinov2_tpu/io/convert.py). Adds an --output flag (the reference
hard-codes ./ggml-model.gguf)."""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--model_name",
        default="facebook/dinov2-small-imagenet1k-1-layer",
        help="HuggingFace model name or local checkpoint directory",
    )
    parser.add_argument("--output", default="./ggml-model.gguf")
    args = parser.parse_args(argv)

    from dinov2_tpu.io.convert import convert_hf_name

    out = convert_hf_name(args.model_name, args.output)
    print(f"Done. Output file: {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Shared CLI plumbing: flag names mirror the reference's dino_params_parse
(/root/reference/dinov2.cpp:865-898), with the `-o` bug fixed (quirk Q7: upstream
`-o` overwrote the input path; here it sets the output path as documented)."""

from __future__ import annotations

import argparse

import jax.numpy as jnp


def add_common_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("-m", "--model", default="./ggml-model-f16.gguf", help="model path (GGUF)")
    p.add_argument("-i", "--inp", default="assets/tench.jpg", help="input image path")
    p.add_argument("-o", "--out", default="pca_visual.jpg", help="output image for PCA features")
    p.add_argument("-k", "--topk", type=int, default=5, help="top-k classes to print")
    p.add_argument("-s", "--seed", type=int, default=42, help="rng seed")
    p.add_argument("-t", "--threads", type=int, default=0,
                   help="host thread hint (XLA manages device parallelism itself)")
    p.add_argument("-c", "--classify", action="store_true",
                   help="classify instead of PCA feature extraction")
    p.add_argument("-fa", "--flash-attn", action="store_true",
                   help="use the Pallas flash-attention kernel")
    p.add_argument("--parity", choices=["reference", "hf"], default="reference",
                   help="numerics parity target (ggml quirks vs HF semantics)")
    p.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    p.add_argument("--quant-mode", choices=["dequant", "fused", "int8"], default="dequant",
                   help="quantized checkpoints: dequant at load, or fused Pallas "
                   "dequant-matmul; 'int8' = W8A8 serving mode (per-row int8 "
                   "weights + dynamic int8 activations on the MXU's native "
                   "s8xs8 path — works on ANY checkpoint ftype incl. fp16)")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard the batch over all devices (ICI mesh)")
    p.add_argument("--mesh", default=None, metavar="DP[,TP]",
                   help="explicit mesh: 'dp' or 'dp,tp' device counts "
                   "(tensor-parallel weights on the tp axis; composes with "
                   "--quant-mode fused via shard_map)")


def dtype_of(args) -> object:
    return {"bf16": jnp.bfloat16, "f32": jnp.float32}[args.dtype]


def mesh_axes_of(args) -> dict[str, int] | None:
    """Parse --mesh 'dp[,tp]' into DinoEngine mesh_axes (validated)."""
    if not getattr(args, "mesh", None):
        return None
    try:
        parts = [int(v) for v in args.mesh.split(",")]
    except ValueError:
        raise SystemExit(f"--mesh {args.mesh!r}: expected 'dp' or 'dp,tp' integers")
    if not 1 <= len(parts) <= 2 or any(v < 1 for v in parts):
        raise SystemExit(
            f"--mesh {args.mesh!r}: expected 1-2 positive values 'dp[,tp]'"
        )
    axes = {"data": parts[0]}
    if len(parts) > 1 and parts[1] > 1:
        axes["model"] = parts[1]
    return axes


def resolve_asset(path: str) -> str:
    """Resolve an input path against the bundled asset set.

    The reference ships 11 sample images in `assets/` and defaults to
    `assets/tench.jpg` (/root/reference/dinov2.h:65). This repo does not copy
    those binaries; if `path` does not exist locally, look it up (by its
    relative path, then basename) under $DINOV2_TPU_ASSETS — defaulting to the
    mounted reference checkout's assets directory — so the stock CLI
    invocation works out of the box against the reference fixture set.

    Only the documented default-input form — a relative path under
    `assets/` — takes the fixture fallback: a missing absolute path OR any
    other missing relative path (e.g. `photos/tench.jpg` run from the wrong
    directory) is a user error, and silently substituting a same-named
    bundled photo would classify the wrong image. Callers get the path back
    unchanged and fail with the honest file-not-found."""
    import os

    if os.path.exists(path) or os.path.isabs(path):
        return path
    if not path.replace(os.sep, "/").startswith("assets/"):
        return path
    root = os.environ.get("DINOV2_TPU_ASSETS", "/root/reference/assets")
    for cand in (
        os.path.join(os.path.dirname(root), path),  # e.g. assets/tench.jpg
        os.path.join(root, os.path.basename(path)),
    ):
        if os.path.exists(cand):
            return cand
    return path


def load_image_rgb(path: str):
    """Read an image as RGB uint8 (quirk Q1 lives in loader.decode_rgb — one
    home). Paths that don't exist locally resolve against the bundled assets."""
    from dinov2_tpu.runtime.loader import decode_rgb

    try:
        return decode_rgb(resolve_asset(path))
    except ValueError as e:
        raise FileNotFoundError(str(e)) from None


def save_image_rgb(path: str, img_rgb) -> None:
    import cv2

    # cv2.imwrite reports failure (missing directory, bad extension) by
    # RETURNING False — swallowing it lets callers print "wrote <path>" for
    # a file that does not exist
    if not cv2.imwrite(path, cv2.cvtColor(img_rgb, cv2.COLOR_RGB2BGR)):
        raise OSError(f"failed to write image: {path}")

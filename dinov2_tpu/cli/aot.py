"""`dinov2-aot` — export / inspect / run AOT deployment artifacts.

Offline-compile story the reference lacks (it rebuilds the ggml graph every
predict call, /root/reference/dinov2.cpp:900-910): `export` traces + lowers
the jitted forward ONCE at a fixed shape bucket and writes a self-describing
StableHLO artifact (runtime/aot.py); `info` prints an artifact's header
without touching jax; `run` loads artifact + GGUF weights and classifies an
image through the serialized program — the serving path with zero
model-building Python.

    dinov2-aot export -m model.gguf --batch 64 -o model.aot
    dinov2-aot info model.aot
    dinov2-aot run model.aot -m model.gguf -i assets/tench.jpg
"""

from __future__ import annotations

import argparse
import json
import sys


def _add_model_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("-m", "--model", required=True, help="model path (GGUF)")
    p.add_argument("--parity", choices=["reference", "hf"], default="reference")
    p.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    p.add_argument("--quant-mode", choices=["dequant", "fused"], default="dequant")
    p.add_argument("-fa", "--flash-attn", action="store_true",
                   help="force the flash-attention path (default: per-shape auto)")


_DTYPES = {"bf16": "bfloat16", "f32": "float32"}


def _load(model: str, dtype_name: str, quant_mode: str, parity: str = "reference",
          flash_attn: bool = False):
    import jax.numpy as jnp

    from dinov2_tpu.models.params import load_params
    from dinov2_tpu.models.vit import ModelOptions

    dtype = getattr(jnp, _DTYPES[dtype_name])
    loaded = load_params(model, dtype=dtype, quant_mode=quant_mode)
    opts = ModelOptions(
        parity=parity,
        compute_dtype=dtype,
        flash_attention=True if flash_attn else "auto",
    )
    return loaded, opts


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("export", help="trace+lower the forward, write an artifact")
    _add_model_flags(pe)
    pe.add_argument("--batch", type=int, default=1)
    pe.add_argument("--size", default="224x224", metavar="HxW",
                    help="preprocessed input size (classify default 224x224; "
                    "feature mode: the Q4 one-extra-patch size for your input)")
    pe.add_argument("--features", action="store_true",
                    help="export the feature tap instead of the classify head")
    pe.add_argument("--platforms", default="tpu,cpu",
                    help="comma-separated lowering targets (default tpu,cpu)")
    pe.add_argument("-o", "--out", default="model.aot")

    pi = sub.add_parser("info", help="print an artifact's JSON header")
    pi.add_argument("artifact")

    pr = sub.add_parser(
        "run",
        help="classify an image through an artifact (weight dtype, quant "
        "layout, and numerics come from the artifact header — the serialized "
        "program fixed them at export time)",
    )
    pr.add_argument("artifact")
    pr.add_argument("-m", "--model", required=True, help="model path (GGUF)")
    pr.add_argument("-i", "--inp", default="assets/tench.jpg")
    pr.add_argument("-k", "--topk", type=int, default=5)

    args = parser.parse_args(argv)

    if args.cmd == "info":
        from dinov2_tpu.runtime.aot import aot_info

        print(json.dumps(aot_info(args.artifact), indent=2, sort_keys=True))
        return 0

    if args.cmd == "export":
        from dinov2_tpu.runtime.aot import export_forward, save_artifact

        try:
            h, w = (int(v) for v in args.size.lower().split("x"))
        except ValueError:
            raise SystemExit(f"--size {args.size!r}: expected HxW integers")
        platforms = tuple(
            p.strip() for p in args.platforms.split(",") if p.strip()
        )
        if not platforms:
            raise SystemExit(f"--platforms {args.platforms!r}: nothing to lower for")
        loaded, opts = _load(args.model, args.dtype, args.quant_mode,
                             args.parity, args.flash_attn)
        data = export_forward(
            loaded.params,
            loaded.config,
            opts,
            batch=args.batch,
            height=h,
            width=w,
            classify=not args.features,
            platforms=platforms,
            # run-time loading recipe: the artifact's program is fixed, so
            # `run` must rebuild the SAME param pytree (dtype + quant layout)
            extra_meta={"load": {"dtype": args.dtype, "quant_mode": args.quant_mode}},
        )
        save_artifact(args.out, data)
        print(
            f"wrote {args.out} ({len(data) / 1024:.0f} KiB, "
            f"platforms={args.platforms}, batch={args.batch}, {h}x{w}, "
            f"{'features' if args.features else 'classify'})",
            file=sys.stderr,
        )
        return 0

    # run
    import numpy as np

    from dinov2_tpu.cli._common import load_image_rgb
    from dinov2_tpu.image.preprocess import classify_preprocess, feature_preprocess
    from dinov2_tpu.runtime.aot import load_artifact

    art = load_artifact(args.artifact)
    load_spec = art.meta.get("load", {})
    loaded, _ = _load(
        args.model,
        load_spec.get("dtype", "bf16"),
        load_spec.get("quant_mode", "dequant"),
    )
    meta = art.meta["input"]
    img = load_image_rgb(args.inp)
    if art.meta["classify"]:
        x = classify_preprocess(img)
    else:
        x = feature_preprocess(img, art.meta["model"]["patch_size"])
    if x.shape != (meta["height"], meta["width"], 3):
        raise SystemExit(
            f"preprocessed input {x.shape[:2]} does not match the artifact's "
            f"({meta['height']}, {meta['width']}) bucket — export an artifact "
            f"for this size"
        )
    batch = np.broadcast_to(np.asarray(x)[None], (meta["batch"], *x.shape))
    out = art(loaded.params, batch)
    if art.meta["classify"]:
        probs = np.asarray(out["probs"][0])
        order = np.argsort(probs)[::-1][: args.topk]
        id2label = loaded.id2label or {}
        print(file=sys.stderr)
        for idx in order:
            label = id2label.get(int(idx), str(int(idx)))
            print(f" > {label} : {probs[idx]:.2f}")
    else:
        feats = np.asarray(out["patch_tokens"][0])
        print(f"patch tokens: {feats.shape}, cls: {np.asarray(out['cls_token'][0]).shape}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

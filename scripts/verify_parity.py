"""Verify this framework's outputs against HuggingFace transformers for a real
checkpoint (the oracle the reference project benchmarks against, SURVEY.md §4).

Usage:
  python scripts/verify_parity.py --model_name facebook/dinov2-small-imagenet1k-1-layer \
      [--gguf ggml-model-f16.gguf] [--image /path/img.jpg]

Loads the HF model (downloads or local dir), converts it to GGUF if no --gguf is
given, runs both forwards on the same normalized input, and reports max abs
diffs for CLS features, patch tokens, and softmax probs, plus top-5 agreement.
Exit code 0 iff parity holds within fp16-storage tolerances.
"""

from __future__ import annotations

import argparse
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


LOCAL_SIZES = {
    "small": dict(hidden_size=384, num_hidden_layers=12, num_attention_heads=6),
    "base": dict(hidden_size=768, num_hidden_layers=12, num_attention_heads=12),
    "large": dict(hidden_size=1024, num_hidden_layers=24, num_attention_heads=16),
    "giant": dict(
        hidden_size=1536, num_hidden_layers=40, num_attention_heads=24,
        use_swiglu_ffn=True,
    ),
}


def _build_local(size: str, registers: bool, classifier: bool):
    """HF DINOv2 at REAL dims, randomly initialized (no network). Measures the
    compute-path parity exactly — op-for-op numerics are weight-value
    independent in distribution, and the fp16 rounding below matches the GGUF
    storage contract either way."""
    import torch
    from transformers import (
        Dinov2Config,
        Dinov2ForImageClassification,
        Dinov2Model,
        Dinov2WithRegistersConfig,
        Dinov2WithRegistersForImageClassification,
        Dinov2WithRegistersModel,
    )

    torch.manual_seed(0)
    kw = dict(image_size=518, patch_size=14, num_labels=1000, **LOCAL_SIZES[size])
    if registers:
        cfg = Dinov2WithRegistersConfig(num_register_tokens=4, **kw)
        cls = Dinov2WithRegistersForImageClassification if classifier else Dinov2WithRegistersModel
    else:
        cfg = Dinov2Config(**kw)
        cls = Dinov2ForImageClassification if classifier else Dinov2Model
    return cls(cfg)


def _find_auto_checkpoint() -> tuple[Path | None, str]:
    """Locate a real pretrained DINOv2 checkpoint without network access.

    Order: $DINOV2_TPU_HF_DIR (a model dir with config.json, or an HF-cache
    root), then the standard HF caches ($HF_HOME, ~/.cache/huggingface).
    Returns (model_dir, reason-if-none)."""
    import os

    def is_model_dir(d: Path) -> bool:
        return (d / "config.json").exists() and (
            any(d.glob("*.safetensors")) or (d / "pytorch_model.bin").exists()
        )

    def scan_cache(root: Path) -> Path | None:
        hub = root / "hub" if (root / "hub").exists() else root
        for repo in sorted(hub.glob("models--*dinov2*")):
            for snap in sorted((repo / "snapshots").glob("*")):
                if is_model_dir(snap):
                    return snap
        return None

    env_dir = os.environ.get("DINOV2_TPU_HF_DIR")
    tried = []
    if env_dir:
        d = Path(env_dir)
        if is_model_dir(d):
            return d, ""
        found = scan_cache(d) if d.exists() else None
        if found:
            return found, ""
        tried.append(f"DINOV2_TPU_HF_DIR={env_dir} ({'no config.json/weights found' if d.exists() else 'does not exist'})")
    for root in (
        Path(os.environ.get("HF_HOME", "")) if os.environ.get("HF_HOME") else None,
        Path.home() / ".cache" / "huggingface",
    ):
        if root is None:
            continue
        if not root.exists():
            tried.append(f"{root} (absent)")
            continue
        found = scan_cache(root)
        if found:
            return found, ""
        tried.append(f"{root} (no dinov2 snapshots)")
    return None, "no real DINOv2 checkpoint found; tried: " + "; ".join(tried)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_name", default="facebook/dinov2-small-imagenet1k-1-layer")
    p.add_argument(
        "--auto", action="store_true",
        help="driver-runnable real-weights gate (VERDICT r3 item 3): "
        "auto-detect a cached HF checkpoint ($DINOV2_TPU_HF_DIR or the HF "
        "cache); if found, run the full f32 parity check plus bf16 and "
        "q4_0/q8_0 quantized-inference legs on the real weights and exit "
        "non-zero on any breach; if not, print exactly why and exit 0.",
    )
    p.add_argument("--gguf", default=None, help="existing GGUF (else convert fresh)")
    p.add_argument("--image", default=None, help="image to test on (else random input)")
    p.add_argument("--tolerance", type=float, default=5e-3)
    p.add_argument(
        "--local-random", default=None, choices=list(LOCAL_SIZES),
        help="build the HF oracle locally at this size with random weights "
        "(egress-free parity measurement at real dimensions)",
    )
    p.add_argument("--registers", action="store_true",
                   help="with --local-random: use the with-registers variant")
    p.add_argument("--backbone", action="store_true",
                   help="with --local-random: backbone (features) instead of classifier")
    p.add_argument("--dtype", default="f32", choices=["f32", "bf16"],
                   help="this framework's compute dtype for the comparison")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the axon TPU plugin overrides "
                   "JAX_PLATFORMS=cpu; this uses the config knob, which wins)")
    args = p.parse_args(argv)

    if args.auto and args.dtype != "f32":
        # the robustness legs compare against the f32 reference pass; with
        # --dtype bf16 that pass IS bf16, making the bf16 leg a vacuous
        # self-comparison while the main report compares bf16 output against
        # the torch oracle at the f32 tolerance — a spurious MISMATCH
        raise SystemExit("--auto requires --dtype f32 (its legs are pinned "
                         "to an f32 reference pass)")

    if args.auto:
        ckpt, reason = _find_auto_checkpoint()
        if ckpt is None:
            print(f"SKIPPED: {reason}")
            print(
                "To run: set DINOV2_TPU_HF_DIR to a local "
                "facebook/dinov2-* model dir (config.json + weights), or "
                "populate the HF cache."
            )
            return 0
        args.model_name = str(ckpt)
        args.local_random = None
        print(f"auto: real checkpoint at {ckpt}", file=sys.stderr)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import torch

    import jax.numpy as jnp

    from dinov2_tpu.models.params import load_params
    from dinov2_tpu.models.vit import ModelOptions, forward

    if args.local_random:
        is_classifier = not args.backbone
        model = _build_local(args.local_random, args.registers, is_classifier)
    else:
        if Path(args.model_name).is_dir():
            import json

            arch = json.loads(
                (Path(args.model_name) / "config.json").read_text()
            ).get("architectures", [""])
            is_classifier = any("Classification" in a for a in arch)
        else:
            is_classifier = "imagenet" in args.model_name
        if is_classifier:
            from transformers import AutoModelForImageClassification

            model = AutoModelForImageClassification.from_pretrained(args.model_name)
        else:
            from transformers import AutoModel

            model = AutoModel.from_pretrained(args.model_name)
    model.eval()
    # GGUF stores ONLY 2D weights as fp16 — 1D tensors, position embeddings,
    # cls/register tokens stay f32 (io/convert.py:53, _F32_KEEP). Round the
    # torch side by the same rule so the comparison isolates compute
    # differences; rounding everything would perturb exactly the tensors a
    # user-supplied --gguf deliberately kept f32.
    _keep_f32 = ("position_embeddings", "cls_token", "register_tokens")
    with torch.no_grad():
        for name, param in model.named_parameters():
            if param.ndim >= 2 and not any(k in name for k in _keep_f32):
                param.copy_(param.half().float())

    if args.gguf:
        gguf_path = Path(args.gguf)
    else:
        from dinov2_tpu.io.convert import convert_hf_model

        gguf_path = Path(tempfile.mkdtemp()) / "verify.gguf"
        convert_hf_model(model, gguf_path)
        print(f"converted -> {gguf_path}", file=sys.stderr)

    compute_dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16}[args.dtype]
    loaded = load_params(gguf_path, dtype=compute_dtype)
    size = 224
    if args.image:
        import cv2

        from dinov2_tpu.image.preprocess import classify_preprocess

        img = cv2.cvtColor(cv2.imread(args.image), cv2.COLOR_BGR2RGB)
        pre = np.asarray(classify_preprocess(jnp.asarray(img[None])))
        pixel_values = torch.from_numpy(pre.transpose(0, 3, 1, 2))
    else:
        torch.manual_seed(0)
        size = loaded.config.img_size
        pixel_values = torch.randn(1, 3, size, size)

    with torch.no_grad():
        torch_out = model(pixel_values, output_hidden_states=not is_classifier)

    opts = ModelOptions(parity="hf", compute_dtype=compute_dtype)
    jax_out = forward(
        loaded.params,
        jnp.asarray(pixel_values.numpy().transpose(0, 2, 3, 1)),
        loaded.config,
        opts,
        classify=is_classifier and loaded.has_classifier,
    )

    ok = True

    def report(name, got, want):
        nonlocal ok
        diff = float(np.abs(np.asarray(got) - want).max())
        good = diff <= args.tolerance
        ok &= good
        print(f"{name:14s} max|Δ| = {diff:.6f}  {'OK' if good else 'MISMATCH'}")

    if is_classifier:
        want = torch.softmax(torch_out.logits, dim=-1).numpy()
        report("probs", jax_out["probs"], want)
        got_top5 = np.asarray(jax_out["probs"])[0].argsort()[::-1][:5]
        want_top5 = want[0].argsort()[::-1][:5]
        agree = (got_top5 == want_top5).all()
        ok &= bool(agree)
        print(f"top-5 ids     {'match' if agree else 'DIFFER'}: {got_top5.tolist()}")
    else:
        hidden = torch_out.last_hidden_state.numpy()
        report("cls_token", jax_out["cls_token"], hidden[:, 0])
        r = loaded.config.num_register_tokens
        report("patch_tokens", jax_out["patch_tokens"], hidden[:, 1 + r :])

    if args.auto and ok:
        # Real-weights robustness legs (VERDICT r3 item 3): the f32 parity
        # above proves the compute path; these prove the REDUCED-precision
        # paths hold up under real activation statistics — the exact unknown
        # the synthetic outlier-channel test only proxies.
        x_jax = jnp.asarray(pixel_values.numpy().transpose(0, 2, 3, 1))

        def leg(name, loaded_leg, dtype, ref_vec):
            nonlocal ok
            o = forward(
                loaded_leg.params, x_jax, loaded_leg.config,
                ModelOptions(parity="hf", compute_dtype=dtype),
                classify=is_classifier and loaded_leg.has_classifier,
            )
            if is_classifier:
                got = np.asarray(o["probs"])[0]
                good = int(got.argmax()) == int(ref_vec.argmax())
                extra = f"top1 {'match' if good else 'DIFFERS'}"
            else:
                got = np.asarray(o["cls_token"])[0].astype(np.float64)
                ref = ref_vec.astype(np.float64)
                cos = float(
                    (got @ ref)
                    / max(np.linalg.norm(got) * np.linalg.norm(ref), 1e-30)
                )
                good = cos >= 0.99
                extra = f"cls cosine {cos:.5f}"
            ok &= good
            print(f"{name:14s} {extra}  {'OK' if good else 'MISMATCH'}")

        ref_vec = (
            np.asarray(jax_out["probs"])[0]
            if is_classifier
            else np.asarray(jax_out["cls_token"])[0]
        )
        leg("bf16", loaded, jnp.bfloat16, ref_vec)
        from dinov2_tpu.quant.quantize import quantize_gguf

        # derived quant checkpoints go to a temp dir, never next to a
        # user-supplied --gguf (read-only model dirs; name collisions), and
        # the dir is removed afterwards (GBs per run at large/giant)
        import shutil

        qdir = Path(tempfile.mkdtemp(prefix="verify-quant-"))
        try:
            for qt in ("q4_0", "q8_0"):
                qpath = qdir / f"verify.{qt}.gguf"
                quantize_gguf(gguf_path, qpath, qt)
                lq = load_params(qpath, dtype=jnp.float32, quant_mode="fused")
                leg(qt, lq, jnp.float32, ref_vec)
        finally:
            shutil.rmtree(qdir, ignore_errors=True)

    print("PARITY OK" if ok else "PARITY FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

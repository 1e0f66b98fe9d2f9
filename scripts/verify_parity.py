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


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_name", default="facebook/dinov2-small-imagenet1k-1-layer")
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
        is_classifier = "imagenet" in args.model_name
        if is_classifier:
            from transformers import AutoModelForImageClassification

            model = AutoModelForImageClassification.from_pretrained(args.model_name)
        else:
            from transformers import AutoModel

            model = AutoModel.from_pretrained(args.model_name)
    model.eval()
    # GGUF stores 2D weights as fp16: round the torch side identically so the
    # comparison isolates compute differences
    with torch.no_grad():
        for param in model.parameters():
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

    print("PARITY OK" if ok else "PARITY FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

"""scripts/verify_parity.py end-to-end with a locally-saved HF checkpoint
(no network: from_pretrained on a directory)."""

import subprocess
import sys
from pathlib import Path

import torch

REPO = Path(__file__).resolve().parent.parent


def test_verify_parity_local_checkpoint(tmp_path):
    from transformers import Dinov2Config, Dinov2ForImageClassification

    torch.manual_seed(5)
    cfg = Dinov2Config(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, image_size=28, patch_size=7, num_labels=5,
        attn_implementation="eager",
    )
    cfg.id2label = {i: f"c{i}" for i in range(5)}
    model = Dinov2ForImageClassification(cfg)
    # the script keys classifier handling off "imagenet" in the name
    local = tmp_path / "dinov2-tiny-imagenet-local"
    model.save_pretrained(local)

    r = subprocess.run(
        [
            sys.executable,
            str(REPO / "scripts" / "verify_parity.py"),
            "--model_name", str(local),
        ],
        capture_output=True, text=True, timeout=900,
        env={"PATH": "/usr/bin:/bin:/usr/local/bin", "JAX_PLATFORMS": "cpu",
             "HOME": "/root", "HF_HUB_OFFLINE": "1"},
    )
    assert r.returncode == 0, (r.stdout + r.stderr)[-3000:]
    assert "PARITY OK" in r.stdout


def test_verify_parity_local_random_mode(monkeypatch):
    """--local-random builds the HF oracle at the configured dims with no
    network (the mode that generated docs/PARITY.md's tolerance table)."""
    sys.path.insert(0, str(REPO / "scripts"))
    try:
        import verify_parity
    finally:
        sys.path.pop(0)
    monkeypatch.setitem(
        verify_parity.LOCAL_SIZES,
        "tiny",
        dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
             intermediate_size=64),
    )
    rc = verify_parity.main(
        ["--cpu", "--local-random", "tiny", "--registers", "--backbone"]
    )
    assert rc == 0


def test_find_auto_checkpoint_requires_config(tmp_path, monkeypatch):
    """A dir with weights but no config.json (partial download) must be
    rejected by --auto's detector, not crash main() later on a missing
    config read."""
    import importlib
    import sys

    sys.path.insert(0, str(REPO / "scripts"))
    try:
        verify_parity = importlib.import_module("verify_parity")
    finally:
        sys.path.pop(0)

    weights_only = tmp_path / "snap"
    weights_only.mkdir()
    (weights_only / "pytorch_model.bin").write_bytes(b"\x00")
    monkeypatch.setenv("DINOV2_TPU_HF_DIR", str(weights_only))
    monkeypatch.delenv("HF_HOME", raising=False)
    # isolate the Path.home() fallback too: on a machine whose real
    # ~/.cache/huggingface holds a dinov2 snapshot the scan would find it
    monkeypatch.setenv("HOME", str(tmp_path))
    ckpt, reason = verify_parity._find_auto_checkpoint()
    assert ckpt is None
    assert "no real DINOv2 checkpoint" in reason

    (weights_only / "config.json").write_text("{}")
    ckpt, _ = verify_parity._find_auto_checkpoint()
    assert ckpt == weights_only

"""Threaded batch loader + eval CLI tests."""

import json
import subprocess
import threading
import sys
from pathlib import Path

import cv2
import numpy as np
import pytest

from dinov2_tpu.runtime.loader import BatchLoader, list_images

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture
def image_dir(tmp_path, rng):
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(7):
        img = rng.integers(0, 256, (60 + i, 80, 3), dtype=np.uint8)
        cv2.imwrite(str(d / f"img_{i}.jpg"), img)
    (d / "notes.txt").write_text("ignored")
    return d


def test_list_images(image_dir):
    paths = list_images(image_dir)
    assert len(paths) == 7
    assert all(p.suffix == ".jpg" for p in paths)


def test_batch_loader_shapes_and_order(image_dir):
    loader = BatchLoader(list_images(image_dir), batch_size=3, size=(64, 64))
    batches = list(loader)
    assert len(batches) == 3
    sizes = [b[1].shape for b in batches]
    assert sizes[0] == (3, 64, 64, 3) and sizes[2] == (1, 64, 64, 3)
    names = [p.name for paths, _ in batches for p in paths]
    assert names == sorted(names)


def test_eval_cli(image_dir, tmp_path):
    from dinov2_tpu.io.synthetic import write_synthetic_gguf
    from dinov2_tpu.models.config import DinoConfig

    ckpt = tmp_path / "m.gguf"
    write_synthetic_gguf(
        ckpt,
        DinoConfig(hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
                   num_classes=4, patch_size=14, img_size=70),
        seed=3,
    )
    labels = {f"img_{i}.jpg": i % 4 for i in range(7)}
    labels_path = tmp_path / "labels.json"
    labels_path.write_text(json.dumps(labels))
    out_path = tmp_path / "results.jsonl"

    script = (
        "import sys, jax; jax.config.update('jax_platforms','cpu'); "
        f"sys.path.insert(0, {str(REPO)!r}); "
        "from dinov2_tpu.cli import eval as ev; "
        f"sys.exit(ev.main(['-m', {str(ckpt)!r}, '--dir', {str(image_dir)!r}, "
        f"'--labels', {str(labels_path)!r}, '--output', {str(out_path)!r}, "
        f"'--batch', '4', '--dtype', 'f32']))"
    )
    r = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=600
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "top-1" in r.stderr and "img/s" in r.stderr
    lines = [json.loads(line) for line in out_path.read_text().splitlines()]
    assert len(lines) == 7
    assert all(len(rec["topk"]) == 4 for rec in lines)  # topk capped by classes


def test_batch_loader_decode_error_raises_not_hangs(image_dir, tmp_path):
    """A corrupt file must surface as an exception in the consumer, not a hang
    (the producer thread always enqueues its sentinel/error marker)."""
    bad = image_dir / "img_zz_bad.jpg"
    bad.write_bytes(b"definitely not a jpeg")
    loader = BatchLoader(list_images(image_dir), batch_size=4, size=(64, 64))

    result = {}

    def consume():
        try:
            list(loader)
            result["outcome"] = "no-error"
        except ValueError as e:
            result["outcome"] = "raised"
            result["msg"] = str(e)

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    t.join(timeout=60)
    assert not t.is_alive(), "consumer hung on a corrupt image"
    assert result["outcome"] == "raised" and "img_zz_bad" in result["msg"]


def test_batch_loader_cubic_float_matches_reference_order(image_dir):
    """interpolation='cubic-float' must equal the reference preprocessing order:
    float32/255 FIRST, then cv2.INTER_CUBIC (dinov2.cpp:106-121) — not a uint8
    resize."""
    paths = list_images(image_dir)[:2]
    loader = BatchLoader(paths, batch_size=2, size=(256, 256),
                         interpolation="cubic-float")
    (batch_paths, images), = list(loader)
    assert images.dtype == np.float32 and images.shape == (2, 256, 256, 3)

    from dinov2_tpu.runtime.loader import decode_rgb
    for i, p in enumerate(batch_paths):
        ref = decode_rgb(p).astype(np.float32) / 255.0
        ref = cv2.resize(ref, (256, 256), interpolation=cv2.INTER_CUBIC)
        np.testing.assert_array_equal(images[i], ref)


def test_swiglu_hidden_inferred_from_weights(tmp_path):
    """A SwiGLU checkpoint whose FFN hidden size deviates from the HF sizing
    rule must load with the REAL dim in config.swiglu_hidden: init_params /
    write_synthetic_gguf built from that config would otherwise silently use
    formula-shaped GEMMs."""
    from dinov2_tpu.io.synthetic import write_synthetic_gguf
    from dinov2_tpu.models.config import DinoConfig
    from dinov2_tpu.models.params import load_params

    cfg = DinoConfig(hidden_size=64, num_hidden_layers=1, num_attention_heads=2,
                     num_classes=0, patch_size=14, img_size=70,
                     use_swiglu_ffn=True, swiglu_hidden=96)  # formula says 176
    path = write_synthetic_gguf(tmp_path / "sw.gguf", cfg, seed=1)

    # strip the hint KVs a foreign writer might omit: infer from weights alone
    from dinov2_tpu.io.gguf import GGUFReader, write_gguf

    with GGUFReader(path) as r:
        kv = {k: v for k, v in r.kv.items() if k != "swiglu_hidden"}
        stripped = tmp_path / "sw2.gguf"
        write_gguf(stripped, kv, dict(r.tensors),
                   kv_types=r.kv_types, kv_array_types=r.kv_array_types)

    loaded = load_params(stripped, dtype="float32")
    assert loaded.config.swiglu_hidden == 96
    assert loaded.config.swiglu_hidden_dim == 96
    assert loaded.params["layers"]["mlp"]["win"]["kernel"].shape[-1] == 2 * 96

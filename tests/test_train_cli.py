"""End-to-end fine-tune test: train on a separable synthetic dataset, export to
GGUF, reload with the inference engine, verify the classes are learned."""

import subprocess
import sys
from pathlib import Path

import cv2
import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture
def dataset(tmp_path, rng):
    """Two trivially separable classes: red-ish vs blue-ish images."""
    root = tmp_path / "data"
    for name, base in [("blue", (40, 40, 200)), ("red", (200, 40, 40))]:
        d = root / name
        d.mkdir(parents=True)
        for i in range(12):
            img = np.clip(
                np.asarray(base, np.int16)
                + rng.integers(-30, 30, (64, 64, 3)),
                0, 255,
            ).astype(np.uint8)
            cv2.imwrite(str(d / f"{i}.png"), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    return root


def test_train_export_classify(dataset, tmp_path, rng):
    from dinov2_tpu.io.synthetic import write_synthetic_gguf
    from dinov2_tpu.models.config import DinoConfig

    ckpt = tmp_path / "backbone.gguf"
    write_synthetic_gguf(
        ckpt,
        DinoConfig(hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
                   num_classes=0, patch_size=14, img_size=70),
        seed=3,
        with_classifier=False,
    )
    out = tmp_path / "tuned.gguf"
    ckdir = tmp_path / "ckpts"

    script = (
        "import sys, jax; jax.config.update('jax_platforms','cpu'); "
        f"sys.path.insert(0, {str(REPO)!r}); "
        "from dinov2_tpu.cli import train; "
        f"sys.exit(train.main(['-m', {str(ckpt)!r}, '--data', {str(dataset)!r}, "
        f"'--epochs', '4', '--batch', '8', '--lr', '3e-3', "
        f"'--checkpoint-dir', {str(ckdir)!r}, '--export', {str(out)!r}, "
        f"'--log-every', '2']))"
    )
    r = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=900
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert out.exists()
    assert any(ckdir.iterdir())

    # reload the exported GGUF with the engine and check the learned classes
    import jax.numpy as jnp

    from dinov2_tpu.runtime.engine import DinoEngine

    engine = DinoEngine(out, dtype=jnp.float32, parity="hf")
    assert engine.id2label == {0: "blue", 1: "red"}
    blue = np.clip(
        np.asarray((40, 40, 200), np.int16) + rng.integers(-30, 30, (64, 64, 3)),
        0, 255,
    ).astype(np.uint8)
    red = np.clip(
        np.asarray((200, 40, 40), np.int16) + rng.integers(-30, 30, (64, 64, 3)),
        0, 255,
    ).astype(np.uint8)
    results = engine.classify([blue, red], topk=1)
    assert results[0][0][0] == "blue"
    assert results[1][0][0] == "red"


def test_train_ships_uint8_batches(dataset, tmp_path, monkeypatch):
    """classify_preprocess divides by 255 only for uint8 input, so the train
    loop must hand the step uint8 frames: a float32 [0,255] batch skips the
    divide and fine-tunes the backbone on inputs 255x off-distribution (the
    e2e test can't catch it — separable toy classes learn anyway)."""
    import dinov2_tpu.parallel.train as ptrain
    from dinov2_tpu.cli import train as train_cli
    from dinov2_tpu.io.synthetic import write_synthetic_gguf
    from dinov2_tpu.models.config import DinoConfig

    ckpt = tmp_path / "b.gguf"
    write_synthetic_gguf(
        ckpt,
        DinoConfig(hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
                   num_classes=0, patch_size=14, img_size=70),
        seed=3,
        with_classifier=False,
    )

    dtypes = []
    real = ptrain.make_trainer

    def spy(*a, **k):
        trainer = real(*a, **k)
        orig = trainer.step

        def step(params, opt_state, images, labels):
            dtypes.append(np.asarray(images).dtype)
            return orig(params, opt_state, images, labels)

        trainer.step = step
        return trainer

    monkeypatch.setattr(ptrain, "make_trainer", spy)
    rc = train_cli.main(
        ["-m", str(ckpt), "--data", str(dataset), "--epochs", "1", "--batch", "8"]
    )
    assert rc == 0
    assert dtypes and all(dt == np.uint8 for dt in dtypes), dtypes


def test_train_refuses_dataset_smaller_than_batch(dataset, tmp_path):
    """With fewer samples than --batch the drop-last loop runs ZERO steps and
    --export would write the random-init classifier; refuse loudly instead."""
    from dinov2_tpu.cli import train as train_cli
    from dinov2_tpu.io.synthetic import write_synthetic_gguf
    from dinov2_tpu.models.config import DinoConfig

    ckpt = tmp_path / "b.gguf"
    write_synthetic_gguf(
        ckpt,
        DinoConfig(hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
                   num_classes=0, patch_size=14, img_size=70),
        seed=3,
        with_classifier=False,
    )
    with pytest.raises(SystemExit, match="lower --batch"):
        train_cli.main(
            ["-m", str(ckpt), "--data", str(dataset), "--batch", "999"]
        )

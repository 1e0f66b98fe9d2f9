"""Whole-framework lifecycle in one test: checkpoint -> quantize -> fused
engine -> HTTP serving -> fine-tune -> GGUF export -> reload -> classify.

Each stage is covered by its own suite; this chains them end-to-end the way a
user would (the reference's full workflow, SURVEY.md §3, plus the training/
serving capabilities the reference lacks)."""

import json
import threading
import urllib.request

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from dinov2_tpu.io.synthetic import write_synthetic_gguf
from dinov2_tpu.models.config import DinoConfig
from dinov2_tpu.quant.quantize import quantize_gguf
from dinov2_tpu.runtime.engine import DinoEngine

CFG = DinoConfig(
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=2,
    num_classes=3,
    patch_size=14,
    img_size=70,
)


def test_full_lifecycle(tmp_path, rng):
    # 1. checkpoint (stands in for the HF->GGUF conversion, same writer path)
    fp = write_synthetic_gguf(tmp_path / "model.gguf", CFG, seed=21)

    # 2. quantize -> fused-quant engine classifies
    qp = tmp_path / "model.q4_0.gguf"
    quantize_gguf(fp, qp, "q4_0")
    imgs = rng.integers(0, 256, (4, 70, 70, 3), dtype=np.uint8)
    engine = DinoEngine(qp, dtype=jnp.float32, quant_mode="fused")
    probs = engine.classify_probs(imgs)
    assert probs.shape == (4, 3) and np.isfinite(probs).all()

    # 3. serve it over HTTP (classify + features through the batcher)
    from dinov2_tpu.runtime.server import BatchingServer

    srv = BatchingServer(engine, port=0, max_wait_ms=5.0)
    srv.start()
    try:
        ok, buf = cv2.imencode(".jpg", imgs[0])
        assert ok
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/classify",
            data=buf.tobytes(), method="POST",
        )
        with urllib.request.urlopen(req, timeout=600) as resp:
            out = json.loads(resp.read())
        assert len(out["topk"]) == 3
    finally:
        srv.stop()

    # 4. fine-tune the fp16 checkpoint a few steps (loss decreases)
    from dinov2_tpu.models.params import load_params
    from dinov2_tpu.models.vit import ModelOptions
    from dinov2_tpu.parallel.train import make_trainer

    loaded = load_params(fp, dtype=jnp.float32)
    trainer = make_trainer(
        CFG, mesh=None, learning_rate=1e-3,
        opts=ModelOptions(parity="hf", compute_dtype=jnp.float32),
        preprocess_in_step=False,
    )
    params, opt_state = trainer.place(loaded.params)
    x = rng.standard_normal((6, 70, 70, 3)).astype(np.float32)
    y = rng.integers(0, 3, (6,))
    losses = []
    for _ in range(4):
        params, opt_state, metrics = trainer.step(params, opt_state, x, y)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]

    # 5. export the tuned params back to GGUF, reload, classify
    from dinov2_tpu.io.export import export_gguf

    out_path = tmp_path / "tuned.gguf"
    export_gguf(out_path, params, CFG, id2label={i: f"c{i}" for i in range(3)})
    tuned = DinoEngine(out_path, dtype=jnp.float32)
    topk = tuned.classify(imgs[:2], topk=2)
    assert len(topk) == 2 and all(len(t) == 2 for t in topk)
    assert all(label.startswith("c") for t in topk for label, _ in t)

    # 6. the exported file also re-quantizes (full circle)
    qp2 = tmp_path / "tuned.q8_0.gguf"
    quantize_gguf(out_path, qp2, "q8_0")
    probs2 = DinoEngine(qp2, dtype=jnp.float32).classify_probs(imgs[:2])
    assert np.isfinite(probs2).all()

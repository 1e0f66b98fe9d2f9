"""CLI smoke tests on the bundled reference assets (SURVEY.md §4 item 4)."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from dinov2_tpu.io.synthetic import write_synthetic_gguf
from dinov2_tpu.models.config import DinoConfig

REPO = Path(__file__).resolve().parent.parent
ASSETS = Path("/root/reference/assets")

TINY = DinoConfig(
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=2,
    num_classes=4,
    patch_size=14,
    img_size=70,
)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    path = tmp_path_factory.mktemp("cli") / "tiny.gguf"
    return write_synthetic_gguf(path, TINY, seed=3)


def _run(args):
    env_script = (
        "import sys, jax; jax.config.update('jax_platforms','cpu'); "
        f"sys.path.insert(0, {str(REPO)!r}); "
        "from dinov2_tpu.cli import inference, realtime, quantize as q; "
    )
    return subprocess.run(
        [sys.executable, "-c", env_script + args],
        capture_output=True,
        text=True,
        timeout=600,
    )


@pytest.mark.skipif(not ASSETS.exists(), reason="reference assets not mounted")
def test_inference_classify_cli(ckpt, tmp_path):
    r = _run(
        f"sys.exit(inference.main(['-m', {str(ckpt)!r}, '-i', "
        f"{str(ASSETS / 'tench.jpg')!r}, '-c', '--dtype', 'f32']))"
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "graph computation took" in r.stderr
    assert " > class_" in r.stdout


@pytest.mark.skipif(not ASSETS.exists(), reason="reference assets not mounted")
def test_inference_pca_cli(ckpt, tmp_path):
    out = tmp_path / "pca.jpg"
    r = _run(
        f"sys.exit(inference.main(['-m', {str(ckpt)!r}, '-i', "
        f"{str(ASSETS / 'cheetah.jpg')!r}, '-o', {str(out)!r}, '--dtype', 'f32']))"
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists()
    import cv2

    img = cv2.imread(str(out))
    assert img is not None and img.shape[2] == 3


def test_realtime_synthetic_cli(ckpt, tmp_path):
    out = tmp_path / "last.jpg"
    r = _run(
        f"sys.exit(realtime.main(['-m', {str(ckpt)!r}, '--synthetic', "
        f"'--frames', '2', '--no-display', '--save-last', {str(out)!r}, "
        f"'--dtype', 'f32']))"
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "FPS" in r.stderr
    assert "frame 2:" in r.stderr
    assert out.exists()


def test_realtime_pipelined_cli(ckpt, tmp_path):
    """Opt-in double-buffered loop still shows every frame and saves output."""
    out = tmp_path / "last_pipe.jpg"
    r = _run(
        f"sys.exit(realtime.main(['-m', {str(ckpt)!r}, '--synthetic', "
        f"'--frames', '2', '--no-display', '--pipeline', "
        f"'--save-last', {str(out)!r}, '--dtype', 'f32']))"
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "frame 2:" in r.stderr and "FPS" in r.stderr
    assert out.exists()


def test_realtime_auto_pipeline_cli(ckpt, tmp_path):
    """Default adaptive mode probes both loop shapes after warmup, prints the
    decision, and still shows every frame (18 > 3 warmup + 2x6 probes)."""
    out = tmp_path / "last_auto.jpg"
    r = _run(
        f"sys.exit(realtime.main(['-m', {str(ckpt)!r}, '--synthetic', "
        f"'--frames', '18', '--no-display', '--save-last', {str(out)!r}, "
        f"'--dtype', 'f32']))"
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "auto-pipeline: sync" in r.stderr and "->" in r.stderr
    assert "frame 18:" in r.stderr and "FPS" in r.stderr
    assert out.exists()


def test_benchmark_torch_script(tmp_path, monkeypatch):
    """Same-host torch baseline (P2 analog) runs end-to-end on a tiny config."""
    import json

    sys.path.insert(0, str(REPO / "scripts"))
    try:
        import benchmark_torch
    finally:
        sys.path.pop(0)
    monkeypatch.setitem(
        benchmark_torch.SIZES,
        "tiny",
        dict(hidden_size=64, num_hidden_layers=2, num_attention_heads=2),
    )
    out = tmp_path / "torch.json"
    rc = benchmark_torch.main(["--sizes", "tiny", "--iters", "2", "--json", str(out)])
    assert rc == 0
    data = json.loads(out.read_text())
    row = data["results"][0]
    assert row["size"] == "tiny"
    assert row["fwd_ms"] > 0 and row["load_fwd_ms"] >= row["fwd_ms"]
    assert row["peak_rss_mb"] > 0


def test_quantize_cli(ckpt, tmp_path):
    out = tmp_path / "q.gguf"
    r = _run(f"sys.exit(q.main([{str(ckpt)!r}, {str(out)!r}, 'q5_0']))")
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists()
    from dinov2_tpu.io.gguf import GGMLType, GGUFReader

    rd = GGUFReader(out)
    assert GGMLType(rd.kv["ftype"]) == GGMLType.Q5_0
    rd.close()


def test_benchmark_cli_memory_columns(ckpt):
    """cli.benchmark reports measured HBM columns (VERDICT r1 item 6)."""
    import json

    from dinov2_tpu.cli import benchmark

    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = benchmark.main(
            ["-m", str(ckpt), "--batch-sizes", "1,2", "--iters", "1",
             "--dtype", "f32", "--json"]
        )
    assert rc == 0
    rows = json.loads(buf.getvalue())["f16"]
    assert [r["batch"] for r in rows] == [1, 2]
    for r in rows:
        assert r["hbm_weights_mb"] > 0
        # XLA CPU reports buffer assignment too; peak covers weights + temps
        assert r["hbm_peak_mb"] is None or r["hbm_peak_mb"] >= r["hbm_weights_mb"]
        assert r["images_per_sec"] > 0


def test_benchmark_cli_px_flag(ckpt):
    """--px feeds a non-224 resolution through the measured forward (the
    round-5 sweeps use it for 518px feature-mode rows)."""
    import json

    from dinov2_tpu.cli import benchmark

    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = benchmark.main(
            ["-m", str(ckpt), "--batch-sizes", "1", "--iters", "1",
             "--dtype", "f32", "--px", "70", "--json"]
        )
    assert rc == 0
    rows = json.loads(buf.getvalue())["f16"]
    assert rows[0]["images_per_sec"] > 0


@pytest.mark.skipif(not ASSETS.exists(), reason="reference assets not mounted")
def test_inference_cli_mesh_flag(ckpt, tmp_path):
    """--mesh dp,tp drives the engine's explicit mesh from the CLI."""
    r = _run(
        "import os; os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=4'; "
        f"sys.exit(inference.main(['-m', {str(ckpt)!r}, '-i', "
        f"{str(ASSETS / 'tench.jpg')!r}, '-c', '--dtype', 'f32', "
        f"'--mesh', '2,2']))"
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert " > class_" in r.stdout


def test_quantize_cli_unknown_type(ckpt, tmp_path):
    """An unknown type string must be a clean usage error, not an int() or
    KeyError traceback; a valid ggml id that isn't a quant target likewise."""
    from dinov2_tpu.cli import quantize

    for bad in ("q4_k", "0", "1"):
        with pytest.raises(SystemExit):
            quantize.main([str(ckpt), str(tmp_path / "o.gguf"), bad])


def test_save_image_rgb_raises_on_write_failure(tmp_path):
    """cv2.imwrite reports failure by returning False; the helper must raise
    instead of letting callers print 'wrote <path>' for a missing file."""
    from dinov2_tpu.cli._common import save_image_rgb

    img = np.zeros((8, 8, 3), np.uint8)
    with pytest.raises(OSError, match="failed to write"):
        save_image_rgb(str(tmp_path / "nodir" / "out.jpg"), img)
    save_image_rgb(str(tmp_path / "ok.png"), img)  # the happy path still works
    assert (tmp_path / "ok.png").exists()


def test_benchmark_cli_cleans_scratch_dir(ckpt, tmp_path, monkeypatch):
    """The mkdtemp scratch dir holding synthetic/quantized checkpoints (multi-
    GB at giant) must be removed on exit, success or failure."""
    import contextlib
    import io
    import tempfile

    from dinov2_tpu.cli import benchmark

    made = []
    real = tempfile.mkdtemp

    def spy(*a, **k):
        d = real(dir=tmp_path)
        made.append(d)
        return d

    monkeypatch.setattr(tempfile, "mkdtemp", spy)
    with contextlib.redirect_stdout(io.StringIO()):
        rc = benchmark.main(
            ["-m", str(ckpt), "--batch-sizes", "1", "--iters", "1",
             "--dtype", "f32", "--quant", "q8_0", "--json"]
        )
    assert rc == 0
    assert made and not any(Path(d).exists() for d in made)


def test_eval_top5_independent_of_topk(ckpt, tmp_path, rng):
    """top-5 accuracy must come from the full ranking: with -k 1 it used to be
    computed from a 1-element index list, silently reporting top-1 as top-5."""
    import json as _json

    import cv2
    import jax.numpy as jnp

    from dinov2_tpu.cli import eval as eval_cli
    from dinov2_tpu.runtime.engine import DinoEngine

    d = tmp_path / "imgs"
    d.mkdir()
    imgs = {}
    for i in range(4):
        img = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
        cv2.imwrite(str(d / f"im{i}.png"), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        imgs[f"im{i}.png"] = img

    # label every image with a WRONG class (argmax+1 mod 4): top-1 is 0.0 but
    # with num_classes=4 every label is inside the true top-5
    engine = DinoEngine(ckpt, dtype=jnp.float32)
    labels = {}
    for name, img in imgs.items():
        probs = engine.classify_probs([img])[0]
        labels[name] = int((int(np.argmax(probs)) + 1) % 4)
    (tmp_path / "labels.json").write_text(_json.dumps(labels))

    script = (
        "import sys, jax; jax.config.update('jax_platforms','cpu'); "
        f"sys.path.insert(0, {str(REPO)!r}); "
        "from dinov2_tpu.cli import eval as e; "
        f"sys.exit(e.main(['-m', {str(ckpt)!r}, '--dir', {str(d)!r}, "
        f"'--labels', {str(tmp_path / 'labels.json')!r}, '-k', '1', "
        f"'--dtype', 'f32', '--output', {str(tmp_path / 'o.jsonl')!r}]))"
    )
    r = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=600
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "top-1 0.0000  top-5 1.0000" in r.stderr

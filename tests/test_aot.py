"""AOT deployment-artifact tests (runtime/aot.py + cli/aot.py).

The artifact must reproduce the live jitted forward exactly (same program,
serialized), carry a jax-free-readable header, enforce its shape contract at
call time, and support multi-platform (tpu+cpu) lowering from this CPU-only
test host."""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest

from dinov2_tpu.io.synthetic import write_synthetic_gguf
from dinov2_tpu.models.config import DinoConfig

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
    path = tmp_path_factory.mktemp("aot") / "tiny.gguf"
    return write_synthetic_gguf(path, TINY, seed=7)


@pytest.fixture(scope="module")
def loaded(ckpt):
    import jax.numpy as jnp

    from dinov2_tpu.models.params import load_params

    return load_params(ckpt, dtype=jnp.float32)


def test_export_roundtrip_matches_live_forward(loaded, tmp_path, rng):
    import jax.numpy as jnp

    from dinov2_tpu.models.vit import ModelOptions, forward
    from dinov2_tpu.runtime.aot import export_forward, load_artifact, save_artifact

    opts = ModelOptions(parity="reference", compute_dtype=jnp.float32)
    data = export_forward(
        loaded.params, loaded.config, opts, batch=2, height=70, width=70,
        classify=True, platforms=("cpu",),
    )
    path = tmp_path / "tiny.aot"
    save_artifact(path, data)

    art = load_artifact(path)
    x = jnp.asarray(rng.standard_normal((2, 70, 70, 3)), jnp.float32)
    got = art(loaded.params, x)
    want = forward(loaded.params, x, loaded.config, opts, classify=True)
    np.testing.assert_array_equal(np.asarray(got["probs"]), np.asarray(want["probs"]))
    np.testing.assert_array_equal(
        np.asarray(got["patch_tokens"]), np.asarray(want["patch_tokens"])
    )
    # weights are NOT embedded: artifact stays small
    assert len(data) < 2_000_000


def test_multiplatform_lowering_and_header(loaded, tmp_path):
    import jax.numpy as jnp

    from dinov2_tpu.models.vit import ModelOptions
    from dinov2_tpu.runtime.aot import aot_info, export_forward, load_artifact, save_artifact

    opts = ModelOptions(parity="hf", compute_dtype=jnp.float32)
    data = export_forward(
        loaded.params, loaded.config, opts, batch=1, height=70, width=70,
        classify=False, platforms=("tpu", "cpu"),
    )
    path = tmp_path / "mp.aot"
    save_artifact(path, data)

    meta = aot_info(path)  # header read requires no jax
    assert meta["platforms"] == ["tpu", "cpu"]
    assert meta["classify"] is False
    assert meta["opts"]["parity"] == "hf"
    assert meta["model"]["hidden_size"] == 64
    assert meta["input"] == {"batch": 1, "height": 70, "width": 70, "channels": 3}

    # the tpu+cpu artifact still executes on this cpu host
    art = load_artifact(path)
    out = art(loaded.params, np.zeros((1, 70, 70, 3), np.float32))
    assert np.asarray(out["patch_tokens"]).shape == (1, 25, 64)


def test_artifact_shape_contract(loaded, tmp_path):
    import jax.numpy as jnp

    from dinov2_tpu.models.vit import ModelOptions
    from dinov2_tpu.runtime.aot import export_forward, load_artifact, save_artifact

    opts = ModelOptions(compute_dtype=jnp.float32)
    path = tmp_path / "c.aot"
    save_artifact(path, export_forward(
        loaded.params, loaded.config, opts, batch=2, height=70, width=70,
        platforms=("cpu",),
    ))
    art = load_artifact(path)
    with pytest.raises(ValueError):
        art(loaded.params, np.zeros((3, 70, 70, 3), np.float32))  # wrong batch
    with pytest.raises(ValueError):
        art(loaded.params, np.zeros((2, 84, 84, 3), np.float32))  # wrong size


def test_fused_quant_artifact(ckpt, tmp_path):
    """QuantLinear leaves (packed uint8 planes + f32 scales) serialize through
    the registered pytree-node codec; the artifact matches the live fused
    forward exactly."""
    import jax.numpy as jnp

    from dinov2_tpu.models.params import load_params
    from dinov2_tpu.models.vit import ModelOptions, forward
    from dinov2_tpu.quant.quantize import quantize_gguf
    from dinov2_tpu.runtime.aot import export_forward, load_artifact, save_artifact

    q = tmp_path / "q8.gguf"
    quantize_gguf(str(ckpt), str(q), "q8_0")
    loaded = load_params(q, dtype=jnp.float32, quant_mode="fused")
    opts = ModelOptions(compute_dtype=jnp.float32)
    path = tmp_path / "q.aot"
    save_artifact(path, export_forward(
        loaded.params, loaded.config, opts, batch=1, height=70, width=70,
        platforms=("cpu",),
    ))
    x = np.full((1, 70, 70, 3), 0.5, np.float32)
    got = load_artifact(path)(loaded.params, x)
    want = forward(loaded.params, jnp.asarray(x), loaded.config, opts, classify=True)
    np.testing.assert_array_equal(np.asarray(got["probs"]), np.asarray(want["probs"]))


def test_bad_magic_rejected(tmp_path):
    from dinov2_tpu.runtime.aot import aot_info

    p = tmp_path / "junk.aot"
    p.write_bytes(b"NOPE" + b"\0" * 64)
    with pytest.raises(ValueError, match="bad magic"):
        aot_info(p)
    # truncations stay typed ValueErrors too (prefix cut, then header cut)
    p.write_bytes(b"DAOT\x01")
    with pytest.raises(ValueError, match="truncated artifact"):
        aot_info(p)
    import struct

    p.write_bytes(b"DAOT" + struct.pack("<BI", 1, 500) + b"{}")
    with pytest.raises(ValueError, match="truncated artifact"):
        aot_info(p)


def test_cli_export_info_run(ckpt, tmp_path, capsys):
    import cv2

    from dinov2_tpu.cli import aot as cli

    art = tmp_path / "tiny.aot"
    rc = cli.main([
        "export", "-m", str(ckpt), "--dtype", "f32", "--batch", "1",
        "--size", "224x224", "--platforms", "cpu", "-o", str(art),
    ])
    assert rc == 0 and art.exists()

    rc = cli.main(["info", str(art)])
    assert rc == 0
    meta = json.loads(capsys.readouterr().out)
    assert meta["input"]["height"] == 224 and meta["classify"] is True

    img = tmp_path / "in.png"
    cv2.imwrite(str(img), np.random.default_rng(0).integers(
        0, 255, (60, 80, 3), dtype=np.uint8))
    # run reads the weight-loading recipe (dtype/quant layout) from the
    # artifact header — no flags to get wrong
    rc = cli.main(["run", str(art), "-m", str(ckpt), "-i", str(img), "-k", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count(" > ") == 2  # top-k lines in the reference's print format


def test_cli_run_size_mismatch_is_actionable(ckpt, tmp_path, capsys):
    import cv2

    from dinov2_tpu.cli import aot as cli

    art = tmp_path / "feat.aot"
    assert cli.main([
        "export", "-m", str(ckpt), "--dtype", "f32", "--features",
        "--size", "84x84", "--platforms", "cpu", "-o", str(art),
    ]) == 0
    # 100x100 input -> Q4 preprocess target 112x112 != the 84x84 artifact
    img = tmp_path / "big.png"
    cv2.imwrite(str(img), np.zeros((100, 100, 3), np.uint8))
    with pytest.raises(SystemExit, match="does not match the artifact"):
        cli.main(["run", str(art), "-m", str(ckpt), "-i", str(img)])
    # matching input runs the feature tap
    img2 = tmp_path / "ok.png"
    cv2.imwrite(str(img2), np.zeros((70, 70, 3), np.uint8))
    assert cli.main(["run", str(art), "-m", str(ckpt), "-i", str(img2)]) == 0
    assert "patch tokens: (36, 64)" in capsys.readouterr().out

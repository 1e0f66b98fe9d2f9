"""End-to-end golden path over the reference's bundled asset images.

The reference ships 11 sample images in `assets/` — its de-facto fixture set
(SURVEY.md §4.4); `tench.jpg` is the default CLI input
(/root/reference/dinov2.h:65). These tests drive the full
decode -> preprocess -> forward -> top-k / PCA chain on every real photograph
with a deterministic synthetic checkpoint, and pin the CLI's default-input
resolution plus the reference's PCA output-size contract
(/root/reference/inference.cpp:89-91: the visualization is nearest-resized to
the ORIGINAL image size).
"""

from __future__ import annotations

import os
import zlib
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from dinov2_tpu.cli._common import load_image_rgb, resolve_asset
from dinov2_tpu.io.synthetic import write_synthetic_gguf
from dinov2_tpu.models.config import DinoConfig
from dinov2_tpu.runtime.engine import DinoEngine

ASSETS_DIR = Path(os.environ.get("DINOV2_TPU_ASSETS", "/root/reference/assets"))

# the full bundled set (reference `assets/`, minus the readme-assets subdir)
ASSET_NAMES = [
    "apple.jpg",
    "armadillo.jpg",
    "cheetah.jpg",
    "coconut.jpg",
    "giraffe.jpg",
    "image.png",
    "kiwi.jpg",
    "magpie.jpeg",
    "pca_visual.jpg",
    "polars.jpeg",
    "tench.jpg",
]

pytestmark = pytest.mark.skipif(
    not ASSETS_DIR.is_dir(), reason=f"reference assets not mounted at {ASSETS_DIR}"
)

TINY = DinoConfig(
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=2,
    num_classes=4,
    patch_size=14,
    img_size=70,
)


@pytest.fixture(scope="module")
def asset_engine(tmp_path_factory):
    path = tmp_path_factory.mktemp("assets-ckpt") / "tiny.gguf"
    write_synthetic_gguf(path, TINY, seed=3)
    return DinoEngine(path, dtype=jnp.float32)


@pytest.fixture(scope="module")
def asset_images():
    return {name: load_image_rgb(str(ASSETS_DIR / name)) for name in ASSET_NAMES}


def test_every_asset_decodes(asset_images):
    for name, img in asset_images.items():
        assert img.ndim == 3 and img.shape[2] == 3, name
        assert img.dtype == np.uint8 and img.size > 0, name


def test_assets_classify_deterministic(asset_engine, asset_images):
    """Mixed-size classify over all 11 real photos: one merged forward,
    finite probs, and bit-identical across repeat runs (deterministic top-k)."""
    imgs = [asset_images[n] for n in ASSET_NAMES]
    probs = asset_engine.classify_probs(imgs)
    assert probs.shape == (len(ASSET_NAMES), TINY.num_classes)
    assert np.isfinite(probs).all()
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, rtol=1e-5)
    again = asset_engine.classify_probs(imgs)
    np.testing.assert_array_equal(probs, again)
    # mixed-size grouping matches the per-image path
    single = asset_engine.classify_probs(asset_images["tench.jpg"])
    np.testing.assert_allclose(probs[ASSET_NAMES.index("tench.jpg")], single[0],
                               rtol=1e-5, atol=1e-6)
    results = asset_engine.classify([asset_images["tench.jpg"]], topk=3)
    assert len(results[0]) == 3 and results[0][0][0].startswith("class_")


def test_assets_pca_original_size_and_checksum(asset_engine, asset_images):
    """PCA visualization for every asset: output dims == ORIGINAL image dims
    (reference resize contract) and a stable u8 checksum across runs."""
    imgs = [asset_images[n] for n in ASSET_NAMES]
    vis = asset_engine.pca_visualizations(imgs)
    checksums = {}
    for name, img, v in zip(ASSET_NAMES, imgs, vis):
        assert v.shape == img.shape, name
        assert v.dtype == np.uint8
        assert v.min() == 0 and v.max() == 255, name  # global min-max to u8
        checksums[name] = zlib.crc32(v.tobytes())
    # determinism: an independent single-image run reproduces the bytes
    v2 = asset_engine.pca_visualization(asset_images["cheetah.jpg"])
    assert zlib.crc32(v2.tobytes()) == checksums["cheetah.jpg"]


def test_resolve_asset_finds_reference_files(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # no local assets/ here
    resolved = resolve_asset("assets/tench.jpg")
    assert Path(resolved).is_file()
    # ONLY the documented assets/ form falls back: a bare basename or any
    # other relative path must NOT silently substitute a same-named bundled
    # photo (the user's own file living elsewhere is the likely intent)
    assert resolve_asset("giraffe.jpg") == "giraffe.jpg"
    assert resolve_asset("photos/tench.jpg") == "photos/tench.jpg"
    # existing local files win
    local = tmp_path / "tench.jpg"
    local.write_bytes(b"x")
    assert resolve_asset(str(local)) == str(local)
    # a MISSING absolute path must NOT silently substitute a same-named
    # bundled photo (typo / unmounted volume => honest file-not-found)
    missing_abs = str(tmp_path / "nowhere" / "tench.jpg")
    assert resolve_asset(missing_abs) == missing_abs


def test_cli_default_input_and_pca_dims(tmp_path, monkeypatch, capsys):
    """`dinov2-inference` with NO -i flag runs on the resolved default
    (assets/tench.jpg) end to end; the written PCA image has the input's dims
    (inference.cpp:89-91) and classify prints reference-format top-k lines."""
    from dinov2_tpu.cli import inference as icli

    ckpt = tmp_path / "tiny.gguf"
    write_synthetic_gguf(ckpt, TINY, seed=3)
    monkeypatch.chdir(tmp_path)

    out = tmp_path / "vis.jpg"
    assert icli.main(["-m", str(ckpt), "-o", str(out)]) == 0
    import cv2

    written = cv2.imread(str(out))
    ref = cv2.imread(str(ASSETS_DIR / "tench.jpg"))
    assert written is not None and written.shape == ref.shape

    assert icli.main(["-m", str(ckpt), "-c", "-k", "2"]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith(" > ")]
    assert len(lines) == 2 and " : " in lines[0]

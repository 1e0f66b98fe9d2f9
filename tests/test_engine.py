"""Engine + quantizer + PCA integration tests on synthetic checkpoints."""

import numpy as np
import pytest

import jax.numpy as jnp

from dinov2_tpu.io.gguf import GGMLType, GGUFReader
from dinov2_tpu.io.synthetic import write_synthetic_gguf
from dinov2_tpu.models.config import DinoConfig
from dinov2_tpu.quant.quantize import do_quantize, quantize_gguf
from dinov2_tpu.runtime.engine import DinoEngine

TINY = DinoConfig(
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=2,
    num_classes=4,
    patch_size=14,
    img_size=70,  # model grid 5x5
)


@pytest.fixture(scope="module")
def tiny_gguf(tmp_path_factory):
    path = tmp_path_factory.mktemp("ckpt") / "tiny.gguf"
    return write_synthetic_gguf(path, TINY, seed=3)


def test_engine_classify(tiny_gguf, rng):
    engine = DinoEngine(tiny_gguf, dtype=jnp.float32)
    imgs = rng.integers(0, 256, (3, 100, 120, 3), dtype=np.uint8)
    results = engine.classify(imgs, topk=2)
    assert len(results) == 3 and len(results[0]) == 2
    label, prob = results[0][0]
    assert label.startswith("class_") and 0 <= prob <= 1
    probs = engine.classify_probs(imgs)
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, rtol=1e-5)
    # batched result equals single-image result
    single = engine.classify_probs(imgs[0])
    np.testing.assert_allclose(single[0], probs[0], rtol=1e-5, atol=1e-6)


def test_engine_classify_mixed_sizes(tiny_gguf, rng):
    """Mixed-size inputs batch into one forward; results match per-image runs."""
    engine = DinoEngine(tiny_gguf, dtype=jnp.float32)
    imgs = [
        rng.integers(0, 256, (100, 120, 3), dtype=np.uint8),
        rng.integers(0, 256, (64, 64, 3), dtype=np.uint8),
        rng.integers(0, 256, (100, 120, 3), dtype=np.uint8),
    ]
    mixed = engine.classify_probs(imgs)
    assert mixed.shape[0] == 3
    for i, img in enumerate(imgs):
        single = engine.classify_probs(img)
        np.testing.assert_allclose(mixed[i], single[0], rtol=1e-5, atol=1e-6)


def test_engine_features_and_pca(tiny_gguf, rng):
    engine = DinoEngine(tiny_gguf, dtype=jnp.float32)
    img = rng.integers(0, 256, (100, 120, 3), dtype=np.uint8)
    feats = engine.extract_features(img)
    gh, gw = feats["grid"]
    assert (gh, gw) == (100 // 14 + 1, 120 // 14 + 1)  # quirk Q4
    assert feats["patch_tokens"].shape == (1, gh * gw, TINY.hidden_size)
    assert feats["cls_token"].shape == (1, TINY.hidden_size)

    vis = engine.pca_visualization(img)
    assert vis.dtype == np.uint8
    # original-size output (reference nearest-resizes the grid back to the
    # input size, inference.cpp:89-91)
    assert vis.shape == (100, 120, 3)
    assert vis.min() == 0 and vis.max() == 255  # min-max normalized


def test_engine_features_mixed_sizes(tiny_gguf, rng):
    engine = DinoEngine(tiny_gguf, dtype=jnp.float32)
    imgs = [
        rng.integers(0, 256, (100, 120, 3), dtype=np.uint8),
        rng.integers(0, 256, (64, 64, 3), dtype=np.uint8),
        rng.integers(0, 256, (100, 120, 3), dtype=np.uint8),
    ]
    feats = engine.extract_features_mixed(imgs)
    assert len(feats) == 3
    assert feats[0]["grid"] == (100 // 14 + 1, 120 // 14 + 1)
    assert feats[1]["grid"] == (64 // 14 + 1, 64 // 14 + 1)
    single = engine.extract_features(imgs[1])
    np.testing.assert_allclose(
        feats[1]["cls_token"], single["cls_token"][0], rtol=1e-5, atol=1e-6
    )


def test_engine_pca_batched_mixed_sizes(tiny_gguf, rng):
    """pca_visualizations groups by shape and runs one fused program per group;
    each image keeps its own PCA basis (must equal the single-image path)."""
    engine = DinoEngine(tiny_gguf, dtype=jnp.float32)
    imgs = [
        rng.integers(0, 256, (100, 120, 3), dtype=np.uint8),
        rng.integers(0, 256, (64, 64, 3), dtype=np.uint8),
        rng.integers(0, 256, (100, 120, 3), dtype=np.uint8),
    ]
    vis = engine.pca_visualizations(imgs)
    assert [v.shape for v in vis] == [(100, 120, 3), (64, 64, 3), (100, 120, 3)]
    for i in (0, 1):
        np.testing.assert_array_equal(vis[i], engine.pca_visualization(imgs[i]))


def test_engine_features_518px(tiny_gguf, rng):
    """The reference's headline feature config: 518px input -> 37x37(+1) grid
    (quirk Q4 rounds 518 up to 38x38 patches of 14)."""
    engine = DinoEngine(tiny_gguf, dtype=jnp.float32)
    img = rng.integers(0, 256, (518, 518, 3), dtype=np.uint8)
    feats = engine.extract_features(img)
    assert feats["grid"] == (38, 38)
    assert feats["patch_tokens"].shape == (1, 38 * 38, TINY.hidden_size)
    vis = engine.pca_visualization(img)
    assert vis.shape == (518, 518, 3)  # original size (== 37x37 grid input)


def test_do_quantize_rule():
    # quirk Q10: only 2D `.*weight` tensors quantize
    assert do_quantize("encoder.layer.0.mlp.fc1.weight", (64, 64))
    assert not do_quantize("encoder.layer.0.mlp.fc1.bias", (64,))
    assert not do_quantize("embeddings.patch_embeddings.projection.weight", (4, 3, 2, 2))
    assert not do_quantize("embeddings.position_embeddings", (1, 26, 64))
    assert do_quantize("classifier.weight", (4, 128))


@pytest.mark.parametrize("qtype", ["q4_0", "q5_1", "q8_0"])
def test_quantize_roundtrip_and_inference(tiny_gguf, tmp_path, qtype, rng):
    qpath = tmp_path / f"tiny-{qtype}.gguf"
    quantize_gguf(tiny_gguf, qpath, qtype)

    r = GGUFReader(qpath)
    expect_t = {"q4_0": GGMLType.Q4_0, "q5_1": GGMLType.Q5_1, "q8_0": GGMLType.Q8_0}[qtype]
    assert GGMLType(r.kv["ftype"]) == expect_t
    assert r.tensors["encoder.layer.0.mlp.fc1.weight"].ggml_type == expect_t
    assert r.tensors["encoder.layer.0.mlp.fc1.bias"].ggml_type == GGMLType.F32
    assert (
        r.tensors["embeddings.patch_embeddings.projection.weight"].ggml_type
        == GGMLType.F16
    )
    r.close()

    img = rng.integers(0, 256, (1, 70, 70, 3), dtype=np.uint8)
    ref = DinoEngine(tiny_gguf, dtype=jnp.float32).classify_probs(img)
    quant = DinoEngine(qpath, dtype=jnp.float32).classify_probs(img)
    # quantized probs should stay close on a tiny random model
    assert np.abs(quant - ref).max() < 0.15
    assert quant.argmax(-1) == ref.argmax(-1)


def test_fused_quant_mode_matches_dequant(tiny_gguf, tmp_path, rng):
    """quant_mode='fused' (on-device unpack path) must agree with eager dequant."""
    qpath = tmp_path / "tiny-q4.gguf"
    quantize_gguf(tiny_gguf, qpath, "q4_0")
    img = rng.integers(0, 256, (2, 70, 70, 3), dtype=np.uint8)
    a = DinoEngine(qpath, dtype=jnp.float32, quant_mode="dequant").classify_probs(img)
    b = DinoEngine(qpath, dtype=jnp.float32, quant_mode="fused").classify_probs(img)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_quantize_cli_integer_type_id(tiny_gguf, tmp_path):
    """The reference CLI takes ggml integer type ids (quantize.cpp argv)."""
    from dinov2_tpu.cli import quantize as qcli

    out = tmp_path / "by-id.gguf"
    assert qcli.main([str(tiny_gguf), str(out), "8"]) == 0
    r = GGUFReader(out)
    assert GGMLType(r.kv["ftype"]) == GGMLType.Q8_0
    r.close()


def test_presets_sanity():
    from dinov2_tpu.models.config import PRESETS

    assert PRESETS["small"].hidden_size == 384
    assert PRESETS["base"].head_dim == 64
    assert PRESETS["large"].num_hidden_layers == 24
    giant = PRESETS["giant"]
    assert giant.swiglu and giant.swiglu_hidden == 4096
    assert giant.n_img_embd == 37  # 518 / 14


def test_registers_and_swiglu_synthetic(tmp_path, rng):
    cfg = DinoConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_classes=0,
        num_register_tokens=4,
        patch_size=14,
        img_size=70,
        use_swiglu_ffn=True,
    )
    path = write_synthetic_gguf(tmp_path / "reg.gguf", cfg, seed=5)
    engine = DinoEngine(path, dtype=jnp.float32)
    assert engine.config.num_register_tokens == 4
    assert engine.config.swiglu
    img = rng.integers(0, 256, (84, 84, 3), dtype=np.uint8)
    feats = engine.extract_features(img)
    gh, gw = feats["grid"]
    # registers are dropped from feature-mode patch tokens (quirk Q5)
    assert feats["patch_tokens"].shape == (1, gh * gw, 64)


def test_target_batch_rounds_to_data_axis_not_device_count():
    """The batch is sharded only on the mesh's 'data' axis (shard_batch
    replicates on a pure-'model' TP mesh), so bucket rounding must use the
    data-axis size: rounding to the TOTAL device count over-padded 2-8x on
    TP and mixed meshes (e.g. a 2-image request padded to 8 on data=2 x
    model=4)."""
    from dinov2_tpu.parallel.mesh import make_mesh

    class _Stub:
        pass

    stub = _Stub()
    stub.mesh = None
    assert DinoEngine._target_batch(stub, 3) == 4  # plain bucket, no mesh

    stub.mesh = make_mesh({"data": 2, "model": 4})
    assert DinoEngine._target_batch(stub, 1) == 2  # data axis, not 8 devices
    assert DinoEngine._target_batch(stub, 2) == 2
    assert DinoEngine._target_batch(stub, 3) == 4

    stub.mesh = make_mesh({"model": 8})  # pure TP: batch replicated
    assert DinoEngine._target_batch(stub, 1) == 1
    assert DinoEngine._target_batch(stub, 3) == 4

    stub.mesh = make_mesh({"data": 8})
    assert DinoEngine._target_batch(stub, 3) == 8


def test_classify_probs_empty_list(tiny_gguf):
    """Empty input returns an empty (0, num_classes) array like the other
    batch APIs (extract_features_mixed, pca_visualizations), instead of
    IndexError."""
    engine = DinoEngine(tiny_gguf, dtype=jnp.float32)
    out = engine.classify_probs([])
    assert out.shape == (0, TINY.num_classes)
    assert engine.classify([]) == []


def test_classify_preprocess_compiles_per_bucket_not_per_count(tiny_gguf, rng):
    """Group counts are padded to their power-of-two bucket BEFORE the jitted
    preprocess, so per-(H, W) preprocess programs stay log2-bounded across
    coalesced batch sizes (the server coalesces 1..max_batch same-size
    images; one program per exact count would be an unbounded compile-stall
    source on the first request of every new count)."""
    engine = DinoEngine(tiny_gguf, dtype=jnp.float32)
    imgs = rng.integers(0, 256, (7, 70, 70, 3), dtype=np.uint8)
    # the jit cache is shared across engines of one process: measure growth
    base = engine._jit_classify_pre._cache_size()
    for n in (3, 5, 6, 7):  # buckets to 4, then 8, 8, 8
        engine.classify_probs(list(imgs[:n]))
    grown = engine._jit_classify_pre._cache_size() - base
    assert grown <= 2, grown  # buckets {4, 8}, not one program per count
    # correctness across the padded path: order and values survive
    p5 = engine.classify_probs(list(imgs[:5]))
    p5_again = np.stack([engine.classify_probs([imgs[i]])[0] for i in range(5)])
    np.testing.assert_allclose(p5, p5_again, atol=2e-5)

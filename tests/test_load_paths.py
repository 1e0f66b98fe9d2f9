"""Loader fast paths: fp16 direct-upload equivalence; compilation cache util."""

import numpy as np
import pytest

import jax.numpy as jnp

from dinov2_tpu.io.gguf import GGMLType, GGUFTensor
from dinov2_tpu.models.params import _upload_f16


def test_upload_f16_matches_host_path(rng):
    data = rng.standard_normal((32, 64)).astype(np.float16)
    t = GGUFTensor("w", (32, 64), GGMLType.F16, data.view(np.uint8).ravel())
    direct = np.asarray(_upload_f16(t, jnp.bfloat16), dtype=np.float32)
    host = np.asarray(
        jnp.asarray(t.as_numpy(), dtype=jnp.bfloat16), dtype=np.float32
    )
    np.testing.assert_array_equal(direct, host)


def test_upload_f16_f32_target_uses_host_path(rng):
    data = rng.standard_normal((8, 32)).astype(np.float16)
    t = GGUFTensor("w", (8, 32), GGMLType.F16, data.view(np.uint8).ravel())
    out = _upload_f16(t, jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), data.astype(np.float32))


def test_compilation_cache_util(monkeypatch, tmp_path):
    import jax

    import dinov2_tpu.utils.cache as cache

    monkeypatch.setattr(cache, "_enabled", False)
    monkeypatch.setenv("DINOV2_TPU_CACHE_DIR", str(tmp_path / "jc"))
    try:
        # CPU backend skips persistence by default (XLA:CPU AOT artifacts are
        # machine-feature-pinned; round 3) — DINOV2_TPU_CACHE_CPU opts in
        cache.enable_compilation_cache()
        assert not cache._enabled
        monkeypatch.setenv("DINOV2_TPU_CACHE_CPU", "1")
        cache.enable_compilation_cache()
        assert cache._enabled
        # dir is scoped per platform fingerprint under the base dir
        assert (tmp_path / "jc").exists()
        assert list((tmp_path / "jc").iterdir())  # the fingerprint subdir
        cache.enable_compilation_cache()  # idempotent

        monkeypatch.setattr(cache, "_enabled", False)
        monkeypatch.setenv("DINOV2_TPU_NO_CACHE", "1")
        cache.enable_compilation_cache()
        assert not cache._enabled
    finally:
        # don't leave jax pointing at the soon-deleted tmp dir
        jax.config.update("jax_compilation_cache_dir", None)


def test_init_params_matches_load_params_schema(tmp_path):
    """init_params and load_params build the pytree independently (VERDICT r1
    weak item 8: a drift hazard) — lock them to one structure: identical
    treedef, leaf shapes, and dtypes for every config shape knob."""
    import jax
    import jax.numpy as jnp

    from dinov2_tpu.io.synthetic import write_synthetic_gguf
    from dinov2_tpu.models.config import DinoConfig
    from dinov2_tpu.models.params import init_params, load_params

    for i, kw in enumerate((
        dict(),  # plain
        dict(num_register_tokens=4),  # registers
        dict(num_hidden_layers=40, hidden_size=64),  # SwiGLU trigger (quirk Q6)
        dict(num_classes=0),  # backbone-only, no classifier
    )):
        cfg = DinoConfig(**{
            "hidden_size": 64, "num_hidden_layers": 2, "num_attention_heads": 2,
            "num_classes": 4, "patch_size": 14, "img_size": 70, **kw,
        })
        # index-named: f"s{len(kw)}" collided for the two single-key cases
        path = write_synthetic_gguf(tmp_path / f"s{i}.gguf", cfg, seed=1)
        loaded = load_params(path, dtype=jnp.float32).params
        inited = init_params(cfg, seed=0, dtype=jnp.float32)
        assert jax.tree_util.tree_structure(loaded) == jax.tree_util.tree_structure(
            inited
        ), f"pytree schema drift for {kw}"
        for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(loaded),
            jax.tree_util.tree_leaves_with_path(inited),
        ):
            assert a.shape == b.shape and a.dtype == b.dtype, (ka, a.shape, b.shape)


def test_q5_layout_knob(tmp_path, monkeypatch):
    """DINOV2_TPU_Q5_LAYOUT=soa opts q5 formats out of nibble packing
    (speed-vs-footprint knob) without changing results."""
    import jax.numpy as jnp
    import numpy as np

    from dinov2_tpu.io.synthetic import write_synthetic_gguf
    from dinov2_tpu.models.config import DinoConfig
    from dinov2_tpu.models.params import load_params
    from dinov2_tpu.models.vit import ModelOptions, forward
    from dinov2_tpu.quant.quantize import quantize_gguf

    cfg = DinoConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        num_classes=4, patch_size=14, img_size=70,
    )
    fp = write_synthetic_gguf(tmp_path / "k.gguf", cfg, seed=13)
    qp = tmp_path / "k.q5_1.gguf"
    quantize_gguf(fp, qp, "q5_1")
    opts = ModelOptions(parity="hf", compute_dtype=jnp.float32)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 70, 70, 3)), jnp.float32
    )

    packed = load_params(qp, dtype=jnp.float32, quant_mode="fused")
    assert packed.params["layers"]["qkv"]["kernel"].packed
    monkeypatch.setenv("DINOV2_TPU_Q5_LAYOUT", "soa")
    soa = load_params(qp, dtype=jnp.float32, quant_mode="fused")
    ql = soa.params["layers"]["qkv"]["kernel"]
    assert not ql.packed and ql.codes.dtype == jnp.int8

    a = forward(packed.params, x, cfg, opts, classify=True)["probs"]
    b = forward(soa.params, x, cfg, opts, classify=True)["probs"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

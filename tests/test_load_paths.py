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
        cache.enable_compilation_cache()
        assert cache._enabled
        assert (tmp_path / "jc").exists()
        cache.enable_compilation_cache()  # idempotent

        monkeypatch.setattr(cache, "_enabled", False)
        monkeypatch.setenv("DINOV2_TPU_NO_CACHE", "1")
        cache.enable_compilation_cache()
        assert not cache._enabled
    finally:
        # don't leave jax pointing at the soon-deleted tmp dir
        jax.config.update("jax_compilation_cache_dir", None)

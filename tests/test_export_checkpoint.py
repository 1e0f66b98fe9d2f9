"""Round-trip tests: params -> GGUF export -> reload; train-state save/restore."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dinov2_tpu.io.export import export_gguf
from dinov2_tpu.io.synthetic import write_synthetic_gguf
from dinov2_tpu.models.config import DinoConfig
from dinov2_tpu.models.params import init_params, load_params
from dinov2_tpu.models.vit import ModelOptions, forward

TINY = DinoConfig(
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=2,
    num_classes=4,
    patch_size=14,
    img_size=70,
)
OPTS = ModelOptions(parity="hf", compute_dtype=jnp.float32)


def test_export_reload_roundtrip(tmp_path, rng):
    src = write_synthetic_gguf(tmp_path / "src.gguf", TINY, seed=1)
    loaded = load_params(src, dtype=jnp.float32)

    out = export_gguf(
        tmp_path / "exported.gguf", loaded.params, loaded.config, loaded.id2label
    )
    re = load_params(out, dtype=jnp.float32)
    assert re.config.hidden_size == TINY.hidden_size
    assert re.id2label == loaded.id2label

    x = jnp.asarray(rng.standard_normal((2, 70, 70, 3)), jnp.float32)
    a = forward(loaded.params, x, loaded.config, OPTS, classify=True)["probs"]
    b = forward(re.params, x, re.config, OPTS, classify=True)["probs"]
    # fp16 storage round-trip: bit-identical (weights were already fp16-grid)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_export_registers_swiglu(tmp_path, rng):
    cfg = DinoConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        num_classes=0, num_register_tokens=4, patch_size=14, img_size=70,
        use_swiglu_ffn=True,
    )
    src = write_synthetic_gguf(tmp_path / "s.gguf", cfg, seed=2)
    loaded = load_params(src, dtype=jnp.float32)
    out = export_gguf(tmp_path / "e.gguf", loaded.params, loaded.config)
    re = load_params(out, dtype=jnp.float32)
    assert re.config.num_register_tokens == 4 and re.config.swiglu
    x = jnp.asarray(rng.standard_normal((1, 70, 70, 3)), jnp.float32)
    a = forward(loaded.params, x, loaded.config, OPTS)["cls_token"]
    b = forward(re.params, x, re.config, OPTS)["cls_token"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_train_state_checkpoint_roundtrip(tmp_path, rng):
    from dinov2_tpu.parallel.checkpoint import restore_train_state, save_train_state
    from dinov2_tpu.parallel.train import make_trainer

    params = init_params(TINY, seed=0, dtype=jnp.float32)
    trainer = make_trainer(TINY, mesh=None, opts=OPTS, preprocess_in_step=False)
    params, opt_state = trainer.place(params)

    images = rng.standard_normal((4, 70, 70, 3)).astype(np.float32)
    labels = rng.integers(0, 4, (4,))
    params, opt_state, _ = trainer.step(params, opt_state, images, labels)

    ckpt_dir = tmp_path / "ckpt"
    save_train_state(ckpt_dir, 1, params, opt_state)

    fresh = init_params(TINY, seed=99, dtype=jnp.float32)
    fresh, fresh_opt = trainer.place(fresh)
    step, r_params, r_opt = restore_train_state(ckpt_dir, fresh, fresh_opt)
    assert step == 1
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(r_params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # training continues from the restored state
    p2, o2, metrics = trainer.step(r_params, r_opt, images, labels)
    assert np.isfinite(float(metrics["loss"]))


def test_export_refuses_fused_quant(tmp_path):
    from dinov2_tpu.quant.quantize import quantize_gguf

    src = write_synthetic_gguf(tmp_path / "f.gguf", TINY, seed=1)
    q = quantize_gguf(src, tmp_path / "q.gguf", "q4_0")
    loaded = load_params(q, dtype=jnp.float32, quant_mode="fused")
    with pytest.raises(ValueError, match="fused-quantized"):
        export_gguf(tmp_path / "x.gguf", loaded.params, loaded.config)


def test_export_headless_params_kv_consistent(tmp_path):
    """Exporting params without a classifier must write num_classes=0 even if
    the config still carries a class count (header/tensor consistency — the
    reference loader resolves classifier.weight whenever num_classes > 0)."""
    from dinov2_tpu.io.gguf import GGUFReader
    from dinov2_tpu.io.export import export_gguf
    from dinov2_tpu.models.config import DinoConfig
    from dinov2_tpu.models.params import init_params

    cfg = DinoConfig(hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
                     num_classes=4, patch_size=14, img_size=70)
    params = init_params(cfg, seed=0)
    params.pop("classifier", None)
    out = export_gguf(tmp_path / "h.gguf", params, cfg)
    with GGUFReader(out) as r:
        assert r.kv["num_classes"] == 0
        assert not any(n.startswith("classifier") for n in r.tensors)

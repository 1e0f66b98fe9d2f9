"""End-to-end model parity: HF transformers (torch) is the oracle.

Pipeline under test: HF model -> our converter -> GGUF -> our loader -> our jitted
forward, compared against the torch forward on the same inputs. Models are tiny
random-weight instances built from config (no network). Weights are rounded
through fp16 on the torch side too, mirroring the GGUF dtype policy, so the
comparison isolates compute-path differences.
"""

import numpy as np
import pytest
import torch

jnp = pytest.importorskip("jax.numpy")

from dinov2_tpu.io.convert import convert_hf_model
from dinov2_tpu.models.params import load_params
from dinov2_tpu.models.vit import ModelOptions, forward

HIDDEN, HEADS, LAYERS, INTER = 32, 2, 2, 64
PATCH, IMG = 7, 28


def _tiny_config(**kw):
    from transformers import Dinov2Config

    defaults = dict(
        hidden_size=HIDDEN,
        num_hidden_layers=LAYERS,
        num_attention_heads=HEADS,
        intermediate_size=INTER,
        image_size=IMG,
        patch_size=PATCH,
        num_labels=5,
        attn_implementation="eager",
    )
    defaults.update(kw)
    return Dinov2Config(**defaults)


def _halve(model):
    """Round weights through fp16 like the converter's dtype policy does."""
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(p.half().float())
    return model


def _jax_inputs(pixel_values):
    return jnp.asarray(pixel_values.numpy().transpose(0, 2, 3, 1))


F32_OPTS = ModelOptions(parity="hf", compute_dtype=jnp.float32)


@pytest.fixture()
def torch_seed():
    # function-scoped on purpose: module scope seeds the torch RNG only once,
    # so every later test's weights depend on which tests ran before it — a
    # marginal tolerance failure would not reproduce under pytest -k
    torch.manual_seed(1234)


def _run_both(model, loaded, pixel_values, classify=False):
    model.eval()
    with torch.no_grad():
        torch_out = model(pixel_values)
    jax_out = forward(
        loaded.params, _jax_inputs(pixel_values), loaded.config, F32_OPTS,
        classify=classify,
    )
    return torch_out, jax_out


def test_backbone_parity(tmp_path, torch_seed):
    from transformers import Dinov2Model

    model = _halve(Dinov2Model(_tiny_config()))
    path = convert_hf_model(model, tmp_path / "m.gguf")
    loaded = load_params(path, dtype=jnp.float32)

    assert loaded.config.hidden_size == HIDDEN
    assert loaded.config.num_hidden_layers == LAYERS
    assert not loaded.config.swiglu

    pixel_values = torch.randn(2, 3, IMG, IMG)
    torch_out, jax_out = _run_both(model, loaded, pixel_values)

    want_cls = torch_out.last_hidden_state[:, 0].numpy()
    got_cls = np.asarray(jax_out["cls_token"])
    np.testing.assert_allclose(got_cls, want_cls, rtol=2e-4, atol=2e-5)

    want_patches = torch_out.last_hidden_state[:, 1:].numpy()
    got_patches = np.asarray(jax_out["patch_tokens"])
    np.testing.assert_allclose(got_patches, want_patches, rtol=2e-4, atol=2e-5)


def test_classifier_parity(tmp_path, torch_seed):
    from transformers import Dinov2ForImageClassification

    cfg = _tiny_config()
    cfg.id2label = {i: f"class_{i}" for i in range(5)}
    model = _halve(Dinov2ForImageClassification(cfg))
    path = convert_hf_model(model, tmp_path / "c.gguf")
    loaded = load_params(path, dtype=jnp.float32)

    assert loaded.has_classifier
    assert loaded.config.num_classes == 5
    assert loaded.id2label[3] == "class_3"

    pixel_values = torch.randn(2, 3, IMG, IMG)
    torch_out, jax_out = _run_both(model, loaded, pixel_values, classify=True)

    want_probs = torch.softmax(torch_out.logits, dim=-1).numpy()
    got_probs = np.asarray(jax_out["probs"])
    np.testing.assert_allclose(got_probs, want_probs, rtol=1e-3, atol=1e-5)


def test_registers_parity(tmp_path, torch_seed):
    from transformers import (
        Dinov2WithRegistersConfig,
        Dinov2WithRegistersModel,
    )

    cfg = Dinov2WithRegistersConfig(
        hidden_size=HIDDEN,
        num_hidden_layers=LAYERS,
        num_attention_heads=HEADS,
        intermediate_size=INTER,
        image_size=IMG,
        patch_size=PATCH,
        num_register_tokens=4,
        attn_implementation="eager",
    )
    model = _halve(Dinov2WithRegistersModel(cfg))
    path = convert_hf_model(model, tmp_path / "r.gguf")
    loaded = load_params(path, dtype=jnp.float32)

    assert loaded.config.num_register_tokens == 4

    pixel_values = torch.randn(2, 3, IMG, IMG)
    torch_out, jax_out = _run_both(model, loaded, pixel_values)

    want_cls = torch_out.last_hidden_state[:, 0].numpy()
    np.testing.assert_allclose(
        np.asarray(jax_out["cls_token"]), want_cls, rtol=2e-4, atol=2e-5
    )
    # our patch_tokens drop CLS+registers (quirk Q5); HF keeps them at 1..1+R
    want_patches = torch_out.last_hidden_state[:, 1 + 4 :].numpy()
    np.testing.assert_allclose(
        np.asarray(jax_out["patch_tokens"]), want_patches, rtol=2e-4, atol=2e-5
    )


def test_registers_classifier_parity(tmp_path, torch_seed):
    """Registers + classifier together: pooling must include register tokens
    (quirk Q5) exactly as HF does."""
    from transformers import (
        Dinov2WithRegistersConfig,
        Dinov2WithRegistersForImageClassification,
    )

    cfg = Dinov2WithRegistersConfig(
        hidden_size=HIDDEN,
        num_hidden_layers=LAYERS,
        num_attention_heads=HEADS,
        intermediate_size=INTER,
        image_size=IMG,
        patch_size=PATCH,
        num_register_tokens=4,
        num_labels=5,
        attn_implementation="eager",
    )
    cfg.id2label = {i: f"class_{i}" for i in range(5)}
    model = _halve(Dinov2WithRegistersForImageClassification(cfg))
    path = convert_hf_model(model, tmp_path / "rc.gguf")
    loaded = load_params(path, dtype=jnp.float32)
    assert loaded.config.num_register_tokens == 4 and loaded.has_classifier

    pixel_values = torch.randn(2, 3, IMG, IMG)
    torch_out, jax_out = _run_both(model, loaded, pixel_values, classify=True)
    want = torch.softmax(torch_out.logits, dim=-1).numpy()
    np.testing.assert_allclose(
        np.asarray(jax_out["probs"]), want, rtol=1e-3, atol=1e-5
    )


def test_swiglu_parity(tmp_path, torch_seed):
    from transformers import Dinov2Model

    model = _halve(Dinov2Model(_tiny_config(use_swiglu_ffn=True)))
    path = convert_hf_model(model, tmp_path / "g.gguf")
    loaded = load_params(path, dtype=jnp.float32)

    assert loaded.config.swiglu

    pixel_values = torch.randn(1, 3, IMG, IMG)
    torch_out, jax_out = _run_both(model, loaded, pixel_values)
    np.testing.assert_allclose(
        np.asarray(jax_out["cls_token"]),
        torch_out.last_hidden_state[:, 0].numpy(),
        rtol=2e-4,
        atol=2e-5,
    )


def test_reference_pooling_quirk(tmp_path, torch_seed):
    """Quirk Q3: reference divides pooled patches by n_img_embd², not the true
    count. With IMG==runtime size they coincide ONLY if grids match; use a larger
    model grid to force a difference."""
    from transformers import Dinov2ForImageClassification

    cfg = _tiny_config(image_size=56)  # model grid 8x8=64 patches
    model = _halve(Dinov2ForImageClassification(cfg))
    path = convert_hf_model(model, tmp_path / "q3.gguf")
    loaded = load_params(path, dtype=jnp.float32)

    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, IMG, IMG, 3)), jnp.float32)
    ref = forward(
        loaded.params, x, loaded.config,
        ModelOptions(parity="reference", compute_dtype=jnp.float32), classify=True,
    )
    hf = forward(
        loaded.params, x, loaded.config, F32_OPTS, classify=True
    )
    # runtime grid 4x4=16 patches vs model 64: reference-mode pooled is 4x smaller,
    # so the two modes must genuinely differ
    assert not np.allclose(np.asarray(ref["probs"]), np.asarray(hf["probs"]), atol=1e-6)


def test_bf16_classification_stability(tmp_path, torch_seed):
    """bf16 compute must preserve the top-1 class vs f32 on well-separated logits."""
    from transformers import Dinov2ForImageClassification

    model = _halve(Dinov2ForImageClassification(_tiny_config()))
    path = convert_hf_model(model, tmp_path / "b.gguf")
    f32 = load_params(path, dtype=jnp.float32)
    bf16 = load_params(path, dtype=jnp.bfloat16)

    x = np.random.default_rng(7).standard_normal((4, IMG, IMG, 3)).astype(np.float32)
    probs32 = np.asarray(
        forward(f32.params, jnp.asarray(x), f32.config, F32_OPTS, classify=True)["probs"]
    )
    probs16 = np.asarray(
        forward(
            bf16.params, jnp.asarray(x), bf16.config,
            ModelOptions(parity="hf", compute_dtype=jnp.bfloat16), classify=True,
        )["probs"]
    )
    assert (probs32.argmax(-1) == probs16.argmax(-1)).all()


def test_fuse_mlp_option_matches_default(rng):
    """ModelOptions(fuse_mlp=True) routes the MLP half-layer through the
    Pallas kernel (interpret on CPU) with unchanged results."""
    import jax.numpy as jnp

    from dinov2_tpu.models.config import DinoConfig
    from dinov2_tpu.models.params import init_params
    from dinov2_tpu.models.vit import ModelOptions, forward

    cfg = DinoConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        num_classes=4, patch_size=14, img_size=70,
    )
    params = init_params(cfg, seed=0, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 70, 70, 3)), jnp.float32)
    base = forward(
        params, x, cfg, ModelOptions(parity="hf", compute_dtype=jnp.float32),
        classify=True,
    )
    # force the slab path so fuse_mlp engages even on CPU (interpret kernels)
    fused = forward(
        params, x, cfg,
        ModelOptions(
            parity="hf", compute_dtype=jnp.float32,
            flash_attention="slab", fuse_mlp=True,
        ),
        classify=True,
    )
    np.testing.assert_allclose(
        np.asarray(fused["probs"]), np.asarray(base["probs"]),
        rtol=2e-5, atol=2e-6,
    )


def test_forward_rogue_overflow_rescue(rng, monkeypatch):
    """Whole-forward softmax rescue (round 4): rogue weights whose logit
    spread vs the CLS column overflows the 3-pass core's exp2. The unsafe
    mode must actually NaN (proving the fast branch overflows — this is a
    real rogue fixture, not a vacuous pass), and the default rescue mode
    must return finite probs equal to the vanilla path."""
    import jax.numpy as jnp

    from dinov2_tpu.models.config import DinoConfig
    from dinov2_tpu.models.params import init_params
    from dinov2_tpu.models.vit import ModelOptions, forward

    config = DinoConfig(hidden_size=64, num_hidden_layers=2,
                        num_attention_heads=2, num_classes=8,
                        patch_size=14, img_size=70)
    params = init_params(config, seed=11, dtype=jnp.float32)
    layers = dict(params["layers"])
    layers["qkv"] = dict(layers["qkv"])
    layers["qkv"]["kernel"] = layers["qkv"]["kernel"] * 300.0
    params = dict(params)
    params["layers"] = layers

    opts_slab = ModelOptions(parity="hf", compute_dtype=jnp.float32,
                             flash_attention="slab")
    opts_van = ModelOptions(parity="hf", compute_dtype=jnp.float32,
                            flash_attention=False)
    x = jnp.asarray(rng.standard_normal((3, 70, 70, 3)), jnp.float32)

    # env knobs are read at trace time; distinct batch sizes force fresh jit
    # traces per mode (the cache key is otherwise identical)
    monkeypatch.setenv("DINOV2_TPU_SM3", "unsafe")
    probs_unsafe = np.asarray(
        forward(params, x[:2], config, opts_slab, classify=True)["probs"]
    )
    assert not np.isfinite(probs_unsafe).all(), (
        "fixture no longer overflows the unsafe 3-pass core; scale it up"
    )

    monkeypatch.delenv("DINOV2_TPU_SM3")
    got = forward(params, x, config, opts_slab, classify=True)
    want = forward(params, x, config, opts_van, classify=True)
    assert np.isfinite(np.asarray(got["probs"])).all()
    np.testing.assert_allclose(
        np.asarray(got["probs"]), np.asarray(want["probs"]),
        rtol=1e-4, atol=1e-5,
    )


def test_outlier_channel_robustness(rng, tmp_path):
    """Offline proxy for real-checkpoint robustness (VERDICT r2 missing #2):
    real DINOv2 checkpoints have outlier channels whose activations stress
    bf16 and the quant formats. Build weights with heavy-tailed per-channel
    scales (some channels x50), run f32 vs bf16 and dequant-vs-fused-quant,
    and require finite outputs + stable top-1 + bounded prob drift."""
    import jax.numpy as jnp

    from dinov2_tpu.models.config import DinoConfig
    from dinov2_tpu.models.params import init_params
    from dinov2_tpu.models.vit import ModelOptions, forward

    config = DinoConfig(hidden_size=128, num_hidden_layers=4,
                        num_attention_heads=2, num_classes=16,
                        patch_size=14, img_size=70)
    params = init_params(config, seed=5, dtype=jnp.float32)

    # inject outlier channels: scale a few columns of qkv/fc1 kernels by 50
    import jax

    def spike(leaf):
        if leaf.ndim == 3 and leaf.shape[-1] >= 128:  # stacked (L, in, out)
            scales = np.ones(leaf.shape[-1], np.float32)
            scales[:: max(1, leaf.shape[-1] // 4)] = 50.0
            return leaf * jnp.asarray(scales)
        return leaf

    layers = params["layers"]
    layers = dict(layers)
    layers["qkv"] = dict(layers["qkv"])
    layers["qkv"]["kernel"] = spike(layers["qkv"]["kernel"])
    layers["mlp"] = dict(layers["mlp"])
    layers["mlp"]["fc1"] = dict(layers["mlp"]["fc1"])
    layers["mlp"]["fc1"]["kernel"] = spike(layers["mlp"]["fc1"]["kernel"])
    params = dict(params)
    params["layers"] = layers

    x = jnp.asarray(rng.standard_normal((2, 70, 70, 3)), jnp.float32)
    outs = {}
    for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        opts = ModelOptions(parity="hf", compute_dtype=dtype,
                            flash_attention="slab")
        out = forward(
            jax.tree_util.tree_map(lambda l: l.astype(dtype) if l.dtype == jnp.float32 and l.ndim >= 2 else l, params),
            x, config, opts, classify=True,
        )
        outs[name] = {k: np.asarray(v) for k, v in out.items()}
        assert np.isfinite(outs[name]["probs"]).all(), f"{name} produced non-finite probs"
        assert np.isfinite(outs[name]["cls_token"]).all()
    # top-1 stable across dtypes despite 50x outlier channels
    assert (outs["f32"]["probs"].argmax(-1) == outs["bf16"]["probs"].argmax(-1)).all()
    assert np.abs(outs["f32"]["probs"] - outs["bf16"]["probs"]).max() < 0.05

    # the docstring's quant coverage: round-trip the SAME spiked weights
    # through q4_0 and require the dequant and fused-kernel paths to agree
    # (same math, different schedule) with finite outputs
    from dinov2_tpu.io.export import export_gguf
    from dinov2_tpu.models.params import load_params
    from dinov2_tpu.quant.quantize import quantize_gguf

    fp = tmp_path / "spiked.gguf"
    export_gguf(fp, params, config)
    qp = tmp_path / "spiked.q4_0.gguf"
    quantize_gguf(fp, qp, "q4_0")
    probs_q = {}
    for mode in ("dequant", "fused"):
        lq = load_params(qp, dtype=jnp.float32, quant_mode=mode)
        out = forward(
            lq.params, x, lq.config,
            ModelOptions(parity="hf", compute_dtype=jnp.float32),
            classify=True,
        )
        probs_q[mode] = np.asarray(out["probs"])
        assert np.isfinite(probs_q[mode]).all(), f"{mode} non-finite under outliers"
    np.testing.assert_allclose(probs_q["dequant"], probs_q["fused"], atol=5e-3)


def test_batch_chunked_forward_matches_whole_batch(rng, monkeypatch):
    """Large-batch long-T inference runs as sequential lax.map chunks
    (models/vit.py::_batch_chunk — the 518px >b8 throughput fix, VERDICT r3
    item 5). Forcing a chunk size via DINOV2_TPU_BATCH_CHUNK at small dims
    must reproduce the whole-batch outputs (same per-image math; only the
    schedule changes)."""
    import jax.numpy as jnp

    from dinov2_tpu.models.config import DinoConfig
    from dinov2_tpu.models.params import init_params
    from dinov2_tpu.models.vit import ModelOptions, forward

    cfg = DinoConfig(hidden_size=64, num_hidden_layers=2,
                     num_attention_heads=2, num_classes=4,
                     patch_size=14, img_size=70)
    params = init_params(cfg, seed=0, dtype=jnp.float32)
    opts = ModelOptions(parity="hf", compute_dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((6, 70, 70, 3)), jnp.float32)

    # env is read at trace time and is not part of the jit key: clear between
    monkeypatch.setenv("DINOV2_TPU_BATCH_CHUNK", "0")
    forward.clear_cache()
    whole = forward(params, x, cfg, opts, classify=True)

    monkeypatch.setenv("DINOV2_TPU_BATCH_CHUNK", "2")
    forward.clear_cache()
    chunked = forward(params, x, cfg, opts, classify=True)
    forward.clear_cache()

    for key in ("probs", "cls_token", "patch_tokens"):
        np.testing.assert_allclose(
            np.asarray(chunked[key]), np.asarray(whole[key]),
            rtol=2e-5, atol=2e-6, err_msg=key,
        )
    # batch 6 with chunk 4 does not divide: falls back to whole-batch (no
    # silent remainder drop)
    monkeypatch.setenv("DINOV2_TPU_BATCH_CHUNK", "4")
    forward.clear_cache()
    fallback = forward(params, x, cfg, opts, classify=True)
    forward.clear_cache()
    np.testing.assert_allclose(
        np.asarray(fallback["probs"]), np.asarray(whole["probs"]),
        rtol=2e-5, atol=2e-6,
    )


def test_batch_chunk_divisor_pick(monkeypatch):
    """_batch_chunk's auto policy: long-T batches chunk at the largest
    divisor of b in [4, 8]; primes and b <= 8 stay whole-batch; short T
    never chunks; the env override wins."""
    from dinov2_tpu.models.vit import _batch_chunk

    monkeypatch.delenv("DINOV2_TPU_BATCH_CHUNK", raising=False)
    assert _batch_chunk(32, 1370) == 8
    assert _batch_chunk(20, 1370) == 5  # non-multiple of 8 still chunks
    assert _batch_chunk(12, 1370) == 6
    assert _batch_chunk(13, 1370) is None  # prime: whole-batch
    assert _batch_chunk(8, 1370) is None  # already the saturating size
    assert _batch_chunk(64, 257) is None  # classify shapes stay whole-batch
    monkeypatch.setenv("DINOV2_TPU_BATCH_CHUNK", "2")
    assert _batch_chunk(64, 257) == 2
    monkeypatch.setenv("DINOV2_TPU_BATCH_CHUNK", "0")
    assert _batch_chunk(64, 1370) is None

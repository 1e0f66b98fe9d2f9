"""Utility-layer tests: attention-path policy, debug guards, timing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dinov2_tpu.ops.attention import resolve_attention_path, use_flash
from dinov2_tpu.utils.debug import check_finite, print_tensor
from dinov2_tpu.utils.timing import Timer, time_blocked


def test_use_flash_policy():
    assert use_flash(True, 10, 10000) is True
    assert use_flash(False, 100000, 1) is False
    # tests run on CPU: auto never picks the (interpreted) Pallas path
    assert use_flash("auto", 2048, 384) is False


def test_resolve_attention_path():
    assert resolve_attention_path(True, 257, 768) == "flash"
    assert resolve_attention_path(False, 257, 768) == "vanilla"
    assert resolve_attention_path("slab", 257, 768) == "slab"
    # CPU backend: auto always resolves to vanilla
    assert resolve_attention_path("auto", 257, 768) == "vanilla"
    assert resolve_attention_path("auto", 20000, 768) == "vanilla"


def test_check_finite_flag(monkeypatch):
    tree = {"a": jnp.ones(3), "b": {"c": jnp.asarray([1.0, np.inf])}}
    check_finite(tree, "off:")  # disabled -> no-op
    monkeypatch.setenv("DINOV2_TPU_DEBUG_NAN", "1")
    with pytest.raises(FloatingPointError, match="on:"):
        check_finite(tree, "on:")
    check_finite({"a": jnp.ones(2)}, "clean:")


def test_print_tensor(capsys):
    print_tensor("probe", jnp.arange(12.0).reshape(3, 4), n=4)
    out = capsys.readouterr().out
    # ggml ne[] order (innermost first): a (3, 4) array prints "4 3 1 1",
    # matching print_t_f32's ne[0..3] line so traces diff cleanly
    assert "dims: 4 3 1 1 f32" in out
    assert "sum:  66" in out


def test_timer_and_time_blocked():
    out, ms = time_blocked(lambda: jnp.ones((8, 8)) * 2)
    assert ms >= 0
    np.testing.assert_array_equal(np.asarray(out), 2 * np.ones((8, 8)))
    t = Timer()
    with t.measure(jnp.ones(4)):
        _ = jnp.ones(4) + 1
    assert t.elapsed_ms >= 0


def test_gelu_tanh_f16_lut_semantics():
    """parity="reference" GELU replicates ggml's fp16 lookup table (consumed at
    /root/reference/dinov2.cpp:566): table[i] = f16(gelu_tanh_f32(f16(x))).
    The emulation must (a) quantize its OUTPUT to the f16 grid, (b) depend only
    on the f16 rounding of its INPUT, and (c) track the f32 tanh-GELU of the
    f16 input to f16 rounding."""
    from dinov2_tpu.ops.qmatmul import gelu_tanh_f16

    x = np.linspace(-8.0, 8.0, 4097, dtype=np.float32)
    got = np.asarray(gelu_tanh_f16(jnp.asarray(x)))
    # (a) every output is exactly representable in f16
    np.testing.assert_array_equal(got, got.astype(np.float16).astype(np.float32))
    # (b) inputs that round to the same f16 value produce identical outputs
    x16 = x.astype(np.float16).astype(np.float32)
    nudged = np.asarray(gelu_tanh_f16(jnp.asarray(x16)))
    np.testing.assert_array_equal(got, nudged)
    # (c) matches the table value within one f16 ulp. Oracle in f64 then
    # rounded: numpy's f32 tanh is NOT correctly rounded in the saturated
    # tail (tanhf(-10) != -1), XLA's is.
    x64 = x16.astype(np.float64)
    c = np.sqrt(2.0 / np.pi)
    want = 0.5 * x64 * (1.0 + np.tanh(c * (x64 + 0.044715 * x64**3)))
    want16 = want.astype(np.float16)
    ulp = np.spacing(np.abs(want16)).astype(np.float32)
    diff = np.abs(got.astype(np.float32) - want16.astype(np.float32))
    # XLA's tanh saturates to ±1 a hair earlier than libm, flushing the
    # f16-subnormal GELU tail (|x| ≳ 5) to ±0 — allow the sub-microscopic tail
    assert np.all((diff <= ulp) | (diff <= 1e-6))


def test_gelu_veltkamp_bf16_skips_input_round_exactly():
    """gelu_tanh_f16_veltkamp skips the input Veltkamp split for bf16 (f16
    rounding is exact on 8 significand bits); result must bit-match the
    explicit round11-on-input form over the whole plausible activation
    range, including the f16-subnormal band."""
    from dinov2_tpu.ops.qmatmul import gelu_tanh_f16_veltkamp

    def round11(v):
        c = v * 8193.0
        return c - (c - v)

    x = np.concatenate(
        [
            np.linspace(-64.0, 64.0, 2001, dtype=np.float32),
            np.asarray([1e-6, -1e-6, 6e-5, -6e-5, 0.0, 65504.0], np.float32),
        ]
    ).astype(jnp.bfloat16)
    got = np.asarray(gelu_tanh_f16_veltkamp(jnp.asarray(x)), np.float32)
    v = round11(np.asarray(x, np.float32))
    import jax

    g = np.asarray(jax.nn.gelu(jnp.asarray(v), approximate=True))
    want = np.asarray(jnp.asarray(round11(g), jnp.bfloat16), np.float32)
    np.testing.assert_array_equal(got, want)


def test_model_options_gelu_activation():
    from dinov2_tpu.models.vit import ModelOptions

    assert ModelOptions(parity="reference").gelu_activation == "gelu_tanh_f16"
    assert ModelOptions(parity="hf").gelu_activation == "gelu_erf"

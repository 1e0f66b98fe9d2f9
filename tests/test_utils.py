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
    assert "dims: 3 4 1 1 f32" in out
    assert "sum:  66" in out


def test_timer_and_time_blocked():
    out, ms = time_blocked(lambda: jnp.ones((8, 8)) * 2)
    assert ms >= 0
    np.testing.assert_array_equal(np.asarray(out), 2 * np.ones((8, 8)))
    t = Timer()
    with t.measure(jnp.ones(4)):
        _ = jnp.ones(4) + 1
    assert t.elapsed_ms >= 0

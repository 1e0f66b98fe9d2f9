"""The synthetic-GGUF generator must emit exactly the tensor inventory the real
converter produces (guards drift between the two)."""

import numpy as np
import pytest
import torch

from dinov2_tpu.io.convert import convert_hf_model
from dinov2_tpu.io.gguf import GGUFReader
from dinov2_tpu.io.synthetic import write_synthetic_gguf
from dinov2_tpu.models.config import DinoConfig


def _names_and_types(path):
    r = GGUFReader(path)
    out = {name: (t.ggml_type, t.shape) for name, t in r.tensors.items()}
    kv = dict(r.kv)
    r.close()
    return out, kv


@pytest.mark.parametrize("registers,swiglu", [(0, False), (4, False), (0, True)])
def test_synthetic_matches_converter_inventory(tmp_path, registers, swiglu):
    torch.manual_seed(0)
    if registers:
        from transformers import (
            Dinov2WithRegistersConfig,
            Dinov2WithRegistersForImageClassification,
        )

        hf_cfg = Dinov2WithRegistersConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=128, image_size=28, patch_size=7,
            num_register_tokens=registers, num_labels=3,
        )
        hf_cfg.id2label = {i: f"c{i}" for i in range(3)}
        model = Dinov2WithRegistersForImageClassification(hf_cfg)
    else:
        from transformers import Dinov2Config, Dinov2ForImageClassification

        hf_cfg = Dinov2Config(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=128, image_size=28, patch_size=7,
            use_swiglu_ffn=swiglu, num_labels=3,
        )
        hf_cfg.id2label = {i: f"c{i}" for i in range(3)}
        model = Dinov2ForImageClassification(hf_cfg)

    conv_path = convert_hf_model(model, tmp_path / "conv.gguf")

    cfg = DinoConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        num_classes=3, num_register_tokens=registers, patch_size=7, img_size=28,
        use_swiglu_ffn=swiglu or None, mlp_ratio=4.0,
        swiglu_hidden=None,
    )
    syn_path = write_synthetic_gguf(tmp_path / "syn.gguf", cfg, seed=0)

    conv, conv_kv = _names_and_types(conv_path)
    syn, syn_kv = _names_and_types(syn_path)

    assert set(conv) == set(syn), (
        f"missing in synthetic: {set(conv) - set(syn)}; "
        f"extra in synthetic: {set(syn) - set(conv)}"
    )
    for name in conv:
        assert conv[name][0] == syn[name][0], f"{name}: dtype mismatch"
        assert conv[name][1] == syn[name][1], f"{name}: shape mismatch"

    for key in ("hidden_size", "num_hidden_layers", "num_attention_heads",
                "num_classes", "patch_size", "img_size", "num_register_tokens"):
        assert conv_kv[key] == syn_kv[key], key


def test_headless_checkpoint_kv_consistent(tmp_path):
    """with_classifier=False must write num_classes=0 even when the config
    says otherwise: num_classes>0 with no classifier tensors is a GGUF the
    reference loader fails on (missing classifier.weight)."""
    from dinov2_tpu.io.gguf import GGUFReader
    from dinov2_tpu.io.synthetic import write_synthetic_gguf
    from dinov2_tpu.models.config import DinoConfig

    cfg = DinoConfig(hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
                     num_classes=1000, patch_size=14, img_size=70)
    path = write_synthetic_gguf(tmp_path / "h.gguf", cfg, seed=1,
                                with_classifier=False)
    with GGUFReader(path) as r:
        assert r.kv["num_classes"] == 0
        assert not any(n.startswith("classifier") for n in r.tensors)

"""dinov2-tpu: a TPU-native DINOv2 inference framework built from scratch in JAX.

Capability parity target: lavaman131/dinov2.cpp (see SURVEY.md). The compute path is
JAX/XLA/Pallas (bf16 matmuls on the MXU, fused Pallas kernels for flash attention and
quantized matmul); the host-side GGUF/quant codec has an optional C++ fast path
(csrc/), with a pure-numpy fallback.
"""

__version__ = "0.1.0"


def _honor_platform_env() -> None:
    """Mirror JAX_PLATFORMS into the jax config knob before backend init.

    Some out-of-tree TPU plugins (the axon tunnel on this host) register
    themselves regardless of JAX_PLATFORMS, so `JAX_PLATFORMS=cpu python -m
    dinov2_tpu.cli...` would still initialize — and, on a busy single-client
    tunnel, block on — the TPU backend. The config knob wins over plugin
    self-registration (tests/conftest.py uses the same trick); applying it
    here makes the env var behave as documented for every entry point."""
    import os

    plats = os.environ.get("JAX_PLATFORMS")
    if plats:
        import jax

        jax.config.update("jax_platforms", plats)


_honor_platform_env()

_LAZY = {
    "DinoConfig": "dinov2_tpu.models.config",
    "PRESETS": "dinov2_tpu.models.config",
    "DinoEngine": "dinov2_tpu.runtime.engine",
    "BatchingServer": "dinov2_tpu.runtime.server",
    "GGUFReader": "dinov2_tpu.io.gguf",
    "GGUFWriter": "dinov2_tpu.io.gguf",
    "GGMLType": "dinov2_tpu.io.gguf",
    "load_params": "dinov2_tpu.models.params",
    "init_params": "dinov2_tpu.models.params",
    "forward": "dinov2_tpu.models.vit",
    "ModelOptions": "dinov2_tpu.models.vit",
    "quantize_gguf": "dinov2_tpu.quant.quantize",
    "export_gguf": "dinov2_tpu.io.export",
    "convert_hf_model": "dinov2_tpu.io.convert",
    "make_trainer": "dinov2_tpu.parallel.train",
    "make_mesh": "dinov2_tpu.parallel.mesh",
    "pipeline_forward": "dinov2_tpu.parallel.pipeline",
    "place_pipeline_params": "dinov2_tpu.parallel.pipeline",
    "flash_attention": "dinov2_tpu.ops.flash_attention",
    "slab_attention": "dinov2_tpu.ops.fused_attention",
    "quant_matmul_pallas": "dinov2_tpu.ops.pallas_qmatmul",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

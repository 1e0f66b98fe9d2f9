"""dinov2-tpu: a TPU-native DINOv2 inference framework built from scratch in JAX.

Capability parity target: lavaman131/dinov2.cpp (see SURVEY.md). The compute path is
JAX/XLA/Pallas (bf16 matmuls on the MXU, fused Pallas kernels for flash attention and
quantized matmul); the host-side GGUF/quant codec has an optional C++ fast path
(csrc/), with a pure-numpy fallback.
"""

__version__ = "0.1.0"

_LAZY = {
    "DinoConfig": "dinov2_tpu.models.config",
    "DinoEngine": "dinov2_tpu.runtime.engine",
    "GGUFReader": "dinov2_tpu.io.gguf",
    "GGUFWriter": "dinov2_tpu.io.gguf",
    "GGMLType": "dinov2_tpu.io.gguf",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

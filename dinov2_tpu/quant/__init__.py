from dinov2_tpu.quant.blocks import (  # noqa: F401
    dequantize,
    quantize,
    validate_quantized,
)

from dinov2_tpu.io.gguf import (  # noqa: F401
    GGMLType,
    GGUFReader,
    GGUFTensor,
    GGUFValueType,
    GGUFWriter,
    read_gguf,
    write_gguf,
)

from metatransformer_tpu.core import convert, encoder  # noqa: F401
from metatransformer_tpu.core.encoder import (  # noqa: F401
    BASE,
    BF16,
    FP32,
    GRAPH_BASE,
    LARGE,
    EncoderConfig,
    Precision,
    encode,
)

"""Data2Seq-equivalent modality tokenizers, each a pure jittable fn.

Replaces ``/root/reference/Data2Seq/`` (the core abstraction of the
reference). Every tokenizer is an (init, apply) pair over a plain pytree:
``apply(params, raw) -> tokens [B, T, D]`` and fuses into the encoder jit.
"""

from metatransformer_tpu.tokenizers import (  # noqa: F401
    audio,
    hyper,
    image,
    tabular,
    time_series,
    video,
)

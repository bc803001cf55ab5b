from metatransformer_tpu.runtime import native  # noqa: F401

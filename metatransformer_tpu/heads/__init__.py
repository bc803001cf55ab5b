from metatransformer_tpu.heads import cls  # noqa: F401

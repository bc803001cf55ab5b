from metatransformer_tpu.parallel import mesh  # noqa: F401

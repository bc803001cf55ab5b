from metatransformer_tpu.train import step  # noqa: F401

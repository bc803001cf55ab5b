from metatransformer_tpu.utils import checkpoint, logger, metrics  # noqa: F401

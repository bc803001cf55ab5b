from metatransformer_tpu.ops import fbank  # noqa: F401

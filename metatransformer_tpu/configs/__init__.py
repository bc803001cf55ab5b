from metatransformer_tpu.configs.config import Config, load_config  # noqa: F401

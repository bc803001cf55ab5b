from metatransformer_tpu.data import graph_collate  # noqa: F401

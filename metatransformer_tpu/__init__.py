"""metatransformer_tpu — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of the
Meta-Transformer multimodal perception framework.

One frozen shared ViT encoder (Base 12x768 / Large 24x1024), twelve
modality tokenizers, per-task heads, a single trainer + mesh-parallel
runtime — replacing the reference hub of ten CUDA/PyTorch subprojects.
"""

__version__ = "0.1.0"

from metatransformer_tpu.core import encoder  # noqa: F401

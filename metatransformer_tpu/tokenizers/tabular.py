"""Tabular tokenizer: per-column categorical embeddings (TabTransformer).

Reference: ``Tabular/run_experiments/adult/adult_meta-transformer.py:103-131``
— pytorch-widedeep ``TabTransformer(input_dim=768, n_blocks=12)`` whose
encoder is replaced by the frozen Meta-Transformer blocks. The tokenizer
part is widedeep's categorical embedder: one embedding vector per
(column, category) pair; continuous columns are normalized and bypass the
encoder (concatenated with the flattened encoder output before the head).

TPU-native: all columns share one flat embedding table indexed with
per-column offsets — a single gather instead of n_cols small lookups.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class TabularTokenizerConfig:
    vocab_sizes: Tuple[int, ...] = ()  # categories per column
    n_continuous: int = 0
    dim: int = 768

    def __post_init__(self):
        object.__setattr__(self, "vocab_sizes", tuple(self.vocab_sizes))

    @property
    def n_categorical(self) -> int:
        return len(self.vocab_sizes)

    @property
    def total_vocab(self) -> int:
        return int(sum(self.vocab_sizes))

    @property
    def offsets(self) -> np.ndarray:
        return np.concatenate([[0], np.cumsum(self.vocab_sizes)[:-1]]).astype(
            np.int32
        )


def init(cfg: TabularTokenizerConfig, key: jax.Array) -> Dict[str, jax.Array]:
    return {
        "embed": jax.random.normal(key, (cfg.total_vocab, cfg.dim)) * 0.02,
    }


def apply(
    params: Dict[str, jax.Array],
    categorical: jax.Array,  # int [B, n_categorical]
    cfg: TabularTokenizerConfig,
) -> jax.Array:
    """[B, n_cat] category ids -> [B, n_cat, D] tokens."""
    idx = categorical.astype(jnp.int32) + jnp.asarray(cfg.offsets)[None]
    return params["embed"][idx]


def normalize_continuous(
    continuous: jax.Array, mean: jax.Array, std: jax.Array
) -> jax.Array:
    return (continuous - mean) / jnp.maximum(std, 1e-6)

"""Hyper-spectral tokenizer: linear band-patch embedding.

Reference: ``Data2Seq/Hyper_Spectrum.py:6-25`` — Linear patch-to-embedding
over flattened (patch^2 x near_band) spectral neighborhoods, plus cls
token and positional embedding sized (patch_size + 1).

NB: the reference forward is broken (``self.cls_tokens`` typo at :21,
``torch.cat(..., embed_dim=1)`` at :22, ``x = self.dropout`` at :24 —
SURVEY.md §2.1); we implement the documented intent: embed, prepend cls,
add pos[:n+1].
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class HyperTokenizerConfig:
    img_size: int = 224  # spatial patch side, reference default
    near_band: int = 1
    num_tokens: int = 16  # = reference patch_size (pos table is [p+1, D])
    dim: int = 768

    @property
    def patch_dim(self) -> int:
        return self.img_size * self.img_size * self.near_band


def init(cfg: HyperTokenizerConfig, key: jax.Array) -> Dict[str, jax.Array]:
    k1, k2 = jax.random.split(key)
    return {
        "w": jax.random.normal(k1, (cfg.patch_dim, cfg.dim)) * cfg.patch_dim**-0.5,
        "b": jnp.zeros((cfg.dim,), jnp.float32),
        "pos_embed": jax.random.normal(k2, (1, cfg.num_tokens + 1, cfg.dim)),
    }


def apply(
    params: Dict[str, jax.Array],
    x: jax.Array,
    cfg: HyperTokenizerConfig,
    cls_token: jax.Array,
    mm: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """x: [B, n, patch_dim] band patches -> [B, n+1, D] with cls + pos."""
    tokens = jnp.dot(x, params["w"], precision=mm) + params["b"]
    b, n, _ = tokens.shape
    cls = jnp.broadcast_to(cls_token.astype(tokens.dtype), (b, 1, cfg.dim))
    tokens = jnp.concatenate([cls, tokens], axis=1)
    return tokens + params["pos_embed"][:, : n + 1].astype(tokens.dtype)

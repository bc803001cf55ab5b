"""Hyper-spectral classifier, band patches -> logits.

Reference: ``Hyper-spectrum/metatransformer.py:111-165`` — linear
patch-to-embedding + cls + pos, frozen Meta-T encoder (replacing the
local ViT/CAF transformer), LN + Linear mlp_head on the cls token.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from metatransformer_tpu.core import encoder as enc
from metatransformer_tpu.heads import cls as cls_head
from metatransformer_tpu.tokenizers import hyper as hyper_tok


@dataclasses.dataclass(frozen=True)
class HyperClassifierConfig:
    tokenizer: hyper_tok.HyperTokenizerConfig = hyper_tok.HyperTokenizerConfig()
    encoder: enc.EncoderConfig = enc.BASE
    num_classes: int = 16  # Indian Pines
    ln_eps: float = 1e-6

    @property
    def head(self) -> cls_head.ClsHeadConfig:
        return cls_head.ClsHeadConfig(
            in_dim=self.encoder.dim, num_classes=self.num_classes
        )


def init(cfg: HyperClassifierConfig, key: jax.Array) -> Dict[str, Any]:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "tokenizer": hyper_tok.init(cfg.tokenizer, k1),
        "cls_token": jax.random.normal(k3, (1, 1, cfg.encoder.dim)),
        "encoder": enc.init(cfg.encoder, k2),
        "head": cls_head.init(cfg.head, k4),
    }


@functools.partial(jax.jit, static_argnames=("cfg", "precision"))
def forward(
    params: Dict[str, Any],
    x: jax.Array,  # [B, n_tokens, patch_dim] band patches
    cfg: HyperClassifierConfig,
    precision: enc.Precision = enc.FP32,
) -> jax.Array:
    tokens = hyper_tok.apply(
        params["tokenizer"], x, cfg.tokenizer, params["cls_token"], mm=precision.mm
    )
    h = enc.encode(params["encoder"], tokens, cfg.encoder, precision=precision)
    return cls_head.apply(params["head"], h[:, 0, :], cfg.head, mm=precision.mm)

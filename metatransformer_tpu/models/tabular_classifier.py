"""Tabular classifier (TabTransformer-on-Meta-Transformer).

Reference: ``Tabular/run_experiments/adult/adult_meta-transformer.py:103-161``
— widedeep TabTransformer with the encoder swapped for frozen Meta-T
blocks, wrapped in WideDeep with a binary objective. Architecture:
categorical tokens -> frozen encoder -> flatten -> concat normalized
continuous -> MLP head.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from metatransformer_tpu.core import encoder as enc
from metatransformer_tpu.heads import cls as cls_head
from metatransformer_tpu.tokenizers import tabular as tab_tok


@dataclasses.dataclass(frozen=True)
class TabularClassifierConfig:
    tokenizer: tab_tok.TabularTokenizerConfig = tab_tok.TabularTokenizerConfig()
    encoder: enc.EncoderConfig = enc.BASE
    num_classes: int = 2
    head_mlps: Tuple[int, ...] = ()

    def __post_init__(self):
        object.__setattr__(self, "head_mlps", tuple(self.head_mlps))

    @property
    def head(self) -> cls_head.ClsHeadConfig:
        in_dim = (
            self.tokenizer.n_categorical * self.encoder.dim
            + self.tokenizer.n_continuous
        )
        return cls_head.ClsHeadConfig(
            in_dim=in_dim,
            num_classes=self.num_classes,
            mlps=self.head_mlps,
            use_norm=False,
        )


def init(cfg: TabularClassifierConfig, key: jax.Array) -> Dict[str, Any]:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "tokenizer": tab_tok.init(cfg.tokenizer, k1),
        "encoder": enc.init(cfg.encoder, k2),
        "head": cls_head.init(cfg.head, k3),
        "cont_mean": jnp.zeros((cfg.tokenizer.n_continuous,), jnp.float32),
        "cont_std": jnp.ones((cfg.tokenizer.n_continuous,), jnp.float32),
    }


@functools.partial(jax.jit, static_argnames=("cfg", "precision"))
def forward(
    params: Dict[str, Any],
    categorical: jax.Array,  # int [B, n_cat]
    cfg: TabularClassifierConfig,
    continuous: Optional[jax.Array] = None,  # [B, n_cont]
    precision: enc.Precision = enc.FP32,
) -> jax.Array:
    tokens = tab_tok.apply(params["tokenizer"], categorical, cfg.tokenizer)
    h = enc.encode(params["encoder"], tokens, cfg.encoder, precision=precision)
    feats = h.reshape(h.shape[0], -1)
    if cfg.tokenizer.n_continuous:
        cont = tab_tok.normalize_continuous(
            continuous, params["cont_mean"], params["cont_std"]
        )
        feats = jnp.concatenate([feats, cont.astype(feats.dtype)], axis=-1)
    return cls_head.apply(params["head"], feats, cfg.head, mm=precision.mm)

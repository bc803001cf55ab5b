"""Point-cloud classifier (Meta-Transformer point backbone + ClsHead).

Reference: ``PointCloud/openpoints/models/backbone/metatransformer.py:26-192``
— PointPatchEmbed, cls token + cls pos, a 2-layer MLP positional embedding
from 3D centers (Linear(3,128)+GELU, Linear(128,768), :71-74), frozen
blocks with pos added at EVERY block input (:161-163), final LN(eps 1e-6),
pool = concat(cls, max-over-tokens) (:171-187), openpoints ClsHead MLP
[512, 256] with dropout 0.5 (``classification/cls_base.py:78-126``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from metatransformer_tpu.core import encoder as enc
from metatransformer_tpu.heads import cls as cls_head
from metatransformer_tpu.tokenizers import point as point_tok


@dataclasses.dataclass(frozen=True)
class PointClassifierConfig:
    tokenizer: point_tok.PointTokenizerConfig = point_tok.PointTokenizerConfig()
    encoder: enc.EncoderConfig = enc.BASE
    num_classes: int = 40  # ModelNet40
    global_feat: str = "cls,max"
    ln_eps: float = 1e-6
    head_dropout: float = 0.5

    @property
    def head(self) -> cls_head.ClsHeadConfig:
        n_feats = len(self.global_feat.split(","))
        return cls_head.ClsHeadConfig(
            in_dim=n_feats * self.encoder.dim,
            num_classes=self.num_classes,
            mlps=(512, 256),
            use_norm=False,
            dropout=self.head_dropout,
        )


def init(cfg: PointClassifierConfig, key: jax.Array) -> Dict[str, Any]:
    keys = jax.random.split(key, 7)
    d = cfg.encoder.dim
    return {
        "tokenizer": point_tok.init(cfg.tokenizer, keys[0]),
        "encoder": enc.init(cfg.encoder, keys[1]),
        "cls_token": jax.random.normal(keys[2], (1, 1, d)) * 0.02,
        "cls_pos": jax.random.normal(keys[3], (1, 1, d)) * 0.02,
        "posmlp_w0": jax.random.normal(keys[4], (3, 128)) * (3**-0.5),
        "posmlp_b0": jnp.zeros((128,), jnp.float32),
        "posmlp_w1": jax.random.normal(keys[5], (128, d)) * (128**-0.5),
        "posmlp_b1": jnp.zeros((d,), jnp.float32),
        "norm_scale": jnp.ones((d,), jnp.float32),
        "norm_bias": jnp.zeros((d,), jnp.float32),
        "head": cls_head.init(cfg.head, keys[6]),
    }


def _pos_mlp(params, centers, mm):
    h = jnp.dot(centers, params["posmlp_w0"], precision=mm) + params["posmlp_b0"]
    h = jax.nn.gelu(h, approximate=False)
    return jnp.dot(h, params["posmlp_w1"], precision=mm) + params["posmlp_b1"]


@functools.partial(jax.jit, static_argnames=("cfg", "precision", "train"))
def forward(
    params: Dict[str, Any],
    points: jax.Array,  # [B, N, 3]
    cfg: PointClassifierConfig,
    features: Optional[jax.Array] = None,
    precision: enc.Precision = enc.FP32,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    center_p, tokens = point_tok.apply(
        params["tokenizer"], points, cfg.tokenizer, features, mm=precision.mm
    )
    b = tokens.shape[0]
    d = cfg.encoder.dim
    pos = jnp.concatenate(
        [
            jnp.broadcast_to(params["cls_pos"].astype(tokens.dtype), (b, 1, d)),
            _pos_mlp(params, center_p, precision.mm).astype(tokens.dtype),
        ],
        axis=1,
    )
    x = jnp.concatenate(
        [jnp.broadcast_to(params["cls_token"].astype(tokens.dtype), (b, 1, d)), tokens],
        axis=1,
    )
    x = enc.encode(
        params["encoder"], x, cfg.encoder,
        pos=pos, pos_each_block=True, precision=precision,
    )
    x = enc.layer_norm(x, params["norm_scale"], params["norm_bias"], cfg.ln_eps)

    feats = []
    body = x[:, 1:, :]
    for kind in cfg.global_feat.split(","):
        if kind == "cls":
            feats.append(x[:, 0, :])
        elif kind == "max":
            feats.append(jnp.max(body, axis=1))
        elif kind in ("avg", "mean"):
            feats.append(jnp.mean(body, axis=1))
    gf = jnp.concatenate(feats, axis=-1)
    return cls_head.apply(
        params["head"], gf, cfg.head, train=train, rng=rng, mm=precision.mm
    )

"""Generic Meta-Transformer sequence classifier.

The pattern repeated across the reference subprojects — tokenize, prepend
[cls] (+[dist]), add positional embedding, run the frozen encoder, pool,
head — implemented once. Per-modality models configure this assembly:

* image/x-ray/infrared: cls token + learned pos, pool=cls
  (``X-Ray/train.py:109-131``, timm ViT semantics)
* audio AST: cls+dist tokens, pool=avg(cls,dist)
  (``Audio/src/models/ast_models.py:146-167``)
* hyper-spectral: cls + learned pos, pool=cls
  (``Hyper-spectrum/metatransformer.py:111-165``)
* point cloud: cls + MLP pos from 3D centers added EVERY block,
  pool=concat(cls, max) (``openpoints/models/backbone/metatransformer.py``)

Everything from raw input to logits is one jittable function.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from metatransformer_tpu.core import encoder as enc
from metatransformer_tpu.heads import cls as cls_head

TokenizeFn = Callable[[Dict[str, jax.Array], jax.Array], jax.Array]


@dataclasses.dataclass(frozen=True)
class ClassifierConfig:
    encoder: enc.EncoderConfig
    head: cls_head.ClsHeadConfig
    seq_len: int  # token count from the tokenizer (pre-cls)
    num_prefix_tokens: int = 1  # cls (+dist) tokens; 0 = none
    pos_embed: str = "learned"  # "learned" | "none"
    pos_each_block: bool = False
    pool: str = "cls"  # "cls" | "mean" | "cls_dist_avg" | "cls,max" | "cls,max,avg"
    final_norm: bool = True  # LayerNorm after the encoder stack
    ln_eps: float = 1e-6


def init_wrapper(cfg: ClassifierConfig, key: jax.Array) -> Dict[str, jax.Array]:
    """Init everything except tokenizer + encoder (owned by their modules)."""
    k1, k2, k3 = jax.random.split(key, 3)
    t = cfg.seq_len + cfg.num_prefix_tokens
    params: Dict[str, Any] = {}
    if cfg.num_prefix_tokens:
        params["prefix_tokens"] = (
            jax.random.normal(k1, (1, cfg.num_prefix_tokens, cfg.encoder.dim)) * 0.02
        )
    if cfg.pos_embed == "learned":
        params["pos_embed"] = jax.random.normal(k2, (1, t, cfg.encoder.dim)) * 0.02
    if cfg.final_norm:
        params["norm_scale"] = jnp.ones((cfg.encoder.dim,), jnp.float32)
        params["norm_bias"] = jnp.zeros((cfg.encoder.dim,), jnp.float32)
    params["head"] = cls_head.init(cfg.head, k3)
    return params


def pool(x: jax.Array, cfg: ClassifierConfig) -> jax.Array:
    """[B, T, D] encoded sequence -> [B, F] pooled features."""
    npf = cfg.num_prefix_tokens
    body = x[:, npf:, :]
    feats = []
    for kind in cfg.pool.split(","):
        if kind == "cls":
            feats.append(x[:, 0, :])
        elif kind == "cls_dist_avg":
            feats.append((x[:, 0, :] + x[:, 1, :]) / 2.0)
        elif kind == "mean" or kind == "avg":
            feats.append(jnp.mean(body, axis=1))
        elif kind == "max":
            feats.append(jnp.max(body, axis=1))
        else:
            raise ValueError(f"unknown pool kind {kind!r}")
    return jnp.concatenate(feats, axis=-1) if len(feats) > 1 else feats[0]


def forward(
    params: Dict[str, Any],
    raw: jax.Array,
    cfg: ClassifierConfig,
    tokenize: TokenizeFn,
    precision: enc.Precision = enc.FP32,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    pos_override: Optional[jax.Array] = None,
) -> jax.Array:
    """Raw modality input -> logits, as one XLA program.

    ``params`` must hold keys: "tokenizer", "encoder", plus the wrapper
    params from :func:`init_wrapper`. ``pos_override`` lets data-dependent
    positional embeddings (point cloud centers) replace the learned table.
    """
    tokens = tokenize(params["tokenizer"], raw)
    b = tokens.shape[0]
    if cfg.num_prefix_tokens:
        prefix = jnp.broadcast_to(
            params["prefix_tokens"].astype(tokens.dtype),
            (b, cfg.num_prefix_tokens, cfg.encoder.dim),
        )
        tokens = jnp.concatenate([prefix, tokens], axis=1)

    pos = pos_override
    if pos is None and cfg.pos_embed == "learned":
        pos = params["pos_embed"]

    x = enc.encode(
        params["encoder"],
        tokens,
        cfg.encoder,
        pos=pos,
        pos_each_block=cfg.pos_each_block,
        precision=precision,
    )
    if cfg.final_norm:
        x = enc.layer_norm(x, params["norm_scale"], params["norm_bias"], cfg.ln_eps)
    feats = pool(x, cfg)
    return cls_head.apply(
        params["head"], feats, cfg.head, train=train, rng=rng, mm=precision.mm
    )

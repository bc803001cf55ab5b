"""Point-cloud semantic segmentation (S3DIS/ShapeNetPart path).

Reference: ``forward_seg_feat`` on the point backbone
(``openpoints/models/backbone/metatransformer.py:189-192``) + the BaseSeg
decode path (``openpoints/models/segmentation/base_seg.py``): encode
group tokens with the frozen encoder, propagate features back to the full
point set with 3-NN inverse-distance interpolation (the interpolate_gpu.cu
replacement in ops.point_interp), concat the per-point input features,
per-point MLP head -> per-point class logits.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from metatransformer_tpu.core import encoder as enc
from metatransformer_tpu.models import point_classifier
from metatransformer_tpu.ops import point_interp
from metatransformer_tpu.tokenizers import point as point_tok


@dataclasses.dataclass(frozen=True)
class PointSegmenterConfig:
    tokenizer: point_tok.PointTokenizerConfig = point_tok.PointTokenizerConfig()
    encoder: enc.EncoderConfig = enc.BASE
    num_classes: int = 13  # S3DIS
    head_hidden: int = 256
    ln_eps: float = 1e-6


def init(cfg: PointSegmenterConfig, key: jax.Array) -> Dict[str, Any]:
    keys = jax.random.split(key, 8)
    d = cfg.encoder.dim
    head_in = d + 3  # interpolated token features + raw xyz
    return {
        "tokenizer": point_tok.init(cfg.tokenizer, keys[0]),
        "encoder": enc.init(cfg.encoder, keys[1]),
        "cls_token": jax.random.normal(keys[2], (1, 1, d)) * 0.02,
        "cls_pos": jax.random.normal(keys[3], (1, 1, d)) * 0.02,
        "posmlp_w0": jax.random.normal(keys[4], (3, 128)) * (3**-0.5),
        "posmlp_b0": jnp.zeros((128,)),
        "posmlp_w1": jax.random.normal(keys[5], (128, d)) * (128**-0.5),
        "posmlp_b1": jnp.zeros((d,)),
        "norm_scale": jnp.ones((d,)),
        "norm_bias": jnp.zeros((d,)),
        "head_w0": jax.random.normal(keys[6], (head_in, cfg.head_hidden))
        * head_in**-0.5,
        "head_b0": jnp.zeros((cfg.head_hidden,)),
        "head_w1": jax.random.normal(keys[7], (cfg.head_hidden, cfg.num_classes))
        * cfg.head_hidden**-0.5,
        "head_b1": jnp.zeros((cfg.num_classes,)),
    }


@functools.partial(jax.jit, static_argnames=("cfg", "precision"))
def forward(
    params: Dict[str, Any],
    points: jax.Array,  # [B, N, 3]
    cfg: PointSegmenterConfig,
    features: Optional[jax.Array] = None,
    precision: enc.Precision = enc.FP32,
) -> jax.Array:
    """-> per-point logits [B, N, num_classes]."""
    mm = precision.mm
    center_p, tokens = point_tok.apply(
        params["tokenizer"], points, cfg.tokenizer, features, mm=mm
    )
    b, m, d = tokens.shape
    pos = jnp.concatenate(
        [
            jnp.broadcast_to(params["cls_pos"].astype(tokens.dtype), (b, 1, d)),
            point_classifier._pos_mlp(params, center_p, mm).astype(tokens.dtype),
        ],
        axis=1,
    )
    x = jnp.concatenate(
        [jnp.broadcast_to(params["cls_token"].astype(tokens.dtype), (b, 1, d)),
         tokens],
        axis=1,
    )
    x = enc.encode(
        params["encoder"], x, cfg.encoder,
        pos=pos, pos_each_block=True, precision=precision,
    )
    x = enc.layer_norm(x, params["norm_scale"], params["norm_bias"], cfg.ln_eps)
    token_feats = x[:, 1:, :]  # drop cls

    # propagate group features back to every input point (3-NN interp)
    per_point = point_interp.three_interpolation(points, center_p, token_feats)
    h = jnp.concatenate([per_point, points.astype(per_point.dtype)], axis=-1)
    h = jax.nn.relu(
        jnp.dot(h, params["head_w0"], precision=mm) + params["head_b0"]
    )
    return jnp.dot(h, params["head_w1"], precision=mm) + params["head_b1"]

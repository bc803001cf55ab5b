"""MaskFormer-style query-based segmentation head.

Reference: ``Image/segmentation/mmseg_custom/models/decode_heads/
maskformer_head.py`` (+ mask2former_head.py) — N learned object queries
attend pixel features through a transformer decoder; each query yields a
class prediction and a mask embedding whose dot product with per-pixel
embeddings is the mask. Training matches queries to ground truth with the
Hungarian matcher over cls/focal-mask/dice costs (``ops/matching.py``).

This is the compact single-scale variant (the multi-scale
MSDeformAttn pixel decoder composes from ops.ms_deform_attn; round 2).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from metatransformer_tpu.core import encoder as enc
from metatransformer_tpu.models.time_series import (
    _decoder_layer,
    _decoder_layer_shapes,
    DecoderConfig,
)


@dataclasses.dataclass(frozen=True)
class MaskFormerConfig:
    in_dim: int = 768
    num_queries: int = 100
    num_classes: int = 150  # +1 implicit "no object"
    decoder: DecoderConfig = DecoderConfig(dim=256, d_ff=1024, num_heads=8, depth=6)
    mask_dim: int = 256


def init(cfg: MaskFormerConfig, key: jax.Array) -> Dict[str, Any]:
    keys = jax.random.split(key, 8)
    d = cfg.decoder.dim
    shapes = _decoder_layer_shapes(cfg.decoder)
    lkeys = jax.random.split(keys[0], len(shapes))
    dec = {}
    for (name, shape), k in zip(shapes.items(), lkeys):
        full = (cfg.decoder.depth,) + shape
        if name.endswith("_w"):
            dec[name] = jax.random.normal(k, full) * (shape[0] ** -0.5)
        elif "scale" in name:
            dec[name] = jnp.ones(full)
        else:
            dec[name] = jnp.zeros(full)
    return {
        "queries": jax.random.normal(keys[1], (cfg.num_queries, d)) * 0.02,
        "input_proj_w": jax.random.normal(keys[2], (cfg.in_dim, d))
        * cfg.in_dim**-0.5,
        "input_proj_b": jnp.zeros((d,)),
        "decoder": dec,
        "cls_w": jax.random.normal(keys[3], (d, cfg.num_classes + 1)) * d**-0.5,
        "cls_b": jnp.zeros((cfg.num_classes + 1,)),
        "mask_embed_w": jax.random.normal(keys[4], (d, cfg.mask_dim)) * d**-0.5,
        "mask_embed_b": jnp.zeros((cfg.mask_dim,)),
        "pixel_embed_w": jax.random.normal(keys[5], (cfg.in_dim, cfg.mask_dim))
        * cfg.in_dim**-0.5,
        "pixel_embed_b": jnp.zeros((cfg.mask_dim,)),
    }


def apply(
    params: Dict[str, Any],
    pixel_features: jax.Array,  # [B, H, W, in_dim] (e.g. ViT-Adapter f2)
    cfg: MaskFormerConfig,
    mm: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> Tuple[jax.Array, jax.Array]:
    """-> (class_logits [B, Q, num_classes+1], mask_logits [B, Q, H, W])."""
    b, h, w, _ = pixel_features.shape
    tokens = pixel_features.reshape(b, h * w, -1)
    mem = jnp.dot(tokens, params["input_proj_w"], precision=mm) + params[
        "input_proj_b"
    ]
    q = jnp.broadcast_to(
        params["queries"][None], (b, cfg.num_queries, cfg.decoder.dim)
    )

    def body(carry, layer_params):
        # object queries use bidirectional self-attention (not causal)
        return _decoder_layer(carry, mem, layer_params, cfg.decoder, mm,
                              causal=False), None

    q, _ = jax.lax.scan(body, q, params["decoder"])

    cls_logits = jnp.dot(q, params["cls_w"], precision=mm) + params["cls_b"]
    mask_embed = jnp.dot(q, params["mask_embed_w"], precision=mm) + params[
        "mask_embed_b"
    ]
    pixel_embed = jnp.dot(tokens, params["pixel_embed_w"], precision=mm) + params[
        "pixel_embed_b"
    ]
    masks = jnp.einsum("bqc,bpc->bqp", mask_embed, pixel_embed, precision=mm)
    return cls_logits, masks.reshape(b, cfg.num_queries, h, w)


def semantic_inference(cls_logits: jax.Array, mask_logits: jax.Array) -> jax.Array:
    """Per-pixel semantic map: sum_q P(class|q) * sigmoid(mask_q)
    (maskformer semantic postprocessing). -> [B, H, W, num_classes]."""
    probs = jax.nn.softmax(cls_logits, -1)[..., :-1]  # drop no-object
    masks = jax.nn.sigmoid(mask_logits)
    return jnp.einsum("bqc,bqhw->bhwc", probs, masks)

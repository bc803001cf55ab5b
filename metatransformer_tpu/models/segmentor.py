"""Semantic segmentation model: ViT-Adapter encoder + UperNet decoder.

The reference's EncoderDecoder path (``mmseg_custom/models/segmentors/``
+ ADE20K UperNet config): backbone 4-scale pyramid -> decode head ->
bilinear upsample to input -> per-pixel CE.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from metatransformer_tpu.core import encoder as enc
from metatransformer_tpu.heads import upernet
from metatransformer_tpu.models import vit_adapter


@dataclasses.dataclass(frozen=True)
class SegmentorConfig:
    backbone: vit_adapter.ViTAdapterConfig = vit_adapter.ViTAdapterConfig()
    num_classes: int = 150

    @property
    def head(self) -> upernet.UperNetConfig:
        return upernet.UperNetConfig(
            in_dim=self.backbone.encoder.dim, num_classes=self.num_classes
        )


def init(cfg: SegmentorConfig, key: jax.Array) -> Dict[str, Any]:
    k1, k2 = jax.random.split(key)
    return {
        "backbone": vit_adapter.init(cfg.backbone, k1),
        "head": upernet.init(cfg.head, k2),
    }


@functools.partial(jax.jit, static_argnames=("cfg", "precision"))
def forward(
    params: Dict[str, Any],
    images: jax.Array,  # [B, H, W, 3]
    cfg: SegmentorConfig,
    precision: enc.Precision = enc.FP32,
) -> jax.Array:
    """-> per-pixel logits [B, H, W, num_classes]."""
    feats = vit_adapter.apply(params["backbone"], images, cfg.backbone, precision)
    logits4 = upernet.apply(params["head"], feats, cfg.head)
    b, _, _, c = logits4.shape
    return jax.image.resize(
        logits4, (b, images.shape[1], images.shape[2], c), "bilinear"
    )


def seg_loss(logits: jax.Array, labels: jax.Array, ignore_index: int = 255):
    """Per-pixel CE with ignore label (mmseg convention)."""
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, safe)
    return jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1)

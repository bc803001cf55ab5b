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


# ---------------------------------------------------------------------------
# Mask2Former segmentor (the reference's flagship seg capability:
# encoder_decoder_mask2former.py + mask2former_head.py over ViT-Adapter)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Mask2FormerSegmentorConfig:
    backbone: vit_adapter.ViTAdapterConfig = vit_adapter.ViTAdapterConfig()
    num_classes: int = 150
    head_channels: int = 256
    num_queries: int = 100
    num_decoder_layers: int = 9
    num_encoder_layers: int = 6
    num_heads: int = 8

    @property
    def head(self):
        from metatransformer_tpu.heads import mask2former as m2f

        d = self.backbone.encoder.dim
        c = self.head_channels
        return m2f.Mask2FormerConfig(
            num_classes=self.num_classes,
            num_queries=self.num_queries,
            feat_channels=c,
            out_channels=c,
            num_decoder_layers=self.num_decoder_layers,
            num_heads=self.num_heads,
            ffn_dim=8 * c,
            pixel_decoder=m2f.PixelDecoderConfig(
                in_channels=(d, d, d, d),
                feat_channels=c,
                out_channels=c,
                num_encoder_layers=self.num_encoder_layers,
                num_heads=self.num_heads,
                ffn_dim=4 * c,
            ),
        )


def init_mask2former(cfg: Mask2FormerSegmentorConfig, key: jax.Array):
    from metatransformer_tpu.heads import mask2former as m2f

    k1, k2 = jax.random.split(key)
    return {
        "backbone": vit_adapter.init(cfg.backbone, k1),
        "head": m2f.init(cfg.head, k2),
    }


@functools.partial(jax.jit, static_argnames=("cfg", "precision"))
def forward_mask2former(
    params: Dict[str, Any],
    images: jax.Array,  # [B, H, W, 3]
    cfg: Mask2FormerSegmentorConfig,
    precision: enc.Precision = enc.FP32,
):
    """-> (all_cls [L+1,B,Q,C+1], all_masks [L+1,B,Q,H/4,W/4]).

    Training supervises every layer (heads.mask2former.loss); inference
    takes the last layer through semantic_inference + bilinear upsample.
    """
    from metatransformer_tpu.heads import mask2former as m2f

    feats = vit_adapter.apply(params["backbone"], images, cfg.backbone, precision)
    return m2f.apply(params["head"], feats, cfg.head, precision.mm)


def mask2former_semantic(all_cls, all_masks, out_hw):
    """Last-layer semantic map upsampled to the input size -> [B,H,W,C]."""
    from metatransformer_tpu.heads import mask2former as m2f

    sem = m2f.semantic_inference(all_cls[-1], all_masks[-1])
    b, _, _, c = sem.shape
    return jax.image.resize(sem, (b, out_hw[0], out_hw[1], c), "bilinear")


def tta_inference(
    params: Dict[str, Any],
    images: jax.Array,  # [B, H, W, 3]
    cfg: SegmentorConfig,
    scales=(0.75, 1.0, 1.25),
    flip: bool = True,
    precision: enc.Precision = enc.FP32,
) -> jax.Array:
    """Multi-scale + horizontal-flip test-time augmentation
    (the reference's aug segmentor,
    ``mmseg_custom/models/segmentors/encoder_decoder_mask2former_aug.py``:
    run each scale/flip, resize logits to the original resolution,
    un-flip, average softmax probabilities) -> [B, H, W, num_classes].

    Scaled sizes snap to patch-size multiples so every scale hits a
    valid (and cacheable) backbone geometry.
    """
    b, h, w, _ = images.shape
    ps = cfg.backbone.patch_size
    probs = None
    n = 0
    for s in scales:
        sh = max(ps, int(round(h * s / ps)) * ps)
        sw = max(ps, int(round(w * s / ps)) * ps)
        scaled = jax.image.resize(images, (b, sh, sw, 3), "bilinear")
        variants = [scaled]
        if flip:
            variants.append(scaled[:, :, ::-1])
        for vi, v in enumerate(variants):
            logits = forward(params, v, cfg, precision)
            if vi == 1:
                logits = logits[:, :, ::-1]
            logits = jax.image.resize(
                logits, (b, h, w, logits.shape[-1]), "bilinear"
            )
            p = jax.nn.softmax(logits, axis=-1)
            probs = p if probs is None else probs + p
            n += 1
    return probs / n

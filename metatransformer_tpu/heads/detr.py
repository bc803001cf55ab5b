"""DETR-style 2D detection head (Image/detection parity).

Reference: the detection side of the Image subproject runs DETR-family
heads over ViT-Adapter features (``Image/detection/configs/
{mask2former, upgraded_mask_rcnn, ...}``; the DETR-style transformer
lives in ``mmseg_custom/models/utils/transformer.py``). Compact variant:
learned object queries decode against flattened pyramid features; each
query emits class logits and a normalized (cx, cy, w, h) box; training
uses Hungarian matching over class/L1/GIoU costs.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from metatransformer_tpu.models.time_series import (
    DecoderConfig,
    _decoder_layer,
    _decoder_layer_shapes,
)


@dataclasses.dataclass(frozen=True)
class DETRHeadConfig:
    in_dim: int = 768
    num_queries: int = 100
    num_classes: int = 80  # COCO
    decoder: DecoderConfig = DecoderConfig(dim=256, d_ff=1024, num_heads=8, depth=6)


def init(cfg: DETRHeadConfig, key: jax.Array) -> Dict[str, Any]:
    keys = jax.random.split(key, 6)
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
        "box_w0": jax.random.normal(keys[4], (d, d)) * d**-0.5,
        "box_b0": jnp.zeros((d,)),
        "box_w1": jax.random.normal(keys[5], (d, 4)) * d**-0.5,
        "box_b1": jnp.zeros((4,)),
    }


def apply(
    params: Dict[str, Any],
    features: jax.Array,  # [B, H, W, in_dim]
    cfg: DETRHeadConfig,
    mm: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> Tuple[jax.Array, jax.Array]:
    """-> (class_logits [B, Q, C+1], boxes [B, Q, 4] as sigmoid cxcywh)."""
    b, h, w, _ = features.shape
    mem = features.reshape(b, h * w, -1)
    mem = jnp.dot(mem, params["input_proj_w"], precision=mm) + params["input_proj_b"]
    q = jnp.broadcast_to(
        params["queries"][None], (b, cfg.num_queries, cfg.decoder.dim)
    )

    def body(carry, layer_params):
        return _decoder_layer(carry, mem, layer_params, cfg.decoder, mm,
                              causal=False), None

    q, _ = jax.lax.scan(body, q, params["decoder"])
    cls_logits = jnp.dot(q, params["cls_w"], precision=mm) + params["cls_b"]
    hbox = jax.nn.relu(
        jnp.dot(q, params["box_w0"], precision=mm) + params["box_b0"]
    )
    boxes = jax.nn.sigmoid(
        jnp.dot(hbox, params["box_w1"], precision=mm) + params["box_b1"]
    )
    return cls_logits, boxes


def box_cxcywh_to_xyxy(boxes: jax.Array) -> jax.Array:
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1
    )


def generalized_iou(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """GIoU [N, M] for xyxy boxes (the GIoU match cost / loss)."""
    a = boxes_a[:, None]
    b = boxes_b[None, :]
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    union = area_a + area_b - inter
    iou = inter / jnp.maximum(union, 1e-8)
    # smallest enclosing box
    lt_c = jnp.minimum(a[..., :2], b[..., :2])
    rb_c = jnp.maximum(a[..., 2:], b[..., 2:])
    wh_c = jnp.maximum(rb_c - lt_c, 0.0)
    area_c = wh_c[..., 0] * wh_c[..., 1]
    return iou - (area_c - union) / jnp.maximum(area_c, 1e-8)

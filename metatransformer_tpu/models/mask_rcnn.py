"""Mask R-CNN / Cascade R-CNN over the ViT-Adapter pyramid (COCO track).

Reference composition: ``Image/detection/configs/mask_rcnn/
mask_rcnn_meta_transformer_adapter_base_fpn_3x_coco.py`` (ViTAdapter
backbone + FPN(num_outs=5) neck + mmdet RPNHead/Shared2FCBBoxHead/
FCNMaskHead) and ``configs/cascade_rcnn/`` (3 staged box heads, IoU
0.5/0.6/0.7, averaged stage scores at test time).

All stages run static-shape: a fixed-size NMS'd proposal set feeds
RoIAlign; cascade stages refine the same P boxes.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.core import encoder as enc
from metatransformer_tpu.heads import detection2d as det2d
from metatransformer_tpu.models import vit_adapter


@dataclasses.dataclass(frozen=True)
class MaskRCNNConfig:
    backbone: vit_adapter.ViTAdapterConfig = vit_adapter.ViTAdapterConfig()
    fpn: det2d.FPNConfig = det2d.FPNConfig()
    rpn: det2d.RPNConfig = det2d.RPNConfig()
    rcnn: det2d.RCNNConfig = det2d.RCNNConfig()
    img_size: int = 512

    @property
    def cascade(self) -> bool:
        return self.rcnn.num_stages > 1


def init(cfg: MaskRCNNConfig, key: jax.Array) -> Dict[str, Any]:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "backbone": vit_adapter.init(cfg.backbone, k1),
        "fpn": det2d.fpn_init(cfg.fpn, k2),
        "rpn": det2d.rpn_init(cfg.rpn, k3),
        "rcnn": det2d.rcnn_init(cfg.rcnn, k4),
    }


def _anchors(cfg: MaskRCNNConfig):
    s = cfg.img_size
    return [
        jnp.asarray(
            det2d.level_anchors((s // st, s // st), st, cfg.rpn)
        )
        for st in cfg.rpn.strides
    ]


def _forward_common(params, images, cfg, precision):
    feats = vit_adapter.apply(params["backbone"], images, cfg.backbone, precision)
    fpn_feats = det2d.fpn_apply(params["fpn"], feats, cfg.fpn)
    rpn_outs = det2d.rpn_apply(params["rpn"], fpn_feats, cfg.rpn)
    anchors = _anchors(cfg)
    proposals, scores = det2d.rpn_proposals(
        rpn_outs, anchors, cfg.rpn, (cfg.img_size, cfg.img_size)
    )
    return fpn_feats, rpn_outs, anchors, proposals, scores


@functools.partial(jax.jit, static_argnames=("cfg", "precision"))
def forward_test(
    params: Dict[str, Any],
    images: jax.Array,  # [B, S, S, 3]
    cfg: MaskRCNNConfig,
    precision: enc.Precision = enc.FP32,
):
    """-> dict(boxes [B, P, 4], scores [B, P], labels [B, P],
    masks [B, P, 2m, 2m, C] logits if with_mask). Cascade averages the
    stage class scores (cascade_rcnn test behavior)."""
    mm = precision.mm
    fpn_feats, _, _, proposals, _ = _forward_common(params, images, cfg, precision)
    boxes = proposals
    stage_probs = []
    for sp in params["rcnn"]["stages"]:
        roi = det2d.roi_align(fpn_feats, boxes, cfg.rcnn.roi_size, cfg.rpn.strides[:4])
        cls, deltas = det2d.bbox_head_apply(sp, roi, mm)
        stage_probs.append(jax.nn.softmax(cls, -1))
        b, p = boxes.shape[:2]
        boxes = jax.vmap(
            lambda bx, d: det2d.delta2bbox(bx, d, (cfg.img_size, cfg.img_size))
        )(boxes, deltas)
    probs = sum(stage_probs) / len(stage_probs)
    scores = jnp.max(probs[..., :-1], -1)
    labels = jnp.argmax(probs[..., :-1], -1)
    out = {"boxes": boxes, "scores": scores, "labels": labels}
    if cfg.rcnn.with_mask:
        roi = det2d.roi_align(
            fpn_feats, boxes, cfg.rcnn.mask_size, cfg.rpn.strides[:4]
        )
        out["masks"] = det2d.mask_head_apply(params["rcnn"], roi, mm)
    return out


def forward_train(
    params: Dict[str, Any],
    images: jax.Array,
    gt_boxes: jax.Array,  # [B, G, 4] xyxy
    gt_labels: jax.Array,  # [B, G]
    gt_valid: jax.Array,  # [B, G]
    cfg: MaskRCNNConfig,
    gt_masks: jax.Array = None,  # [B, G, S, S] {0,1}, optional
    precision: enc.Precision = enc.FP32,
):
    """-> (total_loss, logs). RPN loss + per-stage RoI losses (+ mask BCE
    on positive RoIs at the last stage)."""
    mm = precision.mm
    fpn_feats, rpn_outs, anchors, proposals, _ = _forward_common(
        params, images, cfg, precision
    )
    total, logs = det2d.rpn_loss(rpn_outs, anchors, gt_boxes, gt_valid)

    boxes = jax.lax.stop_gradient(proposals)
    pos = best_gt = None
    for si, sp in enumerate(params["rcnn"]["stages"]):
        roi = det2d.roi_align(fpn_feats, boxes, cfg.rcnn.roi_size, cfg.rpn.strides[:4])
        cls, deltas = det2d.bbox_head_apply(sp, roi, mm)
        stage_loss, pos, best_gt = det2d.rcnn_stage_loss(
            cls, deltas, boxes, gt_boxes, gt_labels, gt_valid,
            cfg.rcnn.num_classes, cfg.rcnn.stage_ious[si],
        )
        total = total + stage_loss
        logs[f"stage{si}"] = stage_loss
        # refine proposals for the next stage (cascade training flow)
        boxes = jax.lax.stop_gradient(
            jax.vmap(
                lambda bx, d: det2d.delta2bbox(bx, d, (cfg.img_size, cfg.img_size))
            )(boxes, deltas)
        )

    if cfg.rcnn.with_mask and gt_masks is not None:
        roi = det2d.roi_align(
            fpn_feats, boxes, cfg.rcnn.mask_size, cfg.rpn.strides[:4]
        )
        mask_logits = det2d.mask_head_apply(params["rcnn"], roi, mm)
        m = 2 * cfg.rcnn.mask_size
        b, p = boxes.shape[:2]
        # per-roi gt mask crops via the same bilinear grid
        g = (jnp.arange(m) + 0.5) / m
        gy, gx = jnp.meshgrid(g, g, indexing="ij")
        w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 1e-4)
        h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 1e-4)
        px = (boxes[..., 0:1] + gx.reshape(-1)[None, None] * w[..., None]) / cfg.img_size
        py = (boxes[..., 1:2] + gy.reshape(-1)[None, None] * h[..., None]) / cfg.img_size
        gm = jnp.take_along_axis(
            gt_masks, best_gt[..., None, None], axis=1
        ).astype(jnp.float32)  # [B, P, S, S]
        from metatransformer_tpu.ops.ms_deform_attn import bilinear_sample

        crops = bilinear_sample(
            gm.reshape(b * p, cfg.img_size, cfg.img_size)[..., None],
            jnp.stack([px, py], -1).reshape(b * p, m * m, 2),
        ).reshape(b, p, m, m)
        lab = jax.vmap(lambda gl, bg: gl[bg])(gt_labels, best_gt)  # [B, P]
        ml = jnp.take_along_axis(
            mask_logits, lab[..., None, None, None], axis=-1
        )[..., 0]
        bce = det2d.optax_sigmoid_ce(ml, crops)
        posf = pos.astype(jnp.float32)[..., None, None]
        mask_loss = jnp.sum(bce * posf) / jnp.maximum(jnp.sum(posf) * m * m, 1.0)
        total = total + mask_loss
        logs["mask"] = mask_loss

    return total, logs

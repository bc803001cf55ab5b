"""HTC++ : Hybrid Task Cascade over the ViT-Adapter FPN (COCO track).

Reference: ``Image/detection/configs/htc++/*.py`` — mmdet's
HybridTaskCascade over the same ViT-Adapter backbone used by the repo's
Mask/Cascade R-CNN:
1. interleaved execution — every cascade stage runs bbox AND mask heads
   (not mask-at-the-end like cascade mask r-cnn);
2. mask information flow — stage i's mask features receive a 1x1-conv
   projection of stage i-1's mask features;
3. a fused semantic-segmentation branch whose stride-8 feature map is
   RoI-cropped and added into the box/mask RoI features, trained with an
   auxiliary per-pixel CE over the stuff+thing classes;
4. stage losses weighted (1, 0.5, 0.25) (mmdet stage_loss_weights).

TPU-native: identical static-shape proposal plumbing as
``models/mask_rcnn.py`` (fixed NMS'd RoI set, cascade refines the same P
boxes); the semantic branch is plain NHWC convs fused at stride 8.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.core import encoder as enc
from metatransformer_tpu.heads import detection2d as det2d
from metatransformer_tpu.models import mask_rcnn, vit_adapter
from metatransformer_tpu.models.vit_adapter import conv2d


@dataclasses.dataclass(frozen=True)
class HTCConfig:
    backbone: vit_adapter.ViTAdapterConfig = vit_adapter.ViTAdapterConfig()
    fpn: det2d.FPNConfig = det2d.FPNConfig()
    rpn: det2d.RPNConfig = det2d.RPNConfig()
    rcnn: det2d.RCNNConfig = det2d.RCNNConfig(
        num_stages=3, with_mask=True
    )
    img_size: int = 512
    semantic_classes: int = 183  # COCO-stuff (htc semantic branch)
    semantic_convs: int = 4
    stage_loss_weights: Tuple[float, ...] = (1.0, 0.5, 0.25)
    semantic_weight: float = 0.2


def _conv_init(key, cin, cout, k=3):
    return {
        "w": jax.random.normal(key, (k, k, cin, cout))
        * np.sqrt(2.0 / (k * k * cin)),
        "b": jnp.zeros((cout,)),
    }


def init(cfg: HTCConfig, key: jax.Array) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 64))
    params: Dict[str, Any] = {
        "backbone": vit_adapter.init(cfg.backbone, next(keys)),
        "fpn": det2d.fpn_init(cfg.fpn, next(keys)),
        "rpn": det2d.rpn_init(cfg.rpn, next(keys)),
        "rcnn": det2d.rcnn_init(
            dataclasses.replace(cfg.rcnn, with_mask=False), next(keys)
        ),
    }
    c = cfg.rcnn.channels
    # per-stage mask heads + info-flow 1x1 projections (htc_mask_head)
    mask_stages = []
    for si in range(cfg.rcnn.num_stages):
        stage = {
            "convs": [_conv_init(next(keys), c, c) for _ in range(4)],
            "out": _conv_init(next(keys), c, cfg.rcnn.num_classes, k=1),
        }
        if si > 0:
            stage["info"] = _conv_init(next(keys), c, c, k=1)
        mask_stages.append(stage)
    params["mask_stages"] = mask_stages
    # fused semantic branch: per-level 1x1 laterals + conv stack + logits
    params["sem_lateral"] = [
        _conv_init(next(keys), cfg.fpn.out_channels, c, k=1)
        for _ in range(cfg.fpn.num_outs)
    ]
    params["sem_convs"] = [
        _conv_init(next(keys), c, c) for _ in range(cfg.semantic_convs)
    ]
    params["sem_out"] = _conv_init(next(keys), c, cfg.semantic_classes, k=1)
    return params


def semantic_branch(params, fpn_feats, cfg: HTCConfig):
    """Fuse every FPN level at stride 8 -> (semantic feature [B, H/8,
    W/8, C], logits [B, H/8, W/8, S]) (mmdet FusedSemanticHead)."""
    target_hw = fpn_feats[1].shape[1:3]  # stride-8 level
    fused = None
    for lvl, (p, f) in enumerate(zip(params["sem_lateral"], fpn_feats)):
        x = conv2d(f, p["w"], p["b"])
        if x.shape[1:3] != target_hw:
            b, _, _, ch = x.shape
            x = jax.image.resize(x, (b, *target_hw, ch), "bilinear")
        fused = x if fused is None else fused + x
    for p in params["sem_convs"]:
        fused = jax.nn.relu(conv2d(fused, p["w"], p["b"]))
    logits = conv2d(fused, params["sem_out"]["w"], params["sem_out"]["b"])
    return fused, logits


def _sem_roi(sem_feat, boxes, out_size, img_size):
    """Single-level RoIAlign crop of the semantic feature (htc's
    semantic_roi_extractor: one level, stride 8)."""
    return det2d.roi_align([sem_feat], boxes, out_size, [img_size // sem_feat.shape[1]])


def _mask_stage_apply(stage, roi_feats, prev_feat, mm):
    """One HTC mask stage with info flow. -> (mask logits [B, P, 2o, 2o,
    C_cls], last conv feature for the next stage's flow)."""
    b, p, o, _, c = roi_feats.shape
    x = roi_feats.reshape(b * p, o, o, c)
    if prev_feat is not None and "info" in stage:
        x = x + conv2d(prev_feat, stage["info"]["w"], stage["info"]["b"])
    for cp in stage["convs"]:
        x = jax.nn.relu(conv2d(x, cp["w"], cp["b"]))
    feat = x
    up = jax.image.resize(x, (b * p, 2 * o, 2 * o, c), "bilinear")
    logits = conv2d(up, stage["out"]["w"], stage["out"]["b"])
    return logits.reshape(b, p, 2 * o, 2 * o, -1), feat


def _mask_loss(mask_logits, boxes, gt_masks, gt_labels, pos, best_gt, img_size):
    """BCE on positive RoIs vs bilinear gt crops (shared with
    mask_rcnn.forward_train's mask term)."""
    from metatransformer_tpu.ops.ms_deform_attn import bilinear_sample

    b, p, m, _, _ = mask_logits.shape
    g = (jnp.arange(m) + 0.5) / m
    gy, gx = jnp.meshgrid(g, g, indexing="ij")
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 1e-4)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 1e-4)
    px = (boxes[..., 0:1] + gx.reshape(-1)[None, None] * w[..., None]) / img_size
    py = (boxes[..., 1:2] + gy.reshape(-1)[None, None] * h[..., None]) / img_size
    gm = jnp.take_along_axis(
        gt_masks, best_gt[..., None, None], axis=1
    ).astype(jnp.float32)
    crops = bilinear_sample(
        gm.reshape(b * p, img_size, img_size)[..., None],
        jnp.stack([px, py], -1).reshape(b * p, m * m, 2),
    ).reshape(b, p, m, m)
    lab = jax.vmap(lambda gl, bg: gl[bg])(gt_labels, best_gt)
    ml = jnp.take_along_axis(
        mask_logits, lab[..., None, None, None], axis=-1
    )[..., 0]
    bce = det2d.optax_sigmoid_ce(ml, crops)
    posf = pos.astype(jnp.float32)[..., None, None]
    return jnp.sum(bce * posf) / jnp.maximum(jnp.sum(posf) * m * m, 1.0)


def forward_train(
    params: Dict[str, Any],
    images: jax.Array,
    gt_boxes: jax.Array,  # [B, G, 4] xyxy
    gt_labels: jax.Array,  # [B, G]
    gt_valid: jax.Array,  # [B, G]
    cfg: HTCConfig,
    gt_masks: jax.Array = None,  # [B, G, S, S]
    semantic_labels: jax.Array = None,  # [B, S, S] int (255 = ignore)
    precision: enc.Precision = enc.FP32,
):
    """-> (total loss, logs): rpn + per-stage interleaved bbox/mask losses
    (weighted) + the auxiliary semantic CE."""
    mm = precision.mm
    mcfg = mask_rcnn.MaskRCNNConfig(
        backbone=cfg.backbone, fpn=cfg.fpn, rpn=cfg.rpn, rcnn=cfg.rcnn,
        img_size=cfg.img_size,
    )
    fpn_feats, rpn_outs, anchors, proposals, _ = mask_rcnn._forward_common(
        params, images, mcfg, precision
    )
    total, logs = det2d.rpn_loss(rpn_outs, anchors, gt_boxes, gt_valid)

    sem_feat, sem_logits = semantic_branch(params, fpn_feats, cfg)
    if semantic_labels is not None:
        b, hs, ws, s = sem_logits.shape
        lab = jax.image.resize(
            semantic_labels.astype(jnp.float32)[..., None], (b, hs, ws, 1),
            "nearest",
        )[..., 0].astype(jnp.int32)
        valid = lab != 255
        safe = jnp.where(valid, lab, 0)
        import optax

        ce = optax.softmax_cross_entropy_with_integer_labels(sem_logits, safe)
        sem_loss = jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1)
        total = total + cfg.semantic_weight * sem_loss
        logs["semantic"] = sem_loss

    boxes = jax.lax.stop_gradient(proposals)
    prev_mask_feat = None
    for si, sp in enumerate(params["rcnn"]["stages"]):
        wgt = cfg.stage_loss_weights[si]
        roi = det2d.roi_align(
            fpn_feats, boxes, cfg.rcnn.roi_size, cfg.rpn.strides[:4]
        )
        roi = roi + _sem_roi(sem_feat, boxes, cfg.rcnn.roi_size, cfg.img_size)
        cls, deltas = det2d.bbox_head_apply(sp, roi, mm)
        stage_loss, pos, best_gt = det2d.rcnn_stage_loss(
            cls, deltas, boxes, gt_boxes, gt_labels, gt_valid,
            cfg.rcnn.num_classes, cfg.rcnn.stage_ious[si],
        )
        total = total + wgt * stage_loss
        logs[f"stage{si}_bbox"] = stage_loss

        # interleaved mask head at EVERY stage, with info flow
        if gt_masks is not None:
            mroi = det2d.roi_align(
                fpn_feats, boxes, cfg.rcnn.mask_size, cfg.rpn.strides[:4]
            )
            mroi = mroi + _sem_roi(
                sem_feat, boxes, cfg.rcnn.mask_size, cfg.img_size
            )
            mlogits, prev_mask_feat = _mask_stage_apply(
                params["mask_stages"][si], mroi, prev_mask_feat, mm
            )
            mloss = _mask_loss(
                mlogits, boxes, gt_masks, gt_labels, pos, best_gt,
                cfg.img_size,
            )
            total = total + wgt * mloss
            logs[f"stage{si}_mask"] = mloss

        boxes = jax.lax.stop_gradient(
            jax.vmap(
                lambda bx, d: det2d.delta2bbox(bx, d, (cfg.img_size, cfg.img_size))
            )(boxes, deltas)
        )

    return total, logs


@functools.partial(jax.jit, static_argnames=("cfg", "precision"))
def forward_test(
    params: Dict[str, Any],
    images: jax.Array,
    cfg: HTCConfig,
    precision: enc.Precision = enc.FP32,
):
    """Cascade-averaged class scores; masks from the last stage with the
    full info-flow chain (htc test behavior)."""
    mm = precision.mm
    mcfg = mask_rcnn.MaskRCNNConfig(
        backbone=cfg.backbone, fpn=cfg.fpn, rpn=cfg.rpn, rcnn=cfg.rcnn,
        img_size=cfg.img_size,
    )
    fpn_feats, _, _, proposals, _ = mask_rcnn._forward_common(
        params, images, mcfg, precision
    )
    sem_feat, sem_logits = semantic_branch(params, fpn_feats, cfg)
    boxes = proposals
    stage_probs = []
    for sp in params["rcnn"]["stages"]:
        roi = det2d.roi_align(
            fpn_feats, boxes, cfg.rcnn.roi_size, cfg.rpn.strides[:4]
        )
        roi = roi + _sem_roi(sem_feat, boxes, cfg.rcnn.roi_size, cfg.img_size)
        cls, deltas = det2d.bbox_head_apply(sp, roi, mm)
        stage_probs.append(jax.nn.softmax(cls, -1))
        boxes = jax.vmap(
            lambda bx, d: det2d.delta2bbox(bx, d, (cfg.img_size, cfg.img_size))
        )(boxes, deltas)
    probs = sum(stage_probs) / len(stage_probs)
    out = {
        "boxes": boxes,
        "scores": jnp.max(probs[..., :-1], -1),
        "labels": jnp.argmax(probs[..., :-1], -1),
        "semantic": sem_logits,
    }
    prev = None
    for si in range(cfg.rcnn.num_stages):
        mroi = det2d.roi_align(
            fpn_feats, boxes, cfg.rcnn.mask_size, cfg.rpn.strides[:4]
        )
        mroi = mroi + _sem_roi(sem_feat, boxes, cfg.rcnn.mask_size, cfg.img_size)
        mlogits, prev = _mask_stage_apply(
            params["mask_stages"][si], mroi, prev, mm
        )
    out["masks"] = mlogits
    return out

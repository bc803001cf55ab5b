"""Two-stage 2D detection (COCO track): FPN + RPN + RoIAlign + R-CNN heads.

Reference: the mmdet components the COCO configs compose over the
ViT-Adapter backbone (``Image/detection/configs/mask_rcnn/
mask_rcnn_meta_transformer_adapter_base_fpn_3x_coco.py`` -> FPN neck,
``configs/_base_/models/mask_rcnn_r50_fpn.py`` -> RPNHead +
Shared2FCBBoxHead + FCNMaskHead, ``cascade_rcnn/`` -> 3-stage cascade
with IoU thresholds 0.5/0.6/0.7).

TPU-native: everything static-shape. Proposals are a fixed-size top-k
set (padded, score-masked); RoIAlign is a batched bilinear gather over
the FPN level selected per box (all levels sampled, one select — XLA
turns the un-taken levels' gathers into cheap parallel work instead of
data-dependent control flow); losses weight all proposals instead of
resampling a dynamic subset.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.models.vit_adapter import conv2d, group_norm
from metatransformer_tpu.ops.ms_deform_attn import bilinear_sample

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# FPN (mmdet FPN: lateral 1x1 + top-down sum + 3x3 out convs + extra pool)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class FPNConfig:
    in_channels: Tuple[int, ...] = (768, 768, 768, 768)
    out_channels: int = 256
    num_outs: int = 5


def fpn_init(cfg: FPNConfig, key: jax.Array) -> Params:
    keys = iter(jax.random.split(key, 2 * len(cfg.in_channels)))
    p: Params = {}
    for i, cin in enumerate(cfg.in_channels):
        p[f"lateral{i}"] = {
            "w": jax.random.normal(next(keys), (1, 1, cin, cfg.out_channels))
            * cin**-0.5,
            "b": jnp.zeros((cfg.out_channels,)),
        }
        p[f"out{i}"] = {
            "w": jax.random.normal(
                next(keys), (3, 3, cfg.out_channels, cfg.out_channels)
            ) * (9 * cfg.out_channels) ** -0.5,
            "b": jnp.zeros((cfg.out_channels,)),
        }
    return p


def fpn_apply(params: Params, feats: Sequence[jax.Array], cfg: FPNConfig):
    """c1..c4 (high->low res, NHWC) -> num_outs maps (strides 4..64)."""
    lats = [
        conv2d(f, params[f"lateral{i}"]["w"], params[f"lateral{i}"]["b"])
        for i, f in enumerate(feats)
    ]
    for i in range(len(lats) - 2, -1, -1):
        up = jax.image.resize(
            lats[i + 1],
            (lats[i].shape[0], lats[i].shape[1], lats[i].shape[2], lats[i].shape[3]),
            "nearest",
        )
        lats[i] = lats[i] + up
    outs = [
        conv2d(l, params[f"out{i}"]["w"], params[f"out{i}"]["b"])
        for i, l in enumerate(lats)
    ]
    while len(outs) < cfg.num_outs:  # extra levels: stride-2 maxpool
        x = outs[-1]
        outs.append(
            jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, 1, 1), (1, 2, 2, 1), "SAME"
            )
        )
    return outs


# ---------------------------------------------------------------------------
# boxes: XYXY <-> delta coding (mmdet DeltaXYWHBBoxCoder)
# ---------------------------------------------------------------------------

def delta2bbox(rois: jax.Array, deltas: jax.Array, max_hw=None) -> jax.Array:
    """rois [N, 4] xyxy + deltas [N, 4] (dx, dy, dw, dh) -> xyxy."""
    w = rois[:, 2] - rois[:, 0]
    h = rois[:, 3] - rois[:, 1]
    cx = rois[:, 0] + 0.5 * w
    cy = rois[:, 1] + 0.5 * h
    dw = jnp.clip(deltas[:, 2], -4.0, 4.0)
    dh = jnp.clip(deltas[:, 3], -4.0, 4.0)
    ncx = cx + deltas[:, 0] * w
    ncy = cy + deltas[:, 1] * h
    nw = w * jnp.exp(dw)
    nh = h * jnp.exp(dh)
    out = jnp.stack(
        [ncx - nw / 2, ncy - nh / 2, ncx + nw / 2, ncy + nh / 2], -1
    )
    if max_hw is not None:
        out = jnp.clip(
            out,
            0.0,
            jnp.asarray([max_hw[1], max_hw[0], max_hw[1], max_hw[0]], out.dtype),
        )
    return out


def bbox2delta(rois: jax.Array, gt: jax.Array) -> jax.Array:
    w = jnp.maximum(rois[:, 2] - rois[:, 0], 1e-4)
    h = jnp.maximum(rois[:, 3] - rois[:, 1], 1e-4)
    cx = rois[:, 0] + 0.5 * w
    cy = rois[:, 1] + 0.5 * h
    gw = jnp.maximum(gt[:, 2] - gt[:, 0], 1e-4)
    gh = jnp.maximum(gt[:, 3] - gt[:, 1], 1e-4)
    gcx = gt[:, 0] + 0.5 * gw
    gcy = gt[:, 1] + 0.5 * gh
    return jnp.stack(
        [(gcx - cx) / w, (gcy - cy) / h, jnp.log(gw / w), jnp.log(gh / h)], -1
    )


def bbox_iou_xyxy(a: jax.Array, b: jax.Array) -> jax.Array:
    """[N, 4] x [M, 4] -> IoU [N, M]."""
    area_a = jnp.maximum(a[:, 2] - a[:, 0], 0) * jnp.maximum(a[:, 3] - a[:, 1], 0)
    area_b = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / jnp.maximum(area_a[:, None] + area_b[None] - inter, 1e-6)


def nms_xyxy(boxes: jax.Array, scores: jax.Array, iou_thr: float, max_out: int):
    """Greedy axis-aligned NMS, static output size -> (idx, valid)."""
    n = boxes.shape[0]
    iou = bbox_iou_xyxy(boxes, boxes)

    def body(i, state):
        alive, idx, valid = state
        s = jnp.where(alive, scores, -jnp.inf)
        j = jnp.argmax(s)
        ok = s[j] > -jnp.inf
        idx = idx.at[i].set(jnp.where(ok, j, 0))
        valid = valid.at[i].set(ok)
        alive = alive & (iou[j] <= iou_thr) & ok
        return alive, idx, valid

    init = (
        jnp.ones((n,), bool),
        jnp.zeros((max_out,), jnp.int32),
        jnp.zeros((max_out,), bool),
    )
    _, idx, valid = jax.lax.fori_loop(0, max_out, body, init)
    return idx, valid


# ---------------------------------------------------------------------------
# RPN (mmdet RPNHead: shared 3x3 conv + objectness/delta per anchor)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class RPNConfig:
    channels: int = 256
    anchor_scales: Tuple[float, ...] = (8.0,)
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    nms_pre: int = 512  # per level, static top-k
    max_proposals: int = 256
    nms_thr: float = 0.7

    @property
    def num_anchors(self) -> int:
        return len(self.anchor_scales) * len(self.anchor_ratios)


def rpn_init(cfg: RPNConfig, key: jax.Array) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    c, a = cfg.channels, cfg.num_anchors
    return {
        "conv": {"w": jax.random.normal(k1, (3, 3, c, c)) * (9 * c) ** -0.5,
                 "b": jnp.zeros((c,))},
        "cls": {"w": jax.random.normal(k2, (1, 1, c, a)) * 1e-2,
                "b": jnp.zeros((a,))},
        "reg": {"w": jax.random.normal(k3, (1, 1, c, 4 * a)) * 1e-3,
                "b": jnp.zeros((4 * a,))},
    }


def level_anchors(hw: Tuple[int, int], stride: int, cfg: RPNConfig) -> np.ndarray:
    """Anchor grid for one level -> [H*W*A, 4] xyxy."""
    h, w = hw
    base = stride * np.asarray(cfg.anchor_scales)  # base sizes
    out = []
    ys = (np.arange(h) + 0.5) * stride
    xs = (np.arange(w) + 0.5) * stride
    for y in ys:
        for x in xs:
            for s in base:
                for r in cfg.anchor_ratios:
                    aw = s * np.sqrt(1.0 / r)
                    ah = s * np.sqrt(r)
                    out.append([x - aw / 2, y - ah / 2, x + aw / 2, y + ah / 2])
    return np.asarray(out, np.float32)


def rpn_apply(params: Params, fpn_feats: Sequence[jax.Array], cfg: RPNConfig):
    """-> per level (objectness [B, HWA], deltas [B, HWA, 4])."""
    outs = []
    for f in fpn_feats:
        b = f.shape[0]
        x = jax.nn.relu(conv2d(f, params["conv"]["w"], params["conv"]["b"]))
        cls = conv2d(x, params["cls"]["w"], params["cls"]["b"]).reshape(b, -1)
        reg = conv2d(x, params["reg"]["w"], params["reg"]["b"]).reshape(b, -1, 4)
        outs.append((cls, reg))
    return outs


def rpn_proposals(
    rpn_outs, anchors_per_level: Sequence[jax.Array], cfg: RPNConfig,
    img_hw: Tuple[int, int],
):
    """Top-k per level -> decode -> joint NMS -> fixed-size proposal set.
    -> (proposals [B, P, 4], scores [B, P])."""
    b = rpn_outs[0][0].shape[0]
    all_boxes, all_scores = [], []
    for (cls, reg), anchors in zip(rpn_outs, anchors_per_level):
        k = min(cfg.nms_pre, cls.shape[1])
        top, idx = jax.lax.top_k(cls, k)  # [B, k]
        boxes = jax.vmap(
            lambda d, i: delta2bbox(anchors[i], d[i], max_hw=img_hw)
        )(reg, idx)
        all_boxes.append(boxes)
        all_scores.append(jax.nn.sigmoid(top))
    boxes = jnp.concatenate(all_boxes, 1)  # [B, sum_k, 4]
    scores = jnp.concatenate(all_scores, 1)

    def per_image(bx, sc):
        idx, valid = nms_xyxy(bx, sc, cfg.nms_thr, cfg.max_proposals)
        return bx[idx], sc[idx] * valid

    return jax.vmap(per_image)(boxes, scores)


# ---------------------------------------------------------------------------
# RoIAlign (mmdet SingleRoIExtractor: level by box scale, bilinear bins)
# ---------------------------------------------------------------------------

def roi_align(
    fpn_feats: Sequence[jax.Array],  # levels at strides[ :num_levels]
    rois: jax.Array,  # [B, P, 4] xyxy in image coords
    out_size: int = 7,
    strides: Tuple[int, ...] = (4, 8, 16, 32),
    finest_scale: float = 56.0,
) -> jax.Array:
    """-> [B, P, out, out, C]. Level assignment per mmdet:
    lvl = clamp(floor(log2(sqrt(area)/finest_scale + 1e-6)), 0, L-1).
    Every level is sampled (static shapes); the result selects per box."""
    b, p, _ = rois.shape
    w = jnp.maximum(rois[..., 2] - rois[..., 0], 1e-4)
    h = jnp.maximum(rois[..., 3] - rois[..., 1], 1e-4)
    scale = jnp.sqrt(w * h)
    lvl = jnp.clip(
        jnp.floor(jnp.log2(scale / finest_scale + 1e-6)),
        0, len(strides) - 1,
    ).astype(jnp.int32)  # [B, P]

    # bin-center sample grid in [0, 1] of each roi
    g = (jnp.arange(out_size) + 0.5) / out_size
    gy, gx = jnp.meshgrid(g, g, indexing="ij")  # [o, o]
    px = rois[..., 0:1] + gx.reshape(-1)[None, None] * w[..., None]  # [B,P,o*o]
    py = rois[..., 1:2] + gy.reshape(-1)[None, None] * h[..., None]

    sampled = []
    for li, f in enumerate(fpn_feats[: len(strides)]):
        fh, fw = f.shape[1], f.shape[2]
        coords = jnp.stack(
            [px / (fw * strides[li]), py / (fh * strides[li])], -1
        )  # normalized [B, P, o*o, 2]
        vals = bilinear_sample(f, coords.reshape(b, -1, 2))
        sampled.append(vals.reshape(b, p, out_size * out_size, -1))
    stacked = jnp.stack(sampled, 0)  # [L, B, P, o*o, C]
    sel = jnp.take_along_axis(
        stacked, lvl[None, :, :, None, None].astype(jnp.int32), axis=0
    )[0]
    return sel.reshape(b, p, out_size, out_size, -1)


# ---------------------------------------------------------------------------
# R-CNN heads (Shared2FCBBoxHead / FCNMaskHead; cascade = staged box heads)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class RCNNConfig:
    num_classes: int = 80
    channels: int = 256
    roi_size: int = 7
    fc_dim: int = 1024
    num_stages: int = 1  # 3 for cascade
    stage_ious: Tuple[float, ...] = (0.5, 0.6, 0.7)
    mask_size: int = 14  # mask roi 14 -> deconv -> 28
    with_mask: bool = True
    # "2fc" = Shared2FCBBoxHead; "4conv1fc" = Shared4Conv1FCBBoxHead (the
    # upgraded_mask_rcnn configs' head: 4 conv3x3 on the RoI map + 1 FC)
    bbox_head: str = "2fc"


def _fc_init(key, cin, cout):
    return {"w": jax.random.normal(key, (cin, cout)) * cin**-0.5,
            "b": jnp.zeros((cout,))}


def rcnn_init(cfg: RCNNConfig, key: jax.Array) -> Params:
    keys = iter(jax.random.split(key, 4 * cfg.num_stages + 8))
    flat = cfg.channels * cfg.roi_size * cfg.roi_size
    p: Params = {"stages": []}
    for _ in range(cfg.num_stages):
        # mmdet bbox-head init: cls std 0.01, reg std 0.001 — near-zero
        # deltas at init keep cascade stages' refined boxes on top of the
        # proposals (large random deltas degenerate stage>0 boxes and
        # silently zero the later-stage losses)
        if cfg.bbox_head == "4conv1fc":
            stage = {
                "convs": [
                    {
                        "w": jax.random.normal(
                            next(keys), (3, 3, cfg.channels, cfg.channels)
                        ) * (9 * cfg.channels) ** -0.5,
                        "b": jnp.zeros((cfg.channels,)),
                    }
                    for _ in range(4)
                ],
                "fc1": _fc_init(next(keys), flat, cfg.fc_dim),
            }
        else:
            stage = {
                "fc1": _fc_init(next(keys), flat, cfg.fc_dim),
                "fc2": _fc_init(next(keys), cfg.fc_dim, cfg.fc_dim),
            }
        p["stages"].append(stage)
        p["stages"][-1].update({
            "cls": {
                "w": jax.random.normal(
                    next(keys), (cfg.fc_dim, cfg.num_classes + 1)
                ) * 0.01,
                "b": jnp.zeros((cfg.num_classes + 1,)),
            },
            "reg": {  # class-agnostic
                "w": jax.random.normal(next(keys), (cfg.fc_dim, 4)) * 0.001,
                "b": jnp.zeros((4,)),
            },
        })
    if cfg.with_mask:
        convs = []
        for _ in range(4):
            convs.append({
                "w": jax.random.normal(
                    next(keys), (3, 3, cfg.channels, cfg.channels)
                ) * (9 * cfg.channels) ** -0.5,
                "b": jnp.zeros((cfg.channels,)),
            })
        p["mask_convs"] = convs
        p["mask_out"] = {
            "w": jax.random.normal(
                next(keys), (1, 1, cfg.channels, cfg.num_classes)
            ) * cfg.channels**-0.5,
            "b": jnp.zeros((cfg.num_classes,)),
        }
    return p


def bbox_head_apply(stage_params: Params, roi_feats: jax.Array, mm):
    """[B, P, o, o, C] -> (cls_logits [B, P, C+1], deltas [B, P, 4])."""
    b, p = roi_feats.shape[:2]
    if "convs" in stage_params:  # Shared4Conv1FCBBoxHead
        o, _, c = roi_feats.shape[2:]
        x = roi_feats.reshape(b * p, o, o, c)
        for cp in stage_params["convs"]:
            x = jax.nn.relu(conv2d(x, cp["w"], cp["b"]))
        x = x.reshape(b, p, -1)
        x = jax.nn.relu(
            jnp.dot(x, stage_params["fc1"]["w"], precision=mm)
            + stage_params["fc1"]["b"]
        )
        cls = jnp.dot(x, stage_params["cls"]["w"], precision=mm) + stage_params["cls"]["b"]
        reg = jnp.dot(x, stage_params["reg"]["w"], precision=mm) + stage_params["reg"]["b"]
        return cls, reg
    x = roi_feats.reshape(b, p, -1)
    x = jax.nn.relu(jnp.dot(x, stage_params["fc1"]["w"], precision=mm) + stage_params["fc1"]["b"])
    x = jax.nn.relu(jnp.dot(x, stage_params["fc2"]["w"], precision=mm) + stage_params["fc2"]["b"])
    cls = jnp.dot(x, stage_params["cls"]["w"], precision=mm) + stage_params["cls"]["b"]
    reg = jnp.dot(x, stage_params["reg"]["w"], precision=mm) + stage_params["reg"]["b"]
    return cls, reg


def mask_head_apply(params: Params, roi_feats: jax.Array, mm):
    """[B, P, o, o, C] -> mask logits [B, P, 2o, 2o, num_classes]."""
    b, p, o, _, c = roi_feats.shape
    x = roi_feats.reshape(b * p, o, o, c)
    for cp in params["mask_convs"]:
        x = jax.nn.relu(conv2d(x, cp["w"], cp["b"]))
    x = jax.image.resize(x, (b * p, 2 * o, 2 * o, c), "bilinear")  # deconv 2x
    x = conv2d(x, params["mask_out"]["w"], params["mask_out"]["b"])
    return x.reshape(b, p, 2 * o, 2 * o, -1)


# ---------------------------------------------------------------------------
# training losses
# ---------------------------------------------------------------------------

def rpn_loss(
    rpn_outs, anchors_per_level, gt_boxes, gt_valid,
    pos_thr: float = 0.7, neg_thr: float = 0.3,
):
    """Binary objectness focal-free CE + smooth-L1 on positives
    (mmdet RPN assign: IoU > .7 pos, < .3 neg, best-per-gt forced)."""
    cls_all = jnp.concatenate([c for c, _ in rpn_outs], 1)  # [B, A]
    reg_all = jnp.concatenate([r for _, r in rpn_outs], 1)  # [B, A, 4]
    anchors = jnp.concatenate(list(anchors_per_level), 0)  # [A, 4]

    def per_image(cls, reg, gt, gv):
        iou = bbox_iou_xyxy(anchors, gt) * gv[None, :]
        best = jnp.max(iou, 1)
        best_gt = jnp.argmax(iou, 1)
        labels = jnp.where(best >= pos_thr, 1, jnp.where(best < neg_thr, 0, -1))
        best_anchor = jnp.argmax(iou, 0)
        labels = labels.at[best_anchor].set(jnp.where(gv, 1, labels[best_anchor]))
        best_gt = best_gt.at[best_anchor].set(
            jnp.where(gv, jnp.arange(gt.shape[0]), best_gt[best_anchor])
        )
        pos = labels == 1
        valid = labels >= 0
        ce = optax_sigmoid_ce(cls, pos.astype(jnp.float32))
        cls_loss = jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1.0)
        target = bbox2delta(anchors, gt[best_gt])
        l1 = jnp.sum(jnp.abs(reg - target), -1)
        reg_loss = jnp.sum(l1 * pos) / jnp.maximum(jnp.sum(pos), 1.0)
        return cls_loss, reg_loss

    cl, rl = jax.vmap(per_image)(cls_all, reg_all, gt_boxes, gt_valid)
    return cl.mean() + rl.mean(), {"rpn_cls": cl.mean(), "rpn_reg": rl.mean()}


def optax_sigmoid_ce(logits, targets):
    return (
        jnp.maximum(logits, 0) - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def rcnn_stage_loss(
    cls_logits, deltas, proposals, gt_boxes, gt_labels, gt_valid,
    num_classes: int, pos_iou: float = 0.5,
):
    """Per-stage RoI loss: CE over C+1 (background = C) + smooth-L1 on
    positives. All proposals weighted (static-shape stand-in for mmdet's
    512-RoI sampler)."""

    def per_image(cls, dl, props, gt, gl, gv):
        iou = bbox_iou_xyxy(props, gt) * gv[None, :]
        best = jnp.max(iou, 1)
        best_gt = jnp.argmax(iou, 1)
        pos = best >= pos_iou
        labels = jnp.where(pos, gl[best_gt], num_classes)  # bg = C
        logp = jax.nn.log_softmax(cls, -1)
        ce = -jnp.take_along_axis(logp, labels[:, None], -1)[:, 0]
        cls_loss = ce.mean()
        target = bbox2delta(props, gt[best_gt])
        l1 = jnp.sum(jnp.abs(dl - target), -1)
        reg_loss = jnp.sum(l1 * pos) / jnp.maximum(jnp.sum(pos), 1.0)
        return cls_loss, reg_loss, pos, best_gt

    cl, rl, pos, best_gt = jax.vmap(per_image)(
        cls_logits, deltas, proposals, gt_boxes, gt_labels, gt_valid
    )
    return cl.mean() + rl.mean(), pos, best_gt

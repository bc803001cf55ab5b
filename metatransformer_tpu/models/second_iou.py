"""SECOND-IoU: SECOND + a rotated-RoI IoU confidence head.

Reference: ``AutonomousDriving/pcdet/models/detectors/second_net_iou.py``
+ ``roi_heads/second_head.py`` — the workhorse detector of the repo's
semi-/self-supervised pipelines: stage 1 is SECOND; stage 2 samples a
rotated GRID_SIZE^2 window of the BEV feature map per RoI
(affine_grid + grid_sample, second_head.py:53-109), runs a shared FC,
and predicts the box's IoU with its ground truth (BCE on soft IoU
labels). At inference the IoU prediction replaces/blends the class
score (``cal_scores_by_npoints``).

TPU-native: the rotated RoI window is sampled by direct bilinear
interpolation of per-RoI rotated grid points (no affine-grid op);
proposal/target machinery is shared with ``models/voxel_rcnn.py``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.models import second, voxel_rcnn as vr
from metatransformer_tpu.ops import iou3d


@dataclasses.dataclass(frozen=True)
class SECONDIoUConfig:
    stage1: second.SECONDConfig = second.SECONDConfig(
        bev_channels=(64, 128), up_channels=128
    )
    num_rois: int = 128
    fg_per: int = 64
    grid_size: int = 7  # ROI_GRID_POOL.GRID_SIZE
    shared_fc: Tuple[int, ...] = (256, 256)
    iou_fc: Tuple[int, ...] = (256, 256)
    reg_fg_thresh: float = 0.55
    cls_fg_thresh: float = 0.75
    cls_bg_thresh: float = 0.25
    cls_bg_thresh_lo: float = 0.1
    proposal_nms_thresh: float = 0.8
    proposal_pre: int = 1024

    @property
    def bev_channels_out(self) -> int:
        return self.stage1.up_channels * len(self.stage1.bev_channels)


def init(cfg: SECONDIoUConfig, key: jax.Array) -> Dict[str, Any]:
    k1, k2 = jax.random.split(key)
    params: Dict[str, Any] = {"stage1": second.init(cfg.stage1, k1)}
    keys = iter(jax.random.split(k2, 16))
    cin = cfg.bev_channels_out * cfg.grid_size**2
    for i, c in enumerate(cfg.shared_fc):
        params[f"shared{i}"] = vr._lin_init(next(keys), cin, c)
        cin = c
    for i, c in enumerate(cfg.iou_fc):
        params[f"iou{i}"] = vr._lin_init(next(keys), cin, c)
        cin = c
    params["iou_pred"] = vr._lin_init(next(keys), cin, 1, std=0.01)
    return params


def rotated_roi_grid_sample(
    feat: jax.Array,  # [B, H, W, C] BEV features (H=y, W=x)
    rois: jax.Array,  # [B, R, 7]
    cfg: SECONDIoUConfig,
) -> jax.Array:
    """Per-RoI rotated G x G window, bilinearly sampled -> [B, R, G*G, C]
    (the affine_grid + grid_sample path of second_head.roi_grid_pool)."""
    s1 = cfg.stage1
    g = cfg.grid_size
    # in-box grid spanning the box footprint, rotated by the heading
    lin = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g - 0.5
    gx, gy = jnp.meshgrid(lin, lin, indexing="ij")
    local = jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1)  # [G*G, 2]
    dims = rois[..., None, 3:5]  # [B, R, 1, 2]
    pts = local[None, None] * dims  # [B, R, G*G, 2]
    c, s = jnp.cos(rois[..., 6])[..., None], jnp.sin(rois[..., 6])[..., None]
    wx = pts[..., 0] * c - pts[..., 1] * s + rois[..., None, 0]
    wy = pts[..., 0] * s + pts[..., 1] * c + rois[..., None, 1]
    stride = s1.spatial_shape[2] // feat.shape[2]
    fx = (wx - s1.pc_range[0]) / s1.voxel_size[0] / stride - 0.5
    fy = (wy - s1.pc_range[1]) / s1.voxel_size[1] / stride - 0.5
    h, w = feat.shape[1:3]
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    gather = jax.vmap(lambda f, yy, xx: f[yy, xx])
    ia = gather(feat, y0, x0)
    ib = gather(feat, y1, x0)
    ic = gather(feat, y0, x1)
    idd = gather(feat, y1, x1)
    wa = (x1 - fx) * (y1 - fy)
    wb = (x1 - fx) * (fy - y0)
    wc = (fx - x0) * (y1 - fy)
    wd = (fx - x0) * (fy - y0)
    return (
        ia * wa[..., None] + ib * wb[..., None]
        + ic * wc[..., None] + idd * wd[..., None]
    )


def iou_head(params, pooled, cfg: SECONDIoUConfig) -> jax.Array:
    """pooled [B, R, G*G, C] -> IoU logits [B, R]."""
    b, r = pooled.shape[:2]
    x = pooled.reshape(b * r, -1)
    x = vr._mlp(x, params, [f"shared{i}" for i in range(len(cfg.shared_fc))])
    x = vr._mlp(x, params, [f"iou{i}" for i in range(len(cfg.iou_fc))])
    out = x @ params["iou_pred"]["w"] + params["iou_pred"]["b"]
    return out[:, 0].reshape(b, r)


@functools.lru_cache(maxsize=8)
def _as_vr_cached(stage1, nms, pre, rois, fg):
    return vr.VoxelRCNNConfig(
        stage1=stage1, proposal_nms_thresh=nms, proposal_pre=pre,
        num_rois=rois, fg_per=fg,
    )


def _as_vr(cfg: SECONDIoUConfig) -> vr.VoxelRCNNConfig:
    return _as_vr_cached(
        cfg.stage1, cfg.proposal_nms_thresh, cfg.proposal_pre,
        cfg.num_rois, cfg.fg_per,
    )


def training_loss(
    params: Dict[str, Any],
    points: jax.Array,
    gt_boxes: jax.Array,
    gt_valid: jax.Array,
    anchors: jax.Array,
    cfg: SECONDIoUConfig,
    points_mask: jax.Array = None,
):
    """loss_rpn + IoU BCE on soft labels (second_net_iou
    get_training_loss + second_head.get_box_iou_layer_loss)."""
    vcfg = _as_vr(cfg)
    preds, ms, bev = vr.forward_stage1(params, points, vcfg, points_mask)
    rpn_loss, rpn_logs = second.detection_loss(
        preds, anchors, gt_boxes, gt_valid, cfg.stage1
    )
    rois, _, roi_valid = vr.propose(
        jax.tree_util.tree_map(jax.lax.stop_gradient, preds), anchors, vcfg
    )
    targets = jax.vmap(
        lambda r, rv, g, gv: vr.sample_rois_for_rcnn(r, rv, g, gv, vcfg)
    )(rois, roi_valid, gt_boxes, gt_valid)
    pooled = rotated_roi_grid_sample(
        jax.lax.stop_gradient(bev), targets["rois"], cfg
    )
    iou_logits = iou_head(params, pooled, cfg)
    p = jnp.clip(jax.nn.sigmoid(iou_logits), 1e-7, 1 - 1e-7)
    t = targets["cls_labels"]  # soft IoU labels
    iou_loss = jnp.mean(-(t * jnp.log(p) + (1 - t) * jnp.log(1 - p)))
    total = rpn_loss + iou_loss
    return total, {
        **{f"rpn_{k}": v for k, v in rpn_logs.items()}, "iou": iou_loss,
    }


def predict(
    params: Dict[str, Any],
    points: jax.Array,
    anchors: jax.Array,
    cfg: SECONDIoUConfig,
    score_thr: float = 0.1,
    iou_thr: float = 0.1,
    max_out: int = 128,
    points_mask: jax.Array = None,
) -> List[Dict[str, np.ndarray]]:
    """Proposals scored by the IoU head, then final NMS. Boxes are the
    stage-1 proposals (the head refines confidence, not geometry)."""
    vcfg = _as_vr(cfg)
    preds, ms, bev = vr.forward_stage1(params, points, vcfg, points_mask)
    rois, roi_scores, roi_valid = vr.propose(preds, anchors, vcfg)
    pooled = rotated_roi_grid_sample(bev, rois, cfg)
    iou_logits = iou_head(params, pooled, cfg)
    out = []
    for i in range(rois.shape[0]):
        scores = jax.nn.sigmoid(iou_logits[i]) * roi_valid[i]
        scores = jnp.where(scores >= score_thr, scores, 0.0)
        sel, valid = iou3d.nms_bev(
            rois[i], scores, iou_thr, min(max_out, rois.shape[1])
        )
        valid = valid & (scores[sel] > 0)
        out.append(
            {
                "boxes": np.asarray(rois[i][sel]),
                "scores": np.asarray(scores[sel]),
                "valid": np.asarray(valid),
            }
        )
    return out

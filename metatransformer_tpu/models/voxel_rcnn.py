"""Voxel-RCNN: two-stage sparse-voxel 3D detector (SECOND + RoI refine).

Reference: ``AutonomousDriving/pcdet/models/detectors/voxel_rcnn.py`` —
stage 1 is exactly the SECOND pipeline (MeanVFE -> VoxelBackBone8x ->
HeightCompression -> BaseBEVBackbone -> AnchorHeadSingle); stage 2 is
``roi_heads/voxelrcnn_head.py`` (VoxelRCNNHead): proposals from the
anchor head, voxel RoI grid pooling over the backbone's multi-scale
sparse features (x_conv2/3/4), shared-FC trunk, class-agnostic cls/reg
refinement. Target machinery from ``roi_heads/roi_head_template.py`` +
``target_assigner/proposal_target_layer.py``; recipe values from
``tools/cfgs/kitti_models/voxel_rcnn_car.yaml``.

TPU-native deltas (all static-shape / jit-safe):
 - RoI grid pooling replaces the stack-mode CUDA ball query
   (``NeighborVoxelSAModuleMSG``) with a deterministic *offset template*:
   the in-ball integer voxel offsets sorted by distance are strided down
   to ``nsample`` entries, looked up in the sparse voxel hash
   (``ops/sparse_conv.lookup``), relative-position-encoded and
   max-pooled with a ``lax.scan`` over the template (peak memory is one
   [B*R*G^3, C+3] slab instead of K of them). PRE_MLP=True semantics:
   the per-scale MLP runs on the sparse features before grouping.
 - Proposal subsampling (ProposalTargetLayer.subsample_rois) is
   rank-based instead of randomized: top-``fg_per`` foregrounds by IoU,
   then hard backgrounds (IoU in [lo, fg)) before easy ones — the
   HARD_BG_RATIO=0.8 preference expressed as a strict priority.
 - CLS_SCORE_TYPE=roi_iou soft labels are the closed form
   clamp((iou - bg) / (fg - bg), 0, 1).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.models import detector3d, second
from metatransformer_tpu.models.detector3d import decode_boxes, encode_boxes
from metatransformer_tpu.ops import iou3d
from metatransformer_tpu.ops import sparse_conv as sp


@dataclasses.dataclass(frozen=True)
class PoolLayerConfig:
    stride: int
    radius: float  # meters (POOL_RADIUS)
    nsample: int = 16
    mlp: int = 32


@dataclasses.dataclass(frozen=True)
class VoxelRCNNConfig:
    stage1: second.SECONDConfig = second.SECONDConfig(
        bev_channels=(64, 128), up_channels=128
    )
    num_rois: int = 128  # ROI_PER_IMAGE (train) / NMS_POST test cap
    fg_per: int = 64  # ROI_PER_IMAGE * FG_RATIO
    grid_size: int = 6
    # (source name, PoolLayerConfig) in FEATURES_SOURCE order
    pool_layers: Tuple[Tuple[str, PoolLayerConfig], ...] = (
        ("x_conv2", PoolLayerConfig(2, 0.4)),
        ("x_conv3", PoolLayerConfig(4, 0.8)),
        ("x_conv4", PoolLayerConfig(8, 1.6)),
    )
    shared_fc: Tuple[int, ...] = (256, 256)
    cls_fc: Tuple[int, ...] = (256, 256)
    reg_fc: Tuple[int, ...] = (256, 256)
    # TARGET_CONFIG
    reg_fg_thresh: float = 0.55
    cls_fg_thresh: float = 0.75
    cls_bg_thresh: float = 0.25
    cls_bg_thresh_lo: float = 0.1
    # LOSS_CONFIG
    rcnn_cls_weight: float = 1.0
    rcnn_reg_weight: float = 1.0
    rcnn_corner_weight: float = 1.0
    # proposal NMS
    proposal_nms_thresh: float = 0.8
    proposal_pre: int = 1024

    @property
    def pooled_channels(self) -> int:
        return sum(p.mlp for _, p in self.pool_layers)

    # channel of each backbone stage output (VoxelBackBone8x widths)
    def source_channels(self, src: str) -> int:
        w = self.stage1.widths
        return {"x_conv2": w[2], "x_conv3": w[3], "x_conv4": w[4]}[src]


def _lin_init(key, cin, cout, std=None):
    scale = std if std is not None else np.sqrt(2.0 / cin)
    return {
        "w": jax.random.normal(key, (cin, cout)) * scale,
        "b": jnp.zeros((cout,)),
    }


def init(cfg: VoxelRCNNConfig, key: jax.Array) -> Dict[str, Any]:
    k1, k2 = jax.random.split(key)
    params: Dict[str, Any] = {"stage1": second.init(cfg.stage1, k1)}
    keys = iter(jax.random.split(k2, 32))
    for src, pl in cfg.pool_layers:
        params[f"pre_{src}"] = _lin_init(
            next(keys), cfg.source_channels(src), pl.mlp
        )
        # post-grouping MLP over (feature, rel_xyz)
        params[f"agg_{src}"] = _lin_init(next(keys), pl.mlp + 3, pl.mlp)
    cin = cfg.grid_size**3 * cfg.pooled_channels
    for i, c in enumerate(cfg.shared_fc):
        params[f"shared{i}"] = _lin_init(next(keys), cin, c)
        cin = c
    c = cin
    for i, cc in enumerate(cfg.cls_fc):
        params[f"cls{i}"] = _lin_init(next(keys), c, cc)
        c = cc
    params["cls_pred"] = _lin_init(next(keys), c, 1, std=0.01)
    c = cin
    for i, cc in enumerate(cfg.reg_fc):
        params[f"reg{i}"] = _lin_init(next(keys), c, cc)
        c = cc
    params["reg_pred"] = _lin_init(next(keys), c, 7, std=0.001)
    return params


# --- geometry helpers -------------------------------------------------------


def rotate_z(points: jax.Array, angle: jax.Array) -> jax.Array:
    """[..., 3] points rotated about z by [...]-broadcast angle
    (common_utils.rotate_points_along_z convention: x->y positive)."""
    c, s = jnp.cos(angle)[..., None], jnp.sin(angle)[..., None]
    x, y, z = points[..., 0:1], points[..., 1:2], points[..., 2:3]
    return jnp.concatenate([x * c - y * s, x * s + y * c, z], axis=-1)


def roi_grid_points(rois: jax.Array, grid_size: int) -> jax.Array:
    """[R, 7] rois -> [R, G^3, 3] global grid-point coords
    (voxelrcnn_head.get_global_grid_points_of_roi). Grid index order is
    (x, y, z) fastest-last like the reference's nonzero()."""
    g = grid_size
    idx = np.stack(
        np.meshgrid(np.arange(g), np.arange(g), np.arange(g), indexing="ij"),
        -1,
    ).reshape(-1, 3)  # [(gx, gy, gz)] rows
    idx = jnp.asarray(idx, jnp.float32)
    dims = rois[:, None, 3:6]  # [R, 1, 3]
    local = (idx[None] + 0.5) / g * dims - dims / 2
    return rotate_z(local, rois[:, None, 6]) + rois[:, None, 0:3]


def _offset_template(radius_vox: float, nsample: int) -> np.ndarray:
    """Deterministic stand-in for random ball-query sampling: all integer
    offsets with |o| <= radius sorted by distance, strided down to
    nsample (keeps the center and spreads over the shells)."""
    r = int(np.ceil(radius_vox))
    g = np.stack(
        np.meshgrid(*([np.arange(-r, r + 1)] * 3), indexing="ij"), -1
    ).reshape(-1, 3)
    d = np.linalg.norm(g, axis=1)
    g = g[d <= max(radius_vox, 1.0)]
    d = np.linalg.norm(g, axis=1)
    g = g[np.argsort(d, kind="stable")]
    if len(g) <= nsample:
        return g.astype(np.int32)
    pick = np.linspace(0, len(g) - 1, nsample).round().astype(int)
    return g[pick].astype(np.int32)


# --- RoI grid pooling -------------------------------------------------------


def roi_grid_pool(
    params: Dict[str, Any],
    ms_feats: Dict[str, sp.SparseTensor],
    rois: jax.Array,  # [B, R, 7]
    cfg: VoxelRCNNConfig,
) -> jax.Array:
    """-> [B, R, G^3 * sum(mlps)] pooled features
    (voxelrcnn_head.roi_grid_pool)."""
    b, r, _ = rois.shape
    g3 = cfg.grid_size**3
    grid = jax.vmap(lambda rb: roi_grid_points(rb, cfg.grid_size))(rois)
    grid = grid.reshape(b, r * g3, 3)  # [B, Q, 3] global xyz
    pcr = jnp.asarray(cfg.stage1.pc_range[:3])
    vsz = jnp.asarray(cfg.stage1.voxel_size)

    pooled = []
    for src, pl in cfg.pool_layers:
        st = ms_feats[src]
        pre = params[f"pre_{src}"]
        feats = jax.nn.relu(st.features @ pre["w"] + pre["b"])  # [N, C]
        feats = feats * st.valid[:, None].astype(feats.dtype)
        sorted_keys, order = sp.build_lookup(st)
        # voxel coords of the query points at this scale ((x,y,z) ->
        # grid (z,y,x); stride-scaled voxel size)
        scale = vsz * pl.stride
        vox_xyz = jnp.floor((grid - pcr) / scale).astype(jnp.int32)
        q_zyx = vox_xyz[..., ::-1]  # [B, Q, 3]
        bidx = jnp.broadcast_to(
            jnp.arange(b, dtype=jnp.int32)[:, None], (b, r * g3)
        )
        tmpl = _offset_template(pl.radius / float(cfg.stage1.voxel_size[0]) / pl.stride, pl.nsample)
        agg = params[f"agg_{src}"]

        def step(carry, off):  # scan over the K template offsets
            qc = jnp.concatenate(
                [bidx[..., None], q_zyx + off[None, None]], axis=-1
            ).reshape(-1, 4)
            qkeys = sp._linearize(
                qc, jnp.ones((qc.shape[0],), bool), st.spatial_shape
            )
            src_idx, found = sp.lookup(sorted_keys, order, qkeys)
            f = feats[src_idx]  # [B*Q, C]
            # voxel-center xyz of the neighbor (get_voxel_centers)
            nb_zyx = (q_zyx + off[None, None]).reshape(-1, 3)
            nb_xyz = (nb_zyx[:, ::-1].astype(jnp.float32) + 0.5) * scale + pcr
            rel = nb_xyz - grid.reshape(-1, 3)
            inball = jnp.sum(rel**2, axis=-1) <= pl.radius**2
            keep = found & inball
            h = jax.nn.relu(
                jnp.concatenate([f, rel], axis=-1) @ agg["w"] + agg["b"]
            )
            h = jnp.where(keep[:, None], h, -jnp.inf)
            return jnp.maximum(carry, h), None

        init_acc = jnp.full((b * r * g3, pl.mlp), -jnp.inf)
        acc, _ = jax.lax.scan(step, init_acc, jnp.asarray(tmpl))
        acc = jnp.where(jnp.isfinite(acc), acc, 0.0)  # empty neighborhoods
        pooled.append(acc.reshape(b, r, g3, pl.mlp))
    return jnp.concatenate(pooled, axis=-1).reshape(b, r, -1)


# --- proposals --------------------------------------------------------------


def propose(
    preds: Dict[str, jax.Array],
    anchors: jax.Array,
    cfg: VoxelRCNNConfig,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Stage-1 outputs -> (rois [B, R, 7], roi_scores [B, R],
    roi_valid [B, R]) via top-k + rotated NMS
    (roi_head_template.proposal_layer).

    Batched via vmap (NOT a Python loop): the rotated-NMS program is
    compiled once and vectorized over the batch axis, so compile time is
    independent of batch size (round-1 measured ~285 s/sample unrolled)."""

    def one(cls_logits, box_deltas):
        probs = jax.nn.sigmoid(cls_logits)
        s_all = jnp.max(probs, axis=-1)
        k = min(cfg.proposal_pre, s_all.shape[0])
        top_s, top_i = jax.lax.top_k(s_all, k)
        boxes = decode_boxes(box_deltas[top_i], anchors[top_i])
        sel, valid = iou3d.nms_bev(
            boxes, top_s, cfg.proposal_nms_thresh, cfg.num_rois
        )
        return boxes[sel], top_s[sel], valid

    return jax.vmap(one)(preds["cls_logits"], preds["box_deltas"])


# --- proposal target layer --------------------------------------------------


def sample_rois_for_rcnn(
    rois: jax.Array,  # [R0, 7] proposals (R0 >= num_rois)
    roi_valid: jax.Array,  # [R0]
    gt_boxes: jax.Array,  # [G, 7]
    gt_valid: jax.Array,  # [G]
    cfg: VoxelRCNNConfig,
) -> Dict[str, jax.Array]:
    """One sample -> sampled rois + targets
    (proposal_target_layer.sample_rois_for_rcnn, rank-based)."""
    iou = iou3d.boxes_iou3d(rois, gt_boxes)  # [R0, G]
    iou = jnp.where(gt_valid[None, :] & roi_valid[:, None], iou, -1.0)
    max_iou = jnp.clip(jnp.max(iou, axis=1), 0.0)
    gt_idx = jnp.argmax(iou, axis=1)

    fg = max_iou >= cfg.reg_fg_thresh
    hard = (max_iou >= cfg.cls_bg_thresh_lo) & ~fg
    # cap foregrounds at fg_per by IoU rank; extra fg are discarded
    fg_score = jnp.where(fg, max_iou, -jnp.inf)
    fg_rank = jnp.zeros(rois.shape[0], jnp.int32).at[
        jnp.argsort(-fg_score)
    ].set(jnp.arange(rois.shape[0], dtype=jnp.int32))
    keep_fg = fg & (fg_rank < cfg.fg_per)
    sel_score = jnp.where(
        keep_fg,
        2e6 + max_iou,
        jnp.where(
            fg,
            -jnp.inf,  # over-cap fg: excluded like the reference's resample
            jnp.where(hard, 1e6 + max_iou, max_iou),
        ),
    )
    sel_score = jnp.where(roi_valid, sel_score, -jnp.inf)
    _, sel = jax.lax.top_k(sel_score, cfg.num_rois)

    s_rois = rois[sel]
    s_iou = max_iou[sel]
    s_gt = gt_boxes[gt_idx[sel]]
    # roi_iou soft labels (proposal_target_layer CLS_SCORE_TYPE=roi_iou)
    cls_label = jnp.clip(
        (s_iou - cfg.cls_bg_thresh) / (cfg.cls_fg_thresh - cfg.cls_bg_thresh),
        0.0,
        1.0,
    )
    reg_valid = s_iou >= cfg.reg_fg_thresh

    # canonical transform (roi_head_template.assign_targets:113-133)
    roi_ry = s_rois[:, 6] % (2 * np.pi)
    local_xyz = rotate_z(s_gt[:, 0:3] - s_rois[:, 0:3], -roi_ry)
    heading = (s_gt[:, 6] - roi_ry) % (2 * np.pi)
    opposite = (heading > np.pi * 0.5) & (heading < np.pi * 1.5)
    heading = jnp.where(opposite, (heading + np.pi) % (2 * np.pi), heading)
    heading = jnp.where(heading > np.pi, heading - 2 * np.pi, heading)
    heading = jnp.clip(heading, -np.pi / 2, np.pi / 2)
    gt_ct = jnp.concatenate(
        [local_xyz, s_gt[:, 3:6], heading[:, None]], axis=-1
    )
    return {
        "rois": s_rois,
        "gt_of_rois": gt_ct,
        "gt_src": s_gt,
        "cls_labels": cls_label,
        "reg_valid": reg_valid,
    }


# --- refinement head --------------------------------------------------------


def _mlp(x, params, names):
    for n in names:
        p = params[n]
        x = jax.nn.relu(x @ p["w"] + p["b"])
    return x


def refine(
    params: Dict[str, Any], pooled: jax.Array, cfg: VoxelRCNNConfig
) -> Tuple[jax.Array, jax.Array]:
    """pooled [B, R, G^3*C] -> (rcnn_cls [B, R], rcnn_reg [B, R, 7])."""
    b, r, _ = pooled.shape
    x = pooled.reshape(b * r, -1)
    x = _mlp(x, params, [f"shared{i}" for i in range(len(cfg.shared_fc))])
    hc = _mlp(x, params, [f"cls{i}" for i in range(len(cfg.cls_fc))])
    cls = (hc @ params["cls_pred"]["w"] + params["cls_pred"]["b"])[:, 0]
    hr = _mlp(x, params, [f"reg{i}" for i in range(len(cfg.reg_fc))])
    reg = hr @ params["reg_pred"]["w"] + params["reg_pred"]["b"]
    return cls.reshape(b, r), reg.reshape(b, r, 7)


def _local_anchor(rois: jax.Array) -> jax.Array:
    """RoI as its own anchor at the origin with heading 0
    (roi_head_template.get_box_reg_layer_loss:152-154)."""
    return jnp.concatenate(
        [jnp.zeros_like(rois[..., 0:3]), rois[..., 3:6],
         jnp.zeros_like(rois[..., 6:7])],
        axis=-1,
    )


def decode_refined(rois: jax.Array, reg: jax.Array) -> jax.Array:
    """rcnn_reg deltas -> global refined boxes
    (roi_head_template.generate_predicted_boxes)."""
    local = decode_boxes(reg, _local_anchor(rois))
    xyz = rotate_z(local[..., 0:3], rois[..., 6])
    return jnp.concatenate(
        [xyz + rois[..., 0:3], local[..., 3:6],
         (local[..., 6:7] + rois[..., 6:7])],
        axis=-1,
    )


# --- corner loss ------------------------------------------------------------


def box_corners_3d(boxes: jax.Array) -> jax.Array:
    """[..., 7] -> [..., 8, 3] box corners (box_utils.boxes_to_corners_3d)."""
    template = jnp.asarray(
        np.array(
            [
                [1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
                [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1],
            ],
            np.float32,
        )
        / 2.0
    )
    corners = boxes[..., None, 3:6] * template  # [..., 8, 3]
    corners = rotate_z(corners, boxes[..., None, 6])
    return corners + boxes[..., None, 0:3]


def corner_loss(pred_boxes: jax.Array, gt_boxes: jax.Array) -> jax.Array:
    """Huber corner distance with heading-flip min
    (loss_utils.get_corner_loss_lidar) -> [...]."""
    pc = box_corners_3d(pred_boxes)
    gc = box_corners_3d(gt_boxes)
    flip = jnp.concatenate(
        [gt_boxes[..., :6], gt_boxes[..., 6:7] + np.pi], axis=-1
    )
    gcf = box_corners_3d(flip)
    d = jnp.minimum(
        jnp.linalg.norm(pc - gc, axis=-1), jnp.linalg.norm(pc - gcf, axis=-1)
    )
    huber = jnp.where(d < 1.0, 0.5 * d**2, d - 0.5)
    return jnp.mean(huber, axis=-1)


# --- full model -------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg",))
def forward_stage1(
    params: Dict[str, Any],
    points: jax.Array,
    cfg: VoxelRCNNConfig,
    points_mask: jax.Array = None,
):
    """points -> (anchor-head preds, multi-scale sparse features,
    BEV feature map [B, H, W, C])."""
    s1 = cfg.stage1
    if points_mask is None:
        points_mask = jnp.ones(points.shape[:2], bool)
    st = sp.voxelize_points(
        points, points_mask, s1.voxel_size, s1.pc_range,
        s1.spatial_shape, s1.max_voxels,
    )
    st, ms = second.voxel_backbone_8x_ms(params["stage1"], st)
    bev = second.height_compression(st)
    feat = detector3d._bev_backbone(params["stage1"], bev, s1)
    b = feat.shape[0]
    from metatransformer_tpu.models.vit_adapter import conv2d

    p1 = params["stage1"]
    cls = conv2d(feat, p1["cls_w"], p1["cls_b"])
    box = conv2d(feat, p1["box_w"], p1["box_b"])
    dirc = conv2d(feat, p1["dir_w"], p1["dir_b"])
    preds = {
        "cls_logits": cls.reshape(b, -1, s1.num_classes),
        "box_deltas": box.reshape(b, -1, s1.box_code),
        "dir_logits": dirc.reshape(b, -1, s1.dir_bins),
    }
    return preds, ms, feat


def training_loss(
    params: Dict[str, Any],
    points: jax.Array,
    gt_boxes: jax.Array,  # [B, G, 7]
    gt_valid: jax.Array,  # [B, G]
    anchors: jax.Array,
    cfg: VoxelRCNNConfig,
    points_mask: jax.Array = None,
):
    """Joint stage-1 (anchor losses) + stage-2 (rcnn losses) objective
    (detectors/voxel_rcnn.py get_training_loss: loss_rpn + loss_rcnn)."""
    preds, ms, _ = forward_stage1(params, points, cfg, points_mask)
    rpn_loss, rpn_logs = second.detection_loss(
        preds, anchors, gt_boxes, gt_valid, cfg.stage1
    )
    rois, roi_scores, roi_valid = propose(
        jax.tree_util.tree_map(jax.lax.stop_gradient, preds), anchors, cfg
    )
    targets = jax.vmap(
        lambda r, rv, g, gv: sample_rois_for_rcnn(r, rv, g, gv, cfg)
    )(rois, roi_valid, gt_boxes, gt_valid)

    pooled = roi_grid_pool(params, ms, targets["rois"], cfg)
    rcnn_cls, rcnn_reg = refine(params, pooled, cfg)

    # BCE on soft iou labels (roi_head_template.get_box_cls_layer_loss)
    p = jnp.clip(jax.nn.sigmoid(rcnn_cls), 1e-7, 1 - 1e-7)
    t = targets["cls_labels"]
    bce = -(t * jnp.log(p) + (1 - t) * jnp.log(1 - p))
    cls_loss = jnp.mean(bce)

    # smooth-L1 on canonical-frame residuals, fg only
    reg_targets = encode_boxes(
        targets["gt_of_rois"], _local_anchor(targets["rois"])
    )
    fg = targets["reg_valid"].astype(jnp.float32)
    reg_err = detector3d.smooth_l1(rcnn_reg - reg_targets)
    reg_loss = jnp.sum(reg_err * fg[..., None]) / jnp.maximum(jnp.sum(fg), 1.0)

    # corner regularization on fg refined boxes vs source gt
    refined = decode_refined(targets["rois"], rcnn_reg)
    cl = corner_loss(refined, targets["gt_src"])
    corner = jnp.sum(cl * fg) / jnp.maximum(jnp.sum(fg), 1.0)

    total = (
        rpn_loss
        + cfg.rcnn_cls_weight * cls_loss
        + cfg.rcnn_reg_weight * reg_loss
        + cfg.rcnn_corner_weight * corner
    )
    return total, {
        **{f"rpn_{k}": v for k, v in rpn_logs.items()},
        "rcnn_cls": cls_loss,
        "rcnn_reg": reg_loss,
        "rcnn_corner": corner,
    }


def predict(
    params: Dict[str, Any],
    points: jax.Array,
    anchors: jax.Array,
    cfg: VoxelRCNNConfig,
    score_thr: float = 0.3,
    iou_thr: float = 0.1,
    max_out: int = 128,
    points_mask: jax.Array = None,
) -> List[Dict[str, np.ndarray]]:
    """Two-stage inference: propose -> pool -> refine -> final NMS."""
    preds, ms, _ = forward_stage1(params, points, cfg, points_mask)
    rois, roi_scores, roi_valid = propose(preds, anchors, cfg)
    pooled = roi_grid_pool(params, ms, rois, cfg)
    rcnn_cls, rcnn_reg = refine(params, pooled, cfg)
    boxes = decode_refined(rois, rcnn_reg)
    out = []
    for i in range(boxes.shape[0]):
        scores = jax.nn.sigmoid(rcnn_cls[i]) * roi_valid[i]
        scores = jnp.where(scores >= score_thr, scores, 0.0)
        sel, valid = iou3d.nms_bev(
            boxes[i], scores, iou_thr, min(max_out, boxes.shape[1])
        )
        valid = valid & (scores[sel] > 0)
        out.append(
            {
                "boxes": np.asarray(boxes[i][sel]),
                "scores": np.asarray(scores[sel]),
                "valid": np.asarray(valid),
            }
        )
    return out

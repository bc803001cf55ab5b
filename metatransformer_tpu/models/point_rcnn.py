"""PointRCNN: point-based two-stage 3D detector.

Reference: ``AutonomousDriving/pcdet/models/detectors/point_rcnn.py`` —
PointNet2MSG backbone (``backbones_3d/pointnet2_backbone.py:9-97``:
4 set-abstraction stages + 4 feature-propagation stages back to every
point), PointHeadBox (``dense_heads/point_head_box.py``: per-point
class + PointResidualCoder box proposal), PointRCNNHead
(``roi_heads/pointrcnn_head.py``: RoI point pooling, canonical
transform, xyz-up/merge-down MLPs, 3 SA stages, cls/reg refine).
Box coder: ``utils/box_coder_utils.PointResidualCoder`` (class mean
sizes, cos/sin heading, code size 8).

TPU-native deltas: fixed-capacity batch-major point sets with validity
masks everywhere; ball query and RoI point sampling are deterministic
first-k-in-radius/first-k-in-box; proposal machinery (rank subsampling,
soft labels, corner loss) is shared with ``models/voxel_rcnn.py``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.models import detector3d, voxel_rcnn as vr
from metatransformer_tpu.ops import iou3d, point_interp, point_ops


# KITTI class mean sizes (PointResidualCoder BOX_CODER_CONFIG mean_size)
KITTI_MEAN_SIZES = ((3.9, 1.6, 1.56), (0.8, 0.6, 1.73), (1.76, 0.6, 1.73))


@dataclasses.dataclass(frozen=True)
class SAStage:
    npoint: int
    radii: Tuple[float, ...]
    nsamples: Tuple[int, ...]
    mlps: Tuple[Tuple[int, ...], ...]  # one per radius


@dataclasses.dataclass(frozen=True)
class PointRCNNConfig:
    num_classes: int = 3
    point_features: int = 1  # intensity
    mean_sizes: Tuple[Tuple[float, float, float], ...] = KITTI_MEAN_SIZES
    # PointNet2MSG (OpenPCDet pointrcnn recipe values)
    sa_stages: Tuple[SAStage, ...] = (
        SAStage(4096, (0.1, 0.5), (16, 32), ((16, 16, 32), (32, 32, 64))),
        SAStage(1024, (0.5, 1.0), (16, 32), ((64, 64, 128), (64, 96, 128))),
        SAStage(256, (1.0, 2.0), (16, 32), ((128, 196, 256), (128, 196, 256))),
        SAStage(64, (2.0, 4.0), (16, 32), ((256, 256, 512), (256, 384, 512))),
    )
    fp_mlps: Tuple[Tuple[int, ...], ...] = (
        (128, 128), (256, 256), (512, 512), (512, 512)
    )
    # PointHeadBox
    head_cls_fc: Tuple[int, ...] = (128,)
    head_reg_fc: Tuple[int, ...] = (128,)
    gt_extra_width: float = 0.2
    # PointRCNNHead
    num_rois: int = 128
    fg_per: int = 64
    num_sampled_points: int = 512
    depth_normalizer: float = 70.0
    xyz_up: Tuple[int, ...] = (128, 128)
    roi_sa_stages: Tuple[SAStage, ...] = (
        SAStage(128, (0.2,), (16,), ((128, 128, 128),)),
        SAStage(32, (0.4,), (16,), ((128, 128, 256),)),
        SAStage(-1, (100.0,), (16,), ((256, 256, 512),)),  # group-all
    )
    cls_fc: Tuple[int, ...] = (256, 256)
    reg_fc: Tuple[int, ...] = (256, 256)
    # shared target/loss thresholds (roi_head_template via voxel_rcnn)
    reg_fg_thresh: float = 0.55
    cls_fg_thresh: float = 0.75
    cls_bg_thresh: float = 0.25
    cls_bg_thresh_lo: float = 0.1
    rcnn_cls_weight: float = 1.0
    rcnn_reg_weight: float = 1.0
    rcnn_corner_weight: float = 1.0
    proposal_nms_thresh: float = 0.8
    proposal_pre: int = 1024

    @property
    def backbone_out(self) -> int:
        return self.fp_mlps[0][-1]


def _mlp_stack_init(keys, cin, widths):
    out = []
    for w, k in zip(widths, keys):
        out.append(vr._lin_init(k, cin, w))
        cin = w
    return out, cin


def init(cfg: PointRCNNConfig, key: jax.Array) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 128))
    params: Dict[str, Any] = {}
    # SA stages (each radius: MLP over rel_xyz+feat)
    cin = cfg.point_features
    skip = [cfg.point_features]
    for si, st in enumerate(cfg.sa_stages):
        c_out = 0
        for gi, mlp in enumerate(st.mlps):
            stack, c = _mlp_stack_init(
                jax.random.split(next(keys), len(mlp)), cin + 3, mlp
            )
            params[f"sa{si}_{gi}"] = stack
            c_out += c
        skip.append(c_out)
        cin = c_out
    # FP stages (deep -> shallow): input = interp(deeper) + skip
    c_deep = cin
    for fi in reversed(range(len(cfg.fp_mlps))):
        stack, c_deep_next = _mlp_stack_init(
            jax.random.split(next(keys), len(cfg.fp_mlps[fi])),
            c_deep + skip[fi], cfg.fp_mlps[fi],
        )
        params[f"fp{fi}"] = stack
        c_deep = c_deep_next
    c_pt = cfg.backbone_out

    # PointHeadBox
    stack, c = _mlp_stack_init(
        jax.random.split(next(keys), len(cfg.head_cls_fc)), c_pt, cfg.head_cls_fc
    )
    params["ph_cls"] = stack
    params["ph_cls_pred"] = vr._lin_init(next(keys), c, cfg.num_classes, std=0.01)
    stack, c = _mlp_stack_init(
        jax.random.split(next(keys), len(cfg.head_reg_fc)), c_pt, cfg.head_reg_fc
    )
    params["ph_reg"] = stack
    params["ph_reg_pred"] = vr._lin_init(next(keys), c, 8, std=0.001)

    # PointRCNNHead
    stack, c_up = _mlp_stack_init(
        jax.random.split(next(keys), len(cfg.xyz_up)), 5, cfg.xyz_up
    )
    params["xyz_up"] = stack
    params["merge_down"] = vr._lin_init(next(keys), c_up + c_pt, c_up)
    cin = c_up
    for si, st in enumerate(cfg.roi_sa_stages):
        for gi, mlp in enumerate(st.mlps):
            stack, cin2 = _mlp_stack_init(
                jax.random.split(next(keys), len(mlp)), cin + 3, mlp
            )
            params[f"rsa{si}_{gi}"] = stack
        cin = cin2
    stack, c = _mlp_stack_init(
        jax.random.split(next(keys), len(cfg.cls_fc)), cin, cfg.cls_fc
    )
    params["rcnn_cls"] = stack
    params["rcnn_cls_pred"] = vr._lin_init(next(keys), c, 1, std=0.01)
    stack, c = _mlp_stack_init(
        jax.random.split(next(keys), len(cfg.reg_fc)), cin, cfg.reg_fc
    )
    params["rcnn_reg"] = stack
    params["rcnn_reg_pred"] = vr._lin_init(next(keys), c, 7, std=0.001)
    return params


# --- grouping with an MLP stack ---------------------------------------------


def _apply_stack(stack, x):
    for p in stack:
        x = jax.nn.relu(x @ p["w"] + p["b"])
    return x


def ball_group_mlp(
    centers, points, feats, valid, radius, nsample, stack,
):
    """Ball query + (rel_xyz ++ feat) MLP stack + masked max
    (PointnetSAModuleMSG group) -> [B, M, C_out]. feats may be None."""
    b, m, _ = centers.shape
    n = points.shape[1]
    d2 = point_ops.square_dists(centers, points)
    d2 = jnp.where(valid[:, None, :], d2, jnp.inf)
    inside = d2 < radius * radius
    order = jnp.arange(n, dtype=jnp.float32)[None, None, :]
    key = jnp.where(inside, -order, -(order + n))
    _, idx = jax.lax.top_k(key, nsample)
    count = jnp.sum(inside, axis=-1, keepdims=True)
    keep = jnp.arange(nsample)[None, None, :] < count
    gp = jax.vmap(lambda p, i: p[i])(points, idx)
    rel = gp - centers[:, :, None, :]
    if feats is not None:
        gf = jax.vmap(lambda f, i: f[i])(feats, idx)
        h = jnp.concatenate([rel, gf], axis=-1)
    else:
        h = rel
    h = _apply_stack(stack, h)
    h = jnp.where(keep[..., None], h, -jnp.inf)
    out = jnp.max(h, axis=2)
    return jnp.where(jnp.isfinite(out), out, 0.0)


# --- PointNet2MSG backbone --------------------------------------------------


def pointnet2_msg(
    params: Dict[str, Any],
    xyz: jax.Array,  # [B, N, 3]
    feats: jax.Array,  # [B, N, C0]
    mask: jax.Array,  # [B, N]
    cfg: PointRCNNConfig,
) -> jax.Array:
    """-> per-point features [B, N, backbone_out]."""
    l_xyz, l_feat, l_mask = [xyz], [feats], [mask]
    for si, st in enumerate(cfg.sa_stages):
        idx = point_ops.masked_fps(l_xyz[si], l_mask[si], st.npoint)
        ctr = jax.vmap(lambda p, i: p[i])(l_xyz[si], idx)
        ctr_mask = jax.vmap(lambda m, i: m[i])(l_mask[si], idx)
        groups = [
            ball_group_mlp(
                ctr, l_xyz[si], l_feat[si], l_mask[si], r, ns,
                params[f"sa{si}_{gi}"],
            )
            for gi, (r, ns) in enumerate(zip(st.radii, st.nsamples))
        ]
        l_xyz.append(ctr)
        l_feat.append(jnp.concatenate(groups, axis=-1))
        l_mask.append(ctr_mask)
    # FP: deep -> shallow, 3-NN interp + skip concat + MLP
    deep = l_feat[-1]
    for fi in reversed(range(len(cfg.fp_mlps))):
        interp = point_interp.three_interpolation(
            l_xyz[fi], l_xyz[fi + 1], deep
        )
        h = jnp.concatenate([interp, l_feat[fi]], axis=-1)
        deep = _apply_stack(params[f"fp{fi}"], h)
    return deep


# --- PointResidualCoder -----------------------------------------------------


def point_encode_boxes(gt, points, classes, mean_sizes):
    """(box_coder_utils.PointResidualCoder.encode_torch) -> [N, 8]."""
    ms = jnp.asarray(mean_sizes)[classes]  # [N, 3]
    diag = jnp.sqrt(ms[:, 0] ** 2 + ms[:, 1] ** 2)
    return jnp.stack(
        [
            (gt[:, 0] - points[:, 0]) / diag,
            (gt[:, 1] - points[:, 1]) / diag,
            (gt[:, 2] - points[:, 2]) / ms[:, 2],
            jnp.log(jnp.maximum(gt[:, 3], 1e-5) / ms[:, 0]),
            jnp.log(jnp.maximum(gt[:, 4], 1e-5) / ms[:, 1]),
            jnp.log(jnp.maximum(gt[:, 5], 1e-5) / ms[:, 2]),
            jnp.cos(gt[:, 6]),
            jnp.sin(gt[:, 6]),
        ],
        axis=-1,
    )


def point_decode_boxes(enc, points, classes, mean_sizes):
    ms = jnp.asarray(mean_sizes)[classes]
    diag = jnp.sqrt(ms[:, 0] ** 2 + ms[:, 1] ** 2)
    return jnp.stack(
        [
            enc[:, 0] * diag + points[:, 0],
            enc[:, 1] * diag + points[:, 1],
            enc[:, 2] * ms[:, 2] + points[:, 2],
            jnp.exp(enc[:, 3]) * ms[:, 0],
            jnp.exp(enc[:, 4]) * ms[:, 1],
            jnp.exp(enc[:, 5]) * ms[:, 2],
            jnp.arctan2(enc[:, 7], enc[:, 6]),
        ],
        axis=-1,
    )


# --- PointHeadBox -----------------------------------------------------------


def point_head_box(params, point_feats, cfg: PointRCNNConfig):
    """-> (cls_logits [B, N, num_classes], box_enc [B, N, 8])."""
    h = _apply_stack(params["ph_cls"], point_feats)
    cls = h @ params["ph_cls_pred"]["w"] + params["ph_cls_pred"]["b"]
    h = _apply_stack(params["ph_reg"], point_feats)
    box = h @ params["ph_reg_pred"]["w"] + params["ph_reg_pred"]["b"]
    return cls, box


def assign_point_targets(
    xyz: jax.Array,  # [B, N, 3]
    gt_boxes: jax.Array,  # [B, G, 7]
    gt_labels: jax.Array,  # [B, G] 0-based classes
    gt_valid: jax.Array,  # [B, G]
    cfg: PointRCNNConfig,
):
    """-> (cls_labels [B, N] in {-1 ignore, 0 bg, 1.. fg class+1},
    box_gt [B, N, 7], box_cls [B, N]) (point_head_template
    assign_stack_targets with set_ignore_flag)."""
    from metatransformer_tpu.ops import roi_pool3d

    inside = roi_pool3d.points_in_boxes(xyz, gt_boxes) & gt_valid[:, :, None]
    grown = jnp.concatenate(
        [gt_boxes[..., :3], gt_boxes[..., 3:6] + 2 * cfg.gt_extra_width,
         gt_boxes[..., 6:]], axis=-1,
    )
    inside_ext = roi_pool3d.points_in_boxes(xyz, grown) & gt_valid[:, :, None]
    # first matching gt per point (argmax over G of membership)
    in_any = jnp.any(inside, axis=1)  # [B, N]
    in_ext = jnp.any(inside_ext, axis=1)
    gt_idx = jnp.argmax(inside, axis=1)  # [B, N]
    cls = jnp.take_along_axis(gt_labels, gt_idx, axis=1) + 1
    labels = jnp.where(in_any, cls, jnp.where(in_ext, -1, 0))
    box_gt = jnp.take_along_axis(
        gt_boxes, gt_idx[..., None], axis=1
    )  # [B, N, 7]
    box_cls = jnp.take_along_axis(gt_labels, gt_idx, axis=1)
    return labels, box_gt, box_cls


# --- forward / losses -------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg",))
def forward(
    params: Dict[str, Any],
    points: jax.Array,  # [B, N, 3 + point_features]
    cfg: PointRCNNConfig,
    points_mask: jax.Array = None,
):
    """-> (point_feats [B, N, C], cls_logits [B, N, K], box_enc [B, N, 8])."""
    if points_mask is None:
        points_mask = jnp.ones(points.shape[:2], bool)
    xyz = points[..., :3]
    feats = points[..., 3:]
    pf = pointnet2_msg(params, xyz, feats, points_mask, cfg)
    cls, box = point_head_box(params, pf, cfg)
    return pf, cls, box


def propose(
    xyz: jax.Array,  # [B, N, 3]
    cls_logits: jax.Array,  # [B, N, K]
    box_enc: jax.Array,  # [B, N, 8]
    mask: jax.Array,
    cfg: PointRCNNConfig,
):
    """Per-point decoded boxes -> NMS proposals
    (point_head_box.generate_predicted_boxes + proposal_layer).
    vmapped over the batch: one compiled NMS program regardless of B."""

    def one(xyz_i, cls_i, enc_i, mask_i):
        probs = jax.nn.sigmoid(cls_i)
        s = jnp.max(probs, axis=-1) * mask_i
        lab = jnp.argmax(probs, axis=-1)
        boxes = point_decode_boxes(enc_i, xyz_i, lab, cfg.mean_sizes)
        k = min(cfg.proposal_pre, s.shape[0])
        top_s, top_i = jax.lax.top_k(s, k)
        sel, valid = iou3d.nms_bev(
            boxes[top_i], top_s, cfg.proposal_nms_thresh, cfg.num_rois
        )
        return boxes[top_i][sel], top_s[sel], valid

    return jax.vmap(one)(xyz, cls_logits, box_enc, mask)


def roi_point_pool(
    xyz: jax.Array,  # [B, N, 3]
    feats: jax.Array,  # [B, N, C] (score/depth/features already stacked)
    mask: jax.Array,  # [B, N]
    rois: jax.Array,  # [B, R, 7]
    num_sampled: int,
):
    """First-k points inside each roi, canonical-transformed
    (roipoint_pool3d + pointrcnn_head.roipool3d_gpu) ->
    (local_xyz [B, R, S, 3], feats [B, R, S, C], empty [B, R])."""
    from metatransformer_tpu.ops import roi_pool3d

    inside = roi_pool3d.points_in_boxes(xyz, rois)  # [B, R, N]
    inside = inside & mask[:, None, :]
    n = xyz.shape[1]
    order = jnp.arange(n, dtype=jnp.float32)[None, None, :]
    key = jnp.where(inside, -order, -(order + n))
    k = min(num_sampled, n)
    _, idx = jax.lax.top_k(key, k)  # [B, R, k]
    if k < num_sampled:  # fewer points than the sample budget: pad
        idx = jnp.concatenate(
            [idx, jnp.broadcast_to(idx[..., :1], (*idx.shape[:2], num_sampled - k))],
            axis=-1,
        )
    count = jnp.sum(inside, axis=-1, keepdims=True)
    keep = jnp.arange(num_sampled)[None, None, :] < count
    gx = jax.vmap(lambda p, i: p[i])(xyz, idx)  # [B, R, S, 3]
    gf = jax.vmap(lambda f, i: f[i])(feats, idx)
    local = gx - rois[:, :, None, :3]
    local = vr.rotate_z(local, -rois[:, :, None, 6])
    empty = count[..., 0] == 0
    z = (~empty[..., None, None]) & keep[..., None]
    return local * z, gf * z, empty


def rcnn_refine(
    params: Dict[str, Any],
    local_xyz: jax.Array,  # [B, R, S, 3]
    point_scores: jax.Array,  # [B, R, S]
    point_feats: jax.Array,  # [B, R, S, C]
    cfg: PointRCNNConfig,
):
    """xyz-up + merge-down + SA stages + heads -> (cls [B,R], reg [B,R,7])."""
    b, r, s, _ = local_xyz.shape
    depth = jnp.linalg.norm(local_xyz, axis=-1) / cfg.depth_normalizer - 0.5
    xyz_in = jnp.concatenate(
        [local_xyz, point_scores[..., None], depth[..., None]], axis=-1
    )
    h_xyz = _apply_stack(params["xyz_up"], xyz_in)  # [B, R, S, c_up]
    merged = jnp.concatenate([h_xyz, point_feats], axis=-1)
    h = jax.nn.relu(
        merged @ params["merge_down"]["w"] + params["merge_down"]["b"]
    )
    # SA stages over the pooled set (flatten rois into the batch)
    cur_xyz = local_xyz.reshape(b * r, s, 3)
    cur_f = h.reshape(b * r, s, -1)
    cur_m = jnp.ones((b * r, s), bool)
    for si, st in enumerate(cfg.roi_sa_stages):
        if st.npoint == -1:  # group-all: one center at the origin
            ctr = jnp.zeros((b * r, 1, 3))
        else:
            idx = point_ops.furthest_point_sample(cur_xyz, st.npoint)
            ctr = jax.vmap(lambda p, i: p[i])(cur_xyz, idx)
        cur_f = ball_group_mlp(
            ctr, cur_xyz, cur_f, cur_m, st.radii[0], st.nsamples[0],
            params[f"rsa{si}_0"],
        )
        cur_xyz = ctr
        cur_m = jnp.ones(ctr.shape[:2], bool)
    shared = cur_f[:, 0]  # [B*R, C]
    hc = _apply_stack(params["rcnn_cls"], shared)
    cls = (hc @ params["rcnn_cls_pred"]["w"] + params["rcnn_cls_pred"]["b"])[:, 0]
    hr = _apply_stack(params["rcnn_reg"], shared)
    reg = hr @ params["rcnn_reg_pred"]["w"] + params["rcnn_reg_pred"]["b"]
    return cls.reshape(b, r), reg.reshape(b, r, 7)


def training_loss(
    params: Dict[str, Any],
    points: jax.Array,  # [B, N, 3+C]
    gt_boxes: jax.Array,  # [B, G, 7]
    gt_labels: jax.Array,  # [B, G]
    gt_valid: jax.Array,  # [B, G]
    cfg: PointRCNNConfig,
    points_mask: jax.Array = None,
):
    """point head (focal cls + smooth-L1 box) + rcnn losses
    (point_rcnn.get_training_loss)."""
    if points_mask is None:
        points_mask = jnp.ones(points.shape[:2], bool)
    xyz = points[..., :3]
    pf, cls_logits, box_enc = forward(params, points, cfg, points_mask)

    labels, box_gt, box_cls = assign_point_targets(
        xyz, gt_boxes, gt_labels, gt_valid, cfg
    )
    valid = (labels >= 0) & points_mask
    fg = labels > 0
    onehot = jax.nn.one_hot(labels - 1, cfg.num_classes) * fg[..., None]
    p = jax.nn.sigmoid(cls_logits)
    pt = p * onehot + (1 - p) * (1 - onehot)
    alpha = 0.25 * onehot + 0.75 * (1 - onehot)
    ce = -jnp.log(jnp.clip(pt, 1e-7))
    cls_loss = jnp.sum(
        alpha * (1 - pt) ** 2 * ce * valid[..., None]
    ) / jnp.maximum(jnp.sum(fg), 1.0)

    enc_t = jax.vmap(
        lambda g, x, c: point_encode_boxes(g, x, c, cfg.mean_sizes)
    )(box_gt, xyz, box_cls)
    box_err = detector3d.smooth_l1(box_enc - enc_t)
    box_loss = jnp.sum(box_err * fg[..., None]) / jnp.maximum(jnp.sum(fg), 1.0)

    # stage 2
    rois, _, roi_valid = propose(
        xyz,
        jax.lax.stop_gradient(cls_logits),
        jax.lax.stop_gradient(box_enc),
        points_mask, cfg,
    )
    vcfg = _as_vr(cfg)
    targets = jax.vmap(
        lambda r, rv, g, gv: vr.sample_rois_for_rcnn(r, rv, g, gv, vcfg)
    )(rois, roi_valid, gt_boxes, gt_valid)
    scores = jnp.max(jax.nn.sigmoid(cls_logits), axis=-1)
    feats_all = pf
    local, gfeat, empty = roi_point_pool(
        xyz,
        jnp.concatenate([scores[..., None], feats_all], axis=-1),
        points_mask, targets["rois"], cfg.num_sampled_points,
    )
    rcnn_cls, rcnn_reg = rcnn_refine(
        params, local, gfeat[..., 0], gfeat[..., 1:], cfg
    )
    pcl = jnp.clip(jax.nn.sigmoid(rcnn_cls), 1e-7, 1 - 1e-7)
    t = targets["cls_labels"]
    rcls = jnp.mean(-(t * jnp.log(pcl) + (1 - t) * jnp.log(1 - pcl)))
    reg_targets = vr.encode_boxes(
        targets["gt_of_rois"], vr._local_anchor(targets["rois"])
    )
    fgm = targets["reg_valid"].astype(jnp.float32)
    rreg = jnp.sum(
        detector3d.smooth_l1(rcnn_reg - reg_targets) * fgm[..., None]
    ) / jnp.maximum(jnp.sum(fgm), 1.0)
    refined = vr.decode_refined(targets["rois"], rcnn_reg)
    corner = jnp.sum(
        vr.corner_loss(refined, targets["gt_src"]) * fgm
    ) / jnp.maximum(jnp.sum(fgm), 1.0)

    total = (
        cls_loss + box_loss
        + cfg.rcnn_cls_weight * rcls
        + cfg.rcnn_reg_weight * rreg
        + cfg.rcnn_corner_weight * corner
    )
    return total, {
        "point_cls": cls_loss, "point_box": box_loss,
        "rcnn_cls": rcls, "rcnn_reg": rreg, "rcnn_corner": corner,
    }


@functools.lru_cache(maxsize=8)
def _as_vr_cached(nms, pre, rois, fg):
    return vr.VoxelRCNNConfig(
        proposal_nms_thresh=nms, proposal_pre=pre, num_rois=rois, fg_per=fg
    )


def _as_vr(cfg: PointRCNNConfig) -> vr.VoxelRCNNConfig:
    return _as_vr_cached(
        cfg.proposal_nms_thresh, cfg.proposal_pre, cfg.num_rois, cfg.fg_per
    )


def predict(
    params: Dict[str, Any],
    points: jax.Array,
    cfg: PointRCNNConfig,
    score_thr: float = 0.1,
    iou_thr: float = 0.1,
    max_out: int = 128,
    points_mask: jax.Array = None,
) -> List[Dict[str, np.ndarray]]:
    if points_mask is None:
        points_mask = jnp.ones(points.shape[:2], bool)
    xyz = points[..., :3]
    pf, cls_logits, box_enc = forward(params, points, cfg, points_mask)
    rois, roi_scores, roi_valid = propose(
        xyz, cls_logits, box_enc, points_mask, cfg
    )
    scores = jnp.max(jax.nn.sigmoid(cls_logits), axis=-1)
    local, gfeat, empty = roi_point_pool(
        xyz, jnp.concatenate([scores[..., None], pf], axis=-1),
        points_mask, rois, cfg.num_sampled_points,
    )
    rcnn_cls, rcnn_reg = rcnn_refine(
        params, local, gfeat[..., 0], gfeat[..., 1:], cfg
    )
    boxes = vr.decode_refined(rois, rcnn_reg)
    out = []
    for i in range(boxes.shape[0]):
        s = jax.nn.sigmoid(rcnn_cls[i]) * roi_valid[i] * (~empty[i])
        s = jnp.where(s >= score_thr, s, 0.0)
        sel, valid = iou3d.nms_bev(
            boxes[i], s, iou_thr, min(max_out, boxes.shape[1])
        )
        valid = valid & (s[sel] > 0)
        out.append(
            {
                "boxes": np.asarray(boxes[i][sel]),
                "scores": np.asarray(s[sel]),
                "valid": np.asarray(valid),
            }
        )
    return out

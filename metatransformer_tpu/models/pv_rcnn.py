"""PV-RCNN: point-voxel two-stage 3D detector.

Reference: ``AutonomousDriving/pcdet/models/detectors/pv_rcnn.py`` —
SECOND stage 1 (VoxelBackBone8x + BEV anchor head), then:
 - VoxelSetAbstraction (``backbones_3d/pfe/voxel_set_abstraction.py``):
   FPS keypoints from raw points, per-keypoint features aggregated from
   the BEV map (bilinear), raw points (ball-query SA) and every sparse
   conv scale (x_conv1..4), fused by a linear+norm+relu;
 - PointHeadSimple (``dense_heads/point_head_simple.py``): per-keypoint
   foreground score, trained on point-in-gt-box targets, used as
   Predicted Keypoint Weighting;
 - PVRCNNHead (``roi_heads/pvrcnn_head.py``): RoI grid points ball-query
   the weighted keypoints (MSG two radii), shared-FC refine.
Recipe values from ``tools/cfgs/kitti_models/pv_rcnn.yaml``.

TPU-native deltas:
 - All point sets are fixed-capacity batch-major arrays with validity
   masks; ball query is the deterministic first-k-in-radius form
   (``ops/point_ops.ball_query`` semantics) computed from dense
   distances chunked over query points to bound memory.
 - Voxel-source neighborhoods query the flat sparse voxel list with a
   per-sample batch mask instead of pcdet's stack-mode batch counters.
 - Proposal/target/loss machinery is shared with Voxel-RCNN
   (``models/voxel_rcnn.py``): rank-based subsampling, soft IoU labels,
   canonical-frame smooth-L1 + flip-min corner loss.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.models import detector3d, second, voxel_rcnn as vr
from metatransformer_tpu.ops import iou3d, point_ops
from metatransformer_tpu.ops import sparse_conv as sp


@dataclasses.dataclass(frozen=True)
class SALayerConfig:
    radii: Tuple[float, ...] = (0.4, 0.8)  # POOL_RADIUS (MSG groups)
    nsamples: Tuple[int, ...] = (16, 16)
    mlp: int = 16  # per-group output width (MLPS [[c, c]] -> c)
    stride: int = 1  # DOWNSAMPLE_FACTOR (voxel sources)


@dataclasses.dataclass(frozen=True)
class PVRCNNConfig:
    stage1: second.SECONDConfig = second.SECONDConfig(
        bev_channels=(128, 256), up_channels=256
    )
    num_keypoints: int = 2048
    out_features: int = 128  # NUM_OUTPUT_FEATURES
    # (source, SALayerConfig); 'bev' and 'raw_points' are special names
    sa_layers: Tuple[Tuple[str, SALayerConfig], ...] = (
        ("raw_points", SALayerConfig((0.4, 0.8), (16, 16), 16)),
        ("x_conv1", SALayerConfig((0.4, 0.8), (16, 16), 16, stride=1)),
        ("x_conv2", SALayerConfig((0.8, 1.2), (16, 32), 32, stride=2)),
        ("x_conv3", SALayerConfig((1.2, 2.4), (16, 32), 64, stride=4)),
        ("x_conv4", SALayerConfig((2.4, 4.8), (16, 32), 64, stride=8)),
    )
    use_bev: bool = True
    point_cls_fc: Tuple[int, ...] = (256, 256)
    # RoI head (PVRCNNHead): grid-point ball query over keypoints
    num_rois: int = 128
    fg_per: int = 64
    grid_size: int = 6
    roi_radii: Tuple[float, ...] = (0.8, 1.6)
    roi_nsamples: Tuple[int, ...] = (16, 16)
    roi_mlp: int = 64
    shared_fc: Tuple[int, ...] = (256, 256)
    cls_fc: Tuple[int, ...] = (256, 256)
    reg_fc: Tuple[int, ...] = (256, 256)
    # shared target/loss constants (voxel_rcnn.VoxelRCNNConfig values)
    reg_fg_thresh: float = 0.55
    cls_fg_thresh: float = 0.75
    cls_bg_thresh: float = 0.25
    cls_bg_thresh_lo: float = 0.1
    rcnn_cls_weight: float = 1.0
    rcnn_reg_weight: float = 1.0
    rcnn_corner_weight: float = 1.0
    point_cls_weight: float = 1.0
    proposal_nms_thresh: float = 0.8
    proposal_pre: int = 1024
    gt_extra_width: float = 0.2  # point-head target enlargement
    # PVRCNNHeadMoE (pcdet/models/roi_heads/pvrcnn_head_MoE.py:33-43,
    # 170-178): one gated-residual expert per source dataset on the shared
    # RoI features, selected by the batch's source tag. 0 = off.
    moe_sources: int = 0

    def source_channels(self, src: str) -> int:
        w = self.stage1.widths
        return {
            "raw_points": 1,  # intensity
            "x_conv1": w[1], "x_conv2": w[2],
            "x_conv3": w[3], "x_conv4": w[4],
        }[src]

    @property
    def bev_channels_out(self) -> int:
        return self.stage1.up_channels * len(self.stage1.bev_channels)

    @property
    def vsa_channels(self) -> int:
        c = sum(s.mlp * len(s.radii) for _, s in self.sa_layers)
        if self.use_bev:
            c += self.bev_channels_out
        return c


def init(cfg: PVRCNNConfig, key: jax.Array) -> Dict[str, Any]:
    k1, k2 = jax.random.split(key)
    params: Dict[str, Any] = {"stage1": second.init(cfg.stage1, k1)}
    keys = iter(jax.random.split(k2, 64))
    for src, sa in cfg.sa_layers:
        cin = cfg.source_channels(src)
        for gi in range(len(sa.radii)):  # MSG groups: 2-layer MLP each
            params[f"sa_{src}_{gi}_a"] = vr._lin_init(next(keys), cin + 3, sa.mlp)
            params[f"sa_{src}_{gi}_b"] = vr._lin_init(next(keys), sa.mlp, sa.mlp)
    params["fusion"] = vr._lin_init(next(keys), cfg.vsa_channels, cfg.out_features)
    # PointHeadSimple: CLS_FC on pre-fusion features, 1 logit
    c = cfg.vsa_channels  # USE_POINT_FEATURES_BEFORE_FUSION: True
    for i, cc in enumerate(cfg.point_cls_fc):
        params[f"pt{i}"] = vr._lin_init(next(keys), c, cc)
        c = cc
    params["pt_pred"] = vr._lin_init(next(keys), c, 1, std=0.01)
    # RoI head: MSG over keypoints from grid points
    for gi in range(len(cfg.roi_radii)):
        params[f"roi_{gi}_a"] = vr._lin_init(
            next(keys), cfg.out_features + 3, cfg.roi_mlp
        )
        params[f"roi_{gi}_b"] = vr._lin_init(next(keys), cfg.roi_mlp, cfg.roi_mlp)
    cin = cfg.grid_size**3 * cfg.roi_mlp * len(cfg.roi_radii)
    for i, c in enumerate(cfg.shared_fc):
        params[f"shared{i}"] = vr._lin_init(next(keys), cin, c)
        cin = c
    if cfg.moe_sources:
        # stacked per-source gates, gathered by a traced source_id (the
        # same stacked-affine idiom as mdf_detectors.select_dataset)
        c_sh = cfg.shared_fc[-1]
        params["moe_gate"] = {
            "w": jax.random.normal(
                next(keys), (cfg.moe_sources, c_sh, c_sh)
            ) * np.sqrt(2.0 / c_sh),
            "bn_scale": jnp.ones((cfg.moe_sources, c_sh)),
            "bn_bias": jnp.zeros((cfg.moe_sources, c_sh)),
        }
    c0 = cin
    c = c0
    for i, cc in enumerate(cfg.cls_fc):
        params[f"cls{i}"] = vr._lin_init(next(keys), c, cc)
        c = cc
    params["cls_pred"] = vr._lin_init(next(keys), c, 1, std=0.01)
    c = c0
    for i, cc in enumerate(cfg.reg_fc):
        params[f"reg{i}"] = vr._lin_init(next(keys), c, cc)
        c = cc
    params["reg_pred"] = vr._lin_init(next(keys), c, 7, std=0.001)
    return params


# --- grouping primitives ----------------------------------------------------


def ball_group_max(
    centers: jax.Array,  # [B, M, 3]
    points: jax.Array,  # [B, N, 3] or [N, 3] (flat voxel list)
    feats: jax.Array,  # [B, N, C] or [N, C]
    valid: jax.Array,  # [B, N] (per-sample mask; handles flat lists too)
    radius: float,
    nsample: int,
    mlp_a: Dict[str, jax.Array],
    mlp_b: Dict[str, jax.Array],
    chunk: int = 512,
) -> jax.Array:
    """Ball-query + (rel_xyz, feat) 2-layer MLP + masked max-pool
    (pointnet2_stack StackSAModuleMSG semantics) -> [B, M, mlp].
    Distances are computed in chunks over M to bound memory."""
    b, m, _ = centers.shape
    if points.ndim == 2:
        points = jnp.broadcast_to(points[None], (b, *points.shape))
        feats = jnp.broadcast_to(feats[None], (b, *feats.shape))
    n = points.shape[1]

    def one_chunk(args):
        ctr = args  # [B, mc, 3]
        d2 = (
            jnp.sum(ctr**2, -1)[:, :, None]
            - 2 * jnp.einsum("bmc,bnc->bmn", ctr, points)
            + jnp.sum(points**2, -1)[:, None, :]
        )
        d2 = jnp.where(valid[:, None, :], d2, jnp.inf)
        inside = d2 < radius * radius
        order = jnp.arange(n, dtype=jnp.float32)[None, None, :]
        key = jnp.where(inside, -order, -(order + n))
        _, idx = jax.lax.top_k(key, nsample)  # [B, mc, k]
        count = jnp.sum(inside, axis=-1, keepdims=True)
        slot = jnp.arange(nsample, dtype=jnp.int32)[None, None, :]
        keep = slot < count  # [B, mc, k]
        gp = jax.vmap(lambda p, i: p[i])(points, idx)  # [B, mc, k, 3]
        gf = jax.vmap(lambda f, i: f[i])(feats, idx)  # [B, mc, k, C]
        rel = gp - ctr[:, :, None, :]
        h = jnp.concatenate([rel, gf], axis=-1)
        h = jax.nn.relu(h @ mlp_a["w"] + mlp_a["b"])
        h = jax.nn.relu(h @ mlp_b["w"] + mlp_b["b"])
        h = jnp.where(keep[..., None], h, -jnp.inf)
        out = jnp.max(h, axis=2)
        return jnp.where(jnp.isfinite(out), out, 0.0)

    if m <= chunk:
        return one_chunk(centers)
    pad = (-m) % chunk
    ctr = jnp.pad(centers, ((0, 0), (0, pad), (0, 0)))
    ctr = ctr.reshape(b, -1, chunk, 3).transpose(1, 0, 2, 3)
    out = jax.lax.map(one_chunk, ctr)  # [nchunk, B, chunk, C]
    out = out.transpose(1, 0, 2, 3).reshape(b, m + pad, -1)
    return out[:, :m]


def bev_interpolate(
    feat: jax.Array,  # [B, H, W, C] (H=y, W=x)
    keypoints: jax.Array,  # [B, K, 3] global xyz
    cfg: PVRCNNConfig,
) -> jax.Array:
    """Bilinear BEV feature interpolation at keypoint (x, y)
    (voxel_set_abstraction.interpolate_from_bev_features)."""
    s1 = cfg.stage1
    stride = s1.spatial_shape[2] // feat.shape[2]  # voxel grid -> BEV
    x = (keypoints[..., 0] - s1.pc_range[0]) / s1.voxel_size[0] / stride
    y = (keypoints[..., 1] - s1.pc_range[1]) / s1.voxel_size[1] / stride
    h, w = feat.shape[1:3]
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    g = jax.vmap(lambda f, yy, xx: f[yy, xx])
    ia, ib = g(feat, y0, x0), g(feat, y1, x0)
    ic, idd = g(feat, y0, x1), g(feat, y1, x1)
    wa = (x1 - x) * (y1 - y)
    wb = (x1 - x) * (y - y0)
    wc = (x - x0) * (y1 - y)
    wd = (x - x0) * (y - y0)
    return (
        ia * wa[..., None] + ib * wb[..., None]
        + ic * wc[..., None] + idd * wd[..., None]
    )


# --- Voxel Set Abstraction --------------------------------------------------


def voxel_set_abstraction(
    params: Dict[str, Any],
    points: jax.Array,  # [B, P, 4+] raw points (xyz + feats)
    points_mask: jax.Array,  # [B, P]
    ms_feats: Dict[str, sp.SparseTensor],
    bev_feat: jax.Array,  # [B, H, W, C]
    cfg: PVRCNNConfig,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """-> (keypoints [B, K, 3], fused features [B, K, out],
    pre-fusion features [B, K, vsa_channels])."""
    b = points.shape[0]
    xyz = points[..., :3]
    # FPS keypoints (get_sampled_points; invalid points pushed far away)
    kp_idx = point_ops.masked_fps(xyz, points_mask, cfg.num_keypoints)
    keypoints = jax.vmap(lambda p, i: p[i])(xyz, kp_idx)  # [B, K, 3]

    feats_list: List[jax.Array] = []
    if cfg.use_bev:
        feats_list.append(bev_interpolate(bev_feat, keypoints, cfg))

    pcr = jnp.asarray(cfg.stage1.pc_range[:3])
    vsz = jnp.asarray(cfg.stage1.voxel_size)
    for src, sa in cfg.sa_layers:
        if src == "raw_points":
            src_xyz, src_feat = xyz, points[..., 3:4]
            src_valid = points_mask
        else:
            st = ms_feats[src]
            zyx = st.coords[:, 1:].astype(jnp.float32)
            src_xyz = (zyx[:, ::-1] + 0.5) * (vsz * sa.stride) + pcr
            src_feat = st.features
            src_valid = (st.coords[:, 0][None] == jnp.arange(b)[:, None]) & st.valid[None]
        groups = [
            ball_group_max(
                keypoints, src_xyz, src_feat, src_valid, r, ns,
                params[f"sa_{src}_{gi}_a"], params[f"sa_{src}_{gi}_b"],
            )
            for gi, (r, ns) in enumerate(zip(sa.radii, sa.nsamples))
        ]
        feats_list.extend(groups)

    pre_fusion = jnp.concatenate(feats_list, axis=-1)  # [B, K, vsa]
    fu = params["fusion"]
    fused = jax.nn.relu(pre_fusion @ fu["w"] + fu["b"])
    return keypoints, fused, pre_fusion


def point_head(params: Dict[str, Any], pre_fusion: jax.Array, cfg: PVRCNNConfig) -> jax.Array:
    """Per-keypoint foreground logit (PointHeadSimple) -> [B, K]."""
    h = pre_fusion
    for i in range(len(cfg.point_cls_fc)):
        p = params[f"pt{i}"]
        h = jax.nn.relu(h @ p["w"] + p["b"])
    p = params["pt_pred"]
    return (h @ p["w"] + p["b"])[..., 0]


def point_head_targets(
    keypoints: jax.Array,  # [B, K, 3]
    gt_boxes: jax.Array,  # [B, G, 7]
    gt_valid: jax.Array,  # [B, G]
    extra: float,
) -> jax.Array:
    """Keypoint-in-enlarged-gt-box -> [B, K] {0,1}
    (point_head_template.assign_stack_targets, GT_EXTRA_WIDTH)."""
    grown = jnp.concatenate(
        [gt_boxes[..., :3], gt_boxes[..., 3:6] + 2 * extra, gt_boxes[..., 6:]],
        axis=-1,
    )
    from metatransformer_tpu.ops import roi_pool3d

    inside = roi_pool3d.points_in_boxes(keypoints, grown)  # [B, G, K]
    inside = inside & gt_valid[:, :, None]
    return jnp.any(inside, axis=1).astype(jnp.float32)


# --- RoI head (PVRCNNHead) --------------------------------------------------


def roi_grid_pool_keypoints(
    params: Dict[str, Any],
    rois: jax.Array,  # [B, R, 7]
    keypoints: jax.Array,  # [B, K, 3]
    kp_features: jax.Array,  # [B, K, C] (already PKW-weighted)
    cfg: PVRCNNConfig,
) -> jax.Array:
    """RoI 6^3 grid points ball-query the keypoints (MSG) ->
    [B, R, G^3 * mlp * n_radii] (pvrcnn_head.roi_grid_pool)."""
    b, r, _ = rois.shape
    g3 = cfg.grid_size**3
    grid = jax.vmap(lambda rb: vr.roi_grid_points(rb, cfg.grid_size))(rois)
    grid = grid.reshape(b, r * g3, 3)
    valid = jnp.ones(keypoints.shape[:2], bool)
    groups = [
        ball_group_max(
            grid, keypoints, kp_features, valid, rad, ns,
            params[f"roi_{gi}_a"], params[f"roi_{gi}_b"],
        )
        for gi, (rad, ns) in enumerate(zip(cfg.roi_radii, cfg.roi_nsamples))
    ]
    pooled = jnp.concatenate(groups, axis=-1)  # [B, R*G^3, C']
    return pooled.reshape(b, r, -1)


def refine(params, pooled, cfg: PVRCNNConfig, source_id=None):
    b, r, _ = pooled.shape
    x = pooled.reshape(b * r, -1)
    x = vr._mlp(x, params, [f"shared{i}" for i in range(len(cfg.shared_fc))])
    if cfg.moe_sources and source_id is not None:
        # MoE gate (pvrcnn_head_MoE.py:170-178): the source's expert
        # produces relu(bn(conv1x1(x))) gate weights; x += gate * x
        g = params["moe_gate"]
        w = g["w"][source_id]  # traced gather, one executable for all tags
        h = x @ w
        mean = jnp.mean(h, axis=0, keepdims=True)
        var = jnp.var(h, axis=0, keepdims=True)
        h = (h - mean) * jax.lax.rsqrt(var + 1e-3)
        h = h * g["bn_scale"][source_id] + g["bn_bias"][source_id]
        x = x + jax.nn.relu(h) * x
    hc = vr._mlp(x, params, [f"cls{i}" for i in range(len(cfg.cls_fc))])
    cls = (hc @ params["cls_pred"]["w"] + params["cls_pred"]["b"])[:, 0]
    hr = vr._mlp(x, params, [f"reg{i}" for i in range(len(cfg.reg_fc))])
    reg = hr @ params["reg_pred"]["w"] + params["reg_pred"]["b"]
    return cls.reshape(b, r), reg.reshape(b, r, 7)


# --- full model -------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg",))
def forward(
    params: Dict[str, Any],
    points: jax.Array,  # [B, P, 4]
    cfg: PVRCNNConfig,
    points_mask: jax.Array = None,
):
    """-> (stage-1 preds, keypoints, weighted kp features, point logits)."""
    if points_mask is None:
        points_mask = jnp.ones(points.shape[:2], bool)
    # stage-1 runs through voxel_rcnn's shared wrapper (same SECOND cfg)
    vcfg = _as_vr(cfg)
    preds, ms, bev = vr.forward_stage1(params, points, vcfg, points_mask)
    keypoints, fused, pre = voxel_set_abstraction(
        params, points, points_mask, ms, bev, cfg
    )
    pt_logits = point_head(params, pre, cfg)
    # Predicted Keypoint Weighting (pvrcnn_head: point_cls_scores)
    weighted = fused * jax.nn.sigmoid(pt_logits)[..., None]
    return preds, keypoints, weighted, pt_logits


@functools.lru_cache(maxsize=8)
def _as_vr_cached(stage1, nms, pre, rois):
    return vr.VoxelRCNNConfig(
        stage1=stage1, proposal_nms_thresh=nms, proposal_pre=pre,
        num_rois=rois,
    )


def _as_vr(cfg: PVRCNNConfig) -> vr.VoxelRCNNConfig:
    return _as_vr_cached(
        cfg.stage1, cfg.proposal_nms_thresh, cfg.proposal_pre, cfg.num_rois
    )


def training_loss(
    params: Dict[str, Any],
    points: jax.Array,
    gt_boxes: jax.Array,  # [B, G, 7]
    gt_valid: jax.Array,  # [B, G]
    anchors: jax.Array,
    cfg: PVRCNNConfig,
    points_mask: jax.Array = None,
    source_id=None,  # traced source tag for the MoE RoI head (MDF)
):
    """loss_rpn + loss_point + loss_rcnn (pv_rcnn.get_training_loss)."""
    preds, keypoints, weighted, pt_logits = forward(
        params, points, cfg, points_mask
    )
    vcfg = _as_vr(cfg)
    rpn_loss, rpn_logs = second.detection_loss(
        preds, anchors, gt_boxes, gt_valid, cfg.stage1
    )
    # point segmentation loss: focal BCE on keypoint fg targets
    pt_t = point_head_targets(keypoints, gt_boxes, gt_valid, cfg.gt_extra_width)
    p = jax.nn.sigmoid(pt_logits)
    pt = p * pt_t + (1 - p) * (1 - pt_t)
    alpha_t = 0.25 * pt_t + 0.75 * (1 - pt_t)
    ce = -jnp.log(jnp.clip(pt, 1e-7))
    point_loss = jnp.sum(alpha_t * (1 - pt) ** 2 * ce) / jnp.maximum(
        jnp.sum(pt_t), 1.0
    )

    rois, _, roi_valid = vr.propose(
        jax.tree_util.tree_map(jax.lax.stop_gradient, preds), anchors, vcfg
    )
    targets = jax.vmap(
        lambda r, rv, g, gv: vr.sample_rois_for_rcnn(r, rv, g, gv, vcfg)
    )(rois, roi_valid, gt_boxes, gt_valid)
    pooled = roi_grid_pool_keypoints(
        params, targets["rois"], keypoints, weighted, cfg
    )
    rcnn_cls, rcnn_reg = refine(params, pooled, cfg, source_id=source_id)

    pcl = jnp.clip(jax.nn.sigmoid(rcnn_cls), 1e-7, 1 - 1e-7)
    t = targets["cls_labels"]
    cls_loss = jnp.mean(-(t * jnp.log(pcl) + (1 - t) * jnp.log(1 - pcl)))
    reg_targets = vr.encode_boxes(
        targets["gt_of_rois"], vr._local_anchor(targets["rois"])
    )
    fg = targets["reg_valid"].astype(jnp.float32)
    reg_err = detector3d.smooth_l1(rcnn_reg - reg_targets)
    reg_loss = jnp.sum(reg_err * fg[..., None]) / jnp.maximum(jnp.sum(fg), 1.0)
    refined = vr.decode_refined(targets["rois"], rcnn_reg)
    corner = jnp.sum(
        vr.corner_loss(refined, targets["gt_src"]) * fg
    ) / jnp.maximum(jnp.sum(fg), 1.0)

    total = (
        rpn_loss
        + cfg.point_cls_weight * point_loss
        + cfg.rcnn_cls_weight * cls_loss
        + cfg.rcnn_reg_weight * reg_loss
        + cfg.rcnn_corner_weight * corner
    )
    return total, {
        **{f"rpn_{k}": v for k, v in rpn_logs.items()},
        "point_cls": point_loss,
        "rcnn_cls": cls_loss,
        "rcnn_reg": reg_loss,
        "rcnn_corner": corner,
    }


def predict(
    params: Dict[str, Any],
    points: jax.Array,
    anchors: jax.Array,
    cfg: PVRCNNConfig,
    score_thr: float = 0.1,
    iou_thr: float = 0.1,
    max_out: int = 128,
    points_mask: jax.Array = None,
    source_id=None,
) -> List[Dict[str, np.ndarray]]:
    """Two-stage inference over keypoint features."""
    preds, keypoints, weighted, _ = forward(params, points, cfg, points_mask)
    vcfg = _as_vr(cfg)
    rois, roi_scores, roi_valid = vr.propose(preds, anchors, vcfg)
    pooled = roi_grid_pool_keypoints(params, rois, keypoints, weighted, cfg)
    rcnn_cls, rcnn_reg = refine(params, pooled, cfg, source_id=source_id)
    boxes = vr.decode_refined(rois, rcnn_reg)
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

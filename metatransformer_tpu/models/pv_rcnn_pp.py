"""PV-RCNN++: proposal-centric keypoints + VectorPool aggregation.

Reference: ``AutonomousDriving/pcdet/models/detectors/pv_rcnn_plusplus.py``
— proposals are generated FIRST, keypoints are then sampled with
sectorized proposal-centric sampling
(``backbones_3d/pfe/voxel_set_abstraction.py:46-122``:
sample_points_with_roi + sector_fps), and features aggregate with
VectorPool modules (``ops/pointnet2/pointnet2_stack/pointnet2_modules.py:247-...``:
per-center local sub-voxel averaging with position-specific weights)
instead of ball-query set abstraction.

TPU-native deltas:
 - SPC sampling is static-shape: the in-range mask pushes out-of-range
   points to a far sentinel, sectors get an even keypoint budget
   (the reference allocates proportionally to data-dependent sector
   counts — impossible under static shapes; even split documented),
   and FPS runs per sector on masked copies.
 - VectorPool 'voxel_avg_pool' is a one_hot segment-mean over the n^3
   local sub-voxels followed by a per-voxel (grouped) linear map.
 - Stage-1, point-head, RoI-target and loss machinery are shared with
   PV-RCNN / Voxel-RCNN (``models/pv_rcnn.py``, ``models/voxel_rcnn.py``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.models import detector3d, pv_rcnn as pv, second, voxel_rcnn as vr
from metatransformer_tpu.ops import iou3d, point_ops


@dataclasses.dataclass(frozen=True)
class VectorPoolConfig:
    nvox: int = 2  # sub-voxels per axis (2x2x2 or 3x3x3)
    radius: float = 1.2  # MAX_NEIGHBOR_DISTANCE
    nsample: int = 32
    agg: int = 32  # per-voxel channels (NUM_CHANNELS_OF_LOCAL_AGGREGATION)
    post: int = 64  # post MLP width
    stride: int = 1  # voxel-source downsample factor


@dataclasses.dataclass(frozen=True)
class PVRCNNPPConfig:
    stage1: second.SECONDConfig = second.SECONDConfig(
        bev_channels=(128, 256), up_channels=256
    )
    num_keypoints: int = 4096
    num_sectors: int = 6
    spc_radius: float = 1.6  # SAMPLE_RADIUS_WITH_ROI
    out_features: int = 128
    vp_layers: Tuple[Tuple[str, VectorPoolConfig], ...] = (
        ("raw_points", VectorPoolConfig(2, 0.4, 32, 16, 32)),
        ("x_conv3", VectorPoolConfig(2, 1.2, 32, 32, 64, stride=4)),
        ("x_conv4", VectorPoolConfig(2, 2.4, 32, 32, 64, stride=8)),
    )
    use_bev: bool = True
    point_cls_fc: Tuple[int, ...] = (256, 256)
    num_rois: int = 128
    fg_per: int = 64
    grid_size: int = 6
    roi_vp: VectorPoolConfig = VectorPoolConfig(2, 0.8, 16, 16, 32)
    shared_fc: Tuple[int, ...] = (256, 256)
    cls_fc: Tuple[int, ...] = (256, 256)
    reg_fc: Tuple[int, ...] = (256, 256)
    rcnn_cls_weight: float = 1.0
    rcnn_reg_weight: float = 1.0
    rcnn_corner_weight: float = 1.0
    point_cls_weight: float = 1.0
    proposal_nms_thresh: float = 0.8
    proposal_pre: int = 1024
    gt_extra_width: float = 0.2

    def source_channels(self, src: str) -> int:
        w = self.stage1.widths
        return {"raw_points": 1, "x_conv3": w[3], "x_conv4": w[4]}[src]

    @property
    def bev_channels_out(self) -> int:
        return self.stage1.up_channels * len(self.stage1.bev_channels)

    @property
    def vsa_channels(self) -> int:
        c = sum(vp.post for _, vp in self.vp_layers)
        if self.use_bev:
            c += self.bev_channels_out
        return c


def _vp_init(keys, cin, vp: VectorPoolConfig):
    v = vp.nvox**3
    k1, k2 = keys
    return {
        # position-specific per-sub-voxel linear (the grouped conv)
        "local_w": jax.random.normal(k1, (v, cin + 3, vp.agg))
        * np.sqrt(2.0 / (cin + 3)),
        "post": vr._lin_init(k2, v * vp.agg, vp.post),
    }


def init(cfg: PVRCNNPPConfig, key: jax.Array) -> Dict[str, Any]:
    k1, k2 = jax.random.split(key)
    params: Dict[str, Any] = {"stage1": second.init(cfg.stage1, k1)}
    keys = iter(jax.random.split(k2, 48))
    for src, vp in cfg.vp_layers:
        params[f"vp_{src}"] = _vp_init(
            jax.random.split(next(keys)), cfg.source_channels(src), vp
        )
    params["fusion"] = vr._lin_init(next(keys), cfg.vsa_channels, cfg.out_features)
    c = cfg.vsa_channels
    for i, cc in enumerate(cfg.point_cls_fc):
        params[f"pt{i}"] = vr._lin_init(next(keys), c, cc)
        c = cc
    params["pt_pred"] = vr._lin_init(next(keys), c, 1, std=0.01)
    params["roi_vp"] = _vp_init(
        jax.random.split(next(keys)), cfg.out_features, cfg.roi_vp
    )
    cin = cfg.grid_size**3 * cfg.roi_vp.post
    for i, c in enumerate(cfg.shared_fc):
        params[f"shared{i}"] = vr._lin_init(next(keys), cin, c)
        cin = c
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


# --- sectorized proposal-centric sampling -----------------------------------


def spc_sampling(
    xyz: jax.Array,  # [B, N, 3]
    mask: jax.Array,  # [B, N]
    rois: jax.Array,  # [B, R, 7]
    roi_valid: jax.Array,  # [B, R]
    cfg: PVRCNNPPConfig,
) -> jax.Array:
    """-> keypoints [B, K, 3]
    (sectorized_proposal_centric_sampling: keep points within
    roi_half_diagonal + radius of the nearest proposal, sector-split by
    azimuth, FPS per sector with an even budget)."""
    b, n, _ = xyz.shape
    d2 = (
        jnp.sum(xyz**2, -1)[:, :, None]
        - 2 * jnp.einsum("bnc,brc->bnr", xyz, rois[..., :3])
        + jnp.sum(rois[..., :3] ** 2, -1)[:, None, :]
    )
    d2 = jnp.where(roi_valid[:, None, :], d2, jnp.inf)
    min_d = jnp.sqrt(jnp.min(d2, axis=-1))
    nearest = jnp.argmin(d2, axis=-1)
    half_diag = 0.5 * jnp.linalg.norm(rois[..., 3:6], axis=-1)  # [B, R]
    limit = jnp.take_along_axis(half_diag, nearest, axis=1) + cfg.spc_radius
    keep = mask & (min_d < limit) & jnp.any(roi_valid, axis=-1)[:, None]

    angles = jnp.arctan2(xyz[..., 1], xyz[..., 0]) + np.pi
    sector = jnp.clip(
        (angles / (2 * np.pi / cfg.num_sectors)).astype(jnp.int32),
        0, cfg.num_sectors - 1,
    )
    per = cfg.num_keypoints // cfg.num_sectors
    chunks = []
    for s in range(cfg.num_sectors):
        m = keep & (sector == s)
        # empty sectors fall back to the whole kept set (reference pads
        # missing sectors from the remaining points)
        m = jnp.where(jnp.any(m, axis=-1, keepdims=True), m, keep)
        m = jnp.where(jnp.any(m, axis=-1, keepdims=True), m, mask)
        idx = point_ops.masked_fps(xyz, m, per)
        chunks.append(jax.vmap(lambda p, i: p[i])(xyz, idx))
    return jnp.concatenate(chunks, axis=1)  # [B, sectors*per, 3]


# --- VectorPool aggregation -------------------------------------------------


def vector_pool(
    centers: jax.Array,  # [B, M, 3]
    points: jax.Array,  # [B, N, 3] or [N, 3]
    feats: jax.Array,  # [B, N, C] or [N, C]
    valid: jax.Array,  # [B, N]
    vp: VectorPoolConfig,
    params: Dict[str, jax.Array],
    chunk: int = 512,
) -> jax.Array:
    """'voxel_avg_pool' VectorPool -> [B, M, post]: neighbors inside the
    [-r, r]^3 cube are averaged per n^3 sub-voxel (rel-xyz appended),
    each sub-voxel applies its own linear map, post-MLP on the concat."""
    b, m, _ = centers.shape
    if points.ndim == 2:
        points = jnp.broadcast_to(points[None], (b, *points.shape))
        feats = jnp.broadcast_to(feats[None], (b, *feats.shape))
    n = points.shape[1]
    v = vp.nvox**3
    cell = 2 * vp.radius / vp.nvox

    def one_chunk(ctr):
        rel_all = points[:, None] - ctr[:, :, None]  # requires [B,mc,N,3]
        # cube membership (neighbor_type != 1 -> cube)
        inside = (
            jnp.max(jnp.abs(rel_all), axis=-1) <= vp.radius
        ) & valid[:, None, :]
        ns = min(vp.nsample, n)
        order = jnp.arange(n, dtype=jnp.float32)[None, None, :]
        key = jnp.where(inside, -order, -(order + n))
        _, idx = jax.lax.top_k(key, ns)
        count = jnp.sum(inside, axis=-1, keepdims=True)
        keepn = jnp.arange(ns)[None, None, :] < count
        gp = jax.vmap(lambda p, i: p[i])(points, idx)  # [B, mc, S, 3]
        gf = jax.vmap(lambda f, i: f[i])(feats, idx)
        rel = gp - ctr[:, :, None, :]
        sub = jnp.clip(
            jnp.floor((rel + vp.radius) / cell).astype(jnp.int32),
            0, vp.nvox - 1,
        )
        sid = (sub[..., 0] * vp.nvox + sub[..., 1]) * vp.nvox + sub[..., 2]
        onehot = jax.nn.one_hot(sid, v) * keepn[..., None]  # [B, mc, S, V]
        h = jnp.concatenate([gf, rel], axis=-1)  # [B, mc, S, C+3]
        summed = jnp.einsum("bmsv,bmsc->bmvc", onehot, h)
        cnt = jnp.maximum(jnp.sum(onehot, axis=2), 1.0)  # [B, mc, V]
        mean = summed / cnt[..., None]
        loc = jax.nn.relu(
            jnp.einsum("bmvc,vcd->bmvd", mean, params["local_w"])
        )
        flat = loc.reshape(*loc.shape[:2], -1)
        p = params["post"]
        return jax.nn.relu(flat @ p["w"] + p["b"])

    if m <= chunk:
        return one_chunk(centers)
    pad = (-m) % chunk
    ctr = jnp.pad(centers, ((0, 0), (0, pad), (0, 0)))
    ctr = ctr.reshape(b, -1, chunk, 3).transpose(1, 0, 2, 3)
    out = jax.lax.map(one_chunk, ctr)
    out = out.transpose(1, 0, 2, 3).reshape(b, m + pad, -1)
    return out[:, :m]


# --- model ------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _as_vr_cached(stage1, nms, pre, rois, fg):
    return vr.VoxelRCNNConfig(
        stage1=stage1, proposal_nms_thresh=nms, proposal_pre=pre,
        num_rois=rois, fg_per=fg,
    )


def _as_vr(cfg: PVRCNNPPConfig) -> vr.VoxelRCNNConfig:
    return _as_vr_cached(
        cfg.stage1, cfg.proposal_nms_thresh, cfg.proposal_pre,
        cfg.num_rois, cfg.fg_per,
    )


def _vsa(params, points, points_mask, ms, bev, rois, roi_valid, cfg):
    """Keypoints via SPC around the proposals, features via VectorPool
    + BEV bilinear -> (keypoints, fused, pre_fusion)."""
    xyz = points[..., :3]
    keypoints = spc_sampling(xyz, points_mask, rois, roi_valid, cfg)
    feats_list: List[jax.Array] = []
    if cfg.use_bev:
        pcfg = _pv_like(cfg)
        feats_list.append(pv.bev_interpolate(bev, keypoints, pcfg))
    pcr = jnp.asarray(cfg.stage1.pc_range[:3])
    vsz = jnp.asarray(cfg.stage1.voxel_size)
    b = points.shape[0]
    for src, vpc in cfg.vp_layers:
        if src == "raw_points":
            sx, sf, sv = xyz, points[..., 3:4], points_mask
        else:
            st = ms[src]
            zyx = st.coords[:, 1:].astype(jnp.float32)
            sx = (zyx[:, ::-1] + 0.5) * (vsz * vpc.stride) + pcr
            sf = st.features
            sv = (st.coords[:, 0][None] == jnp.arange(b)[:, None]) & st.valid[None]
        feats_list.append(
            vector_pool(keypoints, sx, sf, sv, vpc, params[f"vp_{src}"])
        )
    pre = jnp.concatenate(feats_list, axis=-1)
    fu = params["fusion"]
    fused = jax.nn.relu(pre @ fu["w"] + fu["b"])
    return keypoints, fused, pre


@functools.lru_cache(maxsize=8)
def _pv_like_cached(stage1):
    return pv.PVRCNNConfig(stage1=stage1)


def _pv_like(cfg: PVRCNNPPConfig):
    return _pv_like_cached(cfg.stage1)


def _refine(params, pooled, cfg: PVRCNNPPConfig):
    b, r, _ = pooled.shape
    x = pooled.reshape(b * r, -1)
    x = vr._mlp(x, params, [f"shared{i}" for i in range(len(cfg.shared_fc))])
    hc = vr._mlp(x, params, [f"cls{i}" for i in range(len(cfg.cls_fc))])
    cls = (hc @ params["cls_pred"]["w"] + params["cls_pred"]["b"])[:, 0]
    hr = vr._mlp(x, params, [f"reg{i}" for i in range(len(cfg.reg_fc))])
    reg = hr @ params["reg_pred"]["w"] + params["reg_pred"]["b"]
    return cls.reshape(b, r), reg.reshape(b, r, 7)


def _roi_pool(params, rois, keypoints, kp_feats, cfg: PVRCNNPPConfig):
    b, r, _ = rois.shape
    g3 = cfg.grid_size**3
    grid = jax.vmap(lambda rb: vr.roi_grid_points(rb, cfg.grid_size))(rois)
    grid = grid.reshape(b, r * g3, 3)
    valid = jnp.ones(keypoints.shape[:2], bool)
    pooled = vector_pool(
        grid, keypoints, kp_feats, valid, cfg.roi_vp, params["roi_vp"]
    )
    return pooled.reshape(b, r, -1)


def training_loss(
    params: Dict[str, Any],
    points: jax.Array,
    gt_boxes: jax.Array,
    gt_valid: jax.Array,
    anchors: jax.Array,
    cfg: PVRCNNPPConfig,
    points_mask: jax.Array = None,
):
    """rpn + point + rcnn losses with proposals-before-keypoints
    ordering (pv_rcnn_plusplus.forward)."""
    if points_mask is None:
        points_mask = jnp.ones(points.shape[:2], bool)
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

    keypoints, fused, pre = _vsa(
        params, points, points_mask, ms, bev, targets["rois"],
        jnp.ones(targets["rois"].shape[:2], bool), cfg,
    )
    pt_logits = pv.point_head(
        {k: v for k, v in params.items()}, pre, _pt_cfg(cfg)
    )
    pt_t = pv.point_head_targets(
        keypoints, gt_boxes, gt_valid, cfg.gt_extra_width
    )
    p = jax.nn.sigmoid(pt_logits)
    pt = p * pt_t + (1 - p) * (1 - pt_t)
    alpha = 0.25 * pt_t + 0.75 * (1 - pt_t)
    point_loss = jnp.sum(
        -alpha * (1 - pt) ** 2 * jnp.log(jnp.clip(pt, 1e-7))
    ) / jnp.maximum(jnp.sum(pt_t), 1.0)
    weighted = fused * jax.nn.sigmoid(pt_logits)[..., None]

    pooled = _roi_pool(params, targets["rois"], keypoints, weighted, cfg)
    rcnn_cls, rcnn_reg = _refine(params, pooled, cfg)
    pcl = jnp.clip(jax.nn.sigmoid(rcnn_cls), 1e-7, 1 - 1e-7)
    t = targets["cls_labels"]
    cls_loss = jnp.mean(-(t * jnp.log(pcl) + (1 - t) * jnp.log(1 - pcl)))
    reg_targets = vr.encode_boxes(
        targets["gt_of_rois"], vr._local_anchor(targets["rois"])
    )
    fg = targets["reg_valid"].astype(jnp.float32)
    reg_loss = jnp.sum(
        detector3d.smooth_l1(rcnn_reg - reg_targets) * fg[..., None]
    ) / jnp.maximum(jnp.sum(fg), 1.0)
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
        "point_cls": point_loss, "rcnn_cls": cls_loss,
        "rcnn_reg": reg_loss, "rcnn_corner": corner,
    }


@functools.lru_cache(maxsize=8)
def _pt_cfg_cached(fcs, vsa):
    return pv.PVRCNNConfig(point_cls_fc=fcs)


def _pt_cfg(cfg: PVRCNNPPConfig):
    return _pt_cfg_cached(cfg.point_cls_fc, cfg.vsa_channels)


def predict(
    params: Dict[str, Any],
    points: jax.Array,
    anchors: jax.Array,
    cfg: PVRCNNPPConfig,
    score_thr: float = 0.1,
    iou_thr: float = 0.1,
    max_out: int = 128,
    points_mask: jax.Array = None,
) -> List[Dict[str, np.ndarray]]:
    if points_mask is None:
        points_mask = jnp.ones(points.shape[:2], bool)
    vcfg = _as_vr(cfg)
    preds, ms, bev = vr.forward_stage1(params, points, vcfg, points_mask)
    rois, roi_scores, roi_valid = vr.propose(preds, anchors, vcfg)
    keypoints, fused, pre = _vsa(
        params, points, points_mask, ms, bev, rois, roi_valid, cfg
    )
    pt_logits = pv.point_head(params, pre, _pt_cfg(cfg))
    weighted = fused * jax.nn.sigmoid(pt_logits)[..., None]
    pooled = _roi_pool(params, rois, keypoints, weighted, cfg)
    rcnn_cls, rcnn_reg = _refine(params, pooled, cfg)
    boxes = vr.decode_refined(rois, rcnn_reg)
    out = []
    for i in range(boxes.shape[0]):
        s = jax.nn.sigmoid(rcnn_cls[i]) * roi_valid[i]
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

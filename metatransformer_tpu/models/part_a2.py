"""Part-A2: part-aware two-stage 3D detector with a sparse UNet.

Reference: ``AutonomousDriving/pcdet/models/detectors/PartA2_net.py`` —
UNetV2 sparse-conv UNet backbone (``backbones_3d/spconv_unet.py``:
VoxelBackBone-style encoder + UR decoder blocks with inverse sparse
convs back to every voxel), PointIntraPartOffsetHead
(``dense_heads/point_intra_part_head.py``: per-voxel foreground
segmentation + intra-object part-location regression in [0,1]^3), the
SECOND anchor head on the encoded BEV, and PartA2FCHead
(``roi_heads/partA2_head.py``: RoI-aware pooling of part + seg features
and refinement).

TPU-native deltas: the decoder's inverse convs run on the stored
finer active sets via ``ops/sparse_conv.inverse_sparse_conv3d``; the
RoI part pooling uses the deterministic voxel-hash grid pooling shared
with Voxel-RCNN; part targets are the closed-form box-frame relative
coordinates.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.models import detector3d, second, voxel_rcnn as vr
from metatransformer_tpu.ops import iou3d
from metatransformer_tpu.ops import sparse_conv as sp


@dataclasses.dataclass(frozen=True)
class PartA2Config:
    stage1: second.SECONDConfig = second.SECONDConfig(
        widths=(16, 16, 32, 64, 64, 128), bev_channels=(128, 256),
        up_channels=256,
    )
    num_rois: int = 128
    fg_per: int = 64
    grid_size: int = 6  # RoI part pooling grid
    pool_mlp: int = 32
    shared_fc: Tuple[int, ...] = (256, 256)
    cls_fc: Tuple[int, ...] = (256, 256)
    reg_fc: Tuple[int, ...] = (256, 256)
    seg_weight: float = 1.0
    part_weight: float = 1.0
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
    def unet_out(self) -> int:
        return self.stage1.widths[0]  # decoder returns to stem width


def init(cfg: PartA2Config, key: jax.Array) -> Dict[str, Any]:
    k1, k2 = jax.random.split(key)
    params: Dict[str, Any] = {"stage1": second.init(cfg.stage1, k1)}
    keys = iter(jax.random.split(k2, 48))
    w = cfg.stage1.widths
    # decoder (spconv_unet.py:110-132): per level, lateral transform +
    # merge subm + inverse conv to the next finer level
    plan = [  # (lateral_ch, bottom_ch, out_ch)
        ("up4", w[4], w[4], w[3]),  # stride8 -> stride4
        ("up3", w[3], w[3], w[2]),  # stride4 -> stride2
        ("up2", w[2], w[2], w[0]),  # stride2 -> stride1
        ("up1", w[1], w[0], w[0]),  # stride1 (subm final)
    ]
    for name, cl, cb, co in plan:
        params[f"{name}_t"] = second._subm_init(next(keys), cl, cl)
        params[f"{name}_m"] = second._subm_init(next(keys), cl + cb, cl)
        params[f"{name}_inv"] = second._subm_init(next(keys), cl, co)
    # point part head: seg (1) + part offsets (3)
    params["seg"] = vr._lin_init(next(keys), cfg.unet_out, 1, std=0.01)
    params["part"] = vr._lin_init(next(keys), cfg.unet_out, 3, std=0.01)
    # RoI head: pre-MLP on (unet feat + part(3) + seg(1)) + grid pool
    params["pre_pool"] = vr._lin_init(
        next(keys), cfg.unet_out + 4, cfg.pool_mlp
    )
    params["agg_pool"] = vr._lin_init(next(keys), cfg.pool_mlp + 3, cfg.pool_mlp)
    cin = cfg.grid_size**3 * cfg.pool_mlp
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


# --- UNet decoder -----------------------------------------------------------


def _ur_block(params, name, lateral, bottom, stride, padding, inverse=True):
    """UR_block_forward (spconv_unet.py:135-143): lateral transform,
    concat with the decoder path, merge, (inverse-)conv up."""
    rb = sp.build_lookup(lateral)
    xt = second._block(lateral, params[f"{name}_t"], rb)
    cat = dataclasses.replace(
        xt, features=jnp.concatenate([bottom.features, xt.features], axis=-1)
    )
    xm = sp.subm_conv3d(cat, params[f"{name}_m"]["w"], rb)
    xm = sp.batch_norm_relu(
        xm, params[f"{name}_m"]["bn_scale"], params[f"{name}_m"]["bn_bias"]
    )
    # channel_reduction + residual add (sum-fold the concat channels)
    n, cc = cat.features.shape
    co = xm.features.shape[1]
    folded = cat.features.reshape(n, co, cc // co).sum(axis=2)
    x = dataclasses.replace(xm, features=xm.features + folded)
    return x, stride, padding


def unet_forward(params: Dict[str, Any], st: sp.SparseTensor, cfg: PartA2Config):
    """-> (encoded stride-8 tensor, per-voxel decoder features at the
    input active set) (UNetV2.forward)."""
    p1 = params["stage1"]
    out, ms = second.voxel_backbone_8x_ms(p1, st)
    x1, x2, x3, x4 = ms["x_conv1"], ms["x_conv2"], ms["x_conv3"], ms["x_conv4"]

    x, s, pd = _ur_block(params, "up4", x4, x4, (2, 2, 2), (0, 1, 1))
    x = sp.inverse_sparse_conv3d(x, x3, params["up4_inv"]["w"], s, pd)
    x = sp.batch_norm_relu(x, params["up4_inv"]["bn_scale"], params["up4_inv"]["bn_bias"])

    x, s, pd = _ur_block(params, "up3", x3, x, (2, 2, 2), (1, 1, 1))
    x = sp.inverse_sparse_conv3d(x, x2, params["up3_inv"]["w"], s, pd)
    x = sp.batch_norm_relu(x, params["up3_inv"]["bn_scale"], params["up3_inv"]["bn_bias"])

    x, s, pd = _ur_block(params, "up2", x2, x, (2, 2, 2), (1, 1, 1))
    x = sp.inverse_sparse_conv3d(x, x1, params["up2_inv"]["w"], s, pd)
    x = sp.batch_norm_relu(x, params["up2_inv"]["bn_scale"], params["up2_inv"]["bn_bias"])

    x, _, _ = _ur_block(params, "up1", x1, x, (1, 1, 1), (1, 1, 1))
    rb = sp.build_lookup(x)
    x = sp.subm_conv3d(x, params["up1_inv"]["w"], rb)
    x = sp.batch_norm_relu(x, params["up1_inv"]["bn_scale"], params["up1_inv"]["bn_bias"])
    return out, x


# --- part head --------------------------------------------------------------


def part_targets(
    st: sp.SparseTensor,  # voxel tensor at stride 1 (coords = cells)
    gt_boxes: jax.Array,  # [B, G, 7]
    gt_valid: jax.Array,
    cfg: PartA2Config,
):
    """Per-voxel (fg, part-location in [0,1]^3) targets
    (point_intra_part_head.assign_targets): part = box-frame relative
    position of the voxel center."""
    s1 = cfg.stage1
    pcr = jnp.asarray(s1.pc_range[:3])
    vsz = jnp.asarray(s1.voxel_size)
    zyx = st.coords[:, 1:].astype(jnp.float32)
    xyz = (zyx[:, ::-1] + 0.5) * vsz + pcr  # [N, 3]
    bidx = st.coords[:, 0]
    gt = gt_boxes[bidx]  # [N, G, 7]
    gv = gt_valid[bidx]
    local = vr.rotate_z(
        xyz[:, None, :] - gt[..., :3], -gt[..., 6]
    )  # [N, G, 3]
    half = gt[..., 3:6] / 2
    inside = jnp.all(jnp.abs(local) <= half, axis=-1) & gv & st.valid[:, None]
    fg = jnp.any(inside, axis=-1)
    gi = jnp.argmax(inside, axis=-1)
    sel = jnp.take_along_axis(local, gi[:, None, None], axis=1)[:, 0]
    dims = jnp.take_along_axis(gt[..., 3:6], gi[:, None, None], axis=1)[:, 0]
    part = jnp.clip(sel / jnp.maximum(dims, 1e-5) + 0.5, 0.0, 1.0)
    return fg, part


@functools.partial(jax.jit, static_argnames=("cfg",))
def forward(
    params: Dict[str, Any],
    points: jax.Array,
    cfg: PartA2Config,
    points_mask: jax.Array = None,
):
    """points -> (anchor preds, unet voxel tensor, seg logits [N],
    part preds [N, 3], BEV features)."""
    s1 = cfg.stage1
    if points_mask is None:
        points_mask = jnp.ones(points.shape[:2], bool)
    st = sp.voxelize_points(
        points, points_mask, s1.voxel_size, s1.pc_range,
        s1.spatial_shape, s1.max_voxels,
    )
    enc, dec = unet_forward(params, st, cfg)
    bev = second.height_compression(enc)
    feat = detector3d._bev_backbone(params["stage1"], bev, s1)
    from metatransformer_tpu.models.vit_adapter import conv2d

    p1 = params["stage1"]
    b = feat.shape[0]
    preds = {
        "cls_logits": conv2d(feat, p1["cls_w"], p1["cls_b"]).reshape(
            b, -1, s1.num_classes
        ),
        "box_deltas": conv2d(feat, p1["box_w"], p1["box_b"]).reshape(
            b, -1, s1.box_code
        ),
        "dir_logits": conv2d(feat, p1["dir_w"], p1["dir_b"]).reshape(
            b, -1, s1.dir_bins
        ),
    }
    seg = (dec.features @ params["seg"]["w"] + params["seg"]["b"])[:, 0]
    part = jax.nn.sigmoid(
        dec.features @ params["part"]["w"] + params["part"]["b"]
    )
    return preds, dec, seg, part


def roi_part_pool(
    params: Dict[str, Any],
    dec: sp.SparseTensor,
    seg: jax.Array,  # [N]
    part: jax.Array,  # [N, 3]
    rois: jax.Array,  # [B, R, 7]
    cfg: PartA2Config,
) -> jax.Array:
    """RoI-aware pooling of (features ++ part ++ seg) on the stride-1
    voxel hash -> [B, R, G^3 * pool_mlp] (partA2_head roiaware pooling,
    via the shared deterministic grid lookup)."""
    feats = jnp.concatenate(
        [dec.features, part, jax.nn.sigmoid(seg)[:, None]], axis=-1
    )
    aug = dataclasses.replace(dec, features=feats)
    vcfg = vr.VoxelRCNNConfig(
        stage1=cfg.stage1, grid_size=cfg.grid_size,
        pool_layers=(("x_dec", vr.PoolLayerConfig(1, float(cfg.stage1.voxel_size[0]) * 2.0, nsample=8, mlp=cfg.pool_mlp)),),
    )
    p = {"pre_x_dec": params["pre_pool"], "agg_x_dec": params["agg_pool"]}
    return vr.roi_grid_pool(p, {"x_dec": aug}, rois, vcfg)


def training_loss(
    params: Dict[str, Any],
    points: jax.Array,
    gt_boxes: jax.Array,
    gt_valid: jax.Array,
    anchors: jax.Array,
    cfg: PartA2Config,
    points_mask: jax.Array = None,
):
    """rpn + seg focal + part smooth-L1 + rcnn losses
    (PartA2_net.get_training_loss)."""
    preds, dec, seg, part = forward(params, points, cfg, points_mask)
    rpn_loss, rpn_logs = second.detection_loss(
        preds, anchors, gt_boxes, gt_valid, cfg.stage1
    )
    fg, part_t = part_targets(dec, gt_boxes, gt_valid, cfg)
    fgf = fg.astype(jnp.float32)
    nfg = jnp.maximum(jnp.sum(fgf), 1.0)
    p = jnp.clip(jax.nn.sigmoid(seg), 1e-7, 1 - 1e-7)
    pt = p * fgf + (1 - p) * (1 - fgf)
    alpha = 0.25 * fgf + 0.75 * (1 - fgf)
    vmask = dec.valid.astype(jnp.float32)
    seg_loss = jnp.sum(
        -alpha * (1 - pt) ** 2 * jnp.log(pt) * vmask
    ) / nfg
    part_loss = jnp.sum(
        detector3d.smooth_l1(part - part_t) * fgf[:, None]
    ) / nfg

    vcfg = _as_vr(cfg)
    rois, _, roi_valid = vr.propose(
        jax.tree_util.tree_map(jax.lax.stop_gradient, preds), anchors, vcfg
    )
    targets = jax.vmap(
        lambda r, rv, g, gv: vr.sample_rois_for_rcnn(r, rv, g, gv, vcfg)
    )(rois, roi_valid, gt_boxes, gt_valid)
    pooled = roi_part_pool(params, dec, seg, part, targets["rois"], cfg)
    rcnn_cls, rcnn_reg = _refine(params, pooled, cfg)
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
        rpn_loss
        + cfg.seg_weight * seg_loss
        + cfg.part_weight * part_loss
        + cfg.rcnn_cls_weight * rcls
        + cfg.rcnn_reg_weight * rreg
        + cfg.rcnn_corner_weight * corner
    )
    return total, {
        **{f"rpn_{k}": v for k, v in rpn_logs.items()},
        "seg": seg_loss, "part": part_loss,
        "rcnn_cls": rcls, "rcnn_reg": rreg, "rcnn_corner": corner,
    }


def _refine(params, pooled, cfg: PartA2Config):
    b, r, _ = pooled.shape
    x = pooled.reshape(b * r, -1)
    x = vr._mlp(x, params, [f"shared{i}" for i in range(len(cfg.shared_fc))])
    hc = vr._mlp(x, params, [f"cls{i}" for i in range(len(cfg.cls_fc))])
    cls = (hc @ params["cls_pred"]["w"] + params["cls_pred"]["b"])[:, 0]
    hr = vr._mlp(x, params, [f"reg{i}" for i in range(len(cfg.reg_fc))])
    reg = hr @ params["reg_pred"]["w"] + params["reg_pred"]["b"]
    return cls.reshape(b, r), reg.reshape(b, r, 7)


@functools.lru_cache(maxsize=8)
def _as_vr_cached(stage1, nms, pre, rois, fg):
    return vr.VoxelRCNNConfig(
        stage1=stage1, proposal_nms_thresh=nms, proposal_pre=pre,
        num_rois=rois, fg_per=fg,
    )


def _as_vr(cfg: PartA2Config) -> vr.VoxelRCNNConfig:
    return _as_vr_cached(
        cfg.stage1, cfg.proposal_nms_thresh, cfg.proposal_pre,
        cfg.num_rois, cfg.fg_per,
    )


def predict(
    params: Dict[str, Any],
    points: jax.Array,
    anchors: jax.Array,
    cfg: PartA2Config,
    score_thr: float = 0.1,
    iou_thr: float = 0.1,
    max_out: int = 128,
    points_mask: jax.Array = None,
) -> List[Dict[str, np.ndarray]]:
    preds, dec, seg, part = forward(params, points, cfg, points_mask)
    vcfg = _as_vr(cfg)
    rois, roi_scores, roi_valid = vr.propose(preds, anchors, vcfg)
    pooled = roi_part_pool(params, dec, seg, part, rois, cfg)
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

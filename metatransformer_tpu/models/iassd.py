"""IA-SSD: instance-aware single-stage point-based 3D detector.

Reference: ``AutonomousDriving/pcdet/models/detectors/IASSD.py`` —
IASSD_Backbone (``backbones_3d/IASSD_backbone.py``: SA layers with
D-FPS then ctr-aware (confidence top-k) downsampling, a Vote_Layer
predicting clipped centroid offsets, and a final SA aggregating around
the votes) + IASSD_Head (``dense_heads/IASSD_head.py``: center cls with
centerness weighting, PointResidual_BinOri_Coder box regression
(``utils/box_coder_utils.py:224-320``), corner + vote + per-SA-layer
instance-aware aux losses). Recipe values from
``tools/cfgs/kitti_models/IA-SSD.yaml``.

TPU-native deltas: fixed-capacity batch-major point sets; ctr-aware
sampling is an exact top-k over predicted foreground scores (the
reference's semantics, already deterministic); ball grouping reuses the
deterministic first-k form (``models/point_rcnn.ball_group_mlp``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.models import detector3d, point_rcnn as prc, voxel_rcnn as vr
from metatransformer_tpu.models.point_rcnn import KITTI_MEAN_SIZES
from metatransformer_tpu.ops import iou3d, point_ops


@dataclasses.dataclass(frozen=True)
class IASSDStage:
    kind: str  # 'sa' | 'vote'
    npoint: int = -1
    sample: str = "d-fps"  # 'd-fps' | 'ctr-aware'
    radii: Tuple[float, ...] = ()
    nsamples: Tuple[int, ...] = ()
    mlps: Tuple[Tuple[int, ...], ...] = ()
    agg: int = 0  # aggregation MLP width (0 = none)
    conf: int = 0  # confidence MLP width (0 = none)
    layer_input: int = -1  # index into the encoder list (-1 = previous)
    ctr_input: int = -1  # SA centers come from this encoder entry
    vote_mlp: Tuple[int, ...] = ()
    max_translate: Tuple[float, float, float] = (3.0, 3.0, 2.0)


# IA-SSD.yaml SA_CONFIG, translated stage by stage
KITTI_STAGES: Tuple[IASSDStage, ...] = (
    IASSDStage("sa", 4096, "d-fps", (0.2, 0.8), (16, 32),
               ((16, 16, 32), (32, 32, 64)), agg=64, layer_input=0),
    IASSDStage("sa", 1024, "d-fps", (0.8, 1.6), (16, 32),
               ((64, 64, 128), (64, 96, 128)), agg=128, conf=128,
               layer_input=1),
    IASSDStage("sa", 512, "ctr-aware", (1.6, 4.8), (16, 32),
               ((128, 128, 256), (128, 256, 256)), agg=256, conf=256,
               layer_input=2),
    IASSDStage("sa", 256, "ctr-aware", layer_input=3, agg=256),
    IASSDStage("vote", layer_input=4, vote_mlp=(128,)),
    IASSDStage("sa", -1, "d-fps", (4.8, 6.4), (16, 32),
               ((256, 256, 512), (256, 512, 1024)), agg=512,
               layer_input=3, ctr_input=5),
)


@dataclasses.dataclass(frozen=True)
class IASSDConfig:
    num_classes: int = 3
    point_features: int = 1
    mean_sizes: Tuple[Tuple[float, float, float], ...] = KITTI_MEAN_SIZES
    stages: Tuple[IASSDStage, ...] = KITTI_STAGES
    angle_bins: int = 12
    cls_fc: Tuple[int, ...] = (256, 256)
    reg_fc: Tuple[int, ...] = (256, 256)
    extra_width: float = 1.0  # ASSIGN_METHOD EXTRA_WIDTH
    # loss weights (IA-SSD.yaml LOSS_CONFIG)
    vote_weight: float = 1.0
    corner_weight: float = 1.0
    ins_aware_weight: float = 1.0
    # post-processing
    score_thresh: float = 0.1
    nms_thresh: float = 0.01
    max_out: int = 128

    @property
    def box_code(self) -> int:
        return 6 + 2 * self.angle_bins


def init(cfg: IASSDConfig, key: jax.Array) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 128))
    params: Dict[str, Any] = {}
    widths = [cfg.point_features]  # channel at each encoder entry
    for si, st in enumerate(cfg.stages):
        cin = widths[st.layer_input]
        if st.kind == "vote":
            stack, c = prc._mlp_stack_init(
                jax.random.split(next(keys), len(st.vote_mlp)), cin, st.vote_mlp
            )
            params[f"vote{si}"] = stack
            params[f"vote{si}_off"] = vr._lin_init(next(keys), c, 3, std=0.001)
            widths.append(cin)  # vote keeps input features
            continue
        c_out = 0
        for gi, mlp in enumerate(st.mlps):
            stack, c = prc._mlp_stack_init(
                jax.random.split(next(keys), len(mlp)), cin + 3, mlp
            )
            params[f"sa{si}_{gi}"] = stack
            c_out += c
        if not st.mlps:
            c_out = cin
        if st.agg:
            params[f"agg{si}"] = vr._lin_init(next(keys), c_out, st.agg)
            c_out = st.agg
        if st.conf:
            params[f"conf{si}"] = vr._lin_init(next(keys), c_out, st.conf)
            params[f"conf{si}_pred"] = vr._lin_init(
                next(keys), st.conf, cfg.num_classes, std=0.01
            )
        widths.append(c_out)
    c_pt = widths[-1]
    stack, c = prc._mlp_stack_init(
        jax.random.split(next(keys), len(cfg.cls_fc)), c_pt, cfg.cls_fc
    )
    params["cls"] = stack
    params["cls_pred"] = vr._lin_init(next(keys), c, cfg.num_classes, std=0.01)
    stack, c = prc._mlp_stack_init(
        jax.random.split(next(keys), len(cfg.reg_fc)), c_pt, cfg.reg_fc
    )
    params["reg"] = stack
    params["reg_pred"] = vr._lin_init(next(keys), c, cfg.box_code, std=0.001)
    return params


# --- BinOri box coder -------------------------------------------------------


def binori_encode(gt, points, classes, cfg: IASSDConfig):
    """PointResidual_BinOri_Coder.encode -> (residuals [N, 6],
    bin_id [N] int, bin_res [N])."""
    ms = jnp.asarray(cfg.mean_sizes)[classes]
    diag = jnp.sqrt(ms[:, 0] ** 2 + ms[:, 1] ** 2)
    res = jnp.stack(
        [
            (gt[:, 0] - points[:, 0]) / diag,
            (gt[:, 1] - points[:, 1]) / diag,
            (gt[:, 2] - points[:, 2]) / ms[:, 2],
            jnp.log(jnp.maximum(gt[:, 3], 1e-5) / ms[:, 0]),
            jnp.log(jnp.maximum(gt[:, 4], 1e-5) / ms[:, 1]),
            jnp.log(jnp.maximum(gt[:, 5], 1e-5) / ms[:, 2]),
        ],
        axis=-1,
    )
    inter = 2 * np.pi / cfg.angle_bins
    rg = jnp.clip(gt[:, 6], -np.pi + 1e-5, np.pi - 1e-5)
    bin_id = jnp.floor((rg + np.pi) / inter).astype(jnp.int32)
    bin_res = ((rg + np.pi) - (bin_id * inter + inter / 2)) / (inter / 2)
    return res, bin_id, bin_res


def binori_decode(enc, points, classes, cfg: IASSDConfig):
    """-> [N, 7] boxes (decode_torch)."""
    ms = jnp.asarray(cfg.mean_sizes)[classes]
    diag = jnp.sqrt(ms[:, 0] ** 2 + ms[:, 1] ** 2)
    nb = cfg.angle_bins
    inter = 2 * np.pi / nb
    bin_id = jnp.argmax(enc[:, 6 : 6 + nb], axis=-1)
    bin_res = jnp.take_along_axis(
        enc[:, 6 + nb :], bin_id[:, None], axis=-1
    )[:, 0]
    rg = bin_id * inter - np.pi + inter / 2 + bin_res * (inter / 2)
    return jnp.stack(
        [
            enc[:, 0] * diag + points[:, 0],
            enc[:, 1] * diag + points[:, 1],
            enc[:, 2] * ms[:, 2] + points[:, 2],
            jnp.exp(enc[:, 3]) * ms[:, 0],
            jnp.exp(enc[:, 4]) * ms[:, 1],
            jnp.exp(enc[:, 5]) * ms[:, 2],
            rg,
        ],
        axis=-1,
    )


# --- backbone ---------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg",))
def forward(
    params: Dict[str, Any],
    points: jax.Array,  # [B, N, 3 + point_features]
    cfg: IASSDConfig,
    points_mask: jax.Array = None,
):
    """-> dict with centers/centers_origin/ctr_offsets [B, M, 3],
    center cls/reg preds, and per-SA-layer instance predictions."""
    if points_mask is None:
        points_mask = jnp.ones(points.shape[:2], bool)
    xyz0 = points[..., :3]
    enc_xyz = [xyz0]
    enc_feat = [points[..., 3:]]
    enc_mask = [points_mask]
    sa_ins: List[Optional[Tuple[jax.Array, jax.Array]]] = []
    last_conf = None
    centers = centers_origin = offsets = None
    for si, st in enumerate(cfg.stages):
        xin = enc_xyz[st.layer_input]
        fin = enc_feat[st.layer_input]
        min_ = enc_mask[st.layer_input]
        if st.kind == "vote":
            h = prc._apply_stack(params[f"vote{si}"], fin)
            off = h @ params[f"vote{si}_off"]["w"] + params[f"vote{si}_off"]["b"]
            limit = jnp.asarray(st.max_translate)
            off = jnp.clip(off, -limit, limit)
            centers_origin = xin
            centers = xin + off
            offsets = off
            enc_xyz.append(centers)
            enc_feat.append(fin)
            enc_mask.append(min_)
            continue
        # pick centers
        if st.ctr_input >= 0:
            ctr = enc_xyz[st.ctr_input]
            ctr_mask = enc_mask[st.ctr_input]
        elif st.sample == "ctr-aware":
            # top-npoint by predicted foreground score (ctr_aware)
            assert last_conf is not None
            score = jnp.max(jax.nn.sigmoid(last_conf), axis=-1)
            score = jnp.where(min_, score, -1.0)
            _, idx = jax.lax.top_k(score, st.npoint)
            ctr = jax.vmap(lambda p, i: p[i])(xin, idx)
            ctr_mask = jax.vmap(lambda m, i: m[i])(min_, idx)
        else:  # d-fps
            idx = point_ops.masked_fps(xin, min_, st.npoint)
            ctr = jax.vmap(lambda p, i: p[i])(xin, idx)
            ctr_mask = jax.vmap(lambda m, i: m[i])(min_, idx)
        # group + aggregate
        if st.mlps:
            groups = [
                prc.ball_group_mlp(
                    ctr, xin, fin, min_, r, ns, params[f"sa{si}_{gi}"]
                )
                for gi, (r, ns) in enumerate(zip(st.radii, st.nsamples))
            ]
            feat = jnp.concatenate(groups, axis=-1)
        else:  # sampling-only stage: carry the gathered features
            feat = jax.vmap(lambda f, i: f[i])(fin, idx)
        if st.agg:
            p = params[f"agg{si}"]
            feat = jax.nn.relu(feat @ p["w"] + p["b"])
        if st.conf:
            p = params[f"conf{si}"]
            h = jax.nn.relu(feat @ p["w"] + p["b"])
            pp = params[f"conf{si}_pred"]
            last_conf = h @ pp["w"] + pp["b"]
            sa_ins.append((ctr, last_conf))
        enc_xyz.append(ctr)
        enc_feat.append(feat)
        enc_mask.append(ctr_mask)

    center_feat = enc_feat[-1]
    h = prc._apply_stack(params["cls"], center_feat)
    cls = h @ params["cls_pred"]["w"] + params["cls_pred"]["b"]
    h = prc._apply_stack(params["reg"], center_feat)
    reg = h @ params["reg_pred"]["w"] + params["reg_pred"]["b"]
    return {
        "centers": centers,
        "centers_origin": centers_origin,
        "ctr_offsets": offsets,
        "center_cls": cls,  # [B, M, K]
        "center_reg": reg,  # [B, M, 6 + 2*bins]
        "sa_ins": sa_ins,  # [(xyz, logits)] for confidence layers
        "center_mask": enc_mask[-1],
    }


# --- targets / losses -------------------------------------------------------


def centerness(points: jax.Array, boxes: jax.Array) -> jax.Array:
    """IASSD_head.generate_center_ness_mask: cube-root of the product of
    min/max front-back, left-right, up-down distance ratios in the box
    frame. points/boxes row-aligned [N, 3] / [N, 7] -> [N]."""
    local = vr.rotate_z(points - boxes[:, :3], -boxes[:, 6])
    half = boxes[:, 3:6] / 2
    d_pos = half - local  # distance to +faces
    d_neg = half + local  # distance to -faces
    ratio = (
        (jnp.minimum(d_pos, d_neg) / jnp.maximum(jnp.maximum(d_pos, d_neg), 1e-6))
        .clip(0.0)
        .prod(axis=-1)
    )
    return jnp.cbrt(jnp.maximum(ratio, 1e-8))


def assign_center_targets(
    origin: jax.Array,  # [B, M, 3] centers_origin
    gt_boxes: jax.Array,
    gt_labels: jax.Array,
    gt_valid: jax.Array,
    cfg: IASSDConfig,
):
    """'extend_gt' + ASSIGN_TYPE=centers_origin: labels from the pre-vote
    positions inside the enlarged gt; box targets from the matched gt."""
    from metatransformer_tpu.ops import roi_pool3d

    grown = jnp.concatenate(
        [gt_boxes[..., :3], gt_boxes[..., 3:6] + 2 * cfg.extra_width,
         gt_boxes[..., 6:]], axis=-1,
    )
    inside = roi_pool3d.points_in_boxes(origin, grown) & gt_valid[:, :, None]
    fg = jnp.any(inside, axis=1)
    gt_idx = jnp.argmax(inside, axis=1)
    cls = jnp.take_along_axis(gt_labels, gt_idx, axis=1)
    box = jnp.take_along_axis(gt_boxes, gt_idx[..., None], axis=1)
    return fg, cls, box


def training_loss(
    params: Dict[str, Any],
    points: jax.Array,
    gt_boxes: jax.Array,
    gt_labels: jax.Array,
    gt_valid: jax.Array,
    cfg: IASSDConfig,
    points_mask: jax.Array = None,
):
    """center cls (centerness-weighted) + binori box + corner + vote +
    per-SA instance-aware aux losses (IASSD_head.get_loss)."""
    out = forward(params, points, cfg, points_mask)
    b, m, _ = out["centers"].shape
    fg, cls_t, box_t = assign_center_targets(
        out["centers_origin"], gt_boxes, gt_labels, gt_valid, cfg
    )
    fg = fg & out["center_mask"]
    fgf = fg.astype(jnp.float32)
    nfg = jnp.maximum(jnp.sum(fgf), 1.0)

    # centerness-weighted one-hot CE over sigmoid cls
    ctr_ness = jax.vmap(centerness)(
        out["centers_origin"].reshape(b, m, 3), box_t
    )
    onehot = jax.nn.one_hot(cls_t, cfg.num_classes) * fgf[..., None]
    onehot = onehot * ctr_ness[..., None]
    p = jnp.clip(jax.nn.sigmoid(out["center_cls"]), 1e-7, 1 - 1e-7)
    ce = -(onehot * jnp.log(p) + (1 - onehot) * jnp.log(1 - p))
    cls_loss = jnp.sum(ce) / nfg

    # box: smooth-L1 residuals + bin CE + bin residual
    res_t, bin_t, binres_t = jax.vmap(
        lambda g, x, c: binori_encode(g, x, c, cfg)
    )(box_t, out["centers"], cls_t)
    reg = out["center_reg"]
    nb = cfg.angle_bins
    res_loss = jnp.sum(
        detector3d.smooth_l1(reg[..., :6] - res_t) * fgf[..., None]
    ) / nfg
    bin_logits = reg[..., 6 : 6 + nb]
    bin_ce = -jnp.take_along_axis(
        jax.nn.log_softmax(bin_logits), bin_t[..., None], axis=-1
    )[..., 0]
    bin_loss = jnp.sum(bin_ce * fgf) / nfg
    binres_p = jnp.take_along_axis(reg[..., 6 + nb :], bin_t[..., None], -1)[..., 0]
    binres_loss = jnp.sum(
        detector3d.smooth_l1(binres_p - binres_t) * fgf
    ) / nfg

    # corner loss on decoded fg boxes
    dec = jax.vmap(lambda e, x, c: binori_decode(e, x, c, cfg))(
        reg, out["centers"], cls_t
    )
    corner = jnp.sum(jax.vmap(vr.corner_loss)(dec, box_t) * fgf) / nfg

    # vote loss: votes should land on gt centers (fg only)
    vote = jnp.sum(
        detector3d.smooth_l1(out["centers"] - box_t[..., :3]) * fgf[..., None]
    ) / nfg

    # instance-aware aux losses on confidence layers
    ins_losses = []
    for xyz_l, logits in out["sa_ins"]:
        fg_l, cls_l, _ = assign_center_targets(
            xyz_l, gt_boxes, gt_labels, gt_valid,
            dataclasses.replace(cfg, extra_width=0.0),
        )
        oh = jax.nn.one_hot(cls_l, cfg.num_classes) * fg_l[..., None]
        pl = jnp.clip(jax.nn.sigmoid(logits), 1e-7, 1 - 1e-7)
        pt = pl * oh + (1 - pl) * (1 - oh)
        al = 0.25 * oh + 0.75 * (1 - oh)
        ins = jnp.sum(-al * (1 - pt) ** 2 * jnp.log(pt)) / jnp.maximum(
            jnp.sum(fg_l), 1.0
        )
        ins_losses.append(ins)
    ins_loss = sum(ins_losses) / max(len(ins_losses), 1)

    total = (
        cls_loss + res_loss + bin_loss + binres_loss
        + cfg.corner_weight * corner
        + cfg.vote_weight * vote
        + cfg.ins_aware_weight * ins_loss
    )
    return total, {
        "cls": cls_loss, "res": res_loss, "bin": bin_loss,
        "corner": corner, "vote": vote, "ins": ins_loss,
    }


def predict(
    params: Dict[str, Any],
    points: jax.Array,
    cfg: IASSDConfig,
    points_mask: jax.Array = None,
) -> List[Dict[str, np.ndarray]]:
    """Single-stage decode + rotated NMS (IASSD post_processing)."""
    out = forward(params, points, cfg, points_mask)
    res = []
    for i in range(points.shape[0]):
        probs = jax.nn.sigmoid(out["center_cls"][i])
        scores = jnp.max(probs, axis=-1) * out["center_mask"][i]
        labels = jnp.argmax(probs, axis=-1)
        boxes = binori_decode(out["center_reg"][i], out["centers"][i], labels, cfg)
        scores = jnp.where(scores >= cfg.score_thresh, scores, 0.0)
        sel, valid = iou3d.nms_bev(
            boxes, scores, cfg.nms_thresh, min(cfg.max_out, boxes.shape[0])
        )
        valid = valid & (scores[sel] > 0)
        res.append(
            {
                "boxes": np.asarray(boxes[sel]),
                "scores": np.asarray(scores[sel]),
                "labels": np.asarray(labels[sel]),
                "valid": np.asarray(valid),
            }
        )
    return res

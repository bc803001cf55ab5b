"""PointPillars-style 3D detector: the pcdet slice, TPU-native.

Reference: ``AutonomousDriving/pcdet`` — ``Detector3DTemplate`` module
topology [vfe, map_to_bev, backbone_2d, dense_head]
(``detectors/detector3d_template.py:23-50``) instantiated as PointPillar
(``detectors/pointpillar.py``): PillarVFE -> PointPillarScatter ->
BaseBEVBackbone (downsample blocks + transposed-conv ups + concat,
``backbones_2d/base_bev_backbone.py``) -> AnchorHeadSingle (cls / 7-dof
box residual / direction bins, ``dense_heads/anchor_head_single.py``)
with the ResidualCoder box encoding (``utils/box_coder_utils.py``),
focal cls + smooth-L1 reg + dir CE losses, sigmoid + rotated NMS predict.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.models.vit_adapter import conv2d, group_norm
from metatransformer_tpu.ops import iou3d, voxelize


@dataclasses.dataclass(frozen=True)
class AnchorConfig:
    """Per-class anchor generation; entry i of each tuple = class i
    (pcdet ANCHOR_GENERATOR_CONFIG, tools/cfgs/kitti_models/pointpillar.yaml)."""

    sizes: Tuple[Tuple[float, float, float], ...] = ((3.9, 1.6, 1.56),)  # car
    rotations: Tuple[float, ...] = (0.0, 1.5708)
    z_centers: Tuple[float, ...] = (-1.0,)
    matched_thrs: Tuple[float, ...] = (0.6,)
    unmatched_thrs: Tuple[float, ...] = (0.45,)

    @property
    def per_cell(self) -> int:
        return len(self.sizes) * len(self.rotations)

    @property
    def num_classes(self) -> int:
        return len(self.sizes)

    @property
    def z_center(self) -> float:  # single-class convenience
        return self.z_centers[0]


# KITTI car/pedestrian/cyclist (pointpillar.yaml anchor table)
KITTI_3CLASS = AnchorConfig(
    sizes=((3.9, 1.6, 1.56), (0.8, 0.6, 1.73), (1.76, 0.6, 1.73)),
    rotations=(0.0, 1.5708),
    z_centers=(-1.78, -0.6, -0.6),
    matched_thrs=(0.6, 0.5, 0.5),
    unmatched_thrs=(0.45, 0.35, 0.35),
)


@dataclasses.dataclass(frozen=True)
class Detector3DConfig:
    vfe: voxelize.PillarVFEConfig = voxelize.PillarVFEConfig()
    bev_channels: Tuple[int, ...] = (64, 128, 256)
    bev_strides: Tuple[int, ...] = (2, 2, 2)
    up_channels: int = 128
    anchors: AnchorConfig = AnchorConfig()
    num_classes: int = 1
    dir_bins: int = 2

    @property
    def feature_stride(self) -> int:
        return self.bev_strides[0]  # all ups return to first-block stride

    @property
    def box_code(self) -> int:
        return 7


# --- ResidualCoder (pcdet box_coder_utils.ResidualCoder) -------------------


def encode_boxes(boxes: jax.Array, anchors: jax.Array) -> jax.Array:
    xa, ya, za, dxa, dya, dza, ra = jnp.split(anchors, 7, axis=-1)
    xg, yg, zg, dxg, dyg, dzg, rg = jnp.split(boxes, 7, axis=-1)
    diag = jnp.sqrt(dxa**2 + dya**2)
    return jnp.concatenate(
        [
            (xg - xa) / diag,
            (yg - ya) / diag,
            (zg - za) / dza,
            jnp.log(dxg / dxa),
            jnp.log(dyg / dya),
            jnp.log(dzg / dza),
            rg - ra,
        ],
        axis=-1,
    )


def decode_boxes(deltas: jax.Array, anchors: jax.Array) -> jax.Array:
    xa, ya, za, dxa, dya, dza, ra = jnp.split(anchors, 7, axis=-1)
    dx, dy, dz, ddx, ddy, ddz, dr = jnp.split(deltas, 7, axis=-1)
    diag = jnp.sqrt(dxa**2 + dya**2)
    return jnp.concatenate(
        [
            dx * diag + xa,
            dy * diag + ya,
            dz * dza + za,
            jnp.exp(ddx) * dxa,
            jnp.exp(ddy) * dya,
            jnp.exp(ddz) * dza,
            dr + ra,
        ],
        axis=-1,
    )


def generate_anchors(cfg: Detector3DConfig) -> np.ndarray:
    """Dense anchor grid at the BEV feature stride -> [A_total, 7].
    Per-cell order = sizes (classes) x rotations; per-class z centers."""
    vcfg = cfg.vfe.voxel
    nx, ny, _ = vcfg.grid_size
    fx, fy = nx // cfg.feature_stride, ny // cfg.feature_stride
    r = vcfg.pc_range
    xs = np.linspace(r[0], r[3], fx, endpoint=False) + (r[3] - r[0]) / fx / 2
    ys = np.linspace(r[1], r[4], fy, endpoint=False) + (r[4] - r[1]) / fy / 2
    out = []
    for y in ys:
        for x in xs:
            for ci, (l, w, h) in enumerate(cfg.anchors.sizes):
                for rot in cfg.anchors.rotations:
                    out.append([x, y, cfg.anchors.z_centers[ci], l, w, h, rot])
    return np.asarray(out, np.float32)


def anchor_class_ids(acfg: AnchorConfig, total: int) -> np.ndarray:
    """Class index of each anchor in generate_anchors order -> [A_total]."""
    nrot = len(acfg.rotations)
    return (np.arange(total) // nrot) % len(acfg.sizes)


# --- BEV backbone -----------------------------------------------------------


def _bev_block_init(key, cin, cout, n_convs=3):
    keys = jax.random.split(key, n_convs)
    blocks = []
    for i, k in enumerate(keys):
        c_in = cin if i == 0 else cout
        blocks.append(
            {
                "w": jax.random.normal(k, (3, 3, c_in, cout))
                * np.sqrt(2.0 / (9 * c_in)),
                "gn_scale": jnp.ones((cout,)),
                "gn_bias": jnp.zeros((cout,)),
            }
        )
    return blocks


def init(cfg: Detector3DConfig, key: jax.Array) -> Dict[str, Any]:
    keys = jax.random.split(key, 12)
    params: Dict[str, Any] = {
        "vfe": voxelize.pillar_vfe_init(cfg.vfe, keys[0]),
    }
    cin = cfg.vfe.channels
    for i, cout in enumerate(cfg.bev_channels):
        params[f"block{i}"] = _bev_block_init(keys[1 + i], cin, cout)
        params[f"up{i}"] = {
            "w": jax.random.normal(keys[4 + i], (1, 1, cout, cfg.up_channels))
            * (cout**-0.5),
            "gn_scale": jnp.ones((cfg.up_channels,)),
            "gn_bias": jnp.zeros((cfg.up_channels,)),
        }
        cin = cout
    c_head_in = cfg.up_channels * len(cfg.bev_channels)
    a = cfg.anchors.per_cell
    params["cls_w"] = jax.random.normal(
        keys[8], (1, 1, c_head_in, a * cfg.num_classes)
    ) * 1e-2
    # focal-loss prior init: p ~ 0.01
    params["cls_b"] = jnp.full((a * cfg.num_classes,), -np.log(99.0), jnp.float32)
    params["box_w"] = jax.random.normal(
        keys[9], (1, 1, c_head_in, a * cfg.box_code)
    ) * 1e-3
    params["box_b"] = jnp.zeros((a * cfg.box_code,), jnp.float32)
    params["dir_w"] = jax.random.normal(
        keys[10], (1, 1, c_head_in, a * cfg.dir_bins)
    ) * 1e-2
    params["dir_b"] = jnp.zeros((a * cfg.dir_bins,), jnp.float32)
    return params


def _bev_backbone(params, x, cfg: Detector3DConfig):
    ups = []
    target_hw = None
    for i, (cout, stride) in enumerate(zip(cfg.bev_channels, cfg.bev_strides)):
        for j, blk in enumerate(params[f"block{i}"]):
            s = stride if j == 0 else 1
            x = conv2d(x, blk["w"], stride=s)
            x = jax.nn.relu(group_norm(x, blk["gn_scale"], blk["gn_bias"]))
        up = params[f"up{i}"]
        u = conv2d(x, up["w"])
        u = jax.nn.relu(group_norm(u, up["gn_scale"], up["gn_bias"]))
        if target_hw is None:
            target_hw = u.shape[1:3]
        elif u.shape[1:3] != target_hw:
            b, _, _, c = u.shape
            u = jax.image.resize(u, (b, *target_hw, c), "bilinear")
        ups.append(u)
    return jnp.concatenate(ups, axis=-1)


@functools.partial(jax.jit, static_argnames=("cfg",))
def forward(
    params: Dict[str, Any],
    points: jax.Array,  # [B, N, in_features]
    cfg: Detector3DConfig,
    points_mask: jax.Array = None,
) -> Dict[str, jax.Array]:
    """points -> {cls_logits [B, A, C], box_deltas [B, A, 7],
    dir_logits [B, A, bins]} over the dense anchor grid."""
    bev = voxelize.pillar_vfe_apply(params["vfe"], points, cfg.vfe, points_mask)
    feat = _bev_backbone(params, bev, cfg)
    b = feat.shape[0]
    a = cfg.anchors.per_cell
    cls = conv2d(feat, params["cls_w"], params["cls_b"])
    box = conv2d(feat, params["box_w"], params["box_b"])
    dirc = conv2d(feat, params["dir_w"], params["dir_b"])
    return {
        "cls_logits": cls.reshape(b, -1, cfg.num_classes),
        "box_deltas": box.reshape(b, -1, cfg.box_code),
        "dir_logits": dirc.reshape(b, -1, cfg.dir_bins),
    }


# --- target assignment + losses ---------------------------------------------


def assign_targets(
    anchors: jax.Array,  # [A, 7]
    gt_boxes: jax.Array,  # [G, 7] (zero rows = padding)
    gt_valid: jax.Array,  # [G]
    matched_thr: float | jax.Array = 0.6,  # scalar or per-anchor [A]
    unmatched_thr: float | jax.Array = 0.45,
    gt_labels: jax.Array | None = None,  # [G] class ids
    anchor_cls: jax.Array | None = None,  # [A] class ids
):
    """BEV-IoU anchor assignment (AxisAlignedTargetAssigner semantics):
    each class's anchors are matched only against that class's gt boxes,
    with per-class matched/unmatched thresholds.

    -> (labels [A] in {-1 ignore, 0 bg, 1 fg}, matched_gt_idx [A])."""
    iou = iou3d.boxes_iou3d(anchors, gt_boxes)  # [A, G]
    keep = gt_valid[None, :]
    if gt_labels is not None and anchor_cls is not None:
        keep = keep & (gt_labels[None, :] == anchor_cls[:, None])
    iou = jnp.where(keep, iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)
    labels = jnp.where(
        best_iou >= matched_thr, 1, jnp.where(best_iou < unmatched_thr, 0, -1)
    )
    # force-match the best (class-compatible) anchor of each VALID gt
    any_compat = jnp.any(keep, axis=0)
    best_anchor = jnp.argmax(iou, axis=0)  # [G]
    force = gt_valid & any_compat
    labels = labels.at[best_anchor].set(
        jnp.where(force, 1, labels[best_anchor])
    )
    best_gt = best_gt.at[best_anchor].set(
        jnp.where(force, jnp.arange(gt_boxes.shape[0]), best_gt[best_anchor])
    )
    return labels, best_gt


def smooth_l1(x: jax.Array, beta: float = 1.0 / 9.0) -> jax.Array:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax**2 / beta, ax - 0.5 * beta)


def detection_loss(
    preds: Dict[str, jax.Array],
    anchors: jax.Array,
    gt_boxes: jax.Array,  # [B, G, 7]
    gt_valid: jax.Array,  # [B, G]
    cfg: Detector3DConfig,
    cls_weight: float = 1.0,
    box_weight: float = 2.0,
    dir_weight: float = 0.2,
    gt_labels: jax.Array = None,  # [B, G] class ids (multi-class)
):
    """Focal cls + smooth-L1 box + dir-bin CE (anchor_head losses).
    Multi-class: per-class anchor assignment with per-class thresholds;
    one-hot focal targets over [A, num_classes] sigmoid outputs."""
    a_total = anchors.shape[0]
    multiclass = cfg.num_classes > 1
    if gt_labels is None:
        gt_labels = jnp.zeros(gt_valid.shape, jnp.int32)
    acls = jnp.asarray(anchor_class_ids(cfg.anchors, a_total))
    m_thr = jnp.asarray(cfg.anchors.matched_thrs, jnp.float32)[acls]
    u_thr = jnp.asarray(cfg.anchors.unmatched_thrs, jnp.float32)[acls]

    def per_sample(cls_logits, box_deltas, dir_logits, gt, gv, gl):
        labels, gt_idx = assign_targets(
            anchors, gt, gv, m_thr, u_thr,
            gt_labels=gl if multiclass else None,
            anchor_cls=acls if multiclass else None,
        )
        fg = labels == 1
        valid = labels >= 0
        # focal loss (alpha .25 gamma 2), one-hot over num_classes
        p = jax.nn.sigmoid(cls_logits)  # [A, C]
        t = (
            jax.nn.one_hot(gl[gt_idx], cfg.num_classes)
            * fg[:, None].astype(jnp.float32)
        )
        pt = p * t + (1 - p) * (1 - t)
        alpha_t = 0.25 * t + 0.75 * (1 - t)
        ce = -jnp.log(jnp.clip(pt, 1e-7))
        cls_loss = jnp.sum(
            alpha_t * (1 - pt) ** 2 * ce * valid[:, None]
        ) / jnp.maximum(jnp.sum(fg), 1.0)
        matched = gt[gt_idx]
        # background/pad rows may hold zero-size boxes: encode would emit
        # log(0) = -inf and 0 * inf = NaN through the fg mask — substitute
        # the anchor itself (delta 0) for non-foreground rows
        matched = jnp.where(fg[:, None], matched, anchors)
        target_deltas = encode_boxes(matched, anchors)
        # sin-difference trick for heading (pcdet add_sin_difference)
        pr, tr = box_deltas[:, 6], target_deltas[:, 6]
        box_err = jnp.concatenate(
            [
                box_deltas[:, :6] - target_deltas[:, :6],
                (jnp.sin(pr - tr))[:, None],
            ],
            axis=-1,
        )
        box_loss = jnp.sum(
            smooth_l1(box_err) * fg[:, None]
        ) / jnp.maximum(jnp.sum(fg), 1.0)
        # direction bins from gt heading
        dir_target = (jnp.floor(matched[:, 6] / jnp.pi) % cfg.dir_bins).astype(
            jnp.int32
        )
        dir_ce = -jax.nn.log_softmax(dir_logits)[
            jnp.arange(dir_logits.shape[0]), dir_target
        ]
        dir_loss = jnp.sum(dir_ce * fg) / jnp.maximum(jnp.sum(fg), 1.0)
        return cls_loss, box_loss, dir_loss

    cl, bl, dl = jax.vmap(per_sample)(
        preds["cls_logits"], preds["box_deltas"], preds["dir_logits"],
        gt_boxes, gt_valid, gt_labels,
    )
    total = cls_weight * cl.mean() + box_weight * bl.mean() + dir_weight * dl.mean()
    return total, {"cls": cl.mean(), "box": bl.mean(), "dir": dl.mean()}


def predict(
    preds: Dict[str, jax.Array],
    anchors: jax.Array,
    cfg: Detector3DConfig,
    score_thr: float = 0.1,
    iou_thr: float = 0.5,
    max_out: int = 128,
    nms_pre: int = 1024,
) -> List[Dict[str, np.ndarray]]:
    """Post-processing: sigmoid -> top-`nms_pre` pre-selection (pcdet
    NMS_PRE_MAXSIZE) -> decode -> rotated NMS. Without pre-selection the
    [N, N] rotated-overlap matrix over the full 100k+ anchor grid is
    intractable."""
    out = []
    for b in range(preds["cls_logits"].shape[0]):
        probs = jax.nn.sigmoid(preds["cls_logits"][b])  # [A, C]
        # pcdet default post-processing (MULTI_CLASSES_NMS=False):
        # score = max over classes, label = argmax, one shared NMS pass
        scores_all = jnp.max(probs, axis=-1)
        labels_all = jnp.argmax(probs, axis=-1)
        k = min(nms_pre, scores_all.shape[0])
        top_scores, top_idx = jax.lax.top_k(scores_all, k)
        boxes = decode_boxes(preds["box_deltas"][b][top_idx], anchors[top_idx])
        dir_bin = jnp.argmax(preds["dir_logits"][b][top_idx], axis=-1)
        boxes = boxes.at[:, 6].add(jnp.pi * dir_bin)  # dir refinement
        scores = jnp.where(top_scores >= score_thr, top_scores, 0.0)
        idx, valid = iou3d.nms_bev(boxes, scores, iou_thr, max_out)
        valid = valid & (scores[idx] > 0)
        out.append(
            {
                "boxes": np.asarray(boxes[idx]),
                "scores": np.asarray(scores[idx]),
                "labels": np.asarray(labels_all[top_idx][idx]),
                "valid": np.asarray(valid),
            }
        )
    return out

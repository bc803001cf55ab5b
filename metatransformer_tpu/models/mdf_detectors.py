"""MDF-wired detectors: per-dataset UniNorm + domain attention inside the
SECOND / CenterPoint backbones — the reason the 3DTrans fork exists.

Reference composition (joint Waymo+nuScenes training):
* ``pcdet/utils/uni3d_norm.py:230,301,372`` — ``UniNorm{1,2,3}d`` keeps one
  BN per dataset and switches on ``dataset_from_flag``; used by every norm
  in ``backbones_3d/spconv_backbone_unibn.py:73`` and
  ``backbones_2d/base_bev_backbone.py:45``.
* ``pcdet/models/mdf_models/dense_cr.py:108-148`` — SE-style per-dataset
  adapters mixed by a learned softmax router in the dense (BEV) blocks.
* ``models/__init__.py:27,34`` ``build_network_multi_db{,_3}`` +
  ``tools/cfgs/MDF/waymo_nusc/*_domain_attention.yaml``.

TPU-native: per-dataset norm affines are STACKED on a leading axis and
gathered by a traced ``dataset_id`` scalar — one compiled executable
serves every dataset (no per-dataset module copies, no Python branching).
The batch statistics themselves need no switch: each step's batch comes
from a single dataset, so masked batch stats are per-dataset by
construction (matching UniNorm's separate running stats at train time).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from metatransformer_tpu.models import centerpoint as cp
from metatransformer_tpu.models import detector3d, second
from metatransformer_tpu.models import mdf
from metatransformer_tpu.models.vit_adapter import conv2d, group_norm
from metatransformer_tpu.ops import sparse_conv as sp

_STACKED_KEYS = ("bn_scale", "bn_bias", "gn_scale", "gn_bias")


def stack_norm_affines(params: Any, num_datasets: int) -> Any:
    """Replace every norm affine [C] with per-dataset copies [D, C]
    (UniNorm: shared conv weights, dataset-specific norm parameters)."""

    def rec(p):
        if isinstance(p, dict):
            return {
                k: (
                    jnp.tile(v[None], (num_datasets, 1))
                    if k in _STACKED_KEYS
                    else rec(v)
                )
                for k, v in p.items()
            }
        if isinstance(p, list):
            return [rec(v) for v in p]
        return p

    return rec(params)


def select_dataset(params: Any, dataset_id: jax.Array) -> Any:
    """Gather one dataset's affines -> a plain (unstacked) param tree the
    base detector forwards consume. ``dataset_id`` may be traced."""

    def rec(p):
        if isinstance(p, dict):
            return {
                k: (v[dataset_id] if k in _STACKED_KEYS else rec(v))
                for k, v in p.items()
            }
        if isinstance(p, list):
            return [rec(v) for v in p]
        return p

    return rec(params)


# ---------------------------------------------------------------------------
# MDF SECOND
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MDFSECONDConfig:
    base: second.SECONDConfig = second.SECONDConfig()
    num_datasets: int = 2
    domain_attention: bool = True
    reduction: int = 8

    def dattn(self) -> mdf.DomainAttentionConfig:
        return mdf.DomainAttentionConfig(
            self.base.up_channels, self.num_datasets, self.reduction
        )


def init(cfg: MDFSECONDConfig, key: jax.Array) -> Dict[str, Any]:
    k1, k2 = jax.random.split(key)
    params = stack_norm_affines(second.init(cfg.base, k1), cfg.num_datasets)
    if cfg.domain_attention:
        for i, kd in enumerate(
            jax.random.split(k2, len(cfg.base.bev_channels))
        ):
            params[f"dattn{i}"] = mdf.domain_attention_init(cfg.dattn(), kd)
    return params


def _bev_backbone_da(params, sel, x, bev_channels, bev_strides, dattn_cfg):
    """detector3d._bev_backbone with domain attention on each up branch
    (dense_cr.py placement: recalibration inside the dense blocks)."""
    ups = []
    target_hw = None
    for i, (cout, stride) in enumerate(zip(bev_channels, bev_strides)):
        for j, blk in enumerate(sel[f"block{i}"]):
            s = stride if j == 0 else 1
            x = conv2d(x, blk["w"], stride=s)
            x = jax.nn.relu(group_norm(x, blk["gn_scale"], blk["gn_bias"]))
        up = sel[f"up{i}"]
        u = conv2d(x, up["w"])
        u = jax.nn.relu(group_norm(u, up["gn_scale"], up["gn_bias"]))
        if dattn_cfg is not None:
            u = mdf.domain_attention_apply(params[f"dattn{i}"], u, dattn_cfg)
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
    points: jax.Array,  # [B, P, point_features]
    cfg: MDFSECONDConfig,
    dataset_id: jax.Array,  # traced scalar int
    points_mask: jax.Array = None,
) -> Dict[str, jax.Array]:
    """Same contract as second.forward, plus the dataset switch."""
    base = cfg.base
    if points_mask is None:
        points_mask = jnp.ones(points.shape[:2], bool)
    sel = select_dataset(params, dataset_id)
    st = sp.voxelize_points(
        points, points_mask, base.voxel_size, base.pc_range,
        base.spatial_shape, base.max_voxels,
    )
    st = second.voxel_backbone_8x(sel, st)
    bev = second.height_compression(st)
    feat = _bev_backbone_da(
        params, sel, bev, base.bev_channels, base.bev_strides,
        cfg.dattn() if cfg.domain_attention else None,
    )
    b = feat.shape[0]
    cls = conv2d(feat, sel["cls_w"], sel["cls_b"])
    box = conv2d(feat, sel["box_w"], sel["box_b"])
    dirc = conv2d(feat, sel["dir_w"], sel["dir_b"])
    return {
        "cls_logits": cls.reshape(b, -1, base.num_classes),
        "box_deltas": box.reshape(b, -1, base.box_code),
        "dir_logits": dirc.reshape(b, -1, base.dir_bins),
    }


def training_loss(
    params: Dict[str, Any],
    points: jax.Array,
    gt_boxes: jax.Array,
    gt_valid: jax.Array,
    anchors: jax.Array,
    cfg: MDFSECONDConfig,
    dataset_id: jax.Array,
    points_mask: jax.Array = None,
):
    preds = forward(params, points, cfg, dataset_id, points_mask)
    return second.detection_loss(preds, anchors, gt_boxes, gt_valid, cfg.base)


# ---------------------------------------------------------------------------
# MDF CenterPoint (same machinery over the residual sparse backbone)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MDFCenterPointConfig:
    base: cp.CenterPointConfig = cp.CenterPointConfig()
    num_datasets: int = 2
    domain_attention: bool = True
    reduction: int = 8

    def dattn(self) -> mdf.DomainAttentionConfig:
        return mdf.DomainAttentionConfig(
            self.base.up_channels, self.num_datasets, self.reduction
        )


def init_centerpoint(cfg: MDFCenterPointConfig, key: jax.Array) -> Dict[str, Any]:
    k1, k2 = jax.random.split(key)
    params = stack_norm_affines(cp.init(cfg.base, k1), cfg.num_datasets)
    if cfg.domain_attention:
        for i, kd in enumerate(
            jax.random.split(k2, len(cfg.base.bev_channels))
        ):
            params[f"dattn{i}"] = mdf.domain_attention_init(cfg.dattn(), kd)
    return params


@functools.partial(jax.jit, static_argnames=("cfg",))
def forward_centerpoint(
    params: Dict[str, Any],
    points: jax.Array,
    cfg: MDFCenterPointConfig,
    dataset_id: jax.Array,
    points_mask: jax.Array = None,
) -> Dict[str, jax.Array]:
    base = cfg.base
    if points_mask is None:
        points_mask = jnp.ones(points.shape[:2], bool)
    sel = select_dataset(params, dataset_id)
    st = sp.voxelize_points(
        points, points_mask, base.voxel_size, base.pc_range,
        base.spatial_shape, base.max_voxels,
    )
    st = cp.voxel_res_backbone_8x(sel, st)
    bev = second.height_compression(st)
    feat = _bev_backbone_da(
        params, sel, bev, base.bev_channels, base.bev_strides,
        cfg.dattn() if cfg.domain_attention else None,
    )
    return cp.center_head(sel, feat, base)


def training_loss_centerpoint(
    params: Dict[str, Any],
    points: jax.Array,
    gt_boxes: jax.Array,
    gt_labels: jax.Array,
    gt_valid: jax.Array,
    cfg: MDFCenterPointConfig,
    dataset_id: jax.Array,
    points_mask: jax.Array = None,
):
    preds = forward_centerpoint(params, points, cfg, dataset_id, points_mask)
    return cp.detection_loss(preds, gt_boxes, gt_labels, gt_valid, cfg.base)

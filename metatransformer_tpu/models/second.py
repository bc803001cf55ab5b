"""SECOND: sparse-voxel 3D detector (the pcdet VoxelBackBone8x family).

Reference: ``AutonomousDriving/pcdet/models/detectors/second_net.py``
with module topology MeanVFE -> VoxelBackBone8x (spconv) ->
HeightCompression -> BaseBEVBackbone -> AnchorHeadSingle
(``backbones_3d/spconv_backbone.py:70-…``,
``backbones_2d/map_to_bev/height_compression.py``).

TPU-native: voxelization + mean-VFE is one jittable op over fixed-
capacity voxel lists; all sparse convs run on the gather/matmul engine in
``ops/sparse_conv.py`` (see its docstring for the spconv deltas); the
BEV backbone / anchor head / losses / NMS are shared with the
PointPillars detector (``models/detector3d.py``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.models import detector3d
from metatransformer_tpu.models.detector3d import (  # noqa: F401 (re-export)
    AnchorConfig,
    detection_loss,
    predict,
)
from metatransformer_tpu.ops import sparse_conv as sp


@dataclasses.dataclass(frozen=True)
class SECONDConfig:
    # KITTI geometry (tools/cfgs/kitti_models/second.yaml)
    voxel_size: Tuple[float, float, float] = (0.05, 0.05, 0.1)
    pc_range: Tuple[float, ...] = (0.0, -40.0, -3.0, 70.4, 40.0, 1.0)
    spatial_shape: Tuple[int, int, int] = (41, 1600, 1408)  # (D, H=ny, W=nx)
    max_voxels: int = 16000
    point_features: int = 4  # xyz + intensity
    # VoxelBackBone8x channel plan (spconv_backbone.py:78-118)
    widths: Tuple[int, ...] = (16, 16, 32, 64, 64, 128)
    bev_channels: Tuple[int, ...] = (128, 256)
    bev_strides: Tuple[int, ...] = (1, 2)
    up_channels: int = 256
    anchors: AnchorConfig = AnchorConfig()
    num_classes: int = 1
    dir_bins: int = 2

    @property
    def box_code(self) -> int:
        return 7

    @property
    def bev_hw(self) -> Tuple[int, int]:
        # 3 stride-2 sparse stages -> spatial stride 8; bev block0 stride
        # comes on top (bev_strides[0], =1 for SECOND).
        return (
            self.spatial_shape[1] // 8 // self.bev_strides[0],
            self.spatial_shape[2] // 8 // self.bev_strides[0],
        )


def _subm_init(key, cin, cout, k=(3, 3, 3)):
    fan = int(np.prod(k)) * cin
    return {
        "w": jax.random.normal(key, (*k, cin, cout)) * np.sqrt(2.0 / fan),
        "bn_scale": jnp.ones((cout,)),
        "bn_bias": jnp.zeros((cout,)),
    }


def init(cfg: SECONDConfig, key: jax.Array) -> Dict[str, Any]:
    w = cfg.widths
    keys = iter(jax.random.split(key, 32))
    params: Dict[str, Any] = {
        "conv_input": _subm_init(next(keys), cfg.point_features, w[0]),
        "conv1": _subm_init(next(keys), w[0], w[1]),
        "conv2_down": _subm_init(next(keys), w[1], w[2]),
        "conv2_a": _subm_init(next(keys), w[2], w[2]),
        "conv2_b": _subm_init(next(keys), w[2], w[2]),
        "conv3_down": _subm_init(next(keys), w[2], w[3]),
        "conv3_a": _subm_init(next(keys), w[3], w[3]),
        "conv3_b": _subm_init(next(keys), w[3], w[3]),
        "conv4_down": _subm_init(next(keys), w[3], w[4]),
        "conv4_a": _subm_init(next(keys), w[4], w[4]),
        "conv4_b": _subm_init(next(keys), w[4], w[4]),
        "conv_out": _subm_init(next(keys), w[4], w[5], k=(3, 1, 1)),
    }
    # HeightCompression flattens D into channels: D_out = 2 at KITTI depth
    d_out = _out_depth(cfg)
    cin = w[5] * d_out
    for i, cout in enumerate(cfg.bev_channels):
        params[f"block{i}"] = detector3d._bev_block_init(next(keys), cin, cout, 5)
        params[f"up{i}"] = {
            "w": jax.random.normal(next(keys), (1, 1, cout, cfg.up_channels))
            * (cout**-0.5),
            "gn_scale": jnp.ones((cfg.up_channels,)),
            "gn_bias": jnp.zeros((cfg.up_channels,)),
        }
        cin = cout
    c_head = cfg.up_channels * len(cfg.bev_channels)
    a = cfg.anchors.per_cell
    params["cls_w"] = jax.random.normal(next(keys), (1, 1, c_head, a * cfg.num_classes)) * 1e-2
    params["cls_b"] = jnp.full((a * cfg.num_classes,), -np.log(99.0), jnp.float32)
    params["box_w"] = jax.random.normal(next(keys), (1, 1, c_head, a * cfg.box_code)) * 1e-3
    params["box_b"] = jnp.zeros((a * cfg.box_code,), jnp.float32)
    params["dir_w"] = jax.random.normal(next(keys), (1, 1, c_head, a * cfg.dir_bins)) * 1e-2
    params["dir_b"] = jnp.zeros((a * cfg.dir_bins,), jnp.float32)
    return params


def _out_depth(cfg: SECONDConfig) -> int:
    d = cfg.spatial_shape[0]
    d = (d + 2 - 3) // 2 + 1  # conv2, depth pad 1     (41 -> 21)
    d = (d + 2 - 3) // 2 + 1  # conv3, depth pad 1     (21 -> 11)
    d = (d - 3) // 2 + 1      # conv4, depth pad 0     (11 -> 5)
    return (d - 3) // 2 + 1   # conv_out (3,1,1) pad 0 ( 5 -> 2)


def _block(st, p, rulebook=None):
    st = sp.subm_conv3d(st, p["w"], rulebook)
    return sp.batch_norm_relu(st, p["bn_scale"], p["bn_bias"])


def _down(st, p, stride, padding):
    st = sp.sparse_conv3d(st, p["w"], stride, padding)
    return sp.batch_norm_relu(st, p["bn_scale"], p["bn_bias"])


def voxel_backbone_8x_ms(
    params: Dict[str, Any], st: sp.SparseTensor
) -> Tuple[sp.SparseTensor, Dict[str, sp.SparseTensor]]:
    """VoxelBackBone8x returning the multi-scale stage outputs the
    reference exposes as ``multi_scale_3d_features`` (x_conv2/3/4 at
    strides 2/4/8, spconv_backbone.py:148-166) — consumed by two-stage
    RoI heads (Voxel-RCNN)."""
    ms: Dict[str, sp.SparseTensor] = {}
    rb = sp.build_lookup(st)  # indice_key='subm1' shared by stem+conv1
    st = _block(st, params["conv_input"], rb)
    st = _block(st, params["conv1"], rb)
    ms["x_conv1"] = st
    st = _down(st, params["conv2_down"], (2, 2, 2), (1, 1, 1))
    rb = sp.build_lookup(st)
    st = _block(st, params["conv2_a"], rb)
    st = _block(st, params["conv2_b"], rb)
    ms["x_conv2"] = st
    st = _down(st, params["conv3_down"], (2, 2, 2), (1, 1, 1))
    rb = sp.build_lookup(st)
    st = _block(st, params["conv3_a"], rb)
    st = _block(st, params["conv3_b"], rb)
    ms["x_conv3"] = st
    st = _down(st, params["conv4_down"], (2, 2, 2), (0, 1, 1))
    rb = sp.build_lookup(st)
    st = _block(st, params["conv4_a"], rb)
    st = _block(st, params["conv4_b"], rb)
    ms["x_conv4"] = st
    st = sp.sparse_conv3d(st, params["conv_out"]["w"], (2, 1, 1), (0, 0, 0))
    st = sp.batch_norm_relu(
        st, params["conv_out"]["bn_scale"], params["conv_out"]["bn_bias"]
    )
    return st, ms


def voxel_backbone_8x(params: Dict[str, Any], st: sp.SparseTensor) -> sp.SparseTensor:
    """VoxelBackBone8x: stem + 4 stages, spatial stride 8, depth 41->2."""
    return voxel_backbone_8x_ms(params, st)[0]


def height_compression(st: sp.SparseTensor) -> jax.Array:
    """SparseConvTensor.dense + flatten depth into channels
    (map_to_bev/height_compression.py:20-24) -> NHWC [B, H, W, C*D]."""
    dense = sp.to_dense(st)  # [B, D, H, W, C]
    b, d, h, w, c = dense.shape
    return dense.transpose(0, 2, 3, 1, 4).reshape(b, h, w, d * c)


@functools.partial(jax.jit, static_argnames=("cfg",))
def forward(
    params: Dict[str, Any],
    points: jax.Array,  # [B, P, point_features]
    cfg: SECONDConfig,
    points_mask: jax.Array = None,
) -> Dict[str, jax.Array]:
    """points -> anchor-grid predictions (same contract as detector3d)."""
    if points_mask is None:
        points_mask = jnp.ones(points.shape[:2], bool)
    st = sp.voxelize_points(
        points, points_mask, cfg.voxel_size, cfg.pc_range,
        cfg.spatial_shape, cfg.max_voxels,
    )
    st = voxel_backbone_8x(params, st)
    bev = height_compression(st)
    feat = detector3d._bev_backbone(params, bev, cfg)
    b = feat.shape[0]
    from metatransformer_tpu.models.vit_adapter import conv2d

    cls = conv2d(feat, params["cls_w"], params["cls_b"])
    box = conv2d(feat, params["box_w"], params["box_b"])
    dirc = conv2d(feat, params["dir_w"], params["dir_b"])
    return {
        "cls_logits": cls.reshape(b, -1, cfg.num_classes),
        "box_deltas": box.reshape(b, -1, cfg.box_code),
        "dir_logits": dirc.reshape(b, -1, cfg.dir_bins),
    }


def generate_anchors(cfg: SECONDConfig) -> np.ndarray:
    """Dense anchor grid at the BEV stride -> [A, 7] (x, y, z, l, w, h, r)."""
    fy, fx = cfg.bev_hw
    r = cfg.pc_range
    xs = np.linspace(r[0], r[3], fx, endpoint=False) + (r[3] - r[0]) / fx / 2
    ys = np.linspace(r[1], r[4], fy, endpoint=False) + (r[4] - r[1]) / fy / 2
    out = []
    for y in ys:
        for x in xs:
            for (l, w, h) in cfg.anchors.sizes:
                for rot in cfg.anchors.rotations:
                    out.append([x, y, cfg.anchors.z_center, l, w, h, rot])
    return np.asarray(out, np.float32)

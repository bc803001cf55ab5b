"""Voxelization + VFEs, TPU-native.

Replaces pcdet's spconv ``VoxelGenerator`` + the mean/pillar VFEs
(``AutonomousDriving/pcdet/datasets/processor/data_processor.py:63-251``,
``pcdet/models/backbones_3d/vfe/``). The CUDA/CPU voxelizers build ragged
per-voxel point lists; the TPU-native formulation keeps everything dense
and static-shaped: per-point voxel ids + ``segment_sum/max`` scatters —
one fused XLA program, no atomics.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class VoxelConfig:
    # point cloud range: (x0, y0, z0, x1, y1, z1)
    pc_range: Tuple[float, ...] = (0.0, -39.68, -3.0, 69.12, 39.68, 1.0)
    voxel_size: Tuple[float, ...] = (0.16, 0.16, 4.0)  # pillar default

    @property
    def grid_size(self) -> Tuple[int, int, int]:  # (nx, ny, nz)
        r = self.pc_range
        return (
            int(round((r[3] - r[0]) / self.voxel_size[0])),
            int(round((r[4] - r[1]) / self.voxel_size[1])),
            int(round((r[5] - r[2]) / self.voxel_size[2])),
        )


def voxel_ids(points: jax.Array, cfg: VoxelConfig):
    """points [B, N, 3+]: -> (linear voxel id [B, N], valid [B, N]).

    Invalid (out-of-range or zero-padded) points get id 0 and valid=False.
    """
    nx, ny, nz = cfg.grid_size
    r = jnp.asarray(cfg.pc_range)
    vs = jnp.asarray(cfg.voxel_size)
    coords = jnp.floor((points[..., :3] - r[:3]) / vs).astype(jnp.int32)
    valid = jnp.all((coords >= 0) & (coords < jnp.asarray([nx, ny, nz])), axis=-1)
    # padded points at exactly the range origin are still "valid" spatially;
    # callers pass an explicit mask for those via points_mask if needed.
    cx, cy, cz = coords[..., 0], coords[..., 1], coords[..., 2]
    lin = (cz * ny + cy) * nx + cx
    return jnp.where(valid, lin, 0), valid


def scatter_mean_vfe(
    points: jax.Array,  # [B, N, 3+C]
    cfg: VoxelConfig,
    points_mask: jax.Array = None,  # [B, N] bool for padded points
) -> jax.Array:
    """MeanVFE equivalent: dense voxel grid of mean features
    -> [B, nz, ny, nx, 3+C]."""
    nx, ny, nz = cfg.grid_size
    v = nx * ny * nz
    ids, valid = voxel_ids(points, cfg)
    if points_mask is not None:
        valid = valid & points_mask
    w = valid.astype(points.dtype)

    def per_sample(feat, ids_, w_):
        s = jax.ops.segment_sum(feat * w_[:, None], ids_, num_segments=v)
        c = jax.ops.segment_sum(w_, ids_, num_segments=v)
        return s / jnp.maximum(c[:, None], 1.0)

    grid = jax.vmap(per_sample)(points, ids, w)  # [B, V, C]
    return grid.reshape(points.shape[0], nz, ny, nx, points.shape[-1])


@dataclasses.dataclass(frozen=True)
class PillarVFEConfig:
    voxel: VoxelConfig = VoxelConfig()
    in_features: int = 4  # xyz + intensity
    channels: int = 64
    with_distance: bool = False

    @property
    def point_feat_dim(self) -> int:
        # raw + (xyz - pillar_mean) + (xy - pillar_center) [+ |xyz|]
        return self.in_features + 3 + 2 + (1 if self.with_distance else 0)


def pillar_vfe_init(cfg: PillarVFEConfig, key: jax.Array) -> Dict[str, jax.Array]:
    d = cfg.point_feat_dim
    return {
        "w": jax.random.normal(key, (d, cfg.channels)) * (d**-0.5),
        "norm_scale": jnp.ones((cfg.channels,), jnp.float32),
        "norm_bias": jnp.zeros((cfg.channels,), jnp.float32),
    }


def pillar_vfe_apply(
    params: Dict[str, jax.Array],
    points: jax.Array,  # [B, N, in_features]
    cfg: PillarVFEConfig,
    points_mask: jax.Array = None,
    mm: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """PillarVFE (``vfe/pillar_vfe.py`` semantics, dense formulation):
    augment points with pillar-relative offsets, PointNet (linear + norm +
    relu), scatter-max into the BEV grid -> [B, ny, nx, channels]."""
    vcfg = cfg.voxel
    nx, ny, _ = vcfg.grid_size
    v = nx * ny
    b, n, _ = points.shape
    r = jnp.asarray(vcfg.pc_range)
    vs = jnp.asarray(vcfg.voxel_size)

    coords = jnp.floor((points[..., :2] - r[:2]) / vs[:2]).astype(jnp.int32)
    valid = jnp.all(
        (coords >= 0) & (coords < jnp.asarray([nx, ny])), axis=-1
    ) & jnp.all(
        (points[..., 2:3] >= r[2]) & (points[..., 2:3] < r[5]), axis=-1
    )
    if points_mask is not None:
        valid = valid & points_mask
    ids = jnp.where(valid, coords[..., 1] * nx + coords[..., 0], 0)
    w = valid.astype(points.dtype)

    # pillar mean (xyz) gathered back per point
    def seg_mean(feat, ids_, w_):
        s = jax.ops.segment_sum(feat * w_[:, None], ids_, num_segments=v)
        c = jax.ops.segment_sum(w_, ids_, num_segments=v)
        return s / jnp.maximum(c[:, None], 1.0)

    mean_xyz = jax.vmap(seg_mean)(points[..., :3], ids, w)  # [B, V, 3]
    point_mean = jnp.take_along_axis(mean_xyz, ids[..., None], axis=1)
    centers = (coords.astype(points.dtype) + 0.5) * vs[:2] + r[:2]

    feats = [
        points,
        points[..., :3] - point_mean,
        points[..., :2] - centers,
    ]
    if cfg.with_distance:
        feats.append(jnp.linalg.norm(points[..., :3], axis=-1, keepdims=True))
    f = jnp.concatenate(feats, axis=-1)
    f = jnp.dot(f, params["w"], precision=mm)
    # BatchNorm1d equivalent over valid points (stateless batch stats)
    fm = jnp.sum(f * w[..., None], axis=(0, 1)) / jnp.maximum(jnp.sum(w), 1.0)
    fv = jnp.sum(jnp.square(f - fm) * w[..., None], axis=(0, 1)) / jnp.maximum(
        jnp.sum(w), 1.0
    )
    f = (f - fm) * jax.lax.rsqrt(fv + 1e-3)
    f = jax.nn.relu(f * params["norm_scale"] + params["norm_bias"])
    f = jnp.where(valid[..., None], f, -jnp.inf)

    def seg_max(feat, ids_):
        return jax.ops.segment_max(feat, ids_, num_segments=v)

    grid = jax.vmap(seg_max)(f, ids)  # [B, V, C]
    grid = jnp.where(jnp.isfinite(grid), grid, 0.0)
    return grid.reshape(b, ny, nx, cfg.channels)

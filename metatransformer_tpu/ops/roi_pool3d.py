"""RoI-aware 3D point pooling, TPU-native.

Replaces pcdet's roiaware/roipoint CUDA pooling
(``AutonomousDriving/pcdet/ops/{roiaware_pool3d,roipoint_pool3d}/src/``):
tests point membership in rotated 3D boxes and pools per-RoI features —
dense mask + masked reductions instead of per-box point lists.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def points_in_boxes(points: jax.Array, boxes: jax.Array) -> jax.Array:
    """points [B, N, 3], boxes [B, R, 7] (x,y,z,dx,dy,dz,heading)
    -> bool [B, R, N] membership mask (pcdet points_in_boxes_gpu)."""
    rel = points[:, None, :, :] - boxes[:, :, None, :3]  # [B, R, N, 3]
    yaw = boxes[..., 6]
    c, s = jnp.cos(-yaw), jnp.sin(-yaw)  # rotate into box frame
    local_x = rel[..., 0] * c[:, :, None] - rel[..., 1] * s[:, :, None]
    local_y = rel[..., 0] * s[:, :, None] + rel[..., 1] * c[:, :, None]
    local_z = rel[..., 2]
    half = boxes[:, :, None, 3:6] / 2.0
    return (
        (jnp.abs(local_x) <= half[..., 0])
        & (jnp.abs(local_y) <= half[..., 1])
        & (jnp.abs(local_z) <= half[..., 2])
    )


def roi_max_pool(
    points: jax.Array,  # [B, N, 3]
    features: jax.Array,  # [B, N, C]
    boxes: jax.Array,  # [B, R, 7]
) -> jax.Array:
    """Per-RoI max pooling of in-box point features -> [B, R, C]
    (empty RoIs give zeros, matching the CUDA kernel's empty handling)."""
    mask = points_in_boxes(points, boxes)  # [B, R, N]
    masked = jnp.where(
        mask[..., None], features[:, None, :, :], -jnp.inf
    )
    pooled = jnp.max(masked, axis=2)
    return jnp.where(jnp.isfinite(pooled), pooled, 0.0)


def roi_avg_pool(points, features, boxes):
    mask = points_in_boxes(points, boxes).astype(features.dtype)
    summed = jnp.einsum("brn,bnc->brc", mask, features)
    counts = jnp.sum(mask, axis=-1, keepdims=True)
    return summed / jnp.maximum(counts, 1.0)

"""Rotated 3D box IoU + NMS, TPU-native.

Replaces pcdet's iou3d_nms CUDA kernels
(``AutonomousDriving/pcdet/ops/iou3d_nms/src/iou3d_nms_kernel.cu``).
Boxes are (x, y, z, dx, dy, dz, heading) — pcdet convention.

BEV overlap of two rotated rectangles = Sutherland-Hodgman polygon
clipping, fully vectorized over [N, M] pairs with a static vertex budget
(a rect-rect intersection has <= 8 vertices); no branching, no atomics.
NMS = greedy suppression as a ``lax.fori_loop`` over score-sorted boxes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_MAX_VERTS = 16  # 4 + one per clip edge worst case, padded


def box_corners_bev(boxes: jax.Array) -> jax.Array:
    """[..., 7] -> BEV corners [..., 4, 2] (counter-clockwise)."""
    x, y = boxes[..., 0], boxes[..., 1]
    dx, dy, yaw = boxes[..., 3], boxes[..., 4], boxes[..., 6]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    # local corners, ccw
    lx = jnp.stack([dx, -dx, -dx, dx], -1) * 0.5
    ly = jnp.stack([dy, dy, -dy, -dy], -1) * 0.5
    gx = lx * c[..., None] - ly * s[..., None] + x[..., None]
    gy = lx * s[..., None] + ly * c[..., None] + y[..., None]
    return jnp.stack([gx, gy], -1)


def _polygon_area(verts: jax.Array, nvalid: jax.Array) -> jax.Array:
    """Shoelace over padded vertex list [..., V, 2] with nvalid [...]."""
    v = verts.shape[-2]
    idx = jnp.arange(v)
    nxt = (idx + 1) % v
    # roll so that invalid slots repeat the last valid vertex: we instead
    # zero contributions of edges touching invalid slots by masking.
    mask = idx[None, :] < nvalid[..., None] if nvalid.ndim else idx < nvalid
    # for simplicity compute on "wrapped into valid count" indexing:
    def gather(a, i):
        return jnp.take_along_axis(a, i[..., None].astype(jnp.int32), axis=-2)

    idxv = jnp.broadcast_to(idx, verts.shape[:-1])
    nxtv = jnp.where(
        idxv + 1 >= nvalid[..., None], 0, idxv + 1
    )
    x1, y1 = verts[..., 0], verts[..., 1]
    vn = jnp.take_along_axis(
        verts, nxtv[..., None].astype(jnp.int32).repeat(2, -1), axis=-2
    )
    x2, y2 = vn[..., 0], vn[..., 1]
    contrib = (x1 * y2 - x2 * y1) * mask
    return jnp.abs(jnp.sum(contrib, axis=-1)) * 0.5


def _clip_polygon(verts, nvalid, a, b):
    """Clip padded polygon by half-plane left-of segment a->b (vectorized
    Sutherland-Hodgman step). verts [..., V, 2]; a, b [..., 2]."""
    v = verts.shape[-2]
    idxv = jnp.broadcast_to(jnp.arange(v), verts.shape[:-1])
    nxt = jnp.where(idxv + 1 >= nvalid[..., None], 0, idxv + 1)
    vn = jnp.take_along_axis(
        verts, nxt[..., None].astype(jnp.int32).repeat(2, -1), axis=-2
    )
    d = b - a

    def side(p):
        return d[..., None, 0] * (p[..., 1] - a[..., None, 1]) - d[..., None, 1] * (
            p[..., 0] - a[..., None, 0]
        )

    s1 = side(verts)  # [..., V]
    s2 = side(vn)
    inside1 = s1 >= 0
    inside2 = s2 >= 0
    denom = s1 - s2
    t = s1 / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    inter = verts + (vn - verts) * t[..., None]

    valid_slot = idxv < nvalid[..., None]
    # each input edge emits up to 2 vertices: current (if inside) and
    # intersection (if the edge crosses).
    emit1 = inside1 & valid_slot
    emit2 = (inside1 != inside2) & valid_slot
    out_verts = jnp.concatenate([verts, inter], axis=-2)  # [..., 2V, 2]
    emit = jnp.concatenate([emit1, emit2], axis=-1)  # [..., 2V]
    # interleave in edge order: vertex i then intersection i
    order = jnp.arange(2 * v).reshape(2, v).T.reshape(-1)  # 0,V,1,V+1,...
    out_verts = out_verts[..., order, :]
    emit = emit[..., order]
    # compact: stable sort by (not emit)
    key = (~emit).astype(jnp.int32)
    perm = jnp.argsort(key, axis=-1, stable=True)
    out_verts = jnp.take_along_axis(
        out_verts, perm[..., None].repeat(2, -1), axis=-2
    )
    new_n = jnp.sum(emit, axis=-1)
    return out_verts[..., :_MAX_VERTS, :], jnp.minimum(new_n, _MAX_VERTS)


def rotated_overlap_bev(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """BEV intersection areas [N, M] of rotated boxes [N,7] x [M,7]."""
    ca = box_corners_bev(boxes_a)  # [N, 4, 2]
    cb = box_corners_bev(boxes_b)  # [M, 4, 2]
    n, m = ca.shape[0], cb.shape[0]
    verts = jnp.broadcast_to(ca[:, None], (n, m, 4, 2))
    verts = jnp.pad(verts, ((0, 0), (0, 0), (0, _MAX_VERTS - 4), (0, 0)))
    nvalid = jnp.full((n, m), 4, jnp.int32)
    for e in range(4):
        a = jnp.broadcast_to(cb[None, :, e], (n, m, 2))
        b = jnp.broadcast_to(cb[None, :, (e + 1) % 4], (n, m, 2))
        verts, nvalid = _clip_polygon(verts, nvalid, a, b)
    area = _polygon_area(verts, nvalid)
    return jnp.where(nvalid >= 3, area, 0.0)


@jax.jit
def boxes_iou3d(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """3D IoU [N, M] (BEV overlap x z-overlap, pcdet boxes_iou3d_gpu)."""
    overlap_bev = rotated_overlap_bev(boxes_a, boxes_b)
    za1 = boxes_a[:, 2] - boxes_a[:, 5] / 2
    za2 = boxes_a[:, 2] + boxes_a[:, 5] / 2
    zb1 = boxes_b[:, 2] - boxes_b[:, 5] / 2
    zb2 = boxes_b[:, 2] + boxes_b[:, 5] / 2
    zo = jnp.maximum(
        jnp.minimum(za2[:, None], zb2[None]) - jnp.maximum(za1[:, None], zb1[None]),
        0.0,
    )
    inter = overlap_bev * zo
    vol_a = boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5]
    vol_b = boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5]
    return inter / jnp.maximum(vol_a[:, None] + vol_b[None] - inter, 1e-6)


@functools.partial(jax.jit, static_argnames=("max_out",))
def nms_bev(
    boxes: jax.Array,  # [N, 7]
    scores: jax.Array,  # [N]
    iou_threshold: float = 0.7,
    max_out: int = 128,
):
    """Greedy rotated-BEV NMS (pcdet nms_gpu semantics).

    Returns (indices [max_out], valid [max_out]) — indices into `boxes`
    sorted by score, padded with 0 where valid is False.
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    sb = boxes[order]
    bev = rotated_overlap_bev(sb, sb)
    area = sb[:, 3] * sb[:, 4]
    iou = bev / jnp.maximum(area[:, None] + area[None] - bev, 1e-6)

    def body(i, keep):
        suppressed_by_earlier = jnp.any(
            keep & (jnp.arange(n) < i) & (iou[i] > iou_threshold)
        )
        return keep.at[i].set(~suppressed_by_earlier)

    keep = jax.lax.fori_loop(1, n, body, jnp.ones((n,), bool))
    rank = jnp.where(keep, jnp.arange(n), n + 1)
    sel = jnp.argsort(rank)[:max_out]
    valid = jnp.take(keep, sel) & (jnp.sum(keep) > jnp.arange(max_out))
    return order[sel], valid

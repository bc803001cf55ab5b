"""Voxelization / pillar VFE / rotated IoU / NMS vs analytic oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.ops import iou3d, voxelize


def test_voxel_ids_and_mean_vfe():
    cfg = voxelize.VoxelConfig(
        pc_range=(0, 0, 0, 4, 4, 4), voxel_size=(1.0, 1.0, 4.0)
    )
    assert cfg.grid_size == (4, 4, 1)
    pts = jnp.asarray(
        [[[0.5, 0.5, 1.0, 2.0], [0.6, 0.4, 1.0, 4.0], [3.5, 3.5, 1.0, 8.0],
          [9.0, 9.0, 9.0, 1.0]]],  # last point out of range
        jnp.float32,
    )
    grid = voxelize.scatter_mean_vfe(pts, cfg)
    assert grid.shape == (1, 1, 4, 4, 4)
    g = np.asarray(grid)
    np.testing.assert_allclose(g[0, 0, 0, 0, 3], 3.0)  # mean(2, 4)
    np.testing.assert_allclose(g[0, 0, 3, 3, 3], 8.0)
    assert g[0, 0, 1, 1, 3] == 0.0  # empty voxel


def test_pillar_vfe_shapes_and_masking():
    vcfg = voxelize.VoxelConfig(
        pc_range=(0, 0, -1, 8, 8, 3), voxel_size=(1.0, 1.0, 4.0)
    )
    cfg = voxelize.PillarVFEConfig(voxel=vcfg, in_features=4, channels=16)
    params = voxelize.pillar_vfe_init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 8, (2, 100, 4)).astype(np.float32)
    pts[:, :, 2] = rng.uniform(-1, 3, (2, 100))
    mask = np.ones((2, 100), bool)
    mask[:, 80:] = False
    out = voxelize.pillar_vfe_apply(params, jnp.asarray(pts), cfg,
                                    jnp.asarray(mask))
    assert out.shape == (2, 8, 8, 16)
    assert np.isfinite(np.asarray(out)).all()
    # empty scene -> all zeros
    empty = voxelize.pillar_vfe_apply(
        params, jnp.asarray(pts), cfg, jnp.zeros((2, 100), bool)
    )
    np.testing.assert_allclose(np.asarray(empty), 0.0)


def test_rotated_overlap_axis_aligned():
    # two unit squares offset by 0.5 -> overlap 0.5
    a = jnp.asarray([[0.0, 0, 0, 1, 1, 1, 0]])
    b = jnp.asarray([[0.5, 0, 0, 1, 1, 1, 0]])
    ov = float(iou3d.rotated_overlap_bev(a, b)[0, 0])
    assert abs(ov - 0.5) < 1e-4
    # identical -> area 1
    assert abs(float(iou3d.rotated_overlap_bev(a, a)[0, 0]) - 1.0) < 1e-4
    # disjoint -> 0
    c = jnp.asarray([[5.0, 5, 0, 1, 1, 1, 0]])
    assert float(iou3d.rotated_overlap_bev(a, c)[0, 0]) == 0.0


def test_rotated_overlap_45deg():
    # unit square vs same square rotated 45deg: overlap = 2*(sqrt2-1)
    a = jnp.asarray([[0.0, 0, 0, 1, 1, 1, 0]])
    b = jnp.asarray([[0.0, 0, 0, 1, 1, 1, np.pi / 4]])
    ov = float(iou3d.rotated_overlap_bev(a, b)[0, 0])
    want = 2 * (np.sqrt(2) - 1)
    assert abs(ov - want) < 1e-3, (ov, want)


def test_iou3d_z_overlap():
    a = jnp.asarray([[0.0, 0, 0.0, 1, 1, 1, 0]])
    b = jnp.asarray([[0.0, 0, 0.5, 1, 1, 1, 0]])  # half z overlap
    iou = float(iou3d.boxes_iou3d(a, b)[0, 0])
    assert abs(iou - 0.5 / 1.5) < 1e-4


def test_nms_bev():
    boxes = jnp.asarray(
        [
            [0.0, 0, 0, 2, 2, 1, 0],
            [0.1, 0, 0, 2, 2, 1, 0],  # heavy overlap with 0
            [5.0, 5, 0, 2, 2, 1, 0],  # separate
            [5.1, 5, 0, 2, 2, 1, 0.1],  # overlaps 2
        ]
    )
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.95])
    idx, valid = iou3d.nms_bev(boxes, scores, iou_threshold=0.3, max_out=4)
    kept = set(np.asarray(idx)[np.asarray(valid)].tolist())
    assert kept == {0, 3}  # highest scorers of each cluster

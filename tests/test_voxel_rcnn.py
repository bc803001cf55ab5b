"""Voxel-RCNN two-stage detector: grid pooling, targets, losses.

Oracle pattern per SURVEY.md §4: geometry/targets checked against
hand-computed values from the reference semantics
(pcdet roi_heads/voxelrcnn_head.py, roi_head_template.py,
proposal_target_layer.py), end-to-end at small grid geometry.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.models import second, voxel_rcnn as vr


SMALL = vr.VoxelRCNNConfig(
    stage1=second.SECONDConfig(
        voxel_size=(0.1, 0.1, 0.2),
        pc_range=(0.0, -3.2, -3.0, 6.4, 3.2, 2.0),
        spatial_shape=(25, 64, 64),
        max_voxels=256,
        widths=(4, 4, 8, 8, 8, 8),
        bev_channels=(8, 16),
        up_channels=8,
    ),
    num_rois=16,
    fg_per=8,
    grid_size=3,
    pool_layers=(
        ("x_conv2", vr.PoolLayerConfig(2, 0.4, nsample=8, mlp=8)),
        ("x_conv3", vr.PoolLayerConfig(4, 0.8, nsample=8, mlp=8)),
    ),
    shared_fc=(16,),
    cls_fc=(16,),
    reg_fc=(16,),
    proposal_pre=64,
)


def test_offset_template():
    t = vr._offset_template(4.0, 16)
    assert t.shape == (16, 3)
    assert (t[0] == 0).all()  # center first
    d = np.linalg.norm(t, axis=1)
    assert (d <= 4.0 + 1e-6).all()
    assert (np.diff(d) >= -1e-6).all()  # sorted by distance
    # small radius keeps everything
    t1 = vr._offset_template(1.0, 64)
    assert len(t1) == 7  # center + 6 face neighbors


def test_roi_grid_points():
    rois = jnp.asarray([[1.0, 2.0, 0.5, 3.0, 1.5, 0.9, 0.0]])
    pts = np.asarray(vr.roi_grid_points(rois, 3))[0]  # [27, 3]
    assert pts.shape == (27, 3)
    # axis-aligned: grid spans the box interior, centered on the roi
    assert np.allclose(pts.mean(0), [1.0, 2.0, 0.5], atol=1e-5)
    assert pts[:, 0].min() >= 1.0 - 1.5 and pts[:, 0].max() <= 1.0 + 1.5
    # first grid point is the (-,-,-) cell center: center - size/3
    np.testing.assert_allclose(pts[0], [1 - 1.0, 2 - 0.5, 0.5 - 0.3], atol=1e-5)
    # rotation by pi/2 maps local +x to +y
    rois_r = jnp.asarray([[1.0, 2.0, 0.5, 3.0, 1.5, 0.9, np.pi / 2]])
    pts_r = np.asarray(vr.roi_grid_points(rois_r, 3))[0]
    np.testing.assert_allclose(pts_r[0], [1 + 0.5, 2 - 1.0, 0.5 - 0.3], atol=1e-5)


def test_corner_loss_flip_invariant():
    box = jnp.asarray([[5.0, 1.0, -1.0, 3.9, 1.6, 1.5, 0.4]])
    flipped = box.at[:, 6].add(np.pi)
    assert float(vr.corner_loss(box, box)[0]) < 1e-6
    assert float(vr.corner_loss(box, flipped)[0]) < 1e-6  # flip-min
    shifted = box.at[:, 0].add(1.0)
    assert float(vr.corner_loss(shifted, box)[0]) > 0.1


def test_decode_refined_inverts_encode():
    rois = jnp.asarray([[4.0, 1.0, -1.0, 3.5, 1.5, 1.4, 0.7],
                        [2.0, -2.0, -0.5, 4.2, 1.7, 1.6, -0.3]])
    gt = jnp.asarray([[4.5, 1.2, -0.9, 3.9, 1.6, 1.56, 0.9],
                      [1.8, -2.2, -0.6, 4.0, 1.8, 1.5, -0.1]])
    # canonical transform as in sample_rois_for_rcnn
    roi_ry = rois[:, 6]
    local_xyz = vr.rotate_z(gt[:, 0:3] - rois[:, 0:3], -roi_ry)
    gt_ct = jnp.concatenate(
        [local_xyz, gt[:, 3:6], (gt[:, 6] - roi_ry)[:, None]], axis=-1
    )
    deltas = vr.encode_boxes(gt_ct, vr._local_anchor(rois))
    rec = np.asarray(vr.decode_refined(rois, deltas))
    np.testing.assert_allclose(rec, np.asarray(gt), atol=1e-5)


def test_sample_rois_for_rcnn():
    cfg = dataclasses.replace(SMALL, num_rois=4, fg_per=2)
    gt = jnp.asarray([[3.0, 0.0, -1.0, 3.9, 1.6, 1.5, 0.0],
                      [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]])
    gv = jnp.asarray([True, False])
    rois = jnp.asarray(
        [
            [3.05, 0.05, -1.0, 3.9, 1.6, 1.5, 0.0],   # near-perfect fg
            [3.5, 0.6, -1.0, 3.9, 1.6, 1.5, 0.2],     # partial overlap
            [10.0, 5.0, -1.0, 3.9, 1.6, 1.5, 0.0],    # easy bg
            [11.0, -5.0, -1.0, 3.9, 1.6, 1.5, 0.0],   # easy bg
            [12.0, 4.0, -1.0, 3.9, 1.6, 1.5, 0.0],    # easy bg
        ]
    )
    rv = jnp.ones((5,), bool)
    t = vr.sample_rois_for_rcnn(rois, rv, gt, gv, cfg)
    assert t["rois"].shape == (4, 7)
    # the near-perfect roi is selected first with soft label 1
    np.testing.assert_allclose(np.asarray(t["rois"][0]), np.asarray(rois[0]))
    assert float(t["cls_labels"][0]) == 1.0
    assert bool(t["reg_valid"][0])
    # its canonical gt is ~centered (roi ~= gt)
    np.testing.assert_allclose(
        np.asarray(t["gt_of_rois"][0][:3]), [-0.05, -0.05, 0.0], atol=1e-5
    )
    # background rois get label 0 and no reg
    assert float(t["cls_labels"][-1]) == 0.0
    assert not bool(t["reg_valid"][-1])


def test_voxel_rcnn_end_to_end_small():
    cfg = SMALL
    params = vr.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(11)
    pts = np.zeros((1, 128, 4), np.float32)
    pts[0, :, 0] = rng.uniform(0, 6.4, 128)
    pts[0, :, 1] = rng.uniform(-3.2, 3.2, 128)
    pts[0, :, 2] = rng.uniform(-3, 2, 128)
    pts[0, :, 3] = rng.uniform(0, 1, 128)
    anchors = jnp.asarray(second.generate_anchors(cfg.stage1))

    preds, ms, bev = vr.forward_stage1(params, jnp.asarray(pts), cfg)
    assert bev.ndim == 4
    assert set(ms) >= {"x_conv2", "x_conv3"}
    rois, scores, valid = vr.propose(preds, anchors, cfg)
    assert rois.shape == (1, cfg.num_rois, 7)

    pooled = vr.roi_grid_pool(params, ms, rois, cfg)
    g3 = cfg.grid_size**3
    assert pooled.shape == (1, cfg.num_rois, g3 * cfg.pooled_channels)
    assert np.isfinite(np.asarray(pooled)).all()

    cls, reg = vr.refine(params, pooled, cfg)
    assert cls.shape == (1, cfg.num_rois)
    assert reg.shape == (1, cfg.num_rois, 7)

    gt = jnp.asarray([[[2.0, 0.5, -1.0, 3.2, 1.6, 1.5, 0.3],
                       [0, 0, 0, 0, 0, 0, 0]]], jnp.float32)
    gv = jnp.asarray([[True, False]])
    loss, logs = vr.training_loss(
        params, jnp.asarray(pts), gt, gv, anchors, cfg
    )
    assert np.isfinite(float(loss))
    assert "rcnn_cls" in logs and "rcnn_corner" in logs

    def loss_fn(p):
        return vr.training_loss(p, jnp.asarray(pts), gt, gv, anchors, cfg)[0]

    g = jax.grad(loss_fn)(params)
    assert float(jnp.abs(g["stage1"]["conv_input"]["w"]).max()) > 0
    assert float(jnp.abs(g["cls_pred"]["w"]).max()) > 0
    assert float(jnp.abs(g["pre_x_conv2"]["w"]).max()) > 0

    dets = vr.predict(params, jnp.asarray(pts), anchors, cfg, score_thr=0.0)
    assert dets[0]["boxes"].shape[1] == 7

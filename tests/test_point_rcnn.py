"""PointRCNN: PointNet++ backbone, point head, RoI point pooling.

Oracle pattern per SURVEY.md §4 (pcdet pointnet2_backbone.py,
point_head_box.py, pointrcnn_head.py, PointResidualCoder)."""

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.models import point_rcnn as pr


SMALL = pr.PointRCNNConfig(
    num_classes=3,
    sa_stages=(
        pr.SAStage(32, (0.5, 1.0), (8, 8), ((8, 8), (8, 8))),
        pr.SAStage(8, (1.0, 2.0), (8, 8), ((8, 16), (8, 16))),
    ),
    fp_mlps=((16, 16), (32, 32)),
    head_cls_fc=(16,),
    head_reg_fc=(16,),
    num_rois=8,
    fg_per=4,
    num_sampled_points=16,
    xyz_up=(8, 8),
    roi_sa_stages=(
        pr.SAStage(8, (0.5,), (8,), ((16, 16),)),
        pr.SAStage(-1, (100.0,), (8,), ((16, 32),)),
    ),
    cls_fc=(16,),
    reg_fc=(16,),
    proposal_pre=64,
)


def test_point_residual_coder_roundtrip():
    points = jnp.asarray([[1.0, 2.0, -0.5], [3.0, -1.0, -1.0]])
    gt = jnp.asarray([[1.5, 2.2, -0.4, 3.9, 1.6, 1.5, 0.4],
                      [3.1, -0.8, -1.1, 0.8, 0.6, 1.7, -0.2]])
    cls = jnp.asarray([0, 1])
    enc = pr.point_encode_boxes(gt, points, cls, pr.KITTI_MEAN_SIZES)
    assert enc.shape == (2, 8)
    dec = pr.point_decode_boxes(enc, points, cls, pr.KITTI_MEAN_SIZES)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(gt), atol=1e-5)


def test_assign_point_targets():
    cfg = SMALL
    xyz = jnp.asarray([[[2.0, 0.5, -1.0],   # inside gt
                        [2.0, 1.35, -1.0],  # inside enlarged only -> ignore
                        [8.0, 8.0, 0.0]]])  # background
    gt = jnp.asarray([[[2.0, 0.5, -1.0, 3.2, 1.6, 1.5, 0.0]]])
    gl = jnp.asarray([[2]])
    gv = jnp.asarray([[True]])
    labels, box_gt, box_cls = pr.assign_point_targets(xyz, gt, gl, gv, cfg)
    assert int(labels[0, 0]) == 3  # class 2 -> label 3 (1-based)
    assert int(labels[0, 1]) == -1  # ignore band
    assert int(labels[0, 2]) == 0  # background
    np.testing.assert_allclose(np.asarray(box_gt[0, 0]), np.asarray(gt[0, 0]))


def test_ball_group_mlp_masked_empty():
    centers = jnp.asarray([[[0.0, 0.0, 0.0], [50.0, 50.0, 50.0]]])
    pts = jnp.asarray([[[0.1, 0.0, 0.0], [0.0, -0.1, 0.0]]])
    feats = jnp.asarray([[[1.0], [2.0]]])
    valid = jnp.ones((1, 2), bool)
    stack = [{"w": jnp.eye(4), "b": jnp.zeros((4,))}]
    out = pr.ball_group_mlp(centers, pts, feats, valid, 0.5, 2, stack)
    assert out.shape == (1, 2, 4)
    assert abs(float(out[0, 0, 3]) - 2.0) < 1e-5  # max feature via relu-id
    assert float(jnp.abs(out[0, 1]).max()) == 0.0  # empty ball


def test_roi_point_pool_canonical():
    xyz = jnp.asarray([[[2.0, 0.5, -1.0], [2.5, 0.5, -1.0], [9.0, 9.0, 9.0]]])
    feats = jnp.asarray([[[1.0], [2.0], [3.0]]])
    mask = jnp.ones((1, 3), bool)
    rois = jnp.asarray([[[2.0, 0.5, -1.0, 3.0, 1.6, 1.5, 0.0]]])
    local, gf, empty = pr.roi_point_pool(xyz, feats, mask, rois, 4)
    assert local.shape == (1, 1, 4, 3)
    assert not bool(empty[0, 0])
    # first pooled point = roi center -> local origin
    np.testing.assert_allclose(np.asarray(local[0, 0, 0]), [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(local[0, 0, 1]), [0.5, 0, 0], atol=1e-6)
    assert float(gf[0, 0, 0, 0]) == 1.0 and float(gf[0, 0, 1, 0]) == 2.0
    # far roi -> empty
    far = jnp.asarray([[[50.0, 50.0, 0.0, 2.0, 2.0, 2.0, 0.0]]])
    _, _, empty2 = pr.roi_point_pool(xyz, feats, mask, far, 4)
    assert bool(empty2[0, 0])


def test_point_rcnn_end_to_end_small():
    cfg = SMALL
    params = pr.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(31)
    pts = np.zeros((1, 64, 4), np.float32)
    pts[0, :, 0] = rng.uniform(0, 6.4, 64)
    pts[0, :, 1] = rng.uniform(-3.2, 3.2, 64)
    pts[0, :, 2] = rng.uniform(-3, 2, 64)
    pts[0, :, 3] = rng.uniform(0, 1, 64)

    pf, cls, box = pr.forward(params, jnp.asarray(pts), cfg)
    assert pf.shape == (1, 64, cfg.backbone_out)
    assert cls.shape == (1, 64, 3)
    assert box.shape == (1, 64, 8)
    assert np.isfinite(np.asarray(pf)).all()

    gt = jnp.asarray([[[2.0, 0.5, -1.0, 3.2, 1.6, 1.5, 0.3],
                       [0, 0, 0, 0, 0, 0, 0]]], jnp.float32)
    gl = jnp.asarray([[0, 0]], jnp.int32)
    gv = jnp.asarray([[True, False]])
    loss, logs = pr.training_loss(params, jnp.asarray(pts), gt, gl, gv, cfg)
    assert np.isfinite(float(loss))
    assert {"point_cls", "point_box", "rcnn_corner"} <= set(logs)

    def loss_fn(p):
        return pr.training_loss(p, jnp.asarray(pts), gt, gl, gv, cfg)[0]

    g = jax.grad(loss_fn)(params)
    assert float(jnp.abs(g["sa0_0"][0]["w"]).max()) > 0
    assert float(jnp.abs(g["fp0"][0]["w"]).max()) > 0
    assert float(jnp.abs(g["ph_cls_pred"]["w"]).max()) > 0
    assert float(jnp.abs(g["xyz_up"][0]["w"]).max()) > 0

    dets = pr.predict(params, jnp.asarray(pts), cfg, score_thr=0.0)
    assert dets[0]["boxes"].shape[1] == 7

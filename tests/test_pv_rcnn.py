"""PV-RCNN: voxel set abstraction, point head, keypoint RoI pooling.

Oracle pattern per SURVEY.md §4 (pcdet voxel_set_abstraction.py,
point_head_simple.py, pvrcnn_head.py semantics at small geometry)."""

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.models import pv_rcnn as pv, second


SMALL = pv.PVRCNNConfig(
    stage1=second.SECONDConfig(
        voxel_size=(0.1, 0.1, 0.2),
        pc_range=(0.0, -3.2, -3.0, 6.4, 3.2, 2.0),
        spatial_shape=(25, 64, 64),
        max_voxels=256,
        widths=(4, 4, 8, 8, 8, 8),
        bev_channels=(8, 16),
        up_channels=8,
    ),
    num_keypoints=32,
    out_features=16,
    sa_layers=(
        ("raw_points", pv.SALayerConfig((0.4,), (8,), 8)),
        ("x_conv2", pv.SALayerConfig((0.8,), (8,), 8, stride=2)),
        ("x_conv4", pv.SALayerConfig((2.4,), (8,), 8, stride=8)),
    ),
    point_cls_fc=(16,),
    num_rois=8,
    fg_per=4,
    grid_size=3,
    roi_radii=(0.8,),
    roi_nsamples=(8,),
    roi_mlp=8,
    shared_fc=(16,),
    cls_fc=(16,),
    reg_fc=(16,),
    proposal_pre=64,
)


def test_ball_group_max_semantics():
    """Features of in-radius neighbors aggregate; empty balls give 0."""
    centers = jnp.asarray([[[0.0, 0.0, 0.0], [10.0, 10.0, 10.0]]])
    points = jnp.asarray([[[0.1, 0.0, 0.0], [0.0, 0.2, 0.0], [5.0, 5.0, 5.0]]])
    feats = jnp.asarray([[[1.0], [2.0], [50.0]]])
    valid = jnp.ones((1, 3), bool)
    # identity-ish MLP: w picks the feature through relu
    mlp_a = {"w": jnp.zeros((4, 4)).at[3, 0].set(1.0), "b": jnp.zeros((4,))}
    mlp_b = {"w": jnp.eye(4), "b": jnp.zeros((4,))}
    out = pv.ball_group_max(centers, points, feats, valid, 0.5, 2, mlp_a, mlp_b)
    assert out.shape == (1, 2, 4)
    # center 0: neighbors have feats 1, 2 -> max 2 (relu passthrough)
    assert abs(float(out[0, 0, 0]) - 2.0) < 1e-5
    # center 1: no in-radius neighbors -> zeros
    assert float(jnp.abs(out[0, 1]).max()) == 0.0


def test_ball_group_chunked_matches_direct():
    rng = np.random.default_rng(0)
    centers = jnp.asarray(rng.uniform(-1, 1, (2, 70, 3)), jnp.float32)
    points = jnp.asarray(rng.uniform(-1, 1, (2, 40, 3)), jnp.float32)
    feats = jnp.asarray(rng.standard_normal((2, 40, 5)), jnp.float32)
    valid = jnp.ones((2, 40), bool)
    mlp_a = {"w": jnp.asarray(rng.standard_normal((8, 6)), jnp.float32),
             "b": jnp.zeros((6,))}
    mlp_b = {"w": jnp.asarray(rng.standard_normal((6, 6)), jnp.float32),
             "b": jnp.zeros((6,))}
    full = pv.ball_group_max(centers, points, feats, valid, 0.7, 4, mlp_a, mlp_b,
                             chunk=1024)
    chunked = pv.ball_group_max(centers, points, feats, valid, 0.7, 4, mlp_a,
                                mlp_b, chunk=32)
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked), atol=1e-5)


def test_bev_interpolate_exact_at_cell_centers():
    cfg = SMALL
    fh, fw = 8, 8  # stride 8 BEV of the 64x64 grid
    feat = jnp.arange(fh * fw, dtype=jnp.float32).reshape(1, fh, fw, 1)
    # keypoint exactly at BEV cell (x=2, y=3): x = 2*0.8 + 0 ; y = 3*0.8 - 3.2
    kp = jnp.asarray([[[1.6, -0.8, 0.0]]])
    out = pv.bev_interpolate(feat, kp, cfg)
    assert abs(float(out[0, 0, 0]) - (3 * fw + 2)) < 1e-4


def test_point_head_targets():
    kp = jnp.asarray([[[2.0, 0.5, -1.0], [5.9, 2.9, 1.5]]])
    gt = jnp.asarray([[[2.0, 0.5, -1.0, 1.0, 1.0, 1.0, 0.0]]])
    gv = jnp.asarray([[True]])
    t = pv.point_head_targets(kp, gt, gv, extra=0.2)
    assert t.shape == (1, 2)
    assert float(t[0, 0]) == 1.0 and float(t[0, 1]) == 0.0
    # invalid gt -> no positives
    t0 = pv.point_head_targets(kp, gt, jnp.asarray([[False]]), extra=0.2)
    assert float(t0.sum()) == 0.0


def test_pv_rcnn_end_to_end_small():
    cfg = SMALL
    params = pv.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(21)
    pts = np.zeros((1, 128, 4), np.float32)
    pts[0, :, 0] = rng.uniform(0, 6.4, 128)
    pts[0, :, 1] = rng.uniform(-3.2, 3.2, 128)
    pts[0, :, 2] = rng.uniform(-3, 2, 128)
    pts[0, :, 3] = rng.uniform(0, 1, 128)
    anchors = jnp.asarray(second.generate_anchors(cfg.stage1))

    preds, keypoints, weighted, pt_logits = pv.forward(
        params, jnp.asarray(pts), cfg
    )
    assert keypoints.shape == (1, cfg.num_keypoints, 3)
    assert weighted.shape == (1, cfg.num_keypoints, cfg.out_features)
    assert pt_logits.shape == (1, cfg.num_keypoints)
    assert np.isfinite(np.asarray(weighted)).all()

    gt = jnp.asarray([[[2.0, 0.5, -1.0, 3.2, 1.6, 1.5, 0.3],
                       [0, 0, 0, 0, 0, 0, 0]]], jnp.float32)
    gv = jnp.asarray([[True, False]])
    loss, logs = pv.training_loss(
        params, jnp.asarray(pts), gt, gv, anchors, cfg
    )
    assert np.isfinite(float(loss))
    assert {"point_cls", "rcnn_cls", "rcnn_corner"} <= set(logs)

    def loss_fn(p):
        return pv.training_loss(p, jnp.asarray(pts), gt, gv, anchors, cfg)[0]

    g = jax.grad(loss_fn)(params)
    assert float(jnp.abs(g["stage1"]["conv_input"]["w"]).max()) > 0
    assert float(jnp.abs(g["fusion"]["w"]).max()) > 0
    assert float(jnp.abs(g["pt_pred"]["w"]).max()) > 0
    assert float(jnp.abs(g["roi_0_a"]["w"]).max()) > 0

    dets = pv.predict(params, jnp.asarray(pts), anchors, cfg, score_thr=0.0)
    assert dets[0]["boxes"].shape[1] == 7

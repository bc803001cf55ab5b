"""PV-RCNN++: SPC keypoint sampling + VectorPool aggregation
(pcdet pv_rcnn_plusplus.py, voxel_set_abstraction.py:46-122,
pointnet2_stack VectorPoolAggregationModule semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.models import pv_rcnn_pp as pp, second


SMALL = pp.PVRCNNPPConfig(
    stage1=second.SECONDConfig(
        voxel_size=(0.1, 0.1, 0.2),
        pc_range=(0.0, -3.2, -3.0, 6.4, 3.2, 2.0),
        spatial_shape=(25, 64, 64),
        max_voxels=256,
        widths=(4, 4, 8, 8, 8, 8),
        bev_channels=(8, 16),
        up_channels=8,
    ),
    num_keypoints=24,
    num_sectors=4,
    out_features=16,
    vp_layers=(
        ("raw_points", pp.VectorPoolConfig(2, 0.4, 8, 8, 8)),
        ("x_conv4", pp.VectorPoolConfig(2, 2.4, 8, 8, 8, stride=8)),
    ),
    point_cls_fc=(16,),
    num_rois=8,
    fg_per=4,
    grid_size=3,
    roi_vp=pp.VectorPoolConfig(2, 0.8, 8, 8, 8),
    shared_fc=(16,),
    cls_fc=(16,),
    reg_fc=(16,),
    proposal_pre=64,
)


def test_spc_sampling_prefers_roi_neighborhood():
    cfg = SMALL
    xyz = np.zeros((1, 32, 3), np.float32)
    # 16 points clustered near the roi, 16 far away
    xyz[0, :16] = np.random.default_rng(0).uniform(1.5, 2.5, (16, 3)) * [1, 0.2, 0.2]
    xyz[0, 16:] = np.array([50.0, 50.0, 0.0]) + np.random.default_rng(1).uniform(0, 1, (16, 3))
    rois = jnp.asarray([[[2.0, 0.2, 0.2, 3.0, 1.5, 1.5, 0.0]]])
    rv = jnp.asarray([[True]])
    kp = pp.spc_sampling(jnp.asarray(xyz), jnp.ones((1, 32), bool), rois, rv, cfg)
    assert kp.shape == (1, cfg.num_keypoints, 3)
    # every keypoint comes from the near cluster (far points are out of
    # the proposal-centric radius)
    assert float(kp[..., 0].max()) < 10.0


def test_vector_pool_subvoxel_means():
    """A single neighbor in one octant must land only in that octant's
    slot, with rel-xyz appended and that slot's weights applied."""
    vp = pp.VectorPoolConfig(nvox=2, radius=1.0, nsample=4, agg=4, post=8)
    v = 8
    cin = 1
    # local_w: identity-ish so slot occupancy is readable in the output
    local_w = np.zeros((v, cin + 3, vp.agg), np.float32)
    local_w[:, 0, 0] = 1.0  # pass the feature into channel 0
    params = {
        "local_w": jnp.asarray(local_w),
        "post": {"w": jnp.eye(v * vp.agg, 8), "b": jnp.zeros((8,))},
    }
    centers = jnp.zeros((1, 1, 3))
    points = jnp.asarray([[[0.5, 0.5, 0.5]]])  # octant (+,+,+) -> slot 7
    feats = jnp.asarray([[[3.0]]])
    valid = jnp.ones((1, 1), bool)
    out = pp.vector_pool(centers, points, feats, valid, vp, params)
    assert out.shape == (1, 1, 8)
    # post w = eye(32, 8): output j = flat[j]; slot 7 occupies flat
    # positions 28..31; everything before slot 7 is empty -> zeros
    np.testing.assert_allclose(np.asarray(out[0, 0]), 0.0, atol=1e-6)
    # read the raw local activations instead via a wide identity post
    params2 = {
        "local_w": jnp.asarray(local_w),
        "post": {"w": jnp.eye(v * vp.agg), "b": jnp.zeros((v * vp.agg,))},
    }
    out2 = np.asarray(pp.vector_pool(centers, points, feats, valid, vp, params2))
    flat = out2[0, 0]
    assert abs(flat[7 * vp.agg + 0] - 3.0) < 1e-5  # slot 7 got feature 3
    assert np.abs(flat[: 7 * vp.agg]).max() == 0.0  # other slots empty


def test_vector_pool_chunked_matches_direct():
    rng = np.random.default_rng(2)
    vp = pp.VectorPoolConfig(2, 0.7, 8, 4, 8)
    centers = jnp.asarray(rng.uniform(-1, 1, (2, 40, 3)), jnp.float32)
    points = jnp.asarray(rng.uniform(-1, 1, (2, 30, 3)), jnp.float32)
    feats = jnp.asarray(rng.standard_normal((2, 30, 5)), jnp.float32)
    valid = jnp.ones((2, 30), bool)
    params = {
        "local_w": jnp.asarray(rng.standard_normal((8, 8, 4)), jnp.float32),
        "post": {"w": jnp.asarray(rng.standard_normal((32, 8)), jnp.float32),
                 "b": jnp.zeros((8,))},
    }
    a = pp.vector_pool(centers, points, feats, valid, vp, params, chunk=1024)
    b = pp.vector_pool(centers, points, feats, valid, vp, params, chunk=16)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_pv_rcnn_pp_end_to_end_small():
    cfg = SMALL
    params = pp.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(81)
    pts = np.zeros((1, 128, 4), np.float32)
    pts[0, :, 0] = rng.uniform(0, 6.4, 128)
    pts[0, :, 1] = rng.uniform(-3.2, 3.2, 128)
    pts[0, :, 2] = rng.uniform(-3, 2, 128)
    pts[0, :, 3] = rng.uniform(0, 1, 128)
    anchors = jnp.asarray(second.generate_anchors(cfg.stage1))

    gt = jnp.asarray([[[2.0, 0.5, -1.0, 3.2, 1.6, 1.5, 0.3],
                       [0, 0, 0, 0, 0, 0, 0]]], jnp.float32)
    gv = jnp.asarray([[True, False]])
    loss, logs = pp.training_loss(params, jnp.asarray(pts), gt, gv, anchors, cfg)
    assert np.isfinite(float(loss))
    assert {"point_cls", "rcnn_cls", "rcnn_corner"} <= set(logs)

    def loss_fn(p):
        return pp.training_loss(p, jnp.asarray(pts), gt, gv, anchors, cfg)[0]

    g = jax.grad(loss_fn)(params)
    assert float(jnp.abs(g["stage1"]["conv_input"]["w"]).max()) > 0
    assert float(jnp.abs(g["vp_raw_points"]["local_w"]).max()) > 0
    assert float(jnp.abs(g["roi_vp"]["local_w"]).max()) > 0
    assert float(jnp.abs(g["pt_pred"]["w"]).max()) > 0

    dets = pp.predict(params, jnp.asarray(pts), anchors, cfg, score_thr=0.0)
    assert dets[0]["boxes"].shape[1] == 7

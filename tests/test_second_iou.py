"""SECOND-IoU: rotated RoI grid sampling + IoU confidence head
(pcdet second_net_iou.py + roi_heads/second_head.py semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.models import second, second_iou as si


SMALL = si.SECONDIoUConfig(
    stage1=second.SECONDConfig(
        voxel_size=(0.1, 0.1, 0.2),
        pc_range=(0.0, -3.2, -3.0, 6.4, 3.2, 2.0),
        spatial_shape=(25, 64, 64),
        max_voxels=256,
        widths=(4, 4, 8, 8, 8, 8),
        bev_channels=(8, 16),
        up_channels=8,
    ),
    num_rois=8,
    fg_per=4,
    grid_size=3,
    shared_fc=(16,),
    iou_fc=(16,),
    proposal_pre=64,
)


def test_rotated_roi_grid_sample_constant_field():
    """Sampling a constant feature map returns the constant anywhere,
    for any box rotation."""
    cfg = SMALL
    feat = jnp.full((1, 8, 8, 4), 3.25)
    rois = jnp.asarray([[[3.0, 0.0, -1.0, 2.0, 1.0, 1.5, 0.0],
                         [3.0, 0.0, -1.0, 2.0, 1.0, 1.5, 0.7]]])
    out = si.rotated_roi_grid_sample(feat, rois, cfg)
    assert out.shape == (1, 2, 9, 4)
    np.testing.assert_allclose(np.asarray(out), 3.25, atol=1e-5)


def test_rotated_roi_grid_sample_rotation_tracks_gradient():
    """With a feature ramp along x, a 90-degree-rotated box samples the
    same values as the unrotated box samples along y (symmetric box)."""
    cfg = SMALL
    h = w = 8
    ramp = jnp.tile(jnp.arange(w, dtype=jnp.float32)[None, :], (h, 1))
    feat = ramp[None, :, :, None]
    rois0 = jnp.asarray([[[3.2, 0.0, -1.0, 2.0, 2.0, 1.5, 0.0]]])
    rois90 = jnp.asarray([[[3.2, 0.0, -1.0, 2.0, 2.0, 1.5, np.pi / 2]]])
    o0 = np.asarray(si.rotated_roi_grid_sample(feat, rois0, cfg))[0, 0, :, 0]
    o90 = np.asarray(si.rotated_roi_grid_sample(feat, rois90, cfg))[0, 0, :, 0]
    g = cfg.grid_size
    # rotating the sample grid by 90deg permutes the sampled positions
    assert sorted(np.round(o0, 4)) == sorted(np.round(o90, 4))
    # unrotated: values vary along the grid-x axis, constant along grid-y
    o0g = o0.reshape(g, g)
    assert np.allclose(o0g[0], o0g[0, 0])
    assert not np.allclose(o0g[:, 0], o0g[0, 0])


def test_second_iou_end_to_end_small():
    cfg = SMALL
    params = si.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(51)
    pts = np.zeros((1, 128, 4), np.float32)
    pts[0, :, 0] = rng.uniform(0, 6.4, 128)
    pts[0, :, 1] = rng.uniform(-3.2, 3.2, 128)
    pts[0, :, 2] = rng.uniform(-3, 2, 128)
    pts[0, :, 3] = rng.uniform(0, 1, 128)
    anchors = jnp.asarray(second.generate_anchors(cfg.stage1))

    gt = jnp.asarray([[[2.0, 0.5, -1.0, 3.2, 1.6, 1.5, 0.3],
                       [0, 0, 0, 0, 0, 0, 0]]], jnp.float32)
    gv = jnp.asarray([[True, False]])
    loss, logs = si.training_loss(params, jnp.asarray(pts), gt, gv, anchors, cfg)
    assert np.isfinite(float(loss))
    assert "iou" in logs

    def loss_fn(p):
        return si.training_loss(p, jnp.asarray(pts), gt, gv, anchors, cfg)[0]

    g = jax.grad(loss_fn)(params)
    assert float(jnp.abs(g["stage1"]["conv_input"]["w"]).max()) > 0
    assert float(jnp.abs(g["iou_pred"]["w"]).max()) > 0

    dets = si.predict(params, jnp.asarray(pts), anchors, cfg, score_thr=0.0)
    assert dets[0]["boxes"].shape[1] == 7

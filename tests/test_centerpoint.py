"""CenterPoint: residual sparse backbone + center head + decode.

Oracle pattern per SURVEY.md §4: targets/radius checked against
hand-computed values from the reference formulas
(pcdet centernet_utils.py / center_head.py), end-to-end at KITTI grid
geometry like the SECOND test.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.models import centerpoint as cp


SMALL = dataclasses.replace(
    cp.CenterPointConfig(),
    spatial_shape=(25, 64, 64),
    pc_range=(0.0, -3.2, -3.0, 6.4, 3.2, 2.0),
    voxel_size=(0.1, 0.1, 0.2),
    max_voxels=256,
    widths=(4, 4, 8, 8, 8, 8),
    bev_channels=(8, 16),
    up_channels=8,
    bev_layer_num=2,
    shared_ch=8,
    post_center_range=(-10, -10, -10, 10, 10, 10),
)


def test_gaussian_radius_oracle():
    """Matches the reference formula (centernet_utils.py:9-35) including
    its divide-by-2 quirk on r2/r3."""
    h = np.array([4.0, 10.0, 2.5], np.float32)
    w = np.array([6.0, 3.0, 2.5], np.float32)
    o = 0.1

    def oracle(hh, ww):
        b1 = hh + ww
        c1 = ww * hh * (1 - o) / (1 + o)
        r1 = (b1 + np.sqrt(b1**2 - 4 * c1)) / 2
        b2 = 2 * (hh + ww)
        c2 = (1 - o) * ww * hh
        r2 = (b2 + np.sqrt(b2**2 - 16 * c2)) / 2
        a3 = 4 * o
        b3 = -2 * o * (hh + ww)
        c3 = (o - 1) * ww * hh
        r3 = (b3 + np.sqrt(b3**2 - 4 * a3 * c3)) / 2
        return min(r1, r2, r3)

    got = np.asarray(cp.gaussian_radius(jnp.asarray(h), jnp.asarray(w), o))
    want = [oracle(hh, ww) for hh, ww in zip(h, w)]
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_assign_targets_single_box():
    cfg = SMALL
    fh, fw = cfg.bev_hw  # 8x8 map, cell = 0.8m
    gt = jnp.asarray([[2.0, 0.5, -1.0, 3.2, 1.6, 1.5, 0.3],
                      [0, 0, 0, 0, 0, 0, 0]], jnp.float32)
    lab = jnp.asarray([1, 0], jnp.int32)
    val = jnp.asarray([True, False])
    t = cp.assign_targets(gt, lab, val, cfg)
    assert t["heatmap"].shape == (fh, fw, cfg.num_classes)
    # center: x=(2.0-0)/0.1/8=2.5 -> ix 2; y=(0.5+3.2)/0.1/8=4.625 -> iy 4
    hm = np.asarray(t["heatmap"])
    assert hm[4, 2, 1] == 1.0  # peak at the int center, class 1
    assert hm[:, :, 0].max() == 0 and hm[:, :, 2].max() == 0
    assert hm[4, 3, 1] < 1.0 and hm[4, 3, 1] > 0  # decays inside window
    # regression targets (center_head.py:147-151)
    tb = np.asarray(t["target_boxes"])[0]
    np.testing.assert_allclose(tb[:2], [0.5, 0.625], atol=1e-5)
    np.testing.assert_allclose(tb[2], -1.0)
    np.testing.assert_allclose(tb[3:6], np.log([3.2, 1.6, 1.5]), atol=1e-5)
    np.testing.assert_allclose(tb[6:], [np.cos(0.3), np.sin(0.3)], atol=1e-6)
    assert int(t["inds"][0]) == 4 * fw + 2
    assert bool(t["mask"][0]) and not bool(t["mask"][1])


def test_focal_loss_perfect_prediction_near_zero():
    gt = jnp.zeros((4, 4, 2)).at[1, 1, 0].set(1.0)
    pred = jnp.clip(gt, 1e-4, 1 - 1e-4)
    loss = float(cp.focal_loss_centernet(pred, gt))
    assert loss < 1e-2
    worse = jnp.clip(1 - gt, 1e-4, 1 - 1e-4)
    assert float(cp.focal_loss_centernet(worse, gt)) > loss + 1.0


def test_centerpoint_small_end_to_end():
    """forward -> loss -> grads reach the sparse stem; decode recovers
    the planted peak."""
    cfg = SMALL
    params = cp.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    pts = np.zeros((1, 128, 4), np.float32)
    pts[0, :, 0] = rng.uniform(0, 6.4, 128)
    pts[0, :, 1] = rng.uniform(-3.2, 3.2, 128)
    pts[0, :, 2] = rng.uniform(-3, 2, 128)
    pts[0, :, 3] = rng.uniform(0, 1, 128)
    preds = cp.forward(params, jnp.asarray(pts), cfg)
    fh, fw = cfg.bev_hw
    assert preds["hm"].shape == (1, fh, fw, cfg.num_classes)
    assert preds["center"].shape == (1, fh, fw, 2)
    assert preds["rot"].shape == (1, fh, fw, 2)
    assert all(np.isfinite(np.asarray(v)).all() for v in preds.values())

    gt = jnp.asarray([[[2.0, 0.5, -1.0, 3.2, 1.6, 1.5, 0.3],
                       [0, 0, 0, 0, 0, 0, 0]]], jnp.float32)
    lab = jnp.asarray([[1, 0]], jnp.int32)
    val = jnp.asarray([[True, False]])
    loss, logs = cp.detection_loss(preds, gt, lab, val, cfg)
    assert np.isfinite(float(loss)) and float(loss) > 0

    def loss_fn(p):
        pr = cp.forward(p, jnp.asarray(pts), cfg)
        return cp.detection_loss(pr, gt, lab, val, cfg)[0]

    g = jax.grad(loss_fn)(params)
    assert float(jnp.abs(g["conv_input"]["w"]).max()) > 0
    assert float(jnp.abs(g["res4_a1"]["w"]).max()) > 0


def test_decode_recovers_planted_peak():
    cfg = SMALL
    fh, fw = cfg.bev_hw
    hm = np.full((1, fh, fw, cfg.num_classes), -8.0, np.float32)
    hm[0, 4, 2, 1] = 8.0  # strong peak, class 1
    zeros = np.zeros((1, fh, fw, 2), np.float32)
    preds = {
        "hm": jnp.asarray(hm),
        "center": jnp.asarray(zeros) + 0.5,
        "center_z": jnp.asarray(zeros[..., :1]) - 1.0,
        "dim": jnp.asarray(np.log(np.asarray([3.2, 1.6, 1.5], np.float32)))
        * jnp.ones((1, fh, fw, 3)),
        "rot": jnp.concatenate(
            [jnp.cos(0.3) * jnp.ones((1, fh, fw, 1)),
             jnp.sin(0.3) * jnp.ones((1, fh, fw, 1))], axis=-1,
        ),
    }
    out = cp.decode(preds, cfg, k=8)[0]
    top = np.argmax(out["scores"])
    assert out["valid"][top]
    assert out["labels"][top] == 1
    # x = (2 + 0.5)*0.8 + 0 = 2.0 ; y = (4 + 0.5)*0.8 - 3.2 = 0.4
    np.testing.assert_allclose(out["boxes"][top][:2], [2.0, 0.4], atol=1e-5)
    np.testing.assert_allclose(out["boxes"][top][3:6], [3.2, 1.6, 1.5], rtol=1e-5)
    np.testing.assert_allclose(out["boxes"][top][6], 0.3, atol=1e-5)


def test_gaussian_radius_3dal_formula():
    """The 3DAL variant divides every root by 2a
    (gaussian_radius_3dal, centernet_utils.py:37-62) — differs from the
    upstream-quirk mode and matches the corrected closed form."""
    h = jnp.asarray([4.0, 10.0, 2.5])
    w = jnp.asarray([6.0, 3.0, 2.5])
    base = np.asarray(cp.gaussian_radius(h, w, 0.1, "centerpoint"))
    corr = np.asarray(cp.gaussian_radius(h, w, 0.1, "3dal"))
    assert (corr != base).any()
    # full formula check at one point: corrected r2 /8, r3 /(2*a3)
    hh, ww, o = 4.0, 6.0, 0.1
    b2 = 2 * (hh + ww)
    c2 = (1 - o) * ww * hh
    r2 = (b2 + np.sqrt(b2**2 - 16 * c2)) / 8
    a3 = 4 * o
    b3 = -2 * o * (hh + ww)
    c3 = (o - 1) * ww * hh
    r3 = (b3 + np.sqrt(b3**2 - 4 * a3 * c3)) / (2 * a3)
    b1 = hh + ww
    c1 = ww * hh * (1 - o) / (1 + o)
    r1 = (b1 + np.sqrt(b1**2 - 4 * c1)) / 2
    want = min(r1, r2, r3)
    got = float(cp.gaussian_radius(jnp.asarray([hh]), jnp.asarray([ww]), o, "3dal")[0])
    assert abs(got - want) < 1e-4


def test_assign_targets_3dal_mode_runs():
    import dataclasses as dc

    cfg = dc.replace(SMALL, radius_mode="3dal")
    gt = jnp.asarray([[2.0, 0.5, -1.0, 3.2, 1.6, 1.5, 0.3]])
    t = cp.assign_targets(gt, jnp.asarray([1]), jnp.asarray([True]), cfg)
    assert float(t["heatmap"].max()) == 1.0


# --- nuScenes variant: multihead class groups + velocity --------------------

NUSC_SMALL = dataclasses.replace(
    SMALL,
    num_classes=5,
    class_groups=((0,), (1, 2), (3, 4)),
    velocity=True,
    code_weights=(1.0,) * 6 + (0.2, 0.2, 1.0, 1.0),
    loc_weight=0.25,
)


def test_multihead_forward_shapes_and_params():
    cfg = NUSC_SMALL
    params = cp.init(cfg, jax.random.PRNGKey(0))
    # one stack per group per branch, legacy name absent
    assert "head0_hm" in params and "head2_vel" in params
    assert "head_hm" not in params
    pts = np.random.default_rng(0).uniform(
        [0, -3, -2.5], [6, 3, 1.5], (2, 200, 3)
    ).astype(np.float32)
    pts = np.concatenate([pts, np.ones((2, 200, 1), np.float32)], -1)
    preds = cp.forward(params, jnp.asarray(pts), cfg)
    assert isinstance(preds, (list, tuple)) and len(preds) == 3
    fh, fw = cfg.bev_hw
    assert preds[0]["hm"].shape == (2, fh, fw, 1)
    assert preds[1]["hm"].shape == (2, fh, fw, 2)
    assert preds[2]["vel"].shape == (2, fh, fw, 2)


def test_multihead_velocity_loss_and_gradients():
    """Each group head only sees its own classes; velocity targets flow
    and every group's params receive gradient."""
    cfg = NUSC_SMALL
    params = cp.init(cfg, jax.random.PRNGKey(1))
    rng = np.random.default_rng(3)
    pts = rng.uniform([0, -3, -2.5], [6, 3, 1.5], (1, 300, 3)).astype(np.float32)
    pts = np.concatenate([pts, np.ones((1, 300, 1), np.float32)], -1)
    # classes 0 (group 0), 2 (group 1), 4 (group 2), with velocities
    gt = jnp.asarray(
        [[[2.0, 0.0, -0.5, 3.0, 1.6, 1.5, 0.2, 1.5, -0.5],
          [4.0, 1.0, -0.5, 2.5, 1.5, 1.4, -0.1, 0.0, 2.0],
          [3.0, -1.0, -0.5, 0.8, 0.8, 1.7, 0.0, 0.3, 0.1]]],
        jnp.float32,
    )
    labels = jnp.asarray([[0, 2, 4]], jnp.int32)
    valid = jnp.ones((1, 3), bool)

    def loss_fn(p):
        preds = cp.forward(p, jnp.asarray(pts), cfg)
        return cp.detection_loss(preds, gt, labels, valid, cfg)[0]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    for gi in range(3):
        g = grads[f"head{gi}_hm"][-1]["w"]
        assert float(jnp.abs(g).sum()) > 0, f"no grad into group {gi} hm"
        gv = grads[f"head{gi}_vel"][-1]["w"]
        assert float(jnp.abs(gv).sum()) > 0, f"no grad into group {gi} vel"


def test_multihead_group_target_isolation():
    """A class-1 object must create targets only in group 1's heatmap
    (local channel 0) and none in groups 0/2."""
    cfg = NUSC_SMALL
    gt = jnp.asarray([[3.0, 0.0, -0.5, 2.0, 2.0, 1.5, 0.0, 0.5, -0.2]])
    labels = jnp.asarray([1], jnp.int32)
    # group 1 = (1, 2): member, local id 0
    grp = jnp.asarray((1, 2))
    member = (labels[..., None] == grp).any(-1)
    local = jnp.argmax(labels[..., None] == grp, axis=-1)
    t = cp.assign_targets(gt, local, member, cfg, 2)
    assert t["heatmap"].shape[-1] == 2
    assert float(t["heatmap"][..., 0].max()) == 1.0
    assert float(t["heatmap"][..., 1].max()) == 0.0
    # velocity columns land in target cols 8:10
    assert np.allclose(np.asarray(t["target_boxes"][0, 8:10]), [0.5, -0.2])
    # non-member groups produce an empty heatmap
    grp0 = jnp.asarray((0,))
    member0 = (labels[..., None] == grp0).any(-1)
    t0 = cp.assign_targets(gt, jnp.zeros_like(labels), member0, cfg, 1)
    assert float(t0["heatmap"].max()) == 0.0


def test_multihead_decode_global_labels_and_velocity():
    """Decode remaps group-local argmax channels to global class ids and
    carries (vx, vy) in box columns 7:9."""
    cfg = NUSC_SMALL
    fh, fw = cfg.bev_hw
    zeros = jnp.full((1, fh, fw, 1), -10.0)

    def head(hm_ch, peak_ch=None, y=8, x=8, vel=(0.0, 0.0)):
        hm = jnp.full((1, fh, fw, hm_ch), -10.0)
        if peak_ch is not None:
            hm = hm.at[0, y, x, peak_ch].set(6.0)  # sigmoid ~ 1
        return {
            "hm": hm,
            "center": jnp.zeros((1, fh, fw, 2)),
            "center_z": jnp.zeros((1, fh, fw, 1)),
            "dim": jnp.zeros((1, fh, fw, 3)),
            "rot": jnp.concatenate(
                [jnp.ones((1, fh, fw, 1)), jnp.zeros((1, fh, fw, 1))], -1
            ),
            "vel": jnp.broadcast_to(
                jnp.asarray(vel, jnp.float32), (1, fh, fw, 2)
            ),
        }

    preds = [
        head(1, None),                      # group (0,): silent
        head(2, 1, y=3, x=4, vel=(1.5, -0.5)),  # group (1,2) local 1 -> class 2
        head(2, 0, y=5, x=6, vel=(0.0, 2.0)),   # group (3,4) local 0 -> class 3
    ]
    out = cp.decode(preds, cfg, k=4)[0]
    got = {
        int(l): b for l, b, v in zip(out["labels"], out["boxes"], out["valid"])
        if v
    }
    assert set(got) == {2, 3}
    assert np.allclose(got[2][7:9], [1.5, -0.5], atol=1e-5)
    assert np.allclose(got[3][7:9], [0.0, 2.0], atol=1e-5)

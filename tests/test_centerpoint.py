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

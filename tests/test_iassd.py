"""IA-SSD: instance-aware sampling, BinOri coder, centerness, votes.

Oracle pattern per SURVEY.md §4 (pcdet IASSD_backbone.py, IASSD_head.py,
PointResidual_BinOri_Coder semantics at small geometry)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.models import iassd


SMALL = iassd.IASSDConfig(
    stages=(
        iassd.IASSDStage("sa", 32, "d-fps", (0.5, 1.0), (8, 8),
                         ((8, 8), (8, 8)), agg=8, conf=8, layer_input=0),
        iassd.IASSDStage("sa", 16, "ctr-aware", (1.0, 2.0), (8, 8),
                         ((8, 16), (8, 16)), agg=16, conf=16, layer_input=1),
        iassd.IASSDStage("sa", 8, "ctr-aware", layer_input=2, agg=16),
        iassd.IASSDStage("vote", layer_input=3, vote_mlp=(8,)),
        iassd.IASSDStage("sa", -1, "d-fps", (2.0, 4.0), (8, 8),
                         ((16, 16), (16, 32)), agg=32,
                         layer_input=2, ctr_input=4),
    ),
    cls_fc=(16,),
    reg_fc=(16,),
)


def test_binori_coder_roundtrip():
    cfg = SMALL
    points = jnp.asarray([[1.0, 2.0, -0.5], [3.0, -1.0, -1.0]])
    gt = jnp.asarray([[1.5, 2.2, -0.4, 3.9, 1.6, 1.5, 0.4],
                      [3.1, -0.8, -1.1, 0.8, 0.6, 1.7, -2.2]])
    cls = jnp.asarray([0, 1])
    res, bin_id, bin_res = iassd.binori_encode(gt, points, cls, cfg)
    assert res.shape == (2, 6)
    assert (np.asarray(bin_id) >= 0).all()
    assert (np.asarray(bin_id) < cfg.angle_bins).all()
    assert (np.abs(np.asarray(bin_res)) <= 1.0 + 1e-5).all()
    # build the full encoding and decode back
    nb = cfg.angle_bins
    enc = np.zeros((2, cfg.box_code), np.float32)
    enc[:, :6] = np.asarray(res)
    enc[np.arange(2), 6 + np.asarray(bin_id)] = 10.0  # bin logits peak
    enc[np.arange(2), 6 + nb + np.asarray(bin_id)] = np.asarray(bin_res)
    dec = iassd.binori_decode(jnp.asarray(enc), points, cls, cfg)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(gt), atol=1e-5)


def test_centerness_peaks_at_center():
    box = jnp.tile(jnp.asarray([[2.0, 1.0, -1.0, 4.0, 2.0, 1.5, 0.3]]), (3, 1))
    pts = jnp.asarray([
        [2.0, 1.0, -1.0],      # exact center -> 1
        [2.5, 1.0, -1.0],      # off center -> < 1
        [30.0, 30.0, -1.0],    # outside -> ~0
    ])
    c = np.asarray(iassd.centerness(pts, box))
    assert abs(c[0] - 1.0) < 1e-3
    assert 0.0 < c[1] < c[0]
    assert c[2] < 1e-2


def test_assign_center_targets_enlarged():
    cfg = SMALL
    origin = jnp.asarray([[[2.0, 0.5, -1.0], [2.0, 1.6, -1.0], [9.0, 9.0, 9.0]]])
    gt = jnp.asarray([[[2.0, 0.5, -1.0, 3.2, 1.6, 1.5, 0.0]]])
    gl = jnp.asarray([[1]])
    gv = jnp.asarray([[True]])
    fg, cls, box = iassd.assign_center_targets(origin, gt, gl, gv, cfg)
    assert bool(fg[0, 0])
    assert bool(fg[0, 1])  # inside the +1.0m enlarged box
    assert not bool(fg[0, 2])
    assert int(cls[0, 0]) == 1


def test_iassd_end_to_end_small():
    cfg = SMALL
    params = iassd.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(41)
    pts = np.zeros((1, 64, 4), np.float32)
    pts[0, :, 0] = rng.uniform(0, 6.4, 64)
    pts[0, :, 1] = rng.uniform(-3.2, 3.2, 64)
    pts[0, :, 2] = rng.uniform(-3, 2, 64)
    pts[0, :, 3] = rng.uniform(0, 1, 64)

    out = iassd.forward(params, jnp.asarray(pts), cfg)
    assert out["centers"].shape == (1, 8, 3)
    assert out["centers_origin"].shape == (1, 8, 3)
    assert out["ctr_offsets"].shape == (1, 8, 3)
    assert out["center_cls"].shape == (1, 8, cfg.num_classes)
    assert out["center_reg"].shape == (1, 8, cfg.box_code)
    assert len(out["sa_ins"]) == 2
    # vote offsets are clipped to the configured translate range
    assert float(jnp.abs(out["ctr_offsets"][..., 0]).max()) <= 3.0 + 1e-6
    assert float(jnp.abs(out["ctr_offsets"][..., 2]).max()) <= 2.0 + 1e-6

    gt = jnp.asarray([[[2.0, 0.5, -1.0, 3.2, 1.6, 1.5, 0.3],
                       [0, 0, 0, 0, 0, 0, 0]]], jnp.float32)
    gl = jnp.asarray([[0, 0]], jnp.int32)
    gv = jnp.asarray([[True, False]])
    loss, logs = iassd.training_loss(params, jnp.asarray(pts), gt, gl, gv, cfg)
    assert np.isfinite(float(loss))
    assert {"cls", "vote", "corner", "ins"} <= set(logs)

    def loss_fn(p):
        return iassd.training_loss(p, jnp.asarray(pts), gt, gl, gv, cfg)[0]

    g = jax.grad(loss_fn)(params)
    assert float(jnp.abs(g["sa0_0"][0]["w"]).max()) > 0
    assert float(jnp.abs(g["vote3_off"]["w"]).max()) > 0
    assert float(jnp.abs(g["conf1_pred"]["w"]).max()) > 0  # aux ins loss
    assert float(jnp.abs(g["reg_pred"]["w"]).max()) > 0

    dets = iassd.predict(params, jnp.asarray(pts), cfg)
    assert dets[0]["boxes"].shape[1] == 7

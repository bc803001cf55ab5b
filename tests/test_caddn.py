"""CaDDN: LID depth bins, frustum features, frustum-to-voxel sampling
(pcdet image_vfe_modules + caddn.py semantics)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.models import caddn


SMALL = caddn.CaDDNConfig(
    image_hw=(32, 64),
    depth_min=2.0,
    depth_max=10.0,
    num_bins=16,
    stem=(8, 16),
    frustum_ch=8,
    pc_range=(2.0, -4.0, -2.0, 10.0, 4.0, 1.0),
    grid_size=(16, 16, 6),
    bev_channels=(8, 16),
    up_channels=8,
    bev_layer_num=1,
)


def _calib():
    """lidar (x fwd, y left, z up) -> cam (z fwd, x right, y down)."""
    l2c = np.zeros((4, 4), np.float32)
    l2c[0, 1] = -1.0  # cam x = -lidar y
    l2c[1, 2] = -1.0  # cam y = -lidar z
    l2c[2, 0] = 1.0   # cam z = lidar x
    l2c[3, 3] = 1.0
    f, cx, cy = 32.0, 32.0, 16.0
    c2i = np.asarray(
        [[f, 0, cx, 0], [0, f, cy, 0], [0, 0, 1, 0]], np.float32
    )
    return jnp.asarray(l2c)[None], jnp.asarray(c2i)[None]


def test_lid_bins_roundtrip_and_overflow():
    cfg = SMALL
    d = jnp.linspace(cfg.depth_min + 0.01, cfg.depth_max - 0.01, 50)
    idx = caddn.depth_to_bin(d, cfg)
    assert int(idx.min()) >= 0 and int(idx.max()) < cfg.num_bins
    assert (np.diff(np.asarray(idx)) >= 0).all()  # monotone
    rec = caddn.bin_to_depth(idx, cfg)
    # reconstruction error bounded by the local bin width (LID bins grow
    # linearly with index)
    bin_size = 2 * (cfg.depth_max - cfg.depth_min) / (
        cfg.num_bins * (1 + cfg.num_bins)
    )
    widths = bin_size * (np.asarray(idx) + 1)
    assert (np.abs(np.asarray(rec - d)) <= widths + 1e-5).all()
    # out of range -> overflow bin
    assert int(caddn.depth_to_bin(jnp.asarray(0.5), cfg)) == cfg.num_bins
    assert int(caddn.depth_to_bin(jnp.asarray(99.0), cfg)) == cfg.num_bins


def test_frustum_features_outer_product():
    b, h, w, c, dd = 1, 2, 2, 3, 4
    feats = jnp.ones((b, h, w, c))
    logits = jnp.zeros((b, h, w, dd + 1))
    out = caddn.frustum_features(feats, logits)
    assert out.shape == (b, dd, h, w, c)
    # uniform softmax over D+1 bins -> each kept bin has prob 1/(D+1)
    np.testing.assert_allclose(np.asarray(out), 1.0 / (dd + 1), atol=1e-6)


def test_frustum_to_voxel_hits_expected_cell():
    cfg = SMALL
    l2c, c2i = _calib()
    hf, wf = cfg.feat_hw
    vol = np.zeros((1, cfg.num_bins, hf, wf, 2), np.float32)
    # voxel center at x=6.25, y=0.25, z=-0.25 (voxel 8, 8, 3 of 16x16x6)
    # cam: (u, v) = (f*(-y)/x + cx, f*(0.25)/x + cy), depth = x
    x, y, z = 6.25, 0.25, -0.25
    u = 32.0 * (-y) / x + 32.0
    v = 32.0 * (-z) / x + 16.0
    db = int(caddn.depth_to_bin(jnp.asarray(x), cfg))
    uf, vf = u / cfg.feat_stride - 0.5, v / cfg.feat_stride - 0.5
    vol[0, db, int(round(vf)), int(round(uf))] = 7.0
    out = caddn.frustum_to_voxel(jnp.asarray(vol), l2c, c2i, cfg)
    assert out.shape == (1, 16, 16, 6, 2)
    got = float(out[0, 8, 8, 3, 0])
    assert got > 1.0  # bilinear mass lands on the voxel
    # a voxel far from the lit cell stays zero
    assert float(jnp.abs(out[0, 0, 0, 0]).max()) == 0.0


def test_caddn_end_to_end_small():
    cfg = SMALL
    params = caddn.init(cfg, jax.random.PRNGKey(0))
    l2c, c2i = _calib()
    rng = np.random.default_rng(91)
    images = jnp.asarray(rng.uniform(0, 1, (1, 32, 64, 3)), jnp.float32)
    preds, depth_logits = caddn.forward(params, images, l2c, c2i, cfg)
    hf, wf = cfg.feat_hw
    assert depth_logits.shape == (1, hf, wf, cfg.num_bins + 1)
    fy, fx = cfg.bev_hw
    assert preds["cls_logits"].shape == (1, fy * fx * cfg.anchors.per_cell, 1)
    assert np.isfinite(np.asarray(preds["cls_logits"])).all()

    anchors = jnp.asarray(caddn.generate_anchors(cfg))
    gt = jnp.asarray([[[6.0, 0.5, -1.0, 3.9, 1.6, 1.56, 0.0],
                       [0, 0, 0, 0, 0, 0, 0]]], jnp.float32)
    gv = jnp.asarray([[True, False]])
    depth_maps = jnp.full((1, hf, wf), 6.0)
    fg = jnp.zeros((1, hf, wf), bool).at[:, 2:6, 4:12].set(True)
    loss, logs = caddn.training_loss(
        params, images, l2c, c2i, depth_maps, fg, gt, gv, anchors, cfg
    )
    assert np.isfinite(float(loss))
    assert "depth" in logs

    def loss_fn(p):
        return caddn.training_loss(
            p, images, l2c, c2i, depth_maps, fg, gt, gv, anchors, cfg
        )[0]

    g = jax.grad(loss_fn)(params)
    assert float(jnp.abs(g["stem0"]["w"]).max()) > 0
    assert float(jnp.abs(g["depth_head"]["w"]).max()) > 0
    assert float(jnp.abs(g["cls_w"]).max()) > 0


def test_depth_loss_prefers_correct_bins():
    cfg = SMALL
    hf, wf = 4, 4
    depth_maps = jnp.full((1, hf, wf), 6.0)
    target = int(caddn.depth_to_bin(jnp.asarray(6.0), cfg))
    good = jnp.full((1, hf, wf, cfg.num_bins + 1), -5.0).at[..., target].set(5.0)
    bad = jnp.full((1, hf, wf, cfg.num_bins + 1), -5.0).at[..., 0].set(5.0)
    fg = jnp.ones((1, hf, wf), bool)
    lg = float(caddn.depth_loss(good, depth_maps, fg, cfg))
    lb = float(caddn.depth_loss(bad, depth_maps, fg, cfg))
    assert lg < 0.01 < lb

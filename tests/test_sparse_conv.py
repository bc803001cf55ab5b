"""Sparse 3D conv engine vs dense-conv oracle + SECOND detector.

Kernel-test pattern per SURVEY.md §4 (optimized path vs reference
implementation + gradient check), applied to the spconv replacement.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metatransformer_tpu.models import second
from metatransformer_tpu.ops import sparse_conv as sp


def _random_sparse(key, n_active=40, cap=64, shape=(6, 8, 10), b=2, c=5):
    """Random active voxel set with unique coords."""
    rng = np.random.default_rng(key)
    d, h, w = shape
    total = b * d * h * w
    flat = rng.choice(total, size=n_active, replace=False)
    coords = np.zeros((cap, 4), np.int32)
    coords[:n_active, 0] = flat // (d * h * w)
    coords[:n_active, 1] = (flat // (h * w)) % d
    coords[:n_active, 2] = (flat // w) % h
    coords[:n_active, 3] = flat % w
    valid = np.zeros((cap,), bool)
    valid[:n_active] = True
    feats = rng.standard_normal((cap, c)).astype(np.float32) * valid[:, None]
    return sp.SparseTensor(
        features=jnp.asarray(feats), coords=jnp.asarray(coords),
        valid=jnp.asarray(valid), spatial_shape=shape, batch_size=b,
    )


def test_subm_conv_matches_masked_dense():
    """SubMConv3d == dense conv3d evaluated at the active positions."""
    st = _random_sparse(0)
    w = jnp.asarray(
        np.random.default_rng(1).standard_normal((3, 3, 3, 5, 7)), jnp.float32
    )
    out = sp.subm_conv3d(st, w)
    dense = sp.dense_conv3d_oracle(st, w)
    want = dense[st.coords[:, 0], st.coords[:, 1], st.coords[:, 2], st.coords[:, 3]]
    got = np.asarray(out.features)
    keep = np.asarray(st.valid)
    np.testing.assert_allclose(got[keep], np.asarray(want)[keep], atol=1e-4)
    assert (got[~keep] == 0).all()


def test_strided_sparse_conv_matches_dense_at_outputs():
    """Strided conv values == dense strided conv at the emitted positions."""
    st = _random_sparse(2, shape=(6, 8, 8))
    w = jnp.asarray(
        np.random.default_rng(3).standard_normal((3, 3, 3, 5, 4)), jnp.float32
    )
    out = sp.sparse_conv3d(st, w, (2, 2, 2), (1, 1, 1))
    assert out.spatial_shape == (3, 4, 4)
    dense = sp.dense_conv3d_oracle(st, w, stride=(2, 2, 2), padding=(1, 1, 1))
    keep = np.asarray(out.valid)
    co = np.asarray(out.coords)[keep]
    want = np.asarray(dense)[co[:, 0], co[:, 1], co[:, 2], co[:, 3]]
    np.testing.assert_allclose(np.asarray(out.features)[keep], want, atol=1e-4)
    # output positions are unique
    keys = (co[:, 0] * 3 * 4 * 4 + co[:, 1] * 16 + co[:, 2] * 4 + co[:, 3])
    assert len(np.unique(keys)) == keep.sum()


def test_sparse_conv_grads_flow():
    st = _random_sparse(4)
    w = jnp.asarray(
        np.random.default_rng(5).standard_normal((3, 3, 3, 5, 4)), jnp.float32
    )

    def loss(w, f):
        st2 = dataclasses.replace(st, features=f)
        o = sp.subm_conv3d(st2, w)
        o = sp.sparse_conv3d(o, jnp.ones((3, 3, 3, 4, 4)) * 0.1, (2, 2, 2), (1, 1, 1))
        return jnp.sum(o.features**2)

    gw, gf = jax.grad(loss, argnums=(0, 1))(w, st.features)
    assert np.isfinite(np.asarray(gw)).all() and float(jnp.abs(gw).max()) > 0
    assert np.isfinite(np.asarray(gf)).all() and float(jnp.abs(gf).max()) > 0


def test_voxelize_points_mean_vfe():
    pts = jnp.asarray(
        [[[0.05, 0.05, 0.05, 1.0],  # voxel (0,0,0)
          [0.08, 0.02, 0.01, 3.0],  # same voxel
          [0.35, 0.05, 0.05, 5.0],  # voxel x=3
          [9.0, 9.0, 9.0, 7.0]]]    # out of range
    )
    valid = jnp.ones((1, 4), bool)
    st = sp.voxelize_points(
        pts, valid, (0.1, 0.1, 0.1), (0, 0, 0, 1, 1, 1), (10, 10, 10), 8
    )
    v = np.asarray(st.valid)
    assert v.sum() == 2
    feats = np.asarray(st.features)[v]
    coords = np.asarray(st.coords)[v]
    i0 = np.where((coords[:, 3] == 0))[0][0]
    i3 = np.where((coords[:, 3] == 3))[0][0]
    np.testing.assert_allclose(feats[i0], [0.065, 0.035, 0.03, 2.0], atol=1e-6)
    np.testing.assert_allclose(feats[i3], [0.35, 0.05, 0.05, 5.0], atol=1e-6)


def test_batch_norm_relu_masked():
    st = _random_sparse(6)
    out = sp.batch_norm_relu(st, jnp.ones((5,)), jnp.zeros((5,)))
    f = np.asarray(out.features)
    assert (f >= 0).all()
    assert (f[~np.asarray(st.valid)] == 0).all()


def test_second_end_to_end_kitti_geometry():
    """SECOND at full KITTI grid geometry: logits + loss + grads."""
    cfg = second.SECONDConfig(max_voxels=512)
    params = second.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    pts = np.zeros((1, 256, 4), np.float32)
    pts[0, :, 0] = rng.uniform(0, 70.0, 256)
    pts[0, :, 1] = rng.uniform(-40, 40, 256)
    pts[0, :, 2] = rng.uniform(-3, 1, 256)
    pts[0, :, 3] = rng.uniform(0, 1, 256)
    preds = second.forward(params, jnp.asarray(pts), cfg)
    fy, fx = cfg.bev_hw
    a_total = fy * fx * cfg.anchors.per_cell
    assert preds["cls_logits"].shape == (1, a_total, 1)
    assert preds["box_deltas"].shape == (1, a_total, 7)
    assert np.isfinite(np.asarray(preds["cls_logits"])).all()

    anchors = jnp.asarray(second.generate_anchors(cfg))
    gt = jnp.asarray([[[20.0, 0.0, -1.0, 3.9, 1.6, 1.56, 0.0],
                       [0, 0, 0, 0, 0, 0, 0]]], jnp.float32)
    gv = jnp.asarray([[True, False]])
    loss, logs = second.detection_loss(preds, anchors, gt, gv, cfg)
    assert np.isfinite(float(loss))

    def loss_fn(p):
        pr = second.forward(p, jnp.asarray(pts), cfg)
        return second.detection_loss(pr, anchors, gt, gv, cfg)[0]

    g = jax.grad(loss_fn)(params)
    assert float(jnp.abs(g["conv_input"]["w"]).max()) > 0  # grads reach stem

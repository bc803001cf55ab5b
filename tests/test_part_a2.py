"""Part-A2 + inverse sparse conv (pcdet spconv_unet.py,
point_intra_part_head.py, PartA2_net.py semantics)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.models import part_a2 as pa, second
from metatransformer_tpu.ops import sparse_conv as sp


def _random_sparse(seed, n_active, cap, shape, b=1, c=3):
    rng = np.random.default_rng(seed)
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


def test_inverse_sparse_conv_matches_transpose_oracle():
    """inverse conv == explicit transposed-conv sum at fine positions."""
    fine = _random_sparse(0, 20, 32, (6, 8, 8), c=3)
    w_np = np.random.default_rng(1).standard_normal((3, 3, 3, 4, 5)).astype(np.float32)
    # build the coarse tensor = strided conv of the fine one
    down_w = np.random.default_rng(2).standard_normal((3, 3, 3, 3, 4)).astype(np.float32)
    coarse = sp.sparse_conv3d(fine, jnp.asarray(down_w), (2, 2, 2), (1, 1, 1))
    out = sp.inverse_sparse_conv3d(
        coarse, fine, jnp.asarray(w_np), (2, 2, 2), (1, 1, 1)
    )
    assert out.spatial_shape == fine.spatial_shape
    assert np.array_equal(np.asarray(out.coords), np.asarray(fine.coords))
    # oracle: out[f] = sum_{c,k : c*s - p + k == f} in[c] @ W[k]
    cf = np.asarray(coarse.features)
    cc = np.asarray(coarse.coords)
    cv = np.asarray(coarse.valid)
    want = np.zeros((fine.capacity, 5), np.float32)
    fc = np.asarray(fine.coords)
    fv = np.asarray(fine.valid)
    for fi in range(fine.capacity):
        if not fv[fi]:
            continue
        for ci in range(coarse.capacity):
            if not cv[ci] or cc[ci, 0] != fc[fi, 0]:
                continue
            for kz in range(3):
                for ky in range(3):
                    for kx in range(3):
                        pos = cc[ci, 1:] * 2 - 1 + np.array([kz, ky, kx])
                        if (pos == fc[fi, 1:]).all():
                            want[fi] += cf[ci] @ w_np[kz, ky, kx]
    np.testing.assert_allclose(np.asarray(out.features), want, atol=1e-3)


SMALL = pa.PartA2Config(
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
    pool_mlp=8,
    shared_fc=(16,),
    cls_fc=(16,),
    reg_fc=(16,),
    proposal_pre=64,
)


def test_part_targets_box_frame():
    cfg = SMALL
    st = sp.SparseTensor(
        features=jnp.zeros((2, 4)),
        # voxel (z=10,y=36,x=19): center x=1.95,y=0.45,z=-0.9 (in box)
        coords=jnp.asarray([[0, 10, 36, 19], [0, 0, 0, 0]], jnp.int32),
        valid=jnp.asarray([True, False]),
        spatial_shape=cfg.stage1.spatial_shape, batch_size=1,
    )
    gt = jnp.asarray([[[2.0, 0.5, -1.0, 3.2, 1.6, 1.5, 0.0]]])
    gv = jnp.asarray([[True]])
    fg, part = pa.part_targets(st, gt, gv, cfg)
    assert bool(fg[0]) and not bool(fg[1])
    p = np.asarray(part[0])
    # local = (-0.05, -0.05, 0.1); part = local/dims + 0.5
    np.testing.assert_allclose(
        p, [0.5 - 0.05 / 3.2, 0.5 - 0.05 / 1.6, 0.5 + 0.1 / 1.5], atol=1e-5
    )


def test_part_a2_end_to_end_small():
    cfg = SMALL
    params = pa.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(61)
    pts = np.zeros((1, 128, 4), np.float32)
    pts[0, :, 0] = rng.uniform(0, 6.4, 128)
    pts[0, :, 1] = rng.uniform(-3.2, 3.2, 128)
    pts[0, :, 2] = rng.uniform(-3, 2, 128)
    pts[0, :, 3] = rng.uniform(0, 1, 128)
    anchors = jnp.asarray(second.generate_anchors(cfg.stage1))

    preds, dec, seg, part = pa.forward(params, jnp.asarray(pts), cfg)
    assert seg.shape == (cfg.stage1.max_voxels,)
    assert part.shape == (cfg.stage1.max_voxels, 3)
    assert float(part.min()) >= 0.0 and float(part.max()) <= 1.0
    assert np.isfinite(np.asarray(dec.features)).all()
    # decoder lives on the stride-1 voxel set
    assert dec.spatial_shape == cfg.stage1.spatial_shape

    gt = jnp.asarray([[[2.0, 0.5, -1.0, 3.2, 1.6, 1.5, 0.3],
                       [0, 0, 0, 0, 0, 0, 0]]], jnp.float32)
    gv = jnp.asarray([[True, False]])
    loss, logs = pa.training_loss(params, jnp.asarray(pts), gt, gv, anchors, cfg)
    assert np.isfinite(float(loss))
    assert {"seg", "part", "rcnn_corner"} <= set(logs)

    def loss_fn(p):
        return pa.training_loss(p, jnp.asarray(pts), gt, gv, anchors, cfg)[0]

    g = jax.grad(loss_fn)(params)
    assert float(jnp.abs(g["stage1"]["conv_input"]["w"]).max()) > 0
    assert float(jnp.abs(g["up4_inv"]["w"]).max()) > 0  # decoder trains
    assert float(jnp.abs(g["part"]["w"]).max()) > 0
    assert float(jnp.abs(g["cls_pred"]["w"]).max()) > 0

    dets = pa.predict(params, jnp.asarray(pts), anchors, cfg, score_thr=0.0)
    assert dets[0]["boxes"].shape[1] == 7

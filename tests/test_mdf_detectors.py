"""MDF wired into real detectors: per-dataset UniNorm + domain attention
inside SECOND/CenterPoint backbones, jointly trained on two synthetic
datasets via the merged-loss step (reference:
``pcdet/utils/uni3d_norm.py:230-372``, ``mdf_models/dense_cr.py:108-148``,
``tools/train_multi_db_merge_loss.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from metatransformer_tpu.models import centerpoint as cp
from metatransformer_tpu.models import mdf_detectors as md
from metatransformer_tpu.models import second
from metatransformer_tpu.train import multi_db

SMALL = md.MDFSECONDConfig(
    base=second.SECONDConfig(
        voxel_size=(0.1, 0.1, 0.2),
        pc_range=(0.0, -3.2, -3.0, 6.4, 3.2, 2.0),
        spatial_shape=(25, 64, 64),
        max_voxels=256,
        widths=(4, 4, 8, 8, 8, 8),
        bev_channels=(8, 16),
        up_channels=8,
    ),
    num_datasets=2,
    reduction=4,
)


def _points(seed, n=128, x_lo=0.0, x_hi=6.4, inten_scale=1.0):
    rng = np.random.default_rng(seed)
    pts = np.zeros((1, n, 4), np.float32)
    pts[0, :, 0] = rng.uniform(x_lo, x_hi, n)
    pts[0, :, 1] = rng.uniform(-3.2, 3.2, n)
    pts[0, :, 2] = rng.uniform(-3, 2, n)
    pts[0, :, 3] = rng.uniform(0, 1, n) * inten_scale
    return jnp.asarray(pts)


def test_stack_select_roundtrip():
    cfg = SMALL
    params = md.init(cfg, jax.random.PRNGKey(0))
    # stacked affines carry the dataset axis
    assert params["conv1"]["bn_scale"].shape == (2, cfg.base.widths[1])
    sel0 = md.select_dataset(params, jnp.int32(0))
    assert sel0["conv1"]["bn_scale"].shape == (cfg.base.widths[1],)
    # conv weights are shared (same object layout, no dataset axis)
    assert sel0["conv1"]["w"].shape == params["conv1"]["w"].shape


def test_forward_switches_dataset_norms():
    """Different dataset ids produce different outputs once the affines
    differ — the UniNorm switch is live in the compiled program."""
    cfg = SMALL
    params = md.init(cfg, jax.random.PRNGKey(0))
    params["conv1"]["bn_scale"] = params["conv1"]["bn_scale"].at[1].mul(2.0)
    pts = _points(3)
    p0 = md.forward(params, pts, cfg, jnp.int32(0))
    p1 = md.forward(params, pts, cfg, jnp.int32(1))
    assert np.isfinite(np.asarray(p0["cls_logits"])).all()
    assert float(jnp.abs(p0["cls_logits"] - p1["cls_logits"]).max()) > 1e-6


def test_merged_loss_trains_and_affines_diverge():
    """Joint training on two synthetic datasets (different point ranges +
    intensity statistics): merged loss halves and the per-dataset norm
    affines diverge (they only receive their own dataset's gradients)."""
    cfg = SMALL
    params = md.init(cfg, jax.random.PRNGKey(0))
    anchors = jnp.asarray(second.generate_anchors(cfg.base))

    # dataset A: near-range points, car at x=2; dataset B: far-range
    # points with hot intensity, car at x=5
    pts_a = _points(7, x_lo=0.0, x_hi=3.2)
    gt_a = jnp.asarray([[[2.0, 0.5, -1.0, 3.2, 1.6, 1.5, 0.3],
                         [0, 0, 0, 0, 0, 0, 0]]], jnp.float32)
    pts_b = _points(8, x_lo=3.2, x_hi=6.4, inten_scale=5.0)
    gt_b = jnp.asarray([[[5.0, -0.5, -1.0, 3.2, 1.6, 1.5, -0.2],
                         [0, 0, 0, 0, 0, 0, 0]]], jnp.float32)
    gv = jnp.asarray([[True, False]])

    def loss_fn(p, batch, dataset_id, rng):
        pts, gt = batch
        return md.training_loss(p, pts, gt, gv, anchors, cfg, dataset_id)[0]

    opt = optax.adam(3e-3)
    step = jax.jit(multi_db.make_merged_step(loss_fn, opt))
    state = opt.init(params)
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(25):
        rng, sub = jax.random.split(rng)
        params, state, metrics = step(
            params, state, (pts_a, gt_a), (pts_b, gt_b), sub
        )
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], losses[::6]
    # UniNorm affines diverged between datasets
    div = float(
        jnp.abs(
            params["conv1"]["bn_scale"][0] - params["conv1"]["bn_scale"][1]
        ).max()
    )
    assert div > 1e-4, div
    bev_div = float(
        jnp.abs(
            params["block0"][0]["gn_scale"][0]
            - params["block0"][0]["gn_scale"][1]
        ).max()
    )
    assert bev_div > 1e-5, bev_div


def test_mdf_centerpoint_forward_and_grads():
    cfg = md.MDFCenterPointConfig(
        base=cp.CenterPointConfig(
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
        ),
        reduction=4,
    )
    params = md.init_centerpoint(cfg, jax.random.PRNGKey(0))
    pts = _points(11)
    gt = jnp.asarray([[[2.0, 0.5, -1.0, 3.2, 1.6, 1.5, 0.3],
                       [0, 0, 0, 0, 0, 0, 0]]], jnp.float32)
    lab = jnp.asarray([[1, 0]], jnp.int32)
    val = jnp.asarray([[True, False]])

    preds = md.forward_centerpoint(params, pts, cfg, jnp.int32(0))
    assert all(np.isfinite(np.asarray(v)).all() for v in preds.values())

    def loss_fn(p, ds):
        return md.training_loss_centerpoint(p, pts, gt, lab, val, cfg, ds)[0]

    g = jax.grad(lambda p: loss_fn(p, jnp.int32(0)))(params)
    # dataset-0 affine gets gradient, dataset-1 affine does not
    g_scale = np.asarray(g["res1_a1"]["bn_scale"])
    assert np.abs(g_scale[0]).max() > 0
    assert np.abs(g_scale[1]).max() == 0
    # domain attention participates
    assert float(np.abs(np.asarray(g["dattn0"]["se_w1"])).max()) > 0

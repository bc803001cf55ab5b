"""Training-convergence proof for the detector zoo: a few optimizer
steps on one fixed batch must substantially reduce the loss — catches
wiring bugs that shape/finiteness checks miss (SURVEY §4 pattern)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from metatransformer_tpu.models import centerpoint as cp
from metatransformer_tpu.models import second
from tests.test_centerpoint import SMALL as CP_SMALL


def _points(seed=7, n=128):
    rng = np.random.default_rng(seed)
    pts = np.zeros((1, n, 4), np.float32)
    pts[0, :, 0] = rng.uniform(0, 6.4, n)
    pts[0, :, 1] = rng.uniform(-3.2, 3.2, n)
    pts[0, :, 2] = rng.uniform(-3, 2, n)
    pts[0, :, 3] = rng.uniform(0, 1, n)
    return jnp.asarray(pts)


def test_centerpoint_loss_decreases():
    cfg = CP_SMALL
    params = cp.init(cfg, jax.random.PRNGKey(0))
    pts = _points()
    gt = jnp.asarray([[[2.0, 0.5, -1.0, 3.2, 1.6, 1.5, 0.3],
                       [0, 0, 0, 0, 0, 0, 0]]], jnp.float32)
    lab = jnp.asarray([[1, 0]], jnp.int32)
    val = jnp.asarray([[True, False]])

    opt = optax.adam(3e-3)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(pp):
            pr = cp.forward(pp, pts, cfg)
            return cp.detection_loss(pr, gt, lab, val, cfg)[0]

        loss, g = jax.value_and_grad(loss_fn)(p)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s, loss

    losses = []
    for _ in range(25):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], losses[::6]


def test_second_loss_decreases():
    cfg = second.SECONDConfig(
        voxel_size=(0.1, 0.1, 0.2),
        pc_range=(0.0, -3.2, -3.0, 6.4, 3.2, 2.0),
        spatial_shape=(25, 64, 64),
        max_voxels=256,
        widths=(4, 4, 8, 8, 8, 8),
        bev_channels=(8, 16),
        up_channels=8,
    )
    anchors = jnp.asarray(second.generate_anchors(cfg))
    params = second.init(cfg, jax.random.PRNGKey(0))
    pts = _points(11)
    gt = jnp.asarray([[[2.0, 0.5, -1.0, 3.9, 1.6, 1.56, 0.0],
                       [0, 0, 0, 0, 0, 0, 0]]], jnp.float32)
    gv = jnp.asarray([[True, False]])

    opt = optax.adam(3e-3)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(pp):
            pr = second.forward(pp, pts, cfg)
            return second.detection_loss(pr, anchors, gt, gv, cfg)[0]

        loss, g = jax.value_and_grad(loss_fn)(p)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s, loss

    losses = []
    for _ in range(25):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], losses[::6]


# ---------------------------------------------------------------------------
# Two-stage detectors: overfit-one-batch proofs + stage-2 gradient flow.
# The proposal/target plumbing (sampling, RoI pooling, soft labels) is where
# silent gradient-killing bugs live — forward/loss-shape checks can't catch
# them (the reference trains all of these to checkpoint-zoo quality,
# AutonomousDriving/README.md:13-17).
#
# Note on the reg branch: like pcdet, the rcnn reg/corner losses are
# foreground-gated (reg_fg_thresh IoU), so at random init they carry no
# gradient by construction. We therefore assert reg-branch gradient flow
# AFTER the overfit (when real fg proposals exist) — and for PointRCNN,
# whose toy-scale proposals stay below the gate, by injecting gt-jittered
# proposals directly (a pure plumbing proof).
# ---------------------------------------------------------------------------


def _one_box_batch(seed=13, n=128):
    pts = _points(seed, n)
    gt = jnp.asarray([[[2.0, 0.5, -1.0, 3.2, 1.6, 1.5, 0.3],
                       [0, 0, 0, 0, 0, 0, 0]]], jnp.float32)
    gv = jnp.asarray([[True, False]])
    return pts, gt, gv


def _run_overfit(params, loss_fn, steps=40, lr=3e-3):
    opt = optax.adam(lr)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(loss_fn)(p)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s, loss

    losses = []
    for _ in range(steps):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    return params, losses


def _assert_grads(grads, keys):
    for k in keys:
        leaf = grads[k]["w"] if isinstance(grads[k], dict) else grads[k]
        assert float(jnp.abs(leaf).max()) > 0, f"no gradient through {k}"


def test_voxel_rcnn_overfits_one_batch():
    from metatransformer_tpu.models import voxel_rcnn as vr
    from tests.test_voxel_rcnn import SMALL as CFG

    params = vr.init(CFG, jax.random.PRNGKey(0))
    anchors = jnp.asarray(second.generate_anchors(CFG.stage1))
    pts, gt, gv = _one_box_batch()

    def loss_fn(p):
        return vr.training_loss(p, pts, gt, gv, anchors, CFG)[0]

    params, losses = _run_overfit(params, loss_fn)
    assert losses[-1] < 0.3 * losses[0], losses[::8]
    # overfit proposals cross the fg gate -> the whole stage-2 head trains
    _assert_grads(jax.grad(loss_fn)(params), ["reg_pred", "cls_pred"])


def test_pv_rcnn_overfits_one_batch():
    from metatransformer_tpu.models import pv_rcnn as pv
    from tests.test_pv_rcnn import SMALL as CFG

    params = pv.init(CFG, jax.random.PRNGKey(0))
    anchors = jnp.asarray(second.generate_anchors(CFG.stage1))
    pts, gt, gv = _one_box_batch(17)

    def loss_fn(p):
        return pv.training_loss(p, pts, gt, gv, anchors, CFG)[0]

    params, losses = _run_overfit(params, loss_fn)
    assert losses[-1] < 0.3 * losses[0], losses[::8]
    _assert_grads(jax.grad(loss_fn)(params), ["reg_pred", "cls_pred"])


def test_part_a2_overfits_one_batch():
    from metatransformer_tpu.models import part_a2 as pa
    from tests.test_part_a2 import SMALL as CFG

    params = pa.init(CFG, jax.random.PRNGKey(0))
    anchors = jnp.asarray(second.generate_anchors(CFG.stage1))
    pts, gt, gv = _one_box_batch(23)

    def loss_fn(p):
        return pa.training_loss(p, pts, gt, gv, anchors, CFG)[0]

    params, losses = _run_overfit(params, loss_fn, steps=100)
    assert losses[-1] < 0.3 * losses[0], losses[::12]
    _assert_grads(jax.grad(loss_fn)(params), ["reg_pred", "cls_pred"])


def test_point_rcnn_overfits_one_batch():
    from metatransformer_tpu.models import point_rcnn as pr
    from tests.test_point_rcnn import SMALL as CFG

    params = pr.init(CFG, jax.random.PRNGKey(0))
    pts, gt, gv = _one_box_batch(19)
    gl = jnp.asarray([[1, 0]], jnp.int32)

    def loss_fn(p):
        return pr.training_loss(p, pts, gt, gl, gv, CFG)[0]

    _, losses = _run_overfit(params, loss_fn)
    assert losses[-1] < 0.3 * losses[0], losses[::8]


def test_point_rcnn_stage2_gradient_flow(monkeypatch):
    """Inject gt-jittered proposals past the RPN: gradients must reach the
    rcnn reg/cls heads through sample -> point-pool -> refine -> loss."""
    from metatransformer_tpu.models import point_rcnn as pr
    from tests.test_point_rcnn import SMALL as CFG

    params = pr.init(CFG, jax.random.PRNGKey(0))
    pts, gt, gv = _one_box_batch(19)
    gl = jnp.asarray([[1, 0]], jnp.int32)

    rng = np.random.default_rng(5)
    jitter = jnp.asarray(
        rng.uniform(-0.1, 0.1, (1, CFG.num_rois, 7)).astype(np.float32)
    )
    rois = gt[:, :1].repeat(CFG.num_rois, axis=1) + jitter

    def fake_propose(xyz, cls_logits, box_enc, mask, cfg):
        b = xyz.shape[0]
        return (
            rois,
            jnp.ones((b, cfg.num_rois)),
            jnp.ones((b, cfg.num_rois), bool),
        )

    monkeypatch.setattr(pr, "propose", fake_propose)
    g = jax.grad(
        lambda p: pr.training_loss(p, pts, gt, gl, gv, CFG)[0]
    )(params)
    _assert_grads(g, ["rcnn_reg_pred", "rcnn_cls_pred"])


def test_pv_rcnn_pp_overfits_one_batch():
    """PV-RCNN++ (VERDICT r3 weak #5): overfit one synthetic batch through
    the full SPC-sampling -> VectorPool VSA -> vectorpool RoI-grid chain,
    then assert post-overfit gradient flow through BOTH VectorPool
    aggregations (the novel chunked grouped-conv plumbing) and the rcnn
    heads."""
    from metatransformer_tpu.models import pv_rcnn_pp as pp
    from tests.test_pv_rcnn_pp import SMALL as CFG

    params = pp.init(CFG, jax.random.PRNGKey(0))
    anchors = jnp.asarray(second.generate_anchors(CFG.stage1))
    pts, gt, gv = _one_box_batch(29)

    def loss_fn(p):
        return pp.training_loss(p, pts, gt, gv, anchors, CFG)[0]

    params, losses = _run_overfit(params, loss_fn)
    assert losses[-1] < 0.3 * losses[0], losses[::8]
    g = jax.grad(loss_fn)(params)
    _assert_grads(g, ["reg_pred", "cls_pred", "pt_pred"])
    # VectorPool aggregation: per-sub-voxel grouped weights must carry
    # gradient both in the VSA source layers and the RoI-grid pool
    for vp_key in ["vp_raw_points", "vp_x_conv4", "roi_vp"]:
        assert float(jnp.abs(g[vp_key]["local_w"]).max()) > 0, vp_key
        assert float(jnp.abs(g[vp_key]["post"]["w"]).max()) > 0, vp_key


def test_caddn_overfits_one_batch():
    """CaDDN (VERDICT r3 weak #5): overfit one synthetic image batch
    through stem -> depth-distribution head -> frustum outer product ->
    frustum-to-voxel sampling -> BEV head, then assert post-overfit
    gradient flow through the depth head (the frustum path's driver)."""
    from metatransformer_tpu.models import caddn
    from tests.test_caddn import SMALL as CFG, _calib

    params = caddn.init(CFG, jax.random.PRNGKey(0))
    l2c, c2i = _calib()
    rng = np.random.default_rng(37)
    images = jnp.asarray(rng.uniform(0, 1, (1, 32, 64, 3)), jnp.float32)
    anchors = jnp.asarray(caddn.generate_anchors(CFG))
    gt = jnp.asarray([[[6.0, 0.5, -1.0, 3.9, 1.6, 1.56, 0.0],
                       [0, 0, 0, 0, 0, 0, 0]]], jnp.float32)
    gv = jnp.asarray([[True, False]])
    hf, wf = CFG.feat_hw
    depth_maps = jnp.full((1, hf, wf), 6.0)
    fg = jnp.zeros((1, hf, wf), bool).at[:, 2:6, 4:12].set(True)

    def loss_fn(p):
        return caddn.training_loss(
            p, images, l2c, c2i, depth_maps, fg, gt, gv, anchors, CFG
        )[0]

    params, losses = _run_overfit(params, loss_fn)
    assert losses[-1] < 0.3 * losses[0], losses[::8]
    g = jax.grad(loss_fn)(params)
    assert float(jnp.abs(g["depth_head"]["w"]).max()) > 0
    _assert_grads(g, ["cls_w", "box_w"])

"""Box-level detector self-training (SemiSECOND pipeline:
pcdet self_training_utils.py + detectors/semi_second.py semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from metatransformer_tpu.models import second
from metatransformer_tpu.train import detector_ssl as dssl


def test_gate_pseudo_boxes():
    cfg = dssl.PseudoBoxConfig(score_thresh=0.5, max_boxes=2)
    dets = [
        {
            "boxes": np.tile(np.arange(4)[:, None], (1, 7)).astype(np.float32),
            "scores": np.asarray([0.9, 0.4, 0.7, 0.8], np.float32),
            "labels": np.asarray([0, 1, 2, 1]),
            "valid": np.asarray([True, True, True, False]),
        }
    ]
    boxes, labels, valid = dssl.gate_pseudo_boxes(dets, cfg)
    assert boxes.shape == (1, 2, 7)
    # score order among valid+above-threshold: idx0 (0.9), idx2 (0.7);
    # idx3 excluded (invalid), idx1 excluded (below threshold)
    assert boxes[0, 0, 0] == 0.0 and boxes[0, 1, 0] == 2.0
    assert labels[0, 1] == 2
    assert valid[0].all()
    # empty detections -> all invalid
    b2, l2, v2 = dssl.gate_pseudo_boxes(
        [{"boxes": np.zeros((0, 7), np.float32),
          "scores": np.zeros((0,), np.float32),
          "valid": np.zeros((0,), bool)}], cfg)
    assert not v2.any()


def test_self_training_step_learns_from_teacher():
    """Teacher detections become pseudo labels; a student step reduces
    the detection loss on them and the EMA teacher moves."""
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
    teacher = second.init(cfg, jax.random.PRNGKey(0))
    student = jax.tree_util.tree_map(jnp.copy, teacher)
    rng = np.random.default_rng(71)
    pts = np.zeros((1, 128, 4), np.float32)
    pts[0, :, 0] = rng.uniform(0, 6.4, 128)
    pts[0, :, 1] = rng.uniform(-3.2, 3.2, 128)
    pts[0, :, 2] = rng.uniform(-3, 2, 128)
    pts = jnp.asarray(pts)

    preds = second.forward(teacher, pts, cfg)
    dets = second.predict(preds, anchors, cfg, score_thr=0.0)
    boxes, labels, valid = dssl.gate_pseudo_boxes(
        dets, dssl.PseudoBoxConfig(score_thresh=0.0, max_boxes=4)
    )
    assert valid.any()  # untrained teacher still emits gated boxes

    def loss_fn(p, points, gt, gv):
        pr = second.forward(p, points, cfg)
        return second.detection_loss(pr, anchors, gt, gv, cfg)

    opt = optax.adam(1e-3)
    opt_state = opt.init(student)
    step = dssl.make_self_training_step(loss_fn, opt, ema_decay=0.9)

    l0 = None
    for _ in range(3):
        student, teacher, opt_state, loss, logs = step(
            student, teacher, opt_state, pts,
            jnp.asarray(boxes), jnp.asarray(valid),
        )
        if l0 is None:
            l0 = float(loss)
    assert np.isfinite(float(loss))
    assert float(loss) < l0  # student fits the pseudo labels
    # teacher EMA drifted toward the student (no longer identical)
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), teacher, student
    )
    flat = jax.tree_util.tree_leaves(d)
    assert max(flat) > 0

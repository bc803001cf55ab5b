"""Waymo AP/APH evaluator (WOD protocol per pcdet datasets/waymo/)."""

import numpy as np

from metatransformer_tpu.data import waymo_eval as we


def _frame(boxes, labels, scores=None, npts=None):
    return we.WaymoFrame(
        boxes=np.asarray(boxes, np.float32),
        labels=np.asarray(labels, np.int32),
        scores=None if scores is None else np.asarray(scores, np.float32),
        num_points=None if npts is None else np.asarray(npts, np.int32),
    )


def test_iou3d_exact_cases():
    a = np.asarray([0, 0, 0, 4, 2, 2, 0.0], np.float32)
    assert abs(we.iou3d(a, a) - 1.0) < 1e-6
    b = a.copy()
    b[0] = 2.0  # half-length shift: inter 2*2*2=8, union 24 -> IoU 1/3
    assert abs(we.iou3d(a, b) - 1.0 / 3.0) < 1e-4
    c = a.copy()
    c[2] = 2.0  # full height offset -> no overlap
    assert we.iou3d(a, c) == 0.0


def test_perfect_predictions():
    gt = [_frame([[0, 0, 0, 4, 2, 2, 0.3]], [0])]
    pred = [_frame([[0, 0, 0, 4, 2, 2, 0.3]], [0], scores=[0.9])]
    m = we.evaluate(pred, gt, classes=[0])
    assert m["mAP"] > 0.99
    assert m["mAPH"] > 0.99


def test_aph_penalizes_heading_error():
    gt = [_frame([[0, 0, 0, 4, 4, 2, 0.0]], [1])]  # square box: iou
    # insensitive to 90deg rotation, heading off by pi/2
    pred = [_frame([[0, 0, 0, 4, 4, 2, np.pi / 2]], [1], scores=[0.9])]
    m = we.evaluate(pred, gt, classes=[1])
    assert m["mAP"] > 0.99  # still a match at IoU 0.5
    assert abs(m["mAPH"] - 0.5) < 0.01  # weight 1 - (pi/2)/pi


def test_level_filtering():
    gt = [_frame([[0, 0, 0, 4, 2, 2, 0.0], [10, 0, 0, 4, 2, 2, 0.0]],
                 [0, 0], npts=[10, 2])]
    pred = [_frame([[0, 0, 0, 4, 2, 2, 0.0]], [0], scores=[0.9])]
    # L1: only the 10-point gt counts -> recall 1
    m1 = we.evaluate(pred, gt, classes=[0], level=1)
    # L2: both count -> recall 0.5
    m2 = we.evaluate(pred, gt, classes=[0], level=2)
    assert m1["mAP"] > m2["mAP"]


def test_vehicle_threshold_stricter():
    gt = [_frame([[0, 0, 0, 4, 2, 2, 0.0]], [0]),
          _frame([[0, 0, 0, 4, 2, 2, 0.0]], [1])]
    # IoU ~0.55 offset box: misses vehicle (0.7), matches pedestrian (0.5)
    off = [[0.9, 0, 0, 4, 2, 2, 0.0]]
    pred = [_frame(off, [0], scores=[0.9]), _frame(off, [1], scores=[0.9])]
    m = we.evaluate(pred, gt, classes=[0, 1])
    assert m["AP_class0"] < 0.01
    assert m["AP_class1"] > 0.99

"""ONCE AP with distance breakdown (pcdet once_eval protocol)."""

import numpy as np

from metatransformer_tpu.data import once_eval as oe
from metatransformer_tpu.data.waymo_eval import WaymoFrame


def _frame(boxes, labels, scores=None):
    return WaymoFrame(
        boxes=np.asarray(boxes, np.float32),
        labels=np.asarray(labels, np.int32),
        scores=None if scores is None else np.asarray(scores, np.float32),
    )


def test_distance_breakdown():
    gt = [_frame([[10, 0, 0, 4, 2, 2, 0.0], [40, 0, 0, 4, 2, 2, 0.0]],
                 [0, 0])]
    # only the near box is detected
    pred = [_frame([[10, 0, 0, 4, 2, 2, 0.0]], [0], scores=[0.9])]
    m = oe.evaluate(pred, gt, classes=[0])
    assert m["AP_class0_0-30m"] > 0.99
    assert m["AP_class0_30-50m"] < 0.01
    assert m["AP_class0_50m-inf"] == 0.0  # no gt in range -> AP 0
    assert 0.4 < m["AP_class0"] < 0.6  # overall recall 1/2


def test_pedestrian_loose_threshold():
    gt = [_frame([[5, 0, 0, 0.8, 0.6, 1.7, 0.0]], [1]),
          _frame([[5, 0, 0, 4.0, 2.0, 2.0, 0.0]], [0])]
    # ~IoU 0.45 overlap boxes: pedestrian (0.3) matches, vehicle (0.7) not
    off_ped = [[5.2, 0, 0, 0.8, 0.6, 1.7, 0.0]]
    off_veh = [[6.0, 0, 0, 4.0, 2.0, 2.0, 0.0]]
    pred = [_frame(off_ped, [1], scores=[0.9]),
            _frame(off_veh, [0], scores=[0.9])]
    m = oe.evaluate(pred, gt, classes=[0, 1])
    assert m["AP_class1"] > 0.99
    assert m["AP_class0"] < 0.01

"""nuScenes mAP/NDS evaluator + sweep accumulation
(devkit protocol per pcdet datasets/nuscenes/)."""

import numpy as np

from metatransformer_tpu.data import nuscenes_eval as ne


def _frame(boxes, labels, scores=None, vel=None):
    return ne.NuscFrame(
        boxes=np.asarray(boxes, np.float32),
        labels=np.asarray(labels, np.int32),
        scores=None if scores is None else np.asarray(scores, np.float32),
        velocities=None if vel is None else np.asarray(vel, np.float32),
    )


def test_perfect_predictions_score_one():
    gt = [_frame([[0, 0, 0, 4, 2, 1.5, 0.0], [10, 5, 0, 4, 2, 1.5, 1.0]],
                 [0, 0])]
    pred = [_frame([[0, 0, 0, 4, 2, 1.5, 0.0], [10, 5, 0, 4, 2, 1.5, 1.0]],
                   [0, 0], scores=[0.9, 0.8])]
    m = ne.evaluate(pred, gt, classes=[0])
    assert m["mAP"] > 0.99
    assert m["mATE"] < 1e-6 and m["mASE"] < 1e-6 and m["mAOE"] < 1e-6
    assert m["NDS"] > 0.79  # (5*1 + 3*1 + 0 + 0)/10 = 0.8 (no vel/attr)


def test_distance_threshold_matching():
    gt = [_frame([[0, 0, 0, 4, 2, 1.5, 0.0]], [0])]
    # 1.5m off: matches at 2m and 4m thresholds, misses 0.5m and 1m
    pred = [_frame([[1.5, 0, 0, 4, 2, 1.5, 0.0]], [0], scores=[0.9])]
    m = ne.evaluate(pred, gt, classes=[0])
    assert 0.4 < m["mAP"] < 0.6  # AP 1 at two of four thresholds
    assert abs(m["mATE"] - 1.5) < 1e-6


def test_false_positives_reduce_ap():
    gt = [_frame([[0, 0, 0, 4, 2, 1.5, 0.0]], [0])]
    pred = [_frame(
        [[0, 0, 0, 4, 2, 1.5, 0.0], [50, 50, 0, 4, 2, 1.5, 0.0]],
        [0, 0], scores=[0.9, 0.95],  # high-scoring FP first
    )]
    m = ne.evaluate(pred, gt, classes=[0])
    m2 = ne.evaluate([_frame([[0, 0, 0, 4, 2, 1.5, 0.0]], [0], scores=[0.9])],
                     gt, classes=[0])
    assert m["mAP"] < m2["mAP"]


def test_orientation_and_scale_errors():
    gt = [_frame([[0, 0, 0, 4, 2, 1.5, 0.0]], [0])]
    pred = [_frame([[0, 0, 0, 2, 2, 1.5, 0.5]], [0], scores=[0.9])]
    m = ne.evaluate(pred, gt, classes=[0])
    assert abs(m["mAOE"] - 0.5) < 1e-6
    assert abs(m["mASE"] - 0.5) < 1e-6  # half-length box: IoU 0.5


def test_velocity_error_included_when_present():
    gt = [_frame([[0, 0, 0, 4, 2, 1.5, 0.0]], [0], vel=[[1.0, 0.0]])]
    pred = [_frame([[0, 0, 0, 4, 2, 1.5, 0.0]], [0], scores=[0.9],
                   vel=[[0.0, 0.0]])]
    m = ne.evaluate(pred, gt, classes=[0])
    assert abs(m["mAVE"] - 1.0) < 1e-6
    # NDS now includes the velocity TP term: (5 + 3 + 0)/10
    assert abs(m["NDS"] - 0.8) < 1e-3


def test_accumulate_sweeps_transform_and_dt():
    pts = np.asarray([[1.0, 0.0, 0.0, 0.5]], np.float32)
    tf = np.eye(4, dtype=np.float32)
    tf[0, 3] = 2.0  # shift +x
    out, mask = ne.accumulate_sweeps(
        [(pts, np.eye(4, dtype=np.float32), 0.0), (pts, tf, 0.05)],
        max_points=4,
    )
    assert mask.sum() == 2
    np.testing.assert_allclose(out[0], [1, 0, 0, 0.5, 0.0], atol=1e-6)
    np.testing.assert_allclose(out[1], [3, 0, 0, 0.5, 0.05], atol=1e-6)
    assert (out[2:] == 0).all()

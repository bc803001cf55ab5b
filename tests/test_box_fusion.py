"""Weighted box fusion (pcdet model_utils/ensemble.wbf_online protocol)."""

import numpy as np

from metatransformer_tpu.ops import box_fusion as bf


def test_overlapping_boxes_fuse_weighted():
    b1 = np.asarray([[0, 0, 0, 4, 2, 2, 0.0]], np.float32)
    b2 = np.asarray([[0.2, 0, 0, 4, 2, 2, 0.0]], np.float32)
    boxes, scores, labels = bf.weighted_box_fusion(
        [b1, b2], [np.asarray([0.9]), np.asarray([0.3])],
        [np.asarray([1]), np.asarray([1])],
    )
    assert boxes.shape == (1, 7)
    # score-weighted x: (0*0.9 + 0.2*0.3)/1.2 = 0.05
    assert abs(boxes[0, 0] - 0.05) < 1e-5
    # conf = mean(0.9, 0.3) * min(2,2)/2 = 0.6
    assert abs(scores[0] - 0.6) < 1e-5
    assert labels[0] == 1


def test_distinct_boxes_stay_separate_and_singletons_downweighted():
    b1 = np.asarray([[0, 0, 0, 4, 2, 2, 0.0]], np.float32)
    b2 = np.asarray([[30, 0, 0, 4, 2, 2, 0.0]], np.float32)
    boxes, scores, labels = bf.weighted_box_fusion(
        [b1, b2], [np.asarray([0.8]), np.asarray([0.8])],
        [np.asarray([0]), np.asarray([0])],
    )
    assert boxes.shape == (2, 7)
    # singleton clusters from 2 sources: conf = 0.8 * 1/2
    np.testing.assert_allclose(scores, 0.4, atol=1e-6)


def test_skip_threshold_and_class_separation():
    b = np.asarray([[0, 0, 0, 4, 2, 2, 0.0], [0, 0, 0, 4, 2, 2, 0.0]],
                   np.float32)
    boxes, scores, labels = bf.weighted_box_fusion(
        [b], [np.asarray([0.05, 0.9])], [np.asarray([0, 0])],
    )
    # the 0.05 vehicle is below SKIP_THRESH[0]=0.1 -> dropped
    assert boxes.shape == (1, 7)
    # same position, different classes -> never fused
    boxes2, _, labels2 = bf.weighted_box_fusion(
        [b], [np.asarray([0.9, 0.9])], [np.asarray([0, 1])],
    )
    assert boxes2.shape == (2, 7)
    assert set(labels2.tolist()) == {0, 1}

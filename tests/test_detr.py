"""DETR-style 2D detection head tests."""

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.heads import detr
from metatransformer_tpu.models.time_series import DecoderConfig
from metatransformer_tpu.ops import matching


def test_detr_head_shapes():
    cfg = detr.DETRHeadConfig(
        in_dim=32, num_queries=8, num_classes=5,
        decoder=DecoderConfig(dim=16, d_ff=32, num_heads=2, depth=2),
    )
    params = detr.init(cfg, jax.random.PRNGKey(0))
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 8, 8, 32), np.float32)
    )
    cls_logits, boxes = detr.apply(params, feats, cfg)
    assert cls_logits.shape == (2, 8, 6)
    assert boxes.shape == (2, 8, 4)
    b = np.asarray(boxes)
    assert (b >= 0).all() and (b <= 1).all()


def test_giou():
    a = jnp.asarray([[0.0, 0, 1, 1]])
    assert abs(float(detr.generalized_iou(a, a)[0, 0]) - 1.0) < 1e-6
    b = jnp.asarray([[0.5, 0.0, 1.5, 1.0]])  # half overlap
    giou = float(detr.generalized_iou(a, b)[0, 0])
    assert 0.0 < giou < 0.5
    c = jnp.asarray([[2.0, 2, 3, 3]])  # disjoint: giou negative
    assert float(detr.generalized_iou(a, c)[0, 0]) < 0.0


def test_detr_matching_pipeline():
    cfg = detr.DETRHeadConfig(
        in_dim=16, num_queries=6, num_classes=3,
        decoder=DecoderConfig(dim=16, d_ff=32, num_heads=2, depth=1),
    )
    params = detr.init(cfg, jax.random.PRNGKey(1))
    feats = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 4, 4, 16), np.float32)
    )
    cls_logits, boxes = detr.apply(params, feats, cfg)
    gt_boxes = jnp.asarray([[0.3, 0.3, 0.2, 0.2], [0.7, 0.7, 0.1, 0.1]])
    gt_labels = jnp.asarray([0, 2])
    cost = (
        matching.classification_cost(cls_logits[0], gt_labels)
        + matching.bbox_l1_cost(boxes[0], gt_boxes)
        - detr.generalized_iou(
            detr.box_cxcywh_to_xyxy(boxes[0]), detr.box_cxcywh_to_xyxy(gt_boxes)
        )
    )
    rows, cols = matching.hungarian_assign(np.asarray(cost))
    assert len(rows) == 2 and len(set(rows.tolist())) == 2

"""MaskFormer head, RoI 3D pooling, multi-view video aggregation."""

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.heads import maskformer
from metatransformer_tpu.models import video_eval
from metatransformer_tpu.models.time_series import DecoderConfig
from metatransformer_tpu.ops import roi_pool3d


def test_maskformer_head_shapes_and_inference():
    cfg = maskformer.MaskFormerConfig(
        in_dim=32, num_queries=8, num_classes=5,
        decoder=DecoderConfig(dim=16, d_ff=32, num_heads=2, depth=2),
        mask_dim=16,
    )
    params = maskformer.init(cfg, jax.random.PRNGKey(0))
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 8, 8, 32), np.float32)
    )
    cls_logits, masks = maskformer.apply(params, feats, cfg)
    assert cls_logits.shape == (2, 8, 6)  # +1 no-object
    assert masks.shape == (2, 8, 8, 8)
    sem = maskformer.semantic_inference(cls_logits, masks)
    assert sem.shape == (2, 8, 8, 5)
    assert np.isfinite(np.asarray(sem)).all()
    # trainable end to end with hungarian-matched losses
    from metatransformer_tpu.ops import matching

    gt_masks = jnp.asarray(
        (np.random.default_rng(1).uniform(size=(3, 64)) > 0.5).astype(np.float32)
    )
    gt_labels = jnp.asarray([0, 2, 4])
    cost = (
        matching.classification_cost(cls_logits[0], gt_labels)
        + matching.dice_cost(masks[0].reshape(8, -1), gt_masks)
    )
    rows, cols = matching.hungarian_assign(np.asarray(cost))
    assert len(rows) == 3


def test_points_in_rotated_boxes():
    # box at origin, 2x1x1, rotated 90deg: x/y extents swap
    boxes = jnp.asarray([[[0.0, 0, 0, 2, 1, 1, np.pi / 2]]])
    pts = jnp.asarray([[[0.0, 0.9, 0.0], [0.9, 0.0, 0.0], [0.0, 0.0, 0.6]]])
    mask = np.asarray(roi_pool3d.points_in_boxes(pts, boxes))[0, 0]
    # after 90deg rotation the long axis lies along y
    np.testing.assert_array_equal(mask, [True, False, False])


def test_roi_pooling():
    pts = jnp.asarray([[[0.0, 0, 0], [0.1, 0, 0], [5.0, 5, 5]]])
    feats = jnp.asarray([[[1.0], [3.0], [100.0]]])
    boxes = jnp.asarray([[[0.0, 0, 0, 1, 1, 1, 0.0], [9.0, 9, 9, 1, 1, 1, 0.0]]])
    mx = np.asarray(roi_pool3d.roi_max_pool(pts, feats, boxes))
    np.testing.assert_allclose(mx[0, 0, 0], 3.0)  # max of in-box {1, 3}
    np.testing.assert_allclose(mx[0, 1, 0], 0.0)  # empty RoI -> 0
    avg = np.asarray(roi_pool3d.roi_avg_pool(pts, feats, boxes))
    np.testing.assert_allclose(avg[0, 0, 0], 2.0)


def test_multiview_video():
    rng = np.random.default_rng(0)
    video = rng.standard_normal((40, 32, 48, 3)).astype(np.float32)
    segs = video_eval.temporal_segments(video, num_frames=8, num_segments=5)
    assert segs.shape == (5, 8, 32, 48, 3)
    crops = video_eval.spatial_crops(segs[0], crop=32, num_crops=3)
    assert crops.shape == (3, 8, 32, 32, 3)

    calls = []

    def fake_forward(batch):
        calls.append(batch.shape)
        return jnp.ones((batch.shape[0], 4))

    logits, n_views = video_eval.multiview_logits(
        fake_forward, video, num_frames=8, crop=32, num_segments=5, num_crops=3
    )
    assert n_views == 15
    assert logits.shape == (4,)
    assert calls[0] == (15, 8, 32, 32, 3)

"""COCO detection track: FPN / RPN / RoIAlign / cascade R-CNN heads.

Reference composition per Image/detection/configs (mask_rcnn +
cascade_rcnn over the ViT-Adapter FPN)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metatransformer_tpu.core import encoder
from metatransformer_tpu.heads import detection2d as d2
from metatransformer_tpu.models import mask_rcnn, vit_adapter


def _small_backbone(img=64):
    return vit_adapter.ViTAdapterConfig(
        encoder=encoder.EncoderConfig(dim=32, depth=2, num_heads=4),
        img_size=img,
        patch_size=16,
        conv_inplane=8,
        deform_num_heads=4,
        interaction_indexes=((0, 0), (1, 1)),
    )


def _small_cfg(img=64, stages=1, with_mask=True):
    return mask_rcnn.MaskRCNNConfig(
        backbone=_small_backbone(img),
        fpn=d2.FPNConfig(in_channels=(32, 32, 32, 32), out_channels=32),
        rpn=d2.RPNConfig(channels=32, nms_pre=64, max_proposals=16),
        rcnn=d2.RCNNConfig(
            num_classes=5, channels=32, fc_dim=64,
            num_stages=stages, with_mask=with_mask, mask_size=7,
        ),
        img_size=img,
    )


def test_delta_bbox_roundtrip():
    rng = np.random.default_rng(0)
    rois = jnp.asarray(np.sort(rng.uniform(0, 60, (6, 4)), -1).astype(np.float32))
    gt = rois + jnp.asarray(rng.uniform(-3, 3, (6, 4)).astype(np.float32))
    gt = jnp.concatenate([jnp.minimum(gt[:, :2], gt[:, 2:] - 1), jnp.maximum(gt[:, 2:], gt[:, :2] + 1)], -1)
    back = d2.delta2bbox(rois, d2.bbox2delta(rois, gt))
    np.testing.assert_allclose(np.asarray(back), np.asarray(gt), rtol=1e-4, atol=1e-3)


def test_nms_xyxy_suppresses():
    boxes = jnp.asarray(
        [[0, 0, 10, 10], [1, 1, 11, 11], [30, 30, 40, 40]], jnp.float32
    )
    scores = jnp.asarray([0.9, 0.8, 0.7])
    idx, valid = d2.nms_xyxy(boxes, scores, 0.5, 3)
    kept = set(np.asarray(idx)[np.asarray(valid)].tolist())
    assert kept == {0, 2}


def test_fpn_levels():
    cfg = d2.FPNConfig(in_channels=(32, 32, 32, 32), out_channels=16, num_outs=5)
    params = d2.fpn_init(cfg, jax.random.PRNGKey(0))
    feats = [jnp.zeros((1, 16 // 2**i, 16 // 2**i, 32)) for i in range(4)]
    outs = d2.fpn_apply(params, feats, cfg)
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2, 1]
    assert all(o.shape[-1] == 16 for o in outs)


def test_roi_align_matches_naive_center():
    """A 1x1 RoIAlign at box center == bilinear sample at that point."""
    rng = np.random.default_rng(1)
    f0 = jnp.asarray(rng.standard_normal((1, 16, 16, 3)).astype(np.float32))
    feats = [f0, f0[:, ::2, ::2], f0[:, ::4, ::4], f0[:, ::8, ::8]]
    rois = jnp.asarray([[[8.0, 12.0, 24.0, 28.0]]])  # stride-4 level (scale 8)
    out = d2.roi_align(feats, rois, out_size=1, strides=(4, 8, 16, 32))
    from metatransformer_tpu.ops.ms_deform_attn import bilinear_sample

    cx, cy = 16.0 / (16 * 4), 20.0 / (16 * 4)
    want = bilinear_sample(f0, jnp.asarray([[[cx, cy]]]))
    np.testing.assert_allclose(
        np.asarray(out).reshape(3), np.asarray(want).reshape(3), atol=1e-5
    )


def test_mask_rcnn_forward_test_shapes():
    cfg = _small_cfg()
    params = mask_rcnn.init(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 64, 64, 3), np.float32))
    out = mask_rcnn.forward_test(params, x, cfg)
    p = cfg.rpn.max_proposals
    assert out["boxes"].shape == (1, p, 4)
    assert out["scores"].shape == (1, p)
    assert out["labels"].shape == (1, p)
    assert out["masks"].shape == (1, p, 14, 14, 5)
    assert np.isfinite(np.asarray(out["boxes"])).all()


def test_cascade_three_stages_train_and_grads():
    cfg = _small_cfg(stages=3, with_mask=True)
    # untrained RPN proposals rarely clear the real 0.5/0.6/0.7 ladder;
    # relax the assigner so positives exist and the mask branch trains
    cfg = dataclasses.replace(
        cfg, rcnn=dataclasses.replace(cfg.rcnn, stage_ious=(0.1, 0.1, 0.1))
    )
    params = mask_rcnn.init(cfg, jax.random.PRNGKey(1))
    assert len(params["rcnn"]["stages"]) == 3
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    gt_boxes = jnp.asarray([[[8.0, 8.0, 40.0, 40.0], [0, 0, 1, 1]]], jnp.float32)
    gt_labels = jnp.asarray([[2, 0]], jnp.int32)
    gt_valid = jnp.asarray([[True, False]])
    gt_masks = jnp.zeros((1, 2, 64, 64)).at[0, 0, 10:38, 10:38].set(1.0)

    def loss_fn(p):
        total, logs = mask_rcnn.forward_train(
            p, x, gt_boxes, gt_labels, gt_valid, cfg, gt_masks=gt_masks
        )
        return total

    total, logs = mask_rcnn.forward_train(
        params, x, gt_boxes, gt_labels, gt_valid, cfg, gt_masks=gt_masks
    )
    assert np.isfinite(float(total))
    assert {"rpn_cls", "rpn_reg", "stage0", "stage1", "stage2", "mask"} <= set(logs)

    g = jax.grad(loss_fn)(params)
    # grads reach the RPN, every cascade stage, the mask head and the FPN
    assert float(jnp.abs(g["rpn"]["cls"]["w"]).max()) > 0
    for si in range(3):
        assert float(jnp.abs(g["rcnn"]["stages"][si]["cls"]["w"]).max()) > 0
    assert float(jnp.abs(g["rcnn"]["mask_out"]["w"]).max()) > 0
    assert float(jnp.abs(g["fpn"]["lateral0"]["w"]).max()) > 0

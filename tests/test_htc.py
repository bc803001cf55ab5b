"""HTC++ over ViT-Adapter: interleaved cascade + mask info flow +
semantic branch (reference ``Image/detection/configs/htc++/*.py``)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.core import encoder
from metatransformer_tpu.heads import detection2d as d2
from metatransformer_tpu.models import htc, vit_adapter


def _small_cfg(img=64):
    return htc.HTCConfig(
        backbone=vit_adapter.ViTAdapterConfig(
            encoder=encoder.EncoderConfig(dim=32, depth=2, num_heads=4),
            img_size=img,
            patch_size=16,
            conv_inplane=8,
            deform_num_heads=4,
            interaction_indexes=((0, 0), (1, 1)),
        ),
        fpn=d2.FPNConfig(in_channels=(32,) * 4, out_channels=32),
        rpn=d2.RPNConfig(channels=32, nms_pre=64, max_proposals=8),
        rcnn=d2.RCNNConfig(
            num_classes=5, channels=32, fc_dim=64, num_stages=3,
            # near-zero positive gates: random-init proposals must count
            # as fg so the mask/info-flow gradient paths are exercised
            # (at the real 0.5/0.6/0.7 gates an untrained RPN yields no
            # positives and every mask loss is legitimately 0)
            stage_ious=(0.02, 0.02, 0.02),
            with_mask=True, mask_size=7,
        ),
        img_size=img,
        semantic_classes=12,
        semantic_convs=2,
    )


def _batch(img=64, g=2, seed=0):
    rng = np.random.default_rng(seed)
    x0y0 = rng.uniform(0, img // 2, (1, g, 2))
    wh = rng.uniform(img // 8, img // 2, (1, g, 2))
    boxes = np.concatenate([x0y0, np.minimum(x0y0 + wh, img - 1)], -1)
    masks = np.zeros((1, g, img, img), np.float32)
    sem = np.full((1, img, img), 255, np.int64)
    for gi in range(g):
        x0, y0, x1, y1 = boxes[0, gi].astype(int)
        masks[0, gi, y0:y1, x0:x1] = 1.0
        sem[0, y0:y1, x0:x1] = gi + 1
    return (
        jnp.asarray(rng.standard_normal((1, img, img, 3)), jnp.float32),
        jnp.asarray(boxes, jnp.float32),
        jnp.asarray(rng.integers(0, 5, (1, g)), jnp.int32),
        jnp.ones((1, g), bool),
        jnp.asarray(masks),
        jnp.asarray(sem),
    )


def test_htc_train_losses_and_info_flow_grads():
    cfg = _small_cfg()
    params = htc.init(cfg, jax.random.PRNGKey(0))
    images, boxes, labels, valid, masks, sem = _batch()

    loss, logs = htc.forward_train(
        params, images, boxes, labels, valid, cfg,
        gt_masks=masks, semantic_labels=sem,
    )
    assert np.isfinite(float(loss))
    # interleaved: every stage contributes bbox AND mask losses
    for si in range(3):
        assert f"stage{si}_bbox" in logs and f"stage{si}_mask" in logs
    assert "semantic" in logs

    def loss_fn(p):
        return htc.forward_train(
            p, images, boxes, labels, valid, cfg,
            gt_masks=masks, semantic_labels=sem,
        )[0]

    g = jax.grad(loss_fn)(params)
    # mask info flow is live: stage>0 1x1 projections receive gradient
    assert float(jnp.abs(g["mask_stages"][1]["info"]["w"]).max()) > 0
    assert float(jnp.abs(g["mask_stages"][2]["info"]["w"]).max()) > 0
    # semantic branch trains both from its CE and through RoI fusion
    assert float(jnp.abs(g["sem_out"]["w"]).max()) > 0
    assert float(jnp.abs(g["sem_convs"][0]["w"]).max()) > 0
    # every stage's mask head gets gradients (interleaving, not last-only)
    for si in range(3):
        assert float(jnp.abs(g["mask_stages"][si]["convs"][0]["w"]).max()) > 0


def test_htc_forward_test_shapes():
    cfg = _small_cfg()
    params = htc.init(cfg, jax.random.PRNGKey(1))
    images = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, 64, 64, 3)), jnp.float32
    )
    out = htc.forward_test(params, images, cfg)
    p = cfg.rpn.max_proposals
    assert out["boxes"].shape == (1, p, 4)
    assert out["scores"].shape == (1, p)
    assert out["masks"].shape == (1, p, 14, 14, 5)
    assert out["semantic"].shape == (1, 8, 8, 12)  # stride-8 fused map
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()


def test_htc_semantic_ignore_only_is_finite():
    """All-255 semantic labels: the CE term must stay finite (0/denom
    guard)."""
    cfg = _small_cfg()
    params = htc.init(cfg, jax.random.PRNGKey(3))
    images, boxes, labels, valid, masks, _ = _batch(seed=4)
    sem = jnp.full((1, 64, 64), 255, jnp.int32)
    loss, logs = htc.forward_train(
        params, images, boxes, labels, valid, cfg,
        gt_masks=masks, semantic_labels=sem,
    )
    assert np.isfinite(float(loss))
    assert float(logs["semantic"]) == 0.0

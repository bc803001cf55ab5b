"""ViT-Adapter backbone + UperNet head + segmentor tests (small geometry)."""

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.core import encoder
from metatransformer_tpu.heads import upernet
from metatransformer_tpu.models import segmentor, vit_adapter


def _small_cfg(img=64):
    return vit_adapter.ViTAdapterConfig(
        encoder=encoder.EncoderConfig(dim=32, depth=4, num_heads=4),
        img_size=img,
        patch_size=16,
        conv_inplane=8,
        deform_num_heads=4,
        interaction_indexes=((0, 1), (2, 3)),
    )


def test_backbone_pyramid_shapes():
    cfg = _small_cfg()
    params = vit_adapter.init(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 64, 3), np.float32))
    feats = vit_adapter.apply(params, x, cfg)
    assert [f.shape for f in feats] == [
        (2, 16, 16, 32), (2, 8, 8, 32), (2, 4, 4, 32), (2, 2, 2, 32),
    ]
    for f in feats:
        assert np.isfinite(np.asarray(f)).all()


def test_backbone_pos_embed_resize():
    """Backbone trained at img_size=64 runs at 32x32 (pos embed bicubic)."""
    cfg = _small_cfg()
    params = vit_adapter.init(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 32, 32, 3), np.float32))
    feats = vit_adapter.apply(params, x, cfg)
    assert feats[0].shape == (1, 8, 8, 32)


def test_upernet_head():
    cfg = upernet.UperNetConfig(in_dim=32, channels=16, num_classes=7)
    params = upernet.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    feats = [
        jnp.asarray(rng.standard_normal((2, 16, 16, 32), np.float32)),
        jnp.asarray(rng.standard_normal((2, 8, 8, 32), np.float32)),
        jnp.asarray(rng.standard_normal((2, 4, 4, 32), np.float32)),
        jnp.asarray(rng.standard_normal((2, 2, 2, 32), np.float32)),
    ]
    out = upernet.apply(params, feats, cfg)
    assert out.shape == (2, 16, 16, 7)


def test_windowed_adapter_blocks():
    """window_attn flags per block (COCO recipe pattern T,T,F): shapes
    hold, windowed output differs from all-global, non-divisible grids
    pad internally."""
    import dataclasses as dc

    base = _small_cfg()
    cfg_g = dc.replace(base, window_attn=None)
    # grid is 4x4 at 64px/16; window 3 does not divide 4 -> pad path
    cfg_w = dc.replace(base, window_attn=(True, False, True, False),
                       window_size=3)
    params = vit_adapter.init(cfg_g, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(9).standard_normal((1, 64, 64, 3), np.float32))
    out_g = vit_adapter.apply(params, x, cfg_g)
    out_w = vit_adapter.apply(params, x, cfg_w)
    assert [f.shape for f in out_w] == [f.shape for f in out_g]
    assert all(np.isfinite(np.asarray(f)).all() for f in out_w)
    # restricting attention must change the features
    assert np.abs(np.asarray(out_w[1]) - np.asarray(out_g[1])).max() > 1e-5


def test_mask2former_segmentor_end_to_end():
    """ViT-Adapter pyramid -> MSDeformAttn pixel decoder -> Mask2Former."""
    cfg = segmentor.Mask2FormerSegmentorConfig(
        backbone=_small_cfg(), num_classes=5, head_channels=32,
        num_queries=8, num_decoder_layers=3, num_encoder_layers=1, num_heads=4,
    )
    params = segmentor.init_mask2former(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(5).standard_normal((1, 64, 64, 3), np.float32))
    all_cls, all_masks = segmentor.forward_mask2former(params, x, cfg)
    assert all_cls.shape == (4, 1, 8, 6)  # 3 layers + initial, C+1
    assert all_masks.shape == (4, 1, 8, 16, 16)  # stride-4
    sem = segmentor.mask2former_semantic(all_cls, all_masks, (64, 64))
    assert sem.shape == (1, 64, 64, 5)
    assert np.isfinite(np.asarray(sem)).all()


def test_segmentor_end_to_end_and_loss():
    cfg = segmentor.SegmentorConfig(backbone=_small_cfg(), num_classes=5)
    params = segmentor.init(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 64, 64, 3), np.float32))
    logits = segmentor.forward(params, x, cfg)
    assert logits.shape == (1, 64, 64, 5)
    labels = jnp.asarray(
        np.random.default_rng(3).integers(0, 5, (1, 64, 64)).astype(np.int32)
    )
    labels = labels.at[0, :8].set(255)  # ignore region
    loss = segmentor.seg_loss(logits, labels)
    assert np.isfinite(float(loss)) and float(loss) > 0

    # grads reach both the head and the adapter (injector gamma is
    # zero-init, so check the extractor value proj instead)
    def loss_fn(p):
        return segmentor.seg_loss(segmentor.forward(p, x, cfg), labels)

    g = jax.grad(loss_fn)(params)
    assert float(jnp.abs(g["head"]["cls_w"]).max()) > 0
    assert (
        float(jnp.abs(g["backbone"]["interaction0"]["ext_attn"]["value_w"]).max())
        > 0
    )


def test_tta_inference_flip_and_scale_averaging():
    """TTA = average of softmax over (scale, flip) variants with the
    flip undone — checked against an explicit two-pass construction."""
    cfg = _small_cfg()
    scfg = segmentor.SegmentorConfig(backbone=cfg, num_classes=5)
    params = segmentor.init(scfg, jax.random.PRNGKey(0))
    img = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 64, 64, 3)), np.float32
    )
    probs = segmentor.tta_inference(
        params, img, scfg, scales=(1.0,), flip=True
    )
    assert probs.shape == (1, 64, 64, 5)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-4)
    # explicit construction of the same average
    p1 = jax.nn.softmax(segmentor.forward(params, img, scfg), axis=-1)
    p2 = jax.nn.softmax(
        segmentor.forward(params, img[:, :, ::-1], scfg), axis=-1
    )[:, :, ::-1]
    np.testing.assert_allclose(
        np.asarray(probs), np.asarray((p1 + p2) / 2), atol=1e-5
    )
    # multi-scale path also runs and normalizes
    probs_ms = segmentor.tta_inference(
        params, img, scfg, scales=(0.75, 1.0), flip=False
    )
    np.testing.assert_allclose(np.asarray(probs_ms.sum(-1)), 1.0, atol=1e-4)

"""Multi-scale MSDeformAttn pixel decoder + full Mask2Former head.

Mirrors the reference's composition
(``mmseg_custom/models/plugins/msdeformattn_pixel_decoder.py`` +
``decode_heads/mask2former_head.py``): 4-scale pyramid in, per-decoder-
layer cls+mask out, point-sampled Hungarian-matched losses, synthetic-
shape training convergence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from metatransformer_tpu.heads import mask2former as m2f


def _pyramid(b=2, base=16, c=768, key=0):
    """c1..c4 NHWC at strides 4,8,16,32 of a (base*4)px image."""
    ks = jax.random.split(jax.random.PRNGKey(key), 4)
    return [
        jax.random.normal(k, (b, base // (2**i), base // (2**i), c)) * 0.5
        for i, k in enumerate(ks)
    ]


def _small_cfg(**kw):
    pd = m2f.PixelDecoderConfig(
        in_channels=(96, 96, 96, 96),
        feat_channels=64,
        out_channels=64,
        num_encoder_layers=2,
        num_heads=4,
        ffn_dim=128,
    )
    defaults = dict(
        num_classes=7,
        num_queries=8,
        feat_channels=64,
        out_channels=64,
        num_decoder_layers=3,
        num_heads=4,
        ffn_dim=128,
        num_points=64,
        pixel_decoder=pd,
    )
    defaults.update(kw)
    return m2f.Mask2FormerConfig(**defaults)


def test_pixel_decoder_multiscale_shapes():
    cfg = m2f.PixelDecoderConfig(
        in_channels=(96, 96, 96, 96), feat_channels=64, out_channels=64,
        num_encoder_layers=2, num_heads=4, ffn_dim=128,
    )
    params = m2f.pixel_decoder_init(cfg, jax.random.PRNGKey(0))
    feats = _pyramid(b=2, base=16, c=96)
    mask_feat, ms = m2f.pixel_decoder_apply(params, feats, cfg)
    assert mask_feat.shape == (2, 16, 16, 64)  # stride-4 map
    assert len(ms) == 3  # low-res -> high-res encoder levels
    assert ms[0].shape == (2, 2, 2, 64)
    assert ms[1].shape == (2, 4, 4, 64)
    assert ms[2].shape == (2, 8, 8, 64)
    assert all(np.isfinite(np.asarray(x)).all() for x in [mask_feat] + ms)


def test_mask2former_per_layer_outputs_ade_classes():
    """Full-size head at ADE20K class count: 9 decoder layers -> 10 preds."""
    cfg = m2f.Mask2FormerConfig(
        num_classes=150,
        pixel_decoder=m2f.PixelDecoderConfig(
            in_channels=(96, 96, 96, 96), num_encoder_layers=1,
        ),
        num_decoder_layers=9,
    )
    params = m2f.init(cfg, jax.random.PRNGKey(1))
    feats = _pyramid(b=1, base=16, c=96)
    all_cls, all_masks = jax.jit(
        lambda p, f: m2f.apply(p, f, cfg)
    )(params, feats)
    assert all_cls.shape == (10, 1, 100, 151)
    assert all_masks.shape == (10, 1, 100, 16, 16)
    sem = m2f.semantic_inference(all_cls[-1], all_masks[-1])
    assert sem.shape == (1, 16, 16, 150)
    assert np.isfinite(np.asarray(all_cls)).all()


def test_point_sample_matches_resolution_free_gt():
    """point_sample aligns stride-4 preds with full-res gt masks."""
    m = jnp.zeros((1, 8, 8)).at[:, :4, :].set(1.0)  # top half
    coords = jnp.array([[[0.5, 0.25], [0.5, 0.75]]])  # (x, y)
    v = np.asarray(m2f.point_sample(m, coords))
    assert v[0, 0] > 0.9 and v[0, 1] < 0.1


def test_uncertain_points_pick_lowest_abs_logit():
    """The importance-sampled points carry lower |logit| than average
    (boundary/padding regions), matching
    get_uncertain_point_coords_with_randomness semantics."""
    logits = jnp.ones((1, 8, 8)) * 10.0
    logits = logits.at[:, :, 4:].set(-10.0)  # boundary at x=0.5
    pts = m2f.uncertain_point_coords(logits, 16, 4.0, 1.0, jax.random.PRNGKey(0))
    picked_abs = np.abs(np.asarray(m2f.point_sample(logits, pts)))
    rand = jax.random.uniform(jax.random.PRNGKey(1), (1, 512, 2))
    rand_abs = np.abs(np.asarray(m2f.point_sample(logits, rand)))
    assert picked_abs.mean() < 0.8 * rand_abs.mean()


def test_mask2former_trains_on_synthetic_shapes():
    """Hungarian-matched loss decreases when overfitting two rectangles."""
    cfg = _small_cfg()
    params = m2f.init(cfg, jax.random.PRNGKey(2))
    feats = _pyramid(b=1, base=8, c=96, key=3)

    # gt: two rectangles with distinct classes, at full res (32x32)
    g, H = 3, 32
    gt_masks = np.zeros((1, g, H, H), np.float32)
    gt_masks[0, 0, 4:16, 4:16] = 1
    gt_masks[0, 1, 20:30, 18:30] = 1
    gt_labels = np.array([[2, 5, 0]], np.int64)
    gt_valid = np.array([[True, True, False]])

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    def loss_fn(p, rng):
        all_cls, all_masks = m2f.apply(p, feats, cfg)
        return m2f.loss(
            all_cls, all_masks, gt_labels, gt_masks, gt_valid, cfg, rng,
            num_points=64,
        )

    losses = []
    rng = jax.random.PRNGKey(4)
    for i in range(8):
        rng, k = jax.random.split(rng)
        (l, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, k)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        losses.append(float(l))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses
    assert {"loss_cls", "loss_mask", "loss_dice"} <= set(logs)


def test_loss_single_no_valid_gt():
    """Zero-match image: losses finite, cls pushes everything to no-object."""
    cfg = _small_cfg()
    b, q = 1, cfg.num_queries
    cls = jnp.zeros((b, q, cfg.num_classes + 1))
    masks = jnp.zeros((b, q, 8, 8))
    gt_labels = jnp.zeros((b, 2), jnp.int32)
    gt_masks = jnp.zeros((b, 2, 8, 8))
    gt_valid = jnp.zeros((b, 2), bool)
    assign = jnp.full((b, 2), -1, jnp.int32)
    out = m2f.loss_single(
        cls, masks, gt_labels, gt_masks, gt_valid, assign, cfg,
        jax.random.PRNGKey(0), num_points=16,
    )
    assert all(np.isfinite(float(v)) for v in out.values())

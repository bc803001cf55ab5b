"""VideoMAE pretrain, TS baselines, profiler harness."""

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.core import encoder
from metatransformer_tpu.models import ts_baselines, video_pretrain
from metatransformer_tpu.tokenizers import video as video_tok
from metatransformer_tpu.utils import profiler


def _small_mae_cfg():
    return video_pretrain.VideoMAEConfig(
        tokenizer=video_tok.VideoTokenizerConfig(
            num_frames=4, img_size=16, patch_size=8, tubelet_size=2, dim=32
        ),
        encoder=encoder.EncoderConfig(dim=32, depth=2, num_heads=4),
        decoder=encoder.EncoderConfig(dim=16, depth=1, num_heads=2),
        mask_ratio=0.5,
    )


def test_tube_mask_properties():
    cfg = _small_mae_cfg()
    vis, masked = video_pretrain.tube_mask(jax.random.PRNGKey(0), cfg, batch=2)
    n = cfg.num_tokens
    assert vis.shape[1] + masked.shape[1] == n
    # disjoint cover of [0, n)
    for b in range(2):
        union = np.sort(np.r_[np.asarray(vis[b]), np.asarray(masked[b])])
        np.testing.assert_array_equal(union, np.arange(n))
    # tube property: same spatial pattern per temporal slice
    spatial = cfg.tokenizer.grid**2
    v = np.asarray(vis[0]) % spatial
    t = cfg.tokenizer.t_patches
    per_slice = v.reshape(t, -1)
    for i in range(1, t):
        np.testing.assert_array_equal(np.sort(per_slice[0]), np.sort(per_slice[i]))


def test_videomae_pretrain_loss_decreases():
    import optax

    cfg = _small_mae_cfg()
    params = video_pretrain.init(cfg, jax.random.PRNGKey(0))
    clips = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 4, 16, 16, 3), np.float32)
    )
    tx = optax.adam(1e-3)
    state = tx.init(params)

    @jax.jit
    def step(p, s, rng):
        loss, _ = video_pretrain.forward_loss(p, clips, rng, cfg)
        g = jax.grad(lambda p: video_pretrain.forward_loss(p, clips, rng, cfg)[0])(p)
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s, loss

    rng = jax.random.PRNGKey(1)
    l0 = float(video_pretrain.forward_loss(params, clips, rng, cfg)[0])
    for i in range(30):
        params, state, loss = step(params, state, jax.random.PRNGKey(i % 3))
    l1 = float(video_pretrain.forward_loss(params, clips, rng, cfg)[0])
    assert l1 < l0 * 0.9, (l0, l1)


def test_dlinear():
    cfg = ts_baselines.DLinearConfig(seq_len=24, pred_len=12, channels=3)
    params = ts_baselines.dlinear_init(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 24, 3), np.float32))
    out = ts_baselines.dlinear_forward(params, x, cfg)
    assert out.shape == (2, 12, 3)
    # constant input -> init (mean weights) predicts the constant
    const = jnp.ones((1, 24, 3))
    np.testing.assert_allclose(
        np.asarray(ts_baselines.dlinear_forward(params, const, cfg)), 1.0,
        rtol=1e-5,
    )


def test_moving_average_trend():
    x = jnp.asarray(np.arange(10, dtype=np.float32))[None, :, None]
    trend = ts_baselines.moving_average(x, 3)
    # interior: exact mean of the 3-window
    np.testing.assert_allclose(np.asarray(trend)[0, 1:-1, 0],
                               np.arange(1, 9, dtype=np.float32), rtol=1e-6)


def test_patchtst():
    cfg = ts_baselines.PatchTSTConfig(
        seq_len=32, pred_len=8, channels=2, patch_len=8, stride=4,
        encoder=encoder.EncoderConfig(dim=16, depth=1, num_heads=2),
    )
    params = ts_baselines.patchtst_init(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 32, 2), np.float32))
    out = ts_baselines.patchtst_forward(params, x, cfg)
    assert out.shape == (2, 8, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_profiler():
    from metatransformer_tpu.models import image_classifier
    from metatransformer_tpu.tokenizers import image as image_tok

    cfg = image_classifier.ImageClassifierConfig(
        tokenizer=image_tok.ImageTokenizerConfig(img_size=8, patch_size=4, dim=16),
        encoder=encoder.EncoderConfig(dim=16, depth=1, num_heads=2),
        num_classes=3,
    )
    params = image_classifier.init(cfg, jax.random.PRNGKey(0))
    x = jnp.zeros((4, 8, 8, 3))
    stats = profiler.profile_model(
        lambda p, im: image_classifier.forward(p, im, cfg), params, x, 4
    )
    assert stats["params_m"] > 0
    assert stats["seq_per_s"] > 0

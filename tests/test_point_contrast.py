"""PointContrast pretraining (pcdet unsupervised_model pattern)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from metatransformer_tpu.train import point_contrast as pc


def test_augment_view_preserves_structure():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((2, 32, 4)), jnp.float32)
    out = pc.augment_view(pts, jax.random.PRNGKey(1))
    assert out.shape == pts.shape
    # rigid-ish transform: pairwise distances preserved up to the scale
    d0 = np.linalg.norm(
        np.asarray(pts[0, :1, :3]) - np.asarray(pts[0, 1:2, :3])
    )
    d1 = np.linalg.norm(
        np.asarray(out[0, :1, :3]) - np.asarray(out[0, 1:2, :3])
    )
    assert 0.9 < d1 / d0 < 1.1
    # intensity channel untouched
    np.testing.assert_allclose(np.asarray(out[..., 3]), np.asarray(pts[..., 3]))
    # different keys -> different views
    out2 = pc.augment_view(pts, jax.random.PRNGKey(2))
    assert float(jnp.abs(out - out2).max()) > 1e-3


def test_pretrain_step_reduces_contrastive_loss():
    """A tiny invariance-learnable featurizer: InfoNCE must drop over a
    few steps on a fixed scene."""
    rng = np.random.default_rng(1)
    d = 16
    params = {
        "w1": jnp.asarray(rng.standard_normal((4, 32)) * 0.3, jnp.float32),
        "w2": jnp.asarray(rng.standard_normal((32, d)) * 0.3, jnp.float32),
    }

    def feature_fn(p, pts):
        h = jnp.tanh(pts @ p["w1"])
        return h @ p["w2"]

    opt = optax.adam(1e-2)
    state = opt.init(params)
    step = pc.make_pretrain_step(feature_fn, opt, num_pairs=24)
    pts = jnp.asarray(rng.standard_normal((2, 64, 4)), jnp.float32)

    losses = []
    key = jax.random.PRNGKey(0)
    for i in range(15):
        key, sub = jax.random.split(key)
        params, state, loss = step(params, state, pts, sub)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

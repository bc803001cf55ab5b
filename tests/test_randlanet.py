"""RandLA-Net (reference ``PointCloud/openpoints/models/backbone/
randlenet.py``): shape, inverse-permutation property, overfit."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from metatransformer_tpu.models import randlanet as rl
from metatransformer_tpu.utils.registry import MODELS

SMALL = rl.RandLANetConfig(
    num_classes=4, d_in=3, num_neighbors=8, decimation=4,
    enc_dims=(8, 16, 32), head_dims=(16,),
)


def _cloud(rng, b=2, n=64):
    return jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32) * 0.5)


def test_registered():
    assert MODELS.get("RandLANet").Config is rl.RandLANetConfig


def test_forward_shape_and_finite():
    params = rl.init(SMALL, jax.random.PRNGKey(0))
    pts = _cloud(np.random.default_rng(0))
    out = rl.forward(params, pts, SMALL, rng=jax.random.PRNGKey(1))
    assert out.shape == (2, 64, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_inverse_permutation_restores_input_order():
    """With decimation=1 nothing is dropped, so the output must be
    IDENTICAL for any random permutation — proving the inverse-perm
    plumbing maps row i of the output to input point i (:302)."""
    cfg = rl.RandLANetConfig(
        num_classes=3, d_in=3, num_neighbors=8, decimation=1,
        enc_dims=(8, 16), head_dims=(16,),
    )
    params = rl.init(cfg, jax.random.PRNGKey(0))
    pts = _cloud(np.random.default_rng(1), b=1, n=32)
    a = rl.forward(params, pts, cfg, rng=jax.random.PRNGKey(2))
    b = rl.forward(params, pts, cfg, rng=jax.random.PRNGKey(7))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_overfits_plane_split():
    params = rl.init(SMALL, jax.random.PRNGKey(1))
    rng = np.random.default_rng(3)
    cloud = rng.standard_normal((2, 64, 3)).astype(np.float32)
    x = jnp.asarray(cloud)
    labels = jnp.asarray((cloud[..., 2] > 0).astype(np.int64))

    opt = optax.adam(5e-3)
    state = opt.init(params)

    @jax.jit
    def step(p, s, key):
        def loss_fn(pp):
            logits = rl.forward(pp, x, SMALL, rng=key)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()

        loss, g = jax.value_and_grad(loss_fn)(p)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s, loss

    key = jax.random.PRNGKey(5)
    losses = []
    for i in range(80):
        key, sub = jax.random.split(key)
        params, state, loss = step(params, state, sub)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.15, losses[::20]
    acc = (
        np.asarray(
            rl.forward(params, x, SMALL, rng=jax.random.PRNGKey(9))
        ).argmax(-1)
        == np.asarray(labels)
    ).mean()
    assert acc > 0.9, acc

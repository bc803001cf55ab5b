"""BAAF-Net (reference ``PointCloud/openpoints/models/backbone/
baafnet.py``): shape, bilateral-offset behavior, overfit."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from metatransformer_tpu.models import baafnet as bf
from metatransformer_tpu.utils.registry import MODELS

SMALL = bf.BAAFNetConfig(num_classes=4, d_in=3, k=8, dims=(4, 8, 16))


def _cloud(rng, b=2, n=64):
    return jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32) * 0.5)


def test_registered():
    assert MODELS.get("BAAFNet").Config is bf.BAAFNetConfig


def test_forward_shape_and_finite():
    params = bf.init(SMALL, jax.random.PRNGKey(0))
    pts = _cloud(np.random.default_rng(0))
    out = bf.forward(params, pts, SMALL)
    assert out.shape == (2, 64, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_bilateral_augmentation_shifts_neighbors():
    """The semantic-predicted offsets must actually move p_knn_tilde away
    from the raw gathered neighbors (baafnet.py:284-287) while keeping
    the alc feature block at d_out channels."""
    rng = np.random.default_rng(1)
    d_in, d_out, k = 8, 16, 8
    p = bf._ba_init(jax.random.PRNGKey(0), d_in, d_out)
    pts = _cloud(rng, b=1, n=32)
    f = jnp.asarray(rng.standard_normal((1, 32, d_in)).astype(np.float32))
    alc, p_knn_tilde = bf._bilateral_augmentation(p, pts, f, k)
    assert alc.shape == (1, 32, k, d_out)
    from metatransformer_tpu.ops import point_ops as po

    _, nidx = po.knn(pts, pts, k)
    p_knn = po.gather_points(pts, nidx)
    assert float(jnp.abs(p_knn_tilde - p_knn).max()) > 1e-4


def test_overfits_plane_split():
    params = bf.init(SMALL, jax.random.PRNGKey(1))
    rng = np.random.default_rng(3)
    cloud = rng.standard_normal((2, 64, 3)).astype(np.float32)
    x = jnp.asarray(cloud)
    labels = jnp.asarray((cloud[..., 2] > 0).astype(np.int64))

    opt = optax.adam(5e-3)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(pp):
            logits = bf.forward(pp, x, SMALL)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()

        loss, g = jax.value_and_grad(loss_fn)(p)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s, loss

    losses = []
    for _ in range(80):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.12, losses[::20]
    acc = (
        np.asarray(bf.forward(params, x, SMALL)).argmax(-1)
        == np.asarray(labels)
    ).mean()
    assert acc > 0.95, acc

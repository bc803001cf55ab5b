"""SimpleView (reference ``PointCloud/openpoints/models/backbone/
simpleview.py`` + ``simpleview_util.py``): projection properties,
shape, overfit."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from metatransformer_tpu.models import simpleview as sv
from metatransformer_tpu.utils.registry import MODELS

SMALL = sv.SimpleViewConfig(
    num_classes=4, channels=4, resolution=32, blocks_per_stage=1
)


def _cloud(rng, b=2, n=128):
    return jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32) * 0.4)


def test_registered():
    assert MODELS.get("SimpleView").Config is sv.SimpleViewConfig


def test_projection_shapes_and_content():
    pts = _cloud(np.random.default_rng(0), b=2)
    img = sv.project_views(pts, 32)
    assert img.shape == (12, 32, 32)
    a = np.asarray(img)
    assert np.isfinite(a).all()
    # every view must receive some splat mass (points sit in front of
    # all six cameras after the z=-1.4 translation)
    nonzero_per_view = (np.abs(a) > 0).reshape(12, -1).sum(-1)
    assert (nonzero_per_view > 0).all(), nonzero_per_view
    # the six views of one cloud are genuinely different projections
    assert not np.allclose(a[0], a[1])


def test_forward_shape_and_finite():
    params = sv.init(SMALL, jax.random.PRNGKey(0))
    pts = _cloud(np.random.default_rng(0))
    out = sv.forward(params, pts, SMALL)
    assert out.shape == (2, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_overfits_two_shapes():
    params = sv.init(SMALL, jax.random.PRNGKey(1))
    rng = np.random.default_rng(3)
    n = 128
    sph = rng.standard_normal((2, n, 3))
    sph /= np.linalg.norm(sph, axis=-1, keepdims=True)
    disk = rng.standard_normal((2, n, 3)) * np.asarray([0.7, 0.7, 0.02])
    pts = jnp.asarray(np.concatenate([sph, disk]).astype(np.float32))
    labels = jnp.asarray([0, 0, 1, 1])

    opt = optax.adam(3e-3)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(pp):
            logits = sv.forward(pp, pts, SMALL)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()

        loss, g = jax.value_and_grad(loss_fn)(p)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s, loss

    losses = []
    for _ in range(60):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.1, losses[::15]
    preds = np.asarray(sv.forward(params, pts, SMALL)).argmax(-1)
    np.testing.assert_array_equal(preds, [0, 0, 1, 1])

"""Training-convergence proof for the detector zoo: a few optimizer
steps on one fixed batch must substantially reduce the loss — catches
wiring bugs that shape/finiteness checks miss (SURVEY §4 pattern)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from metatransformer_tpu.models import centerpoint as cp
from metatransformer_tpu.models import second
from tests.test_centerpoint import SMALL as CP_SMALL


def _points(seed=7, n=128):
    rng = np.random.default_rng(seed)
    pts = np.zeros((1, n, 4), np.float32)
    pts[0, :, 0] = rng.uniform(0, 6.4, n)
    pts[0, :, 1] = rng.uniform(-3.2, 3.2, n)
    pts[0, :, 2] = rng.uniform(-3, 2, n)
    pts[0, :, 3] = rng.uniform(0, 1, n)
    return jnp.asarray(pts)


def test_centerpoint_loss_decreases():
    cfg = CP_SMALL
    params = cp.init(cfg, jax.random.PRNGKey(0))
    pts = _points()
    gt = jnp.asarray([[[2.0, 0.5, -1.0, 3.2, 1.6, 1.5, 0.3],
                       [0, 0, 0, 0, 0, 0, 0]]], jnp.float32)
    lab = jnp.asarray([[1, 0]], jnp.int32)
    val = jnp.asarray([[True, False]])

    opt = optax.adam(3e-3)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(pp):
            pr = cp.forward(pp, pts, cfg)
            return cp.detection_loss(pr, gt, lab, val, cfg)[0]

        loss, g = jax.value_and_grad(loss_fn)(p)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s, loss

    losses = []
    for _ in range(25):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], losses[::6]


def test_second_loss_decreases():
    cfg = second.SECONDConfig(
        voxel_size=(0.1, 0.1, 0.2),
        pc_range=(0.0, -3.2, -3.0, 6.4, 3.2, 2.0),
        spatial_shape=(25, 64, 64),
        max_voxels=256,
        widths=(4, 4, 8, 8, 8, 8),
        bev_channels=(8, 16),
        up_channels=8,
    )
    anchors = jnp.asarray(second.generate_anchors(cfg))
    params = second.init(cfg, jax.random.PRNGKey(0))
    pts = _points(11)
    gt = jnp.asarray([[[2.0, 0.5, -1.0, 3.9, 1.6, 1.56, 0.0],
                       [0, 0, 0, 0, 0, 0, 0]]], jnp.float32)
    gv = jnp.asarray([[True, False]])

    opt = optax.adam(3e-3)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(pp):
            pr = second.forward(pp, pts, cfg)
            return second.detection_loss(pr, anchors, gt, gv, cfg)[0]

        loss, g = jax.value_and_grad(loss_fn)(p)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s, loss

    losses = []
    for _ in range(25):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], losses[::6]

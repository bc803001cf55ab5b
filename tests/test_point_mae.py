"""MaskedPointViT (point-MAE) reconstruction pretraining: forward shape,
masking bookkeeping, and end-to-end overfit through encoder + decoder +
mask token (reference: openpoints/models/reconstruction/maskedpointvit.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from metatransformer_tpu.models import point_mae


TINY = point_mae.MaskedPointViTConfig(
    dim=32, depth=2, num_heads=4, decoder_dim=16, decoder_depth=1,
    decoder_heads=2, mask_ratio=0.5, sample_ratio=0.125, group_size=8,
)


def _points(b=2, n=64, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((b, n, 3)) * 0.5, jnp.float32)


def test_forward_shapes_and_finite_loss():
    params = point_mae.init(TINY, jax.random.PRNGKey(0))
    pts = _points()
    loss, pred = point_mae.forward(params, pts, jax.random.PRNGKey(1), TINY)
    n_groups = int(64 * TINY.sample_ratio)
    assert pred.shape == (2, n_groups, TINY.group_size * 3)
    assert jnp.isfinite(loss) and float(loss) > 0.0


def test_masking_changes_with_rng():
    """Different mask draws -> different reconstructions (the mask is real,
    not a no-op)."""
    params = point_mae.init(TINY, jax.random.PRNGKey(0))
    pts = _points()
    _, p1 = point_mae.forward(params, pts, jax.random.PRNGKey(1), TINY)
    _, p2 = point_mae.forward(params, pts, jax.random.PRNGKey(2), TINY)
    assert float(jnp.abs(p1 - p2).max()) > 1e-6


def test_overfit_single_batch():
    """Loss falls to <0.6x initial in 60 Adam steps; gradients reach the
    mask token and both stacks (silent-gradient guard)."""
    params = point_mae.init(TINY, jax.random.PRNGKey(0))
    pts = _points()

    def loss_fn(p, rng):
        loss, _ = point_mae.forward(p, pts, rng, TINY)
        return loss

    tx = optax.adam(2e-3)
    state = tx.init(params)
    init_loss = float(loss_fn(params, jax.random.PRNGKey(100)))

    g0 = jax.grad(loss_fn)(params, jax.random.PRNGKey(100))
    assert float(jnp.abs(g0["mask_token"]).max()) > 0.0
    assert float(jnp.abs(g0["encoder"]["qkv_w"]).max()) > 0.0
    assert float(jnp.abs(g0["decoder"]["qkv_w"]).max()) > 0.0

    @jax.jit
    def step(p, s, rng):
        l, g = jax.value_and_grad(loss_fn)(p, rng)
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    key = jax.random.PRNGKey(7)
    for _ in range(60):
        key, sub = jax.random.split(key)
        params, state, loss = step(params, state, sub)
    assert float(loss) < 0.6 * init_loss


def test_registry_entry():
    from metatransformer_tpu.utils.registry import MODELS

    mod = MODELS.get("MaskedPointViT")
    assert mod.Config is point_mae.MaskedPointViTConfig

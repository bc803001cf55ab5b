"""Tier-4 point baselines (BallDGCNN, GroupPointNet, ViTGraph): forward
shape + single-batch overfit per zoo entry (reference:
openpoints/models/backbone/{ball_dgcnn,grouppointnet,graphvit3d}.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from metatransformer_tpu.models import point_baselines3 as pb3


CONFIGS = {
    "BallDGCNN": pb3.BallDGCNNConfig(
        num_classes=4, channels=8, embed_dim=32, n_blocks=4, k=8,
        radius=0.4, head_fcs=(16,),
    ),
    "GroupPointNet": pb3.GroupPointNetConfig(
        num_classes=4, channels=8, n_blocks=4, k=8, head_fcs=(16,),
    ),
    "ViTGraph": pb3.ViTGraphConfig(
        num_classes=4, encoder_dim=32, embed_dim=16, depth=2, num_heads=4,
        num_groups=128, group_size=8, head_fcs=(16,),
    ),
}
FORWARDS = {
    "BallDGCNN": pb3.balldgcnn_forward,
    "GroupPointNet": pb3.grouppointnet_forward,
    "ViTGraph": pb3.vitgraph_forward,
}
INITS = {
    "BallDGCNN": pb3.balldgcnn_init,
    "GroupPointNet": pb3.grouppointnet_init,
    "ViTGraph": pb3.vitgraph_init,
}


def _data(b=4, n=64, seed=0, ncls=4):
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.standard_normal((b, n, 3)) * 0.5, jnp.float32)
    labels = jnp.asarray(rng.integers(0, ncls, (b,)))
    return pts, labels


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_forward_shape(name):
    cfg = CONFIGS[name]
    params = INITS[name](cfg, jax.random.PRNGKey(0))
    pts, _ = _data()
    out = FORWARDS[name](params, pts, cfg)
    assert out.shape == (4, 4)
    assert bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_overfit(name):
    cfg = CONFIGS[name]
    params = INITS[name](cfg, jax.random.PRNGKey(0))
    pts, labels = _data()
    fwd = FORWARDS[name]

    def loss_fn(p):
        logits = fwd(p, pts, cfg)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels
        ).mean()

    tx = optax.adam(5e-3)
    state = tx.init(params)
    init = float(loss_fn(params))

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(loss_fn)(p)
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    for _ in range(80):
        params, state, loss = step(params, state)
    assert float(loss) < 0.3 * init


def test_registry():
    from metatransformer_tpu.utils.registry import MODELS

    for name in CONFIGS:
        assert MODELS.get(name) is not None

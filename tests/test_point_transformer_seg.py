"""PointTransformer segmentation U-Net (reference
``PointCloud/openpoints/models/backbone/pointtransformer.py``): shape,
overfit and gradient-flow proofs at block geometry."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from metatransformer_tpu.models import point_transformer_seg as pts
from metatransformer_tpu.utils.registry import MODELS

SMALL = pts.PointTransformerSegConfig(
    num_classes=4, in_channels=3, width=8,
    blocks=(2, 2, 2), strides=(1, 4, 4), nsample=(8, 8, 8), share_planes=4,
)


def test_registered():
    assert MODELS.get("PointTransformerSeg").Config is pts.PointTransformerSegConfig


def test_forward_shape_and_finite():
    params = pts.init(SMALL, jax.random.PRNGKey(0))
    pts_in = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 64, 3), np.float32) * 0.5
    )
    out = pts.forward(params, pts_in, SMALL)
    assert out.shape == (2, 64, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_overfits_plane_split():
    """Per-point labels: which side of the z=0 plane — the seg-path
    overfit proof (classifier pattern of tests/test_convergence.py)."""
    params = pts.init(SMALL, jax.random.PRNGKey(1))
    rng = np.random.default_rng(3)
    cloud = rng.standard_normal((2, 64, 3)).astype(np.float32)
    x = jnp.asarray(cloud)
    labels = jnp.asarray((cloud[..., 2] > 0).astype(np.int64))

    opt = optax.adam(5e-3)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(pp):
            logits = pts.forward(pp, x, SMALL)
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
    assert losses[-1] < 0.1, losses[::20]
    acc = (
        np.asarray(pts.forward(params, x, SMALL)).argmax(-1)
        == np.asarray(labels)
    ).mean()
    assert acc > 0.97, acc


def test_gradients_reach_all_stages():
    params = pts.init(SMALL, jax.random.PRNGKey(2))
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 64, 3), np.float32)
    )

    g = jax.grad(lambda p: jnp.sum(pts.forward(p, x, SMALL) ** 2))(params)
    # encoder downs, every decoder lin, and the head all receive grads
    for name in ("enc0_down", "enc2_down", "dec_head_lin1", "dec0_lin2",
                 "cls2"):
        leaves = jax.tree_util.tree_leaves(g[name])
        assert any(float(jnp.abs(l).max()) > 0 for l in leaves), name

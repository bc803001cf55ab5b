"""CurveNet (reference ``PointCloud/openpoints/models/backbone/
curvenet.py``): walk mechanics, aggregation, end-to-end shape/overfit."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from metatransformer_tpu.models import curvenet as cn
from metatransformer_tpu.utils.registry import MODELS

SMALL = cn.CurveNetConfig(
    num_classes=4, embed_dim=8, k=8,
    stages=(
        cn.CICStage(64, 0.4, 8, 16, (8, 3)),
        cn.CICStage(16, 0.8, 8, 32, None),
    ),
    head_fcs=(16,),
)


def _cloud(rng, b=2, n=64):
    return jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32) * 0.5)


def test_registered():
    assert MODELS.get("CurveNet").Config is cn.CurveNetConfig


def test_walk_visits_graph_neighbors():
    """Every hop of every curve lands on a kNN neighbor of the previous
    node, and the returned features are the features of visited nodes."""
    rng = np.random.default_rng(0)
    b, n, c, k, cn_num, cl = 1, 16, 4, 4, 3, 4
    x = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32))
    from metatransformer_tpu.ops import point_ops as po

    xyz = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32))
    _, nidx = po.knn(xyz, xyz, k + 1)
    adj = nidx[..., 1:]
    params = cn._walk_init(jax.random.PRNGKey(0), c)
    start = jnp.asarray([[0, 5, 9]], jnp.int32)
    curves = cn._walk(params, x, adj, start, cl)
    assert curves.shape == (b, cn_num, cl, c)
    # every step's feature must equal SOME node's feature row
    flat = np.asarray(x[0])
    for ci in range(cn_num):
        for s in range(cl):
            f = np.asarray(curves[0, ci, s])
            dists = np.abs(flat - f).sum(-1)
            assert dists.min() < 1e-5
    # and step 0 follows from the start node's adjacency
    first = np.asarray(curves[0, :, 0])
    for ci, s0 in enumerate([0, 5, 9]):
        neigh = np.asarray(adj[0, s0])
        cand = flat[neigh]
        assert np.abs(cand - first[ci]).sum(-1).min() < 1e-5


def test_forward_shape_and_finite():
    params = cn.init(SMALL, jax.random.PRNGKey(0))
    pts = _cloud(np.random.default_rng(0))
    out = cn.forward(params, pts, SMALL)
    assert out.shape == (2, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_gradients_flow_through_walk():
    """The ST-gumbel estimator must pass gradients into the agent and
    momentum MLPs (the walk's trainable parts)."""
    params = cn.init(SMALL, jax.random.PRNGKey(1))
    pts = _cloud(np.random.default_rng(1))
    g = jax.grad(lambda p: jnp.sum(cn.forward(p, pts, SMALL) ** 2))(params)
    for sub in ("walk", "agg", "start_att"):
        leaves = jax.tree_util.tree_leaves(g["cic0a"][sub])
        assert any(float(jnp.abs(l).max()) > 0 for l in leaves), sub


def test_overfits_two_shapes():
    params = cn.init(SMALL, jax.random.PRNGKey(2))
    rng = np.random.default_rng(3)
    n = 64
    sph = rng.standard_normal((2, n, 3))
    sph /= np.linalg.norm(sph, axis=-1, keepdims=True)
    disk = rng.standard_normal((2, n, 3)) * np.asarray([0.7, 0.7, 0.02])
    pts = jnp.asarray(np.concatenate([sph, disk]).astype(np.float32))
    labels = jnp.asarray([0, 0, 1, 1])

    opt = optax.adam(5e-3)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(pp):
            logits = cn.forward(pp, pts, SMALL)
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
    preds = np.asarray(cn.forward(params, pts, SMALL)).argmax(-1)
    np.testing.assert_array_equal(preds, [0, 0, 1, 1])

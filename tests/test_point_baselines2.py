"""Point-cloud baseline zoo tier 2 (PointNet / PCT / PointViT / DeepGCN):
forward shapes + overfit proofs at ModelNet geometry (reference:
``PointCloud/openpoints/models/backbone/{pointnet,pct,pointvit,
deepgcn}.py``; test pattern per SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from metatransformer_tpu.models import point_baselines2 as pb2
from metatransformer_tpu.utils.registry import MODELS

SMALL_CFGS = {
    "PointNetEncoder": pb2.PointNetConfig(num_classes=4, head_fcs=(32,)),
    "PCT": pb2.PCTConfig(
        num_classes=4, stem=(8, 8), stage_points=(16, 8),
        stage_channels=(16, 32), k=8, num_sa=2, fuse_dim=32, head_fcs=(16,),
    ),
    "PointViT": pb2.PointViTConfig(
        num_classes=4, dim=32, depth=2, num_heads=4,
        num_groups=128, group_size=8, head_fcs=(16,),
    ),
    "DeepGCN": pb2.DeepGCNConfig(
        num_classes=4, channels=8, emb_dim=32, n_blocks=3, k=4,
        head_fcs=(16,),
    ),
}


def _cloud(rng, b=2, n=64):
    return jnp.asarray(
        rng.standard_normal((b, n, 3)).astype(np.float32) * 0.5
    )


@pytest.mark.parametrize("name", sorted(SMALL_CFGS))
def test_forward_shape_and_finite(name):
    mod = MODELS.get(name)
    cfg = SMALL_CFGS[name]
    params = mod.init(cfg, jax.random.PRNGKey(0))
    pts = _cloud(np.random.default_rng(0))
    logits = mod.forward(params, pts, cfg)
    assert logits.shape == (2, 4)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.parametrize("name", sorted(SMALL_CFGS))
def test_overfits_two_shapes(name):
    """Each baseline separates a sphere shell from a flat disk."""
    mod = MODELS.get(name)
    cfg = SMALL_CFGS[name]
    params = mod.init(cfg, jax.random.PRNGKey(1))
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
            logits = mod.forward(pp, pts, cfg)
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
    preds = np.asarray(mod.forward(params, pts, cfg)).argmax(-1)
    np.testing.assert_array_equal(preds, [0, 0, 1, 1])


def test_pointnet_stn_starts_at_identity():
    """The STN regression is initialized so the transform is exactly the
    identity at init (pointnet.py:30,44-47) — forward(init) must equal a
    no-transform forward."""
    cfg = pb2.PointNetConfig(num_classes=4, head_fcs=(32,))
    cfg_off = pb2.PointNetConfig(
        num_classes=4, head_fcs=(32,),
        input_transform=False, feature_transform=False,
    )
    params = pb2.pointnet_init(cfg, jax.random.PRNGKey(0))
    pts = _cloud(np.random.default_rng(0))
    a = pb2.pointnet_forward(params, pts, cfg)
    b = pb2.pointnet_forward(params, pts, cfg_off)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_pointnet_ft_regularizer():
    """||I - AA^T|| is 0 at init (identity transform) and differentiable."""
    cfg = pb2.PointNetConfig(num_classes=4)
    params = pb2.pointnet_init(cfg, jax.random.PRNGKey(0))
    pts = _cloud(np.random.default_rng(1))
    reg = pb2.pointnet_feature_transform_regularizer(params, pts, cfg)
    assert float(reg) < 1e-8
    g = jax.grad(
        lambda p: pb2.pointnet_feature_transform_regularizer(p, pts, cfg)
    )(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_modelnet_geometry_runs():
    """Full ModelNet40 geometry (1024 points) through the default configs."""
    for name in ("PointNetEncoder", "PCT"):
        mod = MODELS.get(name)
        cfg = mod.Config()
        params = mod.init(cfg, jax.random.PRNGKey(0))
        pts = _cloud(np.random.default_rng(1), b=1, n=1024)
        logits = mod.forward(params, pts, cfg)
        assert logits.shape == (1, 40)
        assert np.isfinite(np.asarray(logits)).all()

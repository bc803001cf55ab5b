"""Point-cloud baseline zoo: forward shapes + overfit proofs at ModelNet
geometry (reference baselines:
``PointCloud/openpoints/models/backbone/{pointnetv2,dgcnn,pointmlp,
pointnext}.py``; test pattern per SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from metatransformer_tpu.models import point_baselines as pb
from metatransformer_tpu.utils.registry import MODELS

SMALL_CFGS = {
    "PointNet2Encoder": pb.PointNet2Config(
        num_classes=4,
        stages=(
            pb.SAMSGStage(32, (0.2, 0.4), (8, 16), ((8, 16), (8, 16))),
            pb.SAMSGStage(8, (0.4, 0.8), (8, 16), ((16, 32), (16, 32))),
        ),
        global_mlp=(32, 64),
        head_fcs=(32,),
    ),
    "DGCNN": pb.DGCNNConfig(
        num_classes=4, k=8, edge_channels=(8, 8, 16), emb_dim=32,
        head_fcs=(16,),
    ),
    "PointMLP": pb.PointMLPConfig(
        num_classes=4, embed_dim=8, k=8, stage_channels=(8, 16),
        head_fcs=(16,),
    ),
    "PointNeXt": pb.PointNeXtConfig(
        num_classes=4, stem_dim=8, stage_channels=(8, 16),
        base_radius=0.3, k=8, head_fcs=(16,),
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
    """Each baseline separates a sphere shell from a flat disk — the
    ModelNet-style overfit proof (classifier pattern of
    tests/test_convergence.py)."""
    mod = MODELS.get(name)
    cfg = SMALL_CFGS[name]
    params = mod.init(cfg, jax.random.PRNGKey(1))
    rng = np.random.default_rng(3)
    n = 64
    # class 0: unit sphere shell; class 1: flat disk
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


def test_modelnet_geometry_runs():
    """Full ModelNet40 geometry (1024 points) through the default configs
    — the published baseline setting."""
    for name in ("PointNet2Encoder", "DGCNN"):
        mod = MODELS.get(name)
        cfg = mod.Config()
        params = mod.init(cfg, jax.random.PRNGKey(0))
        pts = _cloud(np.random.default_rng(1), b=1, n=1024)
        logits = mod.forward(params, pts, cfg)
        assert logits.shape == (1, 40)
        assert np.isfinite(np.asarray(logits)).all()

"""PVRCNNHeadMoE: per-source gated-residual experts on the shared RoI
features (pcdet/models/roi_heads/pvrcnn_head_MoE.py:33-43,170-178) —
source-switched gating, gradient isolation per expert."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.models import pv_rcnn as pv

from tests.test_pv_rcnn import SMALL

MOE = dataclasses.replace(SMALL, moe_sources=2)


def _pooled(cfg, b=2, seed=0):
    c = cfg.grid_size**3 * cfg.roi_mlp * len(cfg.roi_radii)
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.standard_normal((b, cfg.num_rois, c)), jnp.float32
    )


def test_moe_gates_switch_by_source():
    params = pv.init(MOE, jax.random.PRNGKey(0))
    pooled = _pooled(MOE)
    cls0, reg0 = pv.refine(params, pooled, MOE, source_id=jnp.int32(0))
    cls1, reg1 = pv.refine(params, pooled, MOE, source_id=jnp.int32(1))
    clsn, _ = pv.refine(params, pooled, MOE, source_id=None)
    # different experts -> different refinements; gate off -> different again
    assert float(jnp.abs(cls0 - cls1).max()) > 1e-6
    assert float(jnp.abs(reg0 - reg1).max()) > 1e-6
    assert float(jnp.abs(cls0 - clsn).max()) > 1e-6


def test_moe_gradients_isolated_per_expert():
    """Training on source 0 must leave source 1's expert untouched."""
    params = pv.init(MOE, jax.random.PRNGKey(1))
    pooled = _pooled(MOE, seed=2)

    def loss(p, sid):
        cls, reg = pv.refine(p, pooled, MOE, source_id=sid)
        return jnp.sum(cls**2) + jnp.sum(reg**2)

    g = jax.grad(loss)(params, jnp.int32(0))
    gw = np.asarray(g["moe_gate"]["w"])
    assert np.abs(gw[0]).max() > 0.0
    np.testing.assert_array_equal(gw[1], 0.0)


def test_moe_one_executable_for_all_tags():
    """source_id is traced: one jitted refine serves every tag."""
    params = pv.init(MOE, jax.random.PRNGKey(2))
    pooled = _pooled(MOE, seed=3)
    refined = jax.jit(
        lambda p, x, s: pv.refine(p, x, MOE, source_id=s),
        static_argnums=(),
    )
    a = refined(params, pooled, jnp.int32(0))
    b = refined(params, pooled, jnp.int32(1))
    assert float(jnp.abs(a[0] - b[0]).max()) > 1e-6

"""MoE encoder variant: shapes, dense-layer parity with the shared
encoder, aux loss wiring, end-to-end overfit through routers + experts."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from metatransformer_tpu.core import encoder as enc, moe_encoder as me


TINY = me.MoEEncoderConfig(
    dim=32, depth=4, num_heads=4, n_experts=4, moe_every=2,
    capacity_factor=4.0,
)


def _x(b=2, t=16, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((b, t, TINY.dim)), jnp.float32)


def test_shapes_and_aux():
    params = me.init(TINY, jax.random.PRNGKey(0))
    out, aux = me.encode(params, _x(), TINY)
    assert out.shape == (2, 16, 32)
    assert bool(jnp.isfinite(aux)) and float(aux) > 0.0
    # blocks 1 and 3 are MoE, 0 and 2 dense
    assert "moe" in params["layers"][1] and "moe" in params["layers"][3]
    assert "fc1_w" in params["layers"][0] and "fc1_w" not in params["layers"][1]


def test_all_dense_matches_shared_encoder():
    """With moe_every > depth no layer is MoE; the stack must equal the
    shared scan encoder on identical params."""
    cfg = dataclasses.replace(TINY, moe_every=100)
    params = me.init(cfg, jax.random.PRNGKey(1))
    x = _x(seed=2)
    out, aux = me.encode(params, x, cfg)
    assert float(aux) == 0.0
    # restack per-layer params into the scan encoder's layout
    stacked = {
        k: jnp.stack([lp[k] for lp in params["layers"]])
        for k in params["layers"][0]
    }
    ecfg = enc.EncoderConfig(
        dim=cfg.dim, depth=cfg.depth, num_heads=cfg.num_heads,
        attn_impl="xla",
    )
    ref = enc.encode(stacked, x, ecfg)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_overfit_with_aux():
    """CE + aux loss falls; gradients reach routers and experts."""
    params = me.init(TINY, jax.random.PRNGKey(2))
    x = _x(b=4, seed=3)
    rng = np.random.default_rng(4)
    labels = jnp.asarray(rng.integers(0, 8, (4,)))
    head = jnp.zeros((TINY.dim, 8))
    state_p = {"enc": params, "head": head}

    def loss_fn(p):
        out, aux = me.encode(p["enc"], x, TINY)
        logits = jnp.mean(out, axis=1) @ p["head"]
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels
        ).mean()
        return ce + aux

    g = jax.grad(loss_fn)(state_p)
    moe_g = g["enc"]["layers"][1]["moe"]
    assert float(jnp.abs(moe_g["router_w"]).max()) > 0
    assert float(jnp.abs(moe_g["fc1_w"]).max()) > 0

    tx = optax.adam(3e-3)
    st = tx.init(state_p)
    init = float(loss_fn(state_p))

    @jax.jit
    def step(p, s):
        l, gg = jax.value_and_grad(loss_fn)(p)
        u, s = tx.update(gg, s, p)
        return optax.apply_updates(p, u), s, l

    for _ in range(60):
        state_p, st, loss = step(state_p, st)
    assert float(loss) < 0.5 * init


def test_encode_ep_matches_dense():
    """Expert-parallel moe-encoder (experts one-per-device over an 8-dev
    'expert' mesh, all_to_all dispatch) == the dense encode, token for
    token, when capacity admits every token."""
    from jax.sharding import Mesh

    cfg = dataclasses.replace(
        TINY, n_experts=8, capacity_factor=8.0, depth=2
    )
    params = me.init(cfg, jax.random.PRNGKey(5))
    x = _x(b=8, t=8, seed=6)
    dense, dense_aux = me.encode(params, x, cfg)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("expert",))
    ep, ep_aux = me.make_encode_ep(cfg, mesh)(params, x)
    np.testing.assert_allclose(
        np.asarray(ep), np.asarray(dense), atol=1e-5, rtol=1e-5
    )
    assert np.isfinite(float(ep_aux))

"""Switch-style MoE + expert parallelism: routing semantics, capacity
drops, EP (all_to_all over an 'expert' mesh axis) parity vs the dense
reference, gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from metatransformer_tpu.parallel import moe


def _x(b=8, t=16, d=32, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)


def test_dense_moe_shapes_and_aux():
    params = moe.init(jax.random.PRNGKey(0), 32, 64, 4)
    x = _x()
    out, aux = moe.moe_mlp(params, x, 4, capacity_factor=2.0)
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))
    # Switch aux loss is >= 1 (equals 1 under perfectly uniform routing)
    assert float(aux) >= 0.99


def test_capacity_drops_tokens():
    """With a tiny capacity most tokens overflow and pass through as
    zeros (the caller's residual carries them — Switch semantics)."""
    params = moe.init(jax.random.PRNGKey(1), 16, 32, 4)
    x = _x(b=4, t=16, d=16, seed=1)
    out_small, _ = moe.moe_mlp(params, x, 4, capacity_factor=0.1)
    out_big, _ = moe.moe_mlp(params, x, 4, capacity_factor=8.0)
    zeros_small = int(jnp.sum(jnp.all(out_small == 0.0, axis=-1)))
    zeros_big = int(jnp.sum(jnp.all(out_big == 0.0, axis=-1)))
    assert zeros_small > zeros_big


def test_expert_parallel_matches_dense():
    """4-way EP == dense reference when capacity is ample (no drops)."""
    params = moe.init(jax.random.PRNGKey(2), 32, 64, 4)
    x = _x(seed=3)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("expert",))
    ep = moe.make_expert_parallel_moe(mesh, 4, capacity_factor=8.0)
    out_ep, aux_ep = ep(params, x)
    out_dense, _ = moe.moe_mlp(params, x, 4, capacity_factor=8.0)
    np.testing.assert_allclose(
        np.asarray(out_ep), np.asarray(out_dense), atol=1e-5, rtol=1e-5
    )
    assert np.isfinite(float(aux_ep))


def test_expert_parallel_gradients():
    params = moe.init(jax.random.PRNGKey(3), 16, 32, 4)
    x = _x(b=4, t=8, d=16, seed=4)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("expert",))
    ep = moe.make_expert_parallel_moe(mesh, 4, capacity_factor=8.0)

    def loss(p):
        out, aux = ep(p, x)
        return jnp.sum(out**2) + 0.01 * aux

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["fc1_w"]).max()) > 0
    assert float(jnp.abs(g["router_w"]).max()) > 0

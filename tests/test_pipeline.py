"""GPipe pipeline parallelism over the encoder block stack: parity vs the
dense encoder, multi-layer stages, DP x PP mesh, and gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from metatransformer_tpu.core import encoder as enc
from metatransformer_tpu.parallel import pipeline as pp


def _x(b=4, t=16, d=32, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)


def test_pipeline_matches_dense_one_layer_per_stage():
    cfg = enc.EncoderConfig(dim=32, depth=4, num_heads=4, attn_impl="xla")
    params = enc.init(cfg, jax.random.PRNGKey(0))
    x = _x()
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("pipe",))
    apply = pp.make_pipeline_encode(mesh, cfg, n_microbatches=2)
    np.testing.assert_allclose(
        np.asarray(apply(params, x)),
        np.asarray(enc.encode(params, x, cfg)),
        atol=1e-5, rtol=1e-5,
    )


def test_pipeline_matches_dense_two_layers_per_stage():
    cfg = enc.EncoderConfig(dim=32, depth=8, num_heads=4, attn_impl="xla")
    params = enc.init(cfg, jax.random.PRNGKey(1))
    x = _x(b=8, seed=2)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("pipe",))
    apply = pp.make_pipeline_encode(mesh, cfg, n_microbatches=4)
    np.testing.assert_allclose(
        np.asarray(apply(params, x)),
        np.asarray(enc.encode(params, x, cfg)),
        atol=1e-5, rtol=1e-5,
    )


def test_pipeline_dp_combo():
    """2-way data x 4-stage pipe mesh."""
    cfg = enc.EncoderConfig(dim=32, depth=4, num_heads=2, attn_impl="xla")
    params = enc.init(cfg, jax.random.PRNGKey(2))
    x = _x(b=8, seed=3)
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "pipe"))
    apply = pp.make_pipeline_encode(
        mesh, cfg, n_microbatches=2, batch_axis="data"
    )
    np.testing.assert_allclose(
        np.asarray(apply(params, x)),
        np.asarray(enc.encode(params, x, cfg)),
        atol=1e-5, rtol=1e-5,
    )


def test_pipeline_gradients():
    cfg = enc.EncoderConfig(dim=32, depth=4, num_heads=2, attn_impl="xla")
    params = enc.init(cfg, jax.random.PRNGKey(3))
    x = _x(seed=4)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("pipe",))
    apply = pp.make_pipeline_encode(mesh, cfg, n_microbatches=2)

    g_pp = jax.grad(lambda p: jnp.sum(apply(p, x) ** 2))(params)
    g_ref = jax.grad(lambda p: jnp.sum(enc.encode(p, x, cfg) ** 2))(params)
    for k in g_ref:
        np.testing.assert_allclose(
            np.asarray(g_pp[k]), np.asarray(g_ref[k]), atol=1e-3, rtol=1e-3
        )

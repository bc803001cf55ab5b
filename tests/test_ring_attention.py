"""Ring attention (sequence-parallel exact attention, SURVEY §5.7 stretch
goal): parity vs dense softmax attention on the 8-device CPU mesh,
masked variant, 2D (data x seq) mesh, and gradient parity."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from metatransformer_tpu.parallel import ring_attention as ra


def _dense(q, k, v, mask=None):
    d = q.shape[-1]
    s = jnp.einsum("bthd,bshd->bths", q, k) * (d ** -0.5)
    if mask is not None:
        s = jnp.where(mask[:, None, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bths,bshd->bthd", p, v)


def _qkv(b=2, t=64, h=4, d=16, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(  # noqa: E731
        rng.standard_normal((b, t, h, d)), jnp.float32
    )
    return mk(), mk(), mk()


def _seq_mesh(n=8):
    return Mesh(np.asarray(jax.devices()[:n]), ("seq",))


def test_ring_matches_dense():
    q, k, v = _qkv()
    mesh = _seq_mesh()
    apply = ra.make_seq_sharded_attention(mesh)
    out = apply(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_dense(q, k, v)), atol=1e-5, rtol=1e-5
    )


def test_ring_masked_matches_dense():
    q, k, v = _qkv(seed=1)
    rng = np.random.default_rng(2)
    mask = jnp.asarray(rng.uniform(size=q.shape[:2]) > 0.3)
    # guarantee at least one key visible
    mask = mask.at[:, 0].set(True)
    mesh = _seq_mesh()
    apply = ra.make_seq_sharded_attention(mesh)
    out = apply(q, k, v, mask)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_dense(q, k, v, mask)),
        atol=1e-5, rtol=1e-5,
    )


def test_ring_2d_mesh():
    """data x seq mesh: batch sharded 2-way, sequence 4-way."""
    q, k, v = _qkv(b=4, t=32, seed=3)
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "seq"))
    apply = ra.make_seq_sharded_attention(mesh, axis="seq", batch_axis="data")
    out = apply(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_dense(q, k, v)), atol=1e-5, rtol=1e-5
    )


def test_seq_parallel_encoder_matches_dense():
    """Full 12-token-local encoder under 8-way sequence sharding matches
    the single-device encode to fp32 tolerance."""
    from metatransformer_tpu.core import encoder as enc

    cfg = enc.EncoderConfig(dim=64, depth=3, num_heads=4, attn_impl="xla")
    params = enc.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 64, 64)), jnp.float32)

    ref = enc.encode(params, x, cfg)
    sp_enc = ra.make_seq_parallel_encode(_seq_mesh(8), cfg)
    out = sp_enc(params, x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_seq_parallel_encoder_grads():
    """Gradients w.r.t. params flow through the sharded encoder and match
    the dense encoder's."""
    from metatransformer_tpu.core import encoder as enc

    cfg = enc.EncoderConfig(dim=32, depth=2, num_heads=2, attn_impl="xla")
    params = enc.init(cfg, jax.random.PRNGKey(1))
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((1, 32, 32)), jnp.float32)
    sp_enc = ra.make_seq_parallel_encode(_seq_mesh(8), cfg)

    g_sp = jax.grad(lambda p: jnp.sum(sp_enc(p, x) ** 2))(params)
    g_ref = jax.grad(lambda p: jnp.sum(enc.encode(p, x, cfg) ** 2))(params)
    for k in g_ref:
        np.testing.assert_allclose(
            np.asarray(g_sp[k]), np.asarray(g_ref[k]), atol=1e-3, rtol=1e-3
        )


def test_ring_gradients_match_dense():
    q, k, v = _qkv(b=1, t=32, h=2, d=8, seed=4)
    mesh = _seq_mesh(8)
    apply = ra.make_seq_sharded_attention(mesh)

    def loss_ring(args):
        q, k, v = args
        return jnp.sum(apply(q, k, v) ** 2)

    def loss_dense(args):
        q, k, v = args
        return jnp.sum(_dense(q, k, v) ** 2)

    g_ring = jax.grad(loss_ring)((q, k, v))
    g_dense = jax.grad(loss_dense)((q, k, v))
    for gr, gd in zip(g_ring, g_dense):
        np.testing.assert_allclose(
            np.asarray(gr), np.asarray(gd), atol=1e-4, rtol=1e-4
        )

"""FAVOR+ linear attention (the optional TokenGT Performer path,
``Graph/metatransformer/modules/performer_pytorch.py:61-151``):
ORF properties, estimator convergence to exact softmax attention,
mask behavior, and the encoder attn_impl='performer' wiring."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.core import encoder as enc
from metatransformer_tpu.ops import performer as perf


def _exact_attention(q, k, v, mask=None):
    d = q.shape[-1]
    logits = jnp.einsum("bhtd,bhsd->bhts", q, k) / np.sqrt(d)
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :], logits, -1e9)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", p, v)


def test_orf_rows_orthogonal():
    w = perf.orthogonal_random_features(0, 16, 8)
    assert w.shape == (16, 8)
    # each 8-row block has orthogonal rows of norm sqrt(8)
    for blk in (w[:8], w[8:]):
        gram = blk @ blk.T
        np.testing.assert_allclose(gram, 8.0 * np.eye(8), atol=1e-5)
    # deterministic in the seed
    np.testing.assert_array_equal(w, perf.orthogonal_random_features(0, 16, 8))
    assert not np.allclose(w, perf.orthogonal_random_features(1, 16, 8))


def _rand_qkv(rng, b=2, h=2, t=12, d=8, scale=0.5):
    mk = lambda: jnp.asarray(
        rng.standard_normal((b, h, t, d)).astype(np.float32) * scale
    )
    return mk(), mk(), mk()


def test_favor_converges_to_exact_softmax():
    rng = np.random.default_rng(0)
    q, k, v = _rand_qkv(rng)
    exact = np.asarray(_exact_attention(q, k, v))

    def err(m, seed=3):
        w = jnp.asarray(perf.orthogonal_random_features(seed, m, q.shape[-1]))
        est = np.asarray(perf.favor_attention(q, k, v, w))
        return np.abs(est - exact).mean() / np.abs(exact).mean()

    e_small, e_big = err(16), err(2048)
    assert e_big < 0.15, (e_small, e_big)
    assert e_big < e_small, (e_small, e_big)


def test_favor_mask_matches_exact_on_kept_tokens():
    rng = np.random.default_rng(1)
    q, k, v = _rand_qkv(rng, t=10)
    mask = jnp.asarray(np.array([[1] * 6 + [0] * 4, [1] * 10], bool))
    w = jnp.asarray(perf.orthogonal_random_features(0, 4096, q.shape[-1]))
    est = np.asarray(perf.favor_attention(q, k, v, w, mask=mask))
    exact = np.asarray(_exact_attention(q, k, v, mask=mask))
    kept = np.asarray(mask)[:, None, :, None]
    diff = np.abs(est - exact) * kept
    assert diff.mean() / np.abs(exact * kept).mean() < 0.15


def test_encoder_performer_impl():
    """attn_impl='performer' runs through encode and tracks the exact
    encoder loosely (large feature count, small depth)."""
    cfg = enc.EncoderConfig(
        dim=32, depth=2, num_heads=4, attn_impl="performer",
        performer_features=1024,
    )
    cfg_exact = dataclasses.replace(cfg, attn_impl="xla")
    params = enc.init(cfg_exact, jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 8, 32), np.float32) * 0.3
    )
    out_p = np.asarray(enc.encode(params, x, cfg))
    out_e = np.asarray(enc.encode(params, x, cfg_exact))
    assert np.isfinite(out_p).all()
    rel = np.abs(out_p - out_e).mean() / np.abs(out_e).mean()
    assert rel < 0.25, rel
    # redraw = seed bump changes the estimate
    cfg2 = dataclasses.replace(cfg, performer_seed=7)
    out_p2 = np.asarray(enc.encode(params, x, cfg2))
    assert not np.allclose(out_p, out_p2)


def test_favor_gradients_finite():
    rng = np.random.default_rng(4)
    q, k, v = _rand_qkv(rng, t=6)
    w = jnp.asarray(perf.orthogonal_random_features(0, 64, q.shape[-1]))

    def loss(q, k, v):
        return jnp.sum(perf.favor_attention(q, k, v, w) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()

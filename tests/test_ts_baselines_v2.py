"""Autoformer / Informer / TimesNet baselines (Time-Series-Library
parity; reference models/{Autoformer,Informer,TimesNet}.py)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import optax

from metatransformer_tpu.models import ts_baselines as tb


def _marks(b, l, n=4):
    return jnp.zeros((b, l, n), jnp.float32)


def test_auto_correlation_finds_period():
    """A period-P signal's top delay must be (a multiple of) P."""
    l, p = 48, 12
    t = np.arange(l)
    sig = np.sin(2 * np.pi * t / p).astype(np.float32)
    q = jnp.asarray(sig)[None, :, None, None]  # [1, L, 1, 1]
    out = tb.auto_correlation(q, q, q, factor=1.0)
    assert out.shape == q.shape
    # the aggregation of delayed copies of a periodic signal stays periodic
    o = np.asarray(out)[0, :, 0, 0]
    np.testing.assert_allclose(o[:-p], o[p:], atol=1e-3)


def test_autoformer_shapes_and_trains():
    cfg = tb.AutoformerConfig(
        seq_len=48, label_len=24, pred_len=24, enc_in=3, dec_in=3, c_out=3,
        d_model=16, n_heads=2, d_ff=32, e_layers=1, d_layers=1,
    )
    params = tb.autoformer_init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    t = np.arange(cfg.seq_len + cfg.pred_len)
    series = np.stack(
        [np.sin(2 * np.pi * t / 12 + i) for i in range(3)], -1
    ).astype(np.float32)[None]
    x_enc = jnp.asarray(series[:, : cfg.seq_len])
    y = jnp.asarray(series[:, -cfg.pred_len:])
    me, md = _marks(1, cfg.seq_len), _marks(1, cfg.label_len + cfg.pred_len)

    out = tb.autoformer_forecast(params, x_enc, me, md, cfg)
    assert out.shape == (1, 24, 3)
    assert np.isfinite(np.asarray(out)).all()

    opt = optax.adam(5e-3)
    state = opt.init(params)

    def loss_fn(p):
        pred = tb.autoformer_forecast(p, x_enc, me, md, cfg)
        return jnp.mean((pred - y) ** 2)

    l0 = float(loss_fn(params))
    for _ in range(25):
        g = jax.grad(loss_fn)(params)
        up, state = opt.update(g, state, params)
        params = optax.apply_updates(params, up)
    l1 = float(loss_fn(params))
    assert l1 < l0 * 0.5, (l0, l1)


def test_prob_attention_equals_full_when_dense():
    """With factor large enough that every query is 'active', ProbSparse
    must equal full attention (unmasked case)."""
    b, l, h, e = 2, 16, 2, 8
    rng = np.random.default_rng(1)
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, l, h, e)).astype(np.float32))
        for _ in range(3)
    )
    got = tb.prob_attention(q, k, v, factor=100.0, causal=False,
                            rng=jax.random.PRNGKey(0))
    logits = jnp.einsum("blhe,bshe->bhls", q, k) / math.sqrt(e)
    want = jnp.einsum(
        "bhls,bshe->blhe", jax.nn.softmax(logits, -1), v
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_informer_shapes_and_distil():
    cfg = tb.InformerConfig(
        seq_len=48, label_len=24, pred_len=24, enc_in=3, dec_in=3, c_out=3,
        d_model=16, n_heads=2, d_ff=32, e_layers=2, d_layers=1, distil=True,
    )
    params = tb.informer_init(cfg, jax.random.PRNGKey(0))
    assert len(params["conv_layers"]) == 1  # e_layers-1 distil convs
    b = 2
    x_enc = jnp.asarray(
        np.random.default_rng(2).standard_normal((b, 48, 3)).astype(np.float32)
    )
    x_dec = jnp.concatenate(
        [x_enc[:, -24:], jnp.zeros((b, 24, 3))], axis=1
    )
    out = tb.informer_forecast(
        params, x_enc, _marks(b, 48), x_dec, _marks(b, 48), cfg
    )
    assert out.shape == (b, 24, 3)
    assert np.isfinite(np.asarray(out)).all()

    # grads flow through the ProbSparse path
    def loss_fn(p):
        o = tb.informer_forecast(p, x_enc, _marks(b, 48), x_dec, _marks(b, 48), cfg)
        return jnp.mean(o**2)

    g = jax.grad(loss_fn)(params)
    assert float(jnp.abs(g["enc_layers"][0]["attn"]["q"]["w"]).max()) > 0


def test_timesnet_period_weighting_and_forecast():
    cfg = tb.TimesNetConfig(
        seq_len=48, pred_len=48, enc_in=2, c_out=2,
        d_model=8, d_ff=8, e_layers=1, top_k=2, num_kernels=2,
    )
    assert 12 in cfg.candidate_periods  # divisors of 96
    params = tb.timesnet_init(cfg, jax.random.PRNGKey(0))
    t = np.arange(48)
    x = np.stack(
        [np.sin(2 * np.pi * t / 12), np.cos(2 * np.pi * t / 12)], -1
    ).astype(np.float32)[None]
    out = tb.timesnet_forecast(params, jnp.asarray(x), _marks(1, 48), cfg)
    assert out.shape == (1, 48, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_timesnet_trains():
    cfg = tb.TimesNetConfig(
        seq_len=24, pred_len=24, enc_in=1, c_out=1,
        d_model=8, d_ff=8, e_layers=1, top_k=2, num_kernels=2,
    )
    params = tb.timesnet_init(cfg, jax.random.PRNGKey(1))
    t = np.arange(48)
    series = np.sin(2 * np.pi * t / 12).astype(np.float32)[None, :, None]
    x = jnp.asarray(series[:, :24])
    y = jnp.asarray(series[:, 24:])
    opt = optax.adam(1e-2)
    state = opt.init(params)

    def loss_fn(p):
        return jnp.mean((tb.timesnet_forecast(p, x, _marks(1, 24), cfg) - y) ** 2)

    l0 = float(loss_fn(params))
    for _ in range(30):
        g = jax.grad(loss_fn)(params)
        up, state = opt.update(g, state, params)
        params = optax.apply_updates(params, up)
    l1 = float(loss_fn(params))
    assert l1 < l0 * 0.5, (l0, l1)

"""LightTS / ETSformer / MICN baselines (Time-Series-Library parity;
reference models/{LightTS,ETSformer,MICN}.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.models import ts_baselines as tb


def _marks(b, l, n=4):
    return jnp.zeros((b, l, n), jnp.float32)


# --- LightTS ----------------------------------------------------------------


def test_lightts_forecast():
    cfg = tb.LightTSConfig(seq_len=48, pred_len=24, enc_in=3, d_model=32,
                           chunk_size=12)
    assert cfg.chunk == 12 and cfg.num_chunks == 4
    params = tb.lightts_init(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 48, 3)), jnp.float32
    )
    out = tb.lightts_forecast(params, x, cfg)
    assert out.shape == (2, 24, 3)
    assert np.isfinite(np.asarray(out)).all()

    def loss(p):
        return jnp.mean(tb.lightts_forecast(p, x, cfg) ** 2)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["layer1"]["sp_a"]["w"]).max()) > 0
    assert float(jnp.abs(g["ar"]["w"]).max()) > 0


# --- ETSformer --------------------------------------------------------------


def test_ema_scan_matches_recurrence():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 10, 3, 4)), jnp.float32)
    decay = jnp.asarray([0.9, 0.5, 0.1])
    gain = 1 - decay
    init = jnp.asarray(rng.standard_normal((2, 1, 3, 4)), jnp.float32)
    y = tb.ema_scan(x, decay, gain, init)
    # oracle recurrence
    want = np.zeros_like(np.asarray(x))
    prev = np.asarray(init)[:, 0]
    for t in range(10):
        prev = (
            np.asarray(decay)[None, :, None] * prev
            + np.asarray(gain)[None, :, None] * np.asarray(x)[:, t]
        )
        want[:, t] = prev
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-5)


def test_fourier_layer_extrapolates_pure_tone():
    """A single-frequency signal extrapolates past the window."""
    t, pred = 48, 24
    tt = np.arange(t + pred)
    full = np.cos(2 * np.pi * 4 * tt / t).astype(np.float32)
    x = jnp.asarray(full[:t])[None, :, None]
    out = tb.ets_fourier_layer(x, pred, k=2)
    assert out.shape == (1, t + pred, 1)
    got = np.asarray(out)[0, :, 0]
    np.testing.assert_allclose(got, full, atol=0.05)


def test_etsformer_forecast():
    cfg = tb.ETSformerConfig(seq_len=48, pred_len=24, enc_in=3, c_out=3,
                             d_model=16, n_heads=4, d_ff=32, e_layers=2,
                             top_k=3)
    params = tb.etsformer_init(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 48, 3)), jnp.float32
    )
    out = tb.etsformer_forecast(params, x, _marks(2, 48), cfg)
    assert out.shape == (2, 24, 3)
    assert np.isfinite(np.asarray(out)).all()

    def loss(p):
        return jnp.mean(tb.etsformer_forecast(p, x, _marks(2, 48), cfg) ** 2)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["layers"][0]["growth"]["es"]["alpha"]).max()) > 0
    assert float(jnp.abs(g["layers"][1]["damping"]).max()) > 0
    assert float(jnp.abs(g["pred"]["w"]).max()) > 0


# --- MICN -------------------------------------------------------------------


def test_micn_kernel_math():
    cfg = tb.MICNConfig(seq_len=96, pred_len=96, conv_kernels=(12, 16))
    assert cfg.decomp_kernels == (13, 17)
    # (96+96+12)//12 = 17 ; (96+96+16)//16 = 13 (both even kernels)
    assert cfg.iso_kernels == (17, 13)


def test_micn_forecast():
    cfg = tb.MICNConfig(seq_len=48, pred_len=24, enc_in=3, c_out=3,
                        d_model=16, d_layers=1, conv_kernels=(6, 8))
    params = tb.micn_init(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 48, 3)), jnp.float32
    )
    md = _marks(2, cfg.seq_len + cfg.pred_len)
    out = tb.micn_forecast(params, x, md, cfg)
    assert out.shape == (2, 24, 3)
    assert np.isfinite(np.asarray(out)).all()

    def loss(p):
        return jnp.mean(tb.micn_forecast(p, x, md, cfg) ** 2)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["layers"][0]["branches"][0]["iso"]["w"]).max()) > 0
    assert float(jnp.abs(g["regression"]["w"]).max()) > 0


def test_micn_trend_regression_init_is_mean():
    """regression starts as the mean predictor: constant series in ->
    the same constant out of the trend branch (weights 1/pred_len)."""
    cfg = tb.MICNConfig(seq_len=24, pred_len=24, enc_in=2, c_out=2,
                        d_model=16, conv_kernels=(6,))
    params = tb.micn_init(cfg, jax.random.PRNGKey(0))
    w = np.asarray(params["regression"]["w"])
    np.testing.assert_allclose(w, 1.0 / cfg.pred_len)

"""FEDformer / Crossformer / Nonstationary Transformer baselines
(Time-Series-Library parity; reference models/{FEDformer,Crossformer,
Nonstationary_Transformer}.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.models import ts_baselines as tb


def _marks(b, l, n=4):
    return jnp.zeros((b, l, n), jnp.float32)


# --- FEDformer --------------------------------------------------------------


def test_frequency_modes():
    assert tb.frequency_modes(96, 8, "low") == tuple(range(8))
    assert tb.frequency_modes(12, 64, "low") == tuple(range(6))  # capped L/2
    r1 = tb.frequency_modes(96, 8, "random", seed=3)
    assert r1 == tb.frequency_modes(96, 8, "random", seed=3)  # deterministic
    assert len(r1) == 8 and list(r1) == sorted(r1)


def test_fourier_block_roundtrip():
    """With identity per-mode weights over all modes, the block is a
    band-limited identity: a signal supported on the kept modes passes
    through unchanged."""
    l, h, e = 32, 2, 4
    idx = tuple(range(l // 2))
    eye = jnp.tile(jnp.eye(e)[None, :, :, None], (h, 1, 1, len(idx)))
    t = np.arange(l)
    sig = np.cos(2 * np.pi * 3 * t / l).astype(np.float32)
    q = jnp.asarray(sig)[None, :, None, None] * jnp.ones((1, l, h, e))
    out = tb.fourier_block(q, eye, jnp.zeros_like(eye), idx, l)
    np.testing.assert_allclose(np.asarray(out), np.asarray(q), atol=1e-4)


def test_fedformer_forecast_shapes_and_grads():
    cfg = tb.FEDformerConfig(
        seq_len=48, label_len=24, pred_len=24, enc_in=3, dec_in=3, c_out=3,
        d_model=16, n_heads=4, d_ff=32, e_layers=1, d_layers=1, modes=8,
    )
    params = tb.fedformer_init(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 48, 3)), jnp.float32
    )
    me, md = _marks(2, 48), _marks(2, cfg.label_len + cfg.pred_len)
    out = tb.fedformer_forecast(params, x, me, md, cfg)
    assert out.shape == (2, 24, 3)
    assert np.isfinite(np.asarray(out)).all()

    def loss(p):
        return jnp.mean(tb.fedformer_forecast(p, x, me, md, cfg) ** 2)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["enc_layers"][0]["fb"]["re"]).max()) > 0
    assert float(jnp.abs(g["dec_layers"][0]["cross_fb"]["im"]).max()) > 0


# --- Nonstationary Transformer ---------------------------------------------


def test_ds_attention_causal_and_factors():
    b, l, h, e = 1, 6, 2, 4
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((b, l, h, e)), jnp.float32)
    k, v = q, q
    tau = jnp.ones((b, 1))
    mm = jax.lax.Precision.HIGHEST
    out = tb.ds_attention(q, k, v, tau, None, True, mm)
    # causality: output at t=0 only depends on v[0]
    v2 = v.at[:, 1:].add(100.0)
    out2 = tb.ds_attention(q, k, v2, tau, None, True, mm)
    np.testing.assert_allclose(
        np.asarray(out[:, 0]), np.asarray(out2[:, 0]), atol=1e-5
    )
    # delta shifts scores -> changes the output
    delta = jnp.asarray(rng.standard_normal((b, l)), jnp.float32) * 3
    out3 = tb.ds_attention(q, k, v, tau, delta, False, mm)
    out4 = tb.ds_attention(q, k, v, tau, None, False, mm)
    assert float(jnp.abs(out3 - out4).max()) > 1e-4


def test_nonstationary_forecast():
    cfg = tb.NonstationaryConfig(
        seq_len=48, label_len=24, pred_len=24, enc_in=3, dec_in=3, c_out=3,
        d_model=16, n_heads=4, d_ff=32, e_layers=1, d_layers=1, p_hidden=8,
    )
    params = tb.nonstationary_init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    # shifted series: de-normalization must restore the offset. (The
    # tau/delta projectors consume the RAW series like the reference,
    # so wildly-scaled inputs overflow exp(tau) at random init — a
    # shared sensitivity, not a porting bug.)
    x = jnp.asarray(
        rng.standard_normal((2, 48, 3)) * 0.5 + 10.0, jnp.float32
    )
    me, md = _marks(2, 48), _marks(2, cfg.label_len + cfg.pred_len)
    out = tb.nonstationary_forecast(params, x, me, md, cfg)
    assert out.shape == (2, 24, 3)
    assert np.isfinite(np.asarray(out)).all()
    # output lives on the input's scale (mean add-back), not near zero
    assert abs(float(jnp.mean(out)) - 10.0) < 5.0

    def loss(p):
        return jnp.mean(tb.nonstationary_forecast(p, x, me, md, cfg) ** 2)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["tau"]["out"]["w"]).max()) > 0
    assert float(jnp.abs(g["enc_layers"][0]["self"]["q"]["w"]).max()) > 0


# --- Crossformer ------------------------------------------------------------


def test_crossformer_config_math():
    cfg = tb.CrossformerConfig(seq_len=96, pred_len=24, seg_len=12,
                               e_layers=3)
    assert cfg.pad_in_len == 96 and cfg.in_seg == 8
    assert cfg.pad_out_len == 24 and cfg.out_seg == 2
    assert cfg.seg_at(0) == 8 and cfg.seg_at(1) == 4 and cfg.seg_at(2) == 2
    # non-divisible lengths pad up
    cfg2 = tb.CrossformerConfig(seq_len=50, pred_len=10, seg_len=12)
    assert cfg2.pad_in_len == 60 and cfg2.pad_out_len == 12


def test_crossformer_forecast():
    cfg = tb.CrossformerConfig(
        seq_len=50, pred_len=10, enc_in=3, d_model=16, n_heads=4, d_ff=32,
        e_layers=2, seg_len=12, factor=3,
    )
    params = tb.crossformer_init(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 50, 3)), jnp.float32
    )
    out = tb.crossformer_forecast(params, x, cfg)
    assert out.shape == (2, 10, 3)
    assert np.isfinite(np.asarray(out)).all()

    def loss(p):
        return jnp.mean(tb.crossformer_forecast(p, x, cfg) ** 2)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["val_embed"]["w"]).max()) > 0
    assert float(jnp.abs(g["enc_blocks"][1]["merge"]["w"]).max()) > 0
    assert float(jnp.abs(g["dec_layers"][0]["tsa"]["router"]).max()) > 0

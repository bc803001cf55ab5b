"""FiLM / Pyraformer / Reformer baselines — completes the reference's
15-model zoo (reference models/{FiLM,Pyraformer,Reformer}.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.models import ts_baselines as tb


def _marks(b, l, n=4):
    return jnp.zeros((b, l, n), jnp.float32)


# --- FiLM -------------------------------------------------------------------


def test_hippo_legt_reconstruction():
    """LegT memory of a smooth signal reconstructs it: project the
    window into N Legendre coefficients, evaluate back, compare."""
    n = 64
    t = 64
    ad, bd, ev = tb._hippo_legt_mats(n, 1.0 / t)
    x = np.sin(np.arange(t, dtype=np.float32) / 10.0)
    br = {"A": jnp.asarray(ad), "B": jnp.asarray(bd)}
    c = tb._legt_scan(br, jnp.asarray(x)[None, None, :])  # [1,1,N,T]
    final = np.asarray(c)[0, 0, :, -1]  # coefficients after the window
    recon = np.asarray(ev) @ final  # [T_eval]
    # LegT memory is an approximation with boundary smoothing: check
    # RMSE over the window rather than pointwise equality
    rmse = float(np.sqrt(np.mean((recon - x) ** 2)))
    assert rmse < 0.05, rmse
    # the recent half of the window is nearly exact
    np.testing.assert_allclose(recon[t // 2:], x[t // 2:], atol=0.1)


def test_film_forecast():
    cfg = tb.FiLMConfig(seq_len=48, pred_len=24, enc_in=3, hippo_n=32,
                        multiscale=(1, 2), modes=8)
    params = tb.film_init(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 48, 3)) + 5.0, jnp.float32
    )
    out = tb.film_forecast(params, x, cfg)
    assert out.shape == (2, 24, 3)
    assert np.isfinite(np.asarray(out)).all()
    # de-normalization restores the offset scale
    assert abs(float(jnp.mean(out)) - 5.0) < 3.0

    def loss(p):
        return jnp.mean(tb.film_forecast(p, x, cfg) ** 2)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["branches"][0]["w_re"]).max()) > 0
    assert float(jnp.abs(g["affine_w"]).max()) > 0


# --- Pyraformer -------------------------------------------------------------


def test_pyraformer_mask_structure():
    cfg = tb.PyraformerConfig(seq_len=16, window_sizes=(4, 4), inner_size=3)
    assert cfg.all_sizes == (16, 4, 1)
    m = tb.pyraformer_mask(cfg)  # True = masked
    total = sum(cfg.all_sizes)
    assert m.shape == (total, total)
    # intra-scale neighbours visible at the finest scale
    assert not m[0, 0] and not m[0, 1]
    assert m[0, 3]  # beyond inner window
    # parent link: node 16 (first coarse) sees children 0..3 and vice versa
    assert not m[16, 0] and not m[16, 3] and not m[0, 16]
    assert m[16, 4]  # not its child
    # refer points: position 5 maps to coarse node 17, top node 20
    refs = tb.pyraformer_refer_points(cfg)
    assert refs[5][0] == 5 and refs[5][1] == 17 and refs[5][2] == 20


def test_pyraformer_forecast():
    cfg = tb.PyraformerConfig(seq_len=32, pred_len=16, enc_in=3, d_model=16,
                              n_heads=4, d_ff=32, e_layers=2,
                              window_sizes=(4, 4))
    params = tb.pyraformer_init(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 32, 3)), jnp.float32
    )
    out = tb.pyraformer_forecast(params, x, _marks(2, 32), cfg)
    assert out.shape == (2, 16, 3)
    assert np.isfinite(np.asarray(out)).all()

    def loss(p):
        return jnp.mean(tb.pyraformer_forecast(p, x, _marks(2, 32), cfg) ** 2)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["convs"][0]["w"]).max()) > 0
    assert float(jnp.abs(g["layers"][0]["attn"]["q"]["w"]).max()) > 0


# --- Reformer ---------------------------------------------------------------


def test_lsh_attention_groups_similar_vectors():
    """Identical qk vectors land in one bucket and attend each other:
    with distinct values, output of a duplicate pair reflects its twin."""
    b, t, h, e = 1, 16, 1, 8
    rng = np.random.default_rng(2)
    qk = rng.standard_normal((b, t, h, e)).astype(np.float32)
    qk[0, 7] = qk[0, 3]  # duplicate pair
    v = np.zeros((b, t, h, e), np.float32)
    v[0, 3, 0, 0] = 100.0
    out = tb.lsh_attention(
        jnp.asarray(qk), jnp.asarray(v), n_hashes=4, bucket_size=4,
        key=jax.random.PRNGKey(0),
    )
    assert out.shape == (b, t, h, e)
    assert np.isfinite(np.asarray(out)).all()
    # position 7 should see position 3's value strongly
    assert float(out[0, 7, 0, 0]) > 1.0


def test_reformer_forecast():
    cfg = tb.ReformerConfig(seq_len=32, pred_len=16, enc_in=3, c_out=3,
                            d_model=16, n_heads=4, d_ff=32, e_layers=2,
                            bucket_size=4, n_hashes=2)
    params = tb.reformer_init(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 32, 3)), jnp.float32
    )
    out = tb.reformer_forecast(params, x, _marks(2, 32), cfg)
    assert out.shape == (2, 16, 3)
    assert np.isfinite(np.asarray(out)).all()

    def loss(p):
        return jnp.mean(tb.reformer_forecast(p, x, _marks(2, 32), cfg) ** 2)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["layers"][0]["qk"]["w"]).max()) > 0
    assert float(jnp.abs(g["proj"]["w"]).max()) > 0

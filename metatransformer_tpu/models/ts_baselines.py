"""Time-series baseline models (Time-Series-Library parity).

The reference vendors 15 baselines alongside its MetaTransformer model
(``Time-Series/models/``); the most load-bearing are implemented
natively: DLinear, PatchTST, Autoformer, Informer, TimesNet, FEDformer,
Crossformer and the Nonstationary Transformer. The vanilla Transformer
is ``models.time_series`` itself.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from metatransformer_tpu.core import encoder as enc
from metatransformer_tpu.tokenizers import time_series as ts_tok


# --- DLinear -----------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DLinearConfig:
    seq_len: int = 96
    pred_len: int = 96
    channels: int = 7
    kernel: int = 25  # moving-average window
    individual: bool = False  # per-channel weights


def moving_average(x: jax.Array, kernel: int) -> jax.Array:
    """Trend component: avg-pool with replicated ends (series_decomp)."""
    pad_l = (kernel - 1) // 2
    pad_r = kernel - 1 - pad_l
    front = jnp.repeat(x[:, :1], pad_l, axis=1)
    back = jnp.repeat(x[:, -1:], pad_r, axis=1)
    xp = jnp.concatenate([front, x, back], axis=1)  # [B, L+k-1, C]
    csum = jnp.cumsum(
        jnp.concatenate([jnp.zeros_like(xp[:, :1]), xp], axis=1), axis=1
    )
    return (csum[:, kernel:] - csum[:, :-kernel]) / kernel


def dlinear_init(cfg: DLinearConfig, key: jax.Array) -> Dict[str, jax.Array]:
    k1, k2 = jax.random.split(key)
    shape = (
        (cfg.channels, cfg.seq_len, cfg.pred_len)
        if cfg.individual
        else (cfg.seq_len, cfg.pred_len)
    )
    init = jnp.full(shape, 1.0 / cfg.seq_len)
    del k1, k2
    return {"seasonal_w": init, "trend_w": init}


@functools.partial(jax.jit, static_argnames=("cfg",))
def dlinear_forward(
    params: Dict[str, jax.Array], x: jax.Array, cfg: DLinearConfig
) -> jax.Array:
    """x [B, seq_len, C] -> [B, pred_len, C]."""
    trend = moving_average(x, cfg.kernel)
    seasonal = x - trend
    if cfg.individual:
        out_s = jnp.einsum("blc,clp->bpc", seasonal, params["seasonal_w"])
        out_t = jnp.einsum("blc,clp->bpc", trend, params["trend_w"])
    else:
        out_s = jnp.einsum("blc,lp->bpc", seasonal, params["seasonal_w"])
        out_t = jnp.einsum("blc,lp->bpc", trend, params["trend_w"])
    return out_s + out_t


# --- PatchTST ----------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class PatchTSTConfig:
    seq_len: int = 96
    pred_len: int = 96
    channels: int = 7
    patch_len: int = 16
    stride: int = 8
    encoder: enc.EncoderConfig = enc.EncoderConfig(dim=128, depth=3, num_heads=8)

    @property
    def patch(self) -> ts_tok.PatchConfig:
        return ts_tok.PatchConfig(
            dim=self.encoder.dim, patch_len=self.patch_len,
            stride=self.stride, padding=self.stride,
        )

    @property
    def n_patches(self) -> int:
        return (self.seq_len + self.patch.padding - self.patch_len) // self.stride + 1


def patchtst_init(cfg: PatchTSTConfig, key: jax.Array) -> Dict[str, Any]:
    k1, k2, k3 = jax.random.split(key, 3)
    head_in = cfg.encoder.dim * cfg.n_patches
    return {
        "patch": ts_tok.patch_init(cfg.patch, k1),
        "encoder": enc.init(cfg.encoder, k2),
        "head_w": jax.random.normal(k3, (head_in, cfg.pred_len)) * head_in**-0.5,
        "head_b": jnp.zeros((cfg.pred_len,)),
    }


@functools.partial(jax.jit, static_argnames=("cfg", "precision"))
def patchtst_forward(
    params: Dict[str, Any],
    x: jax.Array,  # [B, seq_len, C]
    cfg: PatchTSTConfig,
    precision: enc.Precision = enc.FP32,
) -> jax.Array:
    """Channel-independent: each variable is its own sequence."""
    b, L, c = x.shape
    # instance norm per channel (PatchTST RevIN-lite: subtract last value)
    last = x[:, -1:, :]
    xn = x - last
    tokens, _ = ts_tok.patch_apply(
        params["patch"], xn.transpose(0, 2, 1), cfg.patch, mm=precision.mm
    )  # [B*C, n_patches, D]
    h = enc.encode(params["encoder"], tokens, cfg.encoder, precision=precision)
    h = h.reshape(b * c, -1)
    out = jnp.dot(h, params["head_w"], precision=precision.mm) + params["head_b"]
    out = out.reshape(b, c, cfg.pred_len).transpose(0, 2, 1)
    return out + last


# ===========================================================================
# Autoformer (Time-Series/models/Autoformer.py + layers/AutoCorrelation.py,
# layers/Autoformer_EncDec.py)
# ===========================================================================

import math

import numpy as np

from metatransformer_tpu.tokenizers import time_series as _tst


def _linear_init(key, cin, cout, bias=True):
    p = {"w": jax.random.normal(key, (cin, cout)) * cin**-0.5}
    if bias:
        p["b"] = jnp.zeros((cout,))
    return p


def _lin(p, x, mm=jax.lax.Precision.HIGHEST):
    out = jnp.dot(x, p["w"], precision=mm)
    return out + p["b"] if "b" in p else out


def series_decomp(x: jax.Array, kernel: int):
    """-> (seasonal, trend) (layers/Autoformer_EncDec.series_decomp)."""
    trend = moving_average(x, kernel)
    return x - trend, trend


def my_layer_norm(x: jax.Array, scale, bias, eps=1e-5):
    """LayerNorm minus its per-series temporal mean (my_Layernorm)."""
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    xh = (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias
    return xh - jnp.mean(xh, axis=1, keepdims=True)


def auto_correlation(q, k, v, factor: float):
    """AutoCorrelation via FFT + per-sample top-k delay aggregation
    (AutoCorrelation.time_delay_agg_inference — the gather form, which is
    the TPU-friendly one; the 'training' variant differs only in sharing
    delays across the batch). q,k,v: [B, L, H, E]."""
    b, l, h, e = q.shape
    s = k.shape[1]
    if l > s:
        pad = jnp.zeros((b, l - s, h, e), q.dtype)
        k = jnp.concatenate([k, pad], 1)
        v = jnp.concatenate([v, pad], 1)
    else:
        k, v = k[:, :l], v[:, :l]
    qf = jnp.fft.rfft(q.transpose(0, 2, 3, 1))  # [B, H, E, Lf]
    kf = jnp.fft.rfft(k.transpose(0, 2, 3, 1))
    corr = jnp.fft.irfft(qf * jnp.conj(kf), n=l)  # [B, H, E, L]
    top_k = max(1, int(factor * math.log(l)))
    mean_corr = corr.mean(axis=(1, 2))  # [B, L]
    weights, delay = jax.lax.top_k(mean_corr, top_k)  # [B, K]
    w = jax.nn.softmax(weights, -1)  # [B, K]
    vals = v.transpose(0, 2, 3, 1)  # [B, H, E, L]
    idx = (jnp.arange(l)[None, None, :] + delay[:, :, None]) % l  # [B,K,L]
    pattern = jnp.take_along_axis(
        vals[:, None], idx[:, :, None, None, :], axis=-1
    )  # [B, K, H, E, L]
    agg = jnp.einsum("bkhel,bk->bhel", pattern, w)
    return agg.transpose(0, 3, 1, 2)  # [B, L, H, E]


def _attn_layer_init(key, d_model, n_heads):
    ks = jax.random.split(key, 4)
    return {
        "q": _linear_init(ks[0], d_model, d_model),
        "k": _linear_init(ks[1], d_model, d_model),
        "v": _linear_init(ks[2], d_model, d_model),
        "o": _linear_init(ks[3], d_model, d_model),
    }


def _proj_qkv(p, q_in, k_in, v_in, n_heads, mm):
    b, l, _ = q_in.shape
    s = k_in.shape[1]
    q = _lin(p["q"], q_in, mm).reshape(b, l, n_heads, -1)
    k = _lin(p["k"], k_in, mm).reshape(b, s, n_heads, -1)
    v = _lin(p["v"], v_in, mm).reshape(b, s, n_heads, -1)
    return q, k, v


@dataclasses.dataclass(frozen=True)
class AutoformerConfig:
    seq_len: int = 96
    label_len: int = 48
    pred_len: int = 96
    enc_in: int = 7
    dec_in: int = 7
    c_out: int = 7
    d_model: int = 64
    n_heads: int = 4
    d_ff: int = 128
    e_layers: int = 2
    d_layers: int = 1
    moving_avg: int = 25
    factor: float = 1.0
    freq: str = "h"

    @property
    def enc_embed(self):
        return _tst.TimeSeriesConfig(
            c_in=self.enc_in, dim=self.d_model, freq=self.freq,
            embed_type="timeF", use_pos=False,  # DataEmbedding_wo_pos
        )

    @property
    def dec_embed(self):
        return dataclasses.replace(self.enc_embed, c_in=self.dec_in)


def _autoformer_enc_layer_init(key, cfg: AutoformerConfig):
    ks = jax.random.split(key, 3)
    return {
        "attn": _attn_layer_init(ks[0], cfg.d_model, cfg.n_heads),
        "ff1": _linear_init(ks[1], cfg.d_model, cfg.d_ff, bias=False),
        "ff2": _linear_init(ks[2], cfg.d_ff, cfg.d_model, bias=False),
    }


def autoformer_init(cfg: AutoformerConfig, key: jax.Array) -> Dict[str, Any]:
    ks = iter(jax.random.split(key, 8 + cfg.e_layers + cfg.d_layers))
    params: Dict[str, Any] = {
        "enc_embed": _tst.init(cfg.enc_embed, next(ks)),
        "dec_embed": _tst.init(cfg.dec_embed, next(ks)),
        "enc_layers": [
            _autoformer_enc_layer_init(next(ks), cfg) for _ in range(cfg.e_layers)
        ],
        "enc_norm_scale": jnp.ones((cfg.d_model,)),
        "enc_norm_bias": jnp.zeros((cfg.d_model,)),
        "dec_norm_scale": jnp.ones((cfg.d_model,)),
        "dec_norm_bias": jnp.zeros((cfg.d_model,)),
        "dec_proj": _linear_init(next(ks), cfg.d_model, cfg.c_out),
    }
    dls = []
    for _ in range(cfg.d_layers):
        kk = jax.random.split(next(ks), 5)
        dls.append({
            "self": _attn_layer_init(kk[0], cfg.d_model, cfg.n_heads),
            "cross": _attn_layer_init(kk[1], cfg.d_model, cfg.n_heads),
            "ff1": _linear_init(kk[2], cfg.d_model, cfg.d_ff, bias=False),
            "ff2": _linear_init(kk[3], cfg.d_ff, cfg.d_model, bias=False),
            # trend projection: conv1d k=3, circular, no bias
            "trend_w": jax.random.normal(kk[4], (3 * cfg.d_model, cfg.c_out))
            * (3 * cfg.d_model) ** -0.5,
        })
    params["dec_layers"] = dls
    return params


def _circular_conv3(x, w, mm):
    """conv1d(k=3, circular, no bias): x [B, L, Cin] @ w [3*Cin, Cout]."""
    windows = jnp.concatenate(
        [jnp.roll(x, 1, axis=1), x, jnp.roll(x, -1, axis=1)], axis=-1
    )
    return jnp.dot(windows, w, precision=mm)


@functools.partial(jax.jit, static_argnames=("cfg",))
def autoformer_forecast(
    params: Dict[str, Any],
    x_enc: jax.Array,  # [B, seq_len, enc_in]
    x_mark_enc: jax.Array,  # [B, seq_len, n_timef]
    x_mark_dec: jax.Array,  # [B, label_len+pred_len, n_timef]
    cfg: AutoformerConfig,
) -> jax.Array:
    """Autoformer long-term forecast -> [B, pred_len, c_out]
    (Autoformer.Model.forecast)."""
    mm = jax.lax.Precision.HIGHEST
    b = x_enc.shape[0]
    mean = jnp.mean(x_enc, 1, keepdims=True)
    seasonal_init, trend_init = series_decomp(x_enc, cfg.moving_avg)
    trend = jnp.concatenate(
        [trend_init[:, -cfg.label_len:], jnp.tile(mean, (1, cfg.pred_len, 1))], 1
    )
    seasonal = jnp.concatenate(
        [
            seasonal_init[:, -cfg.label_len:],
            jnp.zeros((b, cfg.pred_len, cfg.dec_in), x_enc.dtype),
        ],
        1,
    )

    x = _tst.apply(params["enc_embed"], x_enc, cfg.enc_embed, x_mark_enc, mm)
    for lp in params["enc_layers"]:
        q, k, v = _proj_qkv(lp["attn"], x, x, x, cfg.n_heads, mm)
        a = auto_correlation(q, k, v, cfg.factor).reshape(x.shape)
        x = x + _lin(lp["attn"]["o"], a, mm)
        x, _ = series_decomp(x, cfg.moving_avg)
        y = jax.nn.relu(_lin(lp["ff1"], x, mm))
        y = _lin(lp["ff2"], y, mm)
        x, _ = series_decomp(x + y, cfg.moving_avg)
    enc_out = my_layer_norm(x, params["enc_norm_scale"], params["enc_norm_bias"])

    x = _tst.apply(params["dec_embed"], seasonal, cfg.dec_embed, x_mark_dec, mm)
    for lp in params["dec_layers"]:
        q, k, v = _proj_qkv(lp["self"], x, x, x, cfg.n_heads, mm)
        a = auto_correlation(q, k, v, cfg.factor).reshape(x.shape)
        x = x + _lin(lp["self"]["o"], a, mm)
        x, t1 = series_decomp(x, cfg.moving_avg)
        q, k, v = _proj_qkv(lp["cross"], x, enc_out, enc_out, cfg.n_heads, mm)
        a = auto_correlation(q, k, v, cfg.factor).reshape(x.shape)
        x = x + _lin(lp["cross"]["o"], a, mm)
        x, t2 = series_decomp(x, cfg.moving_avg)
        y = jax.nn.relu(_lin(lp["ff1"], x, mm))
        y = _lin(lp["ff2"], y, mm)
        x, t3 = series_decomp(x + y, cfg.moving_avg)
        trend = trend + _circular_conv3(t1 + t2 + t3, lp["trend_w"], mm)
    x = my_layer_norm(x, params["dec_norm_scale"], params["dec_norm_bias"])
    seasonal_out = _lin(params["dec_proj"], x, mm)
    out = seasonal_out + trend
    return out[:, -cfg.pred_len:]


# ===========================================================================
# Informer (Time-Series/models/Informer.py + ProbAttention,
# layers/SelfAttention_Family.py:78-160, layers/Transformer_EncDec.ConvLayer)
# ===========================================================================


def prob_attention(
    q, k, v, factor: float, causal: bool, rng: jax.Array,
):
    """ProbSparse attention: score all keys for only the top-u 'active'
    queries (selected by a sampled sparsity measure); inactive queries
    fall back to the mean (or cumulative, causal) context.
    q,k,v: [B, L, H, E] -> [B, L, H, E]."""
    b, lq, h, e = q.shape
    lk = k.shape[1]
    qT = q.transpose(0, 2, 1, 3)  # [B, H, L, E]
    kT = k.transpose(0, 2, 1, 3)
    vT = v.transpose(0, 2, 1, 3)
    u_part = min(max(1, int(factor * math.ceil(math.log(lk)))), lk)  # sample_k
    n_top = min(max(1, int(factor * math.ceil(math.log(lq)))), lq)

    # sparsity measurement on sampled keys (_prob_QK)
    idx_sample = jax.random.randint(rng, (lq, u_part), 0, lk)
    k_sample = kT[:, :, idx_sample]  # [B, H, Lq, u_part, E]
    qk_sample = jnp.einsum("bhle,bhlue->bhlu", qT, k_sample)
    m = jnp.max(qk_sample, -1) - jnp.mean(qk_sample, -1)  # [B, H, Lq]
    _, m_top = jax.lax.top_k(m, n_top)  # [B, H, n_top]

    q_reduce = jnp.take_along_axis(qT, m_top[..., None], axis=2)  # [B,H,u,E]
    scores = jnp.einsum("bhue,bhse->bhus", q_reduce, kT) / math.sqrt(e)
    if causal:
        # selected query at position p attends keys <= p (ProbMask)
        keymask = jnp.arange(lk)[None, None, None, :] > m_top[..., None]
        scores = jnp.where(keymask, -jnp.inf, scores)
        context = jnp.cumsum(vT, axis=2)  # running mean context (ref: cumsum)
    else:
        context = jnp.broadcast_to(
            jnp.mean(vT, axis=2, keepdims=True), (b, h, lq, e)
        )
    attn = jax.nn.softmax(scores, -1)
    upd = jnp.einsum("bhus,bhse->bhue", attn, vT)
    bi = jnp.arange(b)[:, None, None]
    hi = jnp.arange(h)[None, :, None]
    context = context.at[bi, hi, m_top].set(upd)
    return context.transpose(0, 2, 1, 3)


@dataclasses.dataclass(frozen=True)
class InformerConfig:
    seq_len: int = 96
    label_len: int = 48
    pred_len: int = 96
    enc_in: int = 7
    dec_in: int = 7
    c_out: int = 7
    d_model: int = 64
    n_heads: int = 4
    d_ff: int = 128
    e_layers: int = 2
    d_layers: int = 1
    factor: float = 5.0
    distil: bool = True
    freq: str = "h"

    @property
    def enc_embed(self):
        return _tst.TimeSeriesConfig(
            c_in=self.enc_in, dim=self.d_model, freq=self.freq,
            embed_type="timeF", use_pos=True,  # DataEmbedding (with pos)
        )

    @property
    def dec_embed(self):
        return dataclasses.replace(self.enc_embed, c_in=self.dec_in)


def informer_init(cfg: InformerConfig, key: jax.Array) -> Dict[str, Any]:
    ks = iter(jax.random.split(key, 10 + 2 * cfg.e_layers + cfg.d_layers))
    params: Dict[str, Any] = {
        "enc_embed": _tst.init(cfg.enc_embed, next(ks)),
        "dec_embed": _tst.init(cfg.dec_embed, next(ks)),
        "enc_norm_scale": jnp.ones((cfg.d_model,)),
        "enc_norm_bias": jnp.zeros((cfg.d_model,)),
        "dec_norm_scale": jnp.ones((cfg.d_model,)),
        "dec_norm_bias": jnp.zeros((cfg.d_model,)),
        "proj": _linear_init(next(ks), cfg.d_model, cfg.c_out),
    }
    els = []
    for _ in range(cfg.e_layers):
        kk = jax.random.split(next(ks), 3)
        els.append({
            "attn": _attn_layer_init(kk[0], cfg.d_model, cfg.n_heads),
            "ff1": _linear_init(kk[1], cfg.d_model, cfg.d_ff),
            "ff2": _linear_init(kk[2], cfg.d_ff, cfg.d_model),
            "ln1_scale": jnp.ones((cfg.d_model,)), "ln1_bias": jnp.zeros((cfg.d_model,)),
            "ln2_scale": jnp.ones((cfg.d_model,)), "ln2_bias": jnp.zeros((cfg.d_model,)),
        })
    params["enc_layers"] = els
    if cfg.distil:
        params["conv_layers"] = [
            {
                "w": jax.random.normal(next(ks), (3 * cfg.d_model, cfg.d_model))
                * (3 * cfg.d_model) ** -0.5,
                "b": jnp.zeros((cfg.d_model,)),
                "bn_scale": jnp.ones((cfg.d_model,)),
                "bn_bias": jnp.zeros((cfg.d_model,)),
            }
            for _ in range(cfg.e_layers - 1)
        ]
    dls = []
    for _ in range(cfg.d_layers):
        kk = jax.random.split(next(ks), 4)
        dls.append({
            "self": _attn_layer_init(kk[0], cfg.d_model, cfg.n_heads),
            "cross": _attn_layer_init(kk[1], cfg.d_model, cfg.n_heads),
            "ff1": _linear_init(kk[2], cfg.d_model, cfg.d_ff),
            "ff2": _linear_init(kk[3], cfg.d_ff, cfg.d_model),
            "ln1_scale": jnp.ones((cfg.d_model,)), "ln1_bias": jnp.zeros((cfg.d_model,)),
            "ln2_scale": jnp.ones((cfg.d_model,)), "ln2_bias": jnp.zeros((cfg.d_model,)),
            "ln3_scale": jnp.ones((cfg.d_model,)), "ln3_bias": jnp.zeros((cfg.d_model,)),
        })
    params["dec_layers"] = dls
    return params


def _ln_plain(x, scale, bias, eps=1e-5):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _conv_distil(x, p, mm):
    """ConvLayer: circular conv1d(k=3, pad=2) + BN + ELU + maxpool/2."""
    xp = jnp.concatenate([x[:, -2:], x, x[:, :2]], axis=1)  # circular pad 2
    windows = jnp.concatenate([xp[:, :-2], xp[:, 1:-1], xp[:, 2:]], axis=-1)
    y = jnp.dot(windows, p["w"], precision=mm) + p["b"]  # [B, L+2, C]
    mean = jnp.mean(y, (0, 1))
    var = jnp.var(y, (0, 1))
    y = (y - mean) * jax.lax.rsqrt(var + 1e-5) * p["bn_scale"] + p["bn_bias"]
    y = jax.nn.elu(y)
    yp = jnp.pad(y, ((0, 0), (1, 1), (0, 0)), constant_values=-jnp.inf)
    n_out = (y.shape[1] + 2 - 3) // 2 + 1
    stacked = jnp.stack(
        [yp[:, 2 * i : 2 * i + 3] for i in range(n_out)], axis=1
    )  # [B, n_out, 3, C]
    return jnp.max(stacked, axis=2)


@functools.partial(jax.jit, static_argnames=("cfg",))
def informer_forecast(
    params: Dict[str, Any],
    x_enc: jax.Array,
    x_mark_enc: jax.Array,
    x_dec: jax.Array,  # [B, label_len+pred_len, dec_in] (zeros after label)
    x_mark_dec: jax.Array,
    cfg: InformerConfig,
    rng: jax.Array = None,
) -> jax.Array:
    """Informer long_forecast -> [B, pred_len, c_out]."""
    mm = jax.lax.Precision.HIGHEST
    if rng is None:
        rng = jax.random.PRNGKey(0)
    rngs = iter(jax.random.split(rng, cfg.e_layers + 2 * cfg.d_layers))

    x = _tst.apply(params["enc_embed"], x_enc, cfg.enc_embed, x_mark_enc, mm)
    for i, lp in enumerate(params["enc_layers"]):
        q, k, v = _proj_qkv(lp["attn"], x, x, x, cfg.n_heads, mm)
        a = prob_attention(q, k, v, cfg.factor, False, next(rngs))
        x = x + _lin(lp["attn"]["o"], a.reshape(x.shape), mm)
        x = _ln_plain(x, lp["ln1_scale"], lp["ln1_bias"])
        y = jax.nn.gelu(_lin(lp["ff1"], x, mm))
        x = _ln_plain(x + _lin(lp["ff2"], y, mm), lp["ln2_scale"], lp["ln2_bias"])
        if cfg.distil and i < len(params.get("conv_layers", [])):
            x = _conv_distil(x, params["conv_layers"][i], mm)
    enc_out = _ln_plain(x, params["enc_norm_scale"], params["enc_norm_bias"])

    x = _tst.apply(params["dec_embed"], x_dec, cfg.dec_embed, x_mark_dec, mm)
    for lp in params["dec_layers"]:
        q, k, v = _proj_qkv(lp["self"], x, x, x, cfg.n_heads, mm)
        a = prob_attention(q, k, v, cfg.factor, True, next(rngs))
        x = _ln_plain(x + _lin(lp["self"]["o"], a.reshape(x.shape), mm),
                      lp["ln1_scale"], lp["ln1_bias"])
        q, k, v = _proj_qkv(lp["cross"], x, enc_out, enc_out, cfg.n_heads, mm)
        a = prob_attention(q, k, v, cfg.factor, False, next(rngs))
        x = _ln_plain(x + _lin(lp["cross"]["o"], a.reshape(x.shape), mm),
                      lp["ln2_scale"], lp["ln2_bias"])
        y = jax.nn.gelu(_lin(lp["ff1"], x, mm))
        x = _ln_plain(x + _lin(lp["ff2"], y, mm), lp["ln3_scale"], lp["ln3_bias"])
    x = _ln_plain(x, params["dec_norm_scale"], params["dec_norm_bias"])
    out = _lin(params["proj"], x, mm)
    return out[:, -cfg.pred_len:]


# ===========================================================================
# TimesNet (Time-Series/models/TimesNet.py + layers/Conv_Blocks.py)
# ===========================================================================


@dataclasses.dataclass(frozen=True)
class TimesNetConfig:
    seq_len: int = 96
    pred_len: int = 96
    enc_in: int = 7
    c_out: int = 7
    d_model: int = 32
    d_ff: int = 32
    e_layers: int = 2
    top_k: int = 3
    num_kernels: int = 6
    max_candidates: int = 8
    freq: str = "h"

    @property
    def total_len(self) -> int:
        return self.seq_len + self.pred_len

    @property
    def enc_embed(self):
        return _tst.TimeSeriesConfig(
            c_in=self.enc_in, dim=self.d_model, freq=self.freq,
            embed_type="timeF", use_pos=True,
        )

    @property
    def candidate_periods(self) -> tuple:
        """Static candidate periods: the divisors of total_len (largest
        first, excluding 1 and total_len), capped at max_candidates.

        TPU redesign of FFT_for_Period (TimesNet.py:9-18): the reference
        reshapes by a data-dependent period — impossible under XLA's
        static shapes. Restricting periods to divisors keeps the fold a
        static reshape; the FFT amplitudes still pick WHICH periods fire
        (scored at frequency total_len//period, softmax over the top-k).
        """
        t = self.total_len
        divs = [p for p in range(2, t) if t % p == 0]
        divs.sort(key=lambda p: -p)
        return tuple(divs[: self.max_candidates])


def _inception_init(key, cin, cout, num_kernels):
    ks = jax.random.split(key, num_kernels)
    return [
        {
            "w": jax.random.normal(k, (2 * i + 1, 2 * i + 1, cin, cout))
            * np.sqrt(2.0 / ((2 * i + 1) ** 2 * cin)),
            "b": jnp.zeros((cout,)),
        }
        for i, k in enumerate(ks)
    ]


def _inception_apply(blocks, x, mm):
    """Inception_Block_V1: mean of same-pad 2D convs, k = 1,3,5,..."""
    outs = []
    for p in blocks:
        outs.append(
            jax.lax.conv_general_dilated(
                x, p["w"], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=mm,
            )
            + p["b"]
        )
    return sum(outs) / len(outs)


def timesnet_init(cfg: TimesNetConfig, key: jax.Array) -> Dict[str, Any]:
    ks = iter(jax.random.split(key, 4 + 2 * cfg.e_layers))
    params: Dict[str, Any] = {
        "embed": _tst.init(cfg.enc_embed, next(ks)),
        "predict_w": jax.random.normal(
            next(ks), (cfg.seq_len, cfg.total_len)
        ) * cfg.seq_len**-0.5,
        "predict_b": jnp.zeros((cfg.total_len,)),
        "proj": _linear_init(next(ks), cfg.d_model, cfg.c_out),
        "ln_scale": jnp.ones((cfg.d_model,)),
        "ln_bias": jnp.zeros((cfg.d_model,)),
        "blocks": [
            {
                "inc1": _inception_init(next(ks), cfg.d_model, cfg.d_ff, cfg.num_kernels),
                "inc2": _inception_init(next(ks), cfg.d_ff, cfg.d_model, cfg.num_kernels),
            }
            for _ in range(cfg.e_layers)
        ],
    }
    return params


def _times_block(bp, x, cfg: TimesNetConfig, mm):
    """TimesBlock: period folding + inception 2D conv + adaptive
    aggregation over FFT-scored candidate periods (TimesNet.py:21-68)."""
    b, t, d = x.shape
    periods = cfg.candidate_periods
    amp = jnp.abs(jnp.fft.rfft(x, axis=1)).mean(-1)  # [B, F]
    amp = amp.at[:, 0].set(0.0)
    scores = jnp.stack([amp[:, t // p] for p in periods], -1)  # [B, nc]
    k = min(cfg.top_k, len(periods))
    topv, topi = jax.lax.top_k(scores, k)
    w = jax.nn.softmax(topv, -1)  # [B, k]
    # scatter top-k weights back onto the candidate axis
    weight_c = jnp.zeros_like(scores).at[
        jnp.arange(b)[:, None], topi
    ].set(w)  # [B, nc]

    outs = []
    for p in periods:  # static unroll over candidates
        folded = x.reshape(b, t // p, p, d)
        y = _inception_apply(bp["inc1"], folded, mm)
        y = jax.nn.gelu(y)
        y = _inception_apply(bp["inc2"], y, mm)
        outs.append(y.reshape(b, t, d))
    res = jnp.stack(outs, -1)  # [B, T, D, nc]
    agg = jnp.einsum("btdc,bc->btd", res, weight_c)
    return agg + x


@functools.partial(jax.jit, static_argnames=("cfg",))
def timesnet_forecast(
    params: Dict[str, Any],
    x_enc: jax.Array,
    x_mark_enc: jax.Array,
    cfg: TimesNetConfig,
) -> jax.Array:
    """TimesNet forecast -> [B, pred_len, c_out] (Model.forecast:
    non-stationary normalize, embed, temporal predict_linear, e_layers x
    (TimesBlock + LN), project, de-normalize)."""
    mm = jax.lax.Precision.HIGHEST
    means = jnp.mean(x_enc, 1, keepdims=True)
    xc = x_enc - means
    stdev = jnp.sqrt(jnp.var(xc, axis=1, keepdims=True) + 1e-5)
    xc = xc / stdev

    h = _tst.apply(params["embed"], xc, cfg.enc_embed, x_mark_enc, mm)
    h = jnp.einsum("btd,tu->bud", h, params["predict_w"], precision=mm)
    h = h + params["predict_b"][None, :, None]
    for bp in params["blocks"]:
        h = _ln_plain(_times_block(bp, h, cfg, mm), params["ln_scale"], params["ln_bias"])
    out = _lin(params["proj"], h, mm)
    out = out * stdev[:, 0][:, None] + means[:, 0][:, None]
    return out[:, -cfg.pred_len:]


# ===========================================================================
# FEDformer (Time-Series/models/FEDformer.py, fourier version +
# layers/FourierCorrelation.py) — Autoformer topology with frequency-
# domain self/cross attention.
# ===========================================================================


def frequency_modes(seq_len: int, modes: int, method: str = "low",
                    seed: int = 0):
    """Mode selection (FourierCorrelation.get_frequency_modes). The
    reference defaults to 'random' (host-side numpy shuffle at build
    time); 'low' keeps the lowest modes and is the deterministic
    default here. Both are static at trace time."""
    m = min(modes, seq_len // 2)
    if method == "random":
        idx = np.random.default_rng(seed).permutation(seq_len // 2)[:m]
        return tuple(sorted(int(i) for i in idx))
    return tuple(range(m))


def _cmul(a_re, a_im, b_re, b_im, order):
    """Complex einsum via real parts (compl_mul1d)."""
    re = jnp.einsum(order, a_re, b_re) - jnp.einsum(order, a_im, b_im)
    im = jnp.einsum(order, a_re, b_im) + jnp.einsum(order, a_im, b_re)
    return re, im


def fourier_block(q, w_re, w_im, index, seq_len):
    """FourierBlock: rfft -> per-mode complex linear map -> irfft.
    q: [B, L, H, E]; w: [H, E, E, M]. -> [B, L, H, E]."""
    x = q.transpose(0, 2, 3, 1)  # [B, H, E, L]
    xf = jnp.fft.rfft(x)  # [B, H, E, Lf] complex
    idx = jnp.asarray(index, jnp.int32)
    sel = xf[..., idx]  # [B, H, E, M]
    o_re, o_im = _cmul(sel.real, sel.imag, w_re, w_im, "bhim,hiom->bhom")
    lf = seq_len // 2 + 1
    out = jnp.zeros(x.shape[:3] + (lf,), jnp.complex64)
    out = out.at[..., idx].set(o_re + 1j * o_im)
    y = jnp.fft.irfft(out, n=seq_len)  # [B, H, E, L]
    return y.transpose(0, 3, 1, 2)


def fourier_cross_attention(q, k, w_re, w_im, index_q, index_kv, seq_len_q):
    """FourierCrossAttention: frequency-domain q/k correlation with tanh
    activation, value = k modes (FourierCorrelation.py:121-161).
    q: [B, Lq, H, E], k: [B, Lkv, H, E]."""
    e = q.shape[-1]
    xq = q.transpose(0, 2, 3, 1)
    xk = k.transpose(0, 2, 3, 1)
    iq = jnp.asarray(index_q, jnp.int32)
    ikv = jnp.asarray(index_kv, jnp.int32)
    qf = jnp.fft.rfft(xq)[..., iq]  # [B, H, E, Mq]
    kf = jnp.fft.rfft(xk)[..., ikv]  # [B, H, E, Mkv]
    s_re, s_im = _cmul(qf.real, qf.imag, kf.real, kf.imag, "bhex,bhey->bhxy")
    s_re, s_im = jnp.tanh(s_re), jnp.tanh(s_im)
    v_re, v_im = _cmul(s_re, s_im, kf.real, kf.imag, "bhxy,bhey->bhex")
    o_re, o_im = _cmul(v_re, v_im, w_re, w_im, "bhex,heox->bhox")
    lf = seq_len_q // 2 + 1
    out = jnp.zeros(xq.shape[:3] + (lf,), jnp.complex64)
    out = out.at[..., iq].set((o_re + 1j * o_im))
    scale = 1.0 / (e * q.shape[2] * e * q.shape[2])  # 1/(in_ch*out_ch)
    y = jnp.fft.irfft(out * scale, n=seq_len_q)
    return y.transpose(0, 3, 1, 2)


@dataclasses.dataclass(frozen=True)
class FEDformerConfig:
    seq_len: int = 96
    label_len: int = 48
    pred_len: int = 96
    enc_in: int = 7
    dec_in: int = 7
    c_out: int = 7
    d_model: int = 64
    n_heads: int = 8
    d_ff: int = 128
    e_layers: int = 2
    d_layers: int = 1
    moving_avg: int = 25
    modes: int = 32
    mode_select: str = "low"
    freq: str = "h"

    @property
    def dec_len(self) -> int:
        return self.seq_len // 2 + self.pred_len

    @property
    def enc_embed(self):
        return _tst.TimeSeriesConfig(
            c_in=self.enc_in, dim=self.d_model, freq=self.freq,
            embed_type="timeF", use_pos=False,
        )

    @property
    def dec_embed(self):
        return dataclasses.replace(self.enc_embed, c_in=self.dec_in)


def _fourier_w(key, h, e, m):
    scale = 1.0 / ((h * e) * (h * e))
    k1, k2 = jax.random.split(key)
    return {
        "re": jax.random.uniform(k1, (h, e, e, m)) * scale,
        "im": jax.random.uniform(k2, (h, e, e, m)) * scale,
    }


def fedformer_init(cfg: FEDformerConfig, key: jax.Array) -> Dict[str, Any]:
    h, e = cfg.n_heads, cfg.d_model // cfg.n_heads
    enc_idx = frequency_modes(cfg.seq_len, cfg.modes, cfg.mode_select)
    dec_idx = frequency_modes(cfg.dec_len, cfg.modes, cfg.mode_select)
    ks = iter(jax.random.split(key, 16 + 4 * (cfg.e_layers + cfg.d_layers)))
    params: Dict[str, Any] = {
        "enc_embed": _tst.init(cfg.enc_embed, next(ks)),
        "dec_embed": _tst.init(cfg.dec_embed, next(ks)),
        "enc_norm_scale": jnp.ones((cfg.d_model,)),
        "enc_norm_bias": jnp.zeros((cfg.d_model,)),
        "dec_norm_scale": jnp.ones((cfg.d_model,)),
        "dec_norm_bias": jnp.zeros((cfg.d_model,)),
        "dec_proj": _linear_init(next(ks), cfg.d_model, cfg.c_out),
    }
    els = []
    for _ in range(cfg.e_layers):
        kk = jax.random.split(next(ks), 4)
        els.append({
            "attn": _attn_layer_init(kk[0], cfg.d_model, cfg.n_heads),
            "fb": _fourier_w(kk[1], h, e, len(enc_idx)),
            "ff1": _linear_init(kk[2], cfg.d_model, cfg.d_ff, bias=False),
            "ff2": _linear_init(kk[3], cfg.d_ff, cfg.d_model, bias=False),
        })
    params["enc_layers"] = els
    dls = []
    for _ in range(cfg.d_layers):
        kk = jax.random.split(next(ks), 7)
        dls.append({
            "self": _attn_layer_init(kk[0], cfg.d_model, cfg.n_heads),
            "self_fb": _fourier_w(kk[1], h, e, len(dec_idx)),
            "cross": _attn_layer_init(kk[2], cfg.d_model, cfg.n_heads),
            "cross_fb": _fourier_w(kk[3], h, e, len(dec_idx)),
            "ff1": _linear_init(kk[4], cfg.d_model, cfg.d_ff, bias=False),
            "ff2": _linear_init(kk[5], cfg.d_ff, cfg.d_model, bias=False),
            "trend_w": jax.random.normal(kk[6], (3 * cfg.d_model, cfg.c_out))
            * (3 * cfg.d_model) ** -0.5,
        })
    params["dec_layers"] = dls
    return params


@functools.partial(jax.jit, static_argnames=("cfg",))
def fedformer_forecast(
    params: Dict[str, Any],
    x_enc: jax.Array,
    x_mark_enc: jax.Array,
    x_mark_dec: jax.Array,  # [B, label_len+pred_len, n_timef]
    cfg: FEDformerConfig,
) -> jax.Array:
    """FEDformer forecast -> [B, pred_len, c_out] (Model.forecast).
    NB the decoder operates on seq_len//2 + pred_len tokens (its
    seasonal/trend init takes the LAST seq_len//2 of the encoder window,
    FEDformer.py:115-121 with label_len = seq_len//2 in the recipes)."""
    mm = jax.lax.Precision.HIGHEST
    b = x_enc.shape[0]
    half = cfg.seq_len // 2
    enc_idx = frequency_modes(cfg.seq_len, cfg.modes, cfg.mode_select)
    dec_idx = frequency_modes(cfg.dec_len, cfg.modes, cfg.mode_select)

    mean = jnp.mean(x_enc, 1, keepdims=True)
    seasonal_init, trend_init = series_decomp(x_enc, cfg.moving_avg)
    trend = jnp.concatenate(
        [trend_init[:, -half:], jnp.tile(mean, (1, cfg.pred_len, 1))], 1
    )
    seasonal = jnp.concatenate(
        [seasonal_init[:, -half:],
         jnp.zeros((b, cfg.pred_len, cfg.dec_in), x_enc.dtype)], 1,
    )

    x = _tst.apply(params["enc_embed"], x_enc, cfg.enc_embed, x_mark_enc, mm)
    for lp in params["enc_layers"]:
        q, k, v = _proj_qkv(lp["attn"], x, x, x, cfg.n_heads, mm)
        a = fourier_block(q, lp["fb"]["re"], lp["fb"]["im"], enc_idx,
                          cfg.seq_len).reshape(x.shape)
        x = x + _lin(lp["attn"]["o"], a, mm)
        x, _ = series_decomp(x, cfg.moving_avg)
        y = jax.nn.relu(_lin(lp["ff1"], x, mm))
        y = _lin(lp["ff2"], y, mm)
        x, _ = series_decomp(x + y, cfg.moving_avg)
    enc_out = my_layer_norm(x, params["enc_norm_scale"], params["enc_norm_bias"])

    x = _tst.apply(params["dec_embed"], seasonal, cfg.dec_embed,
                   x_mark_dec[:, -cfg.dec_len:], mm)
    for lp in params["dec_layers"]:
        q, k, v = _proj_qkv(lp["self"], x, x, x, cfg.n_heads, mm)
        a = fourier_block(q, lp["self_fb"]["re"], lp["self_fb"]["im"],
                          dec_idx, cfg.dec_len).reshape(x.shape)
        x = x + _lin(lp["self"]["o"], a, mm)
        x, t1 = series_decomp(x, cfg.moving_avg)
        q, k, v = _proj_qkv(lp["cross"], x, enc_out, enc_out, cfg.n_heads, mm)
        a = fourier_cross_attention(
            q, k, lp["cross_fb"]["re"], lp["cross_fb"]["im"],
            dec_idx, enc_idx, cfg.dec_len,
        ).reshape(x.shape)
        x = x + _lin(lp["cross"]["o"], a, mm)
        x, t2 = series_decomp(x, cfg.moving_avg)
        y = jax.nn.relu(_lin(lp["ff1"], x, mm))
        y = _lin(lp["ff2"], y, mm)
        x, t3 = series_decomp(x + y, cfg.moving_avg)
        trend = trend + _circular_conv3(t1 + t2 + t3, lp["trend_w"], mm)
    x = my_layer_norm(x, params["dec_norm_scale"], params["dec_norm_bias"])
    out = _lin(params["dec_proj"], x, mm) + trend
    return out[:, -cfg.pred_len:]


# ===========================================================================
# Nonstationary Transformer (models/Nonstationary_Transformer.py +
# DSAttention, SelfAttention_Family.py:10-45)
# ===========================================================================


@dataclasses.dataclass(frozen=True)
class NonstationaryConfig:
    seq_len: int = 96
    label_len: int = 48
    pred_len: int = 96
    enc_in: int = 7
    dec_in: int = 7
    c_out: int = 7
    d_model: int = 64
    n_heads: int = 4
    d_ff: int = 128
    e_layers: int = 2
    d_layers: int = 1
    p_hidden: int = 32  # p_hidden_dims
    p_layers: int = 2  # p_hidden_layers
    freq: str = "h"

    @property
    def enc_embed(self):
        return _tst.TimeSeriesConfig(
            c_in=self.enc_in, dim=self.d_model, freq=self.freq,
            embed_type="timeF", use_pos=True,  # full DataEmbedding
        )

    @property
    def dec_embed(self):
        return dataclasses.replace(self.enc_embed, c_in=self.dec_in)


def _projector_init(key, enc_in, p_hidden, p_layers, out_dim):
    """De-stationary factor MLP (Projector): circular conv over the
    feature axis with the seq_len as channels, then an MLP."""
    ks = iter(jax.random.split(key, p_layers + 2))
    p = {"conv_w": jax.random.normal(next(ks), (3,)) / np.sqrt(3.0)}
    cin = 2 * enc_in
    layers = []
    for _ in range(p_layers):
        layers.append(_linear_init(next(ks), cin, p_hidden))
        cin = p_hidden
    p["mlp"] = layers
    p["out"] = _linear_init(next(ks), cin, out_dim, bias=False)
    return p


def _projector_apply(p, x_raw, stats, seq_w, mm):
    """x_raw [B, S, E], stats [B, 1, E] -> [B, out_dim].
    series_conv is Conv1d(in=seq_len, out=1, k=3, circular) over the
    feature axis; its weight over time is `seq_w` [S, 3]."""
    xm = jnp.stack(
        [jnp.roll(x_raw, 1, axis=2), x_raw, jnp.roll(x_raw, -1, axis=2)], -1
    )  # [B, S, E, 3]
    conv = jnp.einsum("bsek,sk->be", xm, seq_w, precision=mm)  # [B, E]
    h = jnp.concatenate([conv, stats[:, 0]], axis=-1)  # [B, 2E]
    for lp in p["mlp"]:
        h = jax.nn.relu(_lin(lp, h, mm))
    return _lin(p["out"], h, mm)


def ds_attention(q, k, v, tau, delta, causal, mm):
    """De-stationary attention: scores * tau + delta before softmax
    (DSAttention.forward). q [B, L, H, E]; tau [B, 1]; delta [B, S]|None."""
    e = q.shape[-1]
    scores = jnp.einsum("blhe,bshe->bhls", q, k, precision=mm)
    scores = scores * tau[:, :, None, None]
    if delta is not None:
        scores = scores + delta[:, None, None, :]
    if causal:
        l, s = scores.shape[-2:]
        mask = jnp.tril(jnp.ones((l, s), bool))
        scores = jnp.where(mask, scores, -jnp.inf)
    a = jax.nn.softmax(scores / np.sqrt(e), axis=-1)
    return jnp.einsum("bhls,bshe->blhe", a, v, precision=mm)


def _ns_layer_init(key, cfg, cross=False):
    n = 5 if cross else 3
    kk = jax.random.split(key, n)
    p = {
        "self": _attn_layer_init(kk[0], cfg.d_model, cfg.n_heads),
        "ff1": _linear_init(kk[1], cfg.d_model, cfg.d_ff, bias=False),
        "ff2": _linear_init(kk[2], cfg.d_ff, cfg.d_model, bias=False),
        "ln1_scale": jnp.ones((cfg.d_model,)),
        "ln1_bias": jnp.zeros((cfg.d_model,)),
        "ln2_scale": jnp.ones((cfg.d_model,)),
        "ln2_bias": jnp.zeros((cfg.d_model,)),
    }
    if cross:
        p["cross"] = _attn_layer_init(kk[3], cfg.d_model, cfg.n_heads)
        p["ln3_scale"] = jnp.ones((cfg.d_model,))
        p["ln3_bias"] = jnp.zeros((cfg.d_model,))
    return p


def nonstationary_init(cfg: NonstationaryConfig, key: jax.Array) -> Dict[str, Any]:
    ks = iter(jax.random.split(key, 8 + cfg.e_layers + cfg.d_layers))
    return {
        "enc_embed": _tst.init(cfg.enc_embed, next(ks)),
        "dec_embed": _tst.init(cfg.dec_embed, next(ks)),
        "enc_layers": [
            _ns_layer_init(next(ks), cfg) for _ in range(cfg.e_layers)
        ],
        "dec_layers": [
            _ns_layer_init(next(ks), cfg, cross=True)
            for _ in range(cfg.d_layers)
        ],
        "enc_norm_scale": jnp.ones((cfg.d_model,)),
        "enc_norm_bias": jnp.zeros((cfg.d_model,)),
        "dec_norm_scale": jnp.ones((cfg.d_model,)),
        "dec_norm_bias": jnp.zeros((cfg.d_model,)),
        "proj": _linear_init(next(ks), cfg.d_model, cfg.c_out),
        "tau": _projector_init(next(ks), cfg.enc_in, cfg.p_hidden,
                               cfg.p_layers, 1),
        "tau_conv_w": jax.random.normal(next(ks), (cfg.seq_len, 3))
        / np.sqrt(3.0 * cfg.seq_len),
        "delta": _projector_init(next(ks), cfg.enc_in, cfg.p_hidden,
                                 cfg.p_layers, cfg.seq_len),
        "delta_conv_w": jax.random.normal(next(ks), (cfg.seq_len, 3))
        / np.sqrt(3.0 * cfg.seq_len),
    }


@functools.partial(jax.jit, static_argnames=("cfg",))
def nonstationary_forecast(
    params: Dict[str, Any],
    x_enc: jax.Array,
    x_mark_enc: jax.Array,
    x_mark_dec: jax.Array,  # [B, label_len+pred_len, n_timef]
    cfg: NonstationaryConfig,
) -> jax.Array:
    """Nonstationary Transformer forecast -> [B, pred_len, c_out]
    (Model.forecast: series normalization, learned tau/delta
    de-stationary factors, DSAttention enc-dec, de-normalize)."""
    mm = jax.lax.Precision.HIGHEST
    x_raw = x_enc
    mean = jnp.mean(x_enc, 1, keepdims=True)
    xc = x_enc - mean
    std = jnp.sqrt(jnp.var(xc, axis=1, keepdims=True) + 1e-5)
    xc = xc / std
    mean = jax.lax.stop_gradient(mean)
    std = jax.lax.stop_gradient(std)

    tau = jnp.exp(
        _projector_apply(params["tau"], x_raw, std, params["tau_conv_w"], mm)
    )  # [B, 1]
    delta = _projector_apply(
        params["delta"], x_raw, mean, params["delta_conv_w"], mm
    )  # [B, seq_len]

    x_dec = jnp.concatenate(
        [xc[:, -cfg.label_len:],
         jnp.zeros((xc.shape[0], cfg.pred_len, cfg.dec_in), xc.dtype)], 1,
    )

    x = _tst.apply(params["enc_embed"], xc, cfg.enc_embed, x_mark_enc, mm)
    for lp in params["enc_layers"]:
        q, k, v = _proj_qkv(lp["self"], x, x, x, cfg.n_heads, mm)
        a = ds_attention(q, k, v, tau, delta, False, mm).reshape(x.shape)
        x = _ln_plain(x + _lin(lp["self"]["o"], a, mm),
                      lp["ln1_scale"], lp["ln1_bias"])
        y = jax.nn.relu(_lin(lp["ff1"], x, mm))
        x = _ln_plain(x + _lin(lp["ff2"], y, mm),
                      lp["ln2_scale"], lp["ln2_bias"])
    enc_out = _ln_plain(x, params["enc_norm_scale"], params["enc_norm_bias"])

    x = _tst.apply(params["dec_embed"], x_dec, cfg.dec_embed, x_mark_dec, mm)
    for lp in params["dec_layers"]:
        q, k, v = _proj_qkv(lp["self"], x, x, x, cfg.n_heads, mm)
        # decoder self-attn: causal, tau only (delta=None, Decoder x_mask path)
        a = ds_attention(q, k, v, tau, None, True, mm).reshape(x.shape)
        x = _ln_plain(x + _lin(lp["self"]["o"], a, mm),
                      lp["ln1_scale"], lp["ln1_bias"])
        q, k, v = _proj_qkv(lp["cross"], x, enc_out, enc_out, cfg.n_heads, mm)
        a = ds_attention(q, k, v, tau, delta, False, mm).reshape(x.shape)
        x = _ln_plain(x + _lin(lp["cross"]["o"], a, mm),
                      lp["ln3_scale"], lp["ln3_bias"])
        y = jax.nn.relu(_lin(lp["ff1"], x, mm))
        x = _ln_plain(x + _lin(lp["ff2"], y, mm),
                      lp["ln2_scale"], lp["ln2_bias"])
    x = _ln_plain(x, params["dec_norm_scale"], params["dec_norm_bias"])
    out = _lin(params["proj"], x, mm)
    out = out * std + mean  # de-normalize
    return out[:, -cfg.pred_len:]


# ===========================================================================
# Crossformer (models/Crossformer.py + Crossformer_EncDec.py +
# TwoStageAttentionLayer, SelfAttention_Family.py:246-302)
# ===========================================================================


@dataclasses.dataclass(frozen=True)
class CrossformerConfig:
    seq_len: int = 96
    pred_len: int = 96
    enc_in: int = 7
    d_model: int = 64
    n_heads: int = 4
    d_ff: int = 128
    e_layers: int = 2
    seg_len: int = 12
    win_size: int = 2
    factor: int = 10  # router slots

    @property
    def pad_in_len(self) -> int:
        return -(-self.seq_len // self.seg_len) * self.seg_len

    @property
    def pad_out_len(self) -> int:
        return -(-self.pred_len // self.seg_len) * self.seg_len

    @property
    def in_seg(self) -> int:
        return self.pad_in_len // self.seg_len

    @property
    def out_seg(self) -> int:
        return self.pad_out_len // self.seg_len

    def seg_at(self, layer: int) -> int:
        s = self.in_seg
        for _ in range(layer):
            s = -(-s // self.win_size)
        return s


def _full_attention(p, q_in, k_in, v_in, n_heads, mm):
    """Standard MHA used by the TSA stages (FullAttention)."""
    q, k, v = _proj_qkv(p, q_in, k_in, v_in, n_heads, mm)
    e = q.shape[-1]
    s = jnp.einsum("blhe,bshe->bhls", q, k, precision=mm) / np.sqrt(e)
    a = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhls,bshe->blhe", a, v, precision=mm)
    return _lin(p["o"], o.reshape(q_in.shape[0], q_in.shape[1], -1), mm)


def _tsa_init(key, cfg: CrossformerConfig, seg_num: int):
    kk = jax.random.split(key, 8)
    d = cfg.d_model
    return {
        "time": _attn_layer_init(kk[0], d, cfg.n_heads),
        "send": _attn_layer_init(kk[1], d, cfg.n_heads),
        "recv": _attn_layer_init(kk[2], d, cfg.n_heads),
        "router": jax.random.normal(kk[3], (seg_num, cfg.factor, d)),
        "mlp1_a": _linear_init(kk[4], d, cfg.d_ff),
        "mlp1_b": _linear_init(kk[5], cfg.d_ff, d),
        "mlp2_a": _linear_init(kk[6], d, cfg.d_ff),
        "mlp2_b": _linear_init(kk[7], cfg.d_ff, d),
        **{f"ln{i}_scale": jnp.ones((d,)) for i in range(1, 5)},
        **{f"ln{i}_bias": jnp.zeros((d,)) for i in range(1, 5)},
    }


def _tsa_apply(p, x, cfg: CrossformerConfig, mm):
    """Two-Stage Attention: time attention per variable, then
    router-mediated cross-dimension attention. x [B, D, S, dm]."""
    b, d, s, dm = x.shape
    t_in = x.reshape(b * d, s, dm)
    t = _full_attention(p["time"], t_in, t_in, t_in, cfg.n_heads, mm)
    h = _ln_plain(t_in + t, p["ln1_scale"], p["ln1_bias"])
    y = _lin(p["mlp1_b"], jax.nn.gelu(_lin(p["mlp1_a"], h, mm)), mm)
    h = _ln_plain(h + y, p["ln2_scale"], p["ln2_bias"])

    send = h.reshape(b, d, s, dm).transpose(0, 2, 1, 3).reshape(b * s, d, dm)
    router = jnp.tile(p["router"][:s][None], (b, 1, 1, 1)).reshape(
        b * s, cfg.factor, dm
    )
    buf = _full_attention(p["send"], router, send, send, cfg.n_heads, mm)
    recv = _full_attention(p["recv"], send, buf, buf, cfg.n_heads, mm)
    g = _ln_plain(send + recv, p["ln3_scale"], p["ln3_bias"])
    y = _lin(p["mlp2_b"], jax.nn.gelu(_lin(p["mlp2_a"], g, mm)), mm)
    g = _ln_plain(g + y, p["ln4_scale"], p["ln4_bias"])
    return g.reshape(b, s, d, dm).transpose(0, 2, 1, 3)


def crossformer_init(cfg: CrossformerConfig, key: jax.Array) -> Dict[str, Any]:
    ks = iter(jax.random.split(key, 16 + 4 * cfg.e_layers))
    d = cfg.d_model
    params: Dict[str, Any] = {
        "val_embed": _linear_init(next(ks), cfg.seg_len, d),
        "enc_pos": jax.random.normal(next(ks), (1, cfg.enc_in, cfg.in_seg, d)),
        "pre_ln_scale": jnp.ones((d,)),
        "pre_ln_bias": jnp.zeros((d,)),
        "dec_pos": jax.random.normal(next(ks), (1, cfg.enc_in, cfg.out_seg, d)),
    }
    blocks = []
    for l in range(cfg.e_layers):
        blk = {"tsa": _tsa_init(next(ks), cfg, cfg.seg_at(l))}
        if l > 0:
            kk = jax.random.split(next(ks), 1)[0]
            blk["merge"] = _linear_init(kk, cfg.win_size * d, d)
            blk["merge_ln_scale"] = jnp.ones((cfg.win_size * d,))
            blk["merge_ln_bias"] = jnp.zeros((cfg.win_size * d,))
        blocks.append(blk)
    params["enc_blocks"] = blocks
    decs = []
    for _ in range(cfg.e_layers + 1):
        kk = jax.random.split(next(ks), 4)
        decs.append({
            "tsa": _tsa_init(kk[0], cfg, cfg.out_seg),
            "cross": _attn_layer_init(kk[1], d, cfg.n_heads),
            "mlp_a": _linear_init(kk[2], d, d),
            "mlp_b": _linear_init(kk[3], d, d),
            "ln1_scale": jnp.ones((d,)), "ln1_bias": jnp.zeros((d,)),
            "ln2_scale": jnp.ones((d,)), "ln2_bias": jnp.zeros((d,)),
            "pred": _linear_init(jax.random.split(kk[3])[0], d, cfg.seg_len),
        })
    params["dec_layers"] = decs
    return params


@functools.partial(jax.jit, static_argnames=("cfg",))
def crossformer_forecast(
    params: Dict[str, Any],
    x_enc: jax.Array,  # [B, seq_len, enc_in]
    cfg: CrossformerConfig,
) -> jax.Array:
    """Crossformer forecast -> [B, pred_len, enc_in] (Model.forecast:
    per-variable segment embedding, hierarchical TSA encoder with
    segment merging, per-scale decoder summing segment predictions)."""
    mm = jax.lax.Precision.HIGHEST
    b, l, d_in = x_enc.shape
    pad = cfg.pad_in_len - l
    if pad:  # replication-pad the front window (PatchEmbedding)
        x_enc = jnp.concatenate(
            [x_enc, jnp.tile(x_enc[:, -1:], (1, pad, 1))], axis=1
        )
    segs = x_enc.transpose(0, 2, 1).reshape(
        b, d_in, cfg.in_seg, cfg.seg_len
    )
    x = _lin(params["val_embed"], segs, mm)  # [B, D, S, dm]
    x = x + params["enc_pos"]
    x = _ln_plain(x, params["pre_ln_scale"], params["pre_ln_bias"])

    scales = [x]
    for li, blk in enumerate(params["enc_blocks"]):
        if li > 0:  # SegMerging
            bb, dd, ss, dm = x.shape
            w = cfg.win_size
            padn = (-ss) % w
            if padn:
                x = jnp.concatenate([x, x[:, :, -padn:]], axis=2)
                ss += padn
            merged = jnp.concatenate(
                [x[:, :, i::w] for i in range(w)], axis=-1
            )
            merged = _ln_plain(
                merged, blk["merge_ln_scale"], blk["merge_ln_bias"]
            )
            x = _lin(blk["merge"], merged, mm)
        x = _tsa_apply(blk["tsa"], x, cfg, mm)
        scales.append(x)

    dec = jnp.tile(params["dec_pos"], (b, 1, 1, 1))
    predict = 0.0
    for lp, cross in zip(params["dec_layers"], scales):
        dec = _tsa_apply(lp["tsa"], dec, cfg, mm)
        bb, dd, ss, dm = dec.shape
        q = dec.reshape(bb * dd, ss, dm)
        kv = cross.reshape(bb * dd, -1, dm)
        tmp = _full_attention(lp["cross"], q, kv, kv, cfg.n_heads, mm)
        h = _ln_plain(q + tmp, lp["ln1_scale"], lp["ln1_bias"])
        y = _lin(lp["mlp_b"], jax.nn.gelu(_lin(lp["mlp_a"], h, mm)), mm)
        h = _ln_plain(h + y, lp["ln2_scale"], lp["ln2_bias"])
        dec = h.reshape(bb, dd, ss, dm)
        predict = predict + _lin(lp["pred"], dec, mm)  # [B, D, S, seg]
    out = predict.reshape(b, d_in, -1).transpose(0, 2, 1)
    return out[:, : cfg.pred_len]


# ===========================================================================
# LightTS (models/LightTS.py) — MLP over continuous + interval chunk
# samplings with a linear autoregressive highway.
# ===========================================================================


@dataclasses.dataclass(frozen=True)
class LightTSConfig:
    seq_len: int = 96
    pred_len: int = 96
    enc_in: int = 7
    d_model: int = 64
    chunk_size: int = 24

    @property
    def chunk(self) -> int:
        return min(self.pred_len, self.seq_len, self.chunk_size)

    @property
    def num_chunks(self) -> int:
        assert self.seq_len % self.chunk == 0
        return self.seq_len // self.chunk


def _ie_block_init(key, input_dim, hid, output_dim, num_node):
    ks = jax.random.split(key, 4)
    return {
        "sp_a": _linear_init(ks[0], input_dim, hid),
        "sp_b": _linear_init(ks[1], hid, hid // 4),
        # channel_proj is identity-initialized (LightTS.py:24-25)
        "ch": {"w": jnp.eye(num_node), "b": jnp.zeros((num_node,))},
        "out": _linear_init(ks[3], hid // 4, output_dim),
    }


def _ie_block(p, x, mm):
    """IEBlock: x [B', input_dim, num_node] -> [B', output_dim, num_node]."""
    h = x.transpose(0, 2, 1)  # [B', node, in]
    h = jax.nn.leaky_relu(_lin(p["sp_a"], h, mm), 0.01)
    h = _lin(p["sp_b"], h, mm)  # [B', node, hid/4]
    h = h.transpose(0, 2, 1)  # [B', hid/4, node]
    h = h + _lin(p["ch"], h, mm)
    h = _lin(p["out"], h.transpose(0, 2, 1), mm)  # [B', node, out]
    return h.transpose(0, 2, 1)


def lightts_init(cfg: LightTSConfig, key: jax.Array) -> Dict[str, Any]:
    ks = jax.random.split(key, 6)
    d = cfg.d_model
    return {
        "layer1": _ie_block_init(ks[0], cfg.chunk, d // 4, d // 4, cfg.num_chunks),
        "proj1": _linear_init(ks[1], cfg.num_chunks, 1),
        "layer2": _ie_block_init(ks[2], cfg.chunk, d // 4, d // 4, cfg.num_chunks),
        "proj2": _linear_init(ks[3], cfg.num_chunks, 1),
        "layer3": _ie_block_init(ks[4], d // 2, d // 2, cfg.pred_len, cfg.enc_in),
        "ar": _linear_init(ks[5], cfg.seq_len, cfg.pred_len),
    }


@functools.partial(jax.jit, static_argnames=("cfg",))
def lightts_forecast(
    params: Dict[str, Any], x: jax.Array, cfg: LightTSConfig
) -> jax.Array:
    """x [B, seq_len, C] -> [B, pred_len, C] (Model.encoder)."""
    mm = jax.lax.Precision.HIGHEST
    b, t, n = x.shape
    c, nc = cfg.chunk, cfg.num_chunks
    highway = _lin(params["ar"], x.transpose(0, 2, 1), mm).transpose(0, 2, 1)

    # continuous sampling: [B, nc, c, N] -> [B*N, c, nc]
    x1 = x.reshape(b, nc, c, n).transpose(0, 3, 2, 1).reshape(b * n, c, nc)
    x1 = _ie_block(params["layer1"], x1, mm)
    x1 = _lin(params["proj1"], x1, mm)[..., 0]  # [B*N, d/4]
    # interval sampling: [B, c, nc, N] -> [B*N, c, nc]
    x2 = x.reshape(b, c, nc, n).transpose(0, 3, 1, 2).reshape(b * n, c, nc)
    x2 = _ie_block(params["layer2"], x2, mm)
    x2 = _lin(params["proj2"], x2, mm)[..., 0]

    x3 = jnp.concatenate([x1, x2], axis=-1).reshape(b, n, -1)
    out = _ie_block(params["layer3"], x3.transpose(0, 2, 1), mm)  # [B,pred,N]
    return out + highway


# ===========================================================================
# ETSformer (models/ETSformer.py + layers/ETSformer_EncDec.py) —
# level/growth/season decomposition with exponential-smoothing attention.
# TPU-native: the reference's FFT causal convolution
# (conv1d_fft, ETSformer_EncDec.py:28-43) is an EMA recurrence
# y[t] = a*y[t-1] + b*x[t], computed here with lax.associative_scan
# (O(log T) depth, no host FFT planning).
# ===========================================================================


def ema_scan(x: jax.Array, decay: jax.Array, gain: jax.Array, init: jax.Array):
    """y[t] = decay*y[t-1] + gain*x[t], y[-1] = init.
    x [B, T, H, D]; decay/gain [H] broadcast; init [B(, 1), H, D]."""
    b, t, h, d = x.shape
    a = jnp.broadcast_to(decay[None, None, :, None], x.shape)
    bx = gain[None, None, :, None] * x
    # fold the initial state into step 0
    bx = bx.at[:, 0].add(a[:, 0] * init.reshape(b, h, d))

    def combine(lhs, rhs):
        a1, b1 = lhs
        a2, b2 = rhs
        return a1 * a2, a2 * b1 + b2

    _, y = jax.lax.associative_scan(combine, (a, bx), axis=1)
    return y


@dataclasses.dataclass(frozen=True)
class ETSformerConfig:
    seq_len: int = 96
    pred_len: int = 96
    enc_in: int = 7
    c_out: int = 7
    d_model: int = 64
    n_heads: int = 4
    d_ff: int = 128
    e_layers: int = 2
    top_k: int = 5
    freq: str = "h"

    @property
    def enc_embed(self):
        return _tst.TimeSeriesConfig(
            c_in=self.enc_in, dim=self.d_model, freq=self.freq,
            embed_type="timeF", use_pos=True,
        )


def _es_init(key, nhead, dim):
    k1, k2 = jax.random.split(key)
    return {
        "alpha": jax.random.normal(k1, (nhead, 1)),  # sigmoid -> smoothing
        "v0": jax.random.normal(k2, (1, 1, nhead, dim)),
    }


def _es_apply(p, values, aux=None):
    """ExponentialSmoothing (ETSformer_EncDec.py:46-86)."""
    alpha = jax.nn.sigmoid(p["alpha"][:, 0])  # [H]
    h, d = values.shape[2], values.shape[3]
    v0 = jnp.broadcast_to(p["v0"], (values.shape[0], 1, h, d))
    out = ema_scan(values, alpha, 1 - alpha, v0)
    if aux is not None:
        # sum_{s<=t} alpha^(t-s+1) aux[s]: EMA with gain = decay = alpha
        zero = jnp.zeros_like(v0)
        out = out + ema_scan(aux, alpha, alpha, zero)
    return out


def ets_growth_layer(p, x, n_heads, mm):
    """GrowthLayer -> [B, T+1, D] (first row is the v0 seed)."""
    b, t, dm = x.shape
    v = _lin(p["in"], x, mm).reshape(b, t, n_heads, -1)
    z0 = jnp.broadcast_to(p["z0"][None, None], (b, 1, *p["z0"].shape))
    v = jnp.concatenate([z0, v], axis=1)
    v = v[:, 1:] - v[:, :-1]
    out = _es_apply(p["es"], v)
    v0 = jnp.broadcast_to(p["es"]["v0"], (b, 1, *p["es"]["v0"].shape[2:]))
    out = jnp.concatenate([v0, out], axis=1)  # [B, T+1, H, hd]
    return _lin(p["out"], out.reshape(b, t + 1, dm), mm)


def ets_fourier_layer(x, pred_len, k, low_freq=1):
    """FourierLayer: per-(sample, channel) top-k frequency extrapolation
    -> [B, T+pred, D] (ETSformer_EncDec.py:133-179)."""
    b, t, d = x.shape
    xf = jnp.fft.rfft(x, axis=1)  # [B, F, D]
    if t % 2 == 0:
        xf = xf[:, low_freq:-1]
        f = jnp.fft.rfftfreq(t)[low_freq:-1]
    else:
        xf = xf[:, low_freq:]
        f = jnp.fft.rfftfreq(t)[low_freq:]
    amp = jnp.abs(xf)  # [B, F, D]
    _, idx = jax.lax.top_k(amp.transpose(0, 2, 1), k)  # [B, D, k]
    sel = jnp.take_along_axis(xf.transpose(0, 2, 1), idx, axis=-1)  # [B,D,k]
    fsel = f[idx]  # [B, D, k]
    # conjugate pairs to keep the reconstruction real
    sel = jnp.concatenate([sel, jnp.conj(sel)], axis=-1)
    fsel = jnp.concatenate([fsel, -fsel], axis=-1)  # [B, D, 2k]
    tv = jnp.arange(t + pred_len, dtype=jnp.float32)
    amp_s = jnp.abs(sel) / t
    phase = jnp.angle(sel)
    wave = amp_s[..., None] * jnp.cos(
        2 * np.pi * fsel[..., None] * tv + phase[..., None]
    )  # [B, D, 2k, T+pred]
    return jnp.sum(wave, axis=2).transpose(0, 2, 1)


def etsformer_init(cfg: ETSformerConfig, key: jax.Array) -> Dict[str, Any]:
    ks = iter(jax.random.split(key, 4 + 6 * cfg.e_layers))
    hd = cfg.d_model // cfg.n_heads
    params: Dict[str, Any] = {
        "embed": _tst.init(cfg.enc_embed, next(ks)),
        "pred": _linear_init(next(ks), cfg.d_model, cfg.c_out),
    }
    layers = []
    for _ in range(cfg.e_layers):
        kk = jax.random.split(next(ks), 8)
        layers.append({
            "growth": {
                "in": _linear_init(kk[0], cfg.d_model, cfg.d_model),
                "out": _linear_init(kk[1], cfg.d_model, cfg.d_model),
                "z0": jax.random.normal(kk[2], (cfg.n_heads, hd)),
                "es": _es_init(kk[3], cfg.n_heads, hd),
            },
            "level_es": _es_init(kk[4], cfg.c_out, 1),
            "level_gp": _linear_init(kk[5], cfg.d_model, cfg.c_out),
            "level_sp": _linear_init(kk[6], cfg.d_model, cfg.c_out),
            "ff1": _linear_init(kk[7], cfg.d_model, cfg.d_ff, bias=False),
            "ff2": _linear_init(
                jax.random.split(kk[7])[0], cfg.d_ff, cfg.d_model, bias=False
            ),
            "ln1_scale": jnp.ones((cfg.d_model,)),
            "ln1_bias": jnp.zeros((cfg.d_model,)),
            "ln2_scale": jnp.ones((cfg.d_model,)),
            "ln2_bias": jnp.zeros((cfg.d_model,)),
            "damping": jax.random.normal(
                jax.random.split(kk[2])[0], (1, cfg.n_heads)
            ),
        })
    params["layers"] = layers
    return params


@functools.partial(jax.jit, static_argnames=("cfg",))
def etsformer_forecast(
    params: Dict[str, Any],
    x_enc: jax.Array,
    x_mark_enc: jax.Array,
    cfg: ETSformerConfig,
) -> jax.Array:
    """-> [B, pred_len, c_out] (Model.forecast; the train-time jitter
    Transform is a data augmentation, not part of the eval path)."""
    mm = jax.lax.Precision.HIGHEST
    b = x_enc.shape[0]
    res = _tst.apply(params["embed"], x_enc, cfg.enc_embed, x_mark_enc, mm)
    level = x_enc  # [B, T, c_out]
    growths, seasons = [], []
    for lp in params["layers"]:
        season = ets_fourier_layer(res, cfg.pred_len, cfg.top_k)
        res = res - season[:, : -cfg.pred_len]
        growth = ets_growth_layer(lp["growth"], res, cfg.n_heads, mm)
        res = _ln_plain(res - growth[:, 1:], lp["ln1_scale"], lp["ln1_bias"])
        y = _lin(lp["ff2"], jax.nn.sigmoid(_lin(lp["ff1"], res, mm)), mm)
        res = _ln_plain(res + y, lp["ln2_scale"], lp["ln2_bias"])
        # LevelLayer: per-channel ES of (level - season_pred) + growth aux
        gp = _lin(lp["level_gp"], growth[:, :-1], mm)[..., None]  # [B,T,c,1]
        sp = _lin(lp["level_sp"], season[:, : -cfg.pred_len], mm)[..., None]
        lv = level[..., None]
        level = _es_apply(lp["level_es"], lv - sp, aux=gp)[..., 0]
        growths.append(growth)
        seasons.append(season)

    # Decoder: damped growth horizon + seasonal horizon per layer
    g_repr, s_repr = 0.0, 0.0
    for lp, growth, season in zip(params["layers"], growths, seasons):
        df = jax.nn.sigmoid(lp["damping"][0])  # [H]
        powers = jnp.arange(1, cfg.pred_len + 1, dtype=jnp.float32)
        factors = jnp.cumsum(df[None, :] ** powers[:, None], axis=0)  # [P,H]
        h = lp["damping"].shape[1]
        g_last = growth[:, -1:].reshape(b, 1, h, -1)
        g_repr = g_repr + (g_last * factors[None, :, :, None]).reshape(
            b, cfg.pred_len, -1
        )
        s_repr = s_repr + season[:, -cfg.pred_len:]
    preds = (
        level[:, -1:]
        + _lin(params["pred"], g_repr, mm)
        + _lin(params["pred"], s_repr, mm)
    )
    return preds


# ===========================================================================
# MICN (models/MICN.py) — multi-scale isometric convolution over the
# seasonal component + linear trend regression.
# ===========================================================================


@dataclasses.dataclass(frozen=True)
class MICNConfig:
    seq_len: int = 96
    pred_len: int = 96
    enc_in: int = 7
    c_out: int = 7
    d_model: int = 64
    d_layers: int = 1
    conv_kernels: Tuple[int, ...] = (12, 16)
    freq: str = "h"

    @property
    def decomp_kernels(self) -> Tuple[int, ...]:
        return tuple(k + 1 if k % 2 == 0 else k for k in self.conv_kernels)

    @property
    def iso_kernels(self) -> Tuple[int, ...]:
        t = self.seq_len + self.pred_len
        return tuple(
            (t + k) // k if k % 2 == 0 else (t + k - 1) // k
            for k in self.conv_kernels
        )

    @property
    def dec_embed(self):
        return _tst.TimeSeriesConfig(
            c_in=self.enc_in, dim=self.d_model, freq=self.freq,
            embed_type="timeF", use_pos=True,
        )


def series_decomp_multi(x: jax.Array, kernels) -> tuple:
    """Average of per-kernel decompositions (Autoformer_EncDec.py:56-76)."""
    seas, trends = [], []
    for k in kernels:
        s, t = series_decomp(x, k)
        seas.append(s)
        trends.append(t)
    return sum(seas) / len(seas), sum(trends) / len(trends)


def _conv1d_init(key, k, cin, cout):
    return {
        "w": jax.random.normal(key, (k, cin, cout)) * np.sqrt(1.0 / (k * cin)),
        "b": jnp.zeros((cout,)),
    }


def _conv1d(x, p, stride=1, padding=0, mm=jax.lax.Precision.HIGHEST):
    """x [B, L, C] 'NWC' conv."""
    out = jax.lax.conv_general_dilated(
        x, p["w"], (stride,), [(padding, padding)],
        dimension_numbers=("NWC", "WIO", "NWC"), precision=mm,
    )
    return out + p["b"]


def _conv1d_transpose(x, p, stride, mm=jax.lax.Precision.HIGHEST):
    out = jax.lax.conv_transpose(
        x, p["w"], (stride,), "VALID",
        dimension_numbers=("NWC", "WIO", "NWC"), precision=mm,
    )
    return out + p["b"]


def micn_init(cfg: MICNConfig, key: jax.Array) -> Dict[str, Any]:
    ks = iter(jax.random.split(key, 4 + 8 * cfg.d_layers * len(cfg.conv_kernels)))
    d = cfg.d_model
    params: Dict[str, Any] = {
        "embed": _tst.init(cfg.dec_embed, next(ks)),
        # trend regression initialized to the mean predictor (MICN.py:146-148)
        "regression": {
            "w": jnp.full((cfg.seq_len, cfg.pred_len), 1.0 / cfg.pred_len),
            "b": jnp.zeros((cfg.pred_len,)),
        },
        "proj": _linear_init(next(ks), d, cfg.c_out),
    }
    layers = []
    for _ in range(cfg.d_layers):
        branches = []
        for ck, ik in zip(cfg.conv_kernels, cfg.iso_kernels):
            kk = jax.random.split(next(ks), 3)
            branches.append({
                "down": _conv1d_init(kk[0], ck, d, d),
                "iso": _conv1d_init(kk[1], ik, d, d),
                "up": _conv1d_init(kk[2], ck, d, d),
            })
        kk = jax.random.split(next(ks), 3)
        layers.append({
            "branches": branches,
            "merge": _conv1d_init(kk[0], len(cfg.conv_kernels), d, d),
            "ff1": _conv1d_init(kk[1], 1, d, 4 * d),
            "ff2": _conv1d_init(kk[2], 1, 4 * d, d),
            "ln_scale": jnp.ones((d,)), "ln_bias": jnp.zeros((d,)),
            "ln1_scale": jnp.ones((d,)), "ln1_bias": jnp.zeros((d,)),
            "ln2_scale": jnp.ones((d,)), "ln2_bias": jnp.zeros((d,)),
        })
    params["layers"] = layers
    return params


def _mic_layer(lp, x, cfg: MICNConfig, mm):
    """One MIC layer (MICN.py:49-89): per-scale decomp ->
    down-conv -> isometric conv -> transpose-conv up -> merge -> FFN."""
    outs = []
    for br, ck, dk in zip(lp["branches"], cfg.conv_kernels, cfg.decomp_kernels):
        src, _ = series_decomp(x, dk)
        t = src.shape[1]
        h1 = jnp.tanh(_conv1d(src, br["down"], stride=ck, padding=ck // 2, mm=mm))
        # isometric: causal full-length kernel over left-zero-padded input
        li = h1.shape[1]
        hp = jnp.pad(h1, ((0, 0), (li - 1, 0), (0, 0)))
        h2 = jnp.tanh(_conv1d(hp, br["iso"], mm=mm))
        h = _ln_plain(h2 + h1, lp["ln_scale"], lp["ln_bias"])
        h = jnp.tanh(_conv1d_transpose(h, br["up"], ck, mm=mm))[:, :t]
        outs.append(_ln_plain(h + src, lp["ln_scale"], lp["ln_bias"]))
    mg = jnp.stack(outs, axis=1)  # [B, S, L, D]
    # merge: conv2d over the scale axis == weighted sum via the S-tap conv
    w = lp["merge"]["w"]  # [S, D, D]
    mg = jnp.einsum("bsld,sde->ble", mg, w, precision=mm) + lp["merge"]["b"]
    y = _ln_plain(mg, lp["ln1_scale"], lp["ln1_bias"])
    y2 = _conv1d(jax.nn.relu(_conv1d(y, lp["ff1"], mm=mm)), lp["ff2"], mm=mm)
    return _ln_plain(mg + y2, lp["ln2_scale"], lp["ln2_bias"])


@functools.partial(jax.jit, static_argnames=("cfg",))
def micn_forecast(
    params: Dict[str, Any],
    x_enc: jax.Array,
    x_mark_dec: jax.Array,  # [B, seq_len+pred_len, n_timef]
    cfg: MICNConfig,
) -> jax.Array:
    """-> [B, pred_len, c_out] (Model.forecast)."""
    mm = jax.lax.Precision.HIGHEST
    b = x_enc.shape[0]
    seasonal, trend = series_decomp_multi(x_enc, cfg.decomp_kernels)
    trend = jnp.einsum(
        "blc,lp->bpc", trend, params["regression"]["w"], precision=mm
    ) + params["regression"]["b"][None, :, None]
    dec_in = jnp.concatenate(
        [seasonal, jnp.zeros((b, cfg.pred_len, cfg.enc_in), x_enc.dtype)], 1
    )
    h = _tst.apply(params["embed"], dec_in, cfg.dec_embed, x_mark_dec, mm)
    for lp in params["layers"]:
        h = _mic_layer(lp, h, cfg, mm)
    out = _lin(params["proj"], h, mm)
    return out[:, -cfg.pred_len:] + trend[:, -cfg.pred_len:]


# ===========================================================================
# FiLM (models/FiLM.py) — HiPPO-LegT Legendre memory + frequency-enhanced
# low-rank mixing, multiscale, with non-stationary normalization.
# ===========================================================================


def _hippo_legt_mats(n: int, dt: float):
    """Bilinear-discretized LegT (A, B) + Legendre eval matrix
    (FiLM.py transition/HiPPO_LegT; host-side numpy, stored as buffers)."""
    import scipy.signal
    import scipy.special

    q = np.arange(n, dtype=np.float64)
    r = (2 * q + 1)[:, None]
    j, i = np.meshgrid(q, q)
    a = np.where(i < j, -1, (-1.0) ** (i - j + 1)) * r
    b = (-1.0) ** q[:, None] * r
    c = np.ones((1, n))
    d = np.zeros((1,))
    ad, bd, *_ = scipy.signal.cont2discrete((a, b, c, d), dt=dt, method="bilinear")
    vals = np.arange(0.0, 1.0, dt)
    eval_matrix = scipy.special.eval_legendre(
        np.arange(n)[:, None], 1 - 2 * vals
    ).T  # [T_eval, N]
    return (
        ad.astype(np.float32),
        bd.squeeze(-1).astype(np.float32),
        eval_matrix.astype(np.float32),
    )


@dataclasses.dataclass(frozen=True)
class FiLMConfig:
    seq_len: int = 96
    pred_len: int = 96
    enc_in: int = 7
    hippo_n: int = 256  # window_size
    multiscale: Tuple[int, ...] = (1, 2, 4)
    modes: int = 32

    @property
    def n_branches(self) -> int:
        return len(self.multiscale)


def film_init(cfg: FiLMConfig, key: jax.Array) -> Dict[str, Any]:
    ks = iter(jax.random.split(key, 2 + 2 * cfg.n_branches))
    n = cfg.hippo_n
    modes = min(cfg.modes, min(cfg.pred_len, cfg.seq_len) // 2)
    params: Dict[str, Any] = {
        "affine_w": jnp.ones((1, 1, cfg.enc_in)),
        "affine_b": jnp.zeros((1, 1, cfg.enc_in)),
        "mlp": _linear_init(next(ks), cfg.n_branches, 1),
    }
    branches = []
    for i in cfg.multiscale:
        ad, bd, ev = _hippo_legt_mats(n, 1.0 / cfg.pred_len / i)
        k1, k2 = jax.random.split(next(ks))
        scale = 1.0 / (n * n)
        branches.append({
            "A": jnp.asarray(ad), "B": jnp.asarray(bd),
            "eval": jnp.asarray(ev),
            "w_re": jax.random.uniform(k1, (n, n, modes)) * scale,
            "w_im": jax.random.uniform(k2, (n, n, modes)) * scale,
        })
    params["branches"] = branches
    return params


def _legt_scan(br, x):
    """HiPPO-LegT recurrence c[t] = c[t-1] A^T + f[t] B -> [B, E, N, T]."""
    b, e, t = x.shape
    n = br["A"].shape[0]

    def step(c, f):  # c [B, E, N]; f [B, E]
        c = c @ br["A"].T + f[..., None] * br["B"][None, None, :]
        return c, c

    c0 = jnp.zeros((b, e, n), x.dtype)
    _, cs = jax.lax.scan(step, c0, x.transpose(2, 0, 1))  # [T, B, E, N]
    return cs.transpose(1, 2, 3, 0)


def _spectral_conv(br, x, modes):
    """SpectralConv1d (FiLM.py:59-88): rfft over T, complex linear map on
    the lowest modes over the HiPPO order axis. x [B, E, N, T]."""
    t = x.shape[-1]
    xf = jnp.fft.rfft(x)  # [B, E, N, F]
    a = xf[..., :modes]
    re, im = _cmul(a.real, a.imag, br["w_re"], br["w_im"], "bjix,iox->bjox")
    out = jnp.zeros(x.shape[:2] + (br["w_re"].shape[1], t // 2 + 1), jnp.complex64)
    out = out.at[..., :modes].set(re + 1j * im)
    return jnp.fft.irfft(out, n=t)


@functools.partial(jax.jit, static_argnames=("cfg",))
def film_forecast(
    params: Dict[str, Any], x_enc: jax.Array, cfg: FiLMConfig
) -> jax.Array:
    """-> [B, pred_len, enc_in] (Model.forecast)."""
    mm = jax.lax.Precision.HIGHEST
    means = jnp.mean(x_enc, 1, keepdims=True)
    xc = x_enc - means
    stdev = jnp.sqrt(jnp.var(xc, axis=1, keepdims=True) + 1e-5)
    xc = xc / stdev
    xc = xc * params["affine_w"] + params["affine_b"]
    modes = min(cfg.modes, min(cfg.pred_len, cfg.seq_len) // 2)

    outs = []
    for scale, br in zip(cfg.multiscale, params["branches"]):
        x_in = xc[:, -scale * cfg.pred_len:]
        c = _legt_scan(br, x_in.transpose(0, 2, 1))  # [B, E, N, T]
        o = _spectral_conv(br, c, modes)
        if cfg.seq_len >= cfg.pred_len:
            sel = o[..., cfg.pred_len - 1]  # [B, E, N]
        else:
            sel = o[..., -1]
        dec = jnp.einsum(
            "ben,pn->bep", sel, br["eval"][-cfg.pred_len:], precision=mm
        )
        outs.append(dec)
    x_dec = jnp.stack(outs, axis=-1)  # [B, E, P, S]
    x_dec = _lin(params["mlp"], x_dec, mm)[..., 0].transpose(0, 2, 1)
    x_dec = (x_dec - params["affine_b"]) / (params["affine_w"] + 1e-10)
    return x_dec * stdev + means


# ===========================================================================
# Pyraformer (models/Pyraformer.py + layers/Pyraformer_EncDec.py) —
# pyramidal attention over a multi-resolution token tree.
# ===========================================================================


@dataclasses.dataclass(frozen=True)
class PyraformerConfig:
    seq_len: int = 96
    pred_len: int = 96
    enc_in: int = 7
    d_model: int = 64
    n_heads: int = 4
    d_ff: int = 128
    e_layers: int = 2
    window_sizes: Tuple[int, ...] = (4, 4)
    inner_size: int = 5
    freq: str = "h"

    @property
    def all_sizes(self) -> Tuple[int, ...]:
        sizes = [self.seq_len]
        for w in self.window_sizes:
            sizes.append(sizes[-1] // w)
        return tuple(sizes)

    @property
    def enc_embed(self):
        return _tst.TimeSeriesConfig(
            c_in=self.enc_in, dim=self.d_model, freq=self.freq,
            embed_type="timeF", use_pos=True,
        )


def pyraformer_mask(cfg: PyraformerConfig) -> np.ndarray:
    """PAM-Naive attention mask (Pyraformer_EncDec.get_mask): True =
    masked. Intra-scale neighbourhood + inter-scale parent/child links."""
    sizes = cfg.all_sizes
    total = sum(sizes)
    mask = np.zeros((total, total), bool)
    inner = cfg.inner_size // 2
    for li, sz in enumerate(sizes):
        start = sum(sizes[:li])
        for i in range(start, start + sz):
            lo = max(i - inner, start)
            hi = min(i + inner + 1, start + sz)
            mask[i, lo:hi] = True
    for li in range(1, len(sizes)):
        start = sum(sizes[:li])
        w = cfg.window_sizes[li - 1]
        for i in range(start, start + sizes[li]):
            lo = (start - sizes[li - 1]) + (i - start) * w
            if i == start + sizes[li] - 1:
                hi = start
            else:
                hi = (start - sizes[li - 1]) + (i - start + 1) * w
            mask[i, lo:hi] = True
            mask[lo:hi, i] = True
    return ~mask


def pyraformer_refer_points(cfg: PyraformerConfig) -> np.ndarray:
    """Per input position, its node index at every scale -> [T, L+1]."""
    sizes = cfg.all_sizes
    idx = np.zeros((sizes[0], len(sizes)), np.int64)
    for i in range(sizes[0]):
        idx[i][0] = i
        former = i
        for j in range(1, len(sizes)):
            start = sum(sizes[:j])
            inner_idx = former - (start - sizes[j - 1])
            former = start + min(inner_idx // cfg.window_sizes[j - 1], sizes[j] - 1)
            idx[i][j] = former
    return idx


def pyraformer_init(cfg: PyraformerConfig, key: jax.Array) -> Dict[str, Any]:
    ks = iter(jax.random.split(key, 8 + 3 * cfg.e_layers))
    d = cfg.d_model
    db = d // 4
    params: Dict[str, Any] = {
        "embed": _tst.init(cfg.enc_embed, next(ks)),
        "down": _linear_init(next(ks), d, db),
        "up": _linear_init(next(ks), db, d),
        "cscm_ln_scale": jnp.ones((d,)),
        "cscm_ln_bias": jnp.zeros((d,)),
        "convs": [
            _conv1d_init(next(ks), w, db, db) for w in cfg.window_sizes
        ],
        "proj": _linear_init(
            next(ks), (len(cfg.window_sizes) + 1) * d,
            cfg.pred_len * cfg.enc_in,
        ),
    }
    layers = []
    for _ in range(cfg.e_layers):
        kk = jax.random.split(next(ks), 3)
        layers.append({
            "attn": _attn_layer_init(kk[0], d, cfg.n_heads),
            "ff1": _linear_init(kk[1], d, cfg.d_ff),
            "ff2": _linear_init(kk[2], cfg.d_ff, d),
            "ln1_scale": jnp.ones((d,)), "ln1_bias": jnp.zeros((d,)),
            "ln2_scale": jnp.ones((d,)), "ln2_bias": jnp.zeros((d,)),
        })
    params["layers"] = layers
    return params


@functools.partial(jax.jit, static_argnames=("cfg",))
def pyraformer_forecast(
    params: Dict[str, Any],
    x_enc: jax.Array,
    x_mark_enc: jax.Array,
    cfg: PyraformerConfig,
) -> jax.Array:
    """-> [B, pred_len, enc_in] (Model.long_forecast: last pyramid node's
    concatenated multi-scale features project to the whole horizon)."""
    mm = jax.lax.Precision.HIGHEST
    b = x_enc.shape[0]
    h = _tst.apply(params["embed"], x_enc, cfg.enc_embed, x_mark_enc, mm)

    # Bottleneck_Construct: ELU(BN(conv)) chain on down-projected tokens
    tmp = _lin(params["down"], h, mm)
    coarse = []
    for p, w in zip(params["convs"], cfg.window_sizes):
        tmp = _conv1d(tmp, p, stride=w, mm=mm)
        mu = jnp.mean(tmp, axis=(0, 1), keepdims=True)
        var = jnp.var(tmp, axis=(0, 1), keepdims=True)
        tmp = jax.nn.elu((tmp - mu) * jax.lax.rsqrt(var + 1e-5))
        coarse.append(tmp)
    up = _lin(params["up"], jnp.concatenate(coarse, axis=1), mm)
    seq = jnp.concatenate([h, up], axis=1)
    seq = _ln_plain(seq, params["cscm_ln_scale"], params["cscm_ln_bias"])

    neg = jnp.asarray(~pyraformer_mask(cfg))  # True = masked
    for lp in params["layers"]:
        q, k, v = _proj_qkv(lp["attn"], seq, seq, seq, cfg.n_heads, mm)
        e = q.shape[-1]
        s = jnp.einsum("blhe,bshe->bhls", q, k, precision=mm) / np.sqrt(e)
        s = jnp.where(neg[None, None], -jnp.inf, s)
        a = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhls,bshe->blhe", a, v, precision=mm)
        o = _lin(lp["attn"]["o"], o.reshape(seq.shape), mm)
        seq = seq + o
        y = _lin(lp["ff2"], jax.nn.gelu(_lin(lp["ff1"], seq, mm)), mm)
        seq = _ln_plain(seq + y, lp["ln2_scale"], lp["ln2_bias"])

    refs = jnp.asarray(pyraformer_refer_points(cfg))  # [T, L+1]
    gathered = seq[:, refs]  # [B, T, L+1, D]
    feats = gathered.reshape(b, cfg.seq_len, -1)
    out = _lin(params["proj"], feats[:, -1], mm)
    return out.reshape(b, cfg.pred_len, cfg.enc_in)


# ===========================================================================
# Reformer (models/Reformer.py; LSH attention per reformer_pytorch's
# LSHSelfAttention) — shared-QK LSH bucketing + chunked attention.
# ===========================================================================


@dataclasses.dataclass(frozen=True)
class ReformerConfig:
    seq_len: int = 96
    pred_len: int = 96
    enc_in: int = 7
    c_out: int = 7
    d_model: int = 64
    n_heads: int = 4
    d_ff: int = 128
    e_layers: int = 2
    bucket_size: int = 4
    n_hashes: int = 4
    freq: str = "h"

    @property
    def enc_embed(self):
        return _tst.TimeSeriesConfig(
            c_in=self.enc_in, dim=self.d_model, freq=self.freq,
            embed_type="timeF", use_pos=True,
        )


def lsh_attention(
    qk: jax.Array,  # [B, T, H, E] (shared query/key, Reformer-style)
    v: jax.Array,  # [B, T, H, E]
    n_hashes: int,
    bucket_size: int,
    key: jax.Array,
):
    """LSH attention: random-rotation bucketing, sort, attend within
    chunks of 2*bucket_size with one-chunk lookback, combine hash rounds
    by their softmax log-denominators. Deterministic given `key` (the
    reference's rotations are fresh randomness per call; here they come
    from a PRNG key so runs are reproducible)."""
    b, t, h, e = qk.shape
    chunk = bucket_size * 2
    assert t % chunk == 0
    n_chunks = t // chunk
    n_buckets = max(2, t // bucket_size)
    qk_n = qk / jnp.maximum(jnp.linalg.norm(qk, axis=-1, keepdims=True), 1e-6)

    outs, lses = [], []
    for r in range(n_hashes):
        rk = jax.random.fold_in(key, r)
        rot = jax.random.normal(rk, (h, e, n_buckets // 2))
        proj = jnp.einsum("bthe,hef->bthf", qk_n, rot)
        buckets = jnp.argmax(
            jnp.concatenate([proj, -proj], axis=-1), axis=-1
        )  # [B, T, H]
        # sort positions by (bucket, position)
        sortkey = buckets * (t + 1) + jnp.arange(t)[None, :, None]
        order = jnp.argsort(sortkey, axis=1)  # [B, T, H]
        inv = jnp.argsort(order, axis=1)
        take = lambda x, o: jnp.take_along_axis(x, o[..., None], axis=1)
        sq = take(qk, order)
        sv = take(v, order)
        cq = sq.reshape(b, n_chunks, chunk, h, e)
        ck = jnp.concatenate(
            [jnp.roll(cq, 1, axis=1), cq], axis=2
        )  # lookback one chunk -> [B, C, 2*chunk, H, E]
        cv = jnp.concatenate(
            [jnp.roll(sv.reshape(b, n_chunks, chunk, h, e), 1, axis=1),
             sv.reshape(b, n_chunks, chunk, h, e)], axis=2,
        )
        s = jnp.einsum("bcihe,bcjhe->bchij", cq, ck) / np.sqrt(e)
        # discourage self-attention (reformer masks i==j with -1e5)
        eye = jnp.eye(chunk, dtype=bool)
        self_mask = jnp.concatenate(
            [jnp.zeros((chunk, chunk), bool), eye], axis=-1
        )
        s = jnp.where(self_mask[None, None, None], s - 1e5, s)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.einsum("bchij,bcjhe->bcihe", p / l, cv)
        o = o.reshape(b, t, h, e)
        lse = (m + jnp.log(l))[..., 0].transpose(0, 1, 3, 2).reshape(b, t, h)
        outs.append(take(o, inv))
        lses.append(jnp.take_along_axis(lse, inv, axis=1))
    outs = jnp.stack(outs)  # [R, B, T, H, E]
    lses = jnp.stack(lses)  # [R, B, T, H]
    w = jax.nn.softmax(lses, axis=0)[..., None]
    return jnp.sum(outs * w, axis=0)


def reformer_init(cfg: ReformerConfig, key: jax.Array) -> Dict[str, Any]:
    ks = iter(jax.random.split(key, 4 + 4 * cfg.e_layers))
    d = cfg.d_model
    params: Dict[str, Any] = {
        "embed": _tst.init(cfg.enc_embed, next(ks)),
        "norm_scale": jnp.ones((d,)),
        "norm_bias": jnp.zeros((d,)),
        "proj": _linear_init(next(ks), d, cfg.c_out),
    }
    layers = []
    for _ in range(cfg.e_layers):
        kk = jax.random.split(next(ks), 4)
        layers.append({
            "qk": _linear_init(kk[0], d, d, bias=False),
            "v": _linear_init(kk[1], d, d, bias=False),
            "o": _linear_init(kk[2], d, d),
            "ff1": _linear_init(kk[3], d, cfg.d_ff),
            "ff2": _linear_init(jax.random.split(kk[3])[0], cfg.d_ff, d),
            "ln1_scale": jnp.ones((d,)), "ln1_bias": jnp.zeros((d,)),
            "ln2_scale": jnp.ones((d,)), "ln2_bias": jnp.zeros((d,)),
        })
    params["layers"] = layers
    return params


@functools.partial(jax.jit, static_argnames=("cfg",))
def reformer_forecast(
    params: Dict[str, Any],
    x_enc: jax.Array,
    x_mark_enc: jax.Array,
    cfg: ReformerConfig,
    rng: jax.Array = None,
) -> jax.Array:
    """-> [B, pred_len, c_out] (Model.long_forecast: placeholder tokens
    appended for the horizon, encoder-only, per-token projection)."""
    mm = jax.lax.Precision.HIGHEST
    b = x_enc.shape[0]
    if rng is None:
        rng = jax.random.PRNGKey(0)
    x = jnp.concatenate(
        [x_enc, jnp.zeros((b, cfg.pred_len, cfg.enc_in), x_enc.dtype)], 1
    )
    marks = jnp.concatenate(
        [x_mark_enc,
         jnp.zeros((b, cfg.pred_len, x_mark_enc.shape[-1]), x_mark_enc.dtype)],
        1,
    )
    h = _tst.apply(params["embed"], x, cfg.enc_embed, marks, mm)
    t = h.shape[1]
    chunk = cfg.bucket_size * 2
    pad = (-t) % chunk
    for li, lp in enumerate(params["layers"]):
        hp = jnp.pad(h, ((0, 0), (0, pad), (0, 0))) if pad else h
        qk = _lin(lp["qk"], hp, mm).reshape(b, t + pad, cfg.n_heads, -1)
        v = _lin(lp["v"], hp, mm).reshape(b, t + pad, cfg.n_heads, -1)
        a = lsh_attention(
            qk, v, cfg.n_hashes, cfg.bucket_size, jax.random.fold_in(rng, li)
        )
        a = a.reshape(b, t + pad, -1)[:, :t]
        h = _ln_plain(h + _lin(lp["o"], a, mm), lp["ln1_scale"], lp["ln1_bias"])
        y = _lin(lp["ff2"], jax.nn.relu(_lin(lp["ff1"], h, mm)), mm)
        h = _ln_plain(h + y, lp["ln2_scale"], lp["ln2_bias"])
    h = _ln_plain(h, params["norm_scale"], params["norm_bias"])
    out = _lin(params["proj"], h, mm)
    return out[:, -cfg.pred_len:]

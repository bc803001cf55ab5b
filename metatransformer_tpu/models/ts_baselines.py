"""Time-series baseline models (Time-Series-Library parity).

The reference vendors 15 baselines alongside its MetaTransformer model
(``Time-Series/models/``); the two most load-bearing are implemented
natively: DLinear (decomposition + per-channel linear) and PatchTST
(channel-independent patch transformer). The vanilla Transformer is
``models.time_series`` itself.
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

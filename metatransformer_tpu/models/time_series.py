"""Time-series Meta-Transformer: frozen encoder + trainable decoder.

Reference: ``Time-Series/models/MetaTransformer.py:10-132`` — DataEmbedding
enc/dec embeddings (d_model forced to 768), frozen 12-block encoder, a
vanilla transformer decoder (causal self-attn + cross-attn + k=1-conv FFN,
Time-Series-Library ``Transformer_EncDec.DecoderLayer``) and per-task
dispatch: long/short-term forecast, imputation, anomaly detection,
classification.

Fidelity notes: the reference's imputation/anomaly/classification branches
call ``self.encoder(x, attn_mask=None)`` and unpack two values — that
crashes on ``nn.Sequential`` (latent bug); we implement the documented
intent (run the frozen encoder). Classification: GELU -> zero-out padding
via x_mark -> flatten -> linear, as in the reference.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from metatransformer_tpu.core import encoder as enc
from metatransformer_tpu.tokenizers import time_series as ts_tok


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    dim: int = 768
    d_ff: int = 2048
    num_heads: int = 8
    depth: int = 1
    activation: str = "gelu"  # "gelu" | "relu"
    ln_eps: float = 1e-5  # torch nn.LayerNorm default


@dataclasses.dataclass(frozen=True)
class TimeSeriesModelConfig:
    task: str = "long_term_forecast"
    pred_len: int = 96
    seq_len: int = 96
    enc_in: int = 7
    dec_in: int = 7
    c_out: int = 7
    num_classes: int = 0
    embed_type: str = "fixed"
    freq: str = "h"
    encoder: enc.EncoderConfig = enc.BASE
    decoder: DecoderConfig = DecoderConfig()

    @property
    def enc_embedding(self) -> ts_tok.TimeSeriesConfig:
        return ts_tok.TimeSeriesConfig(
            c_in=self.enc_in, dim=self.encoder.dim,
            embed_type=self.embed_type, freq=self.freq,
        )

    @property
    def dec_embedding(self) -> ts_tok.TimeSeriesConfig:
        return ts_tok.TimeSeriesConfig(
            c_in=self.dec_in, dim=self.encoder.dim,
            embed_type=self.embed_type, freq=self.freq,
        )


def _mha(x, kv, p, prefix, num_heads, causal, mm):
    """AttentionLayer+FullAttention: per-head scale 1/sqrt(hd), fp32 softmax."""
    b, tq, d = x.shape
    tk = kv.shape[1]
    hd = d // num_heads
    q = (jnp.dot(x, p[f"{prefix}_q_w"], precision=mm) + p[f"{prefix}_q_b"]).reshape(
        b, tq, num_heads, hd
    )
    k = (jnp.dot(kv, p[f"{prefix}_k_w"], precision=mm) + p[f"{prefix}_k_b"]).reshape(
        b, tk, num_heads, hd
    )
    v = (jnp.dot(kv, p[f"{prefix}_v_w"], precision=mm) + p[f"{prefix}_v_b"]).reshape(
        b, tk, num_heads, hd
    )
    logits = jnp.einsum(
        "bthd,bshd->bhts", q * (hd**-0.5), k,
        preferred_element_type=jnp.float32, precision=mm,
    )
    if causal:
        tri = jnp.tril(jnp.ones((tq, tk), bool))
        logits = jnp.where(tri[None, None], logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhts,bshd->bthd", probs, v, precision=mm).reshape(b, tq, d)
    return jnp.dot(out, p[f"{prefix}_o_w"], precision=mm) + p[f"{prefix}_o_b"]


def _decoder_layer(x, cross, p, cfg: DecoderConfig, mm, causal: bool = True):
    ln = lambda h, n: enc.layer_norm(h, p[f"{n}_scale"], p[f"{n}_bias"], cfg.ln_eps)
    x = x + _mha(x, x, p, "self", cfg.num_heads, causal, mm)
    x = ln(x, "norm1")
    x = x + _mha(x, cross, p, "cross", cfg.num_heads, False, mm)
    y = x = ln(x, "norm2")
    act = jax.nn.gelu if cfg.activation == "gelu" else jax.nn.relu
    y = act(jnp.dot(y, p["ff1_w"], precision=mm) + p["ff1_b"])
    y = jnp.dot(y, p["ff2_w"], precision=mm) + p["ff2_b"]
    return ln(x + y, "norm3")


def _decoder_layer_shapes(cfg: DecoderConfig) -> Dict[str, tuple]:
    d, f = cfg.dim, cfg.d_ff
    shapes = {}
    for pre in ("self", "cross"):
        for proj in ("q", "k", "v", "o"):
            shapes[f"{pre}_{proj}_w"] = (d, d)
            shapes[f"{pre}_{proj}_b"] = (d,)
    shapes.update(
        ff1_w=(d, f), ff1_b=(f,), ff2_w=(f, d), ff2_b=(d,),
        norm1_scale=(d,), norm1_bias=(d,), norm2_scale=(d,), norm2_bias=(d,),
        norm3_scale=(d,), norm3_bias=(d,),
    )
    return shapes


def init(cfg: TimeSeriesModelConfig, key: jax.Array) -> Dict[str, Any]:
    keys = jax.random.split(key, 6)
    d = cfg.encoder.dim
    params: Dict[str, Any] = {
        "enc_embedding": ts_tok.init(cfg.enc_embedding, keys[0]),
        "encoder": enc.init(cfg.encoder, keys[1]),
    }
    if cfg.task in ("long_term_forecast", "short_term_forecast"):
        params["dec_embedding"] = ts_tok.init(cfg.dec_embedding, keys[2])
        shapes = _decoder_layer_shapes(cfg.decoder)
        lkeys = jax.random.split(keys[3], len(shapes))
        dec = {}
        for (name, shape), k in zip(shapes.items(), lkeys):
            full = (cfg.decoder.depth,) + shape
            if name.endswith("_w"):
                dec[name] = jax.random.normal(k, full) * (shape[0] ** -0.5)
            elif "scale" in name:
                dec[name] = jnp.ones(full)
            else:
                dec[name] = jnp.zeros(full)
        params["decoder"] = dec
        params["dec_norm_scale"] = jnp.ones((d,))
        params["dec_norm_bias"] = jnp.zeros((d,))
        params["proj_w"] = jax.random.normal(keys[4], (d, cfg.c_out)) * d**-0.5
        params["proj_b"] = jnp.zeros((cfg.c_out,))
    elif cfg.task in ("imputation", "anomaly_detection"):
        params["proj_w"] = jax.random.normal(keys[4], (d, cfg.c_out)) * d**-0.5
        params["proj_b"] = jnp.zeros((cfg.c_out,))
    elif cfg.task == "classification":
        in_dim = d * cfg.seq_len
        params["proj_w"] = jax.random.normal(keys[4], (in_dim, cfg.num_classes)) * (
            in_dim**-0.5
        )
        params["proj_b"] = jnp.zeros((cfg.num_classes,))
    else:
        raise ValueError(f"unknown task {cfg.task!r}")
    return params


def _encode(params, x_enc, x_mark_enc, cfg, precision):
    emb = ts_tok.apply(
        params["enc_embedding"], x_enc, cfg.enc_embedding, x_mark_enc, precision.mm
    )
    return enc.encode(params["encoder"], emb, cfg.encoder, precision=precision)


def _decode(params, dec_emb, cross, cfg, precision):
    def body(carry, layer_params):
        return _decoder_layer(carry, cross, layer_params, cfg.decoder, precision.mm), None

    x, _ = jax.lax.scan(body, dec_emb, params["decoder"])
    x = enc.layer_norm(x, params["dec_norm_scale"], params["dec_norm_bias"],
                       cfg.decoder.ln_eps)
    return jnp.dot(x, params["proj_w"], precision=precision.mm) + params["proj_b"]


@functools.partial(jax.jit, static_argnames=("cfg", "precision"))
def forward(
    params: Dict[str, Any],
    x_enc: jax.Array,
    cfg: TimeSeriesModelConfig,
    x_mark_enc: Optional[jax.Array] = None,
    x_dec: Optional[jax.Array] = None,
    x_mark_dec: Optional[jax.Array] = None,
    precision: enc.Precision = enc.FP32,
) -> jax.Array:
    if cfg.task in ("long_term_forecast", "short_term_forecast"):
        cross = _encode(params, x_enc, x_mark_enc, cfg, precision)
        dec_emb = ts_tok.apply(
            params["dec_embedding"], x_dec, cfg.dec_embedding, x_mark_dec, precision.mm
        )
        out = _decode(params, dec_emb, cross, cfg, precision)
        return out[:, -cfg.pred_len :, :]
    if cfg.task in ("imputation", "anomaly_detection"):
        h = _encode(params, x_enc, x_mark_enc if cfg.task == "imputation" else None,
                    cfg, precision)
        return jnp.dot(h, params["proj_w"], precision=precision.mm) + params["proj_b"]
    if cfg.task == "classification":
        h = _encode(params, x_enc, None, cfg, precision)
        h = jax.nn.gelu(h, approximate=False)
        if x_mark_enc is not None:  # zero-out padding positions
            h = h * x_mark_enc[..., None].astype(h.dtype)
        h = h.reshape(h.shape[0], -1)
        return jnp.dot(h, params["proj_w"], precision=precision.mm) + params["proj_b"]
    raise ValueError(f"unknown task {cfg.task!r}")

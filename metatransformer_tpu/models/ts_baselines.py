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

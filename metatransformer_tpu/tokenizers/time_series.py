"""Time-series / IMU tokenizer: value + positional + calendar embeddings.

Reference: ``Data2Seq/Time_Series.py`` (172 LoC) — circular Conv1d value
embedding (k=3, no bias), sinusoidal positional embedding, calendar
temporal embedding (fixed-sinusoid or learned tables, or a linear
"timeF" feature embedding), combined by ``DataEmbedding`` /
``DataEmbedding_wo_pos``; plus the PatchTST-style ``PatchEmbedding``.

TPU-native: the k=3 circular conv is an unfold (roll left/right + concat)
followed by one matmul — three shifted views hit the MXU as a single
[B,L,3C]x[3C,D] contraction; no conv layout machinery.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# Calendar vocabulary sizes (month, day, weekday, hour, minute-of-quarter).
MINUTE_SIZE, HOUR_SIZE, WEEKDAY_SIZE, DAY_SIZE, MONTH_SIZE = 4, 24, 7, 32, 13
# timeF input feature count per sampling freq.
FREQ_MAP = {"h": 4, "t": 5, "s": 6, "m": 1, "a": 1, "w": 2, "d": 3, "b": 3}


@dataclasses.dataclass(frozen=True)
class TimeSeriesConfig:
    c_in: int = 1
    dim: int = 768
    embed_type: str = "fixed"  # "fixed" | "learned" | "timeF"
    freq: str = "h"
    use_pos: bool = True  # False = DataEmbedding_wo_pos


def sinusoid_table(n: int, d: int) -> np.ndarray:
    """The transformer sin/cos table used for both positional and fixed
    calendar embeddings (even dims sin, odd dims cos)."""
    pe = np.zeros((n, d), np.float32)
    position = np.arange(n, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d, 2, dtype=np.float32) * -(math.log(10000.0) / d))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe


def init(cfg: TimeSeriesConfig, key: jax.Array) -> Dict[str, jax.Array]:
    k1, k2 = jax.random.split(key)
    params: Dict[str, jax.Array] = {
        # kaiming-normal fan_in leaky_relu as the reference initializes
        "value_w": jax.random.normal(k1, (3 * cfg.c_in, cfg.dim), jnp.float32)
        * math.sqrt(2.0 / (3 * cfg.c_in)),
    }
    if cfg.embed_type == "timeF":
        d_inp = FREQ_MAP[cfg.freq]
        params["timef_w"] = jax.random.normal(k2, (d_inp, cfg.dim)) * d_inp**-0.5
    else:
        sizes = {
            "month": MONTH_SIZE,
            "day": DAY_SIZE,
            "weekday": WEEKDAY_SIZE,
            "hour": HOUR_SIZE,
        }
        if cfg.freq == "t":
            sizes["minute"] = MINUTE_SIZE
        keys = jax.random.split(k2, len(sizes))
        for (name, size), k in zip(sizes.items(), keys):
            if cfg.embed_type == "fixed":
                params[f"{name}_emb"] = jnp.asarray(sinusoid_table(size, cfg.dim))
            else:
                params[f"{name}_emb"] = jax.random.normal(k, (size, cfg.dim)) * 0.02
    return params


def value_embed(
    params: Dict[str, jax.Array],
    x: jax.Array,
    mm: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Circular-conv1d(k=3) value embedding as unfold+matmul.

    x: [B, L, C] -> [B, L, D]. Circular padding means window t sees
    (x[t-1 mod L], x[t], x[t+1 mod L]) — jnp.roll gives exactly that.
    """
    left = jnp.roll(x, 1, axis=1)  # x[t-1], wrapping
    right = jnp.roll(x, -1, axis=1)  # x[t+1], wrapping
    windows = jnp.concatenate([left, x, right], axis=-1)  # (k,c) order
    return jnp.dot(windows, params["value_w"], precision=mm)


def positional_embed(dim: int, length: int) -> jax.Array:
    return jnp.asarray(sinusoid_table(length, dim))[None]


def temporal_embed(
    params: Dict[str, jax.Array],
    x_mark: jax.Array,
    cfg: TimeSeriesConfig,
    mm: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Calendar marks -> [B, L, D].

    Fixed/learned mode: x_mark int [B, L, >=4] columns (month, day,
    weekday, hour[, minute]) — reference column order
    (``Data2Seq/Time_Series.py:85-93``). timeF mode: float features.
    """
    if cfg.embed_type == "timeF":
        return jnp.dot(x_mark, params["timef_w"], precision=mm)
    marks = x_mark.astype(jnp.int32)
    out = (
        params["month_emb"][marks[..., 0]]
        + params["day_emb"][marks[..., 1]]
        + params["weekday_emb"][marks[..., 2]]
        + params["hour_emb"][marks[..., 3]]
    )
    if cfg.freq == "t":
        out = out + params["minute_emb"][marks[..., 4]]
    return out


def apply(
    params: Dict[str, jax.Array],
    x: jax.Array,
    cfg: TimeSeriesConfig,
    x_mark: Optional[jax.Array] = None,
    mm: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """DataEmbedding / DataEmbedding_wo_pos forward. x: [B, L, C]."""
    out = value_embed(params, x, mm)
    if x_mark is not None:
        out = out + temporal_embed(params, x_mark, cfg, mm)
    if cfg.use_pos:
        out = out + positional_embed(cfg.dim, x.shape[1]).astype(out.dtype)
    return out


# ---------------------------------------------------------------------------
# PatchTST-style patch embedding (Data2Seq/Time_Series.py:148-173)


@dataclasses.dataclass(frozen=True)
class PatchConfig:
    dim: int
    patch_len: int
    stride: int
    padding: int  # replication-pad amount at sequence end


def patch_init(cfg: PatchConfig, key: jax.Array) -> Dict[str, jax.Array]:
    return {
        "w": jax.random.normal(key, (cfg.patch_len, cfg.dim)) * cfg.patch_len**-0.5,
    }


def patch_apply(
    params: Dict[str, jax.Array],
    x: jax.Array,
    cfg: PatchConfig,
    mm: jax.lax.Precision = jax.lax.Precision.HIGHEST,
):
    """x: [B, n_vars, L] -> ([B*n_vars, n_patches, D], n_vars)."""
    b, n_vars, length = x.shape
    pad = jnp.repeat(x[..., -1:], cfg.padding, axis=-1)  # replication pad
    xp = jnp.concatenate([x, pad], axis=-1)
    n_patches = (xp.shape[-1] - cfg.patch_len) // cfg.stride + 1
    idx = np.arange(n_patches)[:, None] * cfg.stride + np.arange(cfg.patch_len)
    patches = xp[..., idx]  # [B, n_vars, n_patches, patch_len]
    patches = patches.reshape(b * n_vars, n_patches, cfg.patch_len)
    out = jnp.dot(patches, params["w"], precision=mm)
    out = out + positional_embed(cfg.dim, n_patches).astype(out.dtype)
    return out, n_vars


def convert_torch_conv1d(weight: np.ndarray) -> Dict[str, jax.Array]:
    """torch circular Conv1d weight [D, C, 3] -> our [3C, D] unfold weight."""
    d = weight.shape[0]
    w = np.transpose(np.asarray(weight, np.float32), (2, 1, 0)).reshape(-1, d)
    return {"value_w": jnp.asarray(w)}

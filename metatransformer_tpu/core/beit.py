"""BEiT-style transformer blocks (rel-pos-bias + LayerScale), TPU-native.

Reference: ``Image/segmentation/mmseg_custom/models/backbones/base/beit.py``
(Attention :61-148 — separate q/v biases, k un-biased, per-layer relative
position bias table indexed by a precomputed window index; Block :150-186
— LayerScale gamma_1/gamma_2) and the BEiT-adapter backbone
(``backbones/beit_adapter.py``).

Same stacked-depth ``lax.scan`` design as core/encoder.py: all layers'
params (including each layer's rel-pos table, expanded from the shared
checkpoint table by core/convert.convert_beit) stack on a leading axis.
The relative-position *index* is geometry-static, precomputed in numpy
and baked into the program as a constant gather.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.core import encoder as enc

Params = Dict[str, jax.Array]


@dataclasses.dataclass(frozen=True)
class BEiTConfig:
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    ln_eps: float = 1e-6  # BEiT uses eps=1e-6
    window: Tuple[int, int] = (14, 14)  # patch grid (img 224 / patch 16)
    init_values: float = 0.1  # LayerScale init (beit_adapter configs)

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads

    @property
    def mlp_dim(self) -> int:
        return int(self.dim * self.mlp_ratio)

    @property
    def num_relative_distance(self) -> int:
        wh, ww = self.window
        return (2 * wh - 1) * (2 * ww - 1) + 3


def relative_position_index(window: Tuple[int, int]) -> np.ndarray:
    """[Wh*Ww+1, Wh*Ww+1] int index into the bias table (beit.py:89-104);
    the +1 row/col is the cls token's three special distances."""
    wh, ww = window
    coords = np.stack(
        np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij")
    ).reshape(2, -1)  # [2, Wh*Ww]
    rel = coords[:, :, None] - coords[:, None, :]  # [2, N, N]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    n = wh * ww
    nrd = (2 * wh - 1) * (2 * ww - 1) + 3
    idx = np.zeros((n + 1, n + 1), np.int64)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = nrd - 3
    idx[0:, 0] = nrd - 2
    idx[0, 0] = nrd - 1
    return idx


def windowed_relative_position_index(
    full_window: Tuple[int, int], win: int
) -> np.ndarray:
    """[win*win, win*win] indices into the FULL-grid rel-pos table for a
    win x win attention window (no cls row): in-window relative offsets
    are a subset of the full grid's, so the shared table serves windowed
    blocks too — only the row stride (2*W_full - 1) changes."""
    wh, ww = full_window
    coords = np.stack(
        np.meshgrid(np.arange(win), np.arange(win), indexing="ij")
    ).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)


def param_shapes(cfg: BEiTConfig) -> Dict[str, tuple]:
    d, m, h = cfg.dim, cfg.mlp_dim, cfg.num_heads
    return {
        "norm1_scale": (d,), "norm1_bias": (d,),
        "qkv_w": (d, 3 * d),
        "q_bias": (d,), "v_bias": (d,),  # k has no bias (beit.py:70-76)
        "rel_pos_table": (cfg.num_relative_distance, h),
        "proj_w": (d, d), "proj_b": (d,),
        "gamma_1": (d,), "gamma_2": (d,),
        "norm2_scale": (d,), "norm2_bias": (d,),
        "fc1_w": (d, m), "fc1_b": (m,),
        "fc2_w": (m, d), "fc2_b": (d,),
    }


def init(cfg: BEiTConfig, key: jax.Array) -> Params:
    shapes = param_shapes(cfg)
    keys = jax.random.split(key, len(shapes))
    params = {}
    for (name, shape), k in zip(shapes.items(), keys):
        full = (cfg.depth,) + shape
        if name.endswith("_w"):
            params[name] = (
                jax.random.truncated_normal(k, -2.0, 2.0, full, jnp.float32)
                * 0.02
            )
        elif "scale" in name:
            params[name] = jnp.ones(full)
        elif name.startswith("gamma"):
            params[name] = jnp.full(full, cfg.init_values, jnp.float32)
        else:
            params[name] = jnp.zeros(full)
    return params


def attention(
    x: jax.Array,
    p: Params,
    cfg: BEiTConfig,
    rel_index: jax.Array,  # [T, T] int (or None for no rel bias)
    precision: enc.Precision,
) -> jax.Array:
    b, t, d = x.shape
    h, hd = cfg.num_heads, cfg.head_dim
    cd = precision.compute_dtype
    mm = precision.mm
    xc = x.astype(cd)
    w = p["qkv_w"].astype(cd).reshape(d, 3, h, hd)
    qb = p["q_bias"].astype(cd).reshape(h, 1, hd)
    vb = p["v_bias"].astype(cd).reshape(h, 1, hd)
    scale = float(hd) ** -0.5
    q = jnp.einsum("btd,dhk->bhtk", xc, w[:, 0], precision=mm) + qb
    k = jnp.einsum("btd,dhk->bhtk", xc, w[:, 1], precision=mm)
    if "k_bias" in p:  # UniPerceiver's in_proj has a full qkv bias
        k = k + p["k_bias"].astype(cd).reshape(h, 1, hd)
    v = jnp.einsum("btd,dhk->bhtk", xc, w[:, 2], precision=mm) + vb
    logits = jnp.einsum(
        "bhtk,bhsk->bhts", q * scale, k,
        preferred_element_type=jnp.float32, precision=mm,
    )
    if rel_index is not None:
        bias = p["rel_pos_table"][rel_index]  # [T, T, H]
        logits = logits + bias.transpose(2, 0, 1)[None].astype(logits.dtype)
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(v.dtype)
    o = jnp.einsum("bhts,bhsk->bhtk", probs, v, precision=mm)
    proj = p["proj_w"].astype(cd).reshape(h, hd, d)
    out = jnp.einsum("bhtk,hkd->btd", o, proj, precision=mm) + p["proj_b"].astype(cd)
    return out.astype(x.dtype)


def block(
    x: jax.Array,
    p: Params,
    cfg: BEiTConfig,
    rel_index: Optional[jax.Array],
    precision: enc.Precision = enc.FP32,
) -> jax.Array:
    """BEiT Block: pre-LN + LayerScale residuals (beit.py:173-186)."""
    hN = enc.layer_norm(x, p["norm1_scale"], p["norm1_bias"], cfg.ln_eps)
    x = x + p["gamma_1"].astype(x.dtype) * attention(hN, p, cfg, rel_index, precision)
    hN = enc.layer_norm(x, p["norm2_scale"], p["norm2_bias"], cfg.ln_eps)
    x = x + p["gamma_2"].astype(x.dtype) * enc.mlp(hN, p, precision)
    return x


@functools.partial(jax.jit, static_argnames=("cfg", "precision", "use_rel_bias"))
def encode(
    params: Params,
    x: jax.Array,  # [B, T, D]; T must equal Wh*Ww+1 when use_rel_bias
    cfg: BEiTConfig,
    precision: enc.Precision = enc.FP32,
    use_rel_bias: bool = True,
) -> jax.Array:
    """Full BEiT stack as one scan over stacked layer params."""
    rel_index = None
    if use_rel_bias:
        rel_index = jnp.asarray(relative_position_index(cfg.window))
        t = cfg.window[0] * cfg.window[1] + 1
        assert x.shape[1] == t, (
            f"T={x.shape[1]} does not match window {cfg.window} (+cls={t})"
        )
    x = x.astype(precision.compute_dtype)

    def body(carry, lp):
        return block(carry, lp, cfg, rel_index, precision), None

    x, _ = jax.lax.scan(body, x, params)
    return x

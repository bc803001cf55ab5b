"""BAAF-Net — Bilateral Augmentation and Adaptive Fusion segmentation
(``PointCloud/openpoints/models/backbone/baafnet.py:244-527``),
re-designed TPU-native.

Faithful mechanics:
- **BilateralAugmentation** (:244-306): local geometric context
  [p, p_rel] (6-d) and semantic context [f, f_rel]; semantic-predicted
  xyz offsets shift the neighbor coordinates (p_knn_tilde), the
  augmented 9-d geometry predicts feature offsets back, both augmented
  contexts are encoded to d/2 each and concatenated.
- **MixedLocalAggregation** (:309-340): per-channel softmax weights over
  the k neighbors, weighted-sum + max pooled, 2d -> d -> 2d MLPs.
- **Encoder** (:411-475): feature embed, num_layers bilateral context
  blocks with FPS 4x downsampling between them; 1-NN upsample indices
  cached per level.
- **Adaptive fusion decoder** (:478-507): one decoder branch per depth,
  each reconstructed to full resolution through nearest-neighbor
  interpolation + recon MLPs; a learned scalar weight per branch,
  softmax across branches, weighted sum -> classifier.

BatchNorm is train-mode batch statistics (pure function), as across the
baseline zoo. Registered as ``BAAFNet`` (seg contract:
``forward(params, points, cfg, features=None) -> [B, N, num_classes]``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.models.point_baselines import _bn
from metatransformer_tpu.ops import point_ops as po


@dataclasses.dataclass(frozen=True)
class BAAFNetConfig:
    num_classes: int = 13
    d_in: int = 3
    k: int = 16
    ds_ratio: int = 4
    # dims[0] = embed base; BCB_i maps 2*dims[i] -> 2*dims[i+1]
    dims: Tuple[int, ...] = (8, 16, 64, 128, 256)

    @property
    def num_layers(self) -> int:
        return len(self.dims) - 1


def _mlp_init(key, cin, cout, bn=True):
    p = {"w": jax.random.normal(key, (cin, cout)) * np.sqrt(2.0 / cin),
         "b": jnp.zeros((cout,))}
    if bn:
        p["bn_scale"] = jnp.ones((cout,))
        p["bn_bias"] = jnp.zeros((cout,))
    return p


def _mlp(p, x, act="relu"):
    h = x @ p["w"] + p["b"]
    if "bn_scale" in p:
        h = _bn(h, p["bn_scale"], p["bn_bias"])
    if act == "relu":
        return jax.nn.relu(h)
    if act == "lrelu":
        return jax.nn.leaky_relu(h, 0.2)
    return h


def _ba_init(key, d_in, d_out):
    keys = jax.random.split(key, 5)
    return {
        "mlp0": _mlp_init(keys[0], d_in, d_out // 2),
        "mlp1": _mlp_init(keys[1], d_out, 3),
        "mlp2": _mlp_init(keys[2], 9, d_out // 2),
        "mlp3": _mlp_init(keys[3], 9, d_out // 2),
        "mlp4": _mlp_init(keys[4], 3 * d_out // 2, d_out // 2),
    }


def _embed_context(x, x_knn):
    xe = jnp.broadcast_to(x[:, :, None, :], x_knn.shape)
    return jnp.concatenate([xe, x_knn - xe], axis=-1)


def _bilateral_augmentation(p, pts, f, k):
    """(alc [B,N,k,d_out], p_knn_tilde) — baafnet.py:260-300."""
    _, nidx = po.knn(pts, pts, min(k, pts.shape[1]))
    f = _mlp(p["mlp0"], f)  # d_out // 2
    p_knn = po.gather_points(pts, nidx)
    f_knn = po.gather_points(f, nidx)
    lgc = _embed_context(pts, p_knn)  # 6
    lsc = _embed_context(f, f_knn)  # d_out
    p_knn_tilde = _mlp(p["mlp1"], lsc) + p_knn
    lgc_aug = jnp.concatenate([lgc, p_knn_tilde], axis=-1)  # 9
    f_knn_tilde = _mlp(p["mlp2"], lgc_aug) + f_knn
    lsc_aug = jnp.concatenate([lsc, f_knn_tilde], axis=-1)  # 3/2 d_out
    alc = jnp.concatenate(
        [_mlp(p["mlp3"], lgc_aug), _mlp(p["mlp4"], lsc_aug)], axis=-1
    )
    return alc, p_knn_tilde


def _mla_init(key, d):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "mlp0": _mlp_init(k1, d, d, bn=False),
        "mlp1": _mlp_init(k2, 2 * d, d),
        "mlp2": _mlp_init(k3, d, 2 * d),
    }


def _mixed_local_aggregation(p, alc):
    """[B, N, k, d] -> [B, N, 2d] (baafnet.py:320-340)."""
    w = jax.nn.softmax(_mlp(p["mlp0"], alc, act=None), axis=2)
    pooled = jnp.concatenate(
        [jnp.sum(alc * w, axis=2), jnp.max(alc, axis=2)], axis=-1
    )
    h = _mlp(p["mlp1"], pooled)
    return _mlp(p["mlp2"], h, act="lrelu")


def init(cfg: BAAFNetConfig, key: jax.Array) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 128))
    D = cfg.dims
    L = cfg.num_layers
    params: Dict[str, Any] = {
        "embed": _mlp_init(next(keys), cfg.d_in, 2 * D[0])
    }
    for i in range(L):
        params[f"bcb{i}_ba"] = _ba_init(next(keys), 2 * D[i], D[i + 1])
        params[f"bcb{i}_mla"] = _mla_init(next(keys), D[i + 1])
    for n in range(L):
        params[f"dec{n}_mlp"] = _mlp_init(
            next(keys), 2 * D[L - n], 2 * D[L - n]
        )
        recon = []
        for j in range(L - n):
            d_in = 2 * (D[L - n - j] + D[L - 1 - n - j])
            d_out = 2 * D[L - 1 - n - j]
            if j + 1 == L - n:
                # last step fuses the full-res BCB0 output (2*D[1]) with
                # the upsampled 2*D[1] branch (:523-525 d_in = 4*dims[..])
                d_in = 4 * D[1]
            recon.append(_mlp_init(next(keys), d_in, d_out))
        params[f"dec{n}_recon"] = recon
        params[f"dec{n}_weight"] = _mlp_init(
            next(keys), 2 * D[0], 1, bn=False
        )
    params["cls0"] = _mlp_init(next(keys), 2 * D[0], 64)
    params["cls1"] = _mlp_init(next(keys), 64, 32)
    params["cls2"] = _mlp_init(next(keys), 32, cfg.num_classes, bn=False)
    return params


@functools.partial(jax.jit, static_argnames=("cfg",))
def forward(
    params: Dict[str, Any],
    points: jax.Array,  # [B, N, 3]
    cfg: BAAFNetConfig,
    features: jax.Array = None,
) -> jax.Array:
    pts = points[..., :3]
    f = pts if features is None else features
    L = cfg.num_layers
    f = _mlp(params["embed"], f, act="lrelu")

    # ---- encoder (:428-475) ----
    f_enc: List[jax.Array] = []
    us_idx: List[jax.Array] = []
    n = pts.shape[1]
    for i in range(L):
        alc, _ = _bilateral_augmentation(
            params[f"bcb{i}_ba"], pts, f, cfg.k
        )
        f = _mixed_local_aggregation(params[f"bcb{i}_mla"], alc)
        if i == 0:
            f_enc.append(f)
        m = max(n // cfg.ds_ratio, 4)
        ds = po.furthest_point_sample(pts, m)
        p_ds = po.gather_points(pts, ds)
        f = po.gather_points(f, ds)
        f_enc.append(f)
        _, nn1 = po.knn(pts, p_ds, 1)  # for each fine point: nearest coarse
        us_idx.append(nn1[..., 0])
        pts, n = p_ds, m

    # ---- adaptive fusion decoder (:478-507) ----
    branches = []
    weights = []
    for dec in range(L):
        f = f_enc[-1 - dec]
        f = _mlp(params[f"dec{dec}_mlp"], f)
        for j in range(L - dec):
            up = po.gather_points(f, us_idx[-j - dec - 1])
            cat = jnp.concatenate([f_enc[-j - dec - 2], up], axis=-1)
            f = _mlp(params[f"dec{dec}_recon"][j], cat)
        branches.append(f)
        weights.append(_mlp(params[f"dec{dec}_weight"], f, act=None))

    w = jax.nn.softmax(jnp.concatenate(weights, axis=-1), axis=-1)
    f = sum(b * w[..., i : i + 1] for i, b in enumerate(branches))

    h = _mlp(params["cls0"], f)
    h = _mlp(params["cls1"], h)
    return _mlp(params["cls2"], h, act=None)


def _register() -> None:
    import types

    from metatransformer_tpu.utils.registry import MODELS

    if "BAAFNet" not in MODELS:
        MODELS._entries["BAAFNet"] = types.SimpleNamespace(
            init=init, forward=forward, Config=BAAFNetConfig
        )


_register()

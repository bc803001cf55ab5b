"""RandLA-Net — random-sampling large-scale point segmentation
(``PointCloud/openpoints/models/backbone/randlenet.py:12-318``),
re-designed TPU-native.

Faithful mechanics:
- **Random decimation** (:257-270): one random permutation up front, each
  encoder stage keeps the first N/4^i columns — permutation + static
  prefix slices here (shapes stay static under jit; the rng is an
  explicit argument).
- **LocalSpatialEncoding** (:58-103): 10-d relative geometry
  [center, neighbor, center - neighbor, distance] lifted to d features,
  concatenated with the broadcast point features.
- **AttentivePooling** (:106-137): per-channel softmax scores over the
  k neighbors, weighted sum, shared MLP.
- **LocalFeatureAggregation** (:140-185): mlp1 -> (LSE -> pool) x2 ->
  mlp2 + shortcut, leaky-relu residual.
- **Decoder** (:283-299): 1-NN upsampling from the coarse set to the
  next-finer prefix, skip concat, shared MLP; inverse permutation at
  the end.

BatchNorm is train-mode batch statistics (pure function), as across the
baseline zoo. Registered as ``RandLANet`` (seg contract:
``forward(params, points, cfg, features=None, rng=None) -> [B, N, C]``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.models.point_baselines import _bn, _dense_init
from metatransformer_tpu.ops import point_ops as po


@dataclasses.dataclass(frozen=True)
class RandLANetConfig:
    num_classes: int = 13
    d_in: int = 3
    num_neighbors: int = 16
    decimation: int = 4
    enc_dims: Tuple[int, ...] = (16, 64, 128, 256)  # LFA d_out per stage
    head_dims: Tuple[int, ...] = (64, 32)


def _lin_init(key, cin, cout):
    return {"w": jax.random.normal(key, (cin, cout)) * np.sqrt(2.0 / cin)}


def _lse_init(key, d):
    return {"mlp": _dense_init(key, 10, d)}


def _lse(p, coords, feats, nidx, ndist):
    """[B, N, K, d] spatial encoding concat broadcast features (:90-103)."""
    nj = po.gather_points(coords, nidx)  # [B, N, K, 3]
    ci = jnp.broadcast_to(coords[:, :, None, :], nj.shape)
    geo = jnp.concatenate([ci, nj, ci - nj, ndist[..., None]], axis=-1)
    m = p["mlp"]
    geo = jax.nn.relu(_bn(geo @ m["w"], m["bn_scale"], m["bn_bias"]))
    fx = jnp.broadcast_to(feats[:, :, None, :], geo.shape[:3] + feats.shape[-1:])
    return jnp.concatenate([geo, fx], axis=-1)


def _att_pool_init(key, cin, cout):
    k1, k2 = jax.random.split(key)
    return {"score": _lin_init(k1, cin, cin), "mlp": _dense_init(k2, cin, cout)}


def _att_pool(p, x):
    """x [B, N, K, C] -> [B, N, C] (:117-137: softmax over neighbors)."""
    scores = jax.nn.softmax(x @ p["score"]["w"], axis=2)
    f = jnp.sum(scores * x, axis=2)
    m = p["mlp"]
    return jax.nn.relu(_bn(f @ m["w"], m["bn_scale"], m["bn_bias"]))


def _lfa_init(key, d_in, d_out):
    keys = jax.random.split(key, 7)
    return {
        "mlp1": _lin_init(keys[0], d_in, d_out // 2),
        "lse1": _lse_init(keys[1], d_out // 2),
        "pool1": _att_pool_init(keys[2], d_out, d_out // 2),
        "lse2": _lse_init(keys[3], d_out // 2),
        "pool2": _att_pool_init(keys[4], d_out, d_out),
        "mlp2": _lin_init(keys[5], d_out, 2 * d_out),
        "shortcut": _dense_init(keys[6], d_in, 2 * d_out),
    }


def _lfa(p, coords, feats, k):
    ndist, nidx = po.knn(coords, coords, min(k, coords.shape[1]))
    x = jax.nn.leaky_relu(feats @ p["mlp1"]["w"], 0.2)
    x = _att_pool(p["pool1"], _lse(p["lse1"], coords, x, nidx, ndist))
    x = _att_pool(p["pool2"], _lse(p["lse2"], coords, x, nidx, ndist))
    x = x @ p["mlp2"]["w"]
    sc = p["shortcut"]
    short = _bn(feats @ sc["w"], sc["bn_scale"], sc["bn_bias"])
    return jax.nn.leaky_relu(x + short, 0.01)


def init(cfg: RandLANetConfig, key: jax.Array) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 32))
    params: Dict[str, Any] = {"fc_start": _dense_init(next(keys), cfg.d_in, 8)}
    cin = 8
    skip_dims, in_dims = [], []
    for d in cfg.enc_dims:
        in_dims.append(cin)
        params[f"lfa{len(skip_dims)}"] = _lfa_init(next(keys), cin, d)
        cin = 2 * d
        skip_dims.append(cin)
    params["mid"] = _lin_init(next(keys), cin, cin)
    # decoder outs = encoder INPUT dims reversed (randlenet.py:218-223:
    # 1024->256, 512->128, 256->32, 64->8)
    for i, (skip, cout) in enumerate(
        zip(reversed(skip_dims), reversed(in_dims))
    ):
        params[f"dec{i}"] = _dense_init(next(keys), cin + skip, cout)
        cin = cout
    hd = list(cfg.head_dims)
    for i, h in enumerate(hd):
        params[f"head{i}"] = _dense_init(next(keys), cin, h)
        cin = h
    params["out"] = {
        "w": jax.random.normal(next(keys), (cin, cfg.num_classes))
        * np.sqrt(1.0 / cin),
        "b": jnp.zeros((cfg.num_classes,)),
    }
    return params


@functools.partial(jax.jit, static_argnames=("cfg",))
def forward(
    params: Dict[str, Any],
    points: jax.Array,  # [B, N, 3]
    cfg: RandLANetConfig,
    features: Optional[jax.Array] = None,  # [B, N, d_in]
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    coords = points[..., :3]
    b, n, _ = coords.shape
    x_in = coords if features is None else features

    if rng is None:
        rng = jax.random.PRNGKey(0)
    perm = jax.random.permutation(rng, n)
    coords = coords[:, perm]
    x = x_in[:, perm]

    fs = params["fc_start"]
    x = jax.nn.leaky_relu(_bn(x @ fs["w"], fs["bn_scale"], fs["bn_bias"]), 0.2)

    d = cfg.decimation
    counts = []
    cur = n
    skips = []
    coords_stack = []
    for i in range(len(cfg.enc_dims)):
        x = _lfa(params[f"lfa{i}"], coords[:, :cur], x, cfg.num_neighbors)
        skips.append(x)
        coords_stack.append(coords[:, :cur])
        counts.append(cur)
        cur = max(cur // d, 4)
        x = x[:, :cur]

    x = jax.nn.relu(x @ params["mid"]["w"])

    for i in range(len(cfg.enc_dims)):
        fine_coords = coords_stack[-1 - i]
        coarse_coords = fine_coords[:, : x.shape[1]]
        # 1-NN upsample coarse -> fine (:283-292)
        _, nn1 = po.knn(fine_coords, coarse_coords, 1)
        up = po.gather_points(x, nn1[..., 0])
        h = jnp.concatenate([up, skips[-1 - i]], axis=-1)
        dc = params[f"dec{i}"]
        x = jax.nn.relu(_bn(h @ dc["w"], dc["bn_scale"], dc["bn_bias"]))

    # inverse permutation back to input order (:302)
    inv = jnp.argsort(perm)
    x = x[:, inv]
    for i in range(len(cfg.head_dims)):
        hp = params[f"head{i}"]
        x = jax.nn.relu(_bn(x @ hp["w"], hp["bn_scale"], hp["bn_bias"]))
    return x @ params["out"]["w"] + params["out"]["b"]


def _register() -> None:
    import types

    from metatransformer_tpu.utils.registry import MODELS

    if "RandLANet" not in MODELS:
        MODELS._entries["RandLANet"] = types.SimpleNamespace(
            init=init, forward=forward, Config=RandLANetConfig
        )


_register()

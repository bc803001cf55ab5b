"""PointTransformer segmentation U-Net (PTSeg) — the reference's vendored
S3DIS vector-attention baseline
(``PointCloud/openpoints/models/backbone/pointtransformer.py:14-293``),
re-designed TPU-native.

Design notes (vs the torch/pointops original):
- The original runs in the flattened *offset* layout ((n, c) + batch
  offsets, per-batch Python loops, pointops CUDA). Here everything is the
  dense batch layout [B, N, C] with the shared jittable ops
  (``ops/point_ops.py`` FPS/kNN/gather, ``ops/point_interp.py`` 3-NN
  interpolation) — static shapes, no per-sample loops, vmap-free.
- Vector attention (PointTransformerLayer:32-50): per-neighbor weight
  vectors (not scalars) over share_planes groups, position encoding
  added to both the attention logits and the values; softmax over the
  k=nsample neighbors. All gathers are batched takes; the MLPs are
  channel-axis matmuls (MXU GEMMs).
- TransitionDown = FPS stride + kNN group + linear + max (:79-108);
  TransitionUp = 3-NN interpolation fusion, with the global-pool variant
  for the bottleneck head (:111-143).
- BatchNorm is train-mode batch statistics (pure function), as in the
  rest of the baseline zoo.

Contract: ``forward(params, points [B, N, 3], cfg, features=None) ->
per-point logits [B, N, num_classes]``. Registered as
``PointTransformerSeg`` in utils.registry.MODELS.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.models.point_baselines import _bn, _dense_init
from metatransformer_tpu.ops import point_interp, point_ops as po


@dataclasses.dataclass(frozen=True)
class PointTransformerSegConfig:
    """5-stage encoder (strides 1,4,4,4,4) + symmetric decoder
    (pointtransformer.py:219-256). ``blocks[i]`` counts the vector-
    attention blocks per stage INCLUDING the transition layer slot, as in
    ``_make_enc`` (so blocks=2 -> transition + 1 attention block)."""

    num_classes: int = 13
    in_channels: int = 3  # feature channels (original S3DIS recipe: 6)
    width: int = 32
    blocks: Tuple[int, ...] = (2, 2, 2, 2, 2)
    strides: Tuple[int, ...] = (1, 4, 4, 4, 4)
    nsample: Tuple[int, ...] = (8, 16, 16, 16, 16)
    share_planes: int = 8

    @property
    def planes(self) -> Tuple[int, ...]:
        return tuple(self.width * 2**i for i in range(len(self.blocks)))


def _linear_init(key, cin, cout):
    return {"w": jax.random.normal(key, (cin, cout)) * np.sqrt(2.0 / cin)}


def _pt_layer_init(key: jax.Array, c: int, s: int) -> Dict[str, Any]:
    keys = jax.random.split(key, 8)
    return {
        "q": _linear_init(keys[0], c, c),
        "k": _linear_init(keys[1], c, c),
        "v": _linear_init(keys[2], c, c),
        # linear_p: Linear(3,3) + BN + ReLU + Linear(3,c)  (:24-25)
        "p1": _dense_init(keys[3], 3, 3),
        "p2": _linear_init(keys[4], 3, c),
        # linear_w: BN+ReLU, Linear(c, c/s), BN+ReLU, Linear(c/s, c/s) (:26-29)
        "w_bn0_scale": jnp.ones((c,)),
        "w_bn0_bias": jnp.zeros((c,)),
        "w1": _dense_init(keys[5], c, c // s),
        "w2": _linear_init(keys[6], c // s, c // s),
    }


def _pt_layer(p: Dict[str, Any], xyz, x, nidx, s: int) -> jax.Array:
    """Vector attention over the kNN neighborhood (forward :32-50)."""
    q = x @ p["q"]["w"]
    k = x @ p["k"]["w"]
    v = x @ p["v"]["w"]
    kj = po.gather_points(k, nidx)  # [B, N, K, C]
    vj = po.gather_points(v, nidx)
    pr = po.gather_points(xyz, nidx) - xyz[:, :, None, :]  # relative pos
    pr = jax.nn.relu(_bn(pr @ p["p1"]["w"], p["p1"]["bn_scale"], p["p1"]["bn_bias"]))
    pr = pr @ p["p2"]["w"]  # [B, N, K, C]

    w = kj - q[:, :, None, :] + pr
    w = jax.nn.relu(_bn(w, p["w_bn0_scale"], p["w_bn0_bias"]))
    w = jax.nn.relu(_bn(w @ p["w1"]["w"], p["w1"]["bn_scale"], p["w1"]["bn_bias"]))
    w = w @ p["w2"]["w"]  # [B, N, K, C/s]
    w = jax.nn.softmax(w, axis=2)  # over neighbors

    b, n, kk, c = vj.shape
    agg = (vj + pr).reshape(b, n, kk, s, c // s) * w[:, :, :, None, :]
    return jnp.sum(agg, axis=2).reshape(b, n, c)


def _pt_block_init(key, c, s):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "lin1": _dense_init(k1, c, c),
        "attn": _pt_layer_init(k2, c, s),
        "bn2_scale": jnp.ones((c,)),
        "bn2_bias": jnp.zeros((c,)),
        "lin3": _dense_init(k3, c, c),
    }


def _pt_block(p, xyz, x, nidx, s):
    """Residual vector-attention block (PointTransformerBlock :146-167)."""
    identity = x
    h = jax.nn.relu(_bn(x @ p["lin1"]["w"], p["lin1"]["bn_scale"], p["lin1"]["bn_bias"]))
    h = jax.nn.relu(_bn(_pt_layer(p["attn"], xyz, h, nidx, s),
                        p["bn2_scale"], p["bn2_bias"]))
    h = _bn(h @ p["lin3"]["w"], p["lin3"]["bn_scale"], p["lin3"]["bn_bias"])
    return jax.nn.relu(identity + h)


def init(cfg: PointTransformerSegConfig, key: jax.Array) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 128))
    params: Dict[str, Any] = {}
    s = cfg.share_planes
    cin = cfg.in_channels
    for i, c in enumerate(cfg.planes):
        # TransitionDown (:79-108): strided stages group 3+cin, stride-1
        # stages are a plain linear
        td_in = cin + 3 if cfg.strides[i] != 1 else cin
        params[f"enc{i}_down"] = _dense_init(next(keys), td_in, c)
        params[f"enc{i}_blocks"] = [
            _pt_block_init(next(keys), c, s) for _ in range(cfg.blocks[i] - 1)
        ]
        cin = c
    planes = cfg.planes
    top = len(planes) - 1
    # dec5 head TransitionUp (global-pool fusion, :124-138)
    params["dec_head_lin2"] = _dense_init(next(keys), planes[top], planes[top])
    params["dec_head_lin1"] = _dense_init(next(keys), 2 * planes[top], planes[top])
    params["dec_head_blocks"] = [_pt_block_init(next(keys), planes[top], s)]
    for i in range(top - 1, -1, -1):
        # fuse stage i+1 (coarse) into stage i (fine)  (:139-143)
        params[f"dec{i}_lin1"] = _dense_init(next(keys), planes[i], planes[i])
        params[f"dec{i}_lin2"] = _dense_init(next(keys), planes[i + 1], planes[i])
        params[f"dec{i}_blocks"] = [_pt_block_init(next(keys), planes[i], s)]
    params["cls1"] = _dense_init(next(keys), planes[0], planes[0])
    params["cls2"] = {
        "w": jax.random.normal(next(keys), (planes[0], cfg.num_classes))
        * np.sqrt(1.0 / planes[0]),
        "b": jnp.zeros((cfg.num_classes,)),
    }
    return params


@functools.partial(jax.jit, static_argnames=("cfg",))
def forward(
    params: Dict[str, Any],
    points: jax.Array,  # [B, N, 3]
    cfg: PointTransformerSegConfig,
    features: jax.Array = None,  # [B, N, in_channels]; default = xyz
) -> jax.Array:
    xyz = points[..., :3]
    x = xyz if features is None else features
    s = cfg.share_planes

    # ---- encoder ----
    stages = []  # (xyz, feats) per stage
    n = xyz.shape[1]
    for i, c in enumerate(cfg.planes):
        dn = params[f"enc{i}_down"]
        if cfg.strides[i] != 1:
            m = max(n // cfg.strides[i], 4)
            idx = po.furthest_point_sample(xyz, m)
            centers = po.gather_points(xyz, idx)
            _, nidx = po.knn(centers, xyz, min(cfg.nsample[i], n))
            dp, fj = po.group_points(centers, xyz, nidx, x)
            g = jnp.concatenate([dp, fj], axis=-1)
            g = jax.nn.relu(_bn(g @ dn["w"], dn["bn_scale"], dn["bn_bias"]))
            x = jnp.max(g, axis=2)
            xyz, n = centers, m
        else:
            x = jax.nn.relu(_bn(x @ dn["w"], dn["bn_scale"], dn["bn_bias"]))
        _, nidx = po.knn(xyz, xyz, min(cfg.nsample[i], n))
        for blk in params[f"enc{i}_blocks"]:
            x = _pt_block(blk, xyz, x, nidx, s)
        stages.append((xyz, x))

    # ---- decoder ----
    top = len(cfg.planes) - 1
    xyz_c, x_c = stages[top]
    # head TransitionUp: concat with a broadcast global summary (:124-138)
    l2 = params["dec_head_lin2"]
    g = jax.nn.relu(_bn(jnp.mean(x_c, axis=1) @ l2["w"],
                        l2["bn_scale"], l2["bn_bias"]))
    h = jnp.concatenate(
        [x_c, jnp.broadcast_to(g[:, None, :], x_c.shape)], axis=-1
    )
    l1 = params["dec_head_lin1"]
    x_c = jax.nn.relu(_bn(h @ l1["w"], l1["bn_scale"], l1["bn_bias"]))
    _, nidx = po.knn(xyz_c, xyz_c, min(cfg.nsample[top], xyz_c.shape[1]))
    for blk in params["dec_head_blocks"]:
        x_c = _pt_block(blk, xyz_c, x_c, nidx, s)

    for i in range(top - 1, -1, -1):
        xyz_f, x_f = stages[i]
        l1, l2 = params[f"dec{i}_lin1"], params[f"dec{i}_lin2"]
        up = point_interp.three_interpolation(
            xyz_f, xyz_c,
            jax.nn.relu(_bn(x_c @ l2["w"], l2["bn_scale"], l2["bn_bias"])),
        )
        x_c = jax.nn.relu(
            _bn(x_f @ l1["w"], l1["bn_scale"], l1["bn_bias"])
        ) + up
        xyz_c = xyz_f
        _, nidx = po.knn(xyz_c, xyz_c, min(cfg.nsample[i], xyz_c.shape[1]))
        for blk in params[f"dec{i}_blocks"]:
            x_c = _pt_block(blk, xyz_c, x_c, nidx, s)

    c1 = params["cls1"]
    h = jax.nn.relu(_bn(x_c @ c1["w"], c1["bn_scale"], c1["bn_bias"]))
    return h @ params["cls2"]["w"] + params["cls2"]["b"]


def _register() -> None:
    import types

    from metatransformer_tpu.utils.registry import MODELS

    if "PointTransformerSeg" not in MODELS:
        MODELS._entries["PointTransformerSeg"] = types.SimpleNamespace(
            init=init, forward=forward, Config=PointTransformerSegConfig
        )


_register()

"""Point-cloud baseline backbone zoo: PointNet++, DGCNN, PointMLP,
PointNeXt — the reference's vendored comparison baselines
(``PointCloud/openpoints/models/backbone/{pointnetv2,dgcnn,pointmlp,
pointnext}.py``), re-designed TPU-native.

Design notes (vs the CUDA originals):
- FPS / ball query / kNN / grouping are the shared jittable ops in
  ``ops/point_ops.py`` (the pointnet2-CUDA replacements) — static shapes,
  deterministic tie-breaks.
- BatchNorm1d is train-mode batch statistics over (batch, points[, k]);
  no running stats (evaluation uses the same pure function — the fused
  program is the serving path).
- Per-point "1x1 conv" stacks are plain dense matmuls over the channel
  axis: XLA maps them onto the MXU in one batched GEMM per layer.

All four register in utils.registry.MODELS and share one classifier
contract: ``forward(params, points [B, N, 3], cfg) -> logits [B, C]``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.ops import point_ops as po


def _dense_init(key, cin, cout):
    return {
        "w": jax.random.normal(key, (cin, cout)) * np.sqrt(2.0 / cin),
        "bn_scale": jnp.ones((cout,)),
        "bn_bias": jnp.zeros((cout,)),
    }


def _bn(x: jax.Array, scale: jax.Array, bias: jax.Array, eps=1e-3) -> jax.Array:
    """BatchNorm1d train-mode semantics: stats over every axis but channels."""
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _mlp(x, stack, act=jax.nn.relu):
    for p in stack:
        x = act(_bn(x @ p["w"], p["bn_scale"], p["bn_bias"]))
    return x


def _mlp_init(key, cin, widths):
    keys = jax.random.split(key, max(len(widths), 1))
    stack = []
    for k, w in zip(keys, widths):
        stack.append(_dense_init(k, cin, w))
        cin = w
    return stack


def _head_init(key, cin, fcs, num_classes):
    k1, k2 = jax.random.split(key)
    return {
        "fcs": _mlp_init(k1, cin, fcs),
        "out_w": jax.random.normal(k2, ((fcs[-1] if fcs else cin), num_classes))
        * np.sqrt(1.0 / (fcs[-1] if fcs else cin)),
        "out_b": jnp.zeros((num_classes,)),
    }


def _head(x, params):
    x = _mlp(x, params["fcs"])
    return x @ params["out_w"] + params["out_b"]


# ---------------------------------------------------------------------------
# PointNet++ (MSG) — openpoints/models/backbone/pointnetv2.py
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SAMSGStage:
    npoint: int
    radii: Tuple[float, ...]
    nsamples: Tuple[int, ...]
    mlps: Tuple[Tuple[int, ...], ...]


@dataclasses.dataclass(frozen=True)
class PointNet2Config:
    """The classic SSG/MSG classification assembly (pointnetv2.py
    PointNet2Encoder: SA stages -> global SA -> FC head)."""

    num_classes: int = 40
    stages: Tuple[SAMSGStage, ...] = (
        SAMSGStage(512, (0.1, 0.2, 0.4), (16, 32, 128),
                   ((32, 32, 64), (64, 64, 128), (64, 96, 128))),
        SAMSGStage(128, (0.2, 0.4, 0.8), (32, 64, 128),
                   ((64, 64, 128), (128, 128, 256), (128, 128, 256))),
    )
    global_mlp: Tuple[int, ...] = (256, 512, 1024)
    head_fcs: Tuple[int, ...] = (512, 256)


def pointnet2_init(cfg: PointNet2Config, key: jax.Array) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 64))
    params: Dict[str, Any] = {}
    cin = 0  # first stage groups xyz only (dp features)
    for si, st in enumerate(cfg.stages):
        branches = []
        for mlp in st.mlps:
            branches.append(_mlp_init(next(keys), cin + 3, mlp))
        params[f"sa{si}"] = branches
        cin = sum(m[-1] for m in st.mlps)
    params["global"] = _mlp_init(next(keys), cin + 3, cfg.global_mlp)
    params["head"] = _head_init(
        next(keys), cfg.global_mlp[-1], cfg.head_fcs, cfg.num_classes
    )
    return params


def _sa_msg(params_branches, st: SAMSGStage, xyz, feats):
    """One multi-scale-grouping set-abstraction level."""
    idx = po.furthest_point_sample(xyz, st.npoint)
    centers = po.gather_points(xyz, idx)
    outs = []
    for branch, radius, k in zip(params_branches, st.radii, st.nsamples):
        nidx = po.ball_query(centers, xyz, radius, k)
        dp, fj = po.group_points(centers, xyz, nidx, feats)
        g = dp if fj is None else jnp.concatenate([dp, fj], axis=-1)
        g = _mlp(g, branch)  # [B, M, K, C']
        outs.append(jnp.max(g, axis=2))
    return centers, jnp.concatenate(outs, axis=-1)


@functools.partial(jax.jit, static_argnames=("cfg",))
def pointnet2_forward(
    params: Dict[str, Any], points: jax.Array, cfg: PointNet2Config
) -> jax.Array:
    xyz = points[..., :3]
    feats = None
    for si, st in enumerate(cfg.stages):
        xyz, feats = _sa_msg(params[f"sa{si}"], st, xyz, feats)
    # global SA: group_all -> MLP -> max (pointnetv2 group_all stage)
    g = jnp.concatenate(
        [xyz - jnp.mean(xyz, axis=1, keepdims=True), feats], axis=-1
    )
    g = _mlp(g, params["global"])
    return _head(jnp.max(g, axis=1), params["head"])


# ---------------------------------------------------------------------------
# DGCNN — openpoints/models/backbone/dgcnn.py (EdgeConv stack)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DGCNNConfig:
    num_classes: int = 40
    k: int = 20
    edge_channels: Tuple[int, ...] = (64, 64, 128, 256)
    emb_dim: int = 1024
    head_fcs: Tuple[int, ...] = (512, 256)


def dgcnn_init(cfg: DGCNNConfig, key: jax.Array) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 16))
    params: Dict[str, Any] = {}
    cin = 3
    for i, c in enumerate(cfg.edge_channels):
        params[f"edge{i}"] = _dense_init(next(keys), 2 * cin, c)
        cin = c
    params["emb"] = _dense_init(
        next(keys), sum(cfg.edge_channels), cfg.emb_dim
    )
    params["head"] = _head_init(
        next(keys), 2 * cfg.emb_dim, cfg.head_fcs, cfg.num_classes
    )
    return params


def _edge_conv(p, x, k):
    """EdgeConv: dynamic kNN graph in FEATURE space, h([x_j - x_i, x_i]),
    max over neighbors (dgcnn.py get_graph_feature + conv)."""
    _, idx = po.knn(x, x, k)  # self included (distance 0)
    xj = po.gather_points(x, idx)  # [B, N, k, C]
    e = jnp.concatenate(
        [xj - x[:, :, None, :], jnp.broadcast_to(x[:, :, None, :], xj.shape)],
        axis=-1,
    )
    e = jax.nn.leaky_relu(
        _bn(e @ p["w"], p["bn_scale"], p["bn_bias"]), 0.2
    )
    return jnp.max(e, axis=2)


@functools.partial(jax.jit, static_argnames=("cfg",))
def dgcnn_forward(
    params: Dict[str, Any], points: jax.Array, cfg: DGCNNConfig
) -> jax.Array:
    x = points[..., :3]
    outs = []
    for i in range(len(cfg.edge_channels)):
        x = _edge_conv(params[f"edge{i}"], x, cfg.k)
        outs.append(x)
    h = jnp.concatenate(outs, axis=-1)
    p = params["emb"]
    h = jax.nn.leaky_relu(_bn(h @ p["w"], p["bn_scale"], p["bn_bias"]), 0.2)
    pooled = jnp.concatenate(
        [jnp.max(h, axis=1), jnp.mean(h, axis=1)], axis=-1
    )
    return _head(pooled, params["head"])


# ---------------------------------------------------------------------------
# PointMLP — openpoints/models/backbone/pointmlp.py
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class PointMLPConfig:
    """Geometric-affine grouping + residual point-MLP pre/pos blocks per
    stage, FPS stride-2 downsampling (pointMLP elite geometry)."""

    num_classes: int = 40
    embed_dim: int = 32
    k: int = 24
    stage_channels: Tuple[int, ...] = (64, 128, 256, 512)
    pre_blocks: int = 1
    pos_blocks: int = 1
    head_fcs: Tuple[int, ...] = (512, 256)


def _res_block_init(key, c):
    k1, k2 = jax.random.split(key)
    return {"fc1": _dense_init(k1, c, c), "fc2": _dense_init(k2, c, c)}


def _res_block(p, x):
    h = jax.nn.relu(_bn(x @ p["fc1"]["w"], p["fc1"]["bn_scale"], p["fc1"]["bn_bias"]))
    h = _bn(h @ p["fc2"]["w"], p["fc2"]["bn_scale"], p["fc2"]["bn_bias"])
    return jax.nn.relu(x + h)


def pointmlp_init(cfg: PointMLPConfig, key: jax.Array) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 64))
    params: Dict[str, Any] = {"embed": _dense_init(next(keys), 3, cfg.embed_dim)}
    cin = cfg.embed_dim
    for si, c in enumerate(cfg.stage_channels):
        params[f"affine{si}"] = {
            "alpha": jnp.ones((1, 1, 1, cin)),
            "beta": jnp.zeros((1, 1, 1, cin)),
        }
        params[f"transfer{si}"] = _dense_init(next(keys), 2 * cin, c)
        params[f"pre{si}"] = [
            _res_block_init(next(keys), c) for _ in range(cfg.pre_blocks)
        ]
        params[f"pos{si}"] = [
            _res_block_init(next(keys), c) for _ in range(cfg.pos_blocks)
        ]
        cin = c
    params["head"] = _head_init(next(keys), cin, cfg.head_fcs, cfg.num_classes)
    return params


@functools.partial(jax.jit, static_argnames=("cfg",))
def pointmlp_forward(
    params: Dict[str, Any], points: jax.Array, cfg: PointMLPConfig
) -> jax.Array:
    xyz = points[..., :3]
    p = params["embed"]
    x = jax.nn.relu(_bn(xyz @ p["w"], p["bn_scale"], p["bn_bias"]))
    n = xyz.shape[1]
    for si, c in enumerate(cfg.stage_channels):
        m = max(n // 2, 4)
        idx = po.furthest_point_sample(xyz, m)
        centers = po.gather_points(xyz, idx)
        center_f = po.gather_points(x, idx)  # [B, M, C]
        _, nidx = po.knn(centers, xyz, cfg.k)
        fj = po.gather_points(x, nidx)  # [B, M, K, C]
        # geometric affine: normalize the neighborhood by its std around
        # the center feature, learnable alpha/beta (pointmlp.py LocalGrouper)
        diff = fj - center_f[:, :, None, :]
        std = jnp.std(diff, axis=(1, 2, 3), keepdims=True)
        aff = params[f"affine{si}"]
        g = aff["alpha"] * diff / (std + 1e-5) + aff["beta"]
        g = jnp.concatenate(
            [g, jnp.broadcast_to(center_f[:, :, None, :], fj.shape)], axis=-1
        )
        t = params[f"transfer{si}"]
        g = jax.nn.relu(_bn(g @ t["w"], t["bn_scale"], t["bn_bias"]))
        for blk in params[f"pre{si}"]:
            b_, m_, k_, c_ = g.shape
            g = _res_block(blk, g.reshape(b_ * m_, k_, c_)).reshape(b_, m_, k_, c_)
        x = jnp.max(g, axis=2)
        for blk in params[f"pos{si}"]:
            x = _res_block(blk, x)
        xyz, n = centers, m
    return _head(jnp.max(x, axis=1), params["head"])


# ---------------------------------------------------------------------------
# PointNeXt — openpoints/models/backbone/pointnext.py
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class PointNeXtConfig:
    """PointNeXt-S assembly: MLP stem, 4 SA-downsample stages each
    followed by InvResMLP blocks (expansion-4 inverted residual with a
    grouped spatial max), radius doubling per stage."""

    num_classes: int = 40
    stem_dim: int = 32
    stage_channels: Tuple[int, ...] = (64, 128, 256, 512)
    blocks_per_stage: int = 1
    base_radius: float = 0.15
    k: int = 32
    expansion: int = 4
    head_fcs: Tuple[int, ...] = (512, 256)


def _invres_init(key, c, expansion):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "local": _dense_init(k1, c + 3, c),
        "fc1": _dense_init(k2, c, c * expansion),
        "fc2": _dense_init(k3, c * expansion, c),
    }


def pointnext_init(cfg: PointNeXtConfig, key: jax.Array) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 64))
    params: Dict[str, Any] = {"stem": _dense_init(next(keys), 3, cfg.stem_dim)}
    cin = cfg.stem_dim
    for si, c in enumerate(cfg.stage_channels):
        params[f"down{si}"] = _dense_init(next(keys), cin + 3, c)
        params[f"blocks{si}"] = [
            _invres_init(next(keys), c, cfg.expansion)
            for _ in range(cfg.blocks_per_stage)
        ]
        cin = c
    params["head"] = _head_init(next(keys), cin, cfg.head_fcs, cfg.num_classes)
    return params


def _invres_block(p, xyz, x, radius, k):
    """InvResMLP: local grouped aggregation + expansion MLP, residual."""
    nidx = po.ball_query(xyz, xyz, radius, k)
    dp, fj = po.group_points(xyz, xyz, nidx, x)
    g = jnp.concatenate([dp, fj], axis=-1)
    lp = p["local"]
    g = jax.nn.relu(_bn(g @ lp["w"], lp["bn_scale"], lp["bn_bias"]))
    h = jnp.max(g, axis=2)
    h = jax.nn.relu(_bn(h @ p["fc1"]["w"], p["fc1"]["bn_scale"], p["fc1"]["bn_bias"]))
    h = _bn(h @ p["fc2"]["w"], p["fc2"]["bn_scale"], p["fc2"]["bn_bias"])
    return jax.nn.relu(x + h)


@functools.partial(jax.jit, static_argnames=("cfg",))
def pointnext_forward(
    params: Dict[str, Any], points: jax.Array, cfg: PointNeXtConfig
) -> jax.Array:
    xyz = points[..., :3]
    p = params["stem"]
    x = jax.nn.relu(_bn(xyz @ p["w"], p["bn_scale"], p["bn_bias"]))
    n = xyz.shape[1]
    radius = cfg.base_radius
    for si in range(len(cfg.stage_channels)):
        m = max(n // 2, 4)
        idx = po.furthest_point_sample(xyz, m)
        centers = po.gather_points(xyz, idx)
        nidx = po.ball_query(centers, xyz, radius, cfg.k)
        dp, fj = po.group_points(centers, xyz, nidx, x)
        g = jnp.concatenate([dp, fj], axis=-1)
        dn = params[f"down{si}"]
        g = jax.nn.relu(_bn(g @ dn["w"], dn["bn_scale"], dn["bn_bias"]))
        x = jnp.max(g, axis=2)
        xyz, n = centers, m
        radius *= 2.0
        for blk in params[f"blocks{si}"]:
            x = _invres_block(blk, xyz, x, radius, cfg.k)
    return _head(jnp.max(x, axis=1), params["head"])


# ---------------------------------------------------------------------------
# registry entries (openpoints MODELS.register_module parity)
# ---------------------------------------------------------------------------


def _register() -> None:
    import types

    from metatransformer_tpu.utils.registry import MODELS

    entries = {
        "PointNet2Encoder": types.SimpleNamespace(
            init=pointnet2_init, forward=pointnet2_forward,
            Config=PointNet2Config,
        ),
        "DGCNN": types.SimpleNamespace(
            init=dgcnn_init, forward=dgcnn_forward, Config=DGCNNConfig
        ),
        "PointMLP": types.SimpleNamespace(
            init=pointmlp_init, forward=pointmlp_forward, Config=PointMLPConfig
        ),
        "PointNeXt": types.SimpleNamespace(
            init=pointnext_init, forward=pointnext_forward,
            Config=PointNeXtConfig,
        ),
    }
    for name, mod in entries.items():
        if name not in MODELS:
            MODELS._entries[name] = mod


_register()

"""Point-cloud baseline backbone zoo, tier 2: classic PointNet, PCT,
PointViT (Pix4Point) and DeepGCN — the remaining widely-cited baselines
the reference vendors (``PointCloud/openpoints/models/backbone/
{pointnet,pct,pointvit,deepgcn}.py``), re-designed TPU-native.

Design notes (vs the CUDA/torch originals):
- Same shared-op substrate as tier 1 (``models/point_baselines.py``):
  FPS / kNN / grouping from ``ops/point_ops.py``, per-point "1x1 convs"
  as channel-axis matmuls (one batched MXU GEMM per layer), train-mode
  BatchNorm statistics (pure function, no running-stat state).
- PointNet's STN bmm, PCT's offset attention, and DeepGCN's EdgeConv are
  all einsum/top_k compositions — no scatter, static shapes throughout.
- DeepGCN's *stochastic* dilated kNN (``graph_conv.DilatedKNN``,
  epsilon-random neighbor subset at train time) is replaced by the
  deterministic dilation it decays to at eval (every d-th neighbor of
  k*d candidates): data-dependent randomness inside jit would force a
  threaded rng for no accuracy-critical reason on a *baseline*.
- PointViT reuses ``tokenizers/point.py`` (the shared PointPatchEmbed
  replacement) and ``core/encoder.py`` blocks at its own width — the
  trainable twin of the frozen MetaTransformer point backbone, exactly
  the relationship the reference's pointvit.py has to metatransformer.py.

All four register in utils.registry.MODELS with the tier-1 classifier
contract: ``forward(params, points [B, N, 3], cfg) -> logits [B, C]``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.core import encoder as enc
from metatransformer_tpu.models.point_baselines import (
    _bn,
    _dense_init,
    _head,
    _head_init,
    _mlp,
    _mlp_init,
)
from metatransformer_tpu.ops import point_ops as po
from metatransformer_tpu.tokenizers import point as point_tok


# ---------------------------------------------------------------------------
# PointNet (classic) — openpoints/models/backbone/pointnet.py
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class PointNetConfig:
    """STN3d input transform -> 64-64 shared MLP -> STNkd(64) feature
    transform -> 64-128-1024 shared MLP -> global max (pointnet.py
    PointNetEncoder.forward_cls_feat:128-160)."""

    num_classes: int = 40
    input_transform: bool = True
    feature_transform: bool = True
    head_fcs: Tuple[int, ...] = (512, 256)


def _stn_init(key: jax.Array, k: int) -> Dict[str, Any]:
    """STN3d/STNkd: 64-128-1024 point MLP, global max, 512-256 FC, then a
    k*k regression initialized so the output starts at identity
    (pointnet.py:30,44-47,68,82-85: bias path adds eye(k))."""
    keys = jax.random.split(key, 3)
    return {
        "convs": _mlp_init(keys[0], k, (64, 128, 1024)),
        "fcs": _mlp_init(keys[1], 1024, (512, 256)),
        # final regression: zero weights + identity bias = identity start
        "out_w": jnp.zeros((256, k * k)),
        "out_b": jnp.eye(k).reshape(k * k),
    }


def _stn(params: Dict[str, Any], x: jax.Array, k: int) -> jax.Array:
    """x [B, N, k] -> transform [B, k, k]."""
    h = _mlp(x, params["convs"])
    h = jnp.max(h, axis=1)  # [B, 1024]
    h = _mlp(h, params["fcs"])
    return (h @ params["out_w"] + params["out_b"]).reshape(-1, k, k)


def pointnet_init(cfg: PointNetConfig, key: jax.Array) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 8))
    params: Dict[str, Any] = {}
    if cfg.input_transform:
        params["stn"] = _stn_init(next(keys), 3)
    params["mlp0"] = _mlp_init(next(keys), 3, (64, 64))
    if cfg.feature_transform:
        params["fstn"] = _stn_init(next(keys), 64)
    params["mlp1"] = _mlp_init(next(keys), 64, (64, 128, 1024))
    params["head"] = _head_init(next(keys), 1024, cfg.head_fcs, cfg.num_classes)
    return params


@functools.partial(jax.jit, static_argnames=("cfg",))
def pointnet_forward(
    params: Dict[str, Any], points: jax.Array, cfg: PointNetConfig
) -> jax.Array:
    x = points[..., :3]
    if cfg.input_transform:
        x = jnp.einsum("bnk,bkj->bnj", x, _stn(params["stn"], x, 3))
    x = _mlp(x, params["mlp0"])
    if cfg.feature_transform:
        x = jnp.einsum("bnk,bkj->bnj", x, _stn(params["fstn"], x, 64))
    x = _mlp(x, params["mlp1"])
    return _head(jnp.max(x, axis=1), params["head"])


def pointnet_feature_transform_regularizer(
    params: Dict[str, Any], points: jax.Array, cfg: PointNetConfig
) -> jax.Array:
    """||I - A A^T||^2 on the 64-d feature transform (the classic PointNet
    training regularizer; weight 1e-3 in the original recipe)."""
    x = points[..., :3]
    if cfg.input_transform:
        x = jnp.einsum("bnk,bkj->bnj", x, _stn(params["stn"], x, 3))
    x = _mlp(x, params["mlp0"])
    a = _stn(params["fstn"], x, 64)
    eye = jnp.eye(a.shape[-1])
    return jnp.mean(jnp.sum((eye - a @ jnp.swapaxes(a, 1, 2)) ** 2, axis=(1, 2)))


# ---------------------------------------------------------------------------
# PCT — openpoints/models/backbone/pct.py (offset-style attention stack)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class PCTConfig:
    """Pct assembly (pct.py:30-82): 3->64->64 point MLP, two
    FPS+kNN "neighbor embedding" stages (512/32 then 256/32) each with a
    Local_op (two 1x1 convs + max over k), 4 chained SA layers whose
    outputs concat with the stage-2 feature into a 1024-d fuse conv,
    global max pool, leaky-relu FC head."""

    num_classes: int = 40
    stem: Tuple[int, ...] = (64, 64)
    stage_points: Tuple[int, ...] = (512, 256)
    stage_channels: Tuple[int, ...] = (128, 256)
    k: int = 32
    num_sa: int = 4
    fuse_dim: int = 1024
    head_fcs: Tuple[int, ...] = (512, 256)


def _sa_layer_init(key: jax.Array, c: int) -> Dict[str, Any]:
    kq, kv, kt = jax.random.split(key, 3)
    return {
        # q and k share weights in the reference (pct.py:122-123)
        "qk_w": jax.random.normal(kq, (c, c // 4)) * np.sqrt(1.0 / c),
        "v_w": jax.random.normal(kv, (c, c)) * np.sqrt(1.0 / c),
        "v_b": jnp.zeros((c,)),
        "trans": _dense_init(kt, c, c),
    }


def _sa_layer(p: Dict[str, Any], x: jax.Array) -> jax.Array:
    """PCT self-attention (pct.py:131-149): shared-weight q/k at c/4,
    softmax over keys then L1 re-normalization over queries, residual
    through a BN'd transform conv."""
    q = x @ p["qk_w"]  # [B, N, c/4]
    k = x @ p["qk_w"]
    v = x @ p["v_w"] + p["v_b"]  # [B, N, c]
    energy = jnp.einsum("bnd,bmd->bnm", q, k)  # [B, query n, key m]
    attn = jax.nn.softmax(energy, axis=2)  # softmax over keys (pct.py:140)
    attn = attn / (1e-9 + jnp.sum(attn, axis=1, keepdims=True))  # L1 over
    # queries (pct.py:141) — the "offset attention" double normalization
    r = jnp.einsum("bnm,bnc->bmc", attn, v)  # token m aggregates queries
    t = p["trans"]
    r = jax.nn.relu(_bn(r @ t["w"], t["bn_scale"], t["bn_bias"]))
    return x + r


def pct_init(cfg: PCTConfig, key: jax.Array) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 16))
    params: Dict[str, Any] = {"stem": _mlp_init(next(keys), 3, cfg.stem)}
    cin = cfg.stem[-1]
    for si, c in enumerate(cfg.stage_channels):
        # Local_op input = concat([fj - fc, fc]) -> 2*cin (SubsampleGroup)
        params[f"local{si}"] = _mlp_init(next(keys), 2 * cin, (c, c))
        cin = c
    params["sa_in"] = _mlp_init(next(keys), cin, (cin, cin))
    params["sa"] = [_sa_layer_init(next(keys), cin) for _ in range(cfg.num_sa)]
    params["fuse"] = _dense_init(
        next(keys), cin * cfg.num_sa + cin, cfg.fuse_dim
    )
    params["head"] = _head_init(
        next(keys), cfg.fuse_dim, cfg.head_fcs, cfg.num_classes
    )
    return params


@functools.partial(jax.jit, static_argnames=("cfg",))
def pct_forward(
    params: Dict[str, Any], points: jax.Array, cfg: PCTConfig
) -> jax.Array:
    xyz = points[..., :3]
    x = _mlp(xyz, params["stem"])
    for si, (m, _c) in enumerate(zip(cfg.stage_points, cfg.stage_channels)):
        idx = po.furthest_point_sample(xyz, m)
        centers = po.gather_points(xyz, idx)
        center_f = po.gather_points(x, idx)  # [B, M, C]
        _, nidx = po.knn(centers, xyz, cfg.k)
        fj = po.gather_points(x, nidx)  # [B, M, K, C]
        g = jnp.concatenate(
            [fj - center_f[:, :, None, :],
             jnp.broadcast_to(center_f[:, :, None, :], fj.shape)],
            axis=-1,
        )
        g = _mlp(g, params[f"local{si}"])
        x = jnp.max(g, axis=2)  # Local_op max over the neighborhood
        xyz = centers
    h = _mlp(x, params["sa_in"])
    sa_outs = []
    for p in params["sa"]:
        h = _sa_layer(p, h)
        sa_outs.append(h)
    h = jnp.concatenate(sa_outs + [x], axis=-1)
    f = params["fuse"]
    h = jax.nn.leaky_relu(_bn(h @ f["w"], f["bn_scale"], f["bn_bias"]), 0.2)
    pooled = jnp.max(h, axis=1)
    hd = params["head"]
    for p in hd["fcs"]:
        pooled = jax.nn.leaky_relu(
            _bn(pooled @ p["w"], p["bn_scale"], p["bn_bias"]), 0.2
        )
    return pooled @ hd["out_w"] + hd["out_b"]


# ---------------------------------------------------------------------------
# PointViT (Pix4Point) — openpoints/models/backbone/pointvit.py
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class PointViTConfig:
    """PointViT: PointPatchEmbed tokens + cls token, a 3->128->dim pos-MLP
    added at every block, *trainable* ViT stack, 'cls,max' global feature
    (pointvit.py:17-120,~200). Shares the block math with core/encoder —
    this is the trainable twin of the frozen MetaTransformer backbone."""

    num_classes: int = 40
    dim: int = 384
    depth: int = 12
    num_heads: int = 6
    num_groups: int = 256
    group_size: int = 32
    head_fcs: Tuple[int, ...] = (256,)

    @property
    def encoder(self) -> enc.EncoderConfig:
        return enc.EncoderConfig(
            dim=self.dim, depth=self.depth, num_heads=self.num_heads,
            ln_eps=1e-6,
        )

    @property
    def tokenizer(self) -> point_tok.PointTokenizerConfig:
        return point_tok.PointTokenizerConfig(
            sample_ratio=self.num_groups / 1024.0,
            group_size=self.group_size,
            embed_dim=self.dim,
            feature_type="fj",
        )


def pointvit_init(cfg: PointViTConfig, key: jax.Array) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 8))
    d = cfg.dim
    return {
        "tokenizer": point_tok.init(cfg.tokenizer, next(keys)),
        "cls_token": jax.random.normal(next(keys), (1, 1, d)) * 0.02,
        "cls_pos": jax.random.normal(next(keys), (1, 1, d)) * 0.02,
        "pos_mlp": {
            "w1": jax.random.normal(next(keys), (3, 128)) * np.sqrt(2.0 / 3),
            "b1": jnp.zeros((128,)),
            "w2": jax.random.normal(next(keys), (128, d)) * np.sqrt(1.0 / 128),
            "b2": jnp.zeros((d,)),
        },
        "encoder": enc.init(cfg.encoder, next(keys)),
        "final_ln_scale": jnp.ones((d,)),
        "final_ln_bias": jnp.zeros((d,)),
        "head": _head_init(next(keys), 2 * d, cfg.head_fcs, cfg.num_classes),
    }


@functools.partial(jax.jit, static_argnames=("cfg",))
def pointvit_forward(
    params: Dict[str, Any], points: jax.Array, cfg: PointViTConfig
) -> jax.Array:
    centers, tokens = point_tok.apply(
        params["tokenizer"], points[..., :3], cfg.tokenizer
    )
    b = tokens.shape[0]
    pm = params["pos_mlp"]
    pos = jax.nn.gelu(centers @ pm["w1"] + pm["b1"]) @ pm["w2"] + pm["b2"]
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, cfg.dim))
    cls_pos = jnp.broadcast_to(params["cls_pos"], (b, 1, cfg.dim))
    x = jnp.concatenate([cls, tokens], axis=1)
    pos = jnp.concatenate([cls_pos, pos], axis=1)
    x = enc.encode(
        params["encoder"], x, cfg.encoder, pos=pos, pos_each_block=True
    )
    x = enc.layer_norm(
        x, params["final_ln_scale"], params["final_ln_bias"], 1e-6
    )
    # global_feat='cls,max' (pointvit.py:36)
    feat = jnp.concatenate([x[:, 0], jnp.max(x[:, 1:], axis=1)], axis=-1)
    return _head(feat, params["head"])


# ---------------------------------------------------------------------------
# DeepGCN — openpoints/models/backbone/deepgcn.py (res + dilated EdgeConv)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DeepGCNConfig:
    """ResGCN-style assembly (deepgcn.py:13-128): EdgeConv head on a kNN
    graph of xyz, n_blocks-1 residual dynamic EdgeConv blocks with
    dilation 1+i, concat of every block output into a leaky-relu fusion
    conv, cls feature = concat(max, avg) pooling."""

    num_classes: int = 40
    channels: int = 64
    emb_dim: int = 1024
    n_blocks: int = 7
    k: int = 16
    head_fcs: Tuple[int, ...] = (512, 256)


def _dilated_knn(x: jax.Array, k: int, d: int) -> jax.Array:
    """Every d-th of the k*d nearest neighbors (deterministic eval-mode
    semantics of graph_conv.DilatedKNN)."""
    _, idx = po.knn(x, x, k * d)
    return idx[..., ::d]


def _edge_conv_block(p: Dict[str, Any], x: jax.Array, nidx: jax.Array):
    """EdgeConv h([x_i, x_j - x_i]) + max over neighbors."""
    xj = po.gather_points(x, nidx)  # [B, N, k, C]
    e = jnp.concatenate(
        [jnp.broadcast_to(x[:, :, None, :], xj.shape), xj - x[:, :, None, :]],
        axis=-1,
    )
    e = jax.nn.relu(_bn(e @ p["w"], p["bn_scale"], p["bn_bias"]))
    return jnp.max(e, axis=2)


def deepgcn_init(cfg: DeepGCNConfig, key: jax.Array) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, cfg.n_blocks + 4))
    c = cfg.channels
    params: Dict[str, Any] = {"head_conv": _dense_init(next(keys), 2 * 3, c)}
    for i in range(cfg.n_blocks - 1):
        params[f"block{i}"] = _dense_init(next(keys), 2 * c, c)
    params["fusion"] = _dense_init(next(keys), c * cfg.n_blocks, cfg.emb_dim)
    params["head"] = _head_init(
        next(keys), 2 * cfg.emb_dim, cfg.head_fcs, cfg.num_classes
    )
    return params


@functools.partial(jax.jit, static_argnames=("cfg",))
def deepgcn_forward(
    params: Dict[str, Any], points: jax.Array, cfg: DeepGCNConfig
) -> jax.Array:
    xyz = points[..., :3]
    # head: EdgeConv on the xyz kNN graph (deepgcn.py:123)
    nidx = _dilated_knn(xyz, cfg.k, 1)
    x = _edge_conv_block(params["head_conv"], xyz, nidx)
    feats = [x]
    for i in range(cfg.n_blocks - 1):
        # dynamic graph in feature space, dilation grows per block
        nidx = _dilated_knn(feats[-1], cfg.k, 1 + i)
        h = _edge_conv_block(params[f"block{i}"], feats[-1], nidx)
        feats.append(feats[-1] + h)  # ResDynBlock residual
    h = jnp.concatenate(feats, axis=-1)
    f = params["fusion"]
    h = jax.nn.leaky_relu(_bn(h @ f["w"], f["bn_scale"], f["bn_bias"]), 0.2)
    pooled = jnp.concatenate([jnp.max(h, axis=1), jnp.mean(h, axis=1)], -1)
    return _head(pooled, params["head"])


# ---------------------------------------------------------------------------
# registry entries
# ---------------------------------------------------------------------------


def _register() -> None:
    import types

    from metatransformer_tpu.utils.registry import MODELS

    entries = {
        "PointNetEncoder": types.SimpleNamespace(
            init=pointnet_init, forward=pointnet_forward, Config=PointNetConfig
        ),
        "PCT": types.SimpleNamespace(
            init=pct_init, forward=pct_forward, Config=PCTConfig
        ),
        "PointViT": types.SimpleNamespace(
            init=pointvit_init, forward=pointvit_forward, Config=PointViTConfig
        ),
        "DeepGCN": types.SimpleNamespace(
            init=deepgcn_init, forward=deepgcn_forward, Config=DeepGCNConfig
        ),
    }
    for name, mod in entries.items():
        if name not in MODELS:
            MODELS._entries[name] = mod


_register()

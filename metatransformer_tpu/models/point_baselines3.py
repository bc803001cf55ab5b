"""Point-cloud baseline zoo, tier 4: BallDGCNN, GroupPointNet, ViTGraph —
the last vendored comparison backbones in the reference zoo
(``PointCloud/openpoints/models/backbone/{ball_dgcnn,grouppointnet,
graphvit3d}.py``), re-designed TPU-native.

- BallDGCNN (ball_dgcnn.py:13-108): DGCNN with a *static* neighbor graph
  from one ball query on xyz (vs DGCNN's per-layer feature-space kNN),
  channel-doubling EdgeConv stack, dense concat fusion, max+avg cls feat.
- GroupPointNet (grouppointnet.py:11-100): FPS downsample + kNN group,
  PointNet conv stack over (dp, grouped feats), maxpool over neighbors,
  max+avg over centers.
- ViTGraph (graphvit3d.py:11-117): PointViT variant whose group embed
  lives at a smaller dim with a projection up to the encoder dim.

Conventions match point_baselines.py: conv-act-norm ordering where the
reference uses it, train-mode batch-stat norms, static shapes, and one
classifier contract ``forward(params, points, cfg) -> logits``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.core import encoder as enc
from metatransformer_tpu.models.point_baselines import _bn, _head, _head_init
from metatransformer_tpu.ops import point_ops as po
from metatransformer_tpu.tokenizers import point as point_tok

_lrelu = functools.partial(jax.nn.leaky_relu, negative_slope=0.2)


def _conv_init(key, cin, cout):
    # kaiming normal (model_init in both reference files), bias-free
    return {
        "w": jax.random.normal(key, (cin, cout)) * np.sqrt(2.0 / cin),
        "bn_scale": jnp.ones((cout,)),
        "bn_bias": jnp.zeros((cout,)),
    }


def _conv_act_norm(p, x):
    """create_convblock order 'conv-act-norm' with leakyrelu(0.2)."""
    h = _lrelu(x @ p["w"])
    return _bn(h, p["bn_scale"], p["bn_bias"])


# ---------------------------------------------------------------------------
# BallDGCNN — ball_dgcnn.py
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class BallDGCNNConfig:
    num_classes: int = 40
    in_channels: int = 3
    channels: int = 64
    embed_dim: int = 1024
    n_blocks: int = 5
    k: int = 20
    radius: float = 0.1
    group: str = "ballquery"  # "ballquery" | "knn"
    head_fcs: Tuple[int, ...] = (512, 256)

    @property
    def block_channels(self) -> Tuple[int, ...]:
        # head emits `channels`; each of the n_blocks-2 EdgeConvs doubles
        # its *input* width after emitting (ball_dgcnn.py:61-70)
        outs = [self.channels]
        c = self.channels
        for _ in range(self.n_blocks - 2):
            outs.append(c)
            c *= 2
        return tuple(outs)


def balldgcnn_init(cfg: BallDGCNNConfig, key: jax.Array) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, cfg.n_blocks + 3))
    params: Dict[str, Any] = {"blocks": []}
    cin = cfg.in_channels
    # EdgeConv over concat(x, xj - x) -> 2*cin inputs
    outs = cfg.block_channels
    params["head_conv"] = _conv_init(next(keys), 2 * cin, outs[0])
    cin = outs[0]
    for c in outs[1:]:
        params["blocks"].append(_conv_init(next(keys), 2 * cin, c))
        cin = c
    params["fusion"] = _conv_init(next(keys), sum(outs), cfg.embed_dim)
    params["head"] = _head_init(
        next(keys), 2 * cfg.embed_dim, cfg.head_fcs, cfg.num_classes
    )
    return params


def _edge_conv(p, x, nidx):
    """EdgeConv (graph_conv.py:38-51): conv(concat(x_i, x_j - x_i)) then
    max over neighbors."""
    xj = po.gather_points(x, nidx)  # [B, N, K, C]
    e = jnp.concatenate(
        [jnp.broadcast_to(x[:, :, None, :], xj.shape), xj - x[:, :, None, :]],
        axis=-1,
    )
    return jnp.max(_conv_act_norm(p, e), axis=2)  # [B, N, Cout]


@functools.partial(jax.jit, static_argnames=("cfg",))
def balldgcnn_forward(
    params: Dict[str, Any], points: jax.Array, cfg: BallDGCNNConfig
) -> jax.Array:
    x = points[..., : cfg.in_channels]
    if cfg.group == "ballquery":
        nidx = po.ball_query(points[..., :3], points[..., :3],
                             cfg.radius, cfg.k)
    else:
        _, nidx = po.knn(points[..., :3], points[..., :3], cfg.k)
    feats = [_edge_conv(params["head_conv"], x, nidx)]
    for bp in params["blocks"]:
        feats.append(_edge_conv(bp, feats[-1], nidx))
    fused = _conv_act_norm(params["fusion"], jnp.concatenate(feats, -1))
    # forward_cls_feat: concat(max, avg) over points (:106-108)
    feat = jnp.concatenate(
        [jnp.max(fused, axis=1), jnp.mean(fused, axis=1)], axis=-1
    )
    return _head(feat, params["head"])


# ---------------------------------------------------------------------------
# GroupPointNet — grouppointnet.py
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class GroupPointNetConfig:
    num_classes: int = 40
    in_channels: int = 3
    channels: int = 64
    n_blocks: int = 5
    sample_ratio: float = 0.25
    k: int = 20
    head_fcs: Tuple[int, ...] = (256,)


def grouppointnet_init(cfg: GroupPointNetConfig, key: jax.Array) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, cfg.n_blocks + 2))
    params: Dict[str, Any] = {"backbone": []}
    cin = 2 * cfg.in_channels  # concat(dp, grouped feats) (:53,:87)
    for _ in range(cfg.n_blocks - 2):
        params["backbone"].append(_conv_init(next(keys), cin, cfg.channels))
        cin = cfg.channels
    params["head"] = _head_init(
        next(keys), 2 * cfg.channels, cfg.head_fcs, cfg.num_classes
    )
    return params


@functools.partial(jax.jit, static_argnames=("cfg",))
def grouppointnet_forward(
    params: Dict[str, Any], points: jax.Array, cfg: GroupPointNetConfig
) -> jax.Array:
    xyz = points[..., :3]
    f = points[..., : cfg.in_channels]
    m = max(int(xyz.shape[1] * cfg.sample_ratio), 1)
    idx = po.furthest_point_sample(xyz, m)
    centers = po.gather_points(xyz, idx)
    _, nidx = po.knn(centers, xyz, min(cfg.k, xyz.shape[1]))
    dp, fj = po.group_points(centers, xyz, nidx, f, relative_xyz=True)
    h = jnp.concatenate([dp, fj], axis=-1)  # [B, M, K, 2*cin]
    for bp in params["backbone"]:
        h = _conv_act_norm(bp, h)
    h = jnp.max(h, axis=2)  # maxpool over neighbors (:61,:89)
    feat = jnp.concatenate([jnp.max(h, 1), jnp.mean(h, 1)], -1)  # (:96)
    return _head(feat, params["head"])


# ---------------------------------------------------------------------------
# ViTGraph — graphvit3d.py
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ViTGraphConfig:
    """PointViT with a low-dim group embed + projection (graphvit3d.py:
    57-63: embed_args.embed_dim=256 projected up to encoder_dim=768)."""

    num_classes: int = 40
    encoder_dim: int = 768
    embed_dim: int = 256
    depth: int = 12
    num_heads: int = 12
    num_groups: int = 256
    group_size: int = 32
    head_fcs: Tuple[int, ...] = (256,)

    @property
    def encoder(self) -> enc.EncoderConfig:
        return enc.EncoderConfig(
            dim=self.encoder_dim, depth=self.depth, num_heads=self.num_heads,
            ln_eps=1e-6,
        )

    @property
    def tokenizer(self) -> point_tok.PointTokenizerConfig:
        return point_tok.PointTokenizerConfig(
            sample_ratio=self.num_groups / 1024.0,
            group_size=self.group_size,
            embed_dim=self.embed_dim,
            feature_type="fj",
        )


def vitgraph_init(cfg: ViTGraphConfig, key: jax.Array) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 9))
    d = cfg.encoder_dim
    lim = np.sqrt(6.0 / (cfg.embed_dim + d))
    return {
        "tokenizer": point_tok.init(cfg.tokenizer, next(keys)),
        "proj": {
            "w": jax.random.uniform(next(keys), (cfg.embed_dim, d),
                                    minval=-lim, maxval=lim),
            "b": jnp.zeros((d,)),
        },
        "cls_token": jnp.zeros((1, 1, d)),  # zeros init (:65)
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
def vitgraph_forward(
    params: Dict[str, Any], points: jax.Array, cfg: ViTGraphConfig
) -> jax.Array:
    centers, tokens = point_tok.apply(
        params["tokenizer"], points[..., :3], cfg.tokenizer
    )
    tokens = tokens @ params["proj"]["w"] + params["proj"]["b"]  # (:106)
    b = tokens.shape[0]
    pm = params["pos_mlp"]
    pos = jax.nn.gelu(centers @ pm["w1"] + pm["b1"]) @ pm["w2"] + pm["b2"]
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, cfg.encoder_dim))
    cls_pos = jnp.broadcast_to(params["cls_pos"], (b, 1, cfg.encoder_dim))
    x = jnp.concatenate([cls, tokens], axis=1)
    pos = jnp.concatenate([cls_pos, pos], axis=1)
    x = enc.encode(params["encoder"], x, cfg.encoder, pos=pos,
                   pos_each_block=True)
    x = enc.layer_norm(
        x, params["final_ln_scale"], params["final_ln_bias"], 1e-6
    )
    feat = jnp.concatenate([x[:, 0], jnp.max(x[:, 1:], axis=1)], axis=-1)
    return _head(feat, params["head"])


def _register() -> None:
    import types

    from metatransformer_tpu.utils.registry import MODELS

    entries = {
        "BallDGCNN": types.SimpleNamespace(
            init=balldgcnn_init, forward=balldgcnn_forward,
            Config=BallDGCNNConfig,
        ),
        "GroupPointNet": types.SimpleNamespace(
            init=grouppointnet_init, forward=grouppointnet_forward,
            Config=GroupPointNetConfig,
        ),
        "ViTGraph": types.SimpleNamespace(
            init=vitgraph_init, forward=vitgraph_forward,
            Config=ViTGraphConfig,
        ),
    }
    for name, mod in entries.items():
        if name not in MODELS:
            MODELS._entries[name] = mod


_register()

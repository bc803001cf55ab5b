"""Point-cloud tokenizer: FPS subsample + kNN group + conv embed.

Reference: ``PointCloud/openpoints/models/layers/group_embed.py:59-172``
(PointPatchEmbed) — FPS downsample by ``sample_ratio``, kNN(32) grouping,
relative-position features (feature_type dp / fj / dp_fj / dp_df / df),
two 1x1-conv stages with a max-pool bottleneck in between, final max-pool
over the group -> one token per center.

TPU-native: all "Conv2d 1x1" stages are matmuls over the channel axis on
[B, M, K, C] (channels-last); FPS/kNN come from ops.point_ops. InstanceNorm
(the backbone's norm_args {'norm':'in2d'}) is stateless normalization over
(M, K) per channel — pure function, no running stats.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from metatransformer_tpu.ops import point_ops

# conv-input channel count per feature_type (CHANNEL_MAP equivalent).
def _feature_channels(feature_type: str, in_channels: int) -> int:
    return {
        "dp": 3,
        "fj": in_channels,
        "df": in_channels,
        "dp_fj": 3 + in_channels,
        "dp_df": 3 + in_channels,
    }[feature_type]


@dataclasses.dataclass(frozen=True)
class PointTokenizerConfig:
    sample_ratio: float = 0.25
    group_size: int = 32
    in_channels: int = 3
    embed_dim: int = 768
    layers: int = 4
    subsample: str = "fps"  # "fps" | "random"
    group: str = "knn"  # "knn" | "ballquery"
    radius: float = 0.1
    feature_type: str = "dp_fj"
    relative_xyz: bool = True
    normalize_dp: bool = False
    norm: str = "in2d"  # "in2d" | "none"
    reduction: str = "max"  # "max" | "mean"
    # Matmul precision of the conv stack. "highest" = true fp32 (the
    # parity/oracle setting); "default" = bf16 multiplies with fp32
    # accumulation — the serving/bench setting, matching the BF16
    # encoder it feeds. The stack is ~3x the encoder's FLOPs (K=32
    # multiplies every stage), and fp32 emulation on the MXU measured
    # 85.4 -> 24.5 ms/call (B=32, N=1024) going to "default".
    precision: str = "highest"  # "highest" | "default"

    @property
    def channels(self) -> Tuple[int, ...]:
        c0 = _feature_channels(self.feature_type, self.in_channels)
        half = self.layers // 2
        chans = [c0] + [self.embed_dim] * half + [self.embed_dim * 2] * (half - 1)
        chans.append(self.embed_dim)
        return tuple(chans)


def init(cfg: PointTokenizerConfig, key: jax.Array) -> Dict[str, jax.Array]:
    chans = list(cfg.channels)
    half = cfg.layers // 2
    params: Dict[str, jax.Array] = {}
    keys = jax.random.split(key, cfg.layers)
    # conv1: stages 0..half-1 over chans; conv2 input doubles (maxpool concat)
    for i in range(cfg.layers):
        cin = chans[i] * (2 if i == half else 1)
        cout = chans[i + 1]
        params[f"w{i}"] = jax.random.normal(keys[i], (cin, cout)) * (cin**-0.5)
        params[f"b{i}"] = jnp.zeros((cout,), jnp.float32)
    return params


def _instance_norm(x: jax.Array) -> jax.Array:
    """InstanceNorm2d(affine=False) over the (M, K) axes per channel."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + 1e-5)


def _conv_stage(x, params, cfg, idx, with_norm_act, mm):
    x = jnp.dot(x, params[f"w{idx}"], precision=mm) + params[f"b{idx}"]
    if with_norm_act:
        if cfg.norm == "in2d":
            x = _instance_norm(x)
        x = jax.nn.relu(x)
    return x


def _pool(x: jax.Array, cfg: PointTokenizerConfig) -> jax.Array:
    """Reduce over the group axis K: [B, M, K, C] -> [B, M, 1, C]."""
    if cfg.reduction in ("mean", "avg"):
        return jnp.mean(x, axis=2, keepdims=True)
    return jnp.max(x, axis=2, keepdims=True)


def apply(
    params: Dict[str, jax.Array],
    points: jax.Array,  # [B, N, 3]
    cfg: PointTokenizerConfig,
    features: Optional[jax.Array] = None,  # [B, N, C]; default = xyz
    rng: Optional[jax.Array] = None,  # for subsample='random'
    mm: Optional[jax.lax.Precision] = None,  # None -> cfg.precision
    return_grouped: bool = False,
):
    """-> (center_p [B, M, 3], tokens [B, M, embed_dim]); with
    ``return_grouped`` also the relative grouped coords dp [B, M, K, 3]
    (the reconstruction target of MaskedPointViT — group_embed.py returns
    grouped_xyz alongside the tokens for exactly this use)."""
    if mm is None:
        mm = (
            jax.lax.Precision.HIGHEST
            if cfg.precision == "highest"
            else jax.lax.Precision.DEFAULT
        )
    b, n, _ = points.shape
    m = int(n * cfg.sample_ratio)
    x = points if features is None else features

    if cfg.subsample == "fps":
        idx = point_ops.furthest_point_sample(points, m)
    else:
        assert rng is not None, "random subsample needs an rng"
        idx = point_ops.random_sample(rng, points, m)
    center_p = point_ops.gather_points(points, idx)  # [B, M, 3]

    if cfg.group == "knn":
        _, nidx = point_ops.knn(center_p, points, cfg.group_size)
    else:
        nidx = point_ops.ball_query(center_p, points, cfg.radius, cfg.group_size)
    dp, fj = point_ops.group_points(
        center_p, points, nidx, x,
        relative_xyz=cfg.relative_xyz, normalize_dp=cfg.normalize_dp,
    )  # dp [B,M,K,3], fj [B,M,K,C]

    if cfg.feature_type == "dp":
        feats = dp
    elif cfg.feature_type == "fj":
        feats = fj
    elif cfg.feature_type == "dp_fj":
        feats = jnp.concatenate([dp, fj], axis=-1)
    else:  # df / dp_df: subtract center features
        center_x = point_ops.gather_points(x, idx)[:, :, None, :]
        df = fj - center_x
        feats = df if cfg.feature_type == "df" else jnp.concatenate([dp, df], -1)

    half = cfg.layers // 2
    h = feats
    for i in range(half):
        h = _conv_stage(h, params, cfg, i, with_norm_act=(i != half - 1), mm=mm)
    pooled = jnp.broadcast_to(_pool(h, cfg), h.shape)
    h = jnp.concatenate([pooled, h], axis=-1)
    for i in range(half, cfg.layers):
        h = _conv_stage(h, params, cfg, i, with_norm_act=(i != cfg.layers - 1), mm=mm)
    tokens = _pool(h, cfg)[:, :, 0, :]  # [B, M, D]
    if return_grouped:
        return center_p, tokens, dp
    return center_p, tokens

"""Multi-dataset fusion (MDF): per-dataset norms + domain attention.

Reference: joint Waymo+nuScenes training in AutonomousDriving —
``pcdet/utils/uni3d_norm.py:230,301,372`` (UniNorm{1,2,3}d: one BN per
dataset, switched by ``dataset_from_flag``) and the SE-style domain
attention blocks (``mdf_models/dense_cr.py:108-148``): per-dataset SE
adapters whose outputs are mixed by a softmax over datasets.

TPU-native: the dataset id is a traced scalar — per-dataset parameters
are stacked on a leading axis and selected with a gather, so one compiled
program serves every dataset (no Python branching per batch).
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class UniNormConfig:
    channels: int
    num_datasets: int = 2
    eps: float = 1e-5


def uni_norm_init(cfg: UniNormConfig) -> Dict[str, jax.Array]:
    return {
        "scale": jnp.ones((cfg.num_datasets, cfg.channels), jnp.float32),
        "bias": jnp.zeros((cfg.num_datasets, cfg.channels), jnp.float32),
    }


def uni_norm_apply(
    params: Dict[str, jax.Array],
    x: jax.Array,  # [..., C], normalized over all but the channel axis
    dataset_id: jax.Array,  # scalar int
    cfg: UniNormConfig,
) -> jax.Array:
    """Instance statistics + per-dataset affine (UniNorm semantics: shared
    compute, dataset-specific affine/statistics switch)."""
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    xn = (x - mean) * jax.lax.rsqrt(var + cfg.eps)
    scale = params["scale"][dataset_id]
    bias = params["bias"][dataset_id]
    return xn * scale + bias


@dataclasses.dataclass(frozen=True)
class DomainAttentionConfig:
    channels: int
    num_datasets: int = 2
    reduction: int = 16

    @property
    def hidden(self) -> int:
        return max(self.channels // self.reduction, 4)


def domain_attention_init(
    cfg: DomainAttentionConfig, key: jax.Array
) -> Dict[str, jax.Array]:
    k1, k2, k3 = jax.random.split(key, 3)
    c, h, d = cfg.channels, cfg.hidden, cfg.num_datasets
    return {
        # per-dataset SE adapters [D, ...]
        "se_w1": jax.random.normal(k1, (d, c, h)) * c**-0.5,
        "se_w2": jax.random.normal(k2, (d, h, c)) * h**-0.5,
        # domain-attention router
        "route_w": jax.random.normal(k3, (c, d)) * c**-0.5,
    }


def domain_attention_apply(
    params: Dict[str, jax.Array],
    x: jax.Array,  # [B, ..., C]
    cfg: DomainAttentionConfig,
) -> jax.Array:
    """SE recalibration mixed across dataset adapters by a learned softmax
    router (dense_cr.py domain attention)."""
    axes = tuple(range(1, x.ndim - 1))
    squeeze = jnp.mean(x, axis=axes)  # [B, C]
    # every adapter's excitation: [B, D, C]
    h = jax.nn.relu(jnp.einsum("bc,dch->bdh", squeeze, params["se_w1"]))
    exc = jax.nn.sigmoid(jnp.einsum("bdh,dhc->bdc", h, params["se_w2"]))
    route = jax.nn.softmax(squeeze @ params["route_w"], axis=-1)  # [B, D]
    gate = jnp.einsum("bdc,bd->bc", exc, route)
    return x * gate.reshape(gate.shape[0], *([1] * len(axes)), gate.shape[-1])


# ---------------------------------------------------------------------------
# MDF-wired model: the composition the reference builds with
# build_network_multi_db (models/__init__.py:27-34): shared trunk with
# UniNorm switched by dataset_from_flag + domain attention before the head.
# Used by train/multi_db.make_merged_step (and as the wiring example).
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MDFClassifierConfig:
    in_dim: int = 16
    hidden: int = 32
    num_classes: int = 4
    num_datasets: int = 2

    @property
    def norm1(self) -> UniNormConfig:
        return UniNormConfig(self.hidden, self.num_datasets)

    @property
    def dattn(self) -> DomainAttentionConfig:
        return DomainAttentionConfig(self.hidden, self.num_datasets, reduction=4)


def mdf_classifier_init(cfg: MDFClassifierConfig, key: jax.Array):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "fc1_w": jax.random.normal(k1, (cfg.in_dim, cfg.hidden)) * cfg.in_dim**-0.5,
        "fc1_b": jnp.zeros((cfg.hidden,)),
        "norm1": uni_norm_init(cfg.norm1),
        "dattn": domain_attention_init(cfg.dattn, k2),
        "head_w": jax.random.normal(k3, (cfg.hidden, cfg.num_classes))
        * cfg.hidden**-0.5,
        "head_b": jnp.zeros((cfg.num_classes,)),
    }


def mdf_classifier_forward(
    params, x: jax.Array, dataset_id: jax.Array, cfg: MDFClassifierConfig
) -> jax.Array:
    """x [B, in_dim], dataset_id traced scalar -> logits [B, C]."""
    h = jnp.dot(x, params["fc1_w"]) + params["fc1_b"]
    h = uni_norm_apply(params["norm1"], h, dataset_id, cfg.norm1)
    h = jax.nn.relu(h)
    h = domain_attention_apply(params["dattn"], h[:, None, :], cfg.dattn)[:, 0]
    return jnp.dot(h, params["head_w"]) + params["head_b"]

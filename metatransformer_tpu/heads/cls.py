"""Classification heads.

Covers the head zoo of the reference: the plain ``mlp_head``
(LayerNorm + Linear, ``Audio/src/models/ast_models.py:74``,
``Hyper-spectrum/metatransformer.py:126-129``, ``X-Ray/train.py``) and the
openpoints ``ClsHead`` MLP stack (Linear->norm->act->dropout per layer,
``PointCloud/openpoints/models/classification/cls_base.py:78-126``).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ClsHeadConfig:
    in_dim: int
    num_classes: int
    # Hidden layer widths; () = single Linear (timm-style mlp_head).
    mlps: Sequence[int] = ()
    use_norm: bool = True  # LayerNorm before the stack (mlp_head style)
    dropout: float = 0.0  # applied before each Linear at train time
    ln_eps: float = 1e-6

    def __post_init__(self):
        object.__setattr__(self, "mlps", tuple(self.mlps))


def init(cfg: ClsHeadConfig, key: jax.Array) -> Dict[str, jax.Array]:
    dims = [cfg.in_dim, *cfg.mlps, cfg.num_classes]
    params: Dict[str, jax.Array] = {}
    if cfg.use_norm:
        params["norm_scale"] = jnp.ones((cfg.in_dim,), jnp.float32)
        params["norm_bias"] = jnp.zeros((cfg.in_dim,), jnp.float32)
    keys = jax.random.split(key, len(dims) - 1)
    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        params[f"w{i}"] = jax.random.normal(keys[i], (din, dout), jnp.float32) * (
            din**-0.5
        )
        params[f"b{i}"] = jnp.zeros((dout,), jnp.float32)
    return params


def apply(
    params: Dict[str, jax.Array],
    x: jax.Array,
    cfg: ClsHeadConfig,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    mm: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """[B, in_dim] features -> [B, num_classes] logits."""
    if cfg.use_norm:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        x = (
            (xf - mean) * jax.lax.rsqrt(var + cfg.ln_eps) * params["norm_scale"]
            + params["norm_bias"]
        ).astype(x.dtype)
    n_layers = len(cfg.mlps) + 1
    for i in range(n_layers):
        if train and cfg.dropout > 0.0:
            assert rng is not None, "dropout needs an rng at train time"
            rng, sub = jax.random.split(rng)
            keep = jax.random.bernoulli(sub, 1.0 - cfg.dropout, x.shape)
            x = jnp.where(keep, x / (1.0 - cfg.dropout), 0.0)
        x = jnp.dot(x, params[f"w{i}"], precision=mm) + params[f"b{i}"]
        if i < n_layers - 1:
            x = jax.nn.relu(x)
    return x

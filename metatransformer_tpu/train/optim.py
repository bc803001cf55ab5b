"""Optimizer factory: optax + layer-wise LR decay + frozen masking.

Replaces the reference's three optimizer stacks: timm-derived optimizers
(``PointCloud/openpoints/optim/``, 2153 LoC of adamw/lamb/lars/...),
mmcv's ``LayerDecayOptimizerConstructor``
(``Image/segmentation/mmcv_custom/layer_decay_optimizer_constructor.py``)
and Video's layer-decay ``optim_factory.py`` — all as optax transforms.

Layer decay on the scan-stacked encoder: every leaf carries a leading
depth axis, so per-layer LR scaling is one broadcast multiply of a
[depth]-shaped factor — no param-group bookkeeping.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax


def make_optimizer(
    name: str = "adamw",
    lr: float | Callable = 1e-3,
    weight_decay: float = 0.05,
    betas=(0.9, 0.999),
    momentum: float = 0.9,
    grad_clip: Optional[float] = None,
) -> optax.GradientTransformation:
    """The reference's optimizer zoo, by name."""
    name = name.lower()
    if name == "adamw":
        tx = optax.adamw(lr, b1=betas[0], b2=betas[1], weight_decay=weight_decay)
    elif name == "adam":
        tx = optax.adam(lr, b1=betas[0], b2=betas[1])
    elif name == "sgd":
        tx = optax.sgd(lr, momentum=momentum, nesterov=True)
    elif name == "lamb":
        tx = optax.lamb(lr, b1=betas[0], b2=betas[1], weight_decay=weight_decay)
    elif name == "lars":
        tx = optax.lars(lr, weight_decay=weight_decay, momentum=momentum)
    elif name == "adabelief":
        tx = optax.adabelief(lr, b1=betas[0], b2=betas[1])
    elif name == "radam":
        tx = optax.radam(lr, b1=betas[0], b2=betas[1])
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def layer_decay_factors(depth: int, decay_rate: float):
    """Per-layer LR factors, timm/mmcv convention (mmcv_custom
    ``LayerDecayOptimizerConstructor``: scale = rate**(num_layers-layer_id-1)
    with num_layers = depth + 2; Video ``optim_factory``: rate**(depth+1-i)):
    encoder block i gets decay_rate**(depth - i), the embedding/tokenizer
    gets decay_rate**(depth + 1), the head gets 1.0.

    Returns (embed_factor, [depth] encoder factors, head_factor=1.0).
    """
    embed = decay_rate ** (depth + 1)
    layers = jnp.asarray(
        [decay_rate ** (depth - i) for i in range(depth)], jnp.float32
    )
    return float(embed), layers, 1.0


def scale_by_layer_decay(
    decay_rate: float,
    depth: int,
    encoder_key: str = "encoder",
    tokenizer_keys=("tokenizer", "pos_embed", "prefix_tokens", "cls_token", "cls_pos"),
) -> optax.GradientTransformation:
    """Multiply updates by per-layer factors.

    Stacked encoder leaves ([depth, ...]) get a broadcast [depth] factor;
    tokenizer/embedding subtrees get the deepest (smallest) factor; heads
    and everything else keep factor 1.0 — matching
    ``get_num_layer_for_vit`` semantics (mmcv_custom :17-44).
    """
    embed_f, layer_f, _ = layer_decay_factors(depth, decay_rate)

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def scale(path, u):
            top = path[0].key if path else None
            if top == encoder_key:
                shape = (depth,) + (1,) * (u.ndim - 1)
                return u * layer_f.reshape(shape).astype(u.dtype)
            if top in tokenizer_keys:
                return u * embed_f
            return u

        return (
            jax.tree_util.tree_map_with_path(scale, updates),
            state,
        )

    return optax.GradientTransformation(init_fn, update_fn)


def build(
    name: str,
    lr,
    weight_decay: float = 0.05,
    layer_decay: Optional[float] = None,
    encoder_depth: int = 12,
    grad_clip: Optional[float] = None,
    **kw,
) -> optax.GradientTransformation:
    """One-stop factory: optimizer (+ optional grad clip + layer decay)."""
    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(make_optimizer(name, lr, weight_decay, **kw))
    if layer_decay is not None and layer_decay < 1.0:
        chain.append(scale_by_layer_decay(layer_decay, encoder_depth))
    return optax.chain(*chain)

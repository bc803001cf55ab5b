"""Exponential moving average of params (Video's ModelEma,
``run_class_finetuning.py:678-685`` / timm ModelEma semantics)."""

from __future__ import annotations

from typing import Any

import jax


def init(params: Any) -> Any:
    # Must COPY: the train step donates its param buffers, and an aliased
    # EMA tree would reference deleted arrays after the first step.
    import jax.numpy as jnp

    return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)


def update(ema_params: Any, params: Any, decay: float = 0.9999) -> Any:
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params,
        params,
    )

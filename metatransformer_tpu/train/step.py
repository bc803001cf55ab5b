"""Training step: frozen-encoder fine-tuning, the reference's core recipe.

The reference freezes the shared encoder (``requires_grad=False`` in eight
places) and trains only tokenizer + head. TPU-native equivalent: split the
param pytree into trainable/frozen, differentiate only the trainable part
(the frozen subtree is a closure constant — XLA constant-folds it out of
the backward pass), and let GSPMD all-reduce the grads over the data axis.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

# Subtrees held frozen in the canonical recipe.
FROZEN_KEYS = ("encoder",)


def split_params(
    params: Dict[str, Any], frozen_keys=FROZEN_KEYS
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    trainable = {k: v for k, v in params.items() if k not in frozen_keys}
    frozen = {k: v for k, v in params.items() if k in frozen_keys}
    return trainable, frozen


def merge_params(trainable: Dict[str, Any], frozen: Dict[str, Any]) -> Dict[str, Any]:
    return {**trainable, **frozen}


def cross_entropy_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def make_train_step(
    forward: Callable[[Dict[str, Any], jax.Array, jax.Array], jax.Array],
    optimizer: optax.GradientTransformation,
    loss_fn: Callable[[jax.Array, jax.Array], jax.Array] = cross_entropy_loss,
):
    """Build a jittable (trainable, frozen, opt_state, batch, rng) -> step fn.

    ``forward(params, inputs, rng) -> logits`` must be a pure function.
    """

    def train_step(trainable, frozen, opt_state, batch, rng):
        def compute_loss(tr):
            logits = forward(merge_params(tr, frozen), batch["input"], rng)
            return loss_fn(logits, batch.get("label")), logits

        (loss, logits), grads = jax.value_and_grad(compute_loss, has_aux=True)(
            trainable
        )
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        # Accuracy only makes sense when forward returns class logits and
        # the label is an integer id per sample; structured tasks (detection,
        # segmentation-with-loss-in-forward) report loss only. Shapes are
        # static under trace, so this is a Python-level branch.
        label = batch.get("label")
        is_cls = (
            label is not None
            and hasattr(logits, "ndim")
            and hasattr(label, "ndim")
            and logits.ndim == label.ndim + 1
            and jnp.issubdtype(jnp.asarray(label).dtype, jnp.integer)
        )
        acc = (
            jnp.mean((jnp.argmax(logits, -1) == label).astype(jnp.float32))
            if is_cls
            else jnp.zeros(())
        )
        metrics = {"loss": loss, "acc": acc}
        return trainable, opt_state, metrics

    return train_step

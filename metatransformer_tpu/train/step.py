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


def _accuracy(logits, label) -> jax.Array:
    # Accuracy only makes sense when forward returns class logits and
    # the label is an integer id per sample; structured tasks (detection,
    # segmentation-with-loss-in-forward) report loss only. Shapes are
    # static under trace, so this is a Python-level branch.
    is_cls = (
        label is not None
        and hasattr(logits, "ndim")
        and hasattr(label, "ndim")
        and logits.ndim == label.ndim + 1
        and jnp.issubdtype(jnp.asarray(label).dtype, jnp.integer)
    )
    if not is_cls:
        return jnp.zeros(())
    return jnp.mean((jnp.argmax(logits, -1) == label).astype(jnp.float32))


def make_train_step(
    forward: Callable[[Dict[str, Any], jax.Array, jax.Array], jax.Array],
    optimizer: optax.GradientTransformation,
    loss_fn: Callable[[jax.Array, jax.Array], jax.Array] = cross_entropy_loss,
    accum_steps: int = 1,
):
    """Build a jittable (trainable, frozen, opt_state, batch, rng) -> step fn.

    ``forward(params, inputs, rng) -> logits`` must be a pure function.

    ``accum_steps > 1`` is gradient accumulation (the reference's
    ``accum_iter`` in ``Video/engine_for_finetuning.py:46-118`` / fairseq
    ``update_freq``), done the TPU way: the batch's leading axis is
    reshaped to [accum, B/accum, ...] and a ``lax.scan`` runs the
    microbatch forward+backward inside ONE jitted step, so peak
    activation memory is per-microbatch while the optimizer sees the
    full-batch mean gradient in a single update. Requires
    ``B % accum_steps == 0``; each microbatch gets its own rng fold.
    """

    def loss_and_grads(trainable, frozen, batch, rng):
        def compute_loss(tr):
            logits = forward(merge_params(tr, frozen), batch["input"], rng)
            return loss_fn(logits, batch.get("label")), logits

        return jax.value_and_grad(compute_loss, has_aux=True)(trainable)

    def train_step(trainable, frozen, opt_state, batch, rng):
        if accum_steps == 1:
            (loss, logits), grads = loss_and_grads(trainable, frozen, batch, rng)
            acc = _accuracy(logits, batch.get("label"))
        else:
            def to_micro(x):
                x = jnp.asarray(x)
                if x.ndim == 0 or x.shape[0] % accum_steps:
                    raise ValueError(
                        f"batch axis {getattr(x, 'shape', ())} not divisible "
                        f"by accum_steps={accum_steps}"
                    )
                return x.reshape((accum_steps, -1) + x.shape[1:])

            micro = jax.tree.map(to_micro, batch)
            rngs = (
                jax.random.split(rng, accum_steps)
                if rng is not None
                else jnp.zeros((accum_steps, 0))
            )

            def body(carry, xs):
                g_acc, loss_acc, acc_acc = carry
                mb, r = xs
                (loss, logits), grads = loss_and_grads(
                    trainable, frozen, mb, r if rng is not None else None
                )
                acc = _accuracy(logits, mb.get("label"))
                g_acc = jax.tree.map(jnp.add, g_acc, grads)
                return (g_acc, loss_acc + loss, acc_acc + acc), None

            zeros = jax.tree.map(jnp.zeros_like, trainable)
            (grads, loss, acc), _ = jax.lax.scan(
                body, (zeros, jnp.zeros(()), jnp.zeros(())), (micro, rngs)
            )
            inv = 1.0 / accum_steps
            grads = jax.tree.map(lambda g: g * inv, grads)
            loss, acc = loss * inv, acc * inv

        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        metrics = {"loss": loss, "acc": acc}
        return trainable, opt_state, metrics

    return train_step

"""Loss zoo: the reference's criterions as pure functions.

Covers: CE + label-smoothing CE (openpoints SmoothCrossEntropy, smoothing
0.2 in the ModelNet40 recipe), BCE-with-logits (Audio run_sc BCE), focal
(mmseg_custom losses + Tabular focal option), dice (mmseg_custom), L1
(Graph criterion), MAE/MSE (Time-Series), and soft-target CE for mixup.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax


def cross_entropy(logits, labels, label_smoothing: float = 0.0):
    if label_smoothing > 0.0:
        n = logits.shape[-1]
        onehot = jax.nn.one_hot(labels, n)
        soft = onehot * (1 - label_smoothing) + label_smoothing / n
        return jnp.mean(optax.softmax_cross_entropy(logits, soft))
    return jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    )


def soft_cross_entropy(logits, target_probs):
    """CE against soft targets (mixup/distillation)."""
    return jnp.mean(optax.softmax_cross_entropy(logits, target_probs))


def bce_with_logits(logits, targets):
    """Audio's BCEWithLogitsLoss over multi-hot targets."""
    return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, targets))


def focal(logits, labels, gamma: float = 2.0, alpha: float = 0.25):
    """Sigmoid focal loss (mmseg_custom/models/losses/focal_loss.py intent)."""
    n = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, n)
    p = jax.nn.sigmoid(logits)
    ce = optax.sigmoid_binary_cross_entropy(logits, onehot)
    p_t = p * onehot + (1 - p) * (1 - onehot)
    a_t = alpha * onehot + (1 - alpha) * (1 - onehot)
    return jnp.mean(a_t * ((1 - p_t) ** gamma) * ce)


def dice(logits, labels, eps: float = 1.0):
    """Dice loss over per-class probability maps (mmseg_custom dice_loss)."""
    n = logits.shape[-1]
    probs = jax.nn.softmax(logits, -1)
    onehot = jax.nn.one_hot(labels, n)
    probs = probs.reshape(-1, n)
    onehot = onehot.reshape(-1, n)
    inter = jnp.sum(probs * onehot, axis=0)
    denom = jnp.sum(probs, axis=0) + jnp.sum(onehot, axis=0)
    return 1.0 - jnp.mean((2 * inter + eps) / (denom + eps))


def l1(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def mse(pred, target):
    return jnp.mean(jnp.square(pred - target))


def masked_mse(pred, target, mask):
    """Imputation loss on masked positions only."""
    m = mask.astype(pred.dtype)
    return jnp.sum(jnp.square(pred - target) * m) / jnp.maximum(jnp.sum(m), 1.0)

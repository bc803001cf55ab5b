"""Hungarian matching + DETR-style match costs.

Reference: the mmseg_custom Mask2Former/MaskFormer assigners use scipy's
Hungarian algorithm over class/mask/dice costs
(``Image/segmentation/mmseg_custom/models/utils/`` assigner + match
costs, SURVEY.md §2.2). Cost construction is jittable jnp; the
assignment itself runs on host via scipy (tiny problem, data-dependent
control flow — exactly what should NOT be jitted), with a pure-JAX
greedy fallback for fully-fused pipelines.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def classification_cost(pred_logits: jax.Array, gt_labels: jax.Array) -> jax.Array:
    """-P(class) cost [Q, G] (ClassificationCost)."""
    probs = jax.nn.softmax(pred_logits, axis=-1)
    return -probs[:, gt_labels]


def bbox_l1_cost(pred_boxes: jax.Array, gt_boxes: jax.Array) -> jax.Array:
    """L1 box cost [Q, G] (BBoxL1Cost)."""
    return jnp.sum(
        jnp.abs(pred_boxes[:, None, :] - gt_boxes[None, :, :]), axis=-1
    )


def focal_mask_cost(
    pred_masks: jax.Array,  # [Q, H*W] logits
    gt_masks: jax.Array,  # [G, H*W] {0,1}
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jax.Array:
    """Sigmoid-focal mask cost (FocalLossCost with binary masks)."""
    p = jax.nn.sigmoid(pred_masks)
    pos = alpha * ((1 - p) ** gamma) * (-jnp.log(jnp.clip(p, 1e-8)))
    neg = (1 - alpha) * (p**gamma) * (-jnp.log(jnp.clip(1 - p, 1e-8)))
    return pos @ gt_masks.T + neg @ (1 - gt_masks).T


def dice_cost(pred_masks: jax.Array, gt_masks: jax.Array, eps: float = 1.0):
    """Dice cost [Q, G] (DiceCost)."""
    p = jax.nn.sigmoid(pred_masks)
    inter = 2.0 * (p @ gt_masks.T)
    denom = jnp.sum(p, -1)[:, None] + jnp.sum(gt_masks, -1)[None, :]
    return 1.0 - (inter + eps) / (denom + eps)


def hungarian_assign(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Optimal assignment on host (scipy); cost [Q, G] -> (row_idx, col_idx)."""
    from scipy.optimize import linear_sum_assignment

    return linear_sum_assignment(np.asarray(cost))


def greedy_assign(cost: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Pure-JAX greedy fallback: repeatedly take the globally cheapest
    unassigned (query, gt) pair. Not optimal, but jittable for fully
    fused pipelines; -> (query_idx [G], gt_idx [G]) for G = cost.shape[1].
    """
    q, g = cost.shape

    def body(i, state):
        c, rows, cols = state
        flat = jnp.argmin(c)
        r, col = flat // g, flat % g
        rows = rows.at[i].set(r)
        cols = cols.at[i].set(col)
        c = c.at[r, :].set(jnp.inf)
        c = c.at[:, col].set(jnp.inf)
        return c, rows, cols

    init = (
        cost.astype(jnp.float32),
        jnp.zeros((g,), jnp.int32),
        jnp.zeros((g,), jnp.int32),
    )
    _, rows, cols = jax.lax.fori_loop(0, g, body, init)
    return rows, cols

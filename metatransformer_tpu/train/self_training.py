"""Semi-/self-supervised training utilities.

Reference: AutonomousDriving's SSL stack — pseudo-label store + quality
gating (``pcdet/utils/self_training_utils.py:20-232``), memory ensemble
(``memory_ensemble_utils.py``), SESS-style teacher-student consistency
(``tools/ssl_utils/``), and PointContrast pretraining
(``tools/unsupervised_utils/pointcontrast_utils.py``).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def pseudo_labels(
    logits: jax.Array, threshold: float = 0.9
) -> Tuple[jax.Array, jax.Array]:
    """Confidence-gated hard labels: -> (labels [B], keep [B])."""
    probs = jax.nn.softmax(logits, axis=-1)
    conf = jnp.max(probs, axis=-1)
    return jnp.argmax(probs, axis=-1), conf >= threshold


def memory_ensemble_update(
    stored_logits: jax.Array,  # [B, C] running pseudo-label logits
    new_logits: jax.Array,
    momentum: float = 0.9,
) -> jax.Array:
    """Memory-ensemble-style smoothing of pseudo labels across rounds."""
    return stored_logits * momentum + new_logits * (1.0 - momentum)


def consistency_loss(
    student_logits: jax.Array, teacher_logits: jax.Array
) -> jax.Array:
    """SESS-style teacher-student consistency: KL(student || sg(teacher))."""
    t = jax.lax.stop_gradient(jax.nn.softmax(teacher_logits, axis=-1))
    log_s = jax.nn.log_softmax(student_logits, axis=-1)
    return -jnp.mean(jnp.sum(t * log_s, axis=-1))


def info_nce(
    feats_a: jax.Array,  # [N, D] matched point/crop features, view A
    feats_b: jax.Array,  # [N, D] same points, view B
    temperature: float = 0.07,
) -> jax.Array:
    """PointContrast InfoNCE over matched features of two augmented views."""
    a = feats_a / jnp.maximum(jnp.linalg.norm(feats_a, axis=-1, keepdims=True), 1e-8)
    b = feats_b / jnp.maximum(jnp.linalg.norm(feats_b, axis=-1, keepdims=True), 1e-8)
    logits = (a @ b.T) / temperature
    labels = jnp.arange(a.shape[0])
    loss_ab = -jnp.mean(
        jax.nn.log_softmax(logits, axis=-1)[labels, labels]
    )
    loss_ba = -jnp.mean(
        jax.nn.log_softmax(logits.T, axis=-1)[labels, labels]
    )
    return 0.5 * (loss_ab + loss_ba)


def mean_teacher_update(teacher: Dict, student: Dict, decay: float = 0.999):
    """EMA teacher update (the SSL teacher is the EMA of the student)."""
    return jax.tree_util.tree_map(
        lambda t, s: t * decay + s * (1.0 - decay), teacher, student
    )

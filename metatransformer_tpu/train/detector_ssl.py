"""Box-level self-training for 3D detectors (the SemiSECOND pipeline).

Reference: ``AutonomousDriving/pcdet/utils/self_training_utils.py`` +
``models/detectors/semi_second.py`` — the teacher detects on unlabeled
scans, its boxes are quality-gated into pseudo ground truth
(``save_pseudo_label_batch``: score threshold + NMS + per-class
filtering), the student trains on those boxes with the ordinary
detection loss, and the teacher tracks the student by EMA
(``mean_teacher`` in semi_second.py).

TPU-native: pseudo boxes live in fixed-capacity [B, G, 7] arrays with a
validity mask (no ragged per-scene lists), so the student step is one
jittable program; gating runs on host numpy like the reference's
pseudo-label store.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.train.self_training import mean_teacher_update


@dataclasses.dataclass(frozen=True)
class PseudoBoxConfig:
    score_thresh: float = 0.6  # THRESH in self_training cfgs
    max_boxes: int = 32  # fixed pseudo-gt capacity per scan
    min_boxes: int = 0


def gate_pseudo_boxes(
    dets: List[Dict[str, np.ndarray]],  # detector predict() output
    cfg: PseudoBoxConfig,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Teacher detections -> (boxes [B, G, 7], labels [B, G],
    valid [B, G]) pseudo ground truth (save_pseudo_label_batch gating:
    keep NMS survivors above the score threshold, capacity-capped by
    score rank)."""
    b = len(dets)
    g = cfg.max_boxes
    boxes = np.zeros((b, g, 7), np.float32)
    labels = np.zeros((b, g), np.int32)
    valid = np.zeros((b, g), bool)
    for i, d in enumerate(dets):
        keep = np.asarray(d["valid"]) & (np.asarray(d["scores"]) >= cfg.score_thresh)
        idx = np.argsort(-np.asarray(d["scores"]))
        idx = idx[keep[idx]][:g]
        n = len(idx)
        boxes[i, :n] = np.asarray(d["boxes"])[idx]
        if "labels" in d:
            labels[i, :n] = np.asarray(d["labels"])[idx]
        valid[i, :n] = True
    return boxes, labels, valid


def make_self_training_step(
    loss_fn: Callable,  # (params, points, gt_boxes, gt_valid) -> (loss, logs)
    optimizer,
    ema_decay: float = 0.999,
):
    """One student update on pseudo boxes + EMA teacher update
    (semi_second.py teacher/student roles). ``loss_fn`` is any
    detector's training loss closed over its config/anchors."""

    @jax.jit
    def step(student, teacher, opt_state, points, pboxes, pvalid):
        def total(p):
            return loss_fn(p, points, pboxes, pvalid)

        (loss, logs), grads = jax.value_and_grad(total, has_aux=True)(student)
        updates, opt_state = optimizer.update(grads, opt_state, student)
        import optax

        student = optax.apply_updates(student, updates)
        teacher = mean_teacher_update(teacher, student, ema_decay)
        return student, teacher, opt_state, loss, logs

    return step

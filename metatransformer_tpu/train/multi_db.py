"""Multi-dataset fusion (MDF) + self-training orchestration.

Reference machinery this replaces:

* ``AutonomousDriving/tools/train_multi_db.py`` /
  ``train_multi_db_merge_loss.py`` — paired per-dataset dataloaders and a
  step that merges both datasets' losses into one optimizer update.
* ``pcdet/utils/self_training_utils.py:20-232`` — a pseudo-label store
  filled by the (teacher) model with confidence gating, refreshed every
  few epochs, optionally smoothed by the memory ensemble
  (``memory_ensemble_utils.py``).

TPU-native: the merged step is ONE jitted program — both datasets'
batches go through the same compiled forward with a traced ``dataset_id``
(per-dataset params are gathered, models/mdf.py), so XLA compiles one
executable for the whole MDF loop. The pseudo-label store is host-side
numpy keyed by sample id (it is IO/state, not compute), saved as npz.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Iterable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.train import self_training as ssl


def paired_batches(
    loader_a: Iterable, loader_b: Iterable, steps: int
) -> Iterator[Tuple[Any, Any]]:
    """Zip two dataset loaders for `steps` steps, restarting whichever
    runs out (train_multi_db.py's alternating source loaders)."""
    it_a, it_b = iter(loader_a), iter(loader_b)
    for _ in range(steps):
        try:
            a = next(it_a)
        except StopIteration:
            it_a = iter(loader_a)
            a = next(it_a)
        try:
            b = next(it_b)
        except StopIteration:
            it_b = iter(loader_b)
            b = next(it_b)
        yield a, b


def make_merged_step(
    loss_fn: Callable[..., jax.Array],
    optimizer,
    weight_a: float = 1.0,
    weight_b: float = 1.0,
):
    """One optimizer update from both datasets' losses
    (train_multi_db_merge_loss.train_multi_db_model).

    ``loss_fn(params, batch, dataset_id, rng) -> scalar``; the returned
    step is jittable: step(params, opt_state, batch_a, batch_b, rng).
    """

    def step(params, opt_state, batch_a, batch_b, rng):
        ka, kb = jax.random.split(rng)

        def total(p):
            la = loss_fn(p, batch_a, jnp.int32(0), ka)
            lb = loss_fn(p, batch_b, jnp.int32(1), kb)
            return weight_a * la + weight_b * lb, (la, lb)

        (loss, (la, lb)), grads = jax.value_and_grad(total, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, {"loss": loss, "loss_a": la, "loss_b": lb}

    return step


# ---------------------------------------------------------------------------
# pseudo-label store (self_training_utils.PSEUDO_LABELS equivalent)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class PseudoLabelStore:
    """Host-side pseudo-label store with confidence gating + refresh.

    Keyed by integer sample id. Each entry holds the (possibly memory-
    ensembled) class logits and the gated hard label (-1 = ignored, the
    reference's low-confidence ignore bucket).
    """

    num_classes: int
    threshold: float = 0.9
    momentum: float = 0.9  # memory-ensemble smoothing
    logits: Dict[int, np.ndarray] = dataclasses.field(default_factory=dict)

    def update_batch(
        self, ids: np.ndarray, logits: np.ndarray, ensemble: bool = True
    ) -> Tuple[int, int]:
        """save_pseudo_label_batch: gate by confidence, smooth across
        rounds via the memory ensemble. -> (num_kept, num_ignored)."""
        kept = ignored = 0
        for i, sid in enumerate(np.asarray(ids).tolist()):
            new = np.asarray(logits[i], np.float32)
            if ensemble and sid in self.logits:
                new = np.asarray(
                    ssl.memory_ensemble_update(
                        jnp.asarray(self.logits[sid]), jnp.asarray(new),
                        self.momentum,
                    )
                )
            self.logits[sid] = new
            if self.label_of(sid) >= 0:
                kept += 1
            else:
                ignored += 1
        return kept, ignored

    def label_of(self, sid: int) -> int:
        l = self.logits.get(sid)
        if l is None:
            return -1
        p = np.exp(l - l.max())
        p = p / p.sum()
        return int(p.argmax()) if float(p.max()) >= self.threshold else -1

    def labels_for(self, ids: np.ndarray) -> np.ndarray:
        """-> hard labels [N] (-1 where below the confidence gate)."""
        return np.asarray([self.label_of(int(s)) for s in np.asarray(ids)],
                          np.int32)

    def save(self, path: str) -> None:
        ids = np.asarray(sorted(self.logits), np.int64)
        arr = np.stack([self.logits[int(i)] for i in ids]) if len(ids) else (
            np.zeros((0, self.num_classes), np.float32)
        )
        np.savez(path, ids=ids, logits=arr,
                 threshold=self.threshold, momentum=self.momentum)

    @classmethod
    def load(cls, path: str, num_classes: int) -> "PseudoLabelStore":
        z = np.load(path)
        store = cls(num_classes=num_classes,
                    threshold=float(z["threshold"]),
                    momentum=float(z["momentum"]))
        for sid, lg in zip(z["ids"].tolist(), z["logits"]):
            store.logits[int(sid)] = np.asarray(lg, np.float32)
        return store


def fill_pseudo_labels(
    store: PseudoLabelStore,
    predict_fn: Callable[[Any], jax.Array],  # batch -> logits [B, C]
    loader: Iterable[Tuple[np.ndarray, Any]],  # yields (ids, batch)
    ensemble: bool = True,
) -> Tuple[int, int]:
    """save_pseudo_label_epoch: run the teacher over the unlabeled set and
    (re)fill the store. -> totals (kept, ignored)."""
    kept = ignored = 0
    for ids, batch in loader:
        logits = np.asarray(predict_fn(batch))
        k, g = store.update_batch(ids, logits, ensemble=ensemble)
        kept += k
        ignored += g
    return kept, ignored


# ---------------------------------------------------------------------------
# teacher-student step (SESS / mean-teacher, tools/ssl_utils)
# ---------------------------------------------------------------------------

def make_teacher_student_step(
    forward_fn: Callable[..., jax.Array],  # (params, batch, rng) -> logits
    optimizer,
    consistency_weight: float = 1.0,
    ema_decay: float = 0.999,
):
    """Student trains on gated pseudo labels + consistency to the EMA
    teacher; the teacher follows the student by EMA.

    step(student, teacher, opt_state, batch, pseudo_labels [B] (-1 =
    ignore), rng) -> (student, teacher, opt_state, metrics). Jittable.
    """

    def step(student, teacher, opt_state, batch, labels, rng):
        ks, kt = jax.random.split(rng)
        t_logits = jax.lax.stop_gradient(forward_fn(teacher, batch, kt))

        def loss(p):
            s_logits = forward_fn(p, batch, ks)
            keep = (labels >= 0).astype(jnp.float32)
            safe = jnp.maximum(labels, 0)
            ce = -jnp.take_along_axis(
                jax.nn.log_softmax(s_logits, -1), safe[:, None], -1
            )[:, 0]
            sup = jnp.sum(ce * keep) / jnp.maximum(jnp.sum(keep), 1.0)
            cons = ssl.consistency_loss(s_logits, t_logits)
            return sup + consistency_weight * cons, (sup, cons)

        (l, (sup, cons)), grads = jax.value_and_grad(loss, has_aux=True)(student)
        updates, opt_state = optimizer.update(grads, opt_state, student)
        student = jax.tree_util.tree_map(lambda p, u: p + u, student, updates)
        teacher = ssl.mean_teacher_update(teacher, student, ema_decay)
        return student, teacher, opt_state, {
            "loss": l, "supervised": sup, "consistency": cons,
        }

    return step

"""MDF + self-training orchestration (train/multi_db.py).

The VERDICT gate for this subsystem: a joint two-dataset training run
whose per-dataset norm stats diverge, and a teacher-student step test.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from metatransformer_tpu.models import mdf
from metatransformer_tpu.train import multi_db


def _two_datasets(n=64, d=16, seed=0):
    """Two synthetic datasets with different input statistics + label
    rules — exactly the regime UniNorm exists for."""
    rng = np.random.default_rng(seed)
    xa = rng.standard_normal((n, d)).astype(np.float32) * 0.5 + 2.0
    ya = (xa[:, 0] > 2.0).astype(np.int32)
    xb = rng.standard_normal((n, d)).astype(np.float32) * 3.0 - 1.0
    yb = 2 + (xb[:, 1] > -1.0).astype(np.int32)
    return (xa, ya), (xb, yb)


def test_merged_loss_step_trains_and_norms_diverge():
    cfg = mdf.MDFClassifierConfig()
    params = mdf.mdf_classifier_init(cfg, jax.random.PRNGKey(0))
    (xa, ya), (xb, yb) = _two_datasets()

    def loss_fn(p, batch, dataset_id, rng):
        x, y = batch
        logits = mdf.mdf_classifier_forward(p, x, dataset_id, cfg)
        return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

    opt = optax.adam(5e-3)
    opt_state = opt.init(params)
    step = jax.jit(multi_db.make_merged_step(loss_fn, opt))

    batches = [(jnp.asarray(x), jnp.asarray(y)) for x, y in ((xa, ya), (xb, yb))]
    loader_a = [batches[0]] * 4
    loader_b = [batches[1]] * 4

    rng = jax.random.PRNGKey(1)
    first = last = None
    for i, (ba, bb) in enumerate(multi_db.paired_batches(loader_a, loader_b, 30)):
        rng, k = jax.random.split(rng)
        params, opt_state, m = step(params, opt_state, ba, bb, k)
        if first is None:
            first = float(m["loss"])
        last = float(m["loss"])
    assert np.isfinite(last)
    assert last < first * 0.7, (first, last)

    # per-dataset affine params must diverge: UniNorm is doing real work
    scale = np.asarray(params["norm1"]["scale"])
    bias = np.asarray(params["norm1"]["bias"])
    assert np.abs(scale[0] - scale[1]).max() > 1e-3
    assert np.abs(bias[0] - bias[1]).max() > 1e-3

    # both datasets end up well-classified by ONE compiled model
    la = np.asarray(mdf.mdf_classifier_forward(params, jnp.asarray(xa), jnp.int32(0), cfg)).argmax(-1)
    lb = np.asarray(mdf.mdf_classifier_forward(params, jnp.asarray(xb), jnp.int32(1), cfg)).argmax(-1)
    assert (la == ya).mean() > 0.8
    assert (lb == yb).mean() > 0.8


def test_pseudo_label_store_gating_ensemble_roundtrip(tmp_path):
    store = multi_db.PseudoLabelStore(num_classes=3, threshold=0.8, momentum=0.5)
    ids = np.array([7, 8])
    confident = np.array([[8.0, 0.0, 0.0], [0.0, 0.1, 0.2]], np.float32)
    kept, ignored = store.update_batch(ids, confident, ensemble=False)
    assert kept == 1 and ignored == 1
    assert store.labels_for(ids).tolist() == [0, -1]

    # memory ensemble: a later contradictory prediction is smoothed in
    flipped = np.array([[0.0, 8.0, 0.0], [6.0, 0.0, 0.0]], np.float32)
    store.update_batch(ids, flipped, ensemble=True)
    np.testing.assert_allclose(store.logits[7], [4.0, 4.0, 0.0])
    # 50/50 smoothed logits are no longer confident -> gated out
    assert store.label_of(7) == -1
    assert store.label_of(8) == 0  # 0.5*6 = 3 logit margin passes the gate

    p = os.path.join(tmp_path, "ps.npz")
    store.save(p)
    loaded = multi_db.PseudoLabelStore.load(p, 3)
    assert loaded.labels_for(ids).tolist() == store.labels_for(ids).tolist()


def test_fill_pseudo_labels_and_teacher_student_step():
    cfg = mdf.MDFClassifierConfig(num_datasets=1)
    student = mdf.mdf_classifier_init(cfg, jax.random.PRNGKey(2))
    teacher = jax.tree_util.tree_map(jnp.copy, student)

    rng = np.random.default_rng(3)
    x = rng.standard_normal((32, 16)).astype(np.float32)
    ids = np.arange(32)

    store = multi_db.PseudoLabelStore(num_classes=4, threshold=0.1)
    predict = lambda batch: mdf.mdf_classifier_forward(
        teacher, jnp.asarray(batch), jnp.int32(0), cfg
    )
    kept, ignored = multi_db.fill_pseudo_labels(store, predict, [(ids, x)])
    assert kept + ignored == 32 and kept > 0

    labels = store.labels_for(ids)
    opt = optax.adam(1e-3)
    step = jax.jit(multi_db.make_teacher_student_step(
        lambda p, b, k: mdf.mdf_classifier_forward(p, b, jnp.int32(0), cfg),
        opt, consistency_weight=1.0, ema_decay=0.9,
    ))
    opt_state = opt.init(student)
    t0 = teacher["head_w"].copy()
    metrics = None
    for i in range(5):
        student, teacher, opt_state, metrics = step(
            student, teacher, opt_state, jnp.asarray(x),
            jnp.asarray(labels), jax.random.PRNGKey(10 + i),
        )
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["consistency"]) >= 0
    # the teacher moved (EMA follows the student)
    assert float(jnp.abs(teacher["head_w"] - t0).max()) > 0

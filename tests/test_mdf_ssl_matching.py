"""MDF norms/domain attention, self-training utils, Hungarian matching."""

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.models import mdf
from metatransformer_tpu.ops import matching
from metatransformer_tpu.train import self_training as ssl


def test_uni_norm_switches_by_dataset():
    cfg = mdf.UniNormConfig(channels=4, num_datasets=2)
    params = mdf.uni_norm_init(cfg)
    params["scale"] = params["scale"].at[1].set(2.0)
    params["bias"] = params["bias"].at[1].set(1.0)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((8, 4), np.float32))
    out0 = mdf.uni_norm_apply(params, x, jnp.asarray(0), cfg)
    out1 = mdf.uni_norm_apply(params, x, jnp.asarray(1), cfg)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0) * 2 + 1,
                               rtol=1e-5, atol=1e-5)


def test_domain_attention():
    cfg = mdf.DomainAttentionConfig(channels=8, num_datasets=3, reduction=2)
    params = mdf.domain_attention_init(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 5, 8), np.float32))
    out = mdf.domain_attention_apply(params, x, cfg)
    assert out.shape == x.shape
    # gate is in (0,1): output magnitude never exceeds input
    assert float(jnp.abs(out).max()) <= float(jnp.abs(x).max()) + 1e-6


def test_pseudo_labels_and_memory():
    logits = jnp.asarray([[5.0, 0.0], [0.1, 0.2]])
    labels, keep = ssl.pseudo_labels(logits, threshold=0.9)
    np.testing.assert_array_equal(np.asarray(labels), [0, 1])
    np.testing.assert_array_equal(np.asarray(keep), [True, False])
    mem = ssl.memory_ensemble_update(jnp.zeros((2, 2)), logits, momentum=0.5)
    np.testing.assert_allclose(np.asarray(mem), np.asarray(logits) * 0.5)


def test_consistency_and_infonce():
    t = jnp.asarray([[3.0, 0.0]])
    s_good = jnp.asarray([[3.0, 0.0]])
    s_bad = jnp.asarray([[0.0, 3.0]])
    assert float(ssl.consistency_loss(s_good, t)) < float(
        ssl.consistency_loss(s_bad, t)
    )
    f = jnp.asarray(np.random.default_rng(0).standard_normal((16, 8), np.float32))
    perfect = float(ssl.info_nce(f, f))
    shuffled = float(ssl.info_nce(f, jnp.roll(f, 1, axis=0)))
    assert perfect < shuffled


def test_mean_teacher_update():
    t = {"w": jnp.zeros(2)}
    s = {"w": jnp.ones(2)}
    out = ssl.mean_teacher_update(t, s, decay=0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1, rtol=1e-6)


def test_hungarian_vs_greedy():
    rng = np.random.default_rng(0)
    cost = rng.uniform(0, 1, (6, 3)).astype(np.float32)
    rows, cols = matching.hungarian_assign(cost)
    hung_total = cost[rows, cols].sum()
    g_rows, g_cols = matching.greedy_assign(jnp.asarray(cost))
    greedy_total = cost[np.asarray(g_rows), np.asarray(g_cols)].sum()
    assert hung_total <= greedy_total + 1e-6
    # each gt matched exactly once in both
    assert len(set(np.asarray(g_cols).tolist())) == 3
    assert len(set(cols.tolist())) == 3


def test_match_costs():
    logits = jnp.asarray([[5.0, 0.0, 0.0], [0.0, 5.0, 0.0]])
    gt_labels = jnp.asarray([1, 0])
    c = matching.classification_cost(logits, gt_labels)
    assert c.shape == (2, 2)
    assert float(c[1, 0]) < float(c[0, 0])  # query 1 predicts class 1

    pb = jnp.asarray([[0.0, 0, 1, 1], [0.5, 0.5, 1, 1]])
    gb = jnp.asarray([[0.0, 0, 1, 1]])
    l1 = matching.bbox_l1_cost(pb, gb)
    assert float(l1[0, 0]) < float(l1[1, 0])

    pm = jnp.asarray([[10.0, -10.0, -10.0, 10.0]])
    gm = jnp.asarray([[1.0, 0.0, 0.0, 1.0]])
    assert float(matching.dice_cost(pm, gm)[0, 0]) < 0.1
    assert matching.focal_mask_cost(pm, gm).shape == (1, 1)

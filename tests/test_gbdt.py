"""GBDT baseline tests (Tabular LightGBM-equivalent,
Tabular/run_experiments/general_utils/lightgbm_optimizer.py)."""

import numpy as np
import pytest

from metatransformer_tpu.models import gbdt


def _binary_data(n=800, d=8, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, d))
    logits = X[:, 0] - 2 * X[:, 1] + X[:, 2] * X[:, 3]
    y = (logits + 0.3 * rng.standard_normal(n) > 0).astype(np.float64)
    return X, y


def test_binary_beats_chance_and_matches_sklearn_oracle():
    X, y = _binary_data()
    Xt, yt, Xe, ye = X[:600], y[:600], X[600:], y[600:]
    cfg = gbdt.GBDTConfig(
        objective="binary", n_estimators=80, num_leaves=15,
        min_child_samples=5, learning_rate=0.2,
    )
    model = gbdt.GBDT(cfg).fit(Xt, yt)
    acc = (model.predict(Xe) == ye).mean()
    assert acc > 0.85

    from sklearn.ensemble import HistGradientBoostingClassifier

    sk = HistGradientBoostingClassifier(
        max_iter=80, max_leaf_nodes=15, learning_rate=0.2, random_state=0
    ).fit(Xt, yt)
    sk_acc = (sk.predict(Xe) == ye).mean()
    # within a few points of sklearn's histogram GBDT on the same data
    assert acc >= sk_acc - 0.05

    proba = model.predict_proba(Xe)
    assert proba.shape == (len(Xe), 2)
    np.testing.assert_allclose(proba.sum(1), 1.0, atol=1e-9)
    assert gbdt.binary_logloss(ye, proba[:, 1]) < gbdt.binary_logloss(
        ye, np.full(len(ye), yt.mean())
    )


def test_regression_fits_nonlinear_signal():
    rng = np.random.default_rng(1)
    X = rng.uniform(-2, 2, (700, 5))
    y = np.sin(2 * X[:, 0]) + X[:, 1] ** 2 + 0.1 * rng.standard_normal(700)
    Xt, yt, Xe, ye = X[:500], y[:500], X[500:], y[500:]
    cfg = gbdt.GBDTConfig(
        objective="regression", n_estimators=120, num_leaves=31,
        min_child_samples=5, learning_rate=0.15,
    )
    model = gbdt.GBDT(cfg).fit(Xt, yt)
    mse = float(((model.predict(Xe) - ye) ** 2).mean())
    assert mse < 0.25 * ye.var()


def test_multiclass_blobs():
    rng = np.random.default_rng(2)
    centers = np.array([[0, 0], [3, 3], [0, 4]], np.float64)
    y = rng.integers(0, 3, 600)
    X = centers[y] + rng.standard_normal((600, 2))
    cfg = gbdt.GBDTConfig(
        objective="multiclass", num_class=3, n_estimators=40,
        num_leaves=15, min_child_samples=5, learning_rate=0.3,
    )
    model = gbdt.GBDT(cfg).fit(X[:450], y[:450].astype(np.float64))
    acc = (model.predict(X[450:]) == y[450:]).mean()
    assert acc > 0.85
    proba = model.predict_proba(X[450:])
    assert proba.shape == (150, 3)
    np.testing.assert_allclose(proba.sum(1), 1.0, atol=1e-9)


def test_early_stopping_truncates_ensemble():
    X, y = _binary_data(n=600, seed=3)
    # eval labels are pure noise: eval loss can only get worse -> early stop
    rng = np.random.default_rng(4)
    Xe = rng.standard_normal((200, X.shape[1]))
    ye = rng.integers(0, 2, 200).astype(np.float64)
    cfg = gbdt.GBDTConfig(
        objective="binary", n_estimators=300, num_leaves=31,
        min_child_samples=5, learning_rate=0.3, early_stopping_rounds=10,
    )
    model = gbdt.GBDT(cfg).fit(X, y, eval_set=(Xe, ye))
    assert len(model.trees) < 300
    assert model.best_iteration < len(model.trees) + 1
    # prediction uses only the best_iteration prefix
    assert model.best_iteration is not None


def test_min_child_samples_respected():
    X, y = _binary_data(n=300, seed=5)
    cfg = gbdt.GBDTConfig(
        objective="binary", n_estimators=3, num_leaves=64,
        min_child_samples=40, learning_rate=0.1,
    )
    model = gbdt.GBDT(cfg).fit(X, y)
    binned = gbdt.apply_bins(X, model.bin_edges)
    for rt in model.trees:
        tree = rt[0]
        # route all train rows and count rows per leaf
        node = np.zeros(len(X), np.int32)
        active = tree.feature[node] >= 0
        while active.any():
            idx = np.nonzero(active)[0]
            nd = node[idx]
            f = tree.feature[nd]
            go_left = binned[idx, f] <= tree.threshold_bin[nd]
            node[idx] = np.where(go_left, tree.left[nd], tree.right[nd])
            active = tree.feature[node] >= 0
        counts = np.bincount(node, minlength=len(tree.feature))
        leaves = np.nonzero(tree.feature == -1)[0]
        reached = leaves[counts[leaves] > 0]
        assert (counts[reached] >= 40).all()


def test_is_unbalance_raises_minority_recall():
    rng = np.random.default_rng(6)
    n = 1000
    X = rng.standard_normal((n, 6))
    logits = X[:, 0] + X[:, 1] - 3.0  # ~7% positives
    y = (logits + 0.5 * rng.standard_normal(n) > 0).astype(np.float64)
    assert 0.02 < y.mean() < 0.2
    Xt, yt, Xe, ye = X[:700], y[:700], X[700:], y[700:]
    base = dict(
        objective="binary", n_estimators=40, num_leaves=15,
        min_child_samples=5, learning_rate=0.2,
    )
    plain = gbdt.GBDT(gbdt.GBDTConfig(**base)).fit(Xt, yt)
    wtd = gbdt.GBDT(gbdt.GBDTConfig(is_unbalance=True, **base)).fit(Xt, yt)

    def recall(m):
        pred = m.predict(Xe)
        pos = ye == 1
        return (pred[pos] == 1).mean() if pos.any() else 0.0

    assert recall(wtd) >= recall(plain)


def test_optimizer_searches_reference_space():
    X, y = _binary_data(n=500, seed=7)
    Xt, yt, Xe, ye = X[:350], y[:350], X[350:], y[350:]
    opt = gbdt.GBDTOptimizer(objective="binary", seed=0)
    best = opt.optimize((Xt, yt), (Xe, ye), maxevals=3, n_estimators_cap=60)
    assert len(opt.trials) == 3
    assert opt.best_score == min(s for _, s in opt.trials)
    # params come from the quantized reference space
    assert best["n_estimators"] == 60  # cap always binds (space min is 100)
    assert best["num_leaves"] % 10 == 0 and 20 <= best["num_leaves"] <= 200
    assert best["min_child_samples"] in (20, 40, 60, 80, 100)
    assert 0.01 <= best["learning_rate"] <= 0.3
    assert 0.5 <= best["colsample_bytree"] <= 1.0
    assert best["reg_alpha"] in gbdt._REG_CHOICES
    assert best["reg_lambda"] in gbdt._REG_CHOICES


def test_config_validation():
    with pytest.raises(ValueError):
        gbdt.GBDTConfig(objective="rank")
    with pytest.raises(ValueError):
        gbdt.GBDTConfig(objective="multiclass")

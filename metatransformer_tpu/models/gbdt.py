"""Histogram gradient-boosted decision trees: the tabular GBDT baseline.

The reference benchmarks its TabTransformer against LightGBM with a
hyperopt/optuna search
(``Tabular/run_experiments/general_utils/lightgbm_optimizer.py:14-125``:
binary/multiclass/regression objectives, ``is_unbalance``, 50-round early
stopping on an eval set, and the search space at
``lightgbm_optimizer.py:106-123``). This module is a clean-room,
dependency-free equivalent: a leaf-wise histogram GBDT (the LightGBM
growth strategy) in pure numpy, plus ``GBDTOptimizer`` — a random search
over the same hyperparameter space scored the same way (eval log-loss /
MSE with early stopping).

Host-side by design: tree induction is branchy integer work with data-
dependent shapes — the opposite of what the MXU wants — and the reference
runs it as standalone CPU scripts outside the DL framework too. Inference
over the fitted ensemble is vectorized numpy.

Split math is the standard second-order gain used by LightGBM/XGBoost:
  gain(split) = GL^2/(HL+lam) + GR^2/(HR+lam) - G^2/(H+lam)
with an L1 soft-threshold on leaf gradient sums for ``reg_alpha``.
"""

from __future__ import annotations

import dataclasses
import heapq
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class GBDTConfig:
    objective: str = "binary"  # binary | multiclass | regression
    num_class: int = 0  # required for multiclass
    n_estimators: int = 100
    learning_rate: float = 0.1
    num_leaves: int = 31
    min_child_samples: int = 20
    reg_alpha: float = 0.0
    reg_lambda: float = 0.0
    colsample_bytree: float = 1.0
    max_bins: int = 255
    is_unbalance: bool = False
    early_stopping_rounds: int = 0  # 0 = off; needs an eval set
    seed: int = 1

    def __post_init__(self):
        if self.objective not in ("binary", "multiclass", "regression"):
            raise ValueError(f"unknown objective {self.objective!r}")
        if self.objective == "multiclass" and self.num_class < 2:
            raise ValueError("num_class must be provided for multiclass problems")
        if not 1 < self.max_bins <= 256:
            raise ValueError("max_bins must be in (1, 256]")


# ---------------------------------------------------------------------------
# binning


def quantile_bin_edges(X: np.ndarray, max_bins: int) -> List[np.ndarray]:
    """Per-feature quantile bin upper edges (len <= max_bins - 1)."""
    edges = []
    qs = np.linspace(0, 1, max_bins + 1)[1:-1]
    for f in range(X.shape[1]):
        e = np.unique(np.quantile(X[:, f], qs))
        edges.append(e.astype(np.float64))
    return edges


def apply_bins(X: np.ndarray, edges: Sequence[np.ndarray]) -> np.ndarray:
    """Map raw features to uint8 bin indices via the fitted edges."""
    binned = np.empty(X.shape, dtype=np.uint8)
    for f, e in enumerate(edges):
        binned[:, f] = np.searchsorted(e, X[:, f], side="left")
    return binned


# ---------------------------------------------------------------------------
# single tree (leaf-wise / best-first growth)


@dataclasses.dataclass
class _Tree:
    # flat arrays indexed by node id; leaf nodes have feature == -1
    feature: np.ndarray
    threshold_bin: np.ndarray  # go left iff bin <= threshold_bin
    left: np.ndarray
    right: np.ndarray
    value: np.ndarray

    def predict_binned(self, binned: np.ndarray) -> np.ndarray:
        n = binned.shape[0]
        node = np.zeros(n, dtype=np.int32)
        # depth is bounded by num_leaves; iterate until every row is at a leaf
        active = self.feature[node] >= 0
        while active.any():
            idx = np.nonzero(active)[0]
            nd = node[idx]
            f = self.feature[nd]
            go_left = binned[idx, f] <= self.threshold_bin[nd]
            node[idx] = np.where(go_left, self.left[nd], self.right[nd])
            active = self.feature[node] >= 0
        return self.value[node]


def _leaf_value(g: float, h: float, cfg: GBDTConfig) -> float:
    # L1 soft-threshold on the gradient sum, L2 on the hessian sum
    if g > cfg.reg_alpha:
        g = g - cfg.reg_alpha
    elif g < -cfg.reg_alpha:
        g = g + cfg.reg_alpha
    else:
        return 0.0
    return -g / (h + cfg.reg_lambda + 1e-12)


def _score(g: np.ndarray, h: np.ndarray, cfg: GBDTConfig) -> np.ndarray:
    ga = np.maximum(np.abs(g) - cfg.reg_alpha, 0.0)
    return ga * ga / (h + cfg.reg_lambda + 1e-12)


def _best_split(
    binned: np.ndarray,
    g: np.ndarray,
    h: np.ndarray,
    rows: np.ndarray,
    features: np.ndarray,
    n_bins: int,
    cfg: GBDTConfig,
) -> Tuple[float, int, int]:
    """Best (gain, feature, threshold_bin) over `features` for `rows`."""
    gr, hr = g[rows], h[rows]
    G, H = gr.sum(), hr.sum()
    parent = _score(np.array([G]), np.array([H]), cfg)[0]
    best = (0.0, -1, -1)
    sub = binned[rows][:, features]
    for j, f in enumerate(features):
        b = sub[:, j]
        hg = np.bincount(b, weights=gr, minlength=n_bins)
        hh = np.bincount(b, weights=hr, minlength=n_bins)
        hc = np.bincount(b, minlength=n_bins)
        cg, ch, cc = np.cumsum(hg), np.cumsum(hh), np.cumsum(hc)
        # candidate thresholds: all but the last bin
        GL, HL, CL = cg[:-1], ch[:-1], cc[:-1]
        valid = (CL >= cfg.min_child_samples) & (
            (len(rows) - CL) >= cfg.min_child_samples
        )
        if not valid.any():
            continue
        gain = _score(GL, HL, cfg) + _score(G - GL, H - HL, cfg) - parent
        gain = np.where(valid, gain, -np.inf)
        t = int(np.argmax(gain))
        if gain[t] > best[0]:
            best = (float(gain[t]), int(f), t)
    return best


def _grow_tree(
    binned: np.ndarray,
    g: np.ndarray,
    h: np.ndarray,
    cfg: GBDTConfig,
    rng: np.random.Generator,
    n_bins: int,
) -> _Tree:
    n_features = binned.shape[1]
    k = max(1, int(round(cfg.colsample_bytree * n_features)))
    features = np.sort(rng.choice(n_features, size=k, replace=False))

    feature, thresh, left, right, value = [], [], [], [], []

    def new_node() -> int:
        feature.append(-1)
        thresh.append(-1)
        left.append(-1)
        right.append(-1)
        value.append(0.0)
        return len(feature) - 1

    root = new_node()
    all_rows = np.arange(binned.shape[0])
    value[root] = _leaf_value(g.sum(), h.sum(), cfg)

    # best-first: heap of (-gain, tiebreak, node, rows, feature, threshold)
    heap: list = []
    counter = 0

    def push(node: int, rows: np.ndarray):
        nonlocal counter
        gain, f, t = _best_split(binned, g, h, rows, features, n_bins, cfg)
        if gain > 0.0:
            heapq.heappush(heap, (-gain, counter, node, rows, f, t))
            counter += 1

    push(root, all_rows)
    n_leaves = 1
    while heap and n_leaves < cfg.num_leaves:
        _, _, node, rows, f, t = heapq.heappop(heap)
        mask = binned[rows, f] <= t
        lrows, rrows = rows[mask], rows[~mask]
        lid, rid = new_node(), new_node()
        feature[node], thresh[node] = f, t
        left[node], right[node] = lid, rid
        value[lid] = _leaf_value(g[lrows].sum(), h[lrows].sum(), cfg)
        value[rid] = _leaf_value(g[rrows].sum(), h[rrows].sum(), cfg)
        n_leaves += 1
        push(lid, lrows)
        push(rid, rrows)

    return _Tree(
        feature=np.asarray(feature, np.int32),
        threshold_bin=np.asarray(thresh, np.int32),
        left=np.asarray(left, np.int32),
        right=np.asarray(right, np.int32),
        value=np.asarray(value, np.float64),
    )


# ---------------------------------------------------------------------------
# objectives


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 0.5 * (1.0 + np.tanh(0.5 * x))


def _softmax(x: np.ndarray) -> np.ndarray:
    x = x - x.max(axis=1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=1, keepdims=True)


def binary_logloss(y: np.ndarray, p: np.ndarray) -> float:
    p = np.clip(p, 1e-12, 1 - 1e-12)
    return float(-(y * np.log(p) + (1 - y) * np.log(1 - p)).mean())


def multiclass_logloss(y: np.ndarray, p: np.ndarray) -> float:
    p = np.clip(p[np.arange(len(y)), y.astype(int)], 1e-12, None)
    return float(-np.log(p).mean())


class GBDT:
    """Leaf-wise histogram GBDT with the reference baseline's surface:
    fit(X, y, eval_set=...) with early stopping, predict()/predict_proba().
    """

    def __init__(self, cfg: GBDTConfig):
        self.cfg = cfg
        self.trees: List[List[_Tree]] = []  # [round][class]
        self.bin_edges: Optional[List[np.ndarray]] = None
        self.base_score: Optional[np.ndarray] = None
        self.best_iteration: Optional[int] = None
        self.eval_history: List[float] = []

    # -- raw margin -> grad/hess per objective ------------------------------
    def _grad_hess(self, y: np.ndarray, margin: np.ndarray, w: np.ndarray):
        cfg = self.cfg
        if cfg.objective == "regression":
            return (margin[:, 0] - y)[:, None], np.ones_like(margin)
        if cfg.objective == "binary":
            p = _sigmoid(margin[:, 0])
            g = (p - y) * w
            h = np.maximum(p * (1 - p), 1e-6) * w
            return g[:, None], h[:, None]
        p = _softmax(margin)
        onehot = np.eye(cfg.num_class)[y.astype(int)]
        g = p - onehot
        # LightGBM scales the multiclass hessian by K/(K-1) (multiclass_
        # objective.hpp `factor_`); without it leaf values come out
        # slightly larger than LightGBM's for the same reg_lambda.
        factor = cfg.num_class / max(cfg.num_class - 1, 1)
        h = np.maximum(factor * p * (1 - p), 1e-6)
        return g, h

    def _eval_score(self, y: np.ndarray, margin: np.ndarray) -> float:
        cfg = self.cfg
        if cfg.objective == "regression":
            return float(((margin[:, 0] - y) ** 2).mean())
        if cfg.objective == "binary":
            return binary_logloss(y, _sigmoid(margin[:, 0]))
        return multiclass_logloss(y, _softmax(margin))

    def fit(
        self,
        X: np.ndarray,
        y: np.ndarray,
        eval_set: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    ) -> "GBDT":
        cfg = self.cfg
        X = np.asarray(X, np.float64)
        y = np.asarray(y, np.float64)
        rng = np.random.default_rng(cfg.seed)
        self.bin_edges = quantile_bin_edges(X, cfg.max_bins)
        binned = apply_bins(X, self.bin_edges)
        n_bins = cfg.max_bins

        K = cfg.num_class if cfg.objective == "multiclass" else 1
        # LightGBM's is_unbalance: weight the positive class by n_neg/n_pos
        w = np.ones(len(y))
        if cfg.objective == "binary" and cfg.is_unbalance:
            n_pos = max(1.0, float((y == 1).sum()))
            w = np.where(y == 1, (len(y) - n_pos) / n_pos, 1.0)

        if cfg.objective == "regression":
            self.base_score = np.array([y.mean()])
        elif cfg.objective == "binary":
            p = np.clip(y.mean(), 1e-6, 1 - 1e-6)
            self.base_score = np.array([np.log(p / (1 - p))])
        else:
            self.base_score = np.zeros(K)

        margin = np.tile(self.base_score, (len(y), 1))
        ev_binned = ev_margin = ev_y = None
        if eval_set is not None:
            ev_X, ev_y = eval_set
            ev_binned = apply_bins(np.asarray(ev_X, np.float64), self.bin_edges)
            ev_margin = np.tile(self.base_score, (len(ev_y), 1))
            ev_y = np.asarray(ev_y, np.float64)

        self.trees = []
        self.eval_history = []
        best_score, best_it = np.inf, 0
        for it in range(cfg.n_estimators):
            g, h = self._grad_hess(y, margin, w)
            round_trees = []
            for k in range(K):
                tree = _grow_tree(binned, g[:, k], h[:, k], cfg, rng, n_bins)
                round_trees.append(tree)
                upd = tree.predict_binned(binned)
                margin[:, k] += cfg.learning_rate * upd
                if ev_binned is not None:
                    ev_margin[:, k] += cfg.learning_rate * tree.predict_binned(
                        ev_binned
                    )
            self.trees.append(round_trees)
            if ev_binned is not None:
                score = self._eval_score(ev_y, ev_margin)
                self.eval_history.append(score)
                if score < best_score - 1e-12:
                    best_score, best_it = score, it + 1
                elif (
                    cfg.early_stopping_rounds
                    and it + 1 - best_it >= cfg.early_stopping_rounds
                ):
                    break
        # LightGBM semantics: prediction truncates to the best eval round
        # only when early stopping was active
        self.best_iteration = (
            best_it
            if (self.eval_history and cfg.early_stopping_rounds)
            else len(self.trees)
        )
        return self

    # -- inference -----------------------------------------------------------
    def _margin(self, X: np.ndarray) -> np.ndarray:
        assert self.bin_edges is not None, "call fit first"
        binned = apply_bins(np.asarray(X, np.float64), self.bin_edges)
        n_rounds = self.best_iteration or len(self.trees)
        K = len(self.trees[0]) if self.trees else 1
        margin = np.tile(self.base_score, (len(binned), 1))
        for rt in self.trees[:n_rounds]:
            for k in range(K):
                margin[:, k] += self.cfg.learning_rate * rt[k].predict_binned(binned)
        return margin

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        m = self._margin(X)
        if self.cfg.objective == "binary":
            p = _sigmoid(m[:, 0])
            return np.stack([1 - p, p], axis=1)
        if self.cfg.objective == "multiclass":
            return _softmax(m)
        raise ValueError("predict_proba needs a classification objective")

    def predict(self, X: np.ndarray) -> np.ndarray:
        m = self._margin(X)
        if self.cfg.objective == "regression":
            return m[:, 0]
        if self.cfg.objective == "binary":
            return (m[:, 0] > 0).astype(np.int64)
        return m.argmax(axis=1)


# ---------------------------------------------------------------------------
# hyperparameter search (reference: LGBOptimizerHyperopt.hyperparameter_space)


_REG_CHOICES = (0.01, 0.05, 0.1, 0.2, 0.4, 1.0, 2.0, 4.0, 10.0)


def sample_params(rng: np.random.Generator) -> Dict[str, float]:
    """One draw from the reference's search space
    (lightgbm_optimizer.py:106-123), quantization included."""
    return dict(
        learning_rate=float(rng.uniform(0.01, 0.3)),
        n_estimators=int(rng.integers(2, 21) * 50),  # 100..1000 step 50
        num_leaves=int(rng.integers(2, 21) * 10),  # 20..200 step 10
        min_child_samples=int(rng.integers(1, 6) * 20),  # 20..100 step 20
        colsample_bytree=float(rng.uniform(0.5, 1.0)),
        reg_alpha=float(rng.choice(_REG_CHOICES)),
        reg_lambda=float(rng.choice(_REG_CHOICES)),
    )


class GBDTOptimizer:
    """Random search over the reference's LightGBM space, scored like
    LGBOptimizerHyperopt.get_objective (eval log-loss / MSE, 50-round
    early stopping). TPE is replaced by seeded random search — the
    clean-room, dependency-free equivalent of hyperopt's fmin loop."""

    def __init__(
        self,
        objective: str = "binary",
        is_unbalance: bool = False,
        num_class: int = 0,
        seed: int = 1,
    ):
        self.objective = objective
        self.is_unbalance = is_unbalance
        self.num_class = num_class
        self.seed = seed
        self.best: Optional[Dict[str, float]] = None
        self.best_score = np.inf
        self.trials: List[Tuple[Dict[str, float], float]] = []

    def optimize(
        self,
        dtrain: Tuple[np.ndarray, np.ndarray],
        deval: Tuple[np.ndarray, np.ndarray],
        maxevals: int = 20,
        n_estimators_cap: Optional[int] = None,
    ) -> Dict[str, float]:
        rng = np.random.default_rng(self.seed)
        Xt, yt = dtrain
        for _ in range(maxevals):
            params = sample_params(rng)
            if n_estimators_cap is not None:
                params["n_estimators"] = min(
                    params["n_estimators"], n_estimators_cap
                )
            cfg = GBDTConfig(
                objective=self.objective,
                num_class=self.num_class,
                is_unbalance=self.is_unbalance,
                early_stopping_rounds=50,
                seed=self.seed,
                **params,
            )
            model = GBDT(cfg).fit(Xt, yt, eval_set=deval)
            score = min(model.eval_history)
            self.trials.append((params, score))
            if score < self.best_score:
                self.best_score, self.best = score, params
        assert self.best is not None
        return self.best

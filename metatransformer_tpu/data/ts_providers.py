"""Time-series data providers: M4 (short-term forecasting) and UEA
(multivariate classification) — the two reference loader families still
missing next to the ETT csv loader.

Reference: ``Time-Series/data_provider/data_factory.py`` dispatch +
``data_loader.py`` (Dataset_M4 windows over ragged per-series rows;
UEAloader normalizing the .ts archives) and ``m4.py`` (per-frequency
horizons, naive2-normalized OWA at eval).
"""

from __future__ import annotations

import csv
import dataclasses
import io
import os
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

# M4 per-frequency horizon + seasonality (m4.py M4Meta)
M4_HORIZONS = {
    "Yearly": 6, "Quarterly": 8, "Monthly": 18,
    "Weekly": 13, "Daily": 14, "Hourly": 48,
}
M4_FREQUENCIES = {
    "Yearly": 1, "Quarterly": 4, "Monthly": 12,
    "Weekly": 1, "Daily": 1, "Hourly": 24,
}


def parse_m4_csv(text: str) -> Dict[str, np.ndarray]:
    """M4 csv ('V1,V2,...' header; rows 'id,v1,v2,...' ragged with empty
    tails) -> {series_id: [T] float}."""
    out: Dict[str, np.ndarray] = {}
    reader = csv.reader(io.StringIO(text))
    header = next(reader, None)
    if header and header[0].strip('"') not in ("V1",):
        # no header — treat the first row as data
        reader = csv.reader(io.StringIO(text))
    for row in reader:
        if not row:
            continue
        sid = row[0].strip('"')
        vals = [v for v in row[1:] if v not in ("", '"')]
        out[sid] = np.asarray([float(v) for v in vals], np.float32)
    return out


def load_m4(root: str, freq: str, split: str = "train") -> Dict[str, np.ndarray]:
    """``{root}/{freq}-{train,test}.csv`` -> {series_id: values}."""
    path = os.path.join(root, f"{freq}-{split}.csv")
    with open(path) as f:
        return parse_m4_csv(f.read())


@dataclasses.dataclass
class M4Windows:
    """Fixed-size (insample, target) windows over the ragged series —
    Dataset_M4.__getitem__ semantics: insample is the last ``seq_len``
    observations left-padded with zeros + mask; target is the horizon."""

    x: np.ndarray  # [N, seq_len, 1]
    x_mask: np.ndarray  # [N, seq_len]
    y: np.ndarray  # [N, horizon, 1]
    ids: List[str]


def m4_windows(
    train: Dict[str, np.ndarray],
    test: Dict[str, np.ndarray],
    freq: str,
    seq_len_mult: int = 2,
) -> M4Windows:
    """Pair each series' training tail with its test horizon. seq_len =
    seq_len_mult * horizon (the reference's input-size convention)."""
    horizon = M4_HORIZONS[freq]
    seq_len = seq_len_mult * horizon
    xs, ms, ys, ids = [], [], [], []
    for sid, hist in train.items():
        tgt = test.get(sid)
        if tgt is None:
            continue
        x = np.zeros((seq_len,), np.float32)
        m = np.zeros((seq_len,), np.float32)
        tail = hist[-seq_len:]
        x[-len(tail):] = tail
        m[-len(tail):] = 1.0
        y = np.zeros((horizon,), np.float32)
        y[: min(horizon, len(tgt))] = tgt[:horizon]
        xs.append(x)
        ms.append(m)
        ys.append(y)
        ids.append(sid)
    return M4Windows(
        x=np.stack(xs)[..., None] if xs else np.zeros((0, seq_len, 1), np.float32),
        x_mask=np.stack(ms) if ms else np.zeros((0, seq_len), np.float32),
        y=np.stack(ys)[..., None] if ys else np.zeros((0, horizon, 1), np.float32),
        ids=ids,
    )


def smape(pred: np.ndarray, true: np.ndarray) -> float:
    """The M4 headline metric (losses.py smape_2_loss)."""
    denom = np.abs(pred) + np.abs(true)
    return float(
        200.0 * np.mean(np.abs(pred - true) / np.maximum(denom, 1e-8))
    )


def naive2_forecast(history: np.ndarray, horizon: int, season: int) -> np.ndarray:
    """Seasonal-naive baseline used by the OWA normalization."""
    if season > 1 and len(history) >= season:
        reps = history[-season:]
        return np.resize(reps, horizon)
    return np.full((horizon,), history[-1], np.float32)


def mase(
    pred: np.ndarray, true: np.ndarray, history: np.ndarray, season: int
) -> float:
    """Mean absolute scaled error: MAE scaled by the in-sample seasonal
    naive MAE (the second M4 component metric)."""
    season = max(int(season), 1)
    if len(history) > season:
        scale = np.mean(np.abs(history[season:] - history[:-season]))
    else:
        scale = np.mean(np.abs(np.diff(history))) if len(history) > 1 else 1.0
    return float(np.mean(np.abs(pred - true)) / max(scale, 1e-8))


def owa(
    pred: np.ndarray, true: np.ndarray, history: np.ndarray, season: int
) -> float:
    """M4 overall weighted average: mean of (sMAPE, MASE) each normalized
    by the Naive2 baseline's value on the same series
    (``Time-Series/utils/m4_summary.py`` evaluation protocol)."""
    n2 = naive2_forecast(history, len(true), season)
    s_model = smape(pred, true)
    s_naive = max(smape(n2, true), 1e-8)
    m_model = mase(pred, true, history, season)
    m_naive = max(mase(n2, true, history, season), 1e-8)
    return float(0.5 * (s_model / s_naive + m_model / m_naive))


# ---------------------------------------------------------------------------
# UEA .ts archives
# ---------------------------------------------------------------------------


def parse_ts_file(text: str) -> Tuple[np.ndarray, np.ndarray, List[str]]:
    """Minimal .ts (sktime) parser for the equal-length UEA archives:
    header '@...' directives, then one line per case —
    ``dim1: v, v, ... : dim2 ... : label``.
    -> (data [N, T, C], labels int [N], class names)."""
    lines = text.splitlines()
    data_started = False
    cases: List[List[List[float]]] = []
    labels: List[str] = []
    for line in lines:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        if line.lower().startswith("@data"):
            data_started = True
            continue
        if line.startswith("@"):
            continue
        if not data_started:
            continue
        parts = line.split(":")
        labels.append(parts[-1].strip())
        dims = []
        for d in parts[:-1]:
            dims.append([float(v) for v in d.split(",") if v.strip()])
        cases.append(dims)
    if not cases:
        return np.zeros((0, 0, 0), np.float32), np.zeros((0,), np.int64), []
    t = max(len(d) for c in cases for d in c)
    c_dims = len(cases[0])
    data = np.zeros((len(cases), t, c_dims), np.float32)
    for i, case in enumerate(cases):
        for j, dim in enumerate(case):
            data[i, : len(dim), j] = dim
    classes = sorted(set(labels))
    idx = {c: i for i, c in enumerate(classes)}
    y = np.asarray([idx[l] for l in labels], np.int64)
    return data, y, classes


def load_uea(root: str, name: str, split: str = "TRAIN"):
    """``{root}/{name}/{name}_{TRAIN,TEST}.ts`` -> (data, labels,
    classes)."""
    with open(os.path.join(root, name, f"{name}_{split}.ts")) as f:
        return parse_ts_file(f.read())


def normalize_uea(
    data: np.ndarray, eps: float = 1e-8
) -> np.ndarray:
    """Per-instance standardization (UEAloader.instance_norm)."""
    mean = data.mean(axis=1, keepdims=True)
    std = data.std(axis=1, keepdims=True)
    return (data - mean) / (std + eps)

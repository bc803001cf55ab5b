"""Host data pipelines: batching, shuffling, device prefetch, and the
reference's dataset formats.

Covers: AST's JSON manifest datasets + dataset norm stats
(``Audio/src/dataloader.py``, ``get_norm_stats.py``), Time-Series-Library
CSV loading with calendar features (``Time-Series/data_provider/``),
ModelNet-style npy point clouds, and a generic epoch loader with
double-buffered device prefetch (the dataloader-worker equivalent).
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence

import jax
import numpy as np


class NumpyLoader:
    """Minimal epoch loader: shuffle, batch, drop-remainder, prefetch."""

    def __init__(
        self,
        arrays: Dict[str, np.ndarray],
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        transform: Optional[Callable[[Dict[str, np.ndarray]], Dict]] = None,
    ):
        self.arrays = arrays
        n = len(next(iter(arrays.values())))
        assert all(len(v) == n for v in arrays.values())
        self.n = n
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.transform = transform
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        if self.drop_last:
            return self.n // self.batch_size
        return -(-self.n // self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        idx = np.arange(self.n)
        if self.shuffle:
            self._rng.shuffle(idx)
        end = self.n - (self.n % self.batch_size) if self.drop_last else self.n
        for i in range(0, end, self.batch_size):
            sel = idx[i : i + self.batch_size]
            batch = {k: v[sel] for k, v in self.arrays.items()}
            if self.transform:
                batch = self.transform(batch)
            yield batch


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Double-buffered host->device prefetch (the worker-process
    equivalent; with a NamedSharding it also distributes the batch)."""
    import collections
    import itertools

    queue = collections.deque()

    def put(batch):
        if sharding is not None:
            queue.append(
                jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
            )
        else:
            queue.append(jax.tree_util.tree_map(jax.device_put, batch))

    it = iter(iterator)
    for batch in itertools.islice(it, size):
        put(batch)
    while queue:
        yield queue.popleft()
        try:
            put(next(it))
        except StopIteration:
            pass


# --- audio manifests (AST format) -------------------------------------------


def read_audio_manifest(path: str) -> List[Dict[str, str]]:
    """AST JSON manifest: {"data": [{"wav": ..., "labels": ...}, ...]}."""
    with open(path) as f:
        return json.load(f)["data"]


def dataset_norm_stats(spectrograms: Sequence[np.ndarray]):
    """Dataset mean/std for spectrogram normalization (get_norm_stats.py)."""
    flat = np.concatenate([np.asarray(s).reshape(-1) for s in spectrograms])
    return float(flat.mean()), float(flat.std())


def normalize_spectrogram(spec: np.ndarray, mean: float, std: float):
    """AST normalization: (x - mean) / (2 * std) (dataloader.py:80-88)."""
    return (spec - mean) / (2.0 * std)


# --- time-series CSV (ETT format) --------------------------------------------


def load_ett_csv(
    path: str, seq_len: int, label_len: int, pred_len: int,
    target_cols: Optional[Sequence[str]] = None,
):
    """ETT-style CSV -> sliding windows with calendar marks.

    Returns dict of arrays: x_enc [N, seq_len, C], x_mark_enc [N, seq_len,
    4] (month, day, weekday, hour — reference column order), x_dec /
    x_mark_dec with the label_len + pred_len decoder window, y targets.
    """
    import pandas as pd

    df = pd.read_csv(path)
    dates = pd.to_datetime(df.iloc[:, 0])
    values = df.iloc[:, 1:] if target_cols is None else df[list(target_cols)]
    data = values.to_numpy(np.float32)
    marks = np.stack(
        [dates.dt.month, dates.dt.day, dates.dt.weekday, dates.dt.hour], axis=1
    ).astype(np.int32)

    n = len(data) - seq_len - pred_len + 1
    x_enc, x_dec, me, md, y = [], [], [], [], []
    for i in range(n):
        s, e = i, i + seq_len
        r0, r1 = e - label_len, e + pred_len
        x_enc.append(data[s:e])
        me.append(marks[s:e])
        dec = np.concatenate(
            [data[r0:e], np.zeros((pred_len, data.shape[1]), np.float32)]
        )
        x_dec.append(dec)
        md.append(marks[r0:r1])
        y.append(data[e:r1])
    return {
        "x_enc": np.stack(x_enc),
        "x_mark_enc": np.stack(me),
        "x_dec": np.stack(x_dec),
        "x_mark_dec": np.stack(md),
        "y": np.stack(y),
    }


# --- point clouds -------------------------------------------------------------


def sample_points(points: np.ndarray, n: int, rng: np.random.Generator):
    """Random (re)sampling to a fixed point count (train-time resample,
    examples/classification/train.py:255-260 uses FPS; random is the
    documented alternative for the CPU pipeline)."""
    if len(points) >= n:
        idx = rng.choice(len(points), n, replace=False)
    else:
        idx = rng.choice(len(points), n, replace=True)
    return points[idx]

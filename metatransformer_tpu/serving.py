"""Serving: a batching dispatcher over the bucketed encoder programs.

The reference serves each modality from separate per-task scripts
(e.g. ``Image/``, ``Audio/`` inference entry points); here one
dispatcher accepts mixed-modality requests, tokenizes via the
``pipeline.Data2Seq`` facade, groups requests by padded bucket length
(``pipeline.bucket_length``), pads each group to (bucket, batch-bucket)
so every (T, B) pair hits one cached XLA executable, runs
``pipeline.encode_bucketed``, and scatters pooled features back in
request order.

TPU-native rationale: compiled-program reuse is the serving cost model —
arbitrary (B, T) shapes would recompile per request; the bucket ladder
bounds the executable set to |length buckets| x |batch buckets|.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu import pipeline
from metatransformer_tpu.core import encoder as enc


@dataclasses.dataclass(frozen=True)
class ServingConfig:
    encoder: enc.EncoderConfig = enc.BASE
    batch_buckets: Tuple[int, ...] = (1, 2, 4, 8, 16, 32)
    precision: enc.Precision = enc.BF16
    pool: str = "mean"  # "mean" over valid tokens | "none" (full seq)


@dataclasses.dataclass
class Request:
    modality: str
    data: Any  # raw modality input for pipeline.Data2Seq
    request_id: int = 0


def batch_bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"batch {n} exceeds the largest batch bucket {buckets[-1]}")


class Dispatcher:
    """Groups requests by (length bucket, batch bucket) and serves each
    group with one cached program. Synchronous core — wrap in a queue
    thread for a daemon; the grouping/padding policy is the hard part
    and is fully tested here."""

    def __init__(
        self,
        tokenizers: Dict[str, Tuple["pipeline.Data2Seq", Dict[str, jax.Array]]],
        encoder_params: Dict[str, jax.Array],
        cfg: ServingConfig,
    ):
        self.tokenizers = tokenizers  # modality -> (facade, params)
        self.encoder_params = encoder_params
        self.cfg = cfg
        self.stats: Dict[Tuple[int, int], int] = {}

    def _tokenize(self, req: Request) -> np.ndarray:
        facade, params = self.tokenizers[req.modality]
        toks = facade(params, req.data)
        toks = np.asarray(toks)
        return toks[0] if toks.ndim == 3 else toks

    def serve(self, requests: List[Request]) -> List[np.ndarray]:
        """-> per-request pooled features (cfg.pool='mean') or full
        [T_i, D] sequences, in input order."""
        tokens = [self._tokenize(r) for r in requests]
        groups: Dict[int, List[int]] = {}
        for i, t in enumerate(tokens):
            lb = pipeline.bucket_length(t.shape[0])
            groups.setdefault(lb, []).append(i)

        out: List[Optional[np.ndarray]] = [None] * len(requests)
        d = self.cfg.encoder.dim
        for lb, idxs in sorted(groups.items()):
            bb = batch_bucket(len(idxs), self.cfg.batch_buckets)
            batch = np.zeros((bb, lb, d), np.float32)
            mask = np.zeros((bb, lb), bool)
            for row, i in enumerate(idxs):
                t = tokens[i]
                batch[row, : t.shape[0]] = t
                mask[row, : t.shape[0]] = True
            self.stats[(lb, bb)] = self.stats.get((lb, bb), 0) + 1
            feats = pipeline.encode_bucketed(
                self.encoder_params, jnp.asarray(batch), jnp.asarray(mask),
                self.cfg.encoder, precision=self.cfg.precision,
            )
            feats = np.asarray(feats, np.float32)
            for row, i in enumerate(idxs):
                n = tokens[i].shape[0]
                if self.cfg.pool == "mean":
                    out[i] = feats[row, :n].mean(axis=0)
                else:
                    out[i] = feats[row, :n]
        return out  # type: ignore[return-value]

    @property
    def num_programs(self) -> int:
        """Distinct (length, batch) shapes served — each is one XLA
        executable in steady state."""
        return len(self.stats)


# ---------------------------------------------------------------------------
# Daemon: queue/worker loop around the Dispatcher
# (the reference serves via per-task demo scripts, e.g.
# ``Image/segmentation/image_demo.py:16-40``; this is the online-serving
# equivalent with max-wait/max-batch batching and latency accounting)
# ---------------------------------------------------------------------------

import threading
import time
from concurrent.futures import Future
from queue import Empty, Queue


class ServingDaemon:
    """Background worker: collect requests until ``max_batch`` or
    ``max_wait_s`` elapses, flush the group through ``Dispatcher.serve``,
    resolve per-request futures. Records raw-input -> output latency per
    request (the BASELINE.md p50 target's measurement point)."""

    def __init__(
        self,
        dispatcher: Dispatcher,
        max_batch: int = 32,
        max_wait_s: float = 0.005,
    ):
        self.dispatcher = dispatcher
        self.max_batch = max_batch
        self.max_wait_s = max_wait_s
        self._queue: "Queue[Tuple[Request, Future, float]]" = Queue()
        self._latencies_s: List[float] = []
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def submit(self, request: Request) -> Future:
        """Enqueue one request -> Future resolving to its features."""
        fut: Future = Future()
        self._queue.put((request, fut, time.perf_counter()))
        return fut

    def _collect(self) -> List[Tuple[Request, Future, float]]:
        """One flush group: first item blocks, then drain until max_batch
        or the max-wait deadline."""
        try:
            first = self._queue.get(timeout=0.05)
        except Empty:
            return []
        group = [first]
        deadline = time.perf_counter() + self.max_wait_s
        while len(group) < self.max_batch:
            rem = deadline - time.perf_counter()
            if rem <= 0:
                break
            try:
                group.append(self._queue.get(timeout=rem))
            except Empty:
                break
        return group

    def _run(self) -> None:
        while not self._stop.is_set():
            group = self._collect()
            if not group:
                continue
            reqs = [g[0] for g in group]
            try:
                outs = self.dispatcher.serve(reqs)
            except Exception as exc:  # resolve every waiter with the error
                for _, fut, _ in group:
                    fut.set_exception(exc)
                continue
            done = time.perf_counter()
            with self._lock:
                for (_, fut, t0), out in zip(group, outs):
                    self._latencies_s.append(done - t0)
                    fut.set_result(out)

    def latency_percentiles(self) -> Dict[str, float]:
        """-> {"p50_ms", "p99_ms", "n"} over all served requests."""
        with self._lock:
            lats = list(self._latencies_s)
        if not lats:
            return {"p50_ms": 0.0, "p99_ms": 0.0, "n": 0}
        arr = np.asarray(lats) * 1e3
        return {
            "p50_ms": float(np.percentile(arr, 50)),
            "p99_ms": float(np.percentile(arr, 99)),
            "n": len(arr),
        }

    def stop(self, timeout: float = 2.0) -> None:
        self._stop.set()
        self._thread.join(timeout=timeout)

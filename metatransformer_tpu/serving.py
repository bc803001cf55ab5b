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
    # fused=True (pooled serving only): each (modality, batch-bucket)
    # group runs ONE raw->tokens->encoder->pooled XLA program — no
    # intermediate token readback, one device dispatch per group, and
    # the readback is B*D floats. Mixed-length bucket sharing buys
    # nothing once outputs are pooled (no cross-sequence interaction),
    # so this dominates the bucketed path for feature serving; the
    # bucketed path remains the mode for pool="none" full sequences
    # and for multimodal fusion (``pipeline.fuse_and_encode``).
    fused: bool = False
    # Ceiling on distinct packed-flush executables. The packed program
    # retraces per flush *composition* (the multiset of (modality,
    # raw-shape, batch-bucket) groups); compositions are canonicalized
    # so arrival order never forces a retrace, but a shifting request
    # mix can still grow the set. Once the ceiling is reached, a flush
    # with a NEW composition falls back to the bucketed per-group path
    # (whose executable set is bounded by the bucket ladder) instead of
    # compiling — the daemon can never compile-storm.
    max_packed_programs: int = 16


@dataclasses.dataclass
class Request:
    modality: str
    # raw modality input for pipeline.Data2Seq (leading batch axis of 1),
    # OR encoded payload bytes (JPEG/PNG/AVI/WAV/UTF-8/npy/npz) — bytes
    # are decoded at the serving edge by data/codecs.decode_payload.
    data: Any
    request_id: int = 0


def maybe_decode(request: Request, **decode_opts) -> Request:
    """Decode an encoded-bytes request into its array form (no-op for
    array requests). Runs on the CALLER's thread in ``ServingDaemon.
    submit`` — codec work parallelizes across client threads instead of
    serializing on the flush loop, and a malformed payload fails the one
    request that sent it."""
    if isinstance(request.data, (bytes, bytearray)):
        from metatransformer_tpu.data import codecs

        return dataclasses.replace(
            request,
            data=codecs.decode_payload(
                request.modality, bytes(request.data), **decode_opts
            ),
        )
    return request


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
        # (modality, padded batch) -> invocation count: each key is one
        # cached tokenizer executable, mirroring ``stats`` for the encoder.
        self.tok_stats: Dict[Tuple[str, int], int] = {}
        # seconds spent in device dispatches (packed flush call +
        # readback), excluding host-side grouping/stacking/queueing —
        # the serve-side split of end-to-end latency.
        self.dispatch_s: float = 0.0
        # canonical packed-flush compositions seen so far; its size is
        # the packed-path retrace count (one compile per member).
        self._packed_comps: set = set()
        # flushes served via the bucketed fallback because compiling a
        # new packed composition would exceed cfg.max_packed_programs.
        self.packed_fallbacks: int = 0

    @staticmethod
    def _shape_sig(data: Any) -> Tuple:
        leaves, treedef = jax.tree.flatten(data)
        # read shape/dtype attributes only — np.asarray would pull a
        # device-resident payload back to host just to key the group
        return (str(treedef),) + tuple(
            (
                tuple(getattr(l, "shape", ())),
                str(getattr(l, "dtype", type(l).__name__)),
            )
            for l in leaves
        )

    def _stack_pad(self, datas: List[Any]) -> Tuple[Any, int]:
        """Stack same-shape raw inputs on the batch axis, padded up the
        batch-bucket ladder so the executable set stays bounded (pad
        rows repeat the last request and are sliced off). Payloads that
        already live on device are concatenated with jnp so they never
        round-trip through the host."""
        n = len(datas)
        bb = batch_bucket(n, self.cfg.batch_buckets)

        def _cat(*xs):
            parts = list(xs) + [xs[-1]] * (bb - n)
            if len(parts) == 1:
                return parts[0]
            if any(isinstance(x, jax.Array) for x in xs):
                return jnp.concatenate([jnp.asarray(x) for x in parts], axis=0)
            return np.concatenate([np.asarray(x) for x in parts], axis=0)

        return jax.tree.map(_cat, *datas), bb

    def _tokenize_group(self, modality: str, datas: List[Any]) -> List[np.ndarray]:
        """Tokenize same-modality, same-raw-shape requests in ONE stacked
        call. One device dispatch per group instead of one per request —
        the tokenize-side twin of the encoder's bucket batching."""
        facade, params = self.tokenizers[modality]
        stacked, bb = self._stack_pad(datas)
        self.tok_stats[(modality, bb)] = self.tok_stats.get((modality, bb), 0) + 1
        toks = np.asarray(facade(params, stacked))
        return [toks[i] for i in range(len(datas))]

    def _packed_fn(self):
        """One jitted program for an ENTIRE flush: every modality group's
        raw batch in, every group's pooled features out. XLA overlaps the
        independent per-modality subgraphs, and the host pays ONE device
        dispatch per flush instead of one per group — on an RPC device
        transport the per-dispatch roundtrip otherwise dominates. jit
        retraces per flush composition (dict keys + shapes); the
        batch-bucket ladder keeps the composition set bounded."""
        if getattr(self, "_packed", None) is None:
            tokenizers = self.tokenizers
            ecfg, prec = self.cfg.encoder, self.cfg.precision

            def packed(tok_params, enc_params, raws):
                out = {}
                for k in raws:
                    m = k.split("/", 1)[0]  # key = modality/bucket/occurrence
                    toks = tokenizers[m][0]._apply(tok_params[m], raws[k])
                    feats = enc.encode(enc_params, toks, ecfg, precision=prec)
                    # Unmasked mean is correct ONLY because same-raw-shape
                    # grouping guarantees every token is valid (tokenizers
                    # emit no internal padding); if a tokenizer ever pads,
                    # thread a mask like encode_bucketed_pooled does.
                    out[k] = feats.astype(jnp.float32).mean(axis=1)
                return out

            self._packed = jax.jit(packed)
        return self._packed

    def _serve_fused(self, requests, by_sig) -> List[np.ndarray]:
        # Plan first (no stacking yet): canonical group keys are
        # (modality, batch-bucket, occurrence index) under a sorted
        # signature walk, so the packed program's jit signature depends
        # only on the MULTISET of (modality, raw-shape, bucket) groups
        # — the same mix arriving in any order reuses one executable.
        cap = max(self.cfg.batch_buckets)
        plan: List[Tuple[str, Tuple, int, List[int]]] = []
        occ: Dict[Tuple[str, int], int] = {}
        for sig, idxs in sorted(by_sig.items(), key=lambda kv: kv[0]):
            modality = sig[0]
            for k in range(0, len(idxs), cap):
                chunk = idxs[k : k + cap]
                bb = batch_bucket(len(chunk), self.cfg.batch_buckets)
                g = occ.get((modality, bb), 0)
                occ[(modality, bb)] = g + 1
                plan.append((f"{modality}/{bb}/{g}", sig, bb, chunk))
        comp = tuple((key, sig, bb) for key, sig, bb, _ in plan)
        if comp not in self._packed_comps:
            if len(self._packed_comps) >= self.cfg.max_packed_programs:
                # executable-count ceiling: serve this flush through the
                # bucketed per-group path rather than compile a new
                # packed program for an unseen composition.
                self.packed_fallbacks += 1
                return self._serve_bucketed(requests, by_sig)
            self._packed_comps.add(comp)

        raws: Dict[str, Any] = {}
        rows: Dict[str, List[int]] = {}
        tok_params: Dict[str, Any] = {}
        for key, sig, bb, chunk in plan:
            modality = sig[0]
            tok_params[modality] = self.tokenizers[modality][1]
            stacked, _ = self._stack_pad([requests[i].data for i in chunk])
            self.tok_stats[(modality, bb)] = (
                self.tok_stats.get((modality, bb), 0) + 1
            )
            raws[key] = stacked
            rows[key] = chunk
        out: List[Optional[np.ndarray]] = [None] * len(requests)
        t0 = time.perf_counter()
        pooled = self._packed_fn()(tok_params, self.encoder_params, raws)
        pooled = {k: np.asarray(v) for k, v in pooled.items()}
        self.dispatch_s += time.perf_counter() - t0
        for key, chunk in rows.items():
            for row, i in enumerate(chunk):
                out[i] = pooled[key][row]
        return out  # type: ignore[return-value]

    @property
    def packed_retraces(self) -> int:
        """Distinct packed-flush compositions compiled so far."""
        return len(self._packed_comps)

    def serve(self, requests: List[Request]) -> List[np.ndarray]:
        """-> per-request pooled features (cfg.pool='mean') or full
        [T_i, D] sequences, in input order. Encoded-bytes requests are
        decoded here (the sync-path twin of ``ServingDaemon.submit``)."""
        requests = [maybe_decode(r) for r in requests]
        by_sig: Dict[Tuple, List[int]] = {}
        for i, r in enumerate(requests):
            if r.modality not in self.tokenizers:
                raise KeyError(r.modality)
            by_sig.setdefault(
                (r.modality,) + self._shape_sig(r.data), []
            ).append(i)
        if self.cfg.fused and self.cfg.pool == "mean":
            return self._serve_fused(requests, by_sig)
        return self._serve_bucketed(requests, by_sig)

    def _serve_bucketed(self, requests, by_sig) -> List[np.ndarray]:
        """Per-group path: tokenize each (modality, raw-shape) group,
        then encode by (length bucket, batch bucket). Executable set is
        bounded by the bucket ladder, independent of request mix — the
        fused path's fallback under the packed-program ceiling."""
        tokens: List[Optional[np.ndarray]] = [None] * len(requests)
        cap = max(self.cfg.batch_buckets)
        for sig, idxs in by_sig.items():
            for k in range(0, len(idxs), cap):
                chunk = idxs[k : k + cap]
                group = self._tokenize_group(
                    sig[0], [requests[i].data for i in chunk]
                )
                for i, t in zip(chunk, group):
                    tokens[i] = t
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
            if self.cfg.pool == "mean":
                # pooling stays on device: readback is [bb, D], not
                # [bb, lb, D] (pipeline.encode_bucketed_pooled)
                pooled = np.asarray(
                    pipeline.encode_bucketed_pooled(
                        self.encoder_params, jnp.asarray(batch),
                        jnp.asarray(mask), self.cfg.encoder,
                        precision=self.cfg.precision,
                    ),
                    np.float32,
                )
                for row, i in enumerate(idxs):
                    out[i] = pooled[row]
                continue
            feats = pipeline.encode_bucketed(
                self.encoder_params, jnp.asarray(batch), jnp.asarray(mask),
                self.cfg.encoder, precision=self.cfg.precision,
            )
            feats = np.asarray(feats, np.float32)
            for row, i in enumerate(idxs):
                n = tokens[i].shape[0]
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
from queue import Empty, Full, Queue


class QueueFullError(RuntimeError):
    """Raised (via the request Future) when the daemon queue is at
    ``max_queue`` — the load-shedding signal for upstream retry/backoff."""


class ServingDaemon:
    """Background worker: collect requests until ``max_batch`` or
    ``max_wait_s`` elapses, flush the group through ``Dispatcher.serve``,
    resolve per-request futures. Records raw-input -> output latency per
    request (the BASELINE.md p50 target's measurement point).

    Backpressure: with ``max_queue > 0`` the queue is bounded and
    ``submit`` rejects immediately when full (the Future resolves to
    ``QueueFullError``) instead of letting latency grow without bound —
    callers see load-shedding, not a silent multi-second p99."""

    def __init__(
        self,
        dispatcher: Dispatcher,
        max_batch: int = 32,
        max_wait_s: float = 0.005,
        max_queue: int = 0,
        decode_opts: Optional[Dict[str, Any]] = None,
    ):
        self.dispatcher = dispatcher
        self.max_batch = max_batch
        self.max_wait_s = max_wait_s
        self.decode_opts = decode_opts or {}
        self._queue: "Queue[Tuple[Request, Future, float]]" = Queue(
            maxsize=max_queue
        )
        self.rejected: int = 0
        self._latencies_s: List[float] = []
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def submit(self, request: Request) -> Future:
        """Enqueue one request -> Future resolving to its features, or
        to ``QueueFullError`` if the bounded queue is full. Encoded-bytes
        payloads decode here, on the caller's thread; a malformed payload
        resolves this request's Future without touching the flush loop."""
        fut: Future = Future()
        if isinstance(request.data, (bytes, bytearray)):
            try:
                request = maybe_decode(request, **self.decode_opts)
            except Exception as exc:
                fut.set_exception(exc)
                return fut
        try:
            self._queue.put_nowait((request, fut, time.perf_counter()))
        except Full:
            with self._lock:
                self.rejected += 1
            fut.set_exception(
                QueueFullError(
                    f"serving queue full ({self._queue.maxsize}); shed load"
                )
            )
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

    def reset_stats(self) -> None:
        """Drop recorded latencies (e.g. after a warmup pass whose
        requests paid one-time XLA compiles)."""
        with self._lock:
            self._latencies_s.clear()

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

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

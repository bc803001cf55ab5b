"""Multi-host init + ZeRO-1 optimizer-state sharding.

The reference's launcher zoo (torch.distributed.launch, mp.spawn,
SLURM/OMPI env parsing, fairseq ddp, DataParallel — SURVEY.md §2.12)
collapses into ``initialize()``; DeepSpeed's optional ZeRO (Video
``run_class_finetuning.py:397-399``) becomes :func:`zero1_sharding` —
optimizer moments sharded over the data axis via GSPMD, no wrapper
engine needed.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with env-var autodetection; no-op for
    single-process (the reference's "Not using distributed mode" path)."""
    if num_processes in (None, 1) and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def zero1_sharding(opt_state: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Place optimizer-state leaves sharded over the data axis (ZeRO-1).

    Each leaf is sharded along its largest dimension divisible by the
    axis size; scalars / indivisible leaves stay replicated. Grad
    all-reduce + sharded optimizer update then compose inside one jit —
    GSPMD inserts reduce-scatter/all-gather as needed.
    """
    n = mesh.shape[axis]

    def place(x):
        if not hasattr(x, "shape"):
            return x
        if x.ndim == 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        dims = [(d, s) for d, s in enumerate(x.shape) if s % n == 0 and s >= n]
        if not dims:
            return jax.device_put(x, NamedSharding(mesh, P()))
        best = max(dims, key=lambda t: t[1])[0]
        spec = [None] * x.ndim
        spec[best] = axis
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map(place, opt_state)


def global_batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def local_process_slice(global_batch_size: int) -> slice:
    """The slice of the global batch this host should load."""
    per = global_batch_size // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)

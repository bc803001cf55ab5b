"""Profiling harness: params / FLOPs / throughput for any jitted fn.

Replaces the reference's deepspeed-based ``PointCloud/examples/profile.py``
(:19,52-65 FLOPs/MACs/params + :95 timing loop) with JAX-native tools:
``jax.jit(...).lower().compile().cost_analysis()`` for FLOPs and the
fori-loop-chained on-device timing used across this repo (see bench.py
for why naive timing lies on this machine).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def count_params(params: Any) -> int:
    return int(
        sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params))
    )


def cost_analysis(fn: Callable, *args) -> Dict[str, float]:
    """Compiled-program cost analysis: flops, bytes accessed, etc."""
    compiled = jax.jit(fn).lower(*args).compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # older jax returns [dict]
        costs = costs[0] if costs else {}
    return {
        "flops": float(costs.get("flops", float("nan"))),
        "bytes_accessed": float(costs.get("bytes accessed", float("nan"))),
    }


def throughput(
    fn: Callable,
    args: tuple,
    batch_size: int,
    iters: int = 10,
    perturb: Optional[Callable] = None,
) -> Dict[str, float]:
    """seq/s via on-device chained timing. ``fn(*args) -> array``;
    ``perturb(args, i_scalar)`` must make iteration i's input depend on
    the previous output (defaults to scaling the last arg)."""

    if perturb is None:
        def perturb(a, c):
            return (*a[:-1], a[-1] * (1 + 1e-9 * c))

    def chained(*a):
        def body(_, c):
            return jnp.mean(fn(*perturb(a, c)))

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    run = jax.jit(chained)
    float(run(*args))  # compile + sync
    t0 = time.perf_counter()
    float(run(*args))
    dt = (time.perf_counter() - t0) / iters
    return {
        "ms_per_batch": dt * 1e3,
        "seq_per_s": batch_size / dt,
    }


def profile_model(
    fn: Callable, params: Any, example: jax.Array, batch_size: int
) -> Dict[str, float]:
    """One-stop: params + FLOPs + throughput (profile.py equivalent)."""
    out = {"params_m": count_params(params) / 1e6}
    try:
        out.update(cost_analysis(fn, params, example))
        if np.isfinite(out["flops"]):
            out["gflops_per_seq"] = out["flops"] / batch_size / 1e9
    except Exception:
        pass
    out.update(throughput(fn, (params, example), batch_size))
    return out

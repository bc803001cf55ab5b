"""Pipeline parallelism for the shared encoder (GPipe schedule).

The reference has no pipeline parallelism (SURVEY §2.12: 12-24 blocks fit
on one chip); this is the TPU-native beyond-parity path for depth scaling:
the stacked per-layer parameter pytree (leading axis = depth) is sharded
over a ``pipe`` mesh axis — each device holds ``depth / n_stages``
contiguous blocks — and microbatches flow stage-to-stage around the ICI
ring with ``jax.lax.ppermute`` in the classic GPipe fill/steady/drain
schedule (n_stages + n_microbatches - 1 ticks, bubble fraction
(n-1)/(M+n-1)).

Everything is one ``jax.lax.fori_loop`` under ``jax.shard_map``: no host
round-trips, one compiled program, and the parameter memory per chip
drops by the stage count (the point of PP).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def make_pipeline_encode(
    mesh: jax.sharding.Mesh,
    cfg,
    axis: str = "pipe",
    n_microbatches: int = 2,
    precision=None,
    batch_axis: Optional[str] = None,
):
    """Returns fn (params, x [B, T, D]) -> [B, T, D] running the encoder
    block stack as an n-stage pipeline over ``axis``. ``cfg.depth`` must
    divide by the axis size and the batch by ``n_microbatches``. Params
    enter sharded on their leading (depth) axis; x and the output are
    replicated (shard x over a 'data' axis upstream for DP+PP)."""
    from jax.sharding import PartitionSpec as P

    from metatransformer_tpu.core import encoder as enc

    n = mesh.shape[axis]
    if cfg.depth % n:
        raise ValueError(f"depth {cfg.depth} not divisible by stages {n}")
    prec = precision or enc.FP32
    m = n_microbatches
    perm = [(i, (i + 1) % n) for i in range(n)]
    x_spec = P(batch_axis, None, None)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), x_spec),
        out_specs=x_spec,
        check_vma=False,
    )
    def _pipe(params, x):
        b, t, d_model = x.shape
        mb = b // m
        x_mb = x.reshape(m, mb, t, d_model)
        d = jax.lax.axis_index(axis)

        def local_stack(h):
            def body(carry, layer_params):
                return enc.block(carry, layer_params, cfg, None, prec), None

            out, _ = jax.lax.scan(body, h, params)
            return out

        def tick(ti, st):
            recv, out_buf = st
            inject = x_mb[jnp.clip(ti, 0, m - 1)]
            h_in = jnp.where(d == 0, inject, recv)
            h_out = local_stack(h_in)
            # last stage: commit microbatch j = ti - (n-1) when in range
            j = ti - (n - 1)
            valid = (j >= 0) & (j < m) & (d == n - 1)
            committed = jax.lax.dynamic_update_index_in_dim(
                out_buf, h_out, jnp.clip(j, 0, m - 1), 0
            )
            out_buf = jnp.where(valid, committed, out_buf)
            recv_next = jax.lax.ppermute(h_out, axis, perm)
            return recv_next, out_buf

        recv0 = jnp.zeros((mb, t, d_model), x.dtype)
        out0 = jnp.zeros((m, mb, t, d_model), x.dtype)
        _, out_buf = jax.lax.fori_loop(0, m + n - 1, tick, (recv0, out0))
        # only the last stage holds real outputs (zeros elsewhere)
        out_buf = jax.lax.psum(out_buf, axis)
        return out_buf.reshape(b, t, d_model)

    def apply(params, x):
        return _pipe(params, x)

    return apply

"""Expert parallelism: Switch-style top-1 MoE MLP over an ``expert`` axis.

The reference has no mixture-of-experts (SURVEY §2.12: EP marked n/a —
pcdet's ``pvrcnn_head_MoE`` is a per-dataset gate, see models/pv_rcnn.py).
This is the TPU-native beyond-parity EP path, completing the
dp/tp/sp/pp/ep strategy set: each device on the ``expert`` mesh axis owns
one (or more) expert FFNs; tokens are routed top-1 (Switch Transformer
semantics: softmax router, fixed per-expert capacity with drop, and the
load-balance auxiliary loss alpha * E * sum_i f_i * P_i), exchanged with
``jax.lax.all_to_all`` over the ICI ring, transformed by the local
expert, and returned.

Two entry points:
- ``moe_mlp(params, x, n_experts, capacity_factor)`` — the dense
  (single-device) reference: identical math, used for parity tests and
  single-chip runs.
- ``make_expert_parallel_moe(mesh, ...)`` — the shard_map EP version:
  batch sharded over the expert axis (each group routes its own tokens),
  experts sharded one-per-device, all_to_all dispatch/return.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def init(
    key: jax.Array, dim: int, hidden: int, n_experts: int
) -> Dict[str, jax.Array]:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "router_w": jax.random.normal(k1, (dim, n_experts)) * 0.02,
        "fc1_w": jax.random.normal(k2, (n_experts, dim, hidden))
        * np.sqrt(2.0 / dim),
        "fc1_b": jnp.zeros((n_experts, hidden)),
        "fc2_w": jax.random.normal(k3, (n_experts, hidden, dim))
        * np.sqrt(2.0 / hidden),
        "fc2_b": jnp.zeros((n_experts, dim)),
    }


def _route(params, x, n_experts, capacity):
    """Top-1 routing -> (dispatch [N, E, C] one-hot, combine [N, E, C],
    aux load-balance loss). N = flattened tokens."""
    logits = x @ params["router_w"]  # [N, E]
    probs = jax.nn.softmax(logits, axis=-1)
    expert = jnp.argmax(probs, axis=-1)  # [N]
    gate = jnp.max(probs, axis=-1)  # [N]
    onehot = jax.nn.one_hot(expert, n_experts, dtype=x.dtype)  # [N, E]
    # position of each token within its expert's queue (arrival order)
    pos = jnp.cumsum(onehot, axis=0) * onehot - 1.0  # [N, E], -1 elsewhere
    keep = (pos >= 0) & (pos < capacity)
    pos_oh = jax.nn.one_hot(
        jnp.where(keep, pos, -1).max(-1).astype(jnp.int32), capacity,
        dtype=x.dtype,
    )  # [N, C]
    dispatch = (onehot * keep.astype(x.dtype))[:, :, None] * pos_oh[:, None, :]
    combine = dispatch * gate[:, None, None]
    # Switch aux loss: E * sum_i (token fraction_i * mean router prob_i)
    frac = jnp.mean(onehot, axis=0)
    mean_p = jnp.mean(probs, axis=0)
    aux = n_experts * jnp.sum(frac * mean_p)
    return dispatch, combine, aux


def _expert_ffn(w1, b1, w2, b2, h):
    return jax.nn.gelu(h @ w1 + b1) @ w2 + b2


def moe_mlp(
    params: Dict[str, jax.Array],
    x: jax.Array,  # [B, T, D]
    n_experts: int,
    capacity_factor: float = 1.25,
) -> Tuple[jax.Array, jax.Array]:
    """Dense reference MoE: -> (output [B, T, D], aux loss scalar)."""
    b, t, d = x.shape
    n = b * t
    xf = x.reshape(n, d)
    capacity = max(int(capacity_factor * n / n_experts), 1)
    dispatch, combine, aux = _route(params, xf, n_experts, capacity)
    # gather expert inputs: [E, C, D]
    exp_in = jnp.einsum("nec,nd->ecd", dispatch, xf)
    exp_out = jax.vmap(_expert_ffn)(
        params["fc1_w"], params["fc1_b"], params["fc2_w"], params["fc2_b"],
        exp_in,
    )  # [E, C, D]
    out = jnp.einsum("nec,ecd->nd", combine, exp_out)
    return out.reshape(b, t, d), aux


def make_expert_parallel_moe(
    mesh: jax.sharding.Mesh,
    n_experts: int,
    axis: str = "expert",
    capacity_factor: float = 1.25,
):
    """EP version: one expert per device on ``axis`` (n_experts must equal
    the axis size), batch sharded over the same axis (each device routes
    its local tokens), all_to_all exchange. Returns fn (params, x) ->
    (out, aux) with identical semantics to ``moe_mlp`` up to the per-group
    capacity (capacity is computed per local group, the standard EP
    formulation)."""
    from jax.sharding import PartitionSpec as P

    if mesh.shape[axis] != n_experts:
        raise ValueError(
            f"n_experts {n_experts} != '{axis}' axis size {mesh.shape[axis]}"
        )

    param_specs = {
        "router_w": P(),
        "fc1_w": P(axis), "fc1_b": P(axis),
        "fc2_w": P(axis), "fc2_b": P(axis),
    }
    x_spec = P(axis, None, None)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(param_specs, x_spec),
        out_specs=(x_spec, P()),
        check_vma=False,
    )
    def _moe(params, x):
        b, t, d = x.shape  # local shard
        n = b * t
        xf = x.reshape(n, d)
        capacity = max(int(capacity_factor * n / n_experts), 1)
        dispatch, combine, aux = _route(params, xf, n_experts, capacity)
        exp_in = jnp.einsum("nec,nd->ecd", dispatch, xf)  # [E, C, D]
        # all_to_all: each device keeps its expert's inputs from every
        # source group -> [G, C, D] (G = n_experts source groups)
        recv = jax.lax.all_to_all(exp_in, axis, 0, 0, tiled=False)
        g = recv.shape[0]
        h = recv.reshape(g * recv.shape[1], d)
        out = _expert_ffn(
            params["fc1_w"][0], params["fc1_b"][0],
            params["fc2_w"][0], params["fc2_b"][0], h,
        ).reshape(g, recv.shape[1], d)
        # return results to the source groups -> [E, C, D] locally again
        back = jax.lax.all_to_all(out, axis, 0, 0, tiled=False)
        y = jnp.einsum("nec,ecd->nd", combine, back)
        aux = jax.lax.pmean(aux, axis)
        return y.reshape(b, t, d), aux

    return _moe

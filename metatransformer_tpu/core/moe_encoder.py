"""MoE encoder variant: transformer stack with Switch-MoE MLPs.

No reference counterpart (the reference has no mixture-of-experts
transformer; SURVEY §2.12 EP = n/a) — this is the beyond-parity capacity-
scaling path that pairs with ``parallel/moe.make_expert_parallel_moe``:
every ``moe_every``-th block's MLP is replaced by a Switch top-1 MoE
(router + per-expert FFN + load-balance aux loss), so parameter count
scales with ``n_experts`` while per-token FLOPs stay constant.

Unlike :mod:`core.encoder` (one ``lax.scan`` over stacked homogeneous
layers) the stack here is a static Python loop: MoE and dense layers have
different param trees, and depth is small (12-24) so unrolling is cheap
for XLA. Attention / LN / dense-MLP math reuses the shared encoder's
functions exactly — a checkpoint converted for the dense encoder loads
into the dense part unchanged.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from metatransformer_tpu.core import encoder as enc
from metatransformer_tpu.parallel import moe


@dataclasses.dataclass(frozen=True)
class MoEEncoderConfig:
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    ln_eps: float = 1e-5
    n_experts: int = 4
    moe_every: int = 2  # blocks i with (i+1) % moe_every == 0 get MoE MLPs
    capacity_factor: float = 1.25
    aux_weight: float = 0.01

    @property
    def block_cfg(self) -> enc.EncoderConfig:
        return enc.EncoderConfig(
            dim=self.dim, depth=1, num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio, ln_eps=self.ln_eps, attn_impl="xla",
        )

    def is_moe(self, i: int) -> bool:
        return (i + 1) % self.moe_every == 0


def make_encode_ep(cfg: MoEEncoderConfig, mesh, axis: str = "expert"):
    """Expert-parallel ``encode``: identical stack, but every MoE layer's
    Switch MLP runs through ``parallel.moe.make_expert_parallel_moe``
    (experts one-per-device on ``axis``, all_to_all dispatch). Input batch
    must be divisible by the axis size. Parity with the dense ``encode``
    holds whenever no token is dropped (capacity_factor high enough) —
    asserted in ``__graft_entry__.dryrun_multichip``."""
    ep_fn = moe.make_expert_parallel_moe(
        mesh, cfg.n_experts, axis=axis, capacity_factor=cfg.capacity_factor
    )

    def encode_ep(params: Dict[str, Any], x: jax.Array):
        bcfg = cfg.block_cfg
        aux_total = jnp.float32(0.0)
        for i, lp in enumerate(params["layers"]):
            h = enc.layer_norm(
                x, lp["norm1_scale"], lp["norm1_bias"], cfg.ln_eps
            )
            x = x + enc.attention(h, lp, bcfg, None, enc.FP32)
            h = enc.layer_norm(
                x, lp["norm2_scale"], lp["norm2_bias"], cfg.ln_eps
            )
            if cfg.is_moe(i):
                out, aux = ep_fn(lp["moe"], h)
                aux_total = aux_total + aux
            else:
                out = enc.mlp(h, lp, enc.FP32)
            x = x + out
        return x, cfg.aux_weight * aux_total

    return encode_ep


def init(cfg: MoEEncoderConfig, key: jax.Array) -> Dict[str, Any]:
    layers = []
    keys = jax.random.split(key, cfg.depth)
    shapes = enc.param_shapes(cfg.block_cfg)
    for i in range(cfg.depth):
        lkeys = iter(jax.random.split(keys[i], len(shapes) + 1))
        lp: Dict[str, Any] = {}
        for name, shape in shapes.items():
            if cfg.is_moe(i) and name.startswith("fc"):
                continue  # MoE replaces the dense MLP
            k = next(lkeys)
            if name.endswith("_w"):
                lp[name] = (
                    jax.random.truncated_normal(k, -2.0, 2.0, shape) * 0.02
                )
            elif "scale" in name:
                lp[name] = jnp.ones(shape)
            else:
                lp[name] = jnp.zeros(shape)
        if cfg.is_moe(i):
            lp["moe"] = moe.init(
                next(lkeys), cfg.dim, int(cfg.dim * cfg.mlp_ratio),
                cfg.n_experts,
            )
        layers.append(lp)
    return {"layers": layers}


@functools.partial(jax.jit, static_argnames=("cfg",))
def encode(
    params: Dict[str, Any],
    x: jax.Array,  # [B, T, D]
    cfg: MoEEncoderConfig,
) -> Tuple[jax.Array, jax.Array]:
    """-> (encoded [B, T, D], weighted aux load-balance loss scalar)."""
    bcfg = cfg.block_cfg
    aux_total = jnp.float32(0.0)
    for i, lp in enumerate(params["layers"]):
        h = enc.layer_norm(x, lp["norm1_scale"], lp["norm1_bias"], cfg.ln_eps)
        x = x + enc.attention(h, lp, bcfg, None, enc.FP32)
        h = enc.layer_norm(x, lp["norm2_scale"], lp["norm2_bias"], cfg.ln_eps)
        if cfg.is_moe(i):
            out, aux = moe.moe_mlp(
                lp["moe"], h, cfg.n_experts, cfg.capacity_factor
            )
            aux_total = aux_total + aux
        else:
            out = enc.mlp(h, lp, enc.FP32)
        x = x + out
    return x, cfg.aux_weight * aux_total

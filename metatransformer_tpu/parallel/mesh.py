"""Device mesh + sharding rules: the TPU-native distributed layer.

Replaces the reference's entire launcher zoo — torch.distributed.launch,
mp.spawn, SLURM/OMPI env rendezvous, fairseq legacy_ddp, nn.DataParallel
(SURVEY.md §2.12) — with one mesh + GSPMD shardings. Collectives (grad
all-reduce, TP psum) are emitted by XLA over ICI; no hand-written comm.

Axes:
  data  — batch sharding (the reference's only parallelism, DDP).
  model — tensor parallelism over attention heads / MLP hidden dim
          (not in the reference; needed for L14+ scale serving).

Pipeline / sequence / expert parallelism are intentionally absent: the
reference has none (max seq ~1.6k tokens, 12-24 layers fit on chip);
SURVEY.md §5.7 documents this as out of scope.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, model: int = 1) -> Mesh:
    """('data', 'model') mesh. ``model`` = TP degree; rest is data-parallel."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if n % model:
        raise ValueError(f"n_devices {n} not divisible by model parallelism {model}")
    grid = np.asarray(devices[:n]).reshape(n // model, model)
    return Mesh(grid, ("data", "model"))


# Tensor-parallel layout of the stacked encoder (leading axis = depth):
# shard attention heads via the fused-qkv output dim and the MLP hidden dim;
# XLA inserts the psum after proj/fc2 automatically.
ENCODER_PSPECS: Dict[str, P] = {
    "norm1_scale": P(),
    "norm1_bias": P(),
    "qkv_w": P(None, None, "model"),
    "qkv_b": P(None, "model"),
    "proj_w": P(None, "model", None),
    "proj_b": P(),
    "norm2_scale": P(),
    "norm2_bias": P(),
    "fc1_w": P(None, None, "model"),
    "fc1_b": P(None, "model"),
    "fc2_w": P(None, "model", None),
    "fc2_b": P(),
}


def classifier_pspecs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec pytree for a classifier param dict: encoder TP-sharded,
    everything else (tokenizer, pos, head — all tiny) replicated."""

    def rep(tree):
        return jax.tree_util.tree_map(lambda _: P(), tree)

    specs = {k: rep(v) for k, v in params.items() if k != "encoder"}
    specs["encoder"] = {k: ENCODER_PSPECS[k] for k in params["encoder"]}
    return specs


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    specs = classifier_pspecs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard the leading (batch) axis of every leaf over the data axis."""
    sh = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)

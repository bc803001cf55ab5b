"""Checkpoint conversion: released PyTorch ``.pth`` encoders -> JAX pytrees.

The load-bearing reference artifact is
``Meta-Transformer_{base,large}_patch{16,14}_encoder.pth`` — a flat state
dict of ``nn.Sequential`` of timm ``Block`` with keys like
``0.attn.qkv.weight`` (loaded ``strict=True`` in eight places of the
reference, e.g. ``/root/reference/README.md:135``,
``PointCloud/openpoints/models/backbone/metatransformer.py:96``).

We convert once, offline, into the stacked-depth pytree consumed by
:mod:`metatransformer_tpu.core.encoder` and store it as ``.npz`` (or via
orbax for sharded checkpoints). torch is only imported inside the converter
so the serving/training path never depends on it.
"""

from __future__ import annotations

import re
from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.core import encoder as enc

# timm Block key -> (our leaf name, needs transpose)
_KEY_MAP = {
    "norm1.weight": ("norm1_scale", False),
    "norm1.bias": ("norm1_bias", False),
    "attn.qkv.weight": ("qkv_w", True),
    "attn.qkv.bias": ("qkv_b", False),
    "attn.proj.weight": ("proj_w", True),
    "attn.proj.bias": ("proj_b", False),
    "norm2.weight": ("norm2_scale", False),
    "norm2.bias": ("norm2_bias", False),
    "mlp.fc1.weight": ("fc1_w", True),
    "mlp.fc1.bias": ("fc1_b", False),
    "mlp.fc2.weight": ("fc2_w", True),
    "mlp.fc2.bias": ("fc2_b", False),
}


def convert_state_dict(state: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Convert a flat ``{i}.{submodule}`` torch state dict to a stacked pytree.

    Accepts numpy arrays (call :func:`load_torch_checkpoint` for ``.pth``).
    Unknown keys raise — the reference loads ``strict=True`` and so do we.
    """
    per_layer: Dict[int, Dict[str, np.ndarray]] = {}
    for key, value in state.items():
        m = re.match(r"^(\d+)\.(.+)$", key)
        if not m:
            raise ValueError(f"unexpected checkpoint key: {key!r}")
        idx, sub = int(m.group(1)), m.group(2)
        if sub not in _KEY_MAP:
            # ls1/ls2 (LayerScale) and q_norm/k_norm are Identity in the
            # released checkpoints; anything else is a real mismatch.
            raise ValueError(f"unexpected submodule key: {key!r}")
        name, transpose = _KEY_MAP[sub]
        arr = np.asarray(value, dtype=np.float32)
        if transpose:
            arr = arr.T  # torch Linear stores [out, in]; we use [in, out]
        per_layer.setdefault(idx, {})[name] = arr

    depth = len(per_layer)
    if sorted(per_layer) != list(range(depth)):
        raise ValueError(f"non-contiguous layer indices: {sorted(per_layer)}")
    names = list(_KEY_MAP[k][0] for k in _KEY_MAP)
    stacked = {}
    for name in names:
        stacked[name] = np.stack([per_layer[i][name] for i in range(depth)])
    return stacked


def infer_config(params: Mapping[str, np.ndarray]) -> enc.EncoderConfig:
    depth, dim = params["norm1_scale"].shape
    if (depth, dim) == (12, 768):
        return enc.BASE
    if (depth, dim) == (24, 1024):
        return enc.LARGE
    # Fall back: num_heads follows the released family rule (dim/64).
    return enc.EncoderConfig(dim=dim, depth=depth, num_heads=dim // 64)


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a ``.pth`` encoder state dict into numpy (torch cpu only here)."""
    import torch  # local import: serving path must not require torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    if "state_dict" in state and isinstance(state["state_dict"], dict):
        state = state["state_dict"]
    return {k: v.detach().numpy() for k, v in state.items()}


def convert_pth(path: str):
    """``.pth`` -> (stacked params pytree on default device, config)."""
    state = load_torch_checkpoint(path)
    np_params = convert_state_dict(state)
    cfg = infer_config(np_params)
    params = {k: jnp.asarray(v) for k, v in np_params.items()}
    return params, cfg


def save_npz(path: str, params: Mapping[str, np.ndarray]) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})


def load_npz(path: str):
    with np.load(path) as data:
        np_params = {k: data[k] for k in data.files}
    cfg = infer_config(np_params)
    return {k: jnp.asarray(v) for k, v in np_params.items()}, cfg


def main(argv=None) -> None:
    """CLI: ``python -m metatransformer_tpu.core.convert in.pth out.npz``."""
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("pth_in")
    p.add_argument("npz_out")
    args = p.parse_args(argv)
    params, cfg = convert_pth(args.pth_in)
    save_npz(args.npz_out, params)
    print(f"converted {args.pth_in} -> {args.npz_out}  ({cfg})")


if __name__ == "__main__":
    main()

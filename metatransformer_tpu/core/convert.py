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


# ---------------------------------------------------------------------------
# BEiT checkpoints (rel-pos-bias tables, LayerScale, split q/v biases)
# ---------------------------------------------------------------------------

# BEiT block key -> (our leaf name, needs transpose)
_BEIT_KEY_MAP = {
    "norm1.weight": ("norm1_scale", False),
    "norm1.bias": ("norm1_bias", False),
    "attn.qkv.weight": ("qkv_w", True),
    "attn.q_bias": ("q_bias", False),
    "attn.v_bias": ("v_bias", False),
    "attn.relative_position_bias_table": ("rel_pos_table", False),
    "attn.proj.weight": ("proj_w", True),
    "attn.proj.bias": ("proj_b", False),
    "gamma_1": ("gamma_1", False),
    "gamma_2": ("gamma_2", False),
    "norm2.weight": ("norm2_scale", False),
    "norm2.bias": ("norm2_bias", False),
    "mlp.fc1.weight": ("fc1_w", True),
    "mlp.fc1.bias": ("fc1_b", False),
    "mlp.fc2.weight": ("fc2_w", True),
    "mlp.fc2.bias": ("fc2_b", False),
}


def resize_rel_pos_table(
    table: np.ndarray, dst_window: tuple
) -> np.ndarray:
    """Geometric-progression cubic resize of a relative-position bias
    table (mmcv_custom/checkpoint.py:394-457): the source grid is laid out
    on geometrically-spaced coordinates so outer (rare) distances stretch,
    then cubically resampled onto the destination's integer grid. The 3
    cls-token rows pass through unchanged."""
    from scipy.interpolate import RectBivariateSpline

    src_num_pos, heads = table.shape
    dst_num_pos = (2 * dst_window[0] - 1) * (2 * dst_window[1] - 1) + 3
    if dst_num_pos == src_num_pos:
        return table
    extra = table[-3:]
    body = table[:-3]
    src_size = int(round((src_num_pos - 3) ** 0.5))
    dst_size = 2 * dst_window[0] - 1
    assert src_size * src_size == src_num_pos - 3, "non-square source table"

    def geometric_progression(a, r, n):
        return a * (1.0 - r**n) / (1.0 - r)

    left, right = 1.01, 1.5
    while right - left > 1e-6:
        q = (left + right) / 2.0
        if geometric_progression(1, q, src_size // 2) > dst_size // 2:
            right = q
        else:
            left = q
    dis, cur = [], 1.0
    for i in range(src_size // 2):
        dis.append(cur)
        cur += q ** (i + 1)
    r_ids = [-v for v in reversed(dis)]
    x = np.asarray(r_ids + [0] + dis)
    t = dst_size // 2.0
    dx = np.arange(-t, t + 0.1, 1.0)

    cols = []
    for i in range(heads):
        z = body[:, i].reshape(src_size, src_size).astype(np.float64)
        f = RectBivariateSpline(x, x, z, kx=3, ky=3)
        cols.append(f(dx, dx).reshape(-1, 1))
    body = np.concatenate(cols, axis=-1).astype(np.float32)
    return np.concatenate([body, extra], axis=0)


def convert_beit_state_dict(
    state: Mapping[str, np.ndarray],
    dst_window: tuple = (14, 14),
) -> Dict[str, np.ndarray]:
    """BEiT ``blocks.{i}.*`` (or bare ``{i}.*``) state dict -> stacked
    pytree for :mod:`core.beit`.

    Handles the two checkpoint remaps of
    ``mmcv_custom/checkpoint.py:375-457``: a shared
    ``rel_pos_bias.relative_position_bias_table`` is expanded to every
    layer; per-layer tables are geometrically resized when the window
    geometry differs; ``relative_position_index`` buffers are dropped
    (we precompute the index, core/beit.relative_position_index).
    """
    state = dict(state)
    shared = state.pop("rel_pos_bias.relative_position_bias_table", None)

    per_layer: Dict[int, Dict[str, np.ndarray]] = {}
    for key, value in state.items():
        if "relative_position_index" in key:
            continue
        m = re.match(r"^(?:blocks\.)?(\d+)\.(.+)$", key)
        if not m:
            raise ValueError(f"unexpected BEiT checkpoint key: {key!r}")
        idx, sub = int(m.group(1)), m.group(2)
        if sub not in _BEIT_KEY_MAP:
            raise ValueError(f"unexpected BEiT submodule key: {key!r}")
        name, transpose = _BEIT_KEY_MAP[sub]
        arr = np.asarray(value, dtype=np.float32)
        if transpose:
            arr = arr.T
        per_layer.setdefault(idx, {})[name] = arr

    depth = len(per_layer)
    if sorted(per_layer) != list(range(depth)):
        raise ValueError(f"non-contiguous layer indices: {sorted(per_layer)}")
    for i in range(depth):
        if "rel_pos_table" not in per_layer[i]:
            if shared is None:
                raise ValueError(
                    f"layer {i} lacks a rel-pos table and no shared "
                    "rel_pos_bias table exists in the checkpoint"
                )
            per_layer[i]["rel_pos_table"] = np.asarray(shared, np.float32)
        per_layer[i]["rel_pos_table"] = resize_rel_pos_table(
            per_layer[i]["rel_pos_table"], dst_window
        )

    names = [v[0] for v in _BEIT_KEY_MAP.values()]
    return {
        name: np.stack([per_layer[i][name] for i in range(depth)])
        for name in names
    }




_UNIPERCEIVER_KEY_MAP = {
    "norm1.weight": ("norm1_scale", False),
    "norm1.bias": ("norm1_bias", False),
    "self_attn.in_proj.weight": ("qkv_w", True),  # [3D, D] -> [D, 3D]
    "self_attn.in_proj.bias": ("qkv_b", False),  # split into q/k/v below
    "self_attn.out_proj.weight": ("proj_w", True),
    "self_attn.out_proj.bias": ("proj_b", False),
    "gamma_1": ("gamma_1", False),
    "gamma_2": ("gamma_2", False),
    "norm2.weight": ("norm2_scale", False),
    "norm2.bias": ("norm2_bias", False),
    "linear1.weight": ("fc1_w", True),
    "linear1.bias": ("fc1_b", False),
    "linear2.weight": ("fc2_w", True),
    "linear2.bias": ("fc2_b", False),
}


def convert_uniperceiver_state_dict(
    state: Mapping[str, np.ndarray],
) -> Dict[str, np.ndarray]:
    """UniPerceiver ``layers.{i}.*`` BertLayer state dict -> stacked
    pytree for :mod:`core.beit` with ``rel_index=None`` blocks
    (backbones/base/uniperceiver.py:111-150). The fused in_proj bias is
    split into the q/k/v biases (k_bias is UniPerceiver-specific)."""
    per_layer: Dict[int, Dict[str, np.ndarray]] = {}
    for key, value in state.items():
        m = re.match(r"^(?:layers\.)?(\d+)\.(.+)$", key)
        if not m:
            raise ValueError(f"unexpected UniPerceiver checkpoint key: {key!r}")
        idx, sub = int(m.group(1)), m.group(2)
        if sub not in _UNIPERCEIVER_KEY_MAP:
            raise ValueError(f"unexpected UniPerceiver submodule key: {key!r}")
        name, transpose = _UNIPERCEIVER_KEY_MAP[sub]
        arr = np.asarray(value, dtype=np.float32)
        if transpose:
            arr = arr.T
        per_layer.setdefault(idx, {})[name] = arr

    depth = len(per_layer)
    if sorted(per_layer) != list(range(depth)):
        raise ValueError(f"non-contiguous layer indices: {sorted(per_layer)}")
    for i in range(depth):
        qkv_b = per_layer[i].pop("qkv_b")
        d = qkv_b.shape[0] // 3
        per_layer[i]["q_bias"] = qkv_b[:d]
        per_layer[i]["k_bias"] = qkv_b[d : 2 * d]
        per_layer[i]["v_bias"] = qkv_b[2 * d :]

    names = sorted(per_layer[0])
    return {
        name: np.stack([per_layer[i][name] for i in range(depth)])
        for name in names
    }


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

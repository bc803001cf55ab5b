"""Windowed attention for square token grids.

Reference: ``Image/segmentation/mmseg_custom/models/backbones/base/
vit.py:148`` (WindowedAttention) — attention restricted to non-overlapping
windows over the 2D token grid, used by ViT-Adapter variants to cut the
O(L^2) cost at high resolution.

TPU-native: window partition is a reshape/transpose; the windowed batch
then reuses the ordinary head-major attention. No padding needed when the
grid divides the window (callers pad the image, as the reference does).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def window_partition(x: jax.Array, grid_h: int, grid_w: int, window: int):
    """[B, H*W, C] grid tokens -> [B*nW, window*window, C]."""
    b, _, c = x.shape
    nh, nw = grid_h // window, grid_w // window
    x = x.reshape(b, nh, window, nw, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * nh * nw, window * window, c)


def window_unpartition(x: jax.Array, batch: int, grid_h: int, grid_w: int,
                       window: int):
    """Inverse of :func:`window_partition` -> [B, H*W, C]."""
    c = x.shape[-1]
    nh, nw = grid_h // window, grid_w // window
    x = x.reshape(batch, nh, nw, window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(batch, grid_h * grid_w, c)


def windowed_block(
    x: jax.Array,  # [B, H*W, C] grid tokens
    block_fn,  # callable([Bw, w*w, C]) -> [Bw, w*w, C] (a full block)
    grid_h: int,
    grid_w: int,
    window: int = 14,
) -> jax.Array:
    """Run a per-token transformer block with window-restricted attention:
    pad the grid to a window multiple (base/vit.py pads inside
    WindowedAttention), partition, apply, unpartition, crop. Valid because
    LN/MLP/residual are per-token — only attention sees the windows."""
    b, _, c = x.shape
    gh = -(-grid_h // window) * window
    gw = -(-grid_w // window) * window
    if (gh, gw) != (grid_h, grid_w):
        xg = x.reshape(b, grid_h, grid_w, c)
        xg = jnp.pad(xg, ((0, 0), (0, gh - grid_h), (0, gw - grid_w), (0, 0)))
        x = xg.reshape(b, gh * gw, c)
    xw = window_partition(x, gh, gw, window)
    out = block_fn(xw)
    out = window_unpartition(out, b, gh, gw, window)
    if (gh, gw) != (grid_h, grid_w):
        out = out.reshape(b, gh, gw, c)[:, :grid_h, :grid_w].reshape(
            b, grid_h * grid_w, c
        )
    return out


def windowed_attention(
    x: jax.Array,  # [B, H*W, C]
    attn_fn,  # callable([Bw, T, C]) -> [Bw, T, C] (plain attention)
    grid_h: int,
    grid_w: int,
    window: int = 14,
) -> jax.Array:
    """Apply ``attn_fn`` within non-overlapping windows."""
    b = x.shape[0]
    xw = window_partition(x, grid_h, grid_w, window)
    out = attn_fn(xw)
    return window_unpartition(out, b, grid_h, grid_w, window)

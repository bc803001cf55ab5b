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

"""Hyper-spectral data preparation (SpectralFormer pipeline).

Reference: ``Hyper-spectrum/train.py:80-127`` — mirror-pad the HSI cube,
extract patch x patch spatial neighborhoods around labeled pixels, and
build circular band-neighborhood views; each BAND becomes one token whose
features are the patch^2 x band_patch neighborhood values (the input the
hyper tokenizer's linear embedding consumes).
"""

from __future__ import annotations

import numpy as np


def mirror_pad(cube: np.ndarray, patch: int) -> np.ndarray:
    """[H, W, B] -> reflect-padded [(H+2p'), (W+2p'), B], p' = patch//2."""
    pad = patch // 2
    return np.pad(cube, ((pad, pad), (pad, pad), (0, 0)), mode="reflect")


def extract_patches(
    padded: np.ndarray, points: np.ndarray, patch: int
) -> np.ndarray:
    """points [N, 2] (row, col in the unpadded image) -> [N, p, p, B]."""
    out = np.stack(
        [padded[r : r + patch, c : c + patch] for r, c in np.asarray(points)]
    )
    return out


def band_patches(patches: np.ndarray, band_patch: int = 3) -> np.ndarray:
    """[N, p, p, B] -> [N, B, p*p*band_patch] band-token features.

    Token b carries the circular band neighborhood
    (b-nn, ..., b, ..., b+nn) of its spatial patch (gain_neighborhood_band
    semantics, circular shift over the band axis).
    """
    n, p, _, bands = patches.shape
    nn = band_patch // 2
    flat = patches.reshape(n, p * p, bands)
    views = []
    for s in range(-nn, nn + 1):
        views.append(np.roll(flat, -s, axis=2))
    # [N, band_patch, p*p, B] -> [N, B, band_patch * p * p]
    stack = np.stack(views, axis=1)
    return stack.transpose(0, 3, 1, 2).reshape(n, bands, band_patch * p * p)


def prepare_pixels(
    cube: np.ndarray,  # [H, W, B] normalized HSI cube
    points: np.ndarray,  # [N, 2] labeled pixel coordinates
    patch: int = 5,
    band_patch: int = 3,
) -> np.ndarray:
    """Full train_and_test_data path: -> [N, B, patch^2*band_patch]."""
    padded = mirror_pad(cube, patch)
    return band_patches(extract_patches(padded, points, patch), band_patch)

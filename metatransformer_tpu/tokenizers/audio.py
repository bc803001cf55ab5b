"""Audio (AST) tokenizer: overlapping strided conv over the spectrogram.

Reference: ``Data2Seq/Acoustic.py:5-23`` and
``Audio/src/models/ast_models.py:18-33,86-90`` — a 1-channel Conv2d with
16x16 kernel and (fstride, tstride)=(10,10) stride over the [freq, time]
log-mel spectrogram, producing overlapping patches; the projection can be
initialized by channel-summing RGB patch weights (``ast_models.py:86-90``).

Overlapping stride means this one stays a real conv (lax.conv on NHWC —
XLA lowers it to implicit-GEMM on the MXU).
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class AudioTokenizerConfig:
    num_mel_bins: int = 128  # frequency dim (F)
    num_frames: int = 1024  # time dim (T)
    patch_size: int = 16
    fstride: int = 10
    tstride: int = 10
    dim: int = 768

    @property
    def f_patches(self) -> int:
        return (self.num_mel_bins - self.patch_size) // self.fstride + 1

    @property
    def t_patches(self) -> int:
        return (self.num_frames - self.patch_size) // self.tstride + 1

    @property
    def num_patches(self) -> int:
        return self.f_patches * self.t_patches


def init(cfg: AudioTokenizerConfig, key: jax.Array) -> Dict[str, jax.Array]:
    scale = (cfg.patch_size * cfg.patch_size) ** -0.5
    return {
        # HWIO layout: [ph, pw, 1, D]
        "w": jax.random.normal(key, (cfg.patch_size, cfg.patch_size, 1, cfg.dim))
        * scale,
        "b": jnp.zeros((cfg.dim,), jnp.float32),
    }


def apply(
    params: Dict[str, jax.Array],
    spectrogram: jax.Array,
    cfg: AudioTokenizerConfig,
    mm: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """[B, T, F] log-mel spectrogram -> [B, f_patches*t_patches, D].

    Matches AST's forward (``ast_models.py:146-152``): input arrives as
    (batch, time, freq), is viewed as a 1-channel [F, T] image, then
    convolved; patches flatten frequency-major (torch ``flatten(2)``).
    """
    x = jnp.transpose(spectrogram, (0, 2, 1))[..., None]  # [B, F, T, 1]
    out = jax.lax.conv_general_dilated(
        x.astype(params["w"].dtype),
        params["w"],
        window_strides=(cfg.fstride, cfg.tstride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=mm,
    )  # [B, F', T', D]
    b = out.shape[0]
    return out.reshape(b, -1, cfg.dim) + params["b"]


def convert_torch_conv(weight: np.ndarray, bias: np.ndarray) -> Dict[str, jax.Array]:
    """torch Conv2d [D, 1, ph, pw] -> HWIO [ph, pw, 1, D]."""
    w = np.transpose(np.asarray(weight, np.float32), (2, 3, 1, 0))
    return {"w": jnp.asarray(w), "b": jnp.asarray(np.asarray(bias, np.float32))}


def init_from_rgb_patch(rgb_w: np.ndarray, rgb_b: np.ndarray) -> Dict[str, jax.Array]:
    """AST's ImageNet-init trick: channel-sum an RGB patch projection
    (``ast_models.py:86-90``). rgb_w: torch layout [D, 3, ph, pw]."""
    summed = np.asarray(rgb_w, np.float32).sum(axis=1, keepdims=True)
    return convert_torch_conv(summed, rgb_b)

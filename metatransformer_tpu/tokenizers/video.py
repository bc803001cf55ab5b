"""Video tokenizer: 3D tubelet patch embedding.

Reference: ``Data2Seq/Video.py:16`` (Conv3d patch embed) with the working
geometry from the Video subproject: Conv3d kernel=stride=(tubelet=2, 16,
16) over 16-frame 224x224 clips -> [B, 8*14*14=1568, 768]
(``Video/models/modeling_finetune.py:263-289``).

TPU-native: stride==kernel Conv3d is a block reshape + one matmul on the
MXU. Clips are [B, T, H, W, C] (channels-last); tubelet flatten order is
(kt, ph, pw, c), converter transposes torch [D, C, kt, kh, kw] to match.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class VideoTokenizerConfig:
    num_frames: int = 16
    img_size: int = 224
    patch_size: int = 16
    tubelet_size: int = 2
    in_channels: int = 3
    dim: int = 768

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size

    @property
    def t_patches(self) -> int:
        return self.num_frames // self.tubelet_size

    @property
    def num_patches(self) -> int:
        return self.t_patches * self.grid * self.grid

    @property
    def patch_dim(self) -> int:
        return self.tubelet_size * self.patch_size * self.patch_size * self.in_channels


def init(cfg: VideoTokenizerConfig, key: jax.Array) -> Dict[str, jax.Array]:
    return {
        "w": jax.random.normal(key, (cfg.patch_dim, cfg.dim)) * cfg.patch_dim**-0.5,
        "b": jnp.zeros((cfg.dim,), jnp.float32),
    }


def tubelets(clips: jax.Array, tubelet: int, patch: int) -> jax.Array:
    """[B, T, H, W, C] -> [B, (T/tt)*(H/p)*(W/p), tt*p*p*C]."""
    b, t, h, w, c = clips.shape
    tt, gh, gw = t // tubelet, h // patch, w // patch
    x = clips.reshape(b, tt, tubelet, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)  # [B, tt, gh, gw, tub, p, p, C]
    return x.reshape(b, tt * gh * gw, tubelet * patch * patch * c)


def apply(
    params: Dict[str, jax.Array],
    clips: jax.Array,
    cfg: VideoTokenizerConfig,
    mm: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jax.Array:
    # uint8 frames scale to [0, 1] on device (4x smaller wire payload —
    # video dominates the mixed-serving flush; see image.apply)
    if clips.dtype == jnp.uint8:
        clips = clips.astype(jnp.float32) * (1.0 / 255.0)
    x = tubelets(clips, cfg.tubelet_size, cfg.patch_size)
    return jnp.dot(x, params["w"], precision=mm) + params["b"]


def convert_torch_conv3d(weight: np.ndarray, bias: np.ndarray) -> Dict[str, jax.Array]:
    """torch Conv3d [D, C, kt, kh, kw] -> [kt*kh*kw*C, D]."""
    d = weight.shape[0]
    w = np.transpose(np.asarray(weight, np.float32), (2, 3, 4, 1, 0)).reshape(-1, d)
    return {"w": jnp.asarray(w), "b": jnp.asarray(np.asarray(bias, np.float32))}


def sincos_pos_embed(dim: int, length: int) -> np.ndarray:
    """VideoMAE's fixed sinusoid table (``modeling_finetune.py:318`` path)."""
    pos = np.arange(length, dtype=np.float64)[:, None]
    omega = 1.0 / (10000 ** (2 * (np.arange(dim, dtype=np.float64)[None] // 2) / dim))
    table = pos * omega
    table[:, 0::2] = np.sin(table[:, 0::2])
    table[:, 1::2] = np.cos(table[:, 1::2])
    return table[None].astype(np.float32)

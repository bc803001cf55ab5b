"""Image / Infrared / X-Ray tokenizer: 2D patch embedding.

Reference: ``Data2Seq/Image.py:4-28`` — Conv2d(kernel=16, stride=16) then
flatten+transpose to ``[B, 196, 768]``. The same tokenizer serves image,
infrared, and x-ray modalities (``Data2Seq/Data2Seq.py:25-26``).

TPU-native design: a stride==kernel "conv" is a block reshape followed by
one big matmul, which maps straight onto the MXU with no conv layout
handling. Images are NHWC (TPU-native), patches flatten in (ph, pw, c)
order; the converter transposes torch's [D, C, ph, pw] conv weights to
match.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ImageTokenizerConfig:
    img_size: int = 224
    patch_size: int = 16
    in_channels: int = 3
    dim: int = 768

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def patch_dim(self) -> int:
        return self.patch_size * self.patch_size * self.in_channels


def init(cfg: ImageTokenizerConfig, key: jax.Array) -> Dict[str, jax.Array]:
    wkey, _ = jax.random.split(key)
    scale = cfg.patch_dim**-0.5
    return {
        "w": jax.random.normal(wkey, (cfg.patch_dim, cfg.dim), jnp.float32) * scale,
        "b": jnp.zeros((cfg.dim,), jnp.float32),
    }


def patchify(images: jax.Array, patch: int) -> jax.Array:
    """[B, H, W, C] -> [B, (H/p)*(W/p), p*p*C], flatten order (ph, pw, c)."""
    b, h, w, c = images.shape
    gh, gw = h // patch, w // patch
    x = images.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, gh, gw, p, p, C]
    return x.reshape(b, gh * gw, patch * patch * c)


def apply(
    params: Dict[str, jax.Array],
    images: jax.Array,
    cfg: ImageTokenizerConfig,
    mm: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Raw [B, H, W, C] image -> [B, T, D] tokens.

    uint8 inputs are accepted and scaled to [0, 1] ON DEVICE: pixel
    payloads then cross the host->device link at 1 byte/px instead of 4
    (the ingress-bound serving path — BENCH_SERVING.md ships ~40 MB raw
    per mixed flush as float32; uint8 wire format cuts that 4x), and the
    divide fuses into the patch matmul.
    """
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) * (1.0 / 255.0)
    x = patchify(images, cfg.patch_size)
    return jnp.dot(x, params["w"], precision=mm) + params["b"]


def convert_torch_conv(weight: np.ndarray, bias: np.ndarray) -> Dict[str, jax.Array]:
    """torch Conv2d [D, C, ph, pw] (+[D]) -> our [ph*pw*C, D] matmul weights."""
    d = weight.shape[0]
    w = np.transpose(np.asarray(weight, np.float32), (2, 3, 1, 0)).reshape(-1, d)
    return {"w": jnp.asarray(w), "b": jnp.asarray(np.asarray(bias, np.float32))}

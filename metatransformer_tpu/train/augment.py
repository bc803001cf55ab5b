"""Training augmentations, jittable.

Covers the reference's per-modality augmentation stack:
* mixup — waveform-level (Audio dataloader.py:99-127) and batch
  feature/label-level (Video engine mixup, timm-style)
* SpecAugment freq/time masking (Audio dataloader.py:72-74,140)
* point-cloud transforms: rotate / scale / jitter / translate
  (``PointCloud/openpoints/transforms/``)
* random erasing (Video RandomErasing, simplified to per-sample box)
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def mixup_batch(rng, inputs, labels_onehot, alpha: float = 0.8):
    """timm-style batch mixup: mix each sample with a flipped-batch peer."""
    lam = jax.random.beta(rng, alpha, alpha)
    mixed = lam * inputs + (1 - lam) * jnp.flip(inputs, axis=0)
    labels = lam * labels_onehot + (1 - lam) * jnp.flip(labels_onehot, axis=0)
    return mixed, labels


def mixup_waveform(rng, wav, labels_onehot, alpha: float = 10.0):
    """AST's waveform mixup (beta(10,10), dataloader.py:99-127)."""
    return mixup_batch(rng, wav, labels_onehot, alpha)


def spec_augment(
    rng, spec: jax.Array, freq_mask: int = 48, time_mask: int = 48
) -> jax.Array:
    """SpecAugment on [B, T, F] log-mel spectrograms: one random frequency
    band and one random time band zeroed per sample."""
    b, t, f = spec.shape
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    fw = jax.random.randint(k1, (b, 1), 0, freq_mask + 1)
    f0 = jax.random.randint(k2, (b, 1), 0, jnp.maximum(f - fw, 1))
    tw = jax.random.randint(k3, (b, 1), 0, time_mask + 1)
    t0 = jax.random.randint(k4, (b, 1), 0, jnp.maximum(t - tw, 1))
    fidx = jnp.arange(f)[None, :]
    tidx = jnp.arange(t)[None, :]
    fmask = (fidx >= f0) & (fidx < f0 + fw)  # [B, F]
    tmask = (tidx >= t0) & (tidx < t0 + tw)  # [B, T]
    keep = ~(fmask[:, None, :] | tmask[:, :, None])
    return jnp.where(keep, spec, 0.0)


def rotate_points_z(rng, points: jax.Array) -> jax.Array:
    """Random z-rotation per sample, [B, N, 3]."""
    b = points.shape[0]
    theta = jax.random.uniform(rng, (b,), minval=0.0, maxval=2 * jnp.pi)
    c, s = jnp.cos(theta), jnp.sin(theta)
    zeros, ones = jnp.zeros_like(c), jnp.ones_like(c)
    rot = jnp.stack(
        [c, -s, zeros, s, c, zeros, zeros, zeros, ones], axis=-1
    ).reshape(b, 3, 3)
    return jnp.einsum("bnc,bcd->bnd", points, rot)


def scale_and_translate_points(
    rng, points: jax.Array,
    scale_range: Tuple[float, float] = (2.0 / 3.0, 3.0 / 2.0),
    shift: float = 0.2,
) -> jax.Array:
    k1, k2 = jax.random.split(rng)
    b = points.shape[0]
    scale = jax.random.uniform(
        k1, (b, 1, 3), minval=scale_range[0], maxval=scale_range[1]
    )
    offset = jax.random.uniform(k2, (b, 1, 3), minval=-shift, maxval=shift)
    return points * scale + offset


def jitter_points(rng, points: jax.Array, sigma: float = 0.01, clip: float = 0.05):
    noise = jnp.clip(
        jax.random.normal(rng, points.shape) * sigma, -clip, clip
    )
    return points + noise


def random_erase(rng, images: jax.Array, scale=(0.02, 0.33)) -> jax.Array:
    """Per-sample rectangular erase on [B, H, W, C] (RandomErasing intent)."""
    b, h, w, _ = images.shape
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    area = jax.random.uniform(k1, (b, 1), minval=scale[0], maxval=scale[1])
    side = jnp.sqrt(area)
    eh = (side * h).astype(jnp.int32)
    ew = (side * w).astype(jnp.int32)
    y0 = jax.random.randint(k2, (b, 1), 0, jnp.maximum(h - eh, 1))
    x0 = jax.random.randint(k3, (b, 1), 0, jnp.maximum(w - ew, 1))
    noise = jax.random.normal(k4, images.shape)
    yy = jnp.arange(h)[None, :]
    xx = jnp.arange(w)[None, :]
    ymask = (yy >= y0) & (yy < y0 + eh)  # [B, H]
    xmask = (xx >= x0) & (xx < x0 + ew)  # [B, W]
    box = ymask[:, :, None] & xmask[:, None, :]
    return jnp.where(box[..., None], noise, images)


def large_scale_jitter(
    rng,
    images: jax.Array,  # [B, H, W, C]
    boxes: jax.Array,  # [B, G, 4] xyxy (padded with zeros)
    ratio_range=(0.1, 2.0),
):
    """LSJ: random-resize in [0.1, 2.0] then fixed-canvas crop/pad back to
    the input size — the upgraded_mask_rcnn / DETR-origin augmentation
    (``Image/detection/configs/upgraded_mask_rcnn/*_lsj_*.py`` Resize
    ratio_range + absolute-range RandomCrop). Static output shapes: the
    scaled content is placed at the canvas origin, boxes scaled and
    clipped to the canvas; fully-cropped-out boxes collapse to zero area
    (caller's gt_valid weighting treats them as background).
    Returns (images', boxes', scale)."""
    b, h, w, c = images.shape
    k1, _ = jax.random.split(rng)
    scale = jax.random.uniform(
        k1, (), minval=ratio_range[0], maxval=ratio_range[1]
    )
    # resize the whole batch by `scale` onto an oversized canvas, then
    # crop/pad back to (h, w). jax.image.scale_and_translate handles the
    # fractional zoom in one XLA op with static output shape.
    out = jax.image.scale_and_translate(
        images.astype(jnp.float32),
        shape=(b, h, w, c),
        spatial_dims=(1, 2),
        scale=jnp.asarray([scale, scale], jnp.float32),
        translation=jnp.zeros((2,), jnp.float32),
        method="bilinear",
    )
    new_boxes = boxes * scale
    lim = jnp.asarray([w - 1, h - 1, w - 1, h - 1], jnp.float32)
    new_boxes = jnp.clip(new_boxes, 0.0, lim)
    return out, new_boxes, scale

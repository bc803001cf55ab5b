"""PointContrast-style unsupervised pretraining for point backbones.

Reference: ``AutonomousDriving/pcdet/models/detectors/unsupervised_model/``
(PointContrast-pattern pretraining of the pv_rcnn_plus backbone) — two
world-augmented views of the same scene pass through the backbone, and
matched points (same original index) form positive pairs for an InfoNCE
objective (``train/self_training.info_nce``).

TPU-native: the view augmentations are jittable (rotation/flip/scale
parameterized by a PRNG key, not host numpy), so the whole two-view
pretraining step is one compiled program.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from metatransformer_tpu.train.self_training import info_nce, mean_teacher_update


def augment_view(
    points: jax.Array,  # [B, N, 3+C]
    key: jax.Array,
    rot_range: float = 0.785398,
    scale_range: Tuple[float, float] = (0.95, 1.05),
) -> jax.Array:
    """Random world rotation/flip/scale of xyz (the data_augmentor world
    transforms, jittable)."""
    k1, k2, k3 = jax.random.split(key, 3)
    b = points.shape[0]
    ang = jax.random.uniform(k1, (b,), minval=-rot_range, maxval=rot_range)
    flip = jax.random.bernoulli(k2, 0.5, (b,))
    scale = jax.random.uniform(
        k3, (b,), minval=scale_range[0], maxval=scale_range[1]
    )
    c, s = jnp.cos(ang)[:, None], jnp.sin(ang)[:, None]
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    xr = x * c - y * s
    yr = x * s + y * c
    yr = jnp.where(flip[:, None], -yr, yr)
    xyz = jnp.stack([xr, yr, z], axis=-1) * scale[:, None, None]
    return jnp.concatenate([xyz, points[..., 3:]], axis=-1)


def make_pretrain_step(
    feature_fn: Callable,  # (params, points [B,N,3+C]) -> [B, N, D]
    optimizer,
    num_pairs: int = 256,
    temperature: float = 0.07,
):
    """One PointContrast step: two augmented views, per-point features,
    InfoNCE over `num_pairs` subsampled matched indices."""

    @jax.jit
    def step(params, opt_state, points, rng):
        ka, kb, kp = jax.random.split(rng, 3)
        va = augment_view(points, ka)
        vb = augment_view(points, kb)
        n = points.shape[1]
        idx = jax.random.choice(
            kp, n, (min(num_pairs, n),), replace=False
        )

        def loss_fn(p):
            fa = feature_fn(p, va)  # [B, N, D]
            fb = feature_fn(p, vb)
            losses = jax.vmap(
                lambda a, b: info_nce(a[idx], b[idx], temperature)
            )(fa, fb)
            return jnp.mean(losses)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step

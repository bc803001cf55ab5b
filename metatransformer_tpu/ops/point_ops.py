"""Point-cloud core ops: furthest-point sampling, kNN, ball query, gather.

Replaces the reference's pointnet2 CUDA kernels
(``PointCloud/openpoints/cpp/pointnet2_batch/src/{sampling,ball_query,
group_points}_gpu.cu`` and their wrappers
``openpoints/models/layers/{subsample,group}.py``).

TPU-native design:
* FPS is inherently sequential (G iterations of argmax over a running
  min-distance). The CUDA kernel parallelizes within one block; here the
  per-iteration work (distance update + argmax over [B, N]) is fully
  vectorized on the VPU and the G-step loop is a ``lax.fori_loop`` —
  G ~ 256-512, N ~ 1-8k, so the sequential depth is small.
* kNN = blocked pairwise distances + ``lax.top_k`` — one fused XLA
  program, no index kernels.
* Ball query = distance threshold + masked first-K selection via top_k on
  a biased key (matches the CUDA semantics: first K in-radius points,
  slots padded with the first hit).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def square_dists(a: jax.Array, b: jax.Array) -> jax.Array:
    """[B, M, 3], [B, N, 3] -> [B, M, N] squared euclidean distances."""
    aa = jnp.sum(a * a, axis=-1)[:, :, None]
    bb = jnp.sum(b * b, axis=-1)[:, None, :]
    ab = jnp.einsum("bmc,bnc->bmn", a, b, precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(aa + bb - 2.0 * ab, 0.0)


@functools.partial(jax.jit, static_argnames=("n_samples",))
def _fps_xla(points: jax.Array, n_samples: int) -> jax.Array:
    """XLA while-loop FPS: each of the G iterations round-trips the
    [B, N] running min-distance through HBM and pays the loop-step
    dispatch — the fallback when the Pallas kernel's VMEM budget
    doesn't fit (and the CPU-default path)."""
    b, n, _ = points.shape

    def body(i, state):
        min_d, idxs, last = state
        lastp = jnp.take_along_axis(points, last[:, None, None], axis=1)  # [B,1,3]
        d = jnp.sum(jnp.square(points - lastp), axis=-1)  # [B, N]
        min_d = jnp.minimum(min_d, d)
        nxt = jnp.argmax(min_d, axis=-1).astype(jnp.int32)  # [B]
        idxs = idxs.at[:, i].set(nxt)
        return min_d, idxs, nxt

    init = (
        jnp.full((b, n), jnp.inf, jnp.float32),
        jnp.zeros((b, n_samples), jnp.int32),
        jnp.zeros((b,), jnp.int32),
    )
    _, idxs, _ = jax.lax.fori_loop(1, n_samples, body, init)
    return idxs  # slot 0 already holds index 0


def _fps_kernel(xs_ref, ys_ref, zs_ref, out_ref):
    """Whole-problem-in-VMEM FPS (vs ``sampling_gpu.cu``: one CUDA block
    per cloud with a shared-memory argmax tree). All coordinate planes
    and the running min-distance stay VMEM-resident across the G
    sequential rounds, so each round is pure VPU work over [B, N] with
    no HBM traffic or loop-step dispatch; the chosen point's coords are
    extracted with a one-hot reduction (no dynamic gather) and indices
    accumulate in registers via an iota-match select."""
    tb, n = xs_ref.shape
    g = out_ref.shape[1]
    xs, ys, zs = xs_ref[:], ys_ref[:], zs_ref[:]
    col = jax.lax.broadcasted_iota(jnp.int32, (tb, n), 1)
    gcol = jax.lax.broadcasted_iota(jnp.int32, (tb, g), 1)

    def body(i, state):
        min_d, idxs, last = state
        sel = (col == last).astype(jnp.float32)  # [TB, N] one-hot rows
        lx = jnp.sum(xs * sel, axis=1, keepdims=True)
        ly = jnp.sum(ys * sel, axis=1, keepdims=True)
        lz = jnp.sum(zs * sel, axis=1, keepdims=True)
        d = jnp.square(xs - lx) + jnp.square(ys - ly) + jnp.square(zs - lz)
        min_d = jnp.minimum(min_d, d)
        nxt = jnp.argmax(min_d, axis=1).astype(jnp.int32)[:, None]  # [TB,1]
        idxs = jnp.where(gcol == i, nxt, idxs)
        return min_d, idxs, nxt

    init = (
        jnp.full((tb, n), jnp.inf, jnp.float32),
        jnp.zeros((tb, g), jnp.int32),
        jnp.zeros((tb, 1), jnp.int32),
    )
    _, idxs, _ = jax.lax.fori_loop(1, g, body, init)
    out_ref[:] = idxs


# ~6 live [B, N] f32 planes (x/y/z, min_d, d, one-hot) + slack must fit
# VMEM; beyond this the XLA path wins by streaming.
_FPS_VMEM_BUDGET = 12 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("n_samples", "interpret"))
def _fps_pallas(
    points: jax.Array, n_samples: int, interpret: bool = False
) -> jax.Array:
    b, n, _ = points.shape
    coords = jnp.moveaxis(points.astype(jnp.float32), -1, 0)  # [3, B, N]
    return pl.pallas_call(
        _fps_kernel,
        out_shape=jax.ShapeDtypeStruct((b, n_samples), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(coords[0], coords[1], coords[2])


def furthest_point_sample(points: jax.Array, n_samples: int) -> jax.Array:
    """FPS indices [B, n_samples] (int32). Starts at index 0, like the CUDA
    kernel (``sampling_gpu.cu`` seeds with point 0).

    On TPU this runs the VMEM-resident Pallas kernel (``_fps_kernel``)
    whenever the cloud fits the VMEM budget; elsewhere (CPU tests, huge
    clouds) the XLA while-loop twin. Override with ``MTT_FPS=pallas|xla``.
    """
    b, n, _ = points.shape
    impl = os.environ.get("MTT_FPS", "auto")
    fits = 6 * b * n * 4 <= _FPS_VMEM_BUDGET
    if impl == "pallas" or (
        impl == "auto" and fits and jax.default_backend() == "tpu"
    ):
        return _fps_pallas(
            points, n_samples, interpret=jax.default_backend() != "tpu"
        )
    return _fps_xla(points, n_samples)


def masked_fps(points: jax.Array, mask: jax.Array, n_samples: int) -> jax.Array:
    """FPS over a masked point set -> idx [B, n_samples]. Invalid points
    are collapsed onto the first valid point's coordinates so FPS never
    prefers them (a far sentinel would be maximally distant and get
    picked first — the opposite of ignoring it)."""
    first_valid = jnp.argmax(mask, axis=-1)  # [B]
    anchor = jnp.take_along_axis(
        points, first_valid[:, None, None], axis=1
    )  # [B, 1, 3]
    safe = jnp.where(mask[..., None], points, anchor)
    return furthest_point_sample(safe, n_samples)


def random_sample(key: jax.Array, points: jax.Array, n_samples: int) -> jax.Array:
    """Random subsample indices (the reference's cheap fallback,
    ``subsample.py random_sample``)."""
    b, n, _ = points.shape
    keys = jax.random.split(key, b)
    return jax.vmap(lambda k: jax.random.choice(k, n, (n_samples,), replace=False))(
        keys
    ).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k",))
def knn(centers: jax.Array, points: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """k nearest neighbors of each center. -> (dists [B,M,k], idx [B,M,k])."""
    d = square_dists(centers, points)
    neg, idx = jax.lax.top_k(-d, k)
    return -neg, idx.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k",))
def ball_query(
    centers: jax.Array, points: jax.Array, radius: float, k: int
) -> jax.Array:
    """First k in-radius neighbor indices; empty slots repeat the first hit
    (CUDA ``ball_query_gpu.cu`` semantics). -> idx [B, M, k]."""
    d = square_dists(centers, points)  # [B, M, N]
    n = points.shape[1]
    inside = d < radius * radius
    # Prefer in-radius points in original order: key = -index for inside,
    # -(index + n) for outside, so top_k picks in-radius ascending-index first.
    order = jnp.arange(n, dtype=jnp.float32)[None, None, :]
    key = jnp.where(inside, -order, -(order + n))
    _, idx = jax.lax.top_k(key, k)
    first = idx[..., :1]
    any_inside = jnp.any(inside, axis=-1, keepdims=True)
    count = jnp.sum(inside.astype(jnp.int32), axis=-1, keepdims=True)
    slot = jnp.arange(k, dtype=jnp.int32)[None, None, :]
    idx = jnp.where(slot < count, idx, first)
    idx = jnp.where(any_inside, idx, 0)  # no neighbors at all -> index 0
    return idx.astype(jnp.int32)


def gather_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """points [B, N, C], idx [B, ...] int -> [B, ..., C]."""
    return jax.vmap(lambda p, i: p[i])(points, idx)


def group_points(
    centers: jax.Array,
    points: jax.Array,
    idx: jax.Array,
    features: Optional[jax.Array] = None,
    relative_xyz: bool = True,
    normalize_dp: bool = False,
):
    """Gather neighborhoods. -> (dp [B,M,K,3], fj [B,M,K,C] or None).

    Matches ``KNNGroup.forward`` (``group.py:275``): dp = neighbor - center
    when relative_xyz, optionally normalized by the max |dp|.
    """
    grouped_p = gather_points(points, idx)  # [B, M, K, 3]
    dp = grouped_p - centers[:, :, None, :] if relative_xyz else grouped_p
    if normalize_dp:
        scale = jnp.max(jnp.abs(dp), axis=(1, 2, 3), keepdims=True)
        dp = dp / jnp.maximum(scale, 1e-8)
    fj = gather_points(features, idx) if features is not None else None
    return dp, fj

"""Performer / FAVOR+ linear attention (softmax kernel estimator).

Reference: the optional Performer path in Graph/TokenGT —
``Graph/metatransformer/modules/performer_pytorch.py:61-151``
(``softmax_kernel`` positive random features, ``FastAttention``) with
orthogonal random features (``:103-141`` gaussian_orthogonal_random_matrix)
and the projection-redraw updater
(``modules/tokengt_graph_encoder.py:223-245``). Unused by the released
recipe, provided for parity as ``EncoderConfig(attn_impl="performer")``.

TPU-native design:
- The random-feature matrix is a *trace-time constant*: computed with
  numpy from the static ``(seed, num_features, head_dim)`` in the config,
  so it is folded into the compiled program — zero per-step cost and no
  threading of rng state through the jitted encoder. A redraw is a seed
  bump (one recompile), matching the reference's every-N-steps cadence
  at jit granularity.
- The estimator is three MXU einsums (q-features, k-features·V, output)
  — linear in T, no T×T materialization; the exp/stabilizer runs fp32
  on the VPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def orthogonal_random_features(
    seed: int, num_features: int, head_dim: int
) -> np.ndarray:
    """[num_features, head_dim] with orthogonal rows per head_dim-block,
    each row scaled to the deterministic chi norm sqrt(head_dim)
    (``performer_pytorch.py:103-141``, scaling=1 variant)."""
    rng = np.random.default_rng(seed)
    blocks = []
    remaining = num_features
    while remaining > 0:
        g = rng.standard_normal((head_dim, head_dim))
        q, _ = np.linalg.qr(g)
        blocks.append(q.T[: min(remaining, head_dim)])
        remaining -= head_dim
    w = np.concatenate(blocks, axis=0)
    return (w * np.sqrt(head_dim)).astype(np.float32)


def favor_attention(
    q: jax.Array,  # [B, H, T, d]
    k: jax.Array,
    v: jax.Array,
    w: jax.Array,  # [M, d] random features
    mask: Optional[jax.Array] = None,  # [B, T] bool keep-mask
    eps: float = 1e-6,
) -> jax.Array:
    """Softmax-kernel FAVOR+ estimate of attention(q, k, v).

    phi(u) = m^-1/2 exp(W u - ||u||^2 / 2), with q, k pre-scaled by
    d^-1/4 so phi(q)·phi(k) estimates exp(q·k / sqrt(d)). Per-tensor max
    stabilizers keep the exp in range; the per-query stabilizer cancels
    between numerator and denominator.
    """
    d = q.shape[-1]
    m = w.shape[0]
    qf = q.astype(jnp.float32) * (d**-0.25)
    kf = k.astype(jnp.float32) * (d**-0.25)
    vf = v.astype(jnp.float32)
    wf = w.astype(jnp.float32)

    q_dot = jnp.einsum("bhtd,md->bhtm", qf, wf)
    k_dot = jnp.einsum("bhtd,md->bhtm", kf, wf)
    q_sq = 0.5 * jnp.sum(qf * qf, axis=-1, keepdims=True)
    k_sq = 0.5 * jnp.sum(kf * kf, axis=-1, keepdims=True)

    # stabilizers: per-query max (cancels in the ratio) and a global
    # per-(batch, head) max over keys (scales num and den identically)
    q_stab = jnp.max(q_dot - q_sq, axis=-1, keepdims=True)
    k_stab = jnp.max(k_dot - k_sq, axis=(-2, -1), keepdims=True)
    phi_q = jnp.exp(q_dot - q_sq - q_stab) * (m**-0.5)
    phi_k = jnp.exp(k_dot - k_sq - k_stab) * (m**-0.5)
    if mask is not None:
        phi_k = phi_k * mask[:, None, :, None].astype(phi_k.dtype)

    kv = jnp.einsum("bhtm,bhtd->bhmd", phi_k, vf)
    z = jnp.sum(phi_k, axis=2)  # [B, H, M]
    num = jnp.einsum("bhtm,bhmd->bhtd", phi_q, kv)
    den = jnp.einsum("bhtm,bhm->bht", phi_q, z)
    out = num / (den[..., None] + eps)
    return out.astype(q.dtype)

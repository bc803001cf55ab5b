"""Ring attention: exact sequence-parallel attention over a mesh axis.

The reference has no long-context machinery (max sequence ~1,568 tokens;
SURVEY §2.12/§5.7 — sequence parallelism marked absent). This is the
TPU-native stretch goal SURVEY §5.7 plans: shard the *token* axis of
q/k/v across a ``seq`` mesh axis and compute exact softmax attention by
rotating each device's K/V shard around the ICI ring with
``jax.lax.ppermute`` while accumulating in streaming (online-softmax)
form — attention memory per chip drops from O(T^2) to O(T * T/n), and
activations never materialize off-shard.

Design: pure collective-level JAX (no Pallas needed — each per-step
block matmul is already MXU-shaped; XLA overlaps the ppermute with the
current block's compute since the rotation is data-independent of it).
Numerics match ``ops/flash_attention.flash_attention`` (same streaming
max/sum recurrence) to fp32 tolerance.

Use under ``jax.shard_map`` (or ``shard_map``-style pjit manual axes):

    out = shard_map(
        lambda q, k, v: ring_attention(q, k, v, axis_name="seq"),
        mesh=mesh,
        in_specs=P(None, "seq", None, None),
        out_specs=P(None, "seq", None, None),
    )(q, k, v)
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def ring_attention(
    q: jax.Array,  # [B, Tq_local, H, d]
    k: jax.Array,  # [B, Tk_local, H, d]
    v: jax.Array,  # [B, Tk_local, H, d]
    axis_name: str,
    mask: Optional[jax.Array] = None,  # [B, Tk_local] keep-bool (key side)
    scale: Optional[float] = None,
) -> jax.Array:
    """Exact attention with K/V sharded over ``axis_name``. Call inside
    shard_map; q stays resident, k/v (+key mask) rotate around the ring."""
    d = q.shape[-1]
    if scale is None:
        scale = float(d) ** -0.5
    n = jax.lax.psum(1, axis_name)  # ring size (static under trace)
    perm = [(j, (j + 1) % n) for j in range(n)]

    b, tq, h, _ = q.shape
    qf = q.astype(jnp.float32) * scale
    bias0 = (
        jnp.zeros((b, k.shape[1]), jnp.float32)
        if mask is None
        else jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)
    )

    def step(carry, _):
        acc, m, l, (k_cur, v_cur, bias_cur) = carry
        s = jnp.einsum(
            "bthd,bshd->bths", qf, k_cur.astype(jnp.float32)
        ) + bias_cur[:, None, None, :]  # [B, Tq, H, Tk]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1)
        acc_new = acc * corr[..., None] + jnp.einsum(
            "bths,bshd->bthd", p, v_cur.astype(jnp.float32)
        )
        rotated = jax.lax.ppermute(
            (k_cur, v_cur, bias_cur), axis_name, perm
        )
        return (acc_new, m_new, l_new, rotated), None

    acc0 = jnp.zeros((b, tq, h, d), jnp.float32)
    m0 = jnp.full((b, tq, h), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, tq, h), jnp.float32)
    (acc, _, l, _), _ = jax.lax.scan(
        step, (acc0, m0, l0, (k, v, bias0)), None, length=n
    )
    out = acc / jnp.maximum(l[..., None], 1e-30)
    return out.astype(q.dtype)


def make_seq_sharded_attention(
    mesh: jax.sharding.Mesh,
    axis: str = "seq",
    batch_axis: Optional[str] = None,
):
    """shard_map-wrapped ring attention: global [B, T, H, d] in/out with T
    sharded over ``axis`` (and optionally B over ``batch_axis``)."""
    from jax.sharding import PartitionSpec as P

    qkv_spec = P(batch_axis, axis, None, None)
    mask_spec = P(batch_axis, axis)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, mask_spec),
        out_specs=qkv_spec,
        check_vma=False,
    )
    def _sharded(q, k, v, mask):
        return ring_attention(q, k, v, axis_name=axis, mask=mask)

    def apply(q, k, v, mask=None):
        if mask is None:
            mask = jnp.ones(q.shape[:2], bool)
        return _sharded(q, k, v, mask)

    return apply


def make_seq_parallel_encode(
    mesh: jax.sharding.Mesh,
    cfg,
    axis: str = "seq",
    batch_axis: Optional[str] = None,
    **encode_kwargs,
):
    """Full shared-encoder forward with the token axis sharded over
    ``axis``: every LN/MLP is token-local so it runs shard-resident; the
    attention runs as ring attention (``attn_impl='ring'``). Params are
    replicated. Returns a fn (params, x [B, T, D]) -> [B, T, D] with T
    sharded over ``axis`` (T must be divisible by the axis size)."""
    import dataclasses as _dc

    from jax.sharding import PartitionSpec as P

    from metatransformer_tpu.core import encoder as enc

    rcfg = _dc.replace(cfg, attn_impl="ring", ring_axis=axis)
    x_spec = P(batch_axis, axis, None)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), x_spec),
        out_specs=x_spec,
        check_vma=False,
    )
    def _enc(params, x):
        return enc.encode(params, x, rcfg, **encode_kwargs)

    return _enc

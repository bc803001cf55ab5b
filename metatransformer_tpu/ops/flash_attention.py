"""Fused flash attention (Pallas, TPU) for the shared encoder.

The reference runs timm's materialized O(L^2) attention everywhere
(SURVEY.md §5.7); sequence lengths are 196-1568 tokens across modalities.
This kernel computes softmax(qk^T*scale+bias)v with online softmax so the
logits matrix never hits HBM, with fp32 accumulation over bf16 inputs.

Layout: q,k,v arrive as [B, T, H, d] (encoder layout), are flattened to
[B*H, T, d]; grid = (B*H, T/block_q), each program streams K/V in
block_k chunks from VMEM. Ragged batches use an additive bias row
[B, T] (0 / -inf) built from the keep-mask; padded tail rows produced by
bucketing are masked the same way.

Backward: custom VJP that recomputes attention with plain XLA ops —
O(T^2) memory is fine at these lengths (<=1568); a Pallas backward is a
later optimization.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def supported(seq_len: int, head_dim: int) -> bool:
    """Where flash beats XLA attention (used by attn_impl='auto').

    Measured on v5e: 1.78x faster at T=1568, break-even at T=197 (the
    MLP dominates short sequences and bucket padding eats the gain).
    """
    return head_dim in (32, 64, 128) and seq_len >= 512


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _choose_blocks(t: int) -> tuple:
    """(padded_t, block_q, block_k): always 128-aligned blocks.

    Non-128-aligned block sizes compile (Mosaic pads internally) but take
    ~30x longer to compile and run slower — measured 139s vs 5s for
    T=197 padded to 200 vs 256. Always pad to lane multiples.
    """
    # 256-wide blocks measured ~1.8x faster than 128 at T=1568 (35.9 vs
    # 65.8 ms/batch4) — worth up to 128 tokens of extra padding.
    if t <= 128:
        return 128, 128, 128
    tp = _round_up(t, 256)
    return tp, 256, 256


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float, bk: int):
    q = q_ref[0]  # [bq, d]
    t = k_ref.shape[1]
    num_kb = t // bk
    bq, d = q.shape

    def body(i, carry):
        m, l, acc = carry
        off = i * bk
        kb = k_ref[0, pl.ds(off, bk), :]  # [bk, d]
        vb = v_ref[0, pl.ds(off, bk), :]
        s = (
            jax.lax.dot_general(
                q, kb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )  # [bq, bk]
        s = s + bias_ref[0, 0, pl.ds(off, bk)][None, :]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l, acc

    init = (
        jnp.full((bq, 1), NEG_INF, jnp.float32),
        jnp.zeros((bq, 1), jnp.float32),
        jnp.zeros((bq, d), jnp.float32),
    )
    m, l, acc = jax.lax.fori_loop(0, num_kb, body, init)
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_fwd_raw(q, k, v, bias, scale, bq, bk):
    """q,k,v: [BH, Tp, d] (Tp pre-padded); bias [BH, 1, Tp]."""
    bh, t, d = q.shape
    grid = (bh, t // bq)
    # Pallas compiles only on TPU; the CPU test platform runs interpreted.
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, bk=bk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, t, d), q.dtype),
        interpret=interpret,
    )(q, k, v, bias)


def _reference_attention(q, k, v, bias, scale):
    """XLA twin used for the backward pass (and as the test oracle)."""
    logits = (
        jnp.einsum("bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32)
        * scale
    )
    logits = logits + bias[:, None, None, :]
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhts,bshd->bthd", probs, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash(q, k, v, bias, scale):
    return _flash_call(q, k, v, bias, scale)


def _flash_call(q, k, v, bias, scale):
    b, t, h, d = q.shape
    tp, bq, bk = _choose_blocks(t)
    pad = tp - t

    # [B, T, H, d] -> [BH, Tp, d]
    def to_bh(x):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, t, d)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        return x

    bias_p = jnp.pad(bias, ((0, 0), (0, pad)), constant_values=NEG_INF) if pad else bias
    bias_bh = jnp.repeat(bias_p[:, None, :], h, axis=0)  # [BH, 1, Tp]
    out = _flash_fwd_raw(to_bh(q), to_bh(k), to_bh(v), bias_bh, scale, bq, bk)
    out = out[:, :t].reshape(b, h, t, d).transpose(0, 2, 1, 3)
    return out


def _flash_fwd(q, k, v, bias, scale):
    return _flash_call(q, k, v, bias, scale), (q, k, v, bias)


def _flash_bwd(scale, res, g):
    q, k, v, bias = res
    _, vjp = jax.vjp(lambda q, k, v: _reference_attention(q, k, v, bias, scale),
                     q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """Masked flash attention. q,k,v: [B, T, H, d]; mask: [B, T] keep-bool."""
    b, t, h, d = q.shape
    if scale is None:
        scale = float(d) ** -0.5
    if mask is None:
        bias = jnp.zeros((b, t), jnp.float32)
    else:
        bias = jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)
    return _flash(q, k, v, bias, scale)

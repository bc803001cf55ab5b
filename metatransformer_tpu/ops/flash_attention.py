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

Backward: full Pallas backward (FlashAttention-2 style). The forward
additionally emits per-row logsumexp; the backward recomputes the
probabilities blockwise in two kernels — dq gridded over query blocks,
dk/dv gridded over key blocks — so the [T, T] logits never materialize
in HBM in either direction. This beats the reference, which trains video
at T=1568 through full materialized attention
(/root/reference/Video/engine_for_finetuning.py:35).
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


def _interpret() -> bool:
    # Pallas compiles only on TPU; the CPU test platform runs interpreted.
    return jax.default_backend() != "tpu"


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *, scale: float, bk: int):
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
    l_safe = jnp.maximum(l, 1e-30)
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l_safe)  # [bq, 1]


def _flash_fwd_raw(q, k, v, bias, scale, bq, bk):
    """q,k,v: [BH, Tp, d] (Tp pre-padded); bias [BH, 1, Tp].

    Returns (o [BH, Tp, d], lse [BH, Tp, 1])."""
    bh, t, d = q.shape
    grid = (bh, t // bq)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, bk=bk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, t, d), q.dtype),
            jax.ShapeDtypeStruct((bh, t, 1), jnp.float32),
        ),
        interpret=_interpret(),
    )(q, k, v, bias)


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref, dq_ref,
    *, scale: float, bk: int
):
    q = q_ref[0]  # [bq, d]
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]  # [bq, 1] fp32
    delta = delta_ref[0]  # [bq, 1] fp32
    t = k_ref.shape[1]
    bq, d = q.shape

    def body(i, dq):
        off = i * bk
        kb = k_ref[0, pl.ds(off, bk), :]
        vb = v_ref[0, pl.ds(off, bk), :]
        b = bias_ref[0, 0, pl.ds(off, bk)][None, :]
        s = (
            jax.lax.dot_general(
                q, kb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
            + b
        )  # [bq, bk]
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do.astype(vb.dtype), vb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, bk]
        ds = p * (dp - delta)
        return dq + jax.lax.dot_general(
            ds.astype(kb.dtype), kb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dq = jax.lax.fori_loop(0, t // bk, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    *, scale: float, bq: int
):
    kb = k_ref[0]  # [bk, d]
    vb = v_ref[0]
    b = bias_ref[0]  # [1, bk]
    t = q_ref.shape[1]
    bkk, d = kb.shape

    def body(i, carry):
        dk, dv = carry
        off = i * bq
        qb = q_ref[0, pl.ds(off, bq), :]
        dob = do_ref[0, pl.ds(off, bq), :]
        lse_b = lse_ref[0, pl.ds(off, bq), :]  # [bq, 1]
        delta_b = delta_ref[0, pl.ds(off, bq), :]
        s = (
            jax.lax.dot_general(
                qb, kb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
            + b
        )  # [bq, bk]
        p = jnp.exp(s - lse_b)
        dp = jax.lax.dot_general(
            dob, vb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_b)
        # contract over the query rows: ds^T @ q, p^T @ dO
        dk = dk + jax.lax.dot_general(
            ds.astype(qb.dtype), qb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dv = dv + jax.lax.dot_general(
            p.astype(dob.dtype), dob, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dk, dv

    dk, dv = jax.lax.fori_loop(
        0, t // bq, body,
        (jnp.zeros((bkk, d), jnp.float32), jnp.zeros((bkk, d), jnp.float32)),
    )
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_bwd_raw(q, k, v, bias, o, lse, do, scale, bq, bk):
    """All [BH, Tp, d] (bias [BH, 1, Tp]); returns dq, dk, dv in kind."""
    bh, t, d = q.shape
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), -1, keepdims=True)
    interp = _interpret()
    full = lambda i, j: (i, 0, 0)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, bk=bk),
        grid=(bh, t // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, t, d), q.dtype),
        interpret=interp,
    )(q, k, v, bias, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, bq=bq),
        grid=(bh, t // bk),
        in_specs=[
            pl.BlockSpec((1, t, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, 1), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, 1), full, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bk, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, t, d), k.dtype),
            jax.ShapeDtypeStruct((bh, t, d), v.dtype),
        ),
        interpret=interp,
    )(q, k, v, bias, do, lse, delta)
    return dq, dk, dv


def _reference_attention(q, k, v, bias, scale):
    """XLA twin (test oracle). q,k,v: [B, T, H, d]; bias [B, T]."""
    logits = (
        jnp.einsum("bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32)
        * scale
    )
    logits = logits + bias[:, None, None, :]
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhts,bshd->bthd", probs, v)


def _to_bh(x, pad):
    """[B, T, H, d] -> [BH, Tp, d]"""
    b, t, h, d = x.shape
    x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, t, d)
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    return x


def _from_bh(x, b, h, t):
    """[BH, Tp, d] -> [B, T, H, d]"""
    return x[:, :t].reshape(b, h, t, -1).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash(q, k, v, bias, scale):
    out, _ = _flash_call(q, k, v, bias, scale)
    return out


def _flash_call(q, k, v, bias, scale):
    b, t, h, d = q.shape
    tp, bq, bk = _choose_blocks(t)
    pad = tp - t
    bias_p = jnp.pad(bias, ((0, 0), (0, pad)), constant_values=NEG_INF) if pad else bias
    bias_bh = jnp.repeat(bias_p[:, None, :], h, axis=0)  # [BH, 1, Tp]
    qbh, kbh, vbh = _to_bh(q, pad), _to_bh(k, pad), _to_bh(v, pad)
    obh, lse = _flash_fwd_raw(qbh, kbh, vbh, bias_bh, scale, bq, bk)
    out = _from_bh(obh, b, h, t)
    return out, (qbh, kbh, vbh, bias_bh, obh, lse)


def _flash_fwd(q, k, v, bias, scale):
    out, res = _flash_call(q, k, v, bias, scale)
    return out, res + ((q.shape, bias.shape),)


def _flash_bwd(scale, res, g):
    qbh, kbh, vbh, bias_bh, obh, lse, (qshape, bias_shape) = res
    b, t, h, d = qshape
    tp, bq, bk = _choose_blocks(t)
    dobh = _to_bh(g, tp - t)
    dq, dk, dv = _flash_bwd_raw(
        qbh, kbh, vbh, bias_bh, obh, lse, dobh, scale, bq, bk
    )
    # bias is mask-derived (0/-inf), never a differentiation target
    return (
        _from_bh(dq, b, h, t),
        _from_bh(dk, b, h, t),
        _from_bh(dv, b, h, t),
        jnp.zeros(bias_shape, jnp.float32),
    )


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

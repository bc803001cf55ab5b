"""Fused attention sublayer (Pallas, TPU) for short sequences.

Computes ``x + proj(MHSA(LayerNorm(x)))`` — the first half of a timm
``Block`` — in a single Pallas kernel, one program per batch element.
The reference runs this as ~7 separate torch ops per block
(``/root/reference/README.md:125-135``: LN -> qkv Linear -> reshape ->
softmax(QK^T)V -> proj Linear -> residual); XLA fuses some of it, but at
T=197 the softmax/LayerNorm HBM roundtrips still cost ~30% of step time
(round-1 profile).  This kernel keeps the whole sublayer in VMEM:

* LayerNorm in fp32 on the VPU,
* one [Tp, 3D] fused-QKV matmul on the MXU (fp32 accumulation),
* per-head softmax(QK^T)V with fp32 logits (heads unrolled; Tp <= 512 so
  the [Tp, Tp] logits tile lives entirely in VMEM),
* output projection + residual add.

Sequence lengths are padded to a 128 multiple; padded keys are masked via
an additive fp32 bias row, padded query rows are sliced off afterwards.

Backward: custom VJP whose default path is a second Pallas kernel
(``_bwd_kernel``) that recomputes LN/QKV/softmax in VMEM and produces
dx plus the dqkv/xn/o slabs for the (XLA, MXU-efficient) weight-grad
matmuls — the [T, T] attention tensors never touch HBM in either
direction. Measured on v5e at ViT-B16/T=197/batch 128 (round 5,
scripts/bench_train_variants.py): frozen-encoder train 799 -> 1233
seq/s, full fine-tune 650 -> 944 seq/s vs the XLA recompute twin,
which remains the fallback for unsupported shapes
(``MTT_FUSED_BWD=xla|flash|pallas`` overrides).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
# Above this (padded) length the [Tp, Tp] fp32 logits tile gets too big
# for VMEM and flash attention wins anyway (ops/flash_attention.py).
MAX_SEQ = 512

# Scoped-vmem model, calibrated on v5e: the [n_per, H, T, T] f32 attention
# logits dominate the kernel's stack. Measured: 16.96M scoped at
# n_per=4, T=256, H=12 (overflows the 16M limit); ~13M at T=197 (fits).
# Keep n_per*H*T^2 under ~2.5M elements (~10MB f32) so the qkv/out tiles
# and Mosaic double-buffering have headroom.
_VMEM_LOGIT_ELEMS = 2_500_000


def _pick_n_per(batch: int, seq_len: int, num_heads: int) -> int:
    """Samples per program: fatter row-parallel matmuls win (4 measured
    best at T=197, B=128: 13.9 -> 13.5 ms/12-layer pass), but the tile
    must fit scoped vmem. Returns 0 when even one sample per program
    overflows (caller falls back to flash attention)."""
    for n in (4, 2, 1):
        if batch % n == 0 and n * num_heads * seq_len * seq_len <= _VMEM_LOGIT_ELEMS:
            return n
    return 0


def supported(seq_len: int, dim: int, num_heads: int) -> bool:
    """Shapes where the fused sublayer kernel applies and wins."""
    head_dim = dim // num_heads
    return (
        seq_len <= MAX_SEQ
        and dim % num_heads == 0
        and head_dim in (32, 64, 128)
        and dim % 128 == 0
        and _pick_n_per(1, seq_len, num_heads) > 0
    )


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(
    x_ref,
    lns_ref,
    lnb_ref,
    wqkv_ref,
    bqkv_ref,
    wproj_ref,
    bproj_ref,
    bias_ref,
    o_ref,
    *,
    num_heads: int,
    head_dim: int,
    ln_eps: float,
    scale: float,
):
    # N samples per program: the row-parallel parts (LN, QKV, proj) run
    # on [N*Tp, D] slabs — fewer, fatter MXU calls (measured -2.5% vs
    # one sample per program at T=197); attention stays per-sample.
    n, t, d = x_ref.shape
    x = x_ref[:].reshape(n * t, d)

    # LayerNorm (fp32 accumulation, like core.encoder.layer_norm).
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + ln_eps)
    xn = xn * lns_ref[0].astype(jnp.float32) + lnb_ref[0].astype(jnp.float32)
    xn = xn.astype(x.dtype)

    # Fused QKV projection: [N*Tp, D] @ [D, 3D] on the MXU (bf16 in, f32 acc).
    qkv = jax.lax.dot_general(
        xn, wqkv_ref[:].astype(x.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(x.dtype)  # [N*Tp, 3D]

    souts = []
    for s_i in range(n):  # static unroll; N <= 4
        bias_row = bias_ref[s_i]  # [1, Tp] fp32 additive key mask
        sl = qkv[s_i * t : (s_i + 1) * t]
        outs = []
        for h in range(num_heads):  # static unroll; num_heads is 12/16
            lo = h * head_dim
            # scale folded into q ([Tp, hd]) — cheaper than on [Tp, Tp]
            q = sl[:, lo : lo + head_dim].astype(jnp.float32) * scale
            k = sl[:, d + lo : d + lo + head_dim]
            v = sl[:, 2 * d + lo : 2 * d + lo + head_dim]
            s = (
                jax.lax.dot_general(
                    q.astype(x.dtype), k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + bias_row
            )  # [Tp, Tp] fp32
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)  # [Tp, 1]
            o = jax.lax.dot_general(
                p.astype(x.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # normalize the [Tp, hd] output instead of the [Tp, Tp] probs
            outs.append((o / l).astype(x.dtype))
        souts.append(jnp.concatenate(outs, axis=-1))
    o = jnp.concatenate(souts, axis=0)  # [N*Tp, D]

    delta = jax.lax.dot_general(
        o, wproj_ref[:].astype(x.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bproj_ref[0].astype(jnp.float32)
    o_ref[:] = (x + delta.astype(x.dtype)).reshape(n, t, d)


def _reference_sublayer(x, lns, lnb, wqkv, bqkv, wproj, bproj, bias, ln_eps, num_heads):
    """XLA twin (backward-pass recompute + test oracle)."""
    b, t, d = x.shape
    hd = d // num_heads
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + ln_eps)
    xn = (xn * lns.astype(jnp.float32) + lnb.astype(jnp.float32)).astype(x.dtype)
    qkv = (
        jnp.dot(xn, wqkv.astype(x.dtype), preferred_element_type=jnp.float32)
        + bqkv.astype(jnp.float32)
    ).astype(x.dtype)
    qkv = qkv.reshape(b, t, 3, num_heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, T, H, hd]
    s = (
        jnp.einsum("bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32)
        * (float(hd) ** -0.5)
        + bias[:, None, None, :]
    )
    p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhts,bshd->bthd", p, v).reshape(b, t, d)
    delta = jnp.dot(
        o, wproj.astype(x.dtype), preferred_element_type=jnp.float32
    ) + bproj.astype(jnp.float32)
    return x + delta.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _fused(x, lns, lnb, wqkv, bqkv, wproj, bproj, bias, ln_eps, num_heads):
    return _fused_call(x, lns, lnb, wqkv, bqkv, wproj, bproj, bias, ln_eps, num_heads)


def _fused_call(x, lns, lnb, wqkv, bqkv, wproj, bproj, bias, ln_eps, num_heads):
    b, t, d = x.shape
    hd = d // num_heads
    # No padding: block dims equal to the array dims are legal, and running
    # at the native T beats lane-aligned padding — measured 13.9 vs 17.2
    # ms/12-layer pass at T=197 (padding to 256 wastes +30% matmul rows and
    # +70% softmax area; Mosaic's internal sublane/lane padding is cheaper).
    tp = t
    n_per = _pick_n_per(b, t, num_heads)
    assert n_per > 0, (b, t, num_heads)  # encoder gates via supported()

    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(
            _kernel,
            num_heads=num_heads,
            head_dim=hd,
            ln_eps=float(ln_eps),
            scale=float(hd) ** -0.5,
        ),
        grid=(b // n_per,),
        in_specs=[
            pl.BlockSpec((n_per, tp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_per, 1, tp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (n_per, tp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, tp, d), x.dtype),
        interpret=interpret,
    )(
        x,
        lns.reshape(1, d),
        lnb.reshape(1, d),
        wqkv,
        bqkv.reshape(1, 3 * d),
        wproj,
        bproj.reshape(1, d),
        bias[:, None, :],
    )
    return out


def _flash_recompute_sublayer(x, lns, lnb, wqkv, bqkv, wproj, bproj, bias, ln_eps, num_heads):
    """Backward-recompute twin with a Pallas flash attention core.

    Same math as :func:`_reference_sublayer` (LN / fused QKV / proj in
    plain XLA), but softmax(QK^T)V goes through
    ``ops.flash_attention._flash`` whose VJP is the Pallas
    FlashAttention-2 backward — so differentiating THIS function never
    materializes the [B, H, T, T] logits in HBM in either direction.
    """
    from metatransformer_tpu.ops import flash_attention as _fa

    b, t, d = x.shape
    hd = d // num_heads
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + ln_eps)
    xn = (xn * lns.astype(jnp.float32) + lnb.astype(jnp.float32)).astype(x.dtype)
    qkv = (
        jnp.dot(xn, wqkv.astype(x.dtype), preferred_element_type=jnp.float32)
        + bqkv.astype(jnp.float32)
    ).astype(x.dtype)
    qkv = qkv.reshape(b, t, 3, num_heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, T, H, hd]
    o = _fa._flash(q, k, v, bias, float(hd) ** -0.5).reshape(b, t, d)
    delta = jnp.dot(
        o, wproj.astype(x.dtype), preferred_element_type=jnp.float32
    ) + bproj.astype(jnp.float32)
    return x + delta.astype(x.dtype)


def _pick_bwd_recompute(t: int, hd: int):
    """Choose the backward-recompute twin for this shape.

    ``MTT_FUSED_BWD=xla|flash|pallas`` forces a path (bench override);
    the measured default is the Pallas backward kernel (see
    ``_bwd_kernel`` — round-5 sweep: full-FT 650 -> see BENCH_TRAIN.md)
    with the XLA twin as the fallback for unsupported shapes.
    """
    mode = os.environ.get("MTT_FUSED_BWD", "auto")
    flash_ok = hd in (32, 64, 128)
    if mode == "flash" and flash_ok:
        return _flash_recompute_sublayer
    return _reference_sublayer


# --------------------------------------------------------------------------
# Pallas backward kernel: the whole sublayer backward in VMEM.
#
# The recompute twins pay an XLA forward (materializing fp32 [T, T]
# logits/probs in HBM) plus an XLA backward that round-trips those same
# tensors again — measured ~40% of full-FT step time at T=197, B=128
# (scripts: /tmp decomposition, round 5). This kernel recomputes
# LN/QKV/softmax in VMEM (like the forward kernel) and emits, per
# program: dx (residual + LN backward), dqkv / xn / o slabs for the
# weight-gradient matmuls (done outside by XLA — big, MXU-efficient),
# and accumulated dgamma/dbeta. The [T, T] attention tensors never
# touch HBM in either direction.
# --------------------------------------------------------------------------

# p, dp, ds fp32 tiles per head live simultaneously; keep n*H*T^2 under
# half the forward budget for headroom (dqkv f32 slab + weight tiles).
_BWD_VMEM_LOGIT_ELEMS = 1_250_000


def _pick_bwd_n_per(batch: int, seq_len: int, num_heads: int) -> int:
    for n in (2, 1):
        if batch % n == 0 and n * num_heads * seq_len * seq_len <= _BWD_VMEM_LOGIT_ELEMS:
            return n
    return 0


def _bwd_kernel(
    x_ref,
    g_ref,
    lns_ref,
    lnb_ref,
    wqkv_ref,
    bqkv_ref,
    wproj_ref,
    bias_ref,
    dx_ref,
    dqkv_ref,
    xn_ref,
    o_ref,
    dlns_ref,
    dlnb_ref,
    *,
    num_heads: int,
    head_dim: int,
    ln_eps: float,
    scale: float,
):
    n, t, d = x_ref.shape
    x = x_ref[:].reshape(n * t, d)
    g = g_ref[:].reshape(n * t, d)

    # --- recompute LN (fp32) + QKV, exactly like the forward kernel
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + ln_eps)
    xhat = (xf - mean) * rstd
    gamma = lns_ref[0].astype(jnp.float32)
    xn_f = xhat * gamma + lnb_ref[0].astype(jnp.float32)
    xn = xn_f.astype(x.dtype)
    qkv = jax.lax.dot_general(
        xn, wqkv_ref[:].astype(x.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(x.dtype)  # [N*T, 3D]

    # --- do = g @ Wproj^T (dproj_w/dproj_b happen outside)
    do = jax.lax.dot_general(
        g, wproj_ref[:].astype(x.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)  # [N*T, D]

    # --- attention backward per sample/head; all [T, T] tiles in VMEM
    s_dq, s_dk, s_dv, s_o = [], [], [], []
    for s_i in range(n):  # static unroll; N <= 2
        bias_row = bias_ref[s_i]  # [1, T] fp32 additive key mask
        sl = qkv[s_i * t : (s_i + 1) * t]
        do_s = do[s_i * t : (s_i + 1) * t]
        dqs, dks, dvs, os_ = [], [], [], []
        for h in range(num_heads):  # static unroll
            lo = h * head_dim
            q = sl[:, lo : lo + head_dim]
            k = sl[:, d + lo : d + lo + head_dim]
            v = sl[:, 2 * d + lo : 2 * d + lo + head_dim]
            do_h = do_s[:, lo : lo + head_dim]
            s = (
                jax.lax.dot_general(
                    (q.astype(jnp.float32) * scale).astype(x.dtype), k,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + bias_row
            )  # [T, T] fp32
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)  # fp32 [T, T]
            pb = p.astype(x.dtype)
            os_.append(
                jax.lax.dot_general(
                    pb, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(x.dtype)
            )
            dv = jax.lax.dot_general(
                pb, do_h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [T, hd] = p^T do
            dp = jax.lax.dot_general(
                do_h, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [T, T]
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            ds = ds.astype(x.dtype)
            dq = jax.lax.dot_general(
                ds, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            dk = jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            dqs.append(dq.astype(x.dtype))
            dks.append(dk.astype(x.dtype))
            dvs.append(dv.astype(x.dtype))
        s_dq.append(jnp.concatenate(dqs, axis=-1))
        s_dk.append(jnp.concatenate(dks, axis=-1))
        s_dv.append(jnp.concatenate(dvs, axis=-1))
        s_o.append(jnp.concatenate(os_, axis=-1))
    dqkv = jnp.concatenate(
        [
            jnp.concatenate(s_dq, axis=0),
            jnp.concatenate(s_dk, axis=0),
            jnp.concatenate(s_dv, axis=0),
        ],
        axis=-1,
    )  # [N*T, 3D], (q|k|v) x heads column layout of param_shapes
    o = jnp.concatenate(s_o, axis=0)  # [N*T, D]

    # --- dxn = dqkv @ Wqkv^T, then LayerNorm backward (fp32)
    dxn = jax.lax.dot_general(
        dqkv, wqkv_ref[:].astype(x.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dxhat = dxn * gamma
    mr1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    mr2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ln = rstd * (dxhat - mr1 - xhat * mr2)

    dx_ref[:] = (g.astype(jnp.float32) + dx_ln).astype(x.dtype).reshape(n, t, d)
    dqkv_ref[:] = dqkv.reshape(n, t, 3 * d)
    xn_ref[:] = xn.reshape(n, t, d)
    o_ref[:] = o.reshape(n, t, d)

    # --- dgamma / dbeta accumulated across the sequential grid
    part_g = jnp.sum(dxn * xhat, axis=0, keepdims=True)  # [1, D] fp32
    part_b = jnp.sum(dxn, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dlns_ref[:] = jnp.zeros_like(dlns_ref)
        dlnb_ref[:] = jnp.zeros_like(dlnb_ref)

    dlns_ref[:] += part_g
    dlnb_ref[:] += part_b


def _bwd_via_kernel(x, lns, lnb, wqkv, bqkv, wproj, bproj, bias, g,
                    ln_eps, num_heads):
    """Full sublayer VJP: Pallas kernel for dx/dqkv/LN grads + XLA
    weight-gradient matmuls. Returns cotangents for the 7 diff args."""
    b, t, d = x.shape
    hd = d // num_heads
    n_per = _pick_bwd_n_per(b, t, num_heads)
    assert n_per > 0, (b, t, num_heads)
    interpret = jax.default_backend() != "tpu"
    full = lambda i: (0, 0)
    dx, dqkv, xn, o, dlns, dlnb = pl.pallas_call(
        functools.partial(
            _bwd_kernel,
            num_heads=num_heads,
            head_dim=hd,
            ln_eps=float(ln_eps),
            scale=float(hd) ** -0.5,
        ),
        grid=(b // n_per,),
        in_specs=[
            pl.BlockSpec((n_per, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_per, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_per, 1, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((n_per, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_per, t, 3 * d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_per, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_per, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t, d), x.dtype),
            jax.ShapeDtypeStruct((b, t, 3 * d), x.dtype),
            jax.ShapeDtypeStruct((b, t, d), x.dtype),
            jax.ShapeDtypeStruct((b, t, d), x.dtype),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ),
        # The slab matmuls + per-head fp32 tiles + double-buffered weight
        # blocks exceed Mosaic's default 16M scoped-vmem budget at
        # (T=197, D=768, H=12): measured 24.0M at n_per=1. v5e has 128M
        # VMEM; give the kernel half.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(
        x,
        g,
        lns.reshape(1, d),
        lnb.reshape(1, d),
        wqkv,
        bqkv.reshape(1, 3 * d),
        wproj,
        bias[:, None, :],
    )
    # Weight gradients: big row-contracted matmuls — MXU-efficient in
    # XLA, and DCE'd entirely in frozen-encoder recipes.
    g2 = g.reshape(b * t, d)
    dwproj = jax.lax.dot_general(
        o.reshape(b * t, d), g2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(wproj.dtype)
    dbproj = jnp.sum(g2.astype(jnp.float32), axis=0).astype(bproj.dtype)
    dqkv2 = dqkv.reshape(b * t, 3 * d)
    dwqkv = jax.lax.dot_general(
        xn.reshape(b * t, d), dqkv2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(wqkv.dtype)
    dbqkv = jnp.sum(dqkv2.astype(jnp.float32), axis=0).astype(bqkv.dtype)
    return (
        dx,
        dlns.reshape(d).astype(lns.dtype),
        dlnb.reshape(d).astype(lnb.dtype),
        dwqkv,
        dbqkv,
        dwproj,
        dbproj,
    )


def _fused_fwd(x, lns, lnb, wqkv, bqkv, wproj, bproj, bias, ln_eps, num_heads):
    out = _fused_call(x, lns, lnb, wqkv, bqkv, wproj, bproj, bias, ln_eps, num_heads)
    return out, (x, lns, lnb, wqkv, bqkv, wproj, bproj, bias)


def _fused_bwd(ln_eps, num_heads, res, g):
    x, lns, lnb, wqkv, bqkv, wproj, bproj, bias = res
    mode = os.environ.get("MTT_FUSED_BWD", "auto")
    if (
        mode in ("auto", "pallas")
        and _pick_bwd_n_per(x.shape[0], x.shape[1], num_heads) > 0
    ):
        return _bwd_via_kernel(
            x, lns, lnb, wqkv, bqkv, wproj, bproj, bias, g, ln_eps, num_heads
        ) + (None,)
    recompute = _pick_bwd_recompute(x.shape[1], x.shape[2] // num_heads)
    _, vjp = jax.vjp(
        lambda *a: recompute(*a, bias, ln_eps, num_heads),
        x, lns, lnb, wqkv, bqkv, wproj, bproj,
    )
    return vjp(g) + (None,)


_fused.defvjp(_fused_fwd, _fused_bwd)


def _mlp_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, ln_eps: float):
    x = x_ref[:]  # [BN, D]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + ln_eps)
    xn = xn * lns_ref[0].astype(jnp.float32) + lnb_ref[0].astype(jnp.float32)
    xn = xn.astype(x.dtype)
    h = jax.lax.dot_general(
        xn, w1_ref[:].astype(x.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0].astype(jnp.float32)
    # tanh-approx GELU: erf/erfc have no Pallas TPU lowering. Max deviation
    # from timm's exact erf GELU is ~3e-4 — an order of magnitude below the
    # bf16 resolution this serving-policy kernel runs at.
    g = jax.nn.gelu(h, approximate=True).astype(x.dtype)
    out = jax.lax.dot_general(
        g, w2_ref[:].astype(x.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0].astype(jnp.float32)
    o_ref[:] = x + out.astype(x.dtype)


def _reference_mlp(x2d, lns, lnb, w1, b1, w2, b2, ln_eps):
    xf = x2d.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + ln_eps)
    xn = (xn * lns.astype(jnp.float32) + lnb.astype(jnp.float32)).astype(x2d.dtype)
    h = jnp.dot(xn, w1.astype(x2d.dtype), preferred_element_type=jnp.float32) + b1.astype(jnp.float32)
    # tanh-approx GELU to match the kernel exactly (see _mlp_kernel).
    g = jax.nn.gelu(h, approximate=True).astype(x2d.dtype)
    out = jnp.dot(g, w2.astype(x2d.dtype), preferred_element_type=jnp.float32) + b2.astype(jnp.float32)
    return x2d + out.astype(x2d.dtype)


_MLP_ROW_BLOCK = 256


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _fused_mlp(x2d, lns, lnb, w1, b1, w2, b2, ln_eps):
    return _fused_mlp_call(x2d, lns, lnb, w1, b1, w2, b2, ln_eps)


def _fused_mlp_call(x2d, lns, lnb, w1, b1, w2, b2, ln_eps):
    n, d = x2d.shape
    m = w1.shape[1]
    bn = min(_MLP_ROW_BLOCK, _round_up(n, 8))
    np_ = _round_up(n, bn)
    if np_ != n:
        x2d = jnp.pad(x2d, ((0, np_ - n), (0, 0)))
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_mlp_kernel, ln_eps=float(ln_eps)),
        grid=(np_ // bn,),
        in_specs=[
            pl.BlockSpec((bn, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, d), x2d.dtype),
        interpret=interpret,
    )(
        x2d,
        lns.reshape(1, d),
        lnb.reshape(1, d),
        w1,
        b1.reshape(1, m),
        w2,
        b2.reshape(1, d),
    )
    return out[:n] if np_ != n else out


def _fused_mlp_fwd(x2d, lns, lnb, w1, b1, w2, b2, ln_eps):
    out = _fused_mlp_call(x2d, lns, lnb, w1, b1, w2, b2, ln_eps)
    return out, (x2d, lns, lnb, w1, b1, w2, b2)


def _fused_mlp_bwd(ln_eps, res, g):
    x2d, lns, lnb, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: _reference_mlp(*a, ln_eps), x2d, lns, lnb, w1, b1, w2, b2
    )
    return vjp(g)


_fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)


def mlp_sublayer(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    fc1_w: jax.Array,
    fc1_b: jax.Array,
    fc2_w: jax.Array,
    fc2_b: jax.Array,
    *,
    ln_eps: float = 1e-5,
) -> jax.Array:
    """Fused ``x + fc2(GELU(fc1(LN(x))))`` — the second half of a timm Block.

    Row-independent, so [B, T, D] is flattened to [B*T, D] and tiled over
    row blocks: full MXU shapes regardless of T, and LN/GELU/residual never
    round-trip HBM (round-1 profile: these passes cost ~45% of MLP time).
    """
    b, t, d = x.shape
    out = _fused_mlp(
        x.reshape(b * t, d), ln_scale, ln_bias, fc1_w, fc1_b, fc2_w, fc2_b,
        float(ln_eps),
    )
    return out.reshape(b, t, d)


def attn_sublayer(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    qkv_w: jax.Array,
    qkv_b: jax.Array,
    proj_w: jax.Array,
    proj_b: jax.Array,
    mask: Optional[jax.Array] = None,
    *,
    num_heads: int,
    ln_eps: float = 1e-5,
) -> jax.Array:
    """Fused ``x + proj(MHSA(LN(x)))``.

    Args:
      x: [B, T, D] residual stream (bf16 for the serving policy).
      qkv_w: [D, 3D] fused projection, columns ordered (q|k|v) x heads —
        the layout of :func:`core.encoder.param_shapes`.
      mask: optional [B, T] bool keep-mask for padded/ragged batches.
    """
    b, t, d = x.shape
    if mask is None:
        bias = jnp.zeros((b, t), jnp.float32)
    else:
        bias = jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)
    return _fused(
        x, ln_scale, ln_bias, qkv_w, qkv_b, proj_w, proj_b, bias,
        float(ln_eps), num_heads,
    )

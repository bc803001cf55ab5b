"""Attention sublayer kernel v2: head-batched 3D dots inside Pallas.

The shipped kernel (ops/fused_block._kernel) unrolls the 12 heads into 12
small [T, hd] matmuls and 12 SEQUENTIAL [T, T] softmaxes — the softmax VPU
serialization is the measured ~65%-of-peak ceiling (round-2 notes #2).

v2 batches the heads into single dot_generals with a batch dimension and
runs ONE softmax over the whole [H, T, T] (or [N, H, T, T]) slab:
  s = dot(q [T,H,hd], k [T,H,hd]; batch H, contract hd)   -> [H, T, T]
  p = softmax(s + bias)                                    (one VPU pass)
  o = dot(p [H,T,T], v [T,H,hd]; batch H, contract T)     -> [H, T, hd]
  delta = dot(o [H,T,hd], Wp [H,hd,D]; contract {H,hd})   -> [T, D]
The final contraction also eliminates the per-head concat AND folds the
output projection's head reduction into one MXU call.

Variants:
  hbatch1/2/4 — heads batched, N samples per program (logits VMEM:
  N * 12 * 197^2 * 4B = 1.9/3.7/7.4 MB).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from metatransformer_tpu.core import encoder as enc
from metatransformer_tpu.ops import fused_block as fb

B, T, D, H = 128, 197, 768, 12
ITERS = 20


def _kernel_hbatch(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref,
                   bproj_ref, bias_ref, o_ref, *, num_heads, head_dim,
                   ln_eps, scale, layout="stack"):
    n, t, d = x_ref.shape
    x = x_ref[:].reshape(n * t, d)

    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + ln_eps)
    xn = xn * lns_ref[0].astype(jnp.float32) + lnb_ref[0].astype(jnp.float32)
    xn = xn.astype(x.dtype)

    qkv = jax.lax.dot_general(
        xn, wqkv_ref[:].astype(x.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(x.dtype)  # [n*t, 3D]

    wp3 = wproj_ref[:].astype(x.dtype).reshape(num_heads, head_dim, d)
    souts = []
    for s_i in range(n):
        sl = qkv[s_i * t : (s_i + 1) * t]
        if layout == "stack":
            # batch dim LEADING via stacked strided slices (VMEM copies)
            q = jnp.stack(
                [
                    (sl[:, h * head_dim : (h + 1) * head_dim]
                     .astype(jnp.float32) * scale).astype(x.dtype)
                    for h in range(num_heads)
                ]
            )
            k = jnp.stack(
                [
                    sl[:, d + h * head_dim : d + (h + 1) * head_dim]
                    for h in range(num_heads)
                ]
            )
            v = jnp.stack(
                [
                    sl[:, 2 * d + h * head_dim : 2 * d + (h + 1) * head_dim]
                    for h in range(num_heads)
                ]
            )
            bdim = 0
        elif layout == "transpose":
            # reshape [T, D] -> [T, H, hd], then relayout to [H, T, hd]
            q = jnp.transpose(
                ((sl[:, :d].astype(jnp.float32) * scale).astype(x.dtype)
                 ).reshape(t, num_heads, head_dim), (1, 0, 2))
            k = jnp.transpose(
                sl[:, d : 2 * d].reshape(t, num_heads, head_dim), (1, 0, 2))
            v = jnp.transpose(
                sl[:, 2 * d :].reshape(t, num_heads, head_dim), (1, 0, 2))
            bdim = 0
        else:  # "reshape": batch dim in the MIDDLE, no data movement
            q = ((sl[:, :d].astype(jnp.float32) * scale).astype(x.dtype)
                 ).reshape(t, num_heads, head_dim)
            k = sl[:, d : 2 * d].reshape(t, num_heads, head_dim)
            v = sl[:, 2 * d :].reshape(t, num_heads, head_dim)
            bdim = 1
        if bdim == 0:
            # [H, T, T] in ONE batched MXU call
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        else:
            # [H, T, T] with middle batch dims
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((1,), (1,))),
                preferred_element_type=jnp.float32,
            )
        s = s + bias_ref[s_i][None]  # [H, T, T] + [1, 1, T]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        if bdim == 0:
            o = jax.lax.dot_general(
                p.astype(x.dtype), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [H, T, hd]
        else:
            o = jax.lax.dot_general(
                p.astype(x.dtype), v, (((2,), (0,)), ((0,), (1,))),
                preferred_element_type=jnp.float32,
            )  # [H, T, hd]
        o = (o / l).astype(x.dtype)
        # head-batched projection + head-sum reduction: Mosaic's tpu.matmul
        # takes ONE contracting dim, so contract hd with H as batch and
        # reduce the [H, T, D] partials on the VPU (no concat/transpose)
        d_h = jax.lax.dot_general(
            o, wp3, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [H, T, D]
        souts.append(jnp.sum(d_h, axis=0))
    delta = jnp.concatenate(souts, axis=0) + bproj_ref[0].astype(jnp.float32)
    o_ref[:] = (x + delta.astype(x.dtype)).reshape(n, t, d)


def _kernel_pipe(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref,
                 bproj_ref, bias_ref, o_ref, *, num_heads, head_dim,
                 ln_eps, scale, use_exp2=True, skip_bias=False):
    """Software-pipelined head loop: issue head h+1's QK matmul (MXU)
    BEFORE head h's softmax (VPU) so the hardware can overlap them —
    the shipped kernel's strict QK->softmax->PV order leaves the MXU
    idle through every softmax (measured ~0 overlap; sublayer time ==
    MXU time + VPU time)."""
    n, t, d = x_ref.shape
    x = x_ref[:].reshape(n * t, d)

    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + ln_eps)
    xn = xn * lns_ref[0].astype(jnp.float32) + lnb_ref[0].astype(jnp.float32)
    xn = xn.astype(x.dtype)

    qkv = jax.lax.dot_general(
        xn, wqkv_ref[:].astype(x.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(x.dtype)

    # exp2 path: fold log2(e) into the q scale so softmax needs no
    # per-element multiply inside the exp
    qscale = scale * 1.4426950408889634 if use_exp2 else scale
    ex = jax.lax.exp2 if use_exp2 else jnp.exp

    def qk(sl, bias_row, h):
        lo = h * head_dim
        q = sl[:, lo : lo + head_dim].astype(jnp.float32) * qscale
        k = sl[:, d + lo : d + lo + head_dim]
        s = jax.lax.dot_general(
            q.astype(x.dtype), k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if not skip_bias:
            s = s + bias_row
        return s

    souts = []
    for s_i in range(n):
        bias_row = bias_ref[s_i]
        if use_exp2 and not skip_bias:
            bias_row = bias_row * 1.4426950408889634
        sl = qkv[s_i * t : (s_i + 1) * t]
        outs = []
        s_next = qk(sl, bias_row, 0)
        for h in range(num_heads):
            s = s_next
            if h + 1 < num_heads:
                s_next = qk(sl, bias_row, h + 1)  # MXU ahead of VPU
            m = jnp.max(s, axis=-1, keepdims=True)
            p = ex(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            lo = h * head_dim
            v = sl[:, 2 * d + lo : 2 * d + lo + head_dim]
            o = jax.lax.dot_general(
                p.astype(x.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outs.append((o / l).astype(x.dtype))
        souts.append(jnp.concatenate(outs, axis=-1))
    o = jnp.concatenate(souts, axis=0)

    delta = jax.lax.dot_general(
        o, wproj_ref[:].astype(x.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bproj_ref[0].astype(jnp.float32)
    o_ref[:] = (x + delta.astype(x.dtype)).reshape(n, t, d)


def make_pipe_call(n_per, use_exp2=True, skip_bias=False):
    def call(x, lns, lnb, wqkv, bqkv, wproj, bproj, bias, ln_eps, num_heads):
        b, t, d = x.shape
        hd = d // num_heads
        out = pl.pallas_call(
            functools.partial(
                _kernel_pipe, num_heads=num_heads, head_dim=hd,
                ln_eps=float(ln_eps), scale=float(hd) ** -0.5,
                use_exp2=use_exp2, skip_bias=skip_bias,
            ),
            grid=(b // n_per,),
            in_specs=[
                pl.BlockSpec((n_per, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_per, 1, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n_per, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
            interpret=jax.default_backend() != "tpu",
        )(x, lns.reshape(1, d), lnb.reshape(1, d), wqkv,
          bqkv.reshape(1, 3 * d), wproj, bproj.reshape(1, d), bias[:, None, :])
        return out
    return call


def make_call(n_per, layout="stack"):
    def call(x, lns, lnb, wqkv, bqkv, wproj, bproj, bias, ln_eps, num_heads):
        b, t, d = x.shape
        hd = d // num_heads
        out = pl.pallas_call(
            functools.partial(
                _kernel_hbatch, num_heads=num_heads, head_dim=hd,
                ln_eps=float(ln_eps), scale=float(hd) ** -0.5, layout=layout,
            ),
            grid=(b // n_per,),
            in_specs=[
                pl.BlockSpec((n_per, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_per, 1, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n_per, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
            interpret=jax.default_backend() != "tpu",
        )(x, lns.reshape(1, d), lnb.reshape(1, d), wqkv,
          bqkv.reshape(1, 3 * d), wproj, bproj.reshape(1, d), bias[:, None, :])
        return out
    return call


def main():
    import sys

    sel = sys.argv[1:] or ["shipped", "stack1", "stack2"]
    cfg = enc.EncoderConfig()
    params = enc.init(cfg, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, D)).astype(jnp.bfloat16)
    p = {k: v[0].astype(jnp.bfloat16) for k, v in params.items()}
    bias = jnp.zeros((B, T), jnp.float32)

    def parse(name):
        if name == "shipped":
            return fb._fused_call
        layout = name.rstrip("0123456789")
        n_per = int(name[len(layout):] or 1)
        if layout == "pipe":
            return make_pipe_call(n_per)
        if layout == "pipenobias":
            return make_pipe_call(n_per, skip_bias=True)
        if layout == "pipeexp":
            return make_pipe_call(n_per, use_exp2=False)
        return make_call(n_per, layout)

    # correctness first: each selected variant vs shipped
    args = (x[:8], p["norm1_scale"], p["norm1_bias"], p["qkv_w"], p["qkv_b"],
            p["proj_w"], p["proj_b"], bias[:8], 1e-5, 12)
    want = np.asarray(fb._fused_call(*args), np.float32)
    for name in sel:
        if name == "shipped":
            continue
        got = np.asarray(parse(name)(*args), np.float32)
        err = np.abs(got - want).max()
        print(f"{name} vs shipped max abs err:", err)
        assert err < 0.05, err  # bf16 stream; different reduction order

    _jitted = {}

    def run_variant(name, call):
        if name not in _jitted:
            def step(x):
                def body(_, c):
                    return call(
                        c, p["norm1_scale"], p["norm1_bias"], p["qkv_w"],
                        p["qkv_b"], p["proj_w"], p["proj_b"], bias, 1e-5, 12,
                    )
                return jax.lax.fori_loop(0, 12, body, x)

            _jitted[name] = jax.jit(lambda x: jnp.mean(
                jax.lax.fori_loop(0, ITERS, lambda _, c: step(c * (1 + 1e-9)), x)
            ).astype(jnp.float32))
        run = _jitted[name]
        t0 = time.perf_counter()
        float(run(x))
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run(x))
        dt = (time.perf_counter() - t0) / ITERS
        return tc, dt

    variants = [(name, parse(name)) for name in sel]
    times = {n: [] for n, _ in variants}
    for r in range(3):
        for name, call in variants:
            try:
                tc, dt = run_variant(name, call)
            except Exception as e:
                print(f"r{r} {name}: FAILED {type(e).__name__}: {e}")
                times[name].append(float("inf"))
                continue
            times[name].append(dt * 1e3)
            print(f"r{r} {name}: {dt*1e3:6.2f} ms/12-layer-pass (compile {tc:.1f}s)")
    for name, ts in times.items():
        fin = [t for t in ts if np.isfinite(t)]
        if fin:
            print(f"{name}: min {min(fin):6.2f}  med {sorted(fin)[len(fin)//2]:6.2f}")


if __name__ == "__main__":
    main()

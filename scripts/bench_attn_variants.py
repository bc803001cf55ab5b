"""Experiment: attention-sublayer kernel variants at T=197.

Variants vs the shipped kernel (ops/fused_block._kernel):
  a) rows2  — 2 samples per program: [2T, D] rows through LN/QKV/proj,
     attention still per-sample (block-diagonal), halves grid size.
  b) nomax  — skip the softmax max-subtraction (safe only for bounded
     logits; measures the VPU cost of the extra max pass).
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


def _kernel_rows2(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref,
                  bproj_ref, bias_ref, o_ref, *, num_heads, head_dim,
                  ln_eps, scale, nomax=False):
    n = x_ref.shape[0]  # samples per program
    t = x_ref.shape[1]
    d = x_ref.shape[2]
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

    outs = []
    for s_i in range(n):
        bias_row = bias_ref[s_i]  # [1, T]
        sl = qkv[s_i * t:(s_i + 1) * t]
        souts = []
        for h in range(num_heads):
            lo = h * head_dim
            q = sl[:, lo:lo + head_dim].astype(jnp.float32) * scale
            k = sl[:, d + lo:d + lo + head_dim]
            v = sl[:, 2 * d + lo:2 * d + lo + head_dim]
            s = jax.lax.dot_general(
                q.astype(x.dtype), k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bias_row
            if nomax:
                p = jnp.exp(s)
            else:
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(x.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            souts.append((o / l).astype(x.dtype))
        outs.append(jnp.concatenate(souts, axis=-1))
    o = jnp.concatenate(outs, axis=0)  # [n*T, D]

    delta = jax.lax.dot_general(
        o, wproj_ref[:].astype(x.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bproj_ref[0].astype(jnp.float32)
    o_ref[:] = (x + delta.astype(x.dtype)).reshape(n, t, d)


def make_call(n_per, nomax):
    def call(x, lns, lnb, wqkv, bqkv, wproj, bproj, bias, ln_eps, num_heads):
        b, t, d = x.shape
        hd = d // num_heads
        out = pl.pallas_call(
            functools.partial(
                _kernel_rows2, num_heads=num_heads, head_dim=hd,
                ln_eps=float(ln_eps), scale=float(hd) ** -0.5, nomax=nomax,
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
    cfg = enc.EncoderConfig()
    params = enc.init(cfg, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, D)).astype(jnp.bfloat16)
    p = {k: (v[0].astype(jnp.bfloat16) if v.dtype != jnp.float32 or True else v[0])
         for k, v in params.items()}
    p = {k: v[0].astype(jnp.bfloat16) for k, v in params.items()}
    bias = jnp.zeros((B, T), jnp.float32)

    def run_variant(call):
        def step(x):
            def body(_, c):
                return call(
                    c, p["norm1_scale"], p["norm1_bias"], p["qkv_w"],
                    p["qkv_b"], p["proj_w"], p["proj_b"], bias, 1e-5, 12,
                )
            return jax.lax.fori_loop(0, 12, body, x)

        run = jax.jit(lambda x: jnp.mean(
            jax.lax.fori_loop(0, ITERS, lambda _, c: step(c * (1 + 1e-9)), x)
        ).astype(jnp.float32))
        t0 = time.perf_counter()
        float(run(x))
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run(x))
        dt = (time.perf_counter() - t0) / ITERS
        return tc, dt

    variants = [
        ("shipped", fb._fused_call),
        ("rows2  ", make_call(2, False)),
        ("rows4  ", make_call(4, False)),
    ]
    # interleaved rounds to decorrelate clock/thermal drift
    times = {n: [] for n, _ in variants}
    for r in range(3):
        for name, call in variants:
            tc, dt = run_variant(call)
            times[name].append(dt * 1e3)
            print(f"r{r} {name}: {dt*1e3:6.2f} ms/12-layer-pass")
    for name, ts in times.items():
        print(f"{name}: min {min(ts):6.2f}  med {sorted(ts)[1]:6.2f}")


if __name__ == "__main__":
    main()

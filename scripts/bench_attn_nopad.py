"""Experiment: fused attention sublayer without padding to 256.

Mosaic allows block dims equal to the array dims, so T=197 can run
directly (internally padded to sublane/lane granularity). Measures
whether skipping the 197->256 pad (+30% matmul rows, +70% softmax area)
beats the aligned-256 version despite unaligned lanes in the scores.
"""

import functools
import sys
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


def nopad_call(x, lns, lnb, wqkv, bqkv, wproj, bproj, bias, ln_eps, num_heads):
    b, t, d = x.shape
    hd = d // num_heads
    out = pl.pallas_call(
        functools.partial(
            fb._kernel, num_heads=num_heads, head_dim=hd,
            ln_eps=float(ln_eps), scale=float(hd) ** -0.5,
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(x, lns.reshape(1, d), lnb.reshape(1, d), wqkv, bqkv.reshape(1, 3 * d),
      wproj, bproj.reshape(1, d), bias[:, None, :])
    return out


def main():
    cfg = enc.EncoderConfig()
    params = enc.init(cfg, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, D)).astype(jnp.bfloat16)
    p = {k: (v[0].astype(jnp.bfloat16) if k.endswith(("_w", "_b")) else v[0])
         for k, v in params.items()}
    bias = jnp.zeros((B, T), jnp.float32)

    def run_variant(call):
        def step(x):
            def body(_, c):
                return call(
                    c, p["norm1_scale"], p["norm1_bias"], p["qkv_w"],
                    p["qkv_b"], p["proj_w"], p["proj_b"], bias, 1e-5, 12,
                )
            return jax.lax.fori_loop(0, 12 * 1, body, x)  # 12 "layers"

        run = jax.jit(lambda x: jnp.mean(
            jax.lax.fori_loop(0, ITERS, lambda _, c: step(c * (1 + 1e-9)), x)
        ).astype(jnp.float32))
        t0 = time.perf_counter()
        float(run(x))
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run(x))
        dt = (time.perf_counter() - t0) / ITERS
        return t_compile, dt

    tc, dt = run_variant(fb._fused_call)
    print(f"padded-256 : compile {tc:5.1f}s  {dt*1e3:6.2f} ms/12-layer-pass")
    tc, dt = run_variant(nopad_call)
    print(f"nopad-197  : compile {tc:5.1f}s  {dt*1e3:6.2f} ms/12-layer-pass")


if __name__ == "__main__":
    main()

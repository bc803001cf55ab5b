"""Microbench: encoder forward variants at B16 geometry (B=128, T=197).

Usage: python scripts/bench_encoder.py [xla|fused|flash|mlponly|attnonly]...
Chained-fori timing like bench.py (the only trustworthy timing on axon).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.core import encoder as enc

B, T = 128, 197
ITERS = 20


def timed(fn, params, x):
    run = jax.jit(
        lambda p, x: jax.lax.fori_loop(
            0,
            ITERS,
            lambda _, c: jnp.mean(fn(p, x * (1.0 + 1e-9 * c))).astype(jnp.float32),
            jnp.float32(0.0),
        )
    )
    float(run(params, x))
    t0 = time.perf_counter()
    float(run(params, x))
    dt = (time.perf_counter() - t0) / ITERS
    return dt


def main():
    variants = sys.argv[1:] or ["xla", "fused", "mlponly"]
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, 768), jnp.float32)
    for v in variants:
        if v in ("xla", "fused", "flash"):
            cfg = enc.EncoderConfig(attn_impl=v)
            params = enc.init(cfg, key)
            fn = lambda p, x: enc.encode(p, x, cfg, precision=enc.BF16)
        elif v == "mlponly":
            cfg = enc.EncoderConfig()
            params = enc.init(cfg, key)

            def fn(p, x, cfg=cfg):
                xx = x.astype(jnp.bfloat16)

                def body(c, lp):
                    h = enc.layer_norm(c, lp["norm2_scale"], lp["norm2_bias"], cfg.ln_eps)
                    return c + enc.mlp(h, lp, enc.BF16), None

                out, _ = jax.lax.scan(body, xx, p)
                return out
        elif v == "attnonly":
            cfg = enc.EncoderConfig(attn_impl="xla")
            params = enc.init(cfg, key)

            def fn(p, x, cfg=cfg):
                xx = x.astype(jnp.bfloat16)

                def body(c, lp):
                    h = enc.layer_norm(c, lp["norm1_scale"], lp["norm1_bias"], cfg.ln_eps)
                    return c + enc.attention(h, lp, cfg, None, enc.BF16), None

                out, _ = jax.lax.scan(body, xx, p)
                return out
        elif v == "fusedonly":
            from metatransformer_tpu.ops import fused_block as fb

            cfg = enc.EncoderConfig()
            params = enc.init(cfg, key)

            def fn(p, x, cfg=cfg):
                xx = x.astype(jnp.bfloat16)

                def body(c, lp):
                    return (
                        fb.attn_sublayer(
                            c, lp["norm1_scale"], lp["norm1_bias"], lp["qkv_w"],
                            lp["qkv_b"], lp["proj_w"], lp["proj_b"],
                            num_heads=cfg.num_heads, ln_eps=cfg.ln_eps,
                        ),
                        None,
                    )

                out, _ = jax.lax.scan(body, xx, p)
                return out
        else:
            raise SystemExit(f"unknown variant {v}")
        dt = timed(fn, params, x)
        print(f"{v:10s} {dt*1e3:8.2f} ms/batch  {B/dt:9.1f} seq/s")


if __name__ == "__main__":
    main()

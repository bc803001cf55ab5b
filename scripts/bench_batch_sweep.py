"""Batch-size sweep for the headline ViT-B16 throughput bench.

Same fori-chained on-device timing as bench.py (data dependency between
iterations, one scalar readback) at several batch sizes, to find the
throughput-optimal batch for the headline metric.

Run from the repo root on the real TPU:
    PYTHONPATH=. python scripts/bench_batch_sweep.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.core import encoder as enc
from metatransformer_tpu.models import image_classifier


def chained(cfg, iters):
    def run(params, images):
        def body(_, carry):
            x = images * (1.0 + 1e-9 * carry)
            logits = image_classifier.forward(params, x, cfg, precision=enc.BF16)
            return jnp.mean(logits)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    return jax.jit(run)


def main():
    cfg = image_classifier.ImageClassifierConfig()
    params = image_classifier.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    for batch in (64, 128, 192, 256, 384):
        iters = max(8, 2048 // batch)
        images = jnp.asarray(
            rng.standard_normal((batch, 224, 224, 3)).astype(np.float32)
        )
        run = chained(cfg, iters)

        def timed():
            float(run(params, images))  # compile + warmup
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(params, images))
                best = min(best, (time.perf_counter() - t0) / iters)
            return best

        try:
            try:
                best = timed()
            except Exception as e:
                # Genuine OOM fails this batch size; anything else is
                # presumed a transient axon-tunnel abort -> retry once
                # (mirrors bench.py's retry-once policy).
                if "RESOURCE_EXHAUSTED" in str(e):
                    raise
                print(f"batch={batch:4d}  transient {type(e).__name__}; "
                      "retrying once", flush=True)
                best = timed()
            print(f"batch={batch:4d}  {batch / best:9.1f} seq/s/chip", flush=True)
        except Exception as e:
            print(f"batch={batch:4d}  FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()

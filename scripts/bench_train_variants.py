"""Training-step throughput across attention backward variants (real chip).

The fused Pallas sublayer (ops/fused_block.py) recomputes its backward
through a twin function; this sweep measures which twin wins end-to-end
at the flagship geometry (ViT-B16, T=197, batch 128, bf16 + fp32 AdamW):

- ``fused_xla``    fused Pallas forward, XLA O(T^2) recompute backward
- ``fused_flash``  fused Pallas forward, flash-Pallas recompute backward
- ``flash``        flash Pallas forward+backward (attn_impl='flash')
- ``xla``          plain XLA attention both ways (attn_impl='xla')

Protocol = scripts/bench_train.py: ``iters`` optimizer steps chained in
ONE jit via lax.scan, batch perturbed per step from the carried loss,
one scalar readback. Prints one JSON line per (variant, track).

Run: ``PYTHONPATH=.:$PYTHONPATH python scripts/bench_train_variants.py
[--batch N] [--iters K] [--tracks frozen,full]``
"""

import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from metatransformer_tpu.core import encoder as enc
from metatransformer_tpu.models import image_classifier
from metatransformer_tpu.train import step as step_lib
from metatransformer_tpu.utils import compile_cache

compile_cache.enable()

VARIANTS = {
    # (attn_impl, MTT_FUSED_BWD, encoder remat policy)
    # Pallas backward kernel for the attn sublayer (the default):
    # [T,T] tensors never touch HBM in either direction.
    "fused_pallas": ("auto", "pallas", False),
    "fused_xla": ("auto", "xla", False),
    "fused_flash": ("auto", "flash", False),
    "flash": ("flash", "xla", False),
    "xla": ("xla", "xla", False),
    # forward saves q/k/v/probs/attn-out/mlp-hidden; backward recomputes
    # nothing (core/encoder.py SAVE_NAMES policy)
    "save": ("auto", "xla", "save"),
}


def bench(variant: str, track: str, batch: int, iters: int) -> float:
    attn_impl, bwd, remat = VARIANTS[variant]
    os.environ["MTT_FUSED_BWD"] = bwd
    cfg = image_classifier.ImageClassifierConfig(
        encoder=dataclasses.replace(enc.BASE, attn_impl=attn_impl, remat=remat)
    )
    params = image_classifier.init(cfg, jax.random.PRNGKey(0))
    frozen_keys = step_lib.FROZEN_KEYS if track == "frozen" else ()
    trainable, frozen = step_lib.split_params(params, frozen_keys)
    optimizer = optax.adamw(1e-3, weight_decay=0.05)
    opt_state = optimizer.init(trainable)

    def forward(p, x, rng):
        return image_classifier.forward(p, x, cfg, precision=enc.BF16)

    train_step = step_lib.make_train_step(forward, optimizer)
    images = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, 224, 224, 3), np.float32)
    )
    labels = jnp.asarray(np.arange(batch, dtype=np.int32) % 1000)

    def run(trainable, frozen, opt_state, images, labels):
        def body(carry, _):
            tr, opt, sig = carry
            b = {"input": images * (1.0 + 1e-9 * sig), "label": labels}
            tr, opt, metrics = train_step(tr, frozen, opt, b, jax.random.PRNGKey(0))
            return (tr, opt, metrics["loss"]), None

        (tr, opt, loss), _ = jax.lax.scan(
            body, (trainable, opt_state, jnp.float32(0.0)), None, length=iters
        )
        return loss

    fn = jax.jit(run)
    float(fn(trainable, frozen, opt_state, images, labels))  # compile + warmup
    t0 = time.perf_counter()
    loss = float(fn(trainable, frozen, opt_state, images, labels))
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(loss), (variant, track, loss)
    return batch / dt


def main(argv):
    batch, iters = 128, 8
    tracks = ("frozen", "full")
    variants = tuple(VARIANTS)
    if "--batch" in argv:
        batch = int(argv[argv.index("--batch") + 1])
    if "--iters" in argv:
        iters = int(argv[argv.index("--iters") + 1])
    if "--tracks" in argv:
        tracks = tuple(argv[argv.index("--tracks") + 1].split(","))
    if "--variants" in argv:
        variants = tuple(argv[argv.index("--variants") + 1].split(","))
    for variant in variants:
        for track in tracks:
            try:
                seq_s = bench(variant, track, batch, iters)
            except Exception as e:  # transient axon aborts: retry once
                print(f"# {variant}/{track}: retry after {type(e).__name__}: {e}",
                      file=sys.stderr)
                time.sleep(5)
                seq_s = bench(variant, track, batch, iters)
            print(json.dumps({
                "variant": variant, "track": track,
                "seq_s": round(seq_s, 2), "batch": batch,
            }), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])

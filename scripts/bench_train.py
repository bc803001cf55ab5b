"""Training-step throughput on the real TPU chip.

Two tracks of the reference's core recipe (ViT-B16 ImageNet geometry,
224 px, 1000 classes, AdamW):

- **frozen**: encoder frozen, tokenizer + head trainable — every
  released Meta-Transformer recipe (`requires_grad=False` in eight
  places upstream). The backward only reaches the patch embed below the
  encoder, so XLA still runs the full 12-block forward + a cheap
  backward.
- **full**: everything trainable (the reference's from-scratch/FT
  ablation) — forward + full backward through all 12 blocks, bf16
  compute, fp32 AdamW state.

Protocol = bench.py: ``iters`` optimizer steps chained inside ONE jit
via ``lax.scan`` carrying (trainable, opt_state); the batch is perturbed
per step from the carried loss so no step can be CSE'd; one scalar
readback. Prints one JSON line per track.

Run: ``PYTHONPATH=.:$PYTHONPATH python scripts/bench_train.py
[--batch N] [--iters K] [--json-out FILE]``
"""

import json
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


def bench_track(track: str, batch: int, iters: int) -> float:
    cfg = image_classifier.ImageClassifierConfig()  # B16, 1000 classes
    params = image_classifier.init(cfg, jax.random.PRNGKey(0))
    frozen_keys = step_lib.FROZEN_KEYS if track == "frozen" else ()
    trainable, frozen = step_lib.split_params(params, frozen_keys)
    optimizer = optax.adamw(1e-3, weight_decay=0.05)
    opt_state = optimizer.init(trainable)

    def forward(p, x, rng):
        return image_classifier.forward(p, x, cfg, precision=enc.BF16)

    train_step = step_lib.make_train_step(forward, optimizer)
    images = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (batch, 224, 224, 3), np.float32
        )
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
    assert np.isfinite(loss), (track, loss)
    return batch / dt


def main(argv):
    compile_cache.enable()  # restart-warm executables across bench runs
    batch, iters, json_out = 128, 8, None
    if "--batch" in argv:
        batch = int(argv[argv.index("--batch") + 1])
    if "--iters" in argv:
        iters = int(argv[argv.index("--iters") + 1])
    if "--json-out" in argv:
        json_out = argv[argv.index("--json-out") + 1]

    table = {}
    for track in ("frozen", "full"):
        try:
            seq_s = bench_track(track, batch, iters)
        except Exception as e:  # transient axon aborts: retry once
            print(f"# {track}: retrying after {type(e).__name__}", file=sys.stderr)
            time.sleep(5)
            seq_s = bench_track(track, batch, iters)
        row = {
            "metric": f"train_step_{track}_encoder_throughput",
            "value": round(seq_s, 2),
            "unit": "seq/s/chip",
            "batch": batch,
        }
        table[track] = row
        print(json.dumps(row), flush=True)
    if json_out:
        with open(json_out, "w") as f:
            json.dump(table, f, indent=1)


if __name__ == "__main__":
    main(sys.argv[1:])

"""Per-modality seq/s/chip benchmark: raw input -> tokens -> shared B16
encoder -> pooled features, one jitted program per modality.

The first-class per-modality throughput harness SURVEY.md §5.1 calls for
(the reference only has ``PointCloud/examples/profile.py``). One JSON
line per modality.

Measurement protocol = bench.py: iterations chained inside one jit via
``lax.fori_loop`` with a data dependency between iterations (the axon
tunnel memoizes identical executions and lies at microsecond scale for
naive timings), single scalar readback. Integer-input modalities
(tabular/text/graph ids) perturb via a carry-dependent in-vocabulary
shift so the tokenizer cannot be hoisted out of the loop.

Run on the real TPU: ``python scripts/bench_modalities.py [modality ...]``
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu import pipeline
from metatransformer_tpu.core import encoder as enc


def _perturb_float(x, c):
    return x * (1.0 + 1e-9 * c)


def _perturb_int(x, c, vocab):
    return (x + (c.astype(jnp.int32) % 2)) % vocab


# modality -> (batch, make_raw(rng), perturb(raw, carry))
SPECS = {
    "image": (
        128,
        lambda r: jnp.asarray(r.standard_normal((128, 224, 224, 3), np.float32)),
        _perturb_float,
    ),
    "video": (
        8,
        lambda r: jnp.asarray(r.standard_normal((8, 16, 224, 224, 3), np.float32)),
        _perturb_float,
    ),
    "audio": (
        8,
        lambda r: jnp.asarray(r.standard_normal((8, 1024, 128), np.float32)),
        _perturb_float,
    ),
    "point": (
        64,
        lambda r: jnp.asarray(
            r.standard_normal((64, 1024, 3), np.float32) * 0.5
        ),
        _perturb_float,
    ),
    "time-series": (
        256,
        lambda r: jnp.asarray(r.standard_normal((256, 96, 7), np.float32)),
        _perturb_float,
    ),
    "tabular": (
        512,
        lambda r: jnp.asarray(r.integers(0, 8, (512, 14)).astype(np.int32)),
        lambda x, c: _perturb_int(x, c, 8),
    ),
    "hyper": (
        64,
        lambda r: jnp.asarray(r.standard_normal((64, 200, 49), np.float32)),
        _perturb_float,
    ),
    "text": (
        256,
        lambda r: jnp.asarray(r.integers(1, 49000, (256, 77)).astype(np.int32)),
        lambda x, c: _perturb_int(x, c, 49000),
    ),
    "graph": (
        64,
        lambda r: {
            "node_data": jnp.asarray(r.integers(0, 16, (64, 32, 9)).astype(np.int32)),
            "edge_data": jnp.asarray(r.integers(0, 4, (64, 48, 3)).astype(np.int32)),
            "edge_index": jnp.asarray(r.integers(0, 32, (64, 48, 2)).astype(np.int32)),
            "node_num": jnp.asarray(np.full((64,), 32, np.int32)),
            "edge_num": jnp.asarray(np.full((64,), 48, np.int32)),
            "lap_eigvec": jnp.asarray(
                r.standard_normal((64, 32, 16), np.float32)
            ),
        },
        lambda x, c: {**x, "lap_eigvec": _perturb_float(x["lap_eigvec"], c)},
    ),
}


def _config(modality: str):
    """Explicit tokenizer configs where the defaults carry no schema."""
    if modality == "tabular":
        from metatransformer_tpu.tokenizers import tabular as tab_tok

        return tab_tok.TabularTokenizerConfig(vocab_sizes=(8,) * 14, dim=768)
    if modality == "time-series":
        from metatransformer_tpu.tokenizers import time_series as ts_tok

        return ts_tok.TimeSeriesConfig(c_in=7, dim=768)
    if modality == "hyper":
        from metatransformer_tpu.tokenizers import hyper as hyper_tok

        return hyper_tok.HyperTokenizerConfig(
            img_size=1, near_band=49, num_tokens=200, dim=768
        )
    return None


def bench_modality(modality: str, iters: int = 10):
    batch, make_raw, perturb = SPECS[modality]
    facade = pipeline.Data2Seq(modality, config=_config(modality))
    key = jax.random.PRNGKey(0)
    tok_params = facade.init(key)
    ecfg = enc.BASE
    enc_params = enc.init(ecfg, jax.random.PRNGKey(1))
    raw = make_raw(np.random.default_rng(0))

    def run(tp, ep, raw):
        def body(_, carry):
            r = perturb(raw, carry)
            tokens = facade(tp, r)
            feats = enc.encode(ep, tokens, ecfg, precision=enc.BF16)
            return jnp.mean(feats.astype(jnp.float32))

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    fn = jax.jit(run)
    result = float(fn(tok_params, enc_params, raw))  # compile + warmup
    assert np.isfinite(result), modality
    t0 = time.perf_counter()
    float(fn(tok_params, enc_params, raw))
    dt = (time.perf_counter() - t0) / iters
    return batch / dt


def main(argv):
    names = argv or list(SPECS)
    for m in names:
        seq_s = bench_modality(m)
        print(
            json.dumps(
                {
                    "metric": f"{m}_raw_to_features_throughput",
                    "value": round(seq_s, 2),
                    "unit": "seq/s/chip",
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main(sys.argv[1:])

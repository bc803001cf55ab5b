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
(``--json-out FILE`` additionally writes the combined table). Covers all
12 modalities of ``pipeline.MODALITIES``. Each modality retries once on
transient axon-tunnel aborts (see .claude/skills/verify/SKILL.md).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu import pipeline
from metatransformer_tpu.core import encoder as enc
from metatransformer_tpu.utils import compile_cache

compile_cache.enable()  # restart-warm executables across bench runs

# CPU reference throughput (seq/s) per modality: the reference-equivalent
# torch pipeline (tokenizer + 12 timm Blocks) on this machine's single CPU
# core, measured by scripts/bench_modalities_cpu_ref.py. The BASELINE.json
# bar is >=5x these. Regenerate with:
#   PYTHONPATH=. python scripts/bench_modalities_cpu_ref.py
CPU_REFERENCE_SEQ_S = {}
try:
    import pathlib

    _ref = pathlib.Path(__file__).with_name("cpu_reference.json")
    if _ref.exists():
        CPU_REFERENCE_SEQ_S = {
            k: v["seq_s"] for k, v in json.loads(_ref.read_text()).items()
        }
except Exception:  # pragma: no cover - bench must still print without it
    pass


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
    # image-tokenizer modalities with their own raw schemas
    # (Data2Seq/Data2Seq.py:25-36 routes infrared/x-ray through the image
    # patch embed; X-Ray/train.py loads 224px 3-channel, infrared thermal
    # frames are single-channel).
    "infrared": (
        128,
        lambda r: jnp.asarray(r.standard_normal((128, 224, 224, 1), np.float32)),
        _perturb_float,
    ),
    "x-ray": (
        128,
        lambda r: jnp.asarray(r.standard_normal((128, 224, 224, 3), np.float32)),
        _perturb_float,
    ),
    # IMU: 6-channel (accel+gyro) windows through the time-series embedder.
    "imu": (
        256,
        lambda r: jnp.asarray(r.standard_normal((256, 256, 6), np.float32)),
        _perturb_float,
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
    if modality == "infrared":
        from metatransformer_tpu.tokenizers import image as image_tok

        return image_tok.ImageTokenizerConfig(in_channels=1, dim=768)
    if modality == "imu":
        from metatransformer_tpu.tokenizers import time_series as ts_tok

        return ts_tok.TimeSeriesConfig(c_in=6, dim=768)
    if modality == "point":
        from metatransformer_tpu.tokenizers import point as point_tok

        # bf16-multiply conv stack to match the BF16 encoder it feeds;
        # the fp32-emulated default measured 3.5x slower on chip and the
        # stack is ~3x the encoder's FLOPs (tokenizers/point.py).
        return point_tok.PointTokenizerConfig(precision="default")
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
    json_out = None
    if "--json-out" in argv:
        i = argv.index("--json-out")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    names = argv or list(SPECS)
    table = {}
    for m in names:
        try:
            seq_s = bench_modality(m)
        except Exception as e:  # transient axon aborts: retry once
            print(f"# {m}: retrying after {type(e).__name__}", file=sys.stderr)
            time.sleep(5)
            seq_s = bench_modality(m)
        row = {
            "metric": f"{m}_raw_to_features_throughput",
            "value": round(seq_s, 2),
            "unit": "seq/s/chip",
        }
        ref = CPU_REFERENCE_SEQ_S.get(m)
        if ref:
            # >=1.0 means the >=5x-CPU-reference BASELINE bar is met.
            row["vs_baseline"] = round(seq_s / (5.0 * ref), 2)
            row["cpu_ref_seq_s"] = ref
        table[m] = row
        print(json.dumps(row), flush=True)
    if json_out:
        with open(json_out, "w") as f:
            json.dump(table, f, indent=1)


if __name__ == "__main__":
    main(sys.argv[1:])

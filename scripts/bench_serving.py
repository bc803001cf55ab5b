"""ServingDaemon mixed-modality throughput on the real TPU chip.

BASELINE.md's north star: "one v5e chip serves all 12 modalities via
tokenize-then-concat batching". This drives the actual product surface —
``serving.ServingDaemon`` (queue/worker, max-wait/max-batch) over
``serving.Dispatcher`` (bucket grouping, program cache) — with all
twelve ``pipeline.Data2Seq`` facades at their full native raw shapes
and the shared B16 encoder, on the real chip.

Protocol: requests are submitted round-robin across modalities (the
adversarial mix for the bucket ladder: eight native token lengths in
every flush group). One full storm is a warmup (compiles every
tokenizer program + every (length-bucket, batch-bucket) encode
executable); the next ``--storms`` storms are timed end to end
(submit -> all futures resolved). Numbers are END-TO-END and include
the axon tunnel RTT on every per-request tokenize call — they are a
floor for real serving throughput, not a device-compute figure (see
``BENCH_MODALITIES.md`` for device-only per-modality throughput; the
device-only batch-1 latency is ``bench.py``'s ``latency_device_ms``).

Run: ``PYTHONPATH=. python scripts/bench_serving.py
[--per-modality N] [--storms K] [--json-out FILE]``
"""

import json
import sys
import time

import jax
import numpy as np

try:  # run as a script (sys.path[0] = scripts/)
    from bench_modalities import _config  # shared full-scale tokenizer configs
except ImportError:  # imported as scripts.bench_serving from the repo root
    from scripts.bench_modalities import _config

from metatransformer_tpu import pipeline, serving
from metatransformer_tpu.core import encoder as enc
from metatransformer_tpu.utils import compile_cache

compile_cache.enable()  # restart-warm executables across bench runs

# modality -> batch-1 raw request maker at the reference's native scale
# (image 224px / video 16x224 / audio 1024x128 fbank / point 1024 pts /
# ETT-style ts / CLIP 77-token text / OGB-style graph).
def _graph_raw(r):
    n_nodes, n_edges = 32, 48
    return {
        "node_data": r.integers(0, 16, (1, n_nodes, 9)).astype(np.int32),
        "edge_data": r.integers(0, 4, (1, n_edges, 3)).astype(np.int32),
        "edge_index": r.integers(0, n_nodes, (1, n_edges, 2)).astype(np.int32),
        "node_num": np.asarray([n_nodes], np.int32),
        "edge_num": np.asarray([n_edges], np.int32),
        "lap_eigvec": r.standard_normal((1, n_nodes, 16)).astype(np.float32),
    }


RAW = {
    # pixel modalities ship uint8 (the real client wire format; scaled to
    # [0,1] on device by the tokenizers) — 4x less ingress than float32,
    # and ingress dominated the mixed flush (~40 MB -> ~10 MB)
    "image": lambda r: r.integers(0, 256, (1, 224, 224, 3), dtype=np.uint8),
    "x-ray": lambda r: r.integers(0, 256, (1, 224, 224, 3), dtype=np.uint8),
    "infrared": lambda r: r.integers(0, 256, (1, 224, 224, 1), dtype=np.uint8),
    "video": lambda r: r.integers(0, 256, (1, 16, 224, 224, 3), dtype=np.uint8),
    "audio": lambda r: r.standard_normal((1, 1024, 128)).astype(np.float32),
    "point": lambda r: (r.standard_normal((1, 1024, 3)) * 0.5).astype(np.float32),
    "time-series": lambda r: r.standard_normal((1, 96, 7)).astype(np.float32),
    "imu": lambda r: r.standard_normal((1, 256, 6)).astype(np.float32),
    "tabular": lambda r: r.integers(0, 8, (1, 14)).astype(np.int32),
    "hyper": lambda r: r.standard_normal((1, 200, 49)).astype(np.float32),
    "text": lambda r: r.integers(1, 49000, (1, 77)).astype(np.int32),
    "graph": _graph_raw,
}


def build_dispatcher():
    # fused=True: one raw->pooled program per (modality, batch-bucket) —
    # the pooled-serving fast path (see ServingConfig.fused).
    cfg = serving.ServingConfig(encoder=enc.BASE, precision=enc.BF16, fused=True)
    keys = iter(jax.random.split(jax.random.PRNGKey(0), 16))
    toks = {}
    for m in RAW:
        facade = pipeline.Data2Seq(m, config=_config(m))
        toks[m] = (facade, facade.init(next(keys)))
    enc_params = enc.init(cfg.encoder, next(keys))
    return serving.Dispatcher(toks, enc_params, cfg)


def storm(daemon, rng, per_modality):
    """Submit per_modality x 12 requests round-robin; wait on all."""
    reqs = [
        serving.Request(m, RAW[m](rng))
        for _ in range(per_modality)
        for m in RAW
    ]
    t0 = time.perf_counter()
    futs = [daemon.submit(r) for r in reqs]
    outs = [f.result(timeout=600) for f in futs]
    dt = time.perf_counter() - t0
    for o in outs:
        assert o.shape == (768,) and np.isfinite(o).all()
    return len(futs), dt


def main(argv):
    per_modality, storms, json_out = 6, 2, None
    if "--per-modality" in argv:
        per_modality = int(argv[argv.index("--per-modality") + 1])
    if "--storms" in argv:
        storms = int(argv[argv.index("--storms") + 1])
    if "--json-out" in argv:
        json_out = argv[argv.index("--json-out") + 1]

    disp = build_dispatcher()
    daemon = serving.ServingDaemon(disp, max_batch=24, max_wait_s=0.3)
    rng = np.random.default_rng(0)

    n_warm, warm_s = storm(daemon, rng, per_modality)  # compiles everything
    daemon.reset_stats()
    print(
        f"# warmup: {n_warm} reqs in {warm_s:.1f}s, "
        f"{disp.num_programs} encode programs, "
        f"{len(disp.tok_stats)} tokenizer programs",
        file=sys.stderr,
    )

    disp.dispatch_s = 0.0
    n = dt = 0
    for _ in range(storms):
        sn, sdt = storm(daemon, rng, per_modality)
        n, dt = n + sn, dt + sdt
    lat = daemon.latency_percentiles()
    daemon.stop()

    row = {
        "metric": "serving_mixed_12modality_throughput_e2e",
        "value": round(n / dt, 2),
        "unit": "req/s/chip (tunnel-inclusive)",
        # device dispatch (packed flush call + readback) split of e2e:
        # excludes queueing + host-side stacking
        "dispatch_req_s": round(n / disp.dispatch_s, 2),
        "dispatch_share": round(disp.dispatch_s / dt, 2),
        "n_requests": n,
        "n_modalities": len(RAW),
        "encode_programs": disp.num_programs,  # 0 in fused mode
        "fused_programs": len(disp.tok_stats),
        "program_hits": {
            f"{m}xB{b}": c for (m, b), c in sorted(disp.tok_stats.items())
        },
        "latency_p50_ms": round(lat["p50_ms"], 2),
        "latency_p99_ms": round(lat["p99_ms"], 2),
    }
    print(json.dumps(row), flush=True)
    if json_out:
        with open(json_out, "w") as f:
            json.dump(row, f, indent=1)


if __name__ == "__main__":
    main(sys.argv[1:])

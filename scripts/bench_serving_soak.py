"""Shifting-mix serving soak: prove the daemon stays bounded under load.

The packed-flush path retraces per flush *composition*; VERDICT r4
flagged that an adversarial request mix could compile-storm the daemon.
This soak drives ``ServingDaemon`` for ``--seconds`` (default 300) of
wall clock through a mix that SHIFTS every phase — each phase draws a
different random subset of the 12 modalities with different weights —
and reports, per phase:

* requests served and end-to-end req/s,
* p50/p99 latency (reset per phase, so drift is visible),
* cumulative packed-program retraces (``Dispatcher.packed_retraces``),
* cumulative ceiling fallbacks (``Dispatcher.packed_fallbacks``),
* cumulative queue rejections (``ServingDaemon.rejected``).

Pass criteria (summary JSON): retraces never exceed
``max_packed_programs`` + the per-(modality,bucket) tokenizer ladder,
and late-phase p99 stays within ~2x of the post-warmup p99 (no
monotonic drift). Run on the real chip:

    PYTHONPATH=. python scripts/bench_serving_soak.py \
        [--seconds 300] [--phase-seconds 30] [--json-out FILE]
"""

import json
import sys
import time

import numpy as np

try:  # run as a script (sys.path[0] = scripts/)
    from bench_serving import RAW, build_dispatcher
except ImportError:  # imported as scripts.bench_serving_soak
    from scripts.bench_serving import RAW, build_dispatcher

from metatransformer_tpu import serving
from metatransformer_tpu.utils import compile_cache


def make_mixes(rng, n_mixes: int):
    """Distinct shifting mixes: random 3-12 modality subsets, weighted.
    Phases cycle through these, so first visits are cold (compile) and
    revisits measure warm steady-state — the drift comparison."""
    mods = sorted(RAW)
    mixes = []
    for _ in range(n_mixes):
        k = int(rng.integers(3, len(mods) + 1))
        subset = list(rng.choice(mods, size=k, replace=False))
        weights = rng.integers(1, 4, size=k)  # 1-3 requests per round
        mixes.append(
            [m for m, w in zip(subset, weights) for _ in range(int(w))]
        )
    return mixes


def run_phase(daemon, rng, mix, seconds: float):
    """Submit storms of the phase mix until the deadline; wait each storm
    out (so queue depth stays bounded by one storm + max_queue)."""
    served = rejected = 0
    deadline = time.perf_counter() + seconds
    while time.perf_counter() < deadline:
        futs = [
            daemon.submit(serving.Request(m, RAW[m](rng))) for m in mix
        ]
        for f in futs:
            try:
                out = f.result(timeout=600)
                assert np.isfinite(out).all()
                served += 1
            except serving.QueueFullError:
                rejected += 1
    return served, rejected


def main(argv):
    compile_cache.enable()
    seconds, phase_seconds, json_out, ceiling = 300.0, 30.0, None, None
    if "--seconds" in argv:
        seconds = float(argv[argv.index("--seconds") + 1])
    if "--phase-seconds" in argv:
        phase_seconds = float(argv[argv.index("--phase-seconds") + 1])
    if "--json-out" in argv:
        json_out = argv[argv.index("--json-out") + 1]
    if "--ceiling" in argv:
        ceiling = int(argv[argv.index("--ceiling") + 1])

    disp = build_dispatcher()
    if ceiling is not None:
        import dataclasses

        disp.cfg = dataclasses.replace(
            disp.cfg, max_packed_programs=ceiling
        )
    daemon = serving.ServingDaemon(
        disp, max_batch=24, max_wait_s=0.3, max_queue=256
    )
    rng = np.random.default_rng(0)

    # warmup: one full round-robin storm compiles the all-modality comp
    futs = [daemon.submit(serving.Request(m, RAW[m](rng))) for m in RAW]
    for f in futs:
        f.result(timeout=600)
    daemon.reset_stats()
    print(
        f"# warmup done: retraces={disp.packed_retraces}", file=sys.stderr
    )

    phases = []
    n_phases = max(int(round(seconds / phase_seconds)), 1)
    mixes = make_mixes(rng, max(n_phases // 2, 1))
    for p in range(n_phases):
        mix = mixes[p % len(mixes)]
        daemon.reset_stats()
        t0 = time.perf_counter()
        served, _ = run_phase(daemon, rng, mix, phase_seconds)
        dt = time.perf_counter() - t0
        lat = daemon.latency_percentiles()
        row = {
            "phase": p,
            "mix": sorted(set(mix)),
            "served": served,
            "req_s": round(served / dt, 2),
            "p50_ms": round(lat["p50_ms"], 1),
            "p99_ms": round(lat["p99_ms"], 1),
            "retraces": disp.packed_retraces,
            "fallbacks": disp.packed_fallbacks,
            "rejected": daemon.rejected,
        }
        phases.append(row)
        print(json.dumps(row), flush=True)
    daemon.stop()

    # cold = each mix's first visit (pays the packed compile); warm =
    # revisits. Warm p99 holding steady IS the no-compile-storm proof.
    n_mix = len(mixes)
    cold_p99 = np.median([r["p99_ms"] for r in phases[:n_mix]])
    early_p99 = np.median(
        [r["p99_ms"] for r in phases[n_mix : 2 * n_mix]] or [cold_p99]
    )
    late_p99 = np.median([r["p99_ms"] for r in phases[-n_mix:]])
    summary = {
        "metric": "serving_soak",
        "seconds": seconds,
        "phases": n_phases,
        "total_served": sum(r["served"] for r in phases),
        "mean_req_s": round(
            float(np.mean([r["req_s"] for r in phases])), 2
        ),
        "retraces_final": disp.packed_retraces,
        "retrace_ceiling": disp.cfg.max_packed_programs,
        "fallbacks_final": disp.packed_fallbacks,
        "rejected_final": daemon.rejected,
        "p99_cold_ms": round(float(cold_p99), 1),
        "p99_warm_early_ms": round(float(early_p99), 1),
        "p99_warm_late_ms": round(float(late_p99), 1),
        "p99_drift_x": round(float(late_p99 / max(early_p99, 1e-9)), 2),
        "bounded": disp.packed_retraces <= disp.cfg.max_packed_programs,
    }
    print(json.dumps(summary), flush=True)
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"summary": summary, "phases": phases}, f, indent=1)


if __name__ == "__main__":
    main(sys.argv[1:])

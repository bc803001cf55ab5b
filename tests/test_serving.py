"""Batching dispatcher: bucket grouping, padding, program reuse
(serving story over pipeline.encode_bucketed)."""

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu import pipeline, serving
from metatransformer_tpu.core import encoder as enc


def _setup():
    cfg = serving.ServingConfig(
        encoder=enc.EncoderConfig(dim=32, depth=2, num_heads=2),
        precision=enc.FP32,
    )
    key = jax.random.PRNGKey(0)
    img = pipeline.Data2Seq("image", dim=32)
    import dataclasses
    img = pipeline.Data2Seq(
        "image", dim=32,
        config=dataclasses.replace(img.config, img_size=32, dim=32),
    )
    tok_params = img.init(key)
    enc_params = enc.init(cfg.encoder, jax.random.PRNGKey(1))
    disp = serving.Dispatcher({"image": (img, tok_params)}, enc_params, cfg)
    return disp, cfg


def test_batch_bucket_ladder():
    assert serving.batch_bucket(1, (1, 2, 4)) == 1
    assert serving.batch_bucket(3, (1, 2, 4)) == 4
    try:
        serving.batch_bucket(9, (1, 2, 4))
        assert False
    except ValueError:
        pass


def test_dispatcher_serves_mixed_batch_in_order():
    disp, cfg = _setup()
    rng = np.random.default_rng(0)
    reqs = [
        serving.Request("image", jnp.asarray(
            rng.standard_normal((1, 32, 32, 3)), jnp.float32), request_id=i)
        for i in range(3)
    ]
    out = disp.serve(reqs)
    assert len(out) == 3
    assert all(o.shape == (32,) for o in out)
    # identical inputs -> identical features; distinct -> distinct
    out2 = disp.serve([reqs[0]])
    np.testing.assert_allclose(out[0], out2[0], atol=1e-5)
    assert np.abs(out[0] - out[1]).max() > 1e-6

    # program reuse: 3 requests of one length -> one (T=64, B=4) group,
    # single request -> (T=64, B=1); two executables total
    assert disp.num_programs == 2
    assert disp.stats[(64, 4)] == 1 and disp.stats[(64, 1)] == 1


def test_dispatcher_pooling_ignores_padding():
    """A request padded into a larger batch bucket must produce the same
    features as served alone (mask + per-request crop)."""
    disp, cfg = _setup()
    rng = np.random.default_rng(1)
    base = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    alone = disp.serve([serving.Request("image", base)])[0]
    others = [
        serving.Request("image", jnp.asarray(
            rng.standard_normal((1, 32, 32, 3)), jnp.float32))
        for _ in range(2)
    ]
    mixed = disp.serve([serving.Request("image", base)] + others)[0]
    np.testing.assert_allclose(alone, mixed, atol=1e-5)


def test_dispatcher_mixed_modalities_share_programs():
    """Image and time-series requests of different native lengths are
    served through one dispatcher: per-modality tokenizers, shared
    encoder, bucket grouping across modalities."""
    import dataclasses

    cfg = serving.ServingConfig(
        encoder=enc.EncoderConfig(dim=32, depth=2, num_heads=2),
        precision=enc.FP32,
    )
    key = jax.random.PRNGKey(0)
    img = pipeline.Data2Seq("image", dim=32)
    img = pipeline.Data2Seq(
        "image", dim=32,
        config=dataclasses.replace(img.config, img_size=32, dim=32),
    )
    ts = pipeline.Data2Seq("time-series", dim=32)
    toks = {
        "image": (img, img.init(key)),
        "time-series": (ts, ts.init(jax.random.PRNGKey(1))),
    }
    disp = serving.Dispatcher(toks, enc.init(cfg.encoder, jax.random.PRNGKey(2)), cfg)

    rng = np.random.default_rng(4)
    reqs = [
        serving.Request("image", jnp.asarray(
            rng.standard_normal((1, 32, 32, 3)), jnp.float32)),
        serving.Request("time-series", jnp.asarray(
            rng.standard_normal((1, 48, 1)), jnp.float32)),
        serving.Request("image", jnp.asarray(
            rng.standard_normal((1, 32, 32, 3)), jnp.float32)),
    ]
    out = disp.serve(reqs)
    assert len(out) == 3
    assert all(o.shape == (32,) for o in out)
    assert all(np.isfinite(o).all() for o in out)
    # image tokens (4x4=16 -> bucket 64) and ts tokens (48 -> bucket 64)
    # land in ONE shared group: a single executable served everything
    assert disp.num_programs == 1
    assert disp.stats[(64, 4)] == 1


def test_daemon_concurrent_mixed_requests():
    """Queue/worker daemon: concurrent submits from multiple threads all
    resolve, match the synchronous dispatcher's output, and record
    latency percentiles."""
    import threading

    disp, cfg = _setup()
    rng = np.random.default_rng(7)
    datas = [
        jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
        for _ in range(8)
    ]
    want = disp.serve([serving.Request("image", d) for d in datas])

    daemon = serving.ServingDaemon(disp, max_batch=4, max_wait_s=0.02)
    futs = [None] * len(datas)

    def submit(i):
        futs[i] = daemon.submit(serving.Request("image", datas[i]))

    threads = [
        threading.Thread(target=submit, args=(i,)) for i in range(len(datas))
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    outs = [f.result(timeout=30) for f in futs]
    for got, exp in zip(outs, want):
        np.testing.assert_allclose(got, exp, atol=1e-5)

    lat = daemon.latency_percentiles()
    assert lat["n"] == len(datas)
    assert 0 < lat["p50_ms"] <= lat["p99_ms"]
    daemon.stop()


def test_daemon_propagates_errors():
    disp, cfg = _setup()
    daemon = serving.ServingDaemon(disp, max_batch=2, max_wait_s=0.01)
    bad = daemon.submit(serving.Request("nope", np.zeros((1, 2))))
    try:
        bad.result(timeout=30)
        assert False, "expected an exception"
    except KeyError:
        pass
    daemon.stop()


def test_tokenizer_batching_one_call_per_group():
    """Same-modality, same-raw-shape requests are tokenized in ONE
    stacked call padded up the batch-bucket ladder (tok_stats counts
    executables), and the batched rows match per-request results."""
    disp, cfg = _setup()
    rng = np.random.default_rng(3)
    reqs = [
        serving.Request("image", jnp.asarray(
            rng.standard_normal((1, 32, 32, 3)), jnp.float32))
        for _ in range(3)
    ]
    out = disp.serve(reqs)
    # one stacked tokenize padded 3 -> bucket 4
    assert disp.tok_stats == {("image", 4): 1}
    alone = disp.serve([reqs[1]])
    assert disp.tok_stats[("image", 1)] == 1
    np.testing.assert_allclose(out[1], alone[0], atol=1e-5)


def test_tokenizer_batching_stacks_graph_dicts():
    """Tree-valued raw inputs (graph batch dicts) stack leaf-wise on the
    batch axis; per-example node counts survive the round trip."""
    cfg = serving.ServingConfig(
        encoder=enc.EncoderConfig(dim=32, depth=2, num_heads=2),
        precision=enc.FP32,
    )
    g = pipeline.Data2Seq("graph", dim=32)
    toks = {"graph": (g, g.init(jax.random.PRNGKey(0)))}
    disp = serving.Dispatcher(toks, enc.init(cfg.encoder, jax.random.PRNGKey(1)), cfg)
    rng = np.random.default_rng(5)

    def graph_raw():
        n_nodes, n_edges = 6, 8
        return {
            "node_data": rng.integers(0, 16, (1, n_nodes, 9)).astype(np.int32),
            "edge_data": rng.integers(0, 4, (1, n_edges, 3)).astype(np.int32),
            "edge_index": rng.integers(0, n_nodes, (1, n_edges, 2)).astype(np.int32),
            "node_num": np.asarray([n_nodes], np.int32),
            "edge_num": np.asarray([n_edges], np.int32),
            "lap_eigvec": rng.standard_normal((1, n_nodes, 16)).astype(np.float32),
        }

    reqs = [serving.Request("graph", graph_raw()) for _ in range(2)]
    out = disp.serve(reqs)
    assert disp.tok_stats == {("graph", 2): 1}
    alone = disp.serve([reqs[0]])
    np.testing.assert_allclose(out[0], alone[0], atol=1e-5)


def test_fused_serving_matches_bucketed():
    """fused=True serves each (modality, batch-bucket) group as ONE
    raw->pooled program; features must match the bucketed path (same
    params, fp32) and program stats land in tok_stats."""
    import dataclasses as dc

    cfg = serving.ServingConfig(
        encoder=enc.EncoderConfig(dim=32, depth=2, num_heads=2),
        precision=enc.FP32,
    )
    key = jax.random.PRNGKey(0)
    img = pipeline.Data2Seq("image", dim=32)
    img = pipeline.Data2Seq(
        "image", dim=32,
        config=dc.replace(img.config, img_size=32, dim=32),
    )
    ts = pipeline.Data2Seq("time-series", dim=32)
    toks = {
        "image": (img, img.init(key)),
        "time-series": (ts, ts.init(jax.random.PRNGKey(1))),
    }
    enc_params = enc.init(cfg.encoder, jax.random.PRNGKey(2))
    bucketed = serving.Dispatcher(toks, enc_params, cfg)
    fused = serving.Dispatcher(toks, enc_params, dc.replace(cfg, fused=True))

    rng = np.random.default_rng(11)
    reqs = [
        serving.Request("image", jnp.asarray(
            rng.standard_normal((1, 32, 32, 3)), jnp.float32)),
        serving.Request("time-series", jnp.asarray(
            rng.standard_normal((1, 48, 1)), jnp.float32)),
        serving.Request("image", jnp.asarray(
            rng.standard_normal((1, 32, 32, 3)), jnp.float32)),
    ]
    want = bucketed.serve(reqs)
    got = fused.serve(reqs)
    for w, g in zip(want, got):
        np.testing.assert_allclose(g, w, atol=1e-5)
    # 2 images -> one (image, bucket 2) program; 1 ts -> (ts, 1)
    assert fused.tok_stats == {("image", 2): 1, ("time-series", 1): 1}
    assert fused.num_programs == 0  # no separate encode executables


def test_daemon_reset_stats():
    disp, cfg = _setup()
    daemon = serving.ServingDaemon(disp, max_batch=2, max_wait_s=0.01)
    rng = np.random.default_rng(9)
    fut = daemon.submit(serving.Request("image", jnp.asarray(
        rng.standard_normal((1, 32, 32, 3)), jnp.float32)))
    fut.result(timeout=30)
    assert daemon.latency_percentiles()["n"] == 1
    daemon.reset_stats()
    assert daemon.latency_percentiles()["n"] == 0
    daemon.stop()


def test_dispatcher_serves_twelve_modalities():
    """The BASELINE 'one chip serves all modalities' config: ALL twelve
    Data2Seq facades with their native raw formats behind ONE dispatcher
    and one shared encoder; every request comes back pooled, finite, in
    order, and the bucket grouping collapses them into a handful of
    programs. Text runs a width-16 CLIP tower whose embedding zero-pads
    UP to the 32-d test encoder — exactly the reference's
    ``zero_padding`` (Data2Seq/Text.py:15-19)."""
    import dataclasses

    d = 32
    cfg = serving.ServingConfig(
        encoder=enc.EncoderConfig(dim=d, depth=2, num_heads=2),
        precision=enc.FP32,
    )
    rng = np.random.default_rng(0)
    key = iter(jax.random.split(jax.random.PRNGKey(0), 16))

    from metatransformer_tpu.tokenizers import (
        hyper as hyper_tok,
        tabular as tab_tok,
        text as text_tok,
        time_series as ts_tok,
        video as video_tok,
    )

    img = pipeline.Data2Seq("image", dim=d)
    img = pipeline.Data2Seq(
        "image", dim=d, config=dataclasses.replace(img.config, img_size=32, dim=d)
    )
    ts_cfg = ts_tok.TimeSeriesConfig(c_in=7, dim=d)
    facades = {
        "image": img,
        "x-ray": img,  # same tokenizer family, separate params
        "infrared": img,  # image family too (pipeline.MODALITIES)
        "video": pipeline.Data2Seq(
            "video", dim=d,
            config=video_tok.VideoTokenizerConfig(
                num_frames=4, img_size=32, dim=d
            ),
        ),
        "time-series": pipeline.Data2Seq("time-series", dim=d, config=ts_cfg),
        "imu": pipeline.Data2Seq("imu", dim=d, config=ts_cfg),
        "tabular": pipeline.Data2Seq(
            "tabular", dim=d,
            config=tab_tok.TabularTokenizerConfig(vocab_sizes=(8,) * 5, dim=d),
        ),
        "hyper": pipeline.Data2Seq(
            "hyper", dim=d,
            config=hyper_tok.HyperTokenizerConfig(
                img_size=1, near_band=4, num_tokens=12, dim=d
            ),
        ),
        "point": pipeline.Data2Seq("point", dim=d),
        "audio": pipeline.Data2Seq("audio", dim=d),
        "text": pipeline.Data2Seq(
            "text", dim=d,
            config=text_tok.TextTokenizerConfig(
                vocab_size=64, context_length=8, width=16, depth=2,
                num_heads=2, proj_dim=16, target_dim=d, eot_token_id=63,
            ),
        ),
        "graph": pipeline.Data2Seq("graph", dim=d),
    }
    toks = {m: (f, f.init(next(key))) for m, (f) in facades.items()}
    disp = serving.Dispatcher(
        toks, enc.init(cfg.encoder, next(key)), cfg
    )

    n_nodes, n_edges = 6, 8
    graph_batch = {
        "node_data": rng.integers(0, 16, (1, n_nodes, 9)).astype(np.int32),
        "edge_data": rng.integers(0, 4, (1, n_edges, 3)).astype(np.int32),
        "edge_index": rng.integers(0, n_nodes, (1, n_edges, 2)).astype(np.int32),
        "node_num": np.asarray([n_nodes], np.int32),
        "edge_num": np.asarray([n_edges], np.int32),
        "lap_eigvec": rng.standard_normal((1, n_nodes, 16)).astype(np.float32),
    }
    raws = {
        "image": rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32),
        "x-ray": rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32),
        "infrared": rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32),
        "video": rng.uniform(0, 1, (1, 4, 32, 32, 3)).astype(np.float32),
        "time-series": rng.standard_normal((1, 48, 7)).astype(np.float32),
        "imu": rng.standard_normal((1, 48, 7)).astype(np.float32),
        "tabular": rng.integers(0, 8, (1, 5)).astype(np.int32),
        "hyper": rng.standard_normal((1, 12, 4)).astype(np.float32),
        "point": rng.standard_normal((1, 128, 3)).astype(np.float32) * 0.5,
        "audio": rng.standard_normal((1, 128, 128)).astype(np.float32),
        "text": np.concatenate(
            [rng.integers(1, 62, (1, 7)), np.full((1, 1), 63)], axis=1
        ).astype(np.int32),
        "graph": graph_batch,
    }
    reqs = [
        serving.Request(m, jax.tree.map(jnp.asarray, raws[m]))
        for m in facades
    ]
    out = disp.serve(reqs)
    assert len(out) == len(reqs)
    for o in out:
        assert o.shape == (d,)
        assert np.isfinite(np.asarray(o)).all()
    # bucketing must merge the 8 native lengths into far fewer programs
    assert disp.num_programs <= 4, disp.stats


def _fused_setup(max_packed_programs=16):
    """Two-modality dispatcher in fused mode for packed-path tests."""
    import dataclasses as dc

    cfg = serving.ServingConfig(
        encoder=enc.EncoderConfig(dim=32, depth=2, num_heads=2),
        precision=enc.FP32,
        fused=True,
        max_packed_programs=max_packed_programs,
    )
    img = pipeline.Data2Seq("image", dim=32)
    img = pipeline.Data2Seq(
        "image", dim=32,
        config=dc.replace(img.config, img_size=32, dim=32),
    )
    ts = pipeline.Data2Seq("time-series", dim=32)
    toks = {
        "image": (img, img.init(jax.random.PRNGKey(0))),
        "time-series": (ts, ts.init(jax.random.PRNGKey(1))),
    }
    enc_params = enc.init(cfg.encoder, jax.random.PRNGKey(2))
    return serving.Dispatcher(toks, enc_params, cfg), cfg


def test_packed_composition_canonical_under_arrival_order():
    """The packed program's composition is the MULTISET of (modality,
    raw-shape, bucket) groups: the same mix arriving in any order must
    reuse ONE executable (packed_retraces stays 1)."""
    disp, _ = _fused_setup()
    rng = np.random.default_rng(0)
    imgs = [jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
            for _ in range(2)]
    tss = [jnp.asarray(rng.standard_normal((1, 48, 1)), jnp.float32)
           for _ in range(2)]

    mix = [serving.Request("image", imgs[0]),
           serving.Request("time-series", tss[0]),
           serving.Request("image", imgs[1]),
           serving.Request("time-series", tss[1])]
    want = disp.serve(mix)
    assert disp.packed_retraces == 1
    # reversed + interleaved-differently arrival: same composition
    got = disp.serve(mix[::-1])
    assert disp.packed_retraces == 1, "arrival order forced a retrace"
    for w, g in zip(want, got[::-1]):
        np.testing.assert_allclose(g, w, atol=1e-5)
    # a genuinely new composition (image-only flush) does retrace
    disp.serve(mix[:1])
    assert disp.packed_retraces == 2


def test_packed_program_ceiling_falls_back_to_bucketed():
    """Once max_packed_programs distinct compositions exist, an unseen
    composition serves through the bucketed path (no new compile) and
    still returns correct features."""
    disp, cfg = _fused_setup(max_packed_programs=1)
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    ts = jnp.asarray(rng.standard_normal((1, 48, 1)), jnp.float32)

    disp.serve([serving.Request("image", img)])  # occupies the 1 slot
    assert disp.packed_retraces == 1 and disp.packed_fallbacks == 0

    got = disp.serve([serving.Request("time-series", ts)])  # new comp
    assert disp.packed_retraces == 1, "ceiling was not enforced"
    assert disp.packed_fallbacks == 1
    assert disp.num_programs >= 1  # bucketed path actually served it

    # the bucketed fallback must agree with an unconstrained dispatcher
    free, _ = _fused_setup()
    want = free.serve([serving.Request("time-series", ts)])
    np.testing.assert_allclose(got[0], want[0], atol=1e-5)

    # seen composition still runs packed (no fallback increment)
    disp.serve([serving.Request("image", img)])
    assert disp.packed_fallbacks == 1


def test_daemon_backpressure_rejects_when_full():
    """Bounded queue: submits beyond max_queue resolve immediately with
    QueueFullError instead of growing latency unboundedly; accepted
    requests still complete."""
    import threading

    disp, _ = _setup()
    daemon = serving.ServingDaemon(
        disp, max_batch=2, max_wait_s=0.01, max_queue=2
    )
    # stall the worker so the queue actually fills: the first request
    # blocks inside serve() on this gate
    gate = threading.Event()
    orig_serve = disp.serve

    def gated_serve(reqs):
        gate.wait(timeout=30)
        return orig_serve(reqs)

    disp.serve = gated_serve
    rng = np.random.default_rng(2)
    datas = [jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
             for _ in range(6)]
    futs = [daemon.submit(serving.Request("image", d)) for d in datas]
    # worker took ~1-2 into its flush group; queue holds 2; the rest reject
    rejected = [f for f in futs if f.done() and f.exception() is not None]
    assert len(rejected) >= 2, "queue never filled"
    assert all(isinstance(f.exception(), serving.QueueFullError)
               for f in rejected)
    assert daemon.rejected == len(rejected)

    gate.set()
    accepted = [f for f in futs if f not in rejected]
    for f in accepted:
        out = f.result(timeout=60)
        assert np.isfinite(np.asarray(out)).all()
    daemon.stop()

"""Point ops vs pure-python/torch oracles — the reference's kernel-test
pattern (CUDA-vs-reference, SURVEY.md §4) applied to the TPU ops."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metatransformer_tpu.core import encoder
from metatransformer_tpu.models import point_classifier
from metatransformer_tpu.ops import point_ops
from metatransformer_tpu.tokenizers import point as point_tok


def _fps_oracle(points: np.ndarray, m: int) -> np.ndarray:
    """Sequential FPS, start at 0 (matches sampling_gpu.cu seeding)."""
    n = points.shape[0]
    idxs = np.zeros(m, np.int64)
    min_d = np.full(n, np.inf)
    last = 0
    for i in range(1, m):
        d = np.sum((points - points[last]) ** 2, axis=-1)
        min_d = np.minimum(min_d, d)
        last = int(np.argmax(min_d))
        idxs[i] = last
    return idxs


def test_fps_matches_oracle():
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((2, 128, 3)).astype(np.float32)
    got = np.asarray(point_ops.furthest_point_sample(jnp.asarray(pts), 16))
    for b in range(2):
        want = _fps_oracle(pts[b], 16)
        np.testing.assert_array_equal(got[b], want)


def test_fps_pallas_matches_xla_and_oracle():
    """The VMEM-resident Pallas FPS (interpret mode on CPU) must pick the
    exact same indices as the XLA while-loop twin and the python oracle —
    one-hot coord extraction and iota-select index writes change the
    mechanics, not the math."""
    rng = np.random.default_rng(3)
    pts = rng.standard_normal((2, 128, 3)).astype(np.float32)
    got = np.asarray(
        point_ops._fps_pallas(jnp.asarray(pts), 16, interpret=True)
    )
    xla = np.asarray(point_ops._fps_xla(jnp.asarray(pts), 16))
    np.testing.assert_array_equal(got, xla)
    for b in range(2):
        np.testing.assert_array_equal(got[b], _fps_oracle(pts[b], 16))


def test_fps_covers_space():
    """FPS picks spread-out points: max point-to-sample distance must be
    far below that of a degenerate (first-k) subsample."""
    rng = np.random.default_rng(1)
    pts = rng.uniform(-1, 1, (1, 1024, 3)).astype(np.float32)
    idx = np.asarray(point_ops.furthest_point_sample(jnp.asarray(pts), 64))[0]
    d_fps = point_ops.square_dists(
        jnp.asarray(pts), jnp.asarray(pts[:, idx])
    ).min(-1).max()
    d_first = point_ops.square_dists(
        jnp.asarray(pts), jnp.asarray(pts[:, :64])
    ).min(-1).max()
    assert float(d_fps) < float(d_first) * 0.5


def test_knn_matches_numpy():
    rng = np.random.default_rng(2)
    pts = rng.standard_normal((2, 64, 3)).astype(np.float32)
    centers = pts[:, :8]
    dists, idx = point_ops.knn(jnp.asarray(centers), jnp.asarray(pts), 4)
    idx = np.asarray(idx)
    for b in range(2):
        d = ((centers[b][:, None] - pts[b][None]) ** 2).sum(-1)
        want = np.argsort(d, axis=-1, kind="stable")[:, :4]
        got_sets = [set(r) for r in idx[b]]
        want_sets = [set(r) for r in want]
        assert got_sets == want_sets
        # nearest must be the center itself (distance 0)
        np.testing.assert_array_equal(idx[b][:, 0], np.arange(8))


def test_ball_query_semantics():
    pts = np.array([[[0, 0, 0], [0.05, 0, 0], [2, 0, 0], [0.08, 0, 0]]], np.float32)
    centers = pts[:, :1]
    idx = np.asarray(point_ops.ball_query(jnp.asarray(centers), jnp.asarray(pts), 0.1, 3))
    # in-radius: 0, 1, 3 (ascending); point 2 is outside
    np.testing.assert_array_equal(idx[0, 0], [0, 1, 3])
    # fewer hits than k -> pad with first hit
    idx2 = np.asarray(point_ops.ball_query(jnp.asarray(centers), jnp.asarray(pts), 0.06, 3))
    np.testing.assert_array_equal(idx2[0, 0], [0, 1, 0])


def test_point_tokenizer_shapes():
    cfg = point_tok.PointTokenizerConfig(
        sample_ratio=0.25, group_size=8, embed_dim=32, feature_type="dp_fj"
    )
    params = point_tok.init(cfg, jax.random.PRNGKey(0))
    pts = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 3), np.float32))
    center_p, tokens = point_tok.apply(params, pts, cfg)
    assert center_p.shape == (2, 16, 3)
    assert tokens.shape == (2, 16, 32)
    assert np.isfinite(np.asarray(tokens)).all()


def test_point_tokenizer_feature_types():
    pts = jnp.asarray(np.random.default_rng(1).standard_normal((1, 32, 3), np.float32))
    for ft in ("dp", "fj", "df", "dp_fj", "dp_df"):
        cfg = point_tok.PointTokenizerConfig(
            sample_ratio=0.25, group_size=4, embed_dim=16, feature_type=ft
        )
        params = point_tok.init(cfg, jax.random.PRNGKey(0))
        _, tokens = point_tok.apply(params, pts, cfg)
        assert tokens.shape == (1, 8, 16), ft


def test_point_classifier_end_to_end():
    cfg = point_classifier.PointClassifierConfig(
        tokenizer=point_tok.PointTokenizerConfig(
            sample_ratio=0.25, group_size=8, embed_dim=32
        ),
        encoder=encoder.EncoderConfig(dim=32, depth=2, num_heads=4),
        num_classes=40,
    )
    params = point_classifier.init(cfg, jax.random.PRNGKey(0))
    pts = jnp.asarray(np.random.default_rng(0).standard_normal((2, 128, 3), np.float32))
    logits = point_classifier.forward(params, pts, cfg)
    assert logits.shape == (2, 40)
    assert np.isfinite(np.asarray(logits)).all()
    # grads flow to tokenizer through the frozen encoder
    def loss(tok_params):
        p = dict(params, tokenizer=tok_params)
        return jnp.sum(point_classifier.forward(p, pts, cfg) ** 2)

    g = jax.grad(loss)(params["tokenizer"])
    assert any(float(jnp.abs(v).max()) > 0 for v in g.values())


@pytest.mark.fast
def test_point_tokenizer_precision_knob():
    """cfg.precision='default' (bf16-multiply serving setting) must stay
    numerically close to the fp32 'highest' parity setting — the serving
    encoder consumes these tokens in bf16 anyway, so sub-1e-2 relative
    error is invisible downstream."""
    cfg_hi = point_tok.PointTokenizerConfig(
        sample_ratio=0.25, group_size=8, embed_dim=64
    )
    cfg_lo = dataclasses.replace(cfg_hi, precision="default")
    params = point_tok.init(cfg_hi, jax.random.PRNGKey(0))
    pts = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 256, 3), np.float32) * 0.5
    )
    _, tok_hi = point_tok.apply(params, pts, cfg_hi)
    _, tok_lo = point_tok.apply(params, pts, cfg_lo)
    denom = float(jnp.abs(tok_hi).max())
    rel = float(jnp.abs(tok_hi - tok_lo).max()) / max(denom, 1e-9)
    assert rel < 1e-2, rel

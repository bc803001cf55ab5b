"""3-NN interpolation, chamfer, EMD, point segmenter tests."""

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.core import encoder
from metatransformer_tpu.models import point_segmenter
from metatransformer_tpu.ops import point_interp
from metatransformer_tpu.tokenizers import point as point_tok


def test_three_interpolate_exact_at_known_points():
    rng = np.random.default_rng(0)
    known = jnp.asarray(rng.standard_normal((1, 16, 3), np.float32))
    feats = jnp.asarray(rng.standard_normal((1, 16, 5), np.float32))
    out = point_interp.three_interpolation(known, known, feats)
    # query == known point -> nearest dist ~0 dominates -> feature recovered
    np.testing.assert_allclose(np.asarray(out), np.asarray(feats), rtol=1e-3,
                               atol=1e-3)


def test_three_interpolate_weights():
    known = jnp.asarray([[[0.0, 0, 0], [1.0, 0, 0]]], jnp.float32)
    feats = jnp.asarray([[[0.0], [10.0]]], jnp.float32)
    # three_nn with only 2 known points duplicates; query midway
    query = jnp.asarray([[[0.5, 0, 0]]], jnp.float32)
    d2, idx = point_interp.three_nn(query, known)
    out = point_interp.three_interpolate(feats, idx, d2)
    # equal distances -> ~average of the two features (third nn duplicates)
    assert 3.0 < float(out[0, 0, 0]) < 7.0


def test_chamfer():
    a = jnp.asarray([[[0.0, 0, 0], [1, 0, 0]]], jnp.float32)
    b = jnp.asarray([[[0.0, 0, 0], [1, 0, 0]]], jnp.float32)
    d1, d2 = point_interp.chamfer_distance(a, b)
    assert float(d1[0]) == 0.0 and float(d2[0]) == 0.0
    c = jnp.asarray([[[0.0, 0, 0], [2, 0, 0]]], jnp.float32)
    loss = float(point_interp.chamfer_loss(a, c))
    # nearest dists: a->c: 0, 1 ; c->a: 0, 1 -> mean = 0.5 + 0.5
    assert abs(loss - 1.0) < 1e-5


def test_emd_identity_and_symmetry():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 32, 3), np.float32))
    same = float(point_interp.emd_loss(x, x))
    assert same < 0.05  # near-zero transport for identical clouds
    y = jnp.asarray(rng.standard_normal((2, 32, 3), np.float32))
    d_xy = float(point_interp.emd_loss(x, y))
    d_yx = float(point_interp.emd_loss(y, x))
    assert d_xy > same
    assert abs(d_xy - d_yx) < 0.05


def test_emd_orders_by_distance():
    """EMD must grow with a uniform shift of one cloud."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 16, 3), np.float32))
    near = x + 0.1
    far = x + 2.0
    assert float(point_interp.emd_loss(x, near)) < float(
        point_interp.emd_loss(x, far)
    )


def test_point_segmenter():
    cfg = point_segmenter.PointSegmenterConfig(
        tokenizer=point_tok.PointTokenizerConfig(
            sample_ratio=0.25, group_size=8, embed_dim=32
        ),
        encoder=encoder.EncoderConfig(dim=32, depth=2, num_heads=4),
        num_classes=13,
    )
    params = point_segmenter.init(cfg, jax.random.PRNGKey(0))
    pts = jnp.asarray(np.random.default_rng(0).standard_normal((2, 128, 3), np.float32))
    logits = point_segmenter.forward(params, pts, cfg)
    assert logits.shape == (2, 128, 13)
    assert np.isfinite(np.asarray(logits)).all()

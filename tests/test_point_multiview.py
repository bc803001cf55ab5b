"""MetaTransformer_MultiView: view rotation, ProjEnc rendering, fused
multi-view classification (reference metatransformer.py:469-760)."""

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.core import encoder
from metatransformer_tpu.models import point_multiview as mv


def _cfg():
    return mv.MultiViewConfig(
        num_views=2,
        proj=mv.ProjEncConfig(
            local_size=4, trans_dim=8, graph_dim=8, obj_size=24, img_size=32
        ),
        encoder=encoder.EncoderConfig(dim=32, depth=2, num_heads=4),
        patch_size=16,
        num_classes=7,
    )


def test_euler2mat_orthonormal():
    m = np.asarray(mv.euler2mat(jnp.asarray(mv.VIEWS[:10, 0])))
    for r in m:
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
        assert abs(np.linalg.det(r) - 1.0) < 1e-5


def test_point_transform_views_differ():
    pts = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 3), np.float32))
    out = mv.point_transform(pts, 4)
    assert out.shape == (8, 32, 3)
    views = np.asarray(out).reshape(2, 4, 32, 3)
    # different poses produce genuinely different clouds
    assert np.abs(views[0, 0] - views[0, 1]).max() > 0.1
    # rigid transform preserves pairwise distances
    d0 = np.linalg.norm(views[0, 0][0] - views[0, 0][1])
    d1 = np.linalg.norm(views[0, 1][0] - views[0, 1][1])
    assert abs(d0 - d1) < 1e-4


def test_proj_enc_renders_normalized_images():
    cfg = _cfg()
    params = mv.init(cfg, jax.random.PRNGKey(0))
    pts = jnp.asarray(np.random.default_rng(1).standard_normal((1, 64, 3), np.float32))
    pc = mv.point_transform(pts, cfg.num_views)
    imgs = mv.proj_enc(params, jnp.repeat(pts, cfg.num_views, 0), pc, cfg.proj)
    assert imgs.shape == (2, 32, 32, 3)
    arr = np.asarray(imgs)
    assert np.isfinite(arr).all()
    # sigmoid + ImageNet normalization bounds
    lo = (0.0 - mv.IMAGENET_MEAN) / mv.IMAGENET_STD
    hi = (1.0 - mv.IMAGENET_MEAN) / mv.IMAGENET_STD
    assert (arr >= lo - 1e-4).all() and (arr <= hi + 1e-4).all()
    # the two views render differently
    assert np.abs(arr[0] - arr[1]).max() > 1e-3


def test_multiview_forward_and_grads():
    cfg = _cfg()
    params = mv.init(cfg, jax.random.PRNGKey(2))
    pts = jnp.asarray(np.random.default_rng(3).standard_normal((2, 64, 3), np.float32))
    logits = mv.forward(params, pts, cfg)
    assert logits.shape == (2, 7)
    assert np.isfinite(np.asarray(logits)).all()

    def loss(p):
        return jnp.sum(mv.forward(p, pts, cfg) ** 2)

    g = jax.grad(loss)(params)
    # grads reach the renderer through the frozen encoder
    assert float(jnp.abs(g["input_trans"]["w"]).max()) > 0
    assert float(jnp.abs(g["img_layer"]["w"]).max()) > 0

"""Golden parity: JAX encoder + converter vs the torch oracle.

Mirrors the reference's own test style — optimized kernel vs reference
implementation with tight tolerances (SURVEY.md §4, e.g.
``Image/segmentation/ops/test.py:26-77``). Target ≤1e-3 logit error
(BASELINE.json); fp32 achieves ~1e-6 here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from metatransformer_tpu.core import convert, encoder

from . import torch_ref


def _small_cfg():
    return encoder.EncoderConfig(dim=64, depth=3, num_heads=4)


def _make_pair(cfg, seed=0):
    blocks = torch_ref.make_encoder(cfg.dim, cfg.depth, cfg.num_heads, seed)
    state = {k: v.detach().numpy() for k, v in blocks.state_dict().items()}
    params = convert.convert_state_dict(state)
    params = {k: jnp.asarray(v) for k, v in params.items()}
    return blocks, params


def test_convert_shapes():
    cfg = _small_cfg()
    _, params = _make_pair(cfg)
    shapes = encoder.param_shapes(cfg)
    assert set(params) == set(shapes)
    for name, shape in shapes.items():
        assert params[name].shape == (cfg.depth,) + shape, name


def test_encoder_matches_torch():
    cfg = _small_cfg()
    blocks, params = _make_pair(cfg)
    x = np.random.default_rng(1).standard_normal((2, 17, cfg.dim), dtype=np.float32)
    with torch.no_grad():
        want = blocks(torch.from_numpy(x)).numpy()
    got = np.asarray(encoder.encode(params, jnp.asarray(x), cfg))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_encoder_matches_torch_base_scale():
    """Full ViT-B16 geometry (12x768, heads=12), 197 tokens."""
    cfg = encoder.BASE
    blocks, params = _make_pair(cfg)
    x = np.random.default_rng(2).standard_normal((1, 197, cfg.dim), dtype=np.float32)
    with torch.no_grad():
        want = blocks(torch.from_numpy(x)).numpy()
    got = np.asarray(encoder.encode(params, jnp.asarray(x), cfg))
    err = np.max(np.abs(got - want))
    assert err <= 1e-3, f"max abs err {err}"


def test_masked_attention_matches_torch():
    cfg = _small_cfg()
    blocks, params = _make_pair(cfg)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 12, cfg.dim), dtype=np.float32)
    mask = np.ones((2, 12), bool)
    mask[0, 8:] = False
    mask[1, 5:] = False
    with torch.no_grad():
        h = torch.from_numpy(x)
        for blk in blocks:
            h = blk(h, torch.from_numpy(mask))
        want = h.numpy()
    got = np.asarray(encoder.encode(params, jnp.asarray(x), cfg, mask=jnp.asarray(mask)))
    # Only valid positions must match (padded slots are garbage by design).
    np.testing.assert_allclose(got[0, :8], want[0, :8], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got[1, :5], want[1, :5], rtol=1e-4, atol=1e-4)


def test_pos_each_block_semantics():
    """x = block(x + pos) at every layer (point-cloud backbone)."""
    cfg = _small_cfg()
    blocks, params = _make_pair(cfg)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 9, cfg.dim), dtype=np.float32)
    pos = rng.standard_normal((1, 9, cfg.dim), dtype=np.float32)
    with torch.no_grad():
        h = torch.from_numpy(x)
        tp = torch.from_numpy(pos)
        for blk in blocks:
            h = blk(h + tp)
        want = h.numpy()
    got = np.asarray(
        encoder.encode(
            params, jnp.asarray(x), cfg, pos=jnp.asarray(pos), pos_each_block=True
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_bf16_precision_close():
    cfg = _small_cfg()
    blocks, params = _make_pair(cfg)
    x = np.random.default_rng(5).standard_normal((2, 17, cfg.dim), dtype=np.float32)
    with torch.no_grad():
        want = blocks(torch.from_numpy(x)).numpy()
    got = np.asarray(
        encoder.encode(params, jnp.asarray(x), cfg, precision=encoder.BF16)
    ).astype(np.float32)
    assert np.max(np.abs(got - want)) < 0.15  # bf16 drift bound, not parity


def test_convert_rejects_unknown_keys():
    with pytest.raises(ValueError):
        convert.convert_state_dict({"0.bogus.weight": np.zeros((2, 2))})
    with pytest.raises(ValueError):
        convert.convert_state_dict({"not_a_layer": np.zeros((2, 2))})


def test_npz_roundtrip(tmp_path):
    cfg = encoder.BASE
    key = jax.random.PRNGKey(0)
    params = encoder.init(cfg, key)
    path = str(tmp_path / "enc.npz")
    convert.save_npz(path, params)
    loaded, inferred = convert.load_npz(path)
    assert inferred == cfg
    for k in params:
        np.testing.assert_array_equal(np.asarray(params[k]), np.asarray(loaded[k]))


def test_remat_matches_and_grads_equal():
    """jax.checkpoint path: identical outputs and gradients."""
    cfg = _small_cfg()
    _, params = _make_pair(cfg, seed=5)
    x = jnp.asarray(
        np.random.default_rng(6).standard_normal((2, 9, cfg.dim), np.float32)
    )
    out = encoder.encode(params, x, cfg)
    out_r = encoder.encode(params, x, cfg, remat=True)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out), rtol=1e-6,
                               atol=1e-6)

    def loss(xx, remat):
        return jnp.sum(encoder.encode(params, xx, cfg, remat=remat) ** 2)

    g = jax.grad(lambda xx: loss(xx, False))(x)
    g_r = jax.grad(lambda xx: loss(xx, True))(x)
    np.testing.assert_allclose(np.asarray(g_r), np.asarray(g), rtol=1e-4,
                               atol=1e-5)


def test_encoder_matches_torch_large_scale():
    """Full L14 geometry (24x1024, heads=16), 257 tokens — the
    reference's flagship 88.1% configuration
    (Image/README.md:19, Meta-Transformer_large_patch14_encoder.pth),
    recipe ``imagenet_large_metatransformer.yaml``."""
    cfg = encoder.LARGE
    blocks, params = _make_pair(cfg, seed=5)
    x = np.random.default_rng(6).standard_normal((1, 257, cfg.dim), dtype=np.float32)
    with torch.no_grad():
        want = blocks(torch.from_numpy(x)).numpy()
    got = np.asarray(encoder.encode(params, jnp.asarray(x), cfg))
    err = np.max(np.abs(got - want))
    assert err <= 1e-3, f"max abs err {err}"

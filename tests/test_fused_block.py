"""Fused attention sublayer (Pallas) vs XLA reference — kernel-test
pattern per SURVEY.md §4 (reference-vs-optimized + grad check, mirroring
``/root/reference/Image/segmentation/ops/test.py:26-100``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metatransformer_tpu.core import encoder
from metatransformer_tpu.ops import fused_block as fb


def _make(b, t, d, h, key=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(key), 8)
    x = jax.random.normal(ks[0], (b, t, d), dtype)
    lns = 1.0 + 0.1 * jax.random.normal(ks[1], (d,), jnp.float32)
    lnb = 0.1 * jax.random.normal(ks[2], (d,), jnp.float32)
    wqkv = 0.05 * jax.random.normal(ks[3], (d, 3 * d), jnp.float32)
    bqkv = 0.05 * jax.random.normal(ks[4], (3 * d,), jnp.float32)
    wp = 0.05 * jax.random.normal(ks[5], (d, d), jnp.float32)
    bp = 0.05 * jax.random.normal(ks[6], (d,), jnp.float32)
    return x, lns, lnb, wqkv, bqkv, wp, bp


@pytest.mark.parametrize("t", [17, 128, 197])
def test_fused_matches_reference(t):
    b, d, h = 2, 128, 2
    x, lns, lnb, wqkv, bqkv, wp, bp = _make(b, t, d, h)
    got = fb.attn_sublayer(x, lns, lnb, wqkv, bqkv, wp, bp, num_heads=h)
    bias = jnp.zeros((b, t), jnp.float32)
    want = fb._reference_sublayer(x, lns, lnb, wqkv, bqkv, wp, bp, bias, 1e-5, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_masked_matches_reference():
    b, t, d, h = 2, 50, 128, 2
    x, lns, lnb, wqkv, bqkv, wp, bp = _make(b, t, d, h, key=1)
    mask = np.ones((b, t), bool)
    mask[0, 37:] = False
    mask[1, 11:] = False
    got = fb.attn_sublayer(
        x, lns, lnb, wqkv, bqkv, wp, bp, mask=jnp.asarray(mask), num_heads=h
    )
    bias = jnp.where(jnp.asarray(mask), 0.0, fb.NEG_INF).astype(jnp.float32)
    want = fb._reference_sublayer(x, lns, lnb, wqkv, bqkv, wp, bp, bias, 1e-5, h)
    # compare only kept query rows (padded rows are don't-care)
    np.testing.assert_allclose(
        np.asarray(got)[mask], np.asarray(want)[mask], atol=2e-5
    )


def test_fused_grads_match_reference():
    b, t, d, h = 2, 33, 128, 2
    x, lns, lnb, wqkv, bqkv, wp, bp = _make(b, t, d, h, key=2)

    def loss_fused(x, wqkv, wp):
        return jnp.sum(
            fb.attn_sublayer(x, lns, lnb, wqkv, bqkv, wp, bp, num_heads=h) ** 2
        )

    def loss_ref(x, wqkv, wp):
        bias = jnp.zeros((b, t), jnp.float32)
        return jnp.sum(
            fb._reference_sublayer(x, lns, lnb, wqkv, bqkv, wp, bp, bias, 1e-5, h)
            ** 2
        )

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, wqkv, wp)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, wqkv, wp)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-3, atol=2e-3)


def test_fused_flash_bwd_matches_xla_bwd(monkeypatch):
    """MTT_FUSED_BWD=flash: the Pallas flash-recompute backward must give
    the same gradients as the materialized-XLA recompute backward."""
    b, t, d, h = 2, 33, 128, 2  # head_dim 64: flash-eligible
    x, lns, lnb, wqkv, bqkv, wp, bp = _make(b, t, d, h, key=3)
    mask = np.ones((b, t), bool)
    mask[1, 21:] = False

    def loss(x, wqkv, wp):
        out = fb.attn_sublayer(
            x, lns, lnb, wqkv, bqkv, wp, bp, mask=jnp.asarray(mask), num_heads=h
        )
        return jnp.sum(jnp.where(jnp.asarray(mask)[..., None], out, 0.0) ** 2)

    monkeypatch.setenv("MTT_FUSED_BWD", "xla")
    g_xla = jax.grad(loss, argnums=(0, 1, 2))(x, wqkv, wp)
    monkeypatch.setenv("MTT_FUSED_BWD", "flash")
    g_flash = jax.grad(loss, argnums=(0, 1, 2))(x, wqkv, wp)
    for a, b_ in zip(g_flash, g_xla):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-3, atol=2e-3
        )


@pytest.mark.parametrize("masked", [False, True])
def test_fused_pallas_bwd_matches_xla_twin(masked):
    """The Pallas backward kernel (default path) must produce the same
    cotangents — all seven — as the XLA recompute twin's VJP."""
    b, t, d, h = 4, 37, 128, 4
    x, lns, lnb, wqkv, bqkv, wp, bp = _make(b, t, d, h, key=9)
    if masked:
        keep = np.ones((b, t), bool)
        keep[0, 30:] = False
        keep[2, 11:] = False
        bias = jnp.where(jnp.asarray(keep), 0.0, fb.NEG_INF).astype(jnp.float32)
    else:
        bias = jnp.zeros((b, t), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(10), (b, t, d), jnp.float32)

    got = fb._bwd_via_kernel(
        x, lns, lnb, wqkv, bqkv, wp, bp, bias, g, 1e-5, h
    )
    _, vjp = jax.vjp(
        lambda *a: fb._reference_sublayer(*a, bias, 1e-5, h),
        x, lns, lnb, wqkv, bqkv, wp, bp,
    )
    want = vjp(g)
    names = ["dx", "dlns", "dlnb", "dwqkv", "dbqkv", "dwproj", "dbproj"]
    for nm, a, b_ in zip(names, got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4, err_msg=nm
        )


def test_fused_pallas_bwd_bf16():
    """bf16 serving dtype: kernel backward tracks the twin within bf16
    resolution and cotangent dtypes match the primals."""
    b, t, d, h = 2, 33, 128, 2
    x, lns, lnb, wqkv, bqkv, wp, bp = _make(b, t, d, h, key=11, dtype=jnp.bfloat16)
    wqkv, bqkv, wp, bp = (a.astype(jnp.bfloat16) for a in (wqkv, bqkv, wp, bp))
    bias = jnp.zeros((b, t), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(12), (b, t, d)).astype(jnp.bfloat16)
    got = fb._bwd_via_kernel(x, lns, lnb, wqkv, bqkv, wp, bp, bias, g, 1e-5, h)
    _, vjp = jax.vjp(
        lambda *a: fb._reference_sublayer(*a, bias, 1e-5, h),
        x, lns, lnb, wqkv, bqkv, wp, bp,
    )
    want = vjp(g)
    for a, b_, p in zip(got, want, (x, lns, lnb, wqkv, bqkv, wp, bp)):
        assert a.dtype == p.dtype
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_, np.float32),
            rtol=0.1, atol=0.1,
        )


def test_encoder_remat_save_grads_match():
    """EncoderConfig.remat='save' (selective-save policy) must not change
    gradients vs remat=False on the XLA path."""
    import dataclasses

    cfg0 = encoder.EncoderConfig(dim=128, depth=3, num_heads=4, attn_impl="xla")
    cfgs = dataclasses.replace(cfg0, remat="save")
    params = encoder.init(cfg0, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 9, 128))

    def loss(p, c):
        return jnp.sum(encoder.encode(p, x, c) ** 2)

    g0 = jax.grad(loss)(params, cfg0)
    g1 = jax.grad(loss)(params, cfgs)
    for a, b_ in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


@pytest.mark.parametrize("bt", [(2, 17), (1, 256), (3, 100)])
def test_fused_mlp_matches_reference(bt):
    b, t = bt
    d = 128
    ks = jax.random.split(jax.random.PRNGKey(5), 8)
    x = jax.random.normal(ks[0], (b, t, d), jnp.float32)
    lns = 1.0 + 0.1 * jax.random.normal(ks[1], (d,), jnp.float32)
    lnb = 0.1 * jax.random.normal(ks[2], (d,), jnp.float32)
    w1 = 0.05 * jax.random.normal(ks[3], (d, 4 * d), jnp.float32)
    b1 = 0.05 * jax.random.normal(ks[4], (4 * d,), jnp.float32)
    w2 = 0.05 * jax.random.normal(ks[5], (4 * d, d), jnp.float32)
    b2 = 0.05 * jax.random.normal(ks[6], (d,), jnp.float32)
    got = fb.mlp_sublayer(x, lns, lnb, w1, b1, w2, b2)
    want = fb._reference_mlp(x.reshape(b * t, d), lns, lnb, w1, b1, w2, b2, 1e-5)
    np.testing.assert_allclose(
        np.asarray(got).reshape(b * t, d), np.asarray(want), atol=2e-5
    )


def test_fused_mlp_grads_match_reference():
    b, t, d = 2, 33, 128
    ks = jax.random.split(jax.random.PRNGKey(6), 8)
    x = jax.random.normal(ks[0], (b * t, d), jnp.float32)
    lns = jnp.ones((d,), jnp.float32)
    lnb = jnp.zeros((d,), jnp.float32)
    w1 = 0.05 * jax.random.normal(ks[3], (d, 4 * d), jnp.float32)
    b1 = jnp.zeros((4 * d,), jnp.float32)
    w2 = 0.05 * jax.random.normal(ks[5], (4 * d, d), jnp.float32)
    b2 = jnp.zeros((d,), jnp.float32)

    gf = jax.grad(lambda x, w1, w2: jnp.sum(
        fb._fused_mlp(x, lns, lnb, w1, b1, w2, b2, 1e-5) ** 2
    ), argnums=(0, 1, 2))(x, w1, w2)
    gr = jax.grad(lambda x, w1, w2: jnp.sum(
        fb._reference_mlp(x, lns, lnb, w1, b1, w2, b2, 1e-5) ** 2
    ), argnums=(0, 1, 2))(x, w1, w2)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-3, atol=2e-3)


def test_encoder_fused_matches_xla_bf16():
    """Full encoder, attn_impl='fused' vs 'xla', bf16 serving policy."""
    cfg_x = encoder.EncoderConfig(dim=128, depth=2, num_heads=2, attn_impl="xla")
    cfg_f = encoder.EncoderConfig(dim=128, depth=2, num_heads=2, attn_impl="fused")
    params = encoder.init(cfg_x, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 197, 128), jnp.float32)
    out_x = encoder.encode(params, x, cfg_x, precision=encoder.BF16)
    out_f = encoder.encode(params, x, cfg_f, precision=encoder.BF16)
    np.testing.assert_allclose(
        np.asarray(out_x, np.float32), np.asarray(out_f, np.float32),
        atol=0.15, rtol=0.1,
    )


def test_auto_resolves_fused_only_for_bf16_short():
    cfg = encoder.EncoderConfig(dim=128, depth=1, num_heads=2, attn_impl="auto")
    assert encoder._resolve_impl(cfg, 197, encoder.BF16) == "fused"
    assert encoder._resolve_impl(cfg, 197, encoder.FP32) == "xla"
    assert encoder._resolve_impl(cfg, 1568, encoder.BF16) == "flash"
    # graph heads: head_dim 24 unsupported -> xla
    g = encoder.EncoderConfig(dim=768, depth=1, num_heads=32, attn_impl="auto")
    assert encoder._resolve_impl(g, 197, encoder.BF16) == "xla"

"""Pallas flash attention vs XLA reference — the kernel-test pattern the
reference uses for its CUDA ops (CUDA-vs-PyTorch-fallback + gradcheck,
``Image/segmentation/ops/test.py``), here Pallas-vs-jnp + jax.grad.
Runs in Pallas interpret mode on CPU (conftest forces the cpu platform);
the compiled path is exercised on real TPU by bench/verify drives.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metatransformer_tpu.ops import flash_attention as fa


def _rand_qkv(rng, b, t, h, d, dtype=np.float32):
    mk = lambda: jnp.asarray(rng.standard_normal((b, t, h, d)).astype(dtype))
    return mk(), mk(), mk()


@pytest.mark.parametrize("t", [8, 197, 256])
def test_flash_matches_reference(t):
    rng = np.random.default_rng(0)
    q, k, v = _rand_qkv(rng, 2, t, 2, 64)
    scale = 64**-0.5
    want = np.asarray(
        fa._reference_attention(q, k, v, jnp.zeros((2, t), jnp.float32), scale)
    )
    got = np.asarray(fa.flash_attention(q, k, v))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_flash_masked_matches_reference():
    rng = np.random.default_rng(1)
    t = 64
    q, k, v = _rand_qkv(rng, 2, t, 2, 64)
    mask = np.ones((2, t), bool)
    mask[0, 40:] = False
    mask[1, 10:] = False
    scale = 64**-0.5
    bias = jnp.where(jnp.asarray(mask), 0.0, fa.NEG_INF).astype(jnp.float32)
    want = np.asarray(fa._reference_attention(q, k, v, bias, scale))
    got = np.asarray(fa.flash_attention(q, k, v, mask=jnp.asarray(mask)))
    np.testing.assert_allclose(got[0, :40], want[0, :40], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(got[1, :10], want[1, :10], rtol=2e-3, atol=2e-3)


def test_flash_grads_match_reference():
    rng = np.random.default_rng(2)
    t = 32
    q, k, v = _rand_qkv(rng, 1, t, 2, 32)
    scale = 32**-0.5
    bias = jnp.zeros((1, t), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(fa._reference_attention(q, k, v, bias, scale) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("t", [300, 520])
def test_flash_grads_multiblock_masked(t):
    """Pallas backward across several K/Q blocks, with a ragged mask."""
    rng = np.random.default_rng(7)
    q, k, v = _rand_qkv(rng, 2, t, 1, 64)
    mask = np.ones((2, t), bool)
    mask[0, t - 37 :] = False
    scale = 64**-0.5
    bias = jnp.where(jnp.asarray(mask), 0.0, fa.NEG_INF).astype(jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, mask=jnp.asarray(mask)) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(fa._reference_attention(q, k, v, bias, scale) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    keep = np.asarray(mask)
    for a, b in zip(gf, gr):
        a, b = np.asarray(a), np.asarray(b)
        # masked-out key/query positions carry no useful gradient
        np.testing.assert_allclose(a[keep], b[keep], rtol=2e-3, atol=2e-3)


def test_flash_backward_no_quadratic_buffer():
    """The jaxpr of the backward must not contain a [T, T]-sized tensor."""
    t = 1568
    q = jnp.zeros((1, t, 2, 64), jnp.bfloat16)

    def loss(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v).astype(jnp.float32))

    jaxpr = jax.make_jaxpr(jax.grad(loss, argnums=(0, 1, 2)))(q, q, q)
    tp = 1664  # padded T
    for eqn in jaxpr.jaxpr.eqns:
        for var in eqn.outvars:
            shape = getattr(var.aval, "shape", ())
            assert not (
                len(shape) >= 2 and shape[-1] >= tp and shape[-2] >= tp
            ), f"quadratic buffer {shape} in backward"


def test_flash_bf16():
    rng = np.random.default_rng(3)
    q, k, v = _rand_qkv(rng, 1, 128, 4, 64)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    want = np.asarray(
        fa._reference_attention(q, k, v, jnp.zeros((1, 128), jnp.float32), 64**-0.5)
    )
    got = np.asarray(fa.flash_attention(qb, kb, vb)).astype(np.float32)
    assert np.max(np.abs(got - want)) < 0.05


def test_encoder_with_flash_matches_xla():
    """Full encoder with attn_impl='flash' vs 'xla'."""
    from metatransformer_tpu.core import encoder

    cfg_x = encoder.EncoderConfig(dim=64, depth=2, num_heads=2, attn_impl="xla")
    cfg_f = encoder.EncoderConfig(dim=64, depth=2, num_heads=2, attn_impl="flash")
    params = encoder.init(cfg_x, jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(4).standard_normal((2, 197, 64), np.float32)
    )
    want = np.asarray(encoder.encode(params, x, cfg_x))
    got = np.asarray(encoder.encode(params, x, cfg_f))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

"""Windowed attention + hyper-spectral data prep."""

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.data import hyper_prep
from metatransformer_tpu.ops import window_attention as wa


def test_window_partition_roundtrip():
    x = jnp.asarray(np.arange(2 * 16 * 3, dtype=np.float32).reshape(2, 16, 3))
    parts = wa.window_partition(x, 4, 4, 2)
    assert parts.shape == (2 * 4, 4, 3)
    back = wa.window_unpartition(parts, 2, 4, 4, 2)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_windowed_attention_locality():
    """Tokens only mix within their window."""
    x = jnp.zeros((1, 16, 4))
    x = x.at[0, 0].set(1.0)  # impulse in window (0,0)

    def mean_mix(tokens):  # stand-in attention: every token = window mean
        return jnp.broadcast_to(
            jnp.mean(tokens, axis=1, keepdims=True), tokens.shape
        )

    out = np.asarray(wa.windowed_attention(x, mean_mix, 4, 4, 2))
    # window containing token (0,0) covers grid cells (0,0),(0,1),(1,0),(1,1)
    # = flat indices 0,1,4,5
    hot = {0, 1, 4, 5}
    for i in range(16):
        if i in hot:
            assert out[0, i, 0] > 0
        else:
            assert out[0, i, 0] == 0


def test_hyper_prep_shapes_and_center_band():
    rng = np.random.default_rng(0)
    cube = rng.standard_normal((10, 12, 8)).astype(np.float32)
    points = np.asarray([[0, 0], [5, 6], [9, 11]])
    feats = hyper_prep.prepare_pixels(cube, points, patch=5, band_patch=3)
    assert feats.shape == (3, 8, 3 * 25)
    # center view of token b must contain band b's spatial patch
    padded = hyper_prep.mirror_pad(cube, 5)
    patch0 = padded[5 : 10, 6 : 11, :]  # around point (5, 6)
    center = feats[1, 2, 25:50]  # token band=2, middle band view
    np.testing.assert_allclose(center, patch0[:, :, 2].reshape(-1), rtol=1e-6)


def test_mirror_pad_reflects():
    cube = np.arange(12, dtype=np.float32).reshape(3, 4, 1)
    padded = hyper_prep.mirror_pad(cube, 3)
    assert padded.shape == (5, 6, 1)
    np.testing.assert_array_equal(padded[0, 1:5, 0], cube[1, :, 0])  # reflect

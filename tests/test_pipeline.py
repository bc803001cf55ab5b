"""Multimodal serving pipeline: Data2Seq facade, fuse-then-encode,
bucketed serving — the README.md:113-150 path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metatransformer_tpu import pipeline
from metatransformer_tpu.core import encoder
from metatransformer_tpu.tokenizers import image as image_tok
from metatransformer_tpu.tokenizers import time_series as ts_tok
from metatransformer_tpu.tokenizers import video as video_tok


def test_data2seq_dispatcher_covers_all_modalities():
    assert set(pipeline.MODALITIES) == {
        "image", "infrared", "x-ray", "video", "audio", "time-series", "imu",
        "tabular", "hyper", "graph", "text", "point",
    }
    with pytest.raises(ValueError):
        pipeline.Data2Seq("hologram")


def test_readme_demo_path():
    """video + audio + time-series tokenized, concatenated, encoded."""
    dim = 32
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)

    video = pipeline.Data2Seq(
        "video", dim,
        config=video_tok.VideoTokenizerConfig(
            num_frames=4, img_size=16, patch_size=8, tubelet_size=2, dim=dim
        ),
    )
    ts = pipeline.Data2Seq(
        "time-series", dim, config=ts_tok.TimeSeriesConfig(c_in=2, dim=dim)
    )
    image = pipeline.Data2Seq(
        "image", dim,
        config=image_tok.ImageTokenizerConfig(img_size=16, patch_size=8, dim=dim),
    )
    kv, kt, ki, ke = jax.random.split(key, 4)
    vtoks = video(video.init(kv), jnp.asarray(rng.standard_normal((2, 4, 16, 16, 3), np.float32)))
    ttoks = ts(ts.init(kt), jnp.asarray(rng.standard_normal((2, 10, 2), np.float32)))
    itoks = image(image.init(ki), jnp.asarray(rng.standard_normal((2, 16, 16, 3), np.float32)))
    assert vtoks.shape == (2, 8, dim)
    assert ttoks.shape == (2, 10, dim)
    assert itoks.shape == (2, 4, dim)

    ecfg = encoder.EncoderConfig(dim=dim, depth=2, num_heads=4)
    eparams = encoder.init(ecfg, ke)
    fused = pipeline.fuse_and_encode(eparams, [vtoks, ttoks, itoks], ecfg)
    assert fused.shape == (2, 22, dim)
    assert np.isfinite(np.asarray(fused)).all()


def test_bucketing():
    assert pipeline.bucket_length(50) == 64
    assert pipeline.bucket_length(197) == 256
    assert pipeline.bucket_length(1568) == 1600
    with pytest.raises(ValueError):
        pipeline.bucket_length(5000)


def test_bucketed_encode_matches_unpadded():
    """Padding to a bucket must not change valid outputs (mask-correct)."""
    dim = 32
    ecfg = encoder.EncoderConfig(dim=dim, depth=2, num_heads=4)
    eparams = encoder.init(ecfg, jax.random.PRNGKey(0))
    tokens = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 50, dim), np.float32)
    )
    padded, mask = pipeline.pad_to_bucket(tokens)
    assert padded.shape == (2, 64, dim)
    out_b = pipeline.encode_bucketed(eparams, padded, mask, ecfg, encoder.FP32)
    out_u = encoder.encode(eparams, tokens, ecfg)
    np.testing.assert_allclose(
        np.asarray(out_b)[:, :50], np.asarray(out_u), rtol=1e-4, atol=1e-5
    )

"""uint8 pixel ingestion: scaled to [0,1] on device (4x smaller
host->device payload for the ingress-bound serving path)."""

import numpy as np
import jax
import jax.numpy as jnp

from metatransformer_tpu import pipeline, serving
from metatransformer_tpu.core import encoder as enc
from metatransformer_tpu.tokenizers import image as image_tok
from metatransformer_tpu.tokenizers import video as video_tok


def test_image_uint8_matches_scaled_float():
    cfg = image_tok.ImageTokenizerConfig(img_size=32, patch_size=16, dim=64)
    params = image_tok.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    t_u8 = image_tok.apply(params, jnp.asarray(u8), cfg)
    t_f32 = image_tok.apply(params, jnp.asarray(u8, jnp.float32) / 255.0, cfg)
    np.testing.assert_allclose(np.asarray(t_u8), np.asarray(t_f32), atol=1e-5)


def test_video_uint8_matches_scaled_float():
    cfg = video_tok.VideoTokenizerConfig(
        img_size=32, patch_size=16, num_frames=4, tubelet_size=2, dim=64
    )
    params = video_tok.init(cfg, jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    u8 = rng.integers(0, 256, (2, 4, 32, 32, 3), dtype=np.uint8)
    t_u8 = video_tok.apply(params, jnp.asarray(u8), cfg)
    t_f32 = video_tok.apply(params, jnp.asarray(u8, jnp.float32) / 255.0, cfg)
    np.testing.assert_allclose(np.asarray(t_u8), np.asarray(t_f32), atol=1e-5)


def test_dispatcher_serves_uint8_and_float_identically():
    ecfg = enc.EncoderConfig(dim=32, depth=1, num_heads=2)
    key = jax.random.PRNGKey(2)
    tok = pipeline.Data2Seq(
        "image",
        dim=32,
        config=image_tok.ImageTokenizerConfig(img_size=32, patch_size=16, dim=32),
    )
    tok_params = tok.init(key)
    enc_params = enc.init(ecfg, jax.random.PRNGKey(3))
    disp = serving.Dispatcher(
        {"image": (tok, tok_params)},
        enc_params,
        serving.ServingConfig(
            encoder=ecfg, precision=enc.FP32, fused=True, pool="mean"
        ),
    )
    rng = np.random.default_rng(2)
    u8 = rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8)
    f32 = (u8.astype(np.float32) / 255.0)
    out = disp.serve(
        [
            serving.Request("image", u8),
            serving.Request("image", f32),
        ]
    )
    np.testing.assert_allclose(out[0], out[1], atol=1e-5)

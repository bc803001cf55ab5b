"""Multimodal fusion classifier (README.md:113-150 joint-training
surface): fused forward == manual per-modality tokenize + concat +
shared encode; recipe trains and the loss moves."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu import pipeline
from metatransformer_tpu.core import encoder as enc
from metatransformer_tpu.models import multimodal_classifier as mm
from metatransformer_tpu.tokenizers import (
    audio as audio_tok,
    time_series as ts_tok,
    video as video_tok,
)


def _tiny_cfg(num_classes=5):
    ecfg = enc.EncoderConfig(dim=32, depth=2, num_heads=2)
    return mm.MultimodalClassifierConfig(
        tokenizers=(
            video_tok.VideoTokenizerConfig(num_frames=4, img_size=32, dim=32),
            audio_tok.AudioTokenizerConfig(num_mel_bins=32, num_frames=32, dim=32),
            ts_tok.TimeSeriesConfig(c_in=3, dim=32),
        ),
        encoder=ecfg,
        num_classes=num_classes,
    )


def _inputs(rng, b=2):
    return {
        "video": jnp.asarray(rng.standard_normal((b, 4, 32, 32, 3)), jnp.float32),
        "audio": jnp.asarray(rng.standard_normal((b, 32, 32)), jnp.float32),
        "time-series": jnp.asarray(rng.standard_normal((b, 24, 3)), jnp.float32),
    }


def test_forward_matches_manual_fusion():
    cfg = _tiny_cfg()
    params = mm.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = _inputs(rng)

    logits = mm.forward(params, x, cfg)
    assert logits.shape == (2, 5)

    # oracle: tokenize each modality with its facade, concat, encode, pool
    facades = cfg.facades()
    groups = [
        facades[m](params["tok"][m], x[m]) for m in cfg.modalities
    ]
    # the demo's torch.concat(..., dim=1)
    fused = jnp.concatenate(groups, axis=1)
    feats = enc.encode(params["encoder"], fused, cfg.encoder)
    want = feats.astype(jnp.float32).mean(axis=1) @ params["head"]["w"] + params["head"]["b"]
    np.testing.assert_allclose(np.asarray(logits), np.asarray(want), atol=1e-5)

    # token budget: video tubelets + audio patches + ts steps
    vt = (4 // 2) * (32 // 16) ** 2
    assert fused.shape[1] == groups[0].shape[1] + groups[1].shape[1] + groups[2].shape[1]
    assert groups[0].shape[1] == vt


def test_multimodal_overfits_one_batch():
    import optax

    from metatransformer_tpu.train import step as step_lib

    cfg = _tiny_cfg(num_classes=3)
    params = mm.init(cfg, jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    batch = {
        "input": _inputs(rng, b=4),
        "label": jnp.asarray([0, 1, 2, 0]),
    }
    trainable, frozen = step_lib.split_params(params)
    assert "encoder" in frozen  # frozen-encoder recipe, like every release
    optimizer = optax.adam(3e-3)
    opt_state = optimizer.init(trainable)
    step = jax.jit(
        step_lib.make_train_step(
            lambda p, x, r: mm.forward(p, x, cfg), optimizer
        )
    )
    losses = []
    for _ in range(30):
        trainable, opt_state, metrics = step(
            trainable, frozen, opt_state, batch, jax.random.PRNGKey(0)
        )
        losses.append(float(metrics["loss"]))
    assert losses[-1] < 0.3 * losses[0], losses[::10]

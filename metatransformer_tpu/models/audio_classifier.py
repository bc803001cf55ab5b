"""Audio classifier (AST-on-Meta-Transformer), waveform -> logits.

Reference: ``Audio/src/models/ast_models.py:35-167``. Faithfulness note:
the reference forward computes cls/dist tokens but never concatenates
them (dead code at :153-155) — the effective model is
``patch_embed -> +pos -> 12 frozen blocks -> LN -> (x[:,0]+x[:,1])/2 ->
mlp_head``, i.e. it averages the first two PATCH tokens. We reproduce
that exactly (pool="first2_avg"); set ``pool="cls_dist_avg_fixed"`` for
the evidently intended cls+dist variant.

TPU-native: the kaldi fbank DSP (done on CPU in dataloader workers in the
reference) is fused into the same XLA program via ops.fbank.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from metatransformer_tpu.core import encoder as enc
from metatransformer_tpu.heads import cls as cls_head
from metatransformer_tpu.ops import fbank as fbank_op
from metatransformer_tpu.tokenizers import audio as audio_tok


@dataclasses.dataclass(frozen=True)
class AudioClassifierConfig:
    tokenizer: audio_tok.AudioTokenizerConfig = audio_tok.AudioTokenizerConfig()
    fbank: fbank_op.FbankConfig = fbank_op.FbankConfig()
    encoder: enc.EncoderConfig = enc.BASE
    num_classes: int = 35  # Speech Commands V2
    pool: str = "first2_avg"  # reference-exact; or "cls_dist_avg_fixed"
    ln_eps: float = 1e-6  # timm v.norm

    @property
    def head(self) -> cls_head.ClsHeadConfig:
        return cls_head.ClsHeadConfig(
            in_dim=self.encoder.dim, num_classes=self.num_classes
        )


def adapt_pos_embed(
    pos_embed: jax.Array,  # [1, n_prefix + f0*t0, D]
    old_grid: tuple,  # (f0, t0) — AudioSet AST: (12, 101)
    new_grid: tuple,  # (f1, t1) for the target fstride/tstride geometry
    n_prefix: int = 2,  # cls + dist tokens
) -> jax.Array:
    """Adapt an (AudioSet-)pretrained AST positional embedding to a new
    time-frequency patch grid (``Audio/src/models/ast_models.py:98-135``):
    smaller target grids take a CENTER CUT of the source grid, larger ones
    bilinearly interpolate — time axis first, then frequency, exactly the
    reference's order. Returns [1, n_prefix + f1*t1, D]."""
    f0, t0 = old_grid
    f1, t1 = new_grid
    prefix = pos_embed[:, :n_prefix]
    d = pos_embed.shape[-1]
    grid = pos_embed[:, n_prefix:].reshape(1, f0, t0, d)
    if t1 < t0:
        start = t0 // 2 - t1 // 2
        grid = grid[:, :, start : start + t1]
    elif t1 > t0:
        grid = jax.image.resize(grid, (1, f0, t1, d), method="bilinear")
    if f1 < f0:
        start = f0 // 2 - f1 // 2
        grid = grid[:, start : start + f1]
    elif f1 > f0:
        grid = jax.image.resize(grid, (1, f1, t1, d), method="bilinear")
    return jnp.concatenate([prefix, grid.reshape(1, f1 * t1, d)], axis=1)


def init(cfg: AudioClassifierConfig, key: jax.Array) -> Dict[str, Any]:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    params: Dict[str, Any] = {
        "tokenizer": audio_tok.init(cfg.tokenizer, k1),
        "encoder": enc.init(cfg.encoder, k2),
        "pos_embed": jax.random.normal(
            k3, (1, cfg.tokenizer.num_patches, cfg.encoder.dim)
        )
        * 0.02,
        "norm_scale": jnp.ones((cfg.encoder.dim,), jnp.float32),
        "norm_bias": jnp.zeros((cfg.encoder.dim,), jnp.float32),
        "head": cls_head.init(cfg.head, k4),
    }
    if cfg.pool == "cls_dist_avg_fixed":
        params["prefix_tokens"] = jnp.zeros((1, 2, cfg.encoder.dim), jnp.float32)
    return params


@functools.partial(jax.jit, static_argnames=("cfg", "precision"))
def forward_spectrogram(
    params: Dict[str, Any],
    spectrogram: jax.Array,  # [B, T, F]
    cfg: AudioClassifierConfig,
    precision: enc.Precision = enc.FP32,
) -> jax.Array:
    tokens = audio_tok.apply(params["tokenizer"], spectrogram, cfg.tokenizer,
                             mm=precision.mm)
    tokens = tokens + params["pos_embed"].astype(tokens.dtype)
    if cfg.pool == "cls_dist_avg_fixed":
        b = tokens.shape[0]
        prefix = jnp.broadcast_to(
            params["prefix_tokens"].astype(tokens.dtype), (b, 2, cfg.encoder.dim)
        )
        tokens = jnp.concatenate([prefix, tokens], axis=1)
    x = enc.encode(params["encoder"], tokens, cfg.encoder, precision=precision)
    x = enc.layer_norm(x, params["norm_scale"], params["norm_bias"], cfg.ln_eps)
    feats = (x[:, 0, :] + x[:, 1, :]) / 2.0
    return cls_head.apply(params["head"], feats, cfg.head, mm=precision.mm)


# Uniform model API alias (registry convention: every model has forward).
forward = forward_spectrogram


@functools.partial(jax.jit, static_argnames=("cfg", "precision"))
def forward_waveform(
    params: Dict[str, Any],
    waveform: jax.Array,  # [B, num_samples]
    cfg: AudioClassifierConfig,
    precision: enc.Precision = enc.FP32,
) -> jax.Array:
    """Raw waveform -> logits in ONE XLA program (fbank fused in).

    Mean subtraction before fbank mirrors ``Data2Seq.py:40-41``.
    """
    wav = waveform - jnp.mean(waveform, axis=-1, keepdims=True)
    spec = fbank_op.fbank(wav, cfg.fbank)  # [B, frames, mel]
    return forward_spectrogram(params, spec, cfg, precision)

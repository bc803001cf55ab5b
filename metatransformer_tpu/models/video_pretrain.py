"""Video masked-autoencoder pretraining (VideoMAE V2 parity).

Reference: ``Video/models/modeling_pretrain.py`` (encoder-decoder MAE)
+ ``Video/dataset/masking_generator.py`` (tube masking: one spatial mask
shared by all frames). The encoder sees only visible tokens; a light
decoder reconstructs per-patch-normalized pixels at masked positions
(MSE on masked patches only).

TPU-native: masking is an argsort-of-noise permutation with a STATIC
visible count, so gathers are fixed-shape and the whole pretrain step is
one XLA program.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from metatransformer_tpu.core import encoder as enc
from metatransformer_tpu.tokenizers import video as video_tok


@dataclasses.dataclass(frozen=True)
class VideoMAEConfig:
    tokenizer: video_tok.VideoTokenizerConfig = video_tok.VideoTokenizerConfig()
    encoder: enc.EncoderConfig = enc.BASE
    decoder: enc.EncoderConfig = enc.EncoderConfig(dim=384, depth=4, num_heads=6)
    mask_ratio: float = 0.9  # VideoMAE default tube-mask ratio

    @property
    def num_tokens(self) -> int:
        return self.tokenizer.num_patches

    @property
    def num_visible(self) -> int:
        return self.num_tokens - int(self.num_tokens * self.mask_ratio)


def tube_mask(rng: jax.Array, cfg: VideoMAEConfig, batch: int):
    """Tube masking: ONE spatial mask shared across all temporal slices
    (masking_generator.py semantics). Returns (visible_idx [B, Nv],
    masked_idx [B, Nm]) as indices into the [T'*H'*W'] token sequence."""
    t = cfg.tokenizer.t_patches
    spatial = cfg.tokenizer.grid * cfg.tokenizer.grid
    n_vis_spatial = cfg.num_visible // t
    noise = jax.random.uniform(rng, (batch, spatial))
    order = jnp.argsort(noise, axis=-1)  # random spatial permutation
    vis_sp = order[:, :n_vis_spatial]  # [B, Vs]
    mask_sp = order[:, n_vis_spatial:]
    offs = (jnp.arange(t) * spatial)[None, :, None]  # [1, T, 1]
    visible = (vis_sp[:, None, :] + offs).reshape(batch, -1)
    masked = (mask_sp[:, None, :] + offs).reshape(batch, -1)
    return visible, masked


def init(cfg: VideoMAEConfig, key: jax.Array) -> Dict[str, Any]:
    keys = jax.random.split(key, 6)
    d, dd = cfg.encoder.dim, cfg.decoder.dim
    patch_dim = cfg.tokenizer.patch_dim
    return {
        "tokenizer": video_tok.init(cfg.tokenizer, keys[0]),
        "encoder": enc.init(cfg.encoder, keys[1]),
        "enc_norm_scale": jnp.ones((d,)), "enc_norm_bias": jnp.zeros((d,)),
        "enc_to_dec_w": jax.random.normal(keys[2], (d, dd)) * d**-0.5,
        "enc_to_dec_b": jnp.zeros((dd,)),
        "mask_token": jax.random.normal(keys[3], (1, 1, dd)) * 0.02,
        "decoder": enc.init(cfg.decoder, keys[4]),
        "dec_norm_scale": jnp.ones((dd,)), "dec_norm_bias": jnp.zeros((dd,)),
        "head_w": jax.random.normal(keys[5], (dd, patch_dim)) * dd**-0.5,
        "head_b": jnp.zeros((patch_dim,)),
    }


def _gather_tokens(tokens: jax.Array, idx: jax.Array) -> jax.Array:
    return jnp.take_along_axis(tokens, idx[..., None], axis=1)


@functools.partial(jax.jit, static_argnames=("cfg", "precision"))
def forward_loss(
    params: Dict[str, Any],
    clips: jax.Array,  # [B, T, H, W, C]
    rng: jax.Array,
    cfg: VideoMAEConfig,
    precision: enc.Precision = enc.FP32,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """One pretrain forward: returns (loss, aux)."""
    b = clips.shape[0]
    mm = precision.mm
    visible, masked = tube_mask(rng, cfg, b)

    tokens = video_tok.apply(params["tokenizer"], clips, cfg.tokenizer, mm=mm)
    pos = jnp.asarray(
        video_tok.sincos_pos_embed(cfg.encoder.dim, cfg.num_tokens)
    ).astype(tokens.dtype)
    tokens = tokens + pos
    vis_tokens = _gather_tokens(tokens, visible)  # [B, Nv, D]

    x = enc.encode(params["encoder"], vis_tokens, cfg.encoder, precision=precision)
    x = enc.layer_norm(x, params["enc_norm_scale"], params["enc_norm_bias"], 1e-6)
    x = jnp.dot(x, params["enc_to_dec_w"], precision=mm) + params["enc_to_dec_b"]

    # decoder sequence: visible (projected) + mask tokens, each + dec pos
    dec_pos = jnp.asarray(
        video_tok.sincos_pos_embed(cfg.decoder.dim, cfg.num_tokens)
    ).astype(x.dtype)
    dec_pos = jnp.broadcast_to(dec_pos, (b, cfg.num_tokens, cfg.decoder.dim))
    pos_vis = _gather_tokens(dec_pos, visible)
    pos_mask = _gather_tokens(dec_pos, masked)
    nm = masked.shape[1]
    mask_tok = jnp.broadcast_to(
        params["mask_token"].astype(x.dtype), (b, nm, cfg.decoder.dim)
    )
    dec_in = jnp.concatenate([x + pos_vis, mask_tok + pos_mask], axis=1)
    y = enc.encode(params["decoder"], dec_in, cfg.decoder, precision=precision)
    y = enc.layer_norm(y, params["dec_norm_scale"], params["dec_norm_bias"], 1e-6)
    pred = (
        jnp.dot(y[:, -nm:], params["head_w"], precision=mm) + params["head_b"]
    )  # [B, Nm, patch_dim]

    # targets: per-patch-normalized raw pixels at masked positions
    patches = video_tok.tubelets(
        clips, cfg.tokenizer.tubelet_size, cfg.tokenizer.patch_size
    )  # [B, N, patch_dim]
    target = _gather_tokens(patches, masked)
    mean = jnp.mean(target, -1, keepdims=True)
    std = jnp.std(target, -1, keepdims=True)
    target = (target - mean) / jnp.maximum(std, 1e-6)

    loss = jnp.mean(jnp.square(pred.astype(jnp.float32) - target))
    return loss, {"pred": pred, "masked_idx": masked}

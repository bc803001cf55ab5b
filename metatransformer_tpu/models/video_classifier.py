"""Video classifier (VideoMAE-V2-on-Meta-Transformer), clip -> logits.

Reference: ``Video/models/modeling_finetune.py`` + frozen Meta-T encoder
loaded into ``model.blocks`` (``Video/run_class_finetuning.py:673-674``).
Semantics: tubelet embed, sinusoidal or learned pos, joint space-time
attention blocks, mean-pool over tokens + fc_norm, linear head
(use_mean_pooling=True default).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from metatransformer_tpu.core import encoder as enc
from metatransformer_tpu.heads import cls as cls_head
from metatransformer_tpu.tokenizers import video as video_tok


@dataclasses.dataclass(frozen=True)
class VideoClassifierConfig:
    tokenizer: video_tok.VideoTokenizerConfig = video_tok.VideoTokenizerConfig()
    encoder: enc.EncoderConfig = enc.BASE
    num_classes: int = 400  # Kinetics-400
    pos_embed: str = "sincos"  # "sincos" | "learned"
    ln_eps: float = 1e-6

    @property
    def head(self) -> cls_head.ClsHeadConfig:
        return cls_head.ClsHeadConfig(
            in_dim=self.encoder.dim, num_classes=self.num_classes
        )


def init(cfg: VideoClassifierConfig, key: jax.Array) -> Dict[str, Any]:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    params: Dict[str, Any] = {
        "tokenizer": video_tok.init(cfg.tokenizer, k1),
        "encoder": enc.init(cfg.encoder, k2),
        # fc_norm (mean-pooling norm), VideoMAE use_mean_pooling=True
        "fc_norm_scale": jnp.ones((cfg.encoder.dim,), jnp.float32),
        "fc_norm_bias": jnp.zeros((cfg.encoder.dim,), jnp.float32),
        "head": cls_head.init(cfg.head, k4),
    }
    if cfg.pos_embed == "learned":
        params["pos_embed"] = (
            jax.random.normal(k3, (1, cfg.tokenizer.num_patches, cfg.encoder.dim))
            * 0.02
        )
    return params


@functools.partial(jax.jit, static_argnames=("cfg", "precision"))
def forward(
    params: Dict[str, Any],
    clips: jax.Array,  # [B, T, H, W, C]
    cfg: VideoClassifierConfig,
    precision: enc.Precision = enc.FP32,
) -> jax.Array:
    tokens = video_tok.apply(params["tokenizer"], clips, cfg.tokenizer, mm=precision.mm)
    if cfg.pos_embed == "learned":
        pos = params["pos_embed"]
    else:
        pos = jnp.asarray(
            video_tok.sincos_pos_embed(cfg.encoder.dim, cfg.tokenizer.num_patches)
        )
    tokens = tokens + pos.astype(tokens.dtype)
    x = enc.encode(params["encoder"], tokens, cfg.encoder, precision=precision)
    feats = jnp.mean(x, axis=1)
    feats = enc.layer_norm(
        feats, params["fc_norm_scale"], params["fc_norm_bias"], cfg.ln_eps
    )
    return cls_head.apply(params["head"], feats, cfg.head, mm=precision.mm)

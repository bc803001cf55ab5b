"""Multimodal fusion classifier: the published Meta-Transformer usage
pattern as a trainable product surface.

Reference (``/root/reference/README.md:113-150``): build per-modality
``Data2Seq`` tokenizers (the demo uses video + audio + time-series),
``torch.concat`` their token sequences along the sequence axis, and run
the shared frozen encoder over the fused sequence (the repo's
"Multimodal Joint Training" ToDo row). This module trains that exact
assembly end-to-end: per-modality tokenizers -> ``pipeline.fuse_and_encode``
-> masked mean pool -> linear head; the encoder stays frozen via the
standard ``train.step`` FROZEN_KEYS split.

TPU-native: the whole fused forward is one XLA program (each tokenizer
is an inlined jittable transform; concat + scan-encoder + pool fuse
under the recipe's jit).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from metatransformer_tpu import pipeline
from metatransformer_tpu.core import encoder as enc


@dataclasses.dataclass(frozen=True)
class MultimodalClassifierConfig:
    # the README demo's trio by default; any pipeline.MODALITIES subset works
    modalities: Tuple[str, ...] = ("video", "audio", "time-series")
    # per-modality tokenizer configs (None entries -> facade defaults at
    # the encoder width)
    tokenizers: Tuple[Optional[Any], ...] = (None, None, None)
    encoder: enc.EncoderConfig = enc.BASE
    num_classes: int = 1000

    def facades(self) -> Dict[str, pipeline.Data2Seq]:
        toks = self.tokenizers or (None,) * len(self.modalities)
        return {
            m: pipeline.Data2Seq(m, dim=self.encoder.dim, config=tc)
            for m, tc in zip(self.modalities, toks)
        }


def init(cfg: MultimodalClassifierConfig, key: jax.Array) -> Dict[str, Any]:
    facades = cfg.facades()
    keys = jax.random.split(key, len(facades) + 2)
    params: Dict[str, Any] = {
        "tok": {
            m: f.init(k) for (m, f), k in zip(facades.items(), keys[:-2])
        },
        "encoder": enc.init(cfg.encoder, keys[-2]),
        "head": {
            "w": (
                jax.random.truncated_normal(
                    keys[-1], -2.0, 2.0,
                    (cfg.encoder.dim, cfg.num_classes), jnp.float32,
                )
                * 0.02
            ),
            "b": jnp.zeros((cfg.num_classes,), jnp.float32),
        },
    }
    return params


def forward(
    params: Dict[str, Any],
    inputs: Dict[str, jax.Array],
    cfg: MultimodalClassifierConfig,
    precision: enc.Precision = enc.FP32,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """inputs: modality -> raw batch (each [B, ...] in its native raw
    schema). Returns [B, num_classes] logits."""
    del train, rng  # augmentation lives in the recipe's synth/loaders
    facades = cfg.facades()
    groups = [
        facades[m]._apply(params["tok"][m], inputs[m]) for m in cfg.modalities
    ]
    feats = pipeline.fuse_and_encode(
        params["encoder"], groups, cfg.encoder, precision=precision
    )
    pooled = feats.astype(jnp.float32).mean(axis=1)
    return pooled @ params["head"]["w"] + params["head"]["b"]

"""Image / Infrared / X-Ray classification model (the flagship pipeline).

Equivalent of the reference's timm ViT-B16 with frozen Meta-Transformer
blocks (``X-Ray/train.py:109-131``; Image/README.md ImageNet results).
Raw [B, 224, 224, 3] NHWC image -> logits, one jitted XLA program.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from metatransformer_tpu.core import encoder as enc
from metatransformer_tpu.heads import cls as cls_head
from metatransformer_tpu.models import classifier
from metatransformer_tpu.tokenizers import image as image_tok


@dataclasses.dataclass(frozen=True)
class ImageClassifierConfig:
    tokenizer: image_tok.ImageTokenizerConfig = image_tok.ImageTokenizerConfig()
    encoder: enc.EncoderConfig = enc.BASE
    num_classes: int = 1000

    @property
    def classifier(self) -> classifier.ClassifierConfig:
        return classifier.ClassifierConfig(
            encoder=self.encoder,
            head=cls_head.ClsHeadConfig(
                in_dim=self.encoder.dim, num_classes=self.num_classes
            ),
            seq_len=self.tokenizer.num_patches,
            num_prefix_tokens=1,
            pos_embed="learned",
            pool="cls",
        )


def init(cfg: ImageClassifierConfig, key: jax.Array) -> Dict[str, Any]:
    k1, k2, k3 = jax.random.split(key, 3)
    params = classifier.init_wrapper(cfg.classifier, k1)
    params["tokenizer"] = image_tok.init(cfg.tokenizer, k2)
    params["encoder"] = enc.init(cfg.encoder, k3)
    return params


@functools.partial(jax.jit, static_argnames=("cfg", "precision", "train"))
def forward(
    params: Dict[str, Any],
    images: jax.Array,
    cfg: ImageClassifierConfig,
    precision: enc.Precision = enc.FP32,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    tok_cfg, mm = cfg.tokenizer, precision.mm
    tokenize = lambda p, x: image_tok.apply(p, x, tok_cfg, mm=mm)
    return classifier.forward(
        params, images, cfg.classifier, tokenize, precision, train=train, rng=rng
    )


def load_encoder(params: Dict[str, Any], encoder_params) -> Dict[str, Any]:
    """Swap in converted frozen encoder weights (the released checkpoint)."""
    out = dict(params)
    out["encoder"] = encoder_params
    return out

"""Hyper-spectral classifier, band patches -> logits.

Reference: ``Hyper-spectrum/metatransformer.py:111-165`` — linear
patch-to-embedding + cls + pos, frozen Meta-T encoder (replacing the
local ViT/CAF transformer), LN + Linear mlp_head on the cls token.

``mode="caf"`` additionally implements the SpectralFormer CAF
(cross-layer adaptive fusion) variant (``train.py:22`` ``--mode {ViT,CAF}``,
``metatransformer.py:77-109``): before block ``i>1``, the running stream
is fused with the output of block ``i-2`` through a learned per-token
mix — the reference's ``Conv2d(T+1, T+1, [1, 2])`` over the stacked pair
is exactly two [T+1, T+1] matrices applied across the token axis, which
we express as one einsum over a stacked [T+1, T+1, 2] weight (MXU-shaped,
no 4-D conv). TPU-native delta: the mix is identity-initialised
(x-channel = I, skip-channel = 0), so at init CAF == ViT exactly —
tested — while the reference's kaiming conv init scrambles tokens.
CAF needs per-layer skip access so it runs the blocks as a static Python
loop instead of ``lax.scan`` (depth is small and static; XLA unrolls).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from metatransformer_tpu.core import encoder as enc
from metatransformer_tpu.heads import cls as cls_head
from metatransformer_tpu.tokenizers import hyper as hyper_tok


@dataclasses.dataclass(frozen=True)
class HyperClassifierConfig:
    tokenizer: hyper_tok.HyperTokenizerConfig = hyper_tok.HyperTokenizerConfig()
    encoder: enc.EncoderConfig = enc.BASE
    num_classes: int = 16  # Indian Pines
    ln_eps: float = 1e-6
    mode: str = "vit"  # "vit" (scan encoder) | "caf" (SpectralFormer CAF)

    @property
    def head(self) -> cls_head.ClsHeadConfig:
        return cls_head.ClsHeadConfig(
            in_dim=self.encoder.dim, num_classes=self.num_classes
        )


def init(cfg: HyperClassifierConfig, key: jax.Array) -> Dict[str, Any]:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    params = {
        "tokenizer": hyper_tok.init(cfg.tokenizer, k1),
        "cls_token": jax.random.normal(k3, (1, 1, cfg.encoder.dim)),
        "encoder": enc.init(cfg.encoder, k2),
        "head": cls_head.init(cfg.head, k4),
    }
    if cfg.mode == "caf":
        n_skip = max(cfg.encoder.depth - 2, 0)
        t = cfg.tokenizer.num_tokens + 1
        w = jnp.zeros((n_skip, t, t, 2), jnp.float32)
        w = w.at[:, :, :, 0].set(jnp.eye(t))  # identity mix at init
        params["skipcat_w"] = w
        params["skipcat_b"] = jnp.zeros((n_skip, t), jnp.float32)
    return params


def _caf_encode(
    params: Dict[str, Any],
    tokens: jax.Array,
    cfg: HyperClassifierConfig,
    precision: enc.Precision,
) -> jax.Array:
    """CAF stack: block-i input fused with block-(i-2) input stream
    (``metatransformer.py:96-107``: ``last_output`` append-then-fuse
    order means the skip source is layer i-2's INPUT, pre-fusion)."""
    x = tokens.astype(precision.compute_dtype)
    ecfg = cfg.encoder
    outs = []
    for i in range(ecfg.depth):
        outs.append(x)
        if i > 1:
            pair = jnp.stack([x, outs[i - 2]], axis=-1)  # [B, T, D, 2]
            w = params["skipcat_w"][i - 2].astype(x.dtype)
            b = params["skipcat_b"][i - 2].astype(x.dtype)
            x = jnp.einsum("uvk,bvdk->bud", w, pair) + b[:, None]
        layer = {k: v[i] for k, v in params["encoder"].items()}
        x = enc.block(x, layer, ecfg, None, precision)
    return x


@functools.partial(jax.jit, static_argnames=("cfg", "precision"))
def forward(
    params: Dict[str, Any],
    x: jax.Array,  # [B, n_tokens, patch_dim] band patches
    cfg: HyperClassifierConfig,
    precision: enc.Precision = enc.FP32,
) -> jax.Array:
    tokens = hyper_tok.apply(
        params["tokenizer"], x, cfg.tokenizer, params["cls_token"], mm=precision.mm
    )
    if cfg.mode == "caf":
        h = _caf_encode(params, tokens, cfg, precision)
    else:
        h = enc.encode(params["encoder"], tokens, cfg.encoder, precision=precision)
    return cls_head.apply(params["head"], h[:, 0, :], cfg.head, mm=precision.mm)

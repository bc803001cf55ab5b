"""MaskedPointViT: MAE-style self-supervised point-cloud pretraining.

Reference: ``PointCloud/openpoints/models/reconstruction/maskedpointvit.py``
(MaskedPointViT) — PointViT encoder over *visible* groups only (random
per-sample masking by argsort of uniform noise, maskedpointvit.py:118-143),
a small decoder that fills masked slots with a learned mask token
(:176-205), a linear head predicting the K grouped relative coordinates of
every patch (:93), and a per-patch Chamfer-L1 reconstruction loss over the
flattened (B*L, K, 3) patch batch (:207-236 — the masked-only gather is
commented out upstream; the shipped loss covers all patches, matched here).
Related wrappers ``maskedpoint.py`` / ``maskedpointgroup.py`` differ only
in the backbone; this is the ViT instance the configs use.

TPU-native: masking is a static-shape take_along_axis gather (len_keep is
trace-time constant), encoder and decoder are the shared scan-over-depth
encoder stack, and the loss is the batched chamfer kernel — no dynamic
shapes anywhere.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.core import encoder as enc
from metatransformer_tpu.ops import point_interp
from metatransformer_tpu.tokenizers import point as point_tok


@dataclasses.dataclass(frozen=True)
class MaskedPointViTConfig:
    """Defaults per maskedpointvit.py:19-36 (embed_args sample_ratio 0.0625,
    group 32, feature dp; decoder 192x4, heads 16; mask_ratio 0.75)."""

    dim: int = 384
    depth: int = 12
    num_heads: int = 6
    decoder_dim: int = 192
    decoder_depth: int = 4
    decoder_heads: int = 16
    mask_ratio: float = 0.75
    sample_ratio: float = 0.0625
    group_size: int = 32

    @property
    def encoder(self) -> enc.EncoderConfig:
        return enc.EncoderConfig(
            dim=self.dim, depth=self.depth, num_heads=self.num_heads,
            ln_eps=1e-6,
        )

    @property
    def decoder(self) -> enc.EncoderConfig:
        return enc.EncoderConfig(
            dim=self.decoder_dim, depth=self.decoder_depth,
            num_heads=self.decoder_heads, ln_eps=1e-6,
        )

    @property
    def tokenizer(self) -> point_tok.PointTokenizerConfig:
        return point_tok.PointTokenizerConfig(
            sample_ratio=self.sample_ratio,
            group_size=self.group_size,
            embed_dim=self.dim,
            feature_type="dp",
        )


def _pos_mlp_init(key: jax.Array, out_dim: int) -> Dict[str, jax.Array]:
    k1, k2 = jax.random.split(key)
    return {
        "w1": jax.random.normal(k1, (3, 128)) * np.sqrt(2.0 / 3),
        "b1": jnp.zeros((128,)),
        "w2": jax.random.normal(k2, (128, out_dim)) * np.sqrt(1.0 / 128),
        "b2": jnp.zeros((out_dim,)),
    }


def _pos_mlp(p: Dict[str, jax.Array], xyz: jax.Array) -> jax.Array:
    return jax.nn.gelu(xyz @ p["w1"] + p["b1"]) @ p["w2"] + p["b2"]


def init(cfg: MaskedPointViTConfig, key: jax.Array) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 12))
    d, dd = cfg.dim, cfg.decoder_dim
    xavier = lambda k, i, o: jax.random.uniform(  # noqa: E731
        k, (i, o), minval=-np.sqrt(6.0 / (i + o)), maxval=np.sqrt(6.0 / (i + o))
    )
    return {
        "tokenizer": point_tok.init(cfg.tokenizer, next(keys)),
        "cls_token": jax.random.normal(next(keys), (1, 1, d)) * 0.02,
        "cls_pos": jax.random.normal(next(keys), (1, 1, d)) * 0.02,
        "pos_mlp": _pos_mlp_init(next(keys), d),
        "encoder": enc.init(cfg.encoder, next(keys)),
        "enc_ln_scale": jnp.ones((d,)),
        "enc_ln_bias": jnp.zeros((d,)),
        "decoder_embed": {"w": xavier(next(keys), d, dd), "b": jnp.zeros((dd,))},
        "mask_token": jax.random.normal(next(keys), (1, 1, dd)) * 0.02,
        "decoder_cls_pos": jax.random.normal(next(keys), (1, 1, dd)) * 0.02,
        "decoder_pos_mlp": _pos_mlp_init(next(keys), dd),
        "decoder": enc.init(cfg.decoder, next(keys)),
        "dec_ln_scale": jnp.ones((dd,)),
        "dec_ln_bias": jnp.zeros((dd,)),
        "decoder_pred": {
            "w": xavier(next(keys), dd, cfg.group_size * 3),
            "b": jnp.zeros((cfg.group_size * 3,)),
        },
    }


@functools.partial(jax.jit, static_argnames=("cfg",))
def forward(
    params: Dict[str, Any],
    points: jax.Array,  # [B, N, 3]
    rng: jax.Array,
    cfg: MaskedPointViTConfig,
) -> Tuple[jax.Array, jax.Array]:
    """-> (chamfer-L1 loss scalar, pred [B, L, K*3])."""
    centers, tokens, dp = point_tok.apply(
        params["tokenizer"], points[..., :3], cfg.tokenizer,
        return_grouped=True,
    )
    b, l, d = tokens.shape
    len_keep = max(int(l * (1.0 - cfg.mask_ratio)), 1)
    pos = _pos_mlp(params["pos_mlp"], centers)  # [B, L, D]

    # random masking by per-sample argsort of noise (maskedpointvit.py:118)
    noise = jax.random.uniform(rng, (b, l))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :len_keep]
    take = lambda a, i: jnp.take_along_axis(  # noqa: E731
        a, i[..., None], axis=1
    )
    x_vis = take(tokens, ids_keep)
    pos_vis = take(pos, ids_keep)

    # encoder over cls + visible tokens, pos added each block (:160-173)
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, d))
    cls_pos = jnp.broadcast_to(params["cls_pos"], (b, 1, d))
    x = jnp.concatenate([cls, x_vis], axis=1)
    p = jnp.concatenate([cls_pos, pos_vis], axis=1)
    x = enc.encode(params["encoder"], x, cfg.encoder, pos=p,
                   pos_each_block=True)
    x = enc.layer_norm(x, params["enc_ln_scale"], params["enc_ln_bias"], 1e-6)

    # decoder: embed, fill masked slots with the mask token, unshuffle
    de = params["decoder_embed"]
    x = x @ de["w"] + de["b"]  # [B, 1+len_keep, DD]
    dd = cfg.decoder_dim
    mask_tok = jnp.broadcast_to(params["mask_token"], (b, l - len_keep, dd))
    x_ = jnp.concatenate([x[:, 1:], mask_tok], axis=1)  # [B, L, DD]
    x_ = take(x_, ids_restore)
    x = jnp.concatenate([x[:, :1], x_], axis=1)  # cls back in front
    dec_pos = jnp.concatenate(
        [jnp.broadcast_to(params["decoder_cls_pos"], (b, 1, dd)),
         _pos_mlp(params["decoder_pos_mlp"], centers)], axis=1,
    )
    x = enc.encode(params["decoder"], x, cfg.decoder, pos=dec_pos,
                   pos_each_block=True)
    x = enc.layer_norm(x, params["dec_ln_scale"], params["dec_ln_bias"], 1e-6)
    dp_pred = params["decoder_pred"]
    pred = (x @ dp_pred["w"] + dp_pred["b"])[:, 1:]  # [B, L, K*3]

    # per-patch chamfer-L1 over the flattened patch batch (:220-230)
    k = cfg.group_size
    loss = point_interp.chamfer_l1_loss(
        pred.reshape(b * l, k, 3), dp.reshape(b * l, k, 3)
    )
    return loss, pred


def _register() -> None:
    import types

    from metatransformer_tpu.utils.registry import MODELS

    if "MaskedPointViT" not in MODELS:
        MODELS._entries["MaskedPointViT"] = types.SimpleNamespace(
            init=init, forward=forward, Config=MaskedPointViTConfig
        )


_register()

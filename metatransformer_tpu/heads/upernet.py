"""UperNet decode head: PPM + FPN fusion -> per-pixel class logits.

Reference recipe: ADE20K UperNet on the Meta-Transformer backbone
(``Image/segmentation/configs/ade20k/upernet_meta_transformer_base_512_
160k_ade20k.py``). PPM pools the 1/32 map at scales (1,2,3,6); FPN
laterals fuse the 4 backbone scales; everything upsamples to 1/4 and a
fusion conv + classifier produce logits.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.models.vit_adapter import conv2d, group_norm, resize


@dataclasses.dataclass(frozen=True)
class UperNetConfig:
    in_dim: int = 768  # all 4 scales share the backbone dim
    channels: int = 512
    num_classes: int = 150  # ADE20K
    pool_scales: tuple = (1, 2, 3, 6)


def _conv_gn(key, cin, cout, k=3):
    fan = k * k * cin
    return {
        "w": jax.random.normal(key, (k, k, cin, cout)) * np.sqrt(2.0 / fan),
        "b": jnp.zeros((cout,), jnp.float32),
        "gn_scale": jnp.ones((cout,), jnp.float32),
        "gn_bias": jnp.zeros((cout,), jnp.float32),
    }


def init(cfg: UperNetConfig, key: jax.Array) -> Dict[str, Any]:
    keys = jax.random.split(key, 16)
    ki = iter(keys)
    params: Dict[str, Any] = {}
    for i in range(len(cfg.pool_scales)):
        params[f"ppm{i}"] = _conv_gn(next(ki), cfg.in_dim, cfg.channels, k=1)
    params["ppm_bottleneck"] = _conv_gn(
        next(ki), cfg.in_dim + len(cfg.pool_scales) * cfg.channels, cfg.channels
    )
    for i in range(3):  # laterals for f1..f3
        params[f"lateral{i}"] = _conv_gn(next(ki), cfg.in_dim, cfg.channels, k=1)
        params[f"fpn{i}"] = _conv_gn(next(ki), cfg.channels, cfg.channels)
    params["fusion"] = _conv_gn(next(ki), 4 * cfg.channels, cfg.channels)
    params["cls_w"] = jax.random.normal(
        next(ki), (1, 1, cfg.channels, cfg.num_classes)
    ) * (cfg.channels**-0.5)
    params["cls_b"] = jnp.zeros((cfg.num_classes,), jnp.float32)
    return params


def _apply_cb(x, p):
    x = conv2d(x, p["w"], p["b"])
    return jax.nn.relu(group_norm(x, p["gn_scale"], p["gn_bias"]))


def apply(
    params: Dict[str, Any], feats: List[jax.Array], cfg: UperNetConfig
) -> jax.Array:
    """feats = [f1..f4] NHWC -> logits at f1 resolution [B, H/4, W/4, C]."""
    f1, f2, f3, f4 = feats
    b, h4, w4, _ = f4.shape

    # PPM on f4
    ppm_outs = [f4]
    for i, scale in enumerate(cfg.pool_scales):
        pooled = jax.image.resize(f4, (b, scale, scale, f4.shape[-1]), "linear")
        pooled = _apply_cb(pooled, params[f"ppm{i}"])
        ppm_outs.append(resize(pooled, (h4, w4)))
    top = _apply_cb(jnp.concatenate(ppm_outs, -1), params["ppm_bottleneck"])

    # FPN top-down
    laterals = [
        _apply_cb(f, params[f"lateral{i}"]) for i, f in enumerate((f1, f2, f3))
    ]
    laterals.append(top)
    for i in (2, 1, 0):
        laterals[i] = laterals[i] + resize(laterals[i + 1], laterals[i].shape[1:3])
    outs = [
        _apply_cb(laterals[i], params[f"fpn{i}"]) for i in range(3)
    ] + [laterals[3]]
    target = outs[0].shape[1:3]
    outs = [resize(o, target) if o.shape[1:3] != target else o for o in outs]
    fused = _apply_cb(jnp.concatenate(outs, -1), params["fusion"])
    return conv2d(fused, params["cls_w"], params["cls_b"])

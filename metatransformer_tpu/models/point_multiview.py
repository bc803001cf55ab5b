"""MetaTransformer_MultiView: point cloud -> multi-view pseudo-images ->
frozen 2D encoder.

Reference: ``PointCloud/openpoints/models/backbone/metatransformer.py:622+``
(MetaTransformer_MultiView + ProjEnc :469-598): rotate the cloud into up
to 10 canonical camera poses, render each view to a 2D grid by splatting
kNN graph features over a 3x3 pixel footprint, conv the feature image to
3 channels (sigmoid + ImageNet normalization), and classify every view
with the frozen ViT, fusing views by mean pooling.

TPU-native: the whole render is jittable (scatter-add splat with static
grid size); views fold into the batch axis so one compiled encoder
serves all of them.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.core import encoder as enc
from metatransformer_tpu.heads import cls as cls_head
from metatransformer_tpu.ops import point_ops
from metatransformer_tpu.tokenizers import image as image_tok

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

_TRANS = -1.4
# the 10 canonical camera poses (metatransformer.py:636-647)
VIEWS = np.array(
    [
        [[0 * np.pi / 2, 0, np.pi / 2], [0, 0, _TRANS]],
        [[1 * np.pi / 2, 0, np.pi / 2], [0, 0, _TRANS]],
        [[2 * np.pi / 2, 0, np.pi / 2], [0, 0, _TRANS]],
        [[3 * np.pi / 2, 0, np.pi / 2], [0, 0, _TRANS]],
        [[5 * np.pi / 4, -np.pi / 4, np.pi / 2], [0, 0, _TRANS]],
        [[5 * np.pi / 4, np.pi / 4, np.pi / 2], [0, 0, _TRANS]],
        [[7 * np.pi / 4, -np.pi / 4, np.pi / 2], [0, 0, _TRANS]],
        [[7 * np.pi / 4, np.pi / 4, np.pi / 2], [0, 0, _TRANS]],
        [[0, -np.pi / 2, np.pi / 2], [0, 0, _TRANS]],
        [[0, np.pi / 2, np.pi / 2], [0, 0, _TRANS]],
    ],
    np.float32,
)


def euler2mat(angles: jax.Array) -> jax.Array:
    """[V, 3] (z, y, x intrinsic) -> rotation matrices [V, 3, 3]."""
    z, y, x = angles[:, 0], angles[:, 1], angles[:, 2]
    cz, sz = jnp.cos(z), jnp.sin(z)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cx, sx = jnp.cos(x), jnp.sin(x)
    ones = jnp.ones_like(z)
    zeros = jnp.zeros_like(z)
    rz = jnp.stack(
        [cz, -sz, zeros, sz, cz, zeros, zeros, zeros, ones], -1
    ).reshape(-1, 3, 3)
    ry = jnp.stack(
        [cy, zeros, sy, zeros, ones, zeros, -sy, zeros, cy], -1
    ).reshape(-1, 3, 3)
    rx = jnp.stack(
        [ones, zeros, zeros, zeros, cx, -sx, zeros, sx, cx], -1
    ).reshape(-1, 3, 3)
    return rz @ ry @ rx


@dataclasses.dataclass(frozen=True)
class ProjEncConfig:
    local_size: int = 20  # kNN for graph features
    trans_dim: int = 32
    graph_dim: int = 32
    obj_size: int = 56  # splat grid
    img_size: int = 224


@dataclasses.dataclass(frozen=True)
class MultiViewConfig:
    num_views: int = 4
    proj: ProjEncConfig = ProjEncConfig()
    encoder: enc.EncoderConfig = enc.BASE
    patch_size: int = 16
    num_classes: int = 40

    @property
    def tokenizer(self) -> image_tok.ImageTokenizerConfig:
        return image_tok.ImageTokenizerConfig(
            self.proj.img_size, self.patch_size, 3, self.encoder.dim
        )

    @property
    def head(self) -> cls_head.ClsHeadConfig:
        return cls_head.ClsHeadConfig(
            in_dim=self.encoder.dim, num_classes=self.num_classes
        )


def _conv_init(key, k, cin, cout):
    return {
        "w": jax.random.normal(key, (k, k, cin, cout)) * np.sqrt(2.0 / (k * k * cin)),
        "b": jnp.zeros((cout,)),
    }


def init(cfg: MultiViewConfig, key: jax.Array) -> Dict[str, Any]:
    p = cfg.proj
    keys = iter(jax.random.split(key, 12))
    return {
        "input_trans": {
            "w": jax.random.normal(next(keys), (3, p.trans_dim)) * 3**-0.5,
            "b": jnp.zeros((p.trans_dim,)),
        },
        "graph": {
            "w": jax.random.normal(next(keys), (2 * p.trans_dim, p.graph_dim))
            * (2 * p.trans_dim) ** -0.5,
            "gn_scale": jnp.ones((p.graph_dim,)),
            "gn_bias": jnp.zeros((p.graph_dim,)),
        },
        "proj": {
            "w": jax.random.normal(next(keys), (p.graph_dim, p.graph_dim))
            * p.graph_dim**-0.5,
            "b": jnp.zeros((p.graph_dim,)),
        },
        "block1": _conv_init(next(keys), 3, p.graph_dim, p.graph_dim),
        "block2": _conv_init(next(keys), 3, p.graph_dim, p.graph_dim),
        "block_out": _conv_init(next(keys), 1, p.graph_dim, p.graph_dim),
        "img_layer": _conv_init(next(keys), 1, p.graph_dim, 3),
        "tokenizer": image_tok.init(cfg.tokenizer, next(keys)),
        "encoder": enc.init(cfg.encoder, next(keys)),
        "cls_token": jax.random.normal(next(keys), (1, 1, cfg.encoder.dim)) * 0.02,
        "pos_embed": jax.random.normal(
            next(keys), (1, cfg.tokenizer.num_patches + 1, cfg.encoder.dim)
        ) * 0.02,
        "head": cls_head.init(cfg.head, next(keys)),
    }


def point_transform(points: jax.Array, num_views: int) -> jax.Array:
    """[B, N, 3] -> [B*V, N, 3]: each cloud rotated into every view pose
    (MetaTransformer_MultiView.point_transform)."""
    views = jnp.asarray(VIEWS[:num_views])
    rot = jnp.transpose(euler2mat(views[:, 0]), (0, 2, 1))  # [V, 3, 3]
    trans = views[:, 1][:, None, :]  # [V, 1, 3]
    b, n, _ = points.shape
    pts = jnp.repeat(points, num_views, axis=0)  # [B*V, N, 3]
    rot_b = jnp.tile(rot, (b, 1, 1))
    trans_b = jnp.tile(trans, (b, 1, 1))
    return pts @ rot_b - trans_b


def _group_norm_points(x, scale, bias, groups=4, eps=1e-5):
    """GroupNorm over [B, N, k, C]: stats per (group-channels, N, k)."""
    b, n, k, c = x.shape
    g = min(groups, c)
    xg = x.reshape(b, n, k, g, c // g).astype(jnp.float32)
    mean = xg.mean((1, 2, 4), keepdims=True)
    var = xg.var((1, 2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    return (xg.reshape(b, n, k, c) * scale + bias).astype(x.dtype)


def proj_enc(
    params: Dict[str, Any],
    original_pc: jax.Array,  # [B*V, N, 3] (pre-rotation cloud, repeated)
    pc: jax.Array,  # [B*V, N, 3] view-rotated cloud
    cfg: ProjEncConfig,
    mm=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """ProjEnc.forward (metatransformer.py:541-598) -> images
    [B*V, img_size, img_size, 3], ImageNet-normalized."""
    bv, n, _ = pc.shape

    # --- grid coordinates from the rotated cloud's xy extent
    lo = jnp.min(pc, axis=1)  # [BV, 3]
    rng = jnp.max(pc, axis=1) - lo
    grid = jnp.max(rng[:, :2], axis=-1) / (cfg.obj_size - 3)  # [BV]
    idx_xy = jnp.floor((pc[:, :, :2] - lo[:, None, :2]) / grid[:, None, None])
    offset = jnp.asarray(
        [[-1, -1], [-1, 0], [-1, 1], [0, -1], [0, 0], [0, 1],
         [1, -1], [1, 0], [1, 1]],
        jnp.float32,
    )
    dense = (idx_xy[:, :, None, :] + offset[None, None]).reshape(bv, n * 9, 2) + 1
    center = jnp.floor((jnp.max(dense, 1) + jnp.min(dense, 1)) / 2)
    shift = cfg.obj_size / 2 - center - 1
    dense = dense + shift[:, None, :]

    # --- kNN graph features on the ORIGINAL cloud
    f = jnp.dot(original_pc, params["input_trans"]["w"], precision=mm) + params["input_trans"]["b"]
    _, idx = point_ops.knn(original_pc, original_pc, cfg.local_size)  # [BV,N,k]
    neigh = jnp.take_along_axis(
        f[:, :, None, :], idx[..., None], axis=1
    )  # [BV, N, k, td]
    feat = jnp.concatenate(
        [neigh - f[:, :, None, :], jnp.broadcast_to(f[:, :, None, :], neigh.shape)],
        axis=-1,
    )
    feat = jnp.dot(feat, params["graph"]["w"], precision=mm)
    feat = _group_norm_points(
        feat, params["graph"]["gn_scale"], params["graph"]["gn_bias"]
    )
    feat = jax.nn.leaky_relu(feat, 0.2)
    feat = jnp.max(feat, axis=2)  # [BV, N, gd]
    feat = jnp.dot(feat, params["proj"]["w"], precision=mm) + params["proj"]["b"]

    # --- scatter-add splat over the 3x3 footprint
    gd = feat.shape[-1]
    f9 = jnp.repeat(feat, 9, axis=1)  # [BV, N*9, gd]
    ix = jnp.clip(dense[..., 0], 0, cfg.obj_size - 1).astype(jnp.int32)
    iy = jnp.clip(dense[..., 1], 0, cfg.obj_size - 1).astype(jnp.int32)
    flat = ix * cfg.obj_size + iy

    def splat(fi, ii):
        return jnp.zeros((cfg.obj_size * cfg.obj_size, gd), fi.dtype).at[ii].add(fi)

    img = jax.vmap(splat)(f9, flat).reshape(bv, cfg.obj_size, cfg.obj_size, gd)

    # --- center-pad to img_size
    if cfg.obj_size < cfg.img_size:
        pad = (cfg.img_size - cfg.obj_size) // 2
        img = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)))

    # --- conv image block (BasicBlock + 1x1) -> 3 channels
    from metatransformer_tpu.models.vit_adapter import conv2d

    h = jax.nn.relu(conv2d(img, params["block1"]["w"], params["block1"]["b"]))
    h = conv2d(h, params["block2"]["w"], params["block2"]["b"])
    h = jax.nn.relu(h + img)  # residual
    h = conv2d(h, params["block_out"]["w"], params["block_out"]["b"])
    rgb = conv2d(h, params["img_layer"]["w"], params["img_layer"]["b"])
    rgb = jax.nn.sigmoid(rgb)
    return (rgb - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)


@functools.partial(jax.jit, static_argnames=("cfg", "precision"))
def forward(
    params: Dict[str, Any],
    points: jax.Array,  # [B, N, 3]
    cfg: MultiViewConfig,
    precision: enc.Precision = enc.FP32,
) -> jax.Array:
    """points -> logits [B, num_classes]: render num_views pseudo-images,
    encode all with the frozen ViT (views folded into the batch), mean-
    fuse the per-view cls features, classify."""
    b = points.shape[0]
    v = cfg.num_views
    pc = point_transform(points, v)  # [B*V, N, 3]
    original = jnp.repeat(points, v, axis=0)
    images = proj_enc(params, original, pc, cfg.proj, precision.mm)

    tokens = image_tok.apply(params["tokenizer"], images, cfg.tokenizer,
                             mm=precision.mm)
    cls_tok = jnp.broadcast_to(
        params["cls_token"], (tokens.shape[0], 1, tokens.shape[-1])
    )
    x = jnp.concatenate([cls_tok, tokens], axis=1) + params["pos_embed"]
    x = enc.encode(params["encoder"], x, cfg.encoder, precision=precision)
    feats = x[:, 0].reshape(b, v, -1).mean(axis=1)  # mean view fusion
    return cls_head.apply(params["head"], feats, cfg.head)

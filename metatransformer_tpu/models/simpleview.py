"""SimpleView (MVModel) — 6-view depth-projection classification
(``PointCloud/openpoints/models/backbone/simpleview.py:31-153`` +
``simpleview_util.py:60-270``), re-designed TPU-native.

Faithful mechanics:
- **PCViews** (:235-270): six fixed camera poses (four 90-degree yaw
  steps plus top/bottom), translation z=-1.4; points rotated into each
  view then perspective-projected.
- **points2depth** (:136-174): pixel coords (x/z, y/z) scaled to the
  canvas; each point's depth distributed over a size_xy ceil-patch
  (``get_img`` uses 1x1, :271-277) with weight 1/depth, accumulated by
  scatter-add and normalized by the accumulated weight — here a single
  ``.at[].add`` scatter over flattened (batch*view, pixel) indices;
  out-of-canvas taps masked.
- **Image trunk** (:119-152): conv3x3 stem + the four BasicBlock stages
  of a narrow ResNet-18 (widths c..8c, stride 2 from stage 2) + global
  average pool.
- **MVFC fusion** (:32-58): per-view feature BN, flatten the V features,
  linear -> BN -> ReLU -> linear logits.

BatchNorm is train-mode batch statistics (pure function), as across the
baseline zoo. Registered as ``SimpleView``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.models.point_baselines import _bn
from metatransformer_tpu.models.point_multiview import euler2mat

TRANS = -1.4
_VIEW_ANGLES = np.asarray(
    [
        [0 * np.pi / 2, 0, np.pi / 2],
        [1 * np.pi / 2, 0, np.pi / 2],
        [2 * np.pi / 2, 0, np.pi / 2],
        [3 * np.pi / 2, 0, np.pi / 2],
        [0, -np.pi / 2, np.pi / 2],
        [0, np.pi / 2, np.pi / 2],
    ],
    np.float32,
)


@dataclasses.dataclass(frozen=True)
class SimpleViewConfig:
    num_classes: int = 15  # ScanObjectNN default in the reference
    channels: int = 16
    resolution: int = 128
    size_xy: int = 1  # splat patch (get_img uses 1x1, :271-277)
    blocks_per_stage: int = 2


def project_views(points: jax.Array, resolution: int, size_xy: int = 1):
    """[B, N, 3] -> depth images [B*6, R, R] (PCViews.get_img +
    points2depth semantics)."""
    b, n, _ = points.shape
    rot = jnp.transpose(euler2mat(jnp.asarray(_VIEW_ANGLES)), (0, 2, 1))
    pts = jnp.repeat(points, 6, axis=0)  # [B*6, N, 3]
    rot_b = jnp.tile(rot, (b, 1, 1))
    # point_transform (:281-292): points @ rot - translation
    pts = pts @ rot_b - jnp.asarray([0.0, 0.0, TRANS])

    h = w = resolution
    eps = 1e-12
    cx = (pts[:, :, 0] / (pts[:, :, 2] + eps)) * (w / h)
    cy = pts[:, :, 1] / (pts[:, :, 2] + eps)
    depth = pts[:, :, 2]
    x = (cx + 1) * h / 2
    y = (cy + 1) * w / 2

    s = size_xy
    taps = jnp.arange(-s / 2, s / 2, dtype=jnp.float32)  # [-2,-1,0,1] at s=4
    ex = jnp.ceil(x[:, :, None, None] + taps[None, None, :, None])
    ey = jnp.ceil(y[:, :, None, None] + taps[None, None, None, :])
    ex = jnp.broadcast_to(ex, (b * 6, n, s, s))
    ey = jnp.broadcast_to(ey, (b * 6, n, s, s))
    val = jnp.broadcast_to(depth[:, :, None, None], ex.shape)

    mask = (
        (ex >= 0) & (ex <= h - 1) & (ey >= 0) & (ey <= w - 1) & (val >= 0)
    )
    exc = (ex % h).astype(jnp.int32)
    eyc = (ey % w).astype(jnp.int32)
    weight = mask.astype(jnp.float32) / (val + eps)
    wval = val * weight

    coords = (exc * w + eyc).reshape(b * 6, -1)
    weight = weight.reshape(b * 6, -1)
    wval = wval.reshape(b * 6, -1)

    def splat(coo, wgt, wv):
        zeros = jnp.zeros((h * w,), jnp.float32)
        ws = zeros.at[coo].add(wgt)
        vs = zeros.at[coo].add(wv)
        return vs / jnp.where(ws == 0, 1.0, ws)

    img = jax.vmap(splat)(coords, weight, wval)
    return img.reshape(b * 6, h, w)


def _conv_init(key, k, cin, cout):
    return {
        "w": jax.random.normal(key, (k, k, cin, cout))
        * np.sqrt(2.0 / (k * k * cin)),
        "bn_scale": jnp.ones((cout,)),
        "bn_bias": jnp.zeros((cout,)),
    }


def _conv(p, x, stride=1, act=True):
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = _bn(y, p["bn_scale"], p["bn_bias"])
    return jax.nn.relu(y) if act else y


def _basic_block_init(key, cin, cout):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {"c1": _conv_init(k1, 3, cin, cout), "c2": _conv_init(k2, 3, cout, cout)}
    if cin != cout:
        p["down"] = _conv_init(k3, 1, cin, cout)
    return p


def _basic_block(p, x, stride):
    h = _conv(p["c1"], x, stride)
    h = _conv(p["c2"], h, 1, act=False)
    sc = _conv(p["down"], x, stride, act=False) if "down" in p else x
    return jax.nn.relu(h + sc)


def init(cfg: SimpleViewConfig, key: jax.Array) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 32))
    c = cfg.channels
    params: Dict[str, Any] = {"stem": _conv_init(next(keys), 3, 1, c)}
    cin = c
    for si, mult in enumerate((1, 2, 4, 8)):
        cout = c * mult
        params[f"stage{si}"] = [
            _basic_block_init(next(keys), cin if bi == 0 else cout, cout)
            for bi in range(cfg.blocks_per_stage)
        ]
        cin = cout
    f = cin  # 8c
    params["fuse_bn_scale"] = jnp.ones((f,))
    params["fuse_bn_bias"] = jnp.zeros((f,))
    params["fc1"] = {
        "w": jax.random.normal(next(keys), (6 * f, f)) * np.sqrt(1.0 / (6 * f)),
        "b": jnp.zeros((f,)),
        "bn_scale": jnp.ones((f,)),
        "bn_bias": jnp.zeros((f,)),
    }
    params["fc2"] = {
        "w": jax.random.normal(next(keys), (f, cfg.num_classes))
        * np.sqrt(1.0 / f),
        "b": jnp.zeros((cfg.num_classes,)),
    }
    return params


@functools.partial(jax.jit, static_argnames=("cfg",))
def forward(
    params: Dict[str, Any], points: jax.Array, cfg: SimpleViewConfig
) -> jax.Array:
    b = points.shape[0]
    img = project_views(points[..., :3], cfg.resolution, cfg.size_xy)
    x = img[..., None]  # [B*6, R, R, 1]
    x = _conv(params["stem"], x)
    for si in range(4):
        for bi, blk in enumerate(params[f"stage{si}"]):
            stride = 2 if (si > 0 and bi == 0) else 1
            x = _basic_block(blk, x, stride)
    feat = jnp.mean(x, axis=(1, 2))  # [B*6, 8c]

    # MVFC (:32-58): per-view BN, flatten views, fc-bn-relu-fc
    feat = _bn(feat, params["fuse_bn_scale"], params["fuse_bn_bias"])
    feat = feat.reshape(b, -1)
    f1 = params["fc1"]
    h = _bn(feat @ f1["w"] + f1["b"], f1["bn_scale"], f1["bn_bias"])
    h = jax.nn.relu(h)
    return h @ params["fc2"]["w"] + params["fc2"]["b"]


def _register() -> None:
    import types

    from metatransformer_tpu.utils.registry import MODELS

    if "SimpleView" not in MODELS:
        MODELS._entries["SimpleView"] = types.SimpleNamespace(
            init=init, forward=forward, Config=SimpleViewConfig
        )


_register()

"""Full Mask2Former head with multi-scale MSDeformAttn pixel decoder.

Reference:
``Image/segmentation/mmseg_custom/models/plugins/msdeformattn_pixel_decoder.py:1-267``
(6-layer deformable encoder over the 3 low-res pyramid levels + FPN fuse
to stride-4 + mask-feature conv) and
``decode_heads/mask2former_head.py:1-579`` (masked-attention transformer
decoder with level cycling, per-layer cls/mask heads, point-sampled
Hungarian-matched losses).

TPU-native design, not a translation: NHWC layouts; the 6 encoder layers
run as one ``lax.scan`` over stacked params (MSDeformAttn is the pure-XLA
gather in ops/ms_deform_attn.py — no CUDA im2col); the decoder's 9 layers
are unrolled (level-cycled key sets have different static token counts);
losses sample masks at static point counts (``point_sample`` = the same
bilinear gather), so everything under ``jit`` keeps static shapes. The
Hungarian assignment runs on host between the cost and loss passes, as in
ops/matching.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.models.vit_adapter import conv2d, group_norm
from metatransformer_tpu.ops import matching
from metatransformer_tpu.ops import ms_deform_attn as msda
from metatransformer_tpu.ops.ms_deform_attn import bilinear_sample

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Sine positional encoding (mmcv SinePositionalEncoding, normalize=True)
# ---------------------------------------------------------------------------

def sine_positional_encoding(h: int, w: int, num_feats: int = 128,
                             temperature: float = 10000.0) -> jax.Array:
    """-> [H, W, 2*num_feats]; matches mmcv normalize=True, scale=2pi."""
    eps, scale = 1e-6, 2.0 * np.pi
    y = (jnp.arange(1, h + 1, dtype=jnp.float32) / (h + eps) * scale)[:, None]
    x = (jnp.arange(1, w + 1, dtype=jnp.float32) / (w + eps) * scale)[None, :]
    dim_t = temperature ** (
        2.0 * (jnp.arange(num_feats, dtype=jnp.float32) // 2) / num_feats
    )
    pos_x = x[:, :, None] * jnp.ones((h, w, 1)) / dim_t
    pos_y = y[:, :, None] * jnp.ones((h, w, 1)) / dim_t
    pos_x = jnp.stack(
        [jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=-1
    ).reshape(h, w, num_feats)
    pos_y = jnp.stack(
        [jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=-1
    ).reshape(h, w, num_feats)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


# ---------------------------------------------------------------------------
# MSDeformAttn pixel decoder
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class PixelDecoderConfig:
    in_channels: Tuple[int, ...] = (768, 768, 768, 768)  # ViT-Adapter c1..c4
    strides: Tuple[int, ...] = (4, 8, 16, 32)
    feat_channels: int = 256
    out_channels: int = 256
    num_encoder_layers: int = 6
    num_encoder_levels: int = 3
    num_heads: int = 8
    num_points: int = 4
    ffn_dim: int = 1024

    @property
    def msda(self) -> msda.MSDeformAttnConfig:
        return msda.MSDeformAttnConfig(
            dim=self.feat_channels,
            num_heads=self.num_heads,
            num_levels=self.num_encoder_levels,
            num_points=self.num_points,
            ratio=1.0,
        )


def _linear_init(key, cin, cout):
    return {
        "w": jax.random.normal(key, (cin, cout)) * cin**-0.5,
        "b": jnp.zeros((cout,)),
    }


def _enc_layer_init(cfg: PixelDecoderConfig, key) -> Params:
    k = jax.random.split(key, 4)
    c = cfg.feat_channels
    return {
        "msda": msda.init(cfg.msda, k[0]),
        "ln1_scale": jnp.ones((c,)), "ln1_bias": jnp.zeros((c,)),
        "ffn1": _linear_init(k[1], c, cfg.ffn_dim),
        "ffn2": _linear_init(k[2], cfg.ffn_dim, c),
        "ln2_scale": jnp.ones((c,)), "ln2_bias": jnp.zeros((c,)),
    }


def pixel_decoder_init(cfg: PixelDecoderConfig, key: jax.Array) -> Params:
    nl, c = cfg.num_encoder_levels, cfg.feat_channels
    n_fpn = len(cfg.in_channels) - nl
    keys = iter(jax.random.split(key, 8 + nl + 2 * n_fpn + cfg.num_encoder_layers))
    params: Params = {"level_embed": jax.random.normal(next(keys), (nl, c))}
    # input 1x1 convs + GN on the nl lowest-resolution levels (top-down)
    for i in range(nl):
        cin = cfg.in_channels[len(cfg.in_channels) - 1 - i]
        params[f"input{i}"] = {
            "w": jax.random.normal(next(keys), (1, 1, cin, c)) * cin**-0.5,
            "b": jnp.zeros((c,)),
            "gn_scale": jnp.ones((c,)), "gn_bias": jnp.zeros((c,)),
        }
    layers = [_enc_layer_init(cfg, next(keys)) for _ in range(cfg.num_encoder_layers)]
    params["encoder"] = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    # FPN for the remaining high-res levels
    for i in range(n_fpn):
        cin = cfg.in_channels[n_fpn - 1 - i]
        params[f"lateral{i}"] = {
            "w": jax.random.normal(next(keys), (1, 1, cin, c)) * cin**-0.5,
            "gn_scale": jnp.ones((c,)), "gn_bias": jnp.zeros((c,)),
        }
        params[f"output{i}"] = {
            "w": jax.random.normal(next(keys), (3, 3, c, c)) * (9 * c) ** -0.5,
            "gn_scale": jnp.ones((c,)), "gn_bias": jnp.zeros((c,)),
        }
    params["mask_feature"] = {
        "w": jax.random.normal(next(keys), (1, 1, c, cfg.out_channels)) * c**-0.5,
        "b": jnp.zeros((cfg.out_channels,)),
    }
    return params


def _layer_norm(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * scale + bias).astype(x.dtype)


def _bilinear_resize(x: jax.Array, h: int, w: int) -> jax.Array:
    """NHWC bilinear, half-pixel centers (= torch align_corners=False)."""
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), "bilinear")


def pixel_decoder_apply(
    params: Params,
    feats: Sequence[jax.Array],  # NHWC, high-res -> low-res (c1..c4)
    cfg: PixelDecoderConfig,
    mm: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> Tuple[jax.Array, List[jax.Array]]:
    """-> (mask_feature [B, H/4, W/4, out_c],
           multi_scale_features: nl maps, low-res -> high-res, NHWC)."""
    b = feats[0].shape[0]
    nl = cfg.num_encoder_levels
    n_in = len(feats)

    tokens, poss, shapes, refs = [], [], [], []
    for i in range(nl):  # top-down: lowest resolution first
        feat = feats[n_in - 1 - i]
        h, w = feat.shape[1], feat.shape[2]
        p = params[f"input{i}"]
        proj = group_norm(conv2d(feat, p["w"], p["b"]), p["gn_scale"], p["gn_bias"])
        pos = sine_positional_encoding(h, w, cfg.feat_channels // 2)
        pos = pos + params["level_embed"][i]
        # normalized pixel-center reference points (MlvlPointGenerator)
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        ref = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), -1).reshape(-1, 2)
        tokens.append(proj.reshape(b, h * w, -1))
        poss.append(jnp.broadcast_to(pos.reshape(1, h * w, -1), (b, h * w, cfg.feat_channels)))
        shapes.append((h, w))
        refs.append(ref)

    x = jnp.concatenate(tokens, axis=1)  # [B, S, C]
    pos = jnp.concatenate(poss, axis=1)
    ref_pts = jnp.concatenate(refs, axis=0)  # [S, 2]
    ref_pts = jnp.broadcast_to(ref_pts[None, :, None, :], (b, ref_pts.shape[0], nl, 2))

    def enc_layer(carry, lp):
        q = carry + pos
        attn = msda.apply(lp["msda"], q, ref_pts, carry, shapes, cfg.msda, mm)
        h1 = _layer_norm(carry + attn, lp["ln1_scale"], lp["ln1_bias"])
        f = jax.nn.relu(jnp.dot(h1, lp["ffn1"]["w"], precision=mm) + lp["ffn1"]["b"])
        f = jnp.dot(f, lp["ffn2"]["w"], precision=mm) + lp["ffn2"]["b"]
        return _layer_norm(h1 + f, lp["ln2_scale"], lp["ln2_bias"]), None

    x, _ = jax.lax.scan(enc_layer, x, params["encoder"])

    # split back into level maps (low-res -> high-res)
    outs, off = [], 0
    for i, (h, w) in enumerate(shapes):
        outs.append(x[:, off : off + h * w].reshape(b, h, w, -1))
        off += h * w

    # FPN fuse toward stride-4
    n_fpn = n_in - nl
    for i in range(n_fpn):
        feat = feats[n_fpn - 1 - i]
        p = params[f"lateral{i}"]
        lat = group_norm(conv2d(feat, p["w"]), p["gn_scale"], p["gn_bias"])
        y = lat + _bilinear_resize(outs[-1], feat.shape[1], feat.shape[2])
        po = params[f"output{i}"]
        y = jax.nn.relu(
            group_norm(conv2d(y, po["w"]), po["gn_scale"], po["gn_bias"])
        )
        outs.append(y)

    mp = params["mask_feature"]
    mask_feature = conv2d(outs[-1], mp["w"], mp["b"])
    return mask_feature, outs[:nl]


# ---------------------------------------------------------------------------
# Mask2Former head
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Mask2FormerConfig:
    num_classes: int = 150  # ADE20K
    num_queries: int = 100
    feat_channels: int = 256
    out_channels: int = 256
    num_decoder_layers: int = 9
    num_heads: int = 8
    ffn_dim: int = 2048
    num_points: int = 12544  # point-sampled losses (train_cfg.num_points)
    oversample_ratio: float = 3.0
    importance_sample_ratio: float = 0.75
    cls_weight: float = 2.0
    mask_weight: float = 5.0
    dice_weight: float = 5.0
    no_object_weight: float = 0.1
    pixel_decoder: PixelDecoderConfig = PixelDecoderConfig()


def _mha_init(key, c):
    k = jax.random.split(key, 4)
    s = c**-0.5
    return {
        "q": _linear_init(k[0], c, c),
        "k": _linear_init(k[1], c, c),
        "v": _linear_init(k[2], c, c),
        "o": _linear_init(k[3], c, c),
    }


def _dec_layer_init(cfg: Mask2FormerConfig, key) -> Params:
    c = cfg.feat_channels
    k = jax.random.split(key, 4)
    return {
        "cross": _mha_init(k[0], c),
        "ln1_scale": jnp.ones((c,)), "ln1_bias": jnp.zeros((c,)),
        "self": _mha_init(k[1], c),
        "ln2_scale": jnp.ones((c,)), "ln2_bias": jnp.zeros((c,)),
        "ffn1": _linear_init(k[2], c, cfg.ffn_dim),
        "ffn2": _linear_init(k[3], cfg.ffn_dim, c),
        "ln3_scale": jnp.ones((c,)), "ln3_bias": jnp.zeros((c,)),
    }


def init(cfg: Mask2FormerConfig, key: jax.Array) -> Params:
    keys = iter(jax.random.split(key, cfg.num_decoder_layers + 10))
    c = cfg.feat_channels
    params: Params = {
        "pixel_decoder": pixel_decoder_init(cfg.pixel_decoder, next(keys)),
        "query_feat": jax.random.normal(next(keys), (cfg.num_queries, c)) * 0.02,
        "query_embed": jax.random.normal(next(keys), (cfg.num_queries, c)) * 0.02,
        "level_embed": jax.random.normal(next(keys), (cfg.pixel_decoder.num_encoder_levels, c)) * 0.02,
        "layers": [
            _dec_layer_init(cfg, next(keys)) for _ in range(cfg.num_decoder_layers)
        ],
        "post_norm_scale": jnp.ones((c,)), "post_norm_bias": jnp.zeros((c,)),
        "cls": _linear_init(next(keys), c, cfg.num_classes + 1),
        "mask1": _linear_init(next(keys), c, c),
        "mask2": _linear_init(next(keys), c, c),
        "mask3": _linear_init(next(keys), c, cfg.out_channels),
    }
    return params


def _mha(p, q, k, v, num_heads, mm, attn_mask=None):
    """attn_mask: [B, Q, S] bool, True = DO NOT attend."""
    b, nq, c = q.shape
    hd = c // num_heads
    qh = (jnp.dot(q, p["q"]["w"], precision=mm) + p["q"]["b"]).reshape(b, nq, num_heads, hd)
    kh = (jnp.dot(k, p["k"]["w"], precision=mm) + p["k"]["b"]).reshape(b, -1, num_heads, hd)
    vh = (jnp.dot(v, p["v"]["w"], precision=mm) + p["v"]["b"]).reshape(b, -1, num_heads, hd)
    logits = jnp.einsum("bqhd,bshd->bhqs", qh, kh, precision=mm) * hd**-0.5
    if attn_mask is not None:
        logits = jnp.where(attn_mask[:, None], jnp.finfo(jnp.float32).min, logits)
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(vh.dtype)
    o = jnp.einsum("bhqs,bshd->bqhd", probs, vh, precision=mm).reshape(b, nq, c)
    return jnp.dot(o, p["o"]["w"], precision=mm) + p["o"]["b"]


def _forward_head(params, cfg, query, mask_feature, target_hw, mm):
    """-> (cls [B,Q,C+1], mask [B,Q,h4,w4], attn_mask [B,Q,Ht*Wt] bool)."""
    q = _layer_norm(query, params["post_norm_scale"], params["post_norm_bias"])
    cls = jnp.dot(q, params["cls"]["w"], precision=mm) + params["cls"]["b"]
    e = jax.nn.relu(jnp.dot(q, params["mask1"]["w"], precision=mm) + params["mask1"]["b"])
    e = jax.nn.relu(jnp.dot(e, params["mask2"]["w"], precision=mm) + params["mask2"]["b"])
    e = jnp.dot(e, params["mask3"]["w"], precision=mm) + params["mask3"]["b"]
    mask = jnp.einsum("bqc,bhwc->bqhw", e, mask_feature, precision=mm)
    ht, wt = target_hw
    am = jax.image.resize(mask, (mask.shape[0], mask.shape[1], ht, wt), "bilinear")
    am = (jax.nn.sigmoid(am) < 0.5).reshape(mask.shape[0], mask.shape[1], ht * wt)
    # rescue all-masked queries (reference mask2former_head.py:502-503)
    all_masked = jnp.all(am, axis=-1, keepdims=True)
    am = jnp.where(all_masked, False, am)
    return cls, mask, jax.lax.stop_gradient(am)


def apply(
    params: Params,
    feats: Sequence[jax.Array],  # NHWC c1..c4 (high-res -> low-res)
    cfg: Mask2FormerConfig,
    mm: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> Tuple[jax.Array, jax.Array]:
    """-> (all_cls [L+1, B, Q, C+1], all_masks [L+1, B, Q, H/4, W/4]),
    one prediction per decoder layer plus the pre-decoder one
    (intermediate supervision, reference mask2former_head.py:492-525)."""
    b = feats[0].shape[0]
    nl = cfg.pixel_decoder.num_encoder_levels
    mask_feature, ms_feats = pixel_decoder_apply(
        params["pixel_decoder"], feats, cfg.pixel_decoder, mm
    )

    keys, poss, shapes = [], [], []
    for i, f in enumerate(ms_feats):  # low-res -> high-res
        h, w = f.shape[1], f.shape[2]
        keys.append(f.reshape(b, h * w, -1) + params["level_embed"][i])
        pe = sine_positional_encoding(h, w, cfg.feat_channels // 2).reshape(1, h * w, -1)
        poss.append(jnp.broadcast_to(pe, (b, h * w, cfg.feat_channels)))
        shapes.append((h, w))

    query = jnp.broadcast_to(params["query_feat"][None], (b, cfg.num_queries, cfg.feat_channels))
    query_pos = jnp.broadcast_to(params["query_embed"][None], (b, cfg.num_queries, cfg.feat_channels))

    all_cls, all_masks = [], []
    cls, mask, am = _forward_head(params, cfg, query, mask_feature, shapes[0], mm)
    all_cls.append(cls)
    all_masks.append(mask)

    for i, lp in enumerate(params["layers"]):
        li = i % nl
        # masked cross-attention (query + pos vs key + key_pos)
        x = _mha(
            lp["cross"], query + query_pos, keys[li] + poss[li], keys[li],
            cfg.num_heads, mm, attn_mask=am,
        )
        query = _layer_norm(query + x, lp["ln1_scale"], lp["ln1_bias"])
        # self-attention among queries
        x = _mha(lp["self"], query + query_pos, query + query_pos, query,
                 cfg.num_heads, mm)
        query = _layer_norm(query + x, lp["ln2_scale"], lp["ln2_bias"])
        # FFN
        f = jax.nn.relu(jnp.dot(query, lp["ffn1"]["w"], precision=mm) + lp["ffn1"]["b"])
        f = jnp.dot(f, lp["ffn2"]["w"], precision=mm) + lp["ffn2"]["b"]
        query = _layer_norm(query + f, lp["ln3_scale"], lp["ln3_bias"])

        cls, mask, am = _forward_head(
            params, cfg, query, mask_feature, shapes[(i + 1) % nl], mm
        )
        all_cls.append(cls)
        all_masks.append(mask)

    return jnp.stack(all_cls), jnp.stack(all_masks)


def semantic_inference(cls_logits: jax.Array, mask_logits: jax.Array) -> jax.Array:
    """[B,Q,C+1], [B,Q,h,w] -> [B,h,w,C] per-pixel semantic logits
    (reference forward_test, mask2former_head.py:576-578)."""
    probs = jax.nn.softmax(cls_logits, -1)[..., :-1]
    masks = jax.nn.sigmoid(mask_logits)
    return jnp.einsum("bqc,bqhw->bhwc", probs, masks)


# ---------------------------------------------------------------------------
# Point-sampled Hungarian-matched losses
# ---------------------------------------------------------------------------

def point_sample(masks: jax.Array, coords: jax.Array) -> jax.Array:
    """masks [N, H, W], coords [N, P, 2] in [0,1] (x, y) -> [N, P]."""
    return bilinear_sample(masks[..., None], coords)[..., 0]


def uncertain_point_coords(
    mask_logits: jax.Array,  # [N, H, W]
    num_points: int,
    oversample_ratio: float,
    importance_sample_ratio: float,
    rng: jax.Array,
) -> jax.Array:
    """get_uncertain_point_coords_with_randomness: oversample random
    points, keep the most uncertain (|logit| smallest) fraction, fill the
    rest uniformly. -> [N, P, 2]."""
    n = mask_logits.shape[0]
    k1, k2 = jax.random.split(rng)
    n_sampled = int(num_points * oversample_ratio)
    coords = jax.random.uniform(k1, (n, n_sampled, 2))
    logits = point_sample(mask_logits, coords)
    n_unc = int(importance_sample_ratio * num_points)
    n_rand = num_points - n_unc
    idx = jnp.argsort(jnp.abs(logits), axis=1)[:, :n_unc]  # most uncertain first
    picked = jnp.take_along_axis(coords, idx[..., None], axis=1)
    if n_rand:
        picked = jnp.concatenate(
            [picked, jax.random.uniform(k2, (n, n_rand, 2))], axis=1
        )
    return jax.lax.stop_gradient(picked)


def _bce_logits(logits, targets):
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _host_lsa(cost: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """[B, Q, G] cost + [B, G] validity -> [B, G] query index (-1 invalid)."""
    from scipy.optimize import linear_sum_assignment

    b, _, g = cost.shape
    out = np.full((b, g), -1, np.int32)
    for i in range(b):
        vi = np.flatnonzero(valid[i])
        if vi.size == 0:
            continue
        rows, cols = linear_sum_assignment(cost[i][:, vi])
        out[i, vi[cols]] = rows.astype(np.int32)
    return out


def match(
    cls_logits: jax.Array,  # [B, Q, C+1]
    mask_logits: jax.Array,  # [B, Q, h, w]
    gt_labels: jax.Array,  # [B, G] int (padded)
    gt_masks: jax.Array,  # [B, G, h, w] {0,1}
    gt_valid: jax.Array,  # [B, G] bool
    cfg: Mask2FormerConfig,
    rng: jax.Array,
    num_match_points: int = 0,
) -> jax.Array:
    """Hungarian assignment per image -> query index per gt slot [B, G].

    Costs (MaskHungarianAssigner: cls 2.0 + BCE-mask 5.0 + dice 5.0) on
    ``num_match_points`` shared random points (reference
    ``_get_target_single``, mask2former_head.py:230-248). Fully jittable:
    the [B, Q, G] cost is built batched on device (the mean-BCE cost
    decomposes into a per-query term minus ``x @ y^T / P``, so no
    [B, Q, G, P] tensor is ever materialized) and only the tiny
    linear-sum-assignment runs on host inside ``jax.pure_callback`` —
    the whole train step stays ONE XLA program.
    """
    b, q = cls_logits.shape[:2]
    g = gt_labels.shape[1]
    p = num_match_points or min(cfg.num_points, 2048)
    coords = jax.random.uniform(rng, (b, 1, p, 2))
    pred_pts = point_sample(
        mask_logits.reshape(b * q, *mask_logits.shape[2:]),
        jnp.broadcast_to(coords, (b, q, p, 2)).reshape(b * q, p, 2),
    ).reshape(b, q, p).astype(jnp.float32)
    gt_pts = point_sample(
        jnp.asarray(gt_masks, jnp.float32).reshape(b * g, *gt_masks.shape[2:]),
        jnp.broadcast_to(coords, (b, g, p, 2)).reshape(b * g, p, 2),
    ).reshape(b, g, p).astype(jnp.float32)

    probs = jax.nn.softmax(cls_logits.astype(jnp.float32), -1)
    c_cls = -jnp.take_along_axis(
        probs, jnp.broadcast_to(gt_labels[:, None, :], (b, q, g)), axis=2
    )
    # mean-P BCE(x, y) = mean_p[max(x,0) + log1p(e^-|x|)] - (x @ y^T)/P
    per_q = jnp.mean(
        jnp.maximum(pred_pts, 0) + jnp.log1p(jnp.exp(-jnp.abs(pred_pts))), -1
    )
    c_mask = per_q[:, :, None] - jnp.einsum("bqp,bgp->bqg", pred_pts, gt_pts) / p
    sp = jax.nn.sigmoid(pred_pts)
    inter = 2.0 * jnp.einsum("bqp,bgp->bqg", sp, gt_pts)
    denom = jnp.sum(sp, -1)[:, :, None] + jnp.sum(gt_pts, -1)[:, None, :]
    c_dice = 1.0 - (inter + 1.0) / (denom + 1.0)
    cost = (
        cfg.cls_weight * c_cls
        + cfg.mask_weight * c_mask
        + cfg.dice_weight * c_dice
    )
    return jax.pure_callback(
        _host_lsa,
        jax.ShapeDtypeStruct((b, g), jnp.int32),
        cost,
        jnp.asarray(gt_valid),
        vmap_method="sequential",
    )


def loss_single(
    cls_logits: jax.Array,  # [B, Q, C+1]
    mask_logits: jax.Array,  # [B, Q, h, w]
    gt_labels: jax.Array,  # [B, G]
    gt_masks: jax.Array,  # [B, G, h, w]
    gt_valid: jax.Array,  # [B, G] bool
    assign: jax.Array,  # [B, G] query index per gt (-1 = unassigned)
    cfg: Mask2FormerConfig,
    rng: jax.Array,
    num_points: int = 0,
) -> Dict[str, jax.Array]:
    """Losses for one decoder layer given an assignment (jittable)."""
    b, q, ncls1 = cls_logits.shape
    g = gt_labels.shape[1]
    p = num_points or cfg.num_points

    valid = gt_valid & (assign >= 0)
    a_safe = jnp.maximum(assign, 0)

    # --- classification: assigned queries get their gt label, rest no-object
    labels = jnp.full((b, q), cfg.num_classes, jnp.int32)
    upd = jnp.where(valid, gt_labels, cfg.num_classes)
    labels = _scatter_rows(labels, a_safe, upd, valid)
    class_weight = jnp.concatenate(
        [jnp.ones((cfg.num_classes,)), jnp.array([cfg.no_object_weight])]
    )
    logp = jax.nn.log_softmax(cls_logits.astype(jnp.float32), -1)
    w = class_weight[labels]
    ce = -jnp.take_along_axis(logp, labels[..., None], -1)[..., 0] * w
    loss_cls = cfg.cls_weight * jnp.sum(ce) / jnp.maximum(jnp.sum(w), 1.0)

    # --- masks: point-sampled dice + BCE on matched pairs
    num_pos = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    pred = jnp.take_along_axis(
        mask_logits, a_safe[..., None, None], axis=1
    )  # [B, G, h, w]
    pred2 = pred.reshape(b * g, *pred.shape[2:])
    coords = uncertain_point_coords(
        jax.lax.stop_gradient(pred2), p, cfg.oversample_ratio,
        cfg.importance_sample_ratio, rng,
    )
    pred_pts = point_sample(pred2, coords).reshape(b, g, p)
    gt_pts = point_sample(
        gt_masks.astype(jnp.float32).reshape(b * g, *gt_masks.shape[2:]), coords
    ).reshape(b, g, p)
    vf = valid.astype(jnp.float32)[..., None]

    sp = jax.nn.sigmoid(pred_pts)
    inter = jnp.sum(sp * gt_pts * vf, -1)
    denom = jnp.sum((sp + gt_pts) * vf, -1)
    dice = 1.0 - (2.0 * inter + 1.0) / (denom + 1.0)
    loss_dice = cfg.dice_weight * jnp.sum(dice * valid) / num_pos

    bce = _bce_logits(pred_pts, gt_pts) * vf
    loss_mask = cfg.mask_weight * jnp.sum(bce) / (num_pos * p)

    return {"loss_cls": loss_cls, "loss_mask": loss_mask, "loss_dice": loss_dice}


def _scatter_rows(dest, idx, upd, valid):
    """dest [B, Q], idx/upd/valid [B, G]: dest[b, idx[b,g]] = upd where valid."""
    b = dest.shape[0]
    bi = jnp.broadcast_to(jnp.arange(b)[:, None], idx.shape)
    idx_safe = jnp.where(valid, idx, dest.shape[1])  # OOB drops the update
    return dest.at[bi, idx_safe].set(jnp.where(valid, upd, 0), mode="drop")


def loss(
    all_cls: jax.Array,  # [L, B, Q, C+1]
    all_masks: jax.Array,  # [L, B, Q, h, w]
    gt_labels,
    gt_masks,
    gt_valid,
    cfg: Mask2FormerConfig,
    rng: jax.Array,
    num_points: int = 0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Deep supervision over all layers (reference loss(), :361-402).
    Fully jittable: per-layer matching goes through ``match`` (device-side
    costs + a pure_callback LSA); the summed loss is differentiable."""
    n_layers = all_cls.shape[0]
    total = 0.0
    logs: Dict[str, jax.Array] = {}
    gt_labels_j = jnp.asarray(gt_labels)
    gt_masks_j = jnp.asarray(gt_masks)
    gt_valid_j = jnp.asarray(gt_valid)
    for li in range(n_layers):
        rng, k1, k2 = jax.random.split(rng, 3)
        assign = match(
            jax.lax.stop_gradient(all_cls[li]),
            jax.lax.stop_gradient(all_masks[li]),
            gt_labels_j, gt_masks_j, gt_valid_j,
            cfg, k1, num_match_points=num_points,
        )
        parts = loss_single(
            all_cls[li], all_masks[li], gt_labels_j, gt_masks_j, gt_valid_j,
            assign, cfg, k2, num_points=num_points,
        )
        for k, v in parts.items():
            tag = k if li == n_layers - 1 else f"d{li}.{k}"
            logs[tag] = v
            total = total + v
    return total, logs

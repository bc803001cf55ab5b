"""ViT-Adapter backbone: frozen ViT + spatial prior + deformable interaction.

Reference: ``Image/segmentation/mmseg_custom/models/backbones/vit_adapter.py
:20-137`` + ``adapter_modules.py`` — SpatialPriorModule conv stem
producing a 4-scale pyramid, Injector (spatial->ViT cross deformable
attention with zero-init gamma) and Extractor (ViT->spatial + depthwise
ConvFFN) wrapped around slices of the frozen ViT blocks (B16 interaction
splits [[0,2],[3,5],[6,8],[9,11]], config :10-26), outputs {c1..c4} at
1/4, 1/8, 1/16, 1/32 with the ViT feature added back at each scale.

TPU notes: convs run NHWC; SyncBN is replaced by GroupNorm(32) (stateless,
mesh-friendly — BN sync across data shards is exactly what GSPMD should
not have to emit); bilinear resizes via jax.image.resize.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.core import encoder as enc
from metatransformer_tpu.ops import ms_deform_attn as msda

MM = jax.lax.Precision.HIGHEST


def conv2d(x, w, b=None, stride=1, padding="SAME", groups=1):
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups, precision=MM,
    )
    return out + b if b is not None else out


def group_norm(x, scale, bias, groups=32, eps=1e-5):
    b, h, w, c = x.shape
    g = min(groups, c)
    xg = x.reshape(b, h, w, g, c // g).astype(jnp.float32)
    mean = xg.mean((1, 2, 4), keepdims=True)
    var = xg.var((1, 2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    return (xg.reshape(b, h, w, c) * scale + bias).astype(x.dtype)


def resize(x, hw):
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, hw[0], hw[1], c), "bilinear")


@dataclasses.dataclass(frozen=True)
class ViTAdapterConfig:
    encoder: enc.EncoderConfig = enc.BASE
    img_size: int = 512
    patch_size: int = 16
    conv_inplane: int = 64
    deform_num_heads: int = 12
    n_points: int = 4
    deform_ratio: float = 0.5
    interaction_indexes: Tuple[Tuple[int, int], ...] = (
        (0, 2), (3, 5), (6, 8), (9, 11),
    )
    add_vit_feature: bool = True
    # "timm" = the frozen Meta-Transformer blocks; "beit" = BEiT blocks
    # with per-layer rel-pos-bias + LayerScale (backbones/beit_adapter.py);
    # "uniperceiver" = BertLayer blocks: LayerScale (zero-init), full qkv
    # bias, NO rel-pos-bias (backbones/base/uniperceiver.py:111-150,
    # uniperceiver_adapter.py)
    block_type: str = "timm"
    layerscale_init: float = 0.1
    # per-block window-attention flags (base/vit.py WindowedAttention; the
    # COCO/ADE recipes use (True, True, False) x 4). None = all global.
    window_attn: Optional[Tuple[bool, ...]] = None
    window_size: int = 14

    def beit_cfg(self, window: Tuple[int, int]):
        from metatransformer_tpu.core import beit as beit_mod

        e = self.encoder
        return beit_mod.BEiTConfig(
            dim=e.dim, depth=e.depth, num_heads=e.num_heads,
            mlp_ratio=e.mlp_ratio, window=window,
            init_values=self.layerscale_init,
        )

    @property
    def injector_cfg(self) -> msda.MSDeformAttnConfig:
        return msda.MSDeformAttnConfig(
            dim=self.encoder.dim, num_heads=self.deform_num_heads,
            num_levels=3, num_points=self.n_points, ratio=self.deform_ratio,
        )

    @property
    def extractor_cfg(self) -> msda.MSDeformAttnConfig:
        return msda.MSDeformAttnConfig(
            dim=self.encoder.dim, num_heads=self.deform_num_heads,
            num_levels=1, num_points=self.n_points, ratio=self.deform_ratio,
        )


def _conv_block_init(key, cin, cout, k=3):
    k1, _ = jax.random.split(key)
    fan = k * k * cin
    return {
        "w": jax.random.normal(k1, (k, k, cin, cout)) * np.sqrt(2.0 / fan),
        "b": jnp.zeros((cout,), jnp.float32),
        "gn_scale": jnp.ones((cout,), jnp.float32),
        "gn_bias": jnp.zeros((cout,), jnp.float32),
    }


def _spm_init(cfg: ViTAdapterConfig, key: jax.Array) -> Dict[str, Any]:
    c, d = cfg.conv_inplane, cfg.encoder.dim
    keys = jax.random.split(key, 10)
    params = {
        "stem1": _conv_block_init(keys[0], 3, c),
        "stem2": _conv_block_init(keys[1], c, c),
        "stem3": _conv_block_init(keys[2], c, c),
        "conv2": _conv_block_init(keys[3], c, 2 * c),
        "conv3": _conv_block_init(keys[4], 2 * c, 4 * c),
        "conv4": _conv_block_init(keys[5], 4 * c, 4 * c),
    }
    for i, cin in zip((1, 2, 3, 4), (c, 2 * c, 4 * c, 4 * c)):
        params[f"fc{i}"] = {
            "w": jax.random.normal(keys[5 + i], (1, 1, cin, d)) * (cin**-0.5),
            "b": jnp.zeros((d,), jnp.float32),
        }
    return params


def _cb(x, p, stride=1):
    x = conv2d(x, p["w"], p["b"], stride=stride)
    x = group_norm(x, p["gn_scale"], p["gn_bias"])
    return jax.nn.relu(x)


def _spm_apply(params, images):
    """images [B, H, W, 3] -> c1 (1/4), c2 (1/8), c3 (1/16), c4 (1/32)."""
    x = _cb(images, params["stem1"], stride=2)
    x = _cb(x, params["stem2"])
    x = _cb(x, params["stem3"])
    c1 = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "SAME"
    )
    c2 = _cb(c1, params["conv2"], stride=2)
    c3 = _cb(c2, params["conv3"], stride=2)
    c4 = _cb(c3, params["conv4"], stride=2)
    c1 = conv2d(c1, params["fc1"]["w"], params["fc1"]["b"])
    c2 = conv2d(c2, params["fc2"]["w"], params["fc2"]["b"])
    c3 = conv2d(c3, params["fc3"]["w"], params["fc3"]["b"])
    c4 = conv2d(c4, params["fc4"]["w"], params["fc4"]["b"])
    return c1, c2, c3, c4


def _ref_points(shapes: Sequence[Tuple[int, int]]) -> np.ndarray:
    """Normalized pixel-center reference points for the given level grid
    list, concatenated: [1, sum(H*W), 2] (deform_inputs :28 semantics)."""
    pts = []
    for h, w in shapes:
        yy, xx = np.meshgrid(
            (np.arange(h) + 0.5) / h, (np.arange(w) + 0.5) / w, indexing="ij"
        )
        pts.append(np.stack([xx, yy], -1).reshape(-1, 2))
    return np.concatenate(pts, 0)[None].astype(np.float32)


def _ln(x, p, name, eps=1e-6):
    return enc.layer_norm(x, p[f"{name}_scale"], p[f"{name}_bias"], eps)


def _interaction_init(cfg: ViTAdapterConfig, key: jax.Array) -> Dict[str, Any]:
    d = cfg.encoder.dim
    keys = jax.random.split(key, 6)
    dw_fan = 3 * 3
    hidden = d // 4
    return {
        # Injector
        "inj_query_norm_scale": jnp.ones((d,)), "inj_query_norm_bias": jnp.zeros((d,)),
        "inj_feat_norm_scale": jnp.ones((d,)), "inj_feat_norm_bias": jnp.zeros((d,)),
        "inj_attn": msda.init(cfg.injector_cfg, keys[0]),
        "inj_gamma": jnp.zeros((d,), jnp.float32),  # zero-init residual gate
        # Extractor
        "ext_query_norm_scale": jnp.ones((d,)), "ext_query_norm_bias": jnp.zeros((d,)),
        "ext_feat_norm_scale": jnp.ones((d,)), "ext_feat_norm_bias": jnp.zeros((d,)),
        "ext_attn": msda.init(cfg.extractor_cfg, keys[1]),
        # ConvFFN (fc1 -> DWConv3x3 -> GELU -> fc2) on spatial tokens
        "ffn_norm_scale": jnp.ones((d,)), "ffn_norm_bias": jnp.zeros((d,)),
        "ffn_fc1_w": jax.random.normal(keys[2], (d, hidden)) * d**-0.5,
        "ffn_fc1_b": jnp.zeros((hidden,)),
        "ffn_dw_w": jax.random.normal(keys[3], (3, 3, 1, hidden)) * np.sqrt(
            2.0 / dw_fan
        ),
        "ffn_dw_b": jnp.zeros((hidden,)),
        "ffn_fc2_w": jax.random.normal(keys[4], (hidden, d)) * hidden**-0.5,
        "ffn_fc2_b": jnp.zeros((d,)),
    }


def init(cfg: ViTAdapterConfig, key: jax.Array) -> Dict[str, Any]:
    keys = jax.random.split(key, 4 + len(cfg.interaction_indexes))
    d = cfg.encoder.dim
    grid = cfg.img_size // cfg.patch_size
    if cfg.block_type == "beit":
        from metatransformer_tpu.core import beit as beit_mod

        enc_params = beit_mod.init(cfg.beit_cfg((grid, grid)), keys[0])
    elif cfg.block_type == "uniperceiver":
        from metatransformer_tpu.core import beit as beit_mod

        enc_params = dict(beit_mod.init(cfg.beit_cfg((grid, grid)), keys[0]))
        del enc_params["rel_pos_table"]  # BertLayer has no rel-pos-bias
        enc_params["k_bias"] = jnp.zeros(
            (cfg.encoder.depth, cfg.encoder.dim), jnp.float32
        )
        # UniPerceiver initializes LayerScale at zero (uniperceiver.py:129)
        enc_params["gamma_1"] = jnp.zeros_like(enc_params["gamma_1"])
        enc_params["gamma_2"] = jnp.zeros_like(enc_params["gamma_2"])
    else:
        enc_params = enc.init(cfg.encoder, keys[0])
    params: Dict[str, Any] = {
        "encoder": enc_params,
        "patch_w": jax.random.normal(
            keys[1], (cfg.patch_size * cfg.patch_size * 3, d)
        ) * (cfg.patch_size * cfg.patch_size * 3) ** -0.5,
        "patch_b": jnp.zeros((d,), jnp.float32),
        "pos_embed": jax.random.normal(keys[2], (1, grid * grid, d)) * 0.02,
        "spm": _spm_init(cfg, keys[3]),
        "level_embed": jax.random.normal(keys[3], (3, d)) * 0.02,
    }
    for i in range(len(cfg.interaction_indexes)):
        params[f"interaction{i}"] = _interaction_init(cfg, keys[4 + i])
    return params


def apply(
    params: Dict[str, Any],
    images: jax.Array,  # [B, H, W, 3]
    cfg: ViTAdapterConfig,
    precision: enc.Precision = enc.FP32,
) -> List[jax.Array]:
    """-> [f1, f2, f3, f4] NHWC feature maps at 1/4, 1/8, 1/16, 1/32."""
    b, H, W, _ = images.shape
    d = cfg.encoder.dim
    gh, gw = H // cfg.patch_size, W // cfg.patch_size

    # spatial prior pyramid
    c1, c2, c3, c4 = _spm_apply(params["spm"], images)
    shapes_c = [c2.shape[1:3], c3.shape[1:3], c4.shape[1:3]]
    c_tokens = jnp.concatenate(
        [
            c2.reshape(b, -1, d) + params["level_embed"][0],
            c3.reshape(b, -1, d) + params["level_embed"][1],
            c4.reshape(b, -1, d) + params["level_embed"][2],
        ],
        axis=1,
    )

    # ViT patch tokens
    from metatransformer_tpu.tokenizers import image as image_tok

    patches = image_tok.patchify(images, cfg.patch_size)
    x = jnp.dot(patches, params["patch_w"], precision=MM) + params["patch_b"]
    pos = params["pos_embed"]
    if pos.shape[1] != gh * gw:  # bicubic pos-embed resize (vit_adapter :102-105)
        g0 = int(np.sqrt(pos.shape[1]))
        pos2d = pos.reshape(1, g0, g0, d)
        pos = jax.image.resize(pos2d, (1, gh, gw, d), "bicubic").reshape(1, -1, d)
    x = x + pos

    refp_x = jnp.asarray(_ref_points([(gh, gw)]))  # queries at 1/16
    refp_x3 = jnp.tile(refp_x[:, :, None, :], (b, 1, 3, 1))
    refp_c = jnp.asarray(_ref_points(shapes_c))
    refp_c1 = jnp.tile(refp_c[:, :, None, :], (b, 1, 1, 1))

    def interaction_step(x, c_tokens, ip, enc_layers, win_flags=None):
        # Injector: ViT tokens attend the spatial pyramid
        q = _ln(x, ip, "inj_query_norm")
        v = _ln(c_tokens, ip, "inj_feat_norm")
        x = x + ip["inj_gamma"] * msda.apply(
            ip["inj_attn"], q, refp_x3, v, shapes_c, cfg.injector_cfg
        )
        # frozen ViT blocks slice
        if cfg.block_type == "beit":
            from metatransformer_tpu.core import beit as beit_mod

            bcfg = cfg.beit_cfg((gh, gw))
            # adapter tokens carry no cls: drop the table's cls row/col
            rel_idx = jnp.asarray(
                beit_mod.relative_position_index((gh, gw))[1:, 1:]
            )

            rel_idx_win = jnp.asarray(
                beit_mod.windowed_relative_position_index(
                    (gh, gw), cfg.window_size
                )
            )

            def blk(carry, lp, ridx=rel_idx):
                return beit_mod.block(carry, lp, bcfg, ridx, precision), None

        elif cfg.block_type == "uniperceiver":
            from metatransformer_tpu.core import beit as beit_mod

            bcfg = cfg.beit_cfg((gh, gw))

            def blk(carry, lp):
                return beit_mod.block(carry, lp, bcfg, None, precision), None

        else:

            def blk(carry, lp):
                return enc.block(carry, lp, cfg.encoder, None, precision), None

        if win_flags is None:
            x, _ = jax.lax.scan(blk, x, enc_layers)
        else:
            # per-block windowed/global mix (base/vit.py window_attn):
            # static flags -> unrolled slice (3 block bodies per slice)
            from metatransformer_tpu.ops import window_attention as win

            for j, use_w in enumerate(win_flags):
                lp = {k: v[j] for k, v in enc_layers.items()}
                if use_w and cfg.block_type == "beit":
                    # shared rel-pos table, window-strided indices
                    body = lambda h, lp=lp: blk(h, lp, rel_idx_win)[0]
                else:
                    body = lambda h, lp=lp: blk(h, lp)[0]
                if use_w:
                    x = win.windowed_block(x, body, gh, gw, cfg.window_size)
                else:
                    x = body(x)
        # Extractor: spatial tokens attend ViT tokens
        q = _ln(c_tokens, ip, "ext_query_norm")
        v = _ln(x, ip, "ext_feat_norm")
        c_tokens = c_tokens + msda.apply(
            ip["ext_attn"], q, refp_c1, v, [(gh, gw)], cfg.extractor_cfg
        )
        # ConvFFN with depthwise conv per pyramid level
        hffn = _ln(c_tokens, ip, "ffn_norm")
        hffn = jnp.dot(hffn, ip["ffn_fc1_w"], precision=MM) + ip["ffn_fc1_b"]
        n2 = shapes_c[0][0] * shapes_c[0][1]
        n3 = n2 + shapes_c[1][0] * shapes_c[1][1]
        parts = []
        for (hs, ws), sl in zip(
            shapes_c, (slice(0, n2), slice(n2, n3), slice(n3, None))
        ):
            seg = hffn[:, sl].reshape(b, hs, ws, -1)
            seg = conv2d(seg, ip["ffn_dw_w"], ip["ffn_dw_b"],
                         groups=seg.shape[-1])
            parts.append(seg.reshape(b, hs * ws, -1))
        hffn = jax.nn.gelu(jnp.concatenate(parts, 1), approximate=False)
        hffn = jnp.dot(hffn, ip["ffn_fc2_w"], precision=MM) + ip["ffn_fc2_b"]
        return x, c_tokens + hffn

    idxs = cfg.interaction_indexes
    lengths = {hi - lo + 1 for lo, hi in idxs}
    contiguous = all(
        idxs[i][0] == idxs[i - 1][1] + 1 for i in range(1, len(idxs))
    ) and idxs[0][0] == 0
    if cfg.window_attn is None:
        slice_flags = [None] * len(idxs)
        uniform_flags = True
    else:
        slice_flags = [tuple(cfg.window_attn[lo : hi + 1]) for lo, hi in idxs]
        uniform_flags = len(set(slice_flags)) == 1
    if len(lengths) == 1 and contiguous and uniform_flags:
        # Uniform slices: scan over stacked interactions — one compiled
        # interaction body instead of len(idxs) copies (4x faster compile,
        # measured 217s -> ~60s at 256px).
        per = lengths.pop()
        n_inter = len(idxs)
        stacked_ip = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            *[params[f"interaction{i}"] for i in range(n_inter)],
        )
        stacked_enc = {
            k: v[: n_inter * per].reshape(n_inter, per, *v.shape[1:])
            for k, v in params["encoder"].items()
        }

        def body(carry, scanned):
            xx, cc = carry
            ip, enc_layers = scanned
            xx, cc = interaction_step(xx, cc, ip, enc_layers, slice_flags[0])
            return (xx, cc), None

        (x, c_tokens), _ = jax.lax.scan(
            body, (x, c_tokens), (stacked_ip, stacked_enc)
        )
    else:
        for i, (lo, hi) in enumerate(idxs):
            enc_layers = {
                k: v[lo : hi + 1] for k, v in params["encoder"].items()
            }
            x, c_tokens = interaction_step(
                x, c_tokens, params[f"interaction{i}"], enc_layers,
                slice_flags[i],
            )

    # split pyramid back to maps
    n2 = shapes_c[0][0] * shapes_c[0][1]
    n3 = n2 + shapes_c[1][0] * shapes_c[1][1]
    f2 = c_tokens[:, :n2].reshape(b, *shapes_c[0], d)
    f3 = c_tokens[:, n2:n3].reshape(b, *shapes_c[1], d)
    f4 = c_tokens[:, n3:].reshape(b, *shapes_c[2], d)
    f1 = c1 + resize(f2, c1.shape[1:3])

    if cfg.add_vit_feature:
        xmap = x.reshape(b, gh, gw, d)
        f1 = f1 + resize(xmap, f1.shape[1:3])
        f2 = f2 + resize(xmap, f2.shape[1:3])
        f3 = f3 + xmap if f3.shape[1:3] == (gh, gw) else f3 + resize(
            xmap, f3.shape[1:3]
        )
        f4 = f4 + resize(xmap, f4.shape[1:3])
    return [f1, f2, f3, f4]

"""Stratified Transformer segmentation backbone.

Reference: ``PointCloud/openpoints/models/backbone/Stratified_transformer.py``
(StratifiedEncoder/StratifiedDecoder) — a KPConv stem (:367-417), a
hierarchy of shifted-window point-attention stages where each query
attends to (a) every point in its fine window and (b) *FPS-downsampled*
points in the surrounding 2x coarse window that lie outside its fine
window (the "stratified" long-range keys, ``get_indice_pairs`` :13-45),
contextual relative-position bias from per-axis quantized tables
(``WindowAttention`` :120-232, cRPE via ``dot_prod_with_idx_v3``),
``TransitionDown`` FPS+kNN+LN+linear+maxpool pooling (:93-117), and an
interpolation decoder (``Upsample`` :351-364).

TPU-native deltas: the reference builds ragged (index_0, index_1) pair
lists with CUDA scatter kernels (``pointops.attention_step1_v2`` etc.);
here the same pair sets are expressed as a fixed-shape [B, N, N] boolean
mask over dense multi-head attention — identical math (masked softmax
over exactly the reference's pair set), static shapes, MXU-tiled. The
cRPE gathers become one-hot einsums over the small quantization table.
The KPConv kernel-point dispositions are a deterministic center +
Fibonacci sphere (torch_points3d ships optimized dispositions as a data
file; the linear-correlation kernel math is identical).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.ops import point_interp, point_ops


@dataclasses.dataclass(frozen=True)
class StratifiedConfig:
    """Defaults per Stratified_transformer.py:420-457 (num_classes=13 S3DIS,
    ratio=0.25, k=16, stem_transformer=False -> KPConv stem + layer_start 1)
    with the paper's S3DIS channel/depth/head ladder."""

    num_classes: int = 13
    in_channels: int = 3  # per-point features (rgb); xyz drives geometry
    channels: Tuple[int, ...] = (48, 96, 192, 384)
    depths: Tuple[int, ...] = (2, 2, 6, 2)  # depths[0] unused (KPConv stem)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: float = 0.16  # stage-1 fine window edge; x2 per stage
    quant_size: float = 0.04  # stage-1 cRPE quantization; x2 per stage
    grid_size: float = 0.04  # stem KPConv influence scale
    downsample_scale: int = 4  # stratified-key FPS sparsity
    ratio: float = 0.25  # TransitionDown keep ratio
    k: int = 16  # TransitionDown kNN / stem ball-query cap
    sigma: float = 1.0
    n_kernel_pts: int = 15
    mlp_ratio: float = 4.0

    @property
    def quant_len(self) -> int:
        # quant_grid_length (:148); ws/quant double together so one value
        return int((2 * self.window_size + 1e-4) // self.quant_size)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _bn(p: Dict[str, jax.Array], x: jax.Array) -> jax.Array:
    """Stateless batch-stat norm + affine (FastBatchNorm1d training-mode
    semantics, no running stats) over all axes but the channel."""
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x, axes, keepdims=True)
    var = jnp.var(x, axes, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + 1e-5) * p["scale"] + p["bias"]


def _ln(p: Dict[str, jax.Array], x: jax.Array) -> jax.Array:
    mean = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + 1e-6) * p["scale"] + p["bias"]


def _norm_init(c: int) -> Dict[str, jax.Array]:
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}


def _linear_init(key, i, o, bias=True):
    p = {"w": jax.random.truncated_normal(key, -2, 2, (i, o)) * 0.02}
    if bias:
        p["b"] = jnp.zeros((o,))
    return p


def _linear(p, x):
    y = x @ p["w"]
    return y + p["b"] if "b" in p else y


def _kernel_points(n: int, radius: float) -> np.ndarray:
    """Deterministic center + Fibonacci-sphere dispositions."""
    pts = [np.zeros(3)]
    m = n - 1
    golden = np.pi * (3.0 - np.sqrt(5.0))
    for i in range(m):
        z = 1.0 - 2.0 * (i + 0.5) / m
        r = np.sqrt(max(1.0 - z * z, 0.0))
        th = golden * i
        pts.append(np.array([r * np.cos(th), r * np.sin(th), z]) * radius)
    return np.stack(pts).astype(np.float32)  # [n, 3]


# ---------------------------------------------------------------------------
# KPConv stem (KPConvSimpleBlock / KPConvResBlock, :367-417)
# ---------------------------------------------------------------------------


def _kpconv_init(key, cin, cout, n_kp):
    return {"w": jax.random.truncated_normal(key, -2, 2, (n_kp, cin, cout))
            * np.sqrt(1.0 / (cin * n_kp))}


def _kpconv(p, xyz, feats, nidx, kp, infl):
    """Linear-correlation KPConv (KPConvLayer math): out_i =
    sum_j sum_k max(0, 1 - |x_j - x_i - kp_k| / infl) (f_j W_k)."""
    xj = point_ops.gather_points(xyz, nidx)  # [B, N, M, 3]
    fj = point_ops.gather_points(feats, nidx)  # [B, N, M, C]
    disp = xj - xyz[:, :, None, :]  # [B, N, M, 3]
    d = jnp.linalg.norm(
        disp[:, :, :, None, :] - kp[None, None, None, :, :], axis=-1
    )  # [B, N, M, K]
    w = jnp.maximum(1.0 - d / infl, 0.0)
    return jnp.einsum("bnmk,bnmc,kco->bno", w, fj, p["w"])


def _stem_init(key, cfg: StratifiedConfig):
    c0 = cfg.channels[0]
    d2 = max(c0 // 4, 1)
    keys = iter(jax.random.split(key, 8))
    return {
        "kp1": _kpconv_init(next(keys), cfg.in_channels, c0, cfg.n_kernel_pts),
        "bn1": _norm_init(c0),
        "unary1": _linear_init(next(keys), c0, d2, bias=False),
        "ubn1": _norm_init(d2),
        "kp2": _kpconv_init(next(keys), d2, d2, cfg.n_kernel_pts),
        "unary2": _linear_init(next(keys), d2, c0, bias=False),
        "ubn2": _norm_init(c0),
        "bn2": _norm_init(c0),
    }


def _stem(p, xyz, feats, cfg: StratifiedConfig):
    radius = 2.5 * cfg.grid_size * cfg.sigma  # forward_seg_feat:501
    k_eff = min(cfg.k, xyz.shape[1])
    nidx = point_ops.ball_query(xyz, xyz, radius, k_eff)
    infl = cfg.grid_size * cfg.sigma  # point_influence (:370)
    kp = jnp.asarray(_kernel_points(cfg.n_kernel_pts, infl))
    lrelu = functools.partial(jax.nn.leaky_relu, negative_slope=0.2)
    # KPConvSimpleBlock
    h = lrelu(_bn(p["bn1"], _kpconv(p["kp1"], xyz, feats, nidx, kp, infl)))
    # KPConvResBlock (in==out -> identity shortcut)
    sc = h
    u = lrelu(_bn(p["ubn1"], _linear(p["unary1"], h)))
    u = _kpconv(p["kp2"], xyz, u, nidx, kp, infl)
    u = lrelu(_bn(p["ubn2"], _linear(p["unary2"], u)))
    return sc + u


# ---------------------------------------------------------------------------
# TransitionDown (:93-117)
# ---------------------------------------------------------------------------


def _down_init(key, cin, cout):
    return {"norm": _norm_init(cin), "lin": _linear_init(key, cin, cout, False)}


def _transition_down(p, xyz, feats, cfg: StratifiedConfig):
    n = xyz.shape[1]
    m = max(int(n * cfg.ratio), 1)
    idx = point_ops.furthest_point_sample(xyz, m)
    new_xyz = point_ops.gather_points(xyz, idx)
    k_eff = min(cfg.k, n)
    _, nidx = point_ops.knn(new_xyz, xyz, k_eff)
    fj = point_ops.gather_points(feats, nidx)  # [B, m, k, C]
    h = _linear(p["lin"], _ln(p["norm"], fj))
    return new_xyz, jnp.max(h, axis=2)


# ---------------------------------------------------------------------------
# stratified window attention
# ---------------------------------------------------------------------------


def _attn_init(key, c, heads, l2):
    hd = c // heads
    keys = iter(jax.random.split(key, 6))
    return {
        "qkv": _linear_init(next(keys), c, 3 * c),
        "proj": _linear_init(next(keys), c, c),
        # relative_pos_{query,key}_table [2L, H, hd, 3] (:151-155)
        "rel_q": jax.random.truncated_normal(
            next(keys), -2, 2, (l2, heads, hd, 3)) * 0.02,
        "rel_k": jax.random.truncated_normal(
            next(keys), -2, 2, (l2, heads, hd, 3)) * 0.02,
    }


def _window_masks(xyz, ws, shifted, down_mask):
    """The reference pair set as a dense [B, N, N] bool mask:
    fine-window pairs (get_indice_pairs:17-21) OR stratified pairs —
    downsampled key in the same 2x coarse window but a different fine
    window (:23-41). Shifted blocks offset both grids by half a window."""
    mn = jnp.min(xyz, axis=1, keepdims=True)
    f_shift = 0.5 * ws if shifted else 0.0
    c_shift = ws if shifted else 0.0  # 1/2 * (2 ws) (:319)
    fc = jnp.floor((xyz - mn + f_shift) / ws)
    cc = jnp.floor((xyz - mn + c_shift) / (2.0 * ws))
    fine = jnp.all(fc[:, :, None, :] == fc[:, None, :, :], -1)
    coarse = jnp.all(cc[:, :, None, :] == cc[:, None, :, :], -1)
    strat = coarse & down_mask[:, None, :] & ~fine
    return fine | strat


def _window_attention(p, feats, xyz, allowed, ws, quant, l2, heads):
    b, n, c = feats.shape
    hd = c // heads
    qkv = _linear(p["qkv"], feats).reshape(b, n, 3, heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    q = q * (hd ** -0.5)  # scale BEFORE both dot and cRPE (:187-188)
    attn = jnp.einsum("bnhd,bmhd->bnmh", q, k)

    # cRPE: per-axis quantized relative-position index (:191-195)
    rel = xyz[:, :, None, :] - xyz[:, None, :, :]
    rel = jnp.round(rel * 1e5) / 1e5
    idx = jnp.floor((rel + 2.0 * ws - 1e-4) / quant)
    idx = jnp.clip(idx, 0, l2 - 1).astype(jnp.int32)  # [B, N, M, 3]
    # dot_prod_with_idx_v3: bias = q . Tq[idx] + k . Tk[idx], summed per axis
    qdot = jnp.einsum("bnhd,lhda->bnhla", q, p["rel_q"])  # [B,N,H,L2,3]
    kdot = jnp.einsum("bmhd,lhda->bmhla", k, p["rel_k"])
    bias = jnp.zeros_like(attn)
    for a in range(3):
        oh = jax.nn.one_hot(idx[..., a], l2, dtype=feats.dtype)  # [B,N,M,L2]
        bias = bias + jnp.einsum("bnhl,bnml->bnmh", qdot[..., a], oh)
        bias = bias + jnp.einsum("bmhl,bnml->bnmh", kdot[..., a], oh)
    attn = attn + bias

    attn = jnp.where(allowed[..., None], attn, -1e9)
    attn = jax.nn.softmax(attn, axis=2)
    out = jnp.einsum("bnmh,bmhd->bnhd", attn, v).reshape(b, n, c)
    return _linear(p["proj"], out)


def _block_init(key, c, heads, l2, mlp_ratio):
    keys = iter(jax.random.split(key, 4))
    hidden = int(c * mlp_ratio)
    return {
        "ln1": _norm_init(c),
        "attn": _attn_init(next(keys), c, heads, l2),
        "ln2": _norm_init(c),
        "fc1": _linear_init(next(keys), c, hidden),
        "fc2": _linear_init(next(keys), hidden, c),
    }


def _block(p, feats, xyz, allowed, ws, quant, l2, heads):
    h = _window_attention(
        p["attn"], _ln(p["ln1"], feats), xyz, allowed, ws, quant, l2, heads
    )
    feats = feats + h
    m = _linear(p["fc2"], jax.nn.gelu(_linear(p["fc1"], _ln(p["ln2"], feats))))
    return feats + m


def _stage(params: List[Dict], feats, xyz, ws, quant, cfg, stage_idx):
    """BasicLayer (:266-348): one FPS stratified-key draw per stage, masks
    alternating non-shifted / shifted per block."""
    n = xyz.shape[1]
    n_down = max(n // cfg.downsample_scale, 1)
    didx = point_ops.furthest_point_sample(xyz, n_down)  # (:309)
    b = xyz.shape[0]
    down_mask = jnp.zeros((b, n), bool).at[
        jnp.arange(b)[:, None], didx
    ].set(True)
    masks = {
        False: _window_masks(xyz, ws, False, down_mask),
        True: _window_masks(xyz, ws, True, down_mask),
    }
    l2 = 2 * cfg.quant_len
    heads = cfg.num_heads[stage_idx]
    for i, bp in enumerate(params):
        feats = _block(bp, feats, xyz, masks[bool(i % 2)], ws, quant, l2, heads)
    return feats


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------


def init(cfg: StratifiedConfig, key: jax.Array) -> Dict[str, Any]:
    n_stage = len(cfg.channels) - 1  # stages 1..3 (layer_start=1, :449)
    keys = iter(jax.random.split(key, 4 + 2 * n_stage + 16))
    l2 = 2 * cfg.quant_len
    params: Dict[str, Any] = {
        "stem": _stem_init(next(keys), cfg),
        "down0": _down_init(next(keys), cfg.channels[0], cfg.channels[1]),
        "stages": [],
        "downs": [],
        "ups": [],
    }
    for s in range(1, len(cfg.channels)):
        params["stages"].append([
            _block_init(next(keys), cfg.channels[s], cfg.num_heads[s], l2,
                        cfg.mlp_ratio)
            for _ in range(cfg.depths[s])
        ])
        if s < len(cfg.channels) - 1:
            params["downs"].append(
                _down_init(next(keys), cfg.channels[s], cfg.channels[s + 1])
            )
    # Upsample(:351-364): linear1 on the skip, linear2 on the coarse feats
    for s in range(len(cfg.channels) - 1, 0, -1):
        ci, co = cfg.channels[s], cfg.channels[s - 1]
        params["ups"].append({
            "norm1": _norm_init(co), "lin1": _linear_init(next(keys), co, co),
            "norm2": _norm_init(ci), "lin2": _linear_init(next(keys), ci, co),
        })
    c0 = cfg.channels[0]
    params["head"] = {
        "fc1": _linear_init(next(keys), c0, c0),
        "norm": _norm_init(c0),
        "fc2": _linear_init(next(keys), c0, cfg.num_classes),
    }
    return params


@functools.partial(jax.jit, static_argnames=("cfg",))
def forward(
    params: Dict[str, Any],
    points: jax.Array,  # [B, N, 3]
    cfg: StratifiedConfig,
    features: Optional[jax.Array] = None,  # [B, N, in_channels]
) -> jax.Array:
    """Per-point segmentation logits [B, N, num_classes]
    (forward_seg_feat :496-528 + StratifiedDecoder :554-558)."""
    xyz = points[..., :3]
    feats = features if features is not None else points[..., : cfg.in_channels]

    feats = _stem(params["stem"], xyz, feats, cfg)
    skips = [(xyz, feats)]
    xyz_s, feats_s = _transition_down(params["down0"], xyz, feats, cfg)

    n_stage = len(cfg.channels) - 1
    for s in range(1, n_stage + 1):
        ws = cfg.window_size * (2.0 ** (s - 1))
        quant = cfg.quant_size * (2.0 ** (s - 1))
        feats_s = _stage(
            params["stages"][s - 1], feats_s, xyz_s, ws, quant, cfg, s
        )
        if s < n_stage:
            skips.append((xyz_s, feats_s))
            xyz_s, feats_s = _transition_down(
                params["downs"][s - 1], xyz_s, feats_s, cfg
            )

    for up in params["ups"]:
        skip_xyz, skip_feats = skips.pop()
        interp = point_interp.three_interpolation(
            skip_xyz, xyz_s, _linear(up["lin2"], _ln(up["norm2"], feats_s))
        )
        feats_s = _linear(up["lin1"], _ln(up["norm1"], skip_feats)) + interp
        xyz_s = skip_xyz

    h = params["head"]
    out = jax.nn.gelu(_ln(h["norm"], _linear(h["fc1"], feats_s)))
    return _linear(h["fc2"], out)


def _register() -> None:
    import types

    from metatransformer_tpu.utils.registry import MODELS

    if "StratifiedTransformer" not in MODELS:
        MODELS._entries["StratifiedTransformer"] = types.SimpleNamespace(
            init=init, forward=forward, Config=StratifiedConfig
        )


_register()

"""The shared (usually frozen) Meta-Transformer ViT encoder, TPU-native.

This is the single implementation that replaces the eight copies of
``nn.Sequential(*[timm.Block(...)])`` in the reference (see e.g.
``/root/reference/README.md:124-135``,
``PointCloud/openpoints/models/backbone/metatransformer.py:84-98``,
``Time-Series/models/MetaTransformer.py:26-41``).

Design notes (TPU-first, not a translation):

* Parameters are a plain pytree of arrays **stacked along a leading depth
  axis** so the whole encoder runs as a single ``jax.lax.scan`` over layers.
  Compile time is O(1) in depth and XLA sees one fused block body; this is
  the idiomatic way to express a homogeneous transformer stack on TPU.
* Numerics match timm's ``Block(dim, num_heads, mlp_ratio=4., qkv_bias=True,
  norm_layer=nn.LayerNorm, act_layer=nn.GELU)``: pre-LN, LayerNorm eps=1e-5
  (torch default), fused qkv projection, scale = head_dim**-0.5, exact
  (erf) GELU, no LayerScale / no qk-norm (Identity in the checkpoints).
* ``pos_each_block``: the point-cloud backbone adds the positional embedding
  at the *input of every block* (``metatransformer.py:161-163``); supported
  here as an optional scan-carried addend.
* Masked attention: ragged multi-modality batches are handled with bucketed
  padding + a boolean keep-mask (reference pads too, e.g. the TokenGT
  collator ``Data2Seq/Graph.py:99-144``).
* Precision: params live in fp32; compute can run in bf16 (MXU-native) with
  fp32 softmax/LayerNorm. Controlled by :class:`Precision`.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

Params = Dict[str, jax.Array]

# Intermediates tagged with checkpoint_name in the XLA block path; the
# remat="save" policy saves exactly these so the backward pass recomputes
# nothing but cheap elementwise ops (LN stats, GELU).
SAVE_NAMES = (
    "attn_q", "attn_k", "attn_v", "attn_probs", "attn_o", "mlp_hidden",
)


@dataclasses.dataclass(frozen=True)
class Precision:
    """Compute precision policy. Params are always stored fp32.

    ``mm`` is the XLA dot precision: on TPU, fp32 matmuls default to
    bf16-input passes, so true-fp32 parity requires Precision.HIGHEST;
    the bf16 policy keeps DEFAULT (native MXU bf16, fp32 accumulate).
    """

    compute_dtype: Any = jnp.float32  # matmul / activation dtype
    mm: jax.lax.Precision = jax.lax.Precision.HIGHEST
    # softmax + layernorm always accumulate in fp32.

    @property
    def is_bf16(self) -> bool:
        return self.compute_dtype == jnp.bfloat16


FP32 = Precision(jnp.float32, jax.lax.Precision.HIGHEST)
BF16 = Precision(jnp.bfloat16, jax.lax.Precision.DEFAULT)


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    ln_eps: float = 1e-5  # torch nn.LayerNorm default, as in README demo
    attn_impl: str = "auto"  # "xla" | "flash" | "auto" | "performer"
    # Rematerialization policy for training (see :func:`encode`):
    #   False  — no jax.checkpoint; the fused Pallas sublayers' custom VJP
    #            recomputes each sublayer in backward (lowest memory that
    #            still serves fast; ~4x forward FLOPs per train step).
    #   True   — full per-block remat (the reference's `with_cp`).
    #   "save" — save the matmul intermediates (post-LN, qkv, probs,
    #            pre-GELU hidden) during forward so backward recomputes
    #            nothing: 3x forward FLOPs full-FT, ~2x frozen. Costs
    #            O(depth * B * T * (2D + 3D + H*T + mlp_dim)) activation
    #            HBM; the train-throughput winner where it fits
    #            (scripts/bench_train_variants.py).
    remat: Any = False
    # FAVOR+ options (attn_impl="performer" only; the optional TokenGT
    # path, Graph/metatransformer/modules/performer_pytorch.py:61-151).
    # 0 features -> 2 * head_dim. Redraw = bump the seed (one recompile).
    performer_features: int = 0
    performer_seed: int = 0
    # attn_impl="ring" only: the mesh axis the token dim is sharded over
    # (use inside jax.shard_map; see parallel/ring_attention.py).
    ring_axis: str = "seq"

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads

    @property
    def mlp_dim(self) -> int:
        return int(self.dim * self.mlp_ratio)


# The two released checkpoints (README.md:100-103).
BASE = EncoderConfig(dim=768, depth=12, num_heads=12)
LARGE = EncoderConfig(dim=1024, depth=24, num_heads=16)

# Graph/TokenGT runs the same 768-wide blocks with num_heads=32
# (Graph/metatransformer/modules/tokengt_graph_encoder.py:191-206).
GRAPH_BASE = EncoderConfig(dim=768, depth=12, num_heads=32)


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float) -> jax.Array:
    """LayerNorm over the last axis, fp32 accumulation."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def attention(
    x: jax.Array,
    p: Params,
    cfg: EncoderConfig,
    mask: Optional[jax.Array],
    precision: Precision,
) -> jax.Array:
    """timm-Attention-equivalent multi-head self-attention.

    Matches ``timm.models.vision_transformer.Attention`` semantics
    (fused qkv Linear with bias, per-head scale, output proj), computed
    in head-major layout: q/k/v are produced directly as [B,H,T,d] via
    einsum against the reshaped fused-qkv weight, so no [B,T,3,H,d]
    materialization / permutes exist between the projections and the
    attention contractions (measured +28% end-to-end on v5e at T=197).
    """
    b, t, d = x.shape
    h, hd = cfg.num_heads, cfg.head_dim
    cd = precision.compute_dtype
    mm = precision.mm
    xc = x.astype(cd)
    w = p["qkv_w"].astype(cd).reshape(d, 3, h, hd)
    b3 = p["qkv_b"].astype(cd).reshape(3, h, hd)
    scale = float(hd) ** -0.5

    impl = cfg.attn_impl
    if impl == "auto":
        impl = "flash" if _flash_supported(t, hd) else "xla"
    if impl in ("flash", "ring"):
        # both want [B, T, H, d]
        q = jnp.einsum("btd,dhk->bthk", xc, w[:, 0], precision=mm) + b3[0]
        k = jnp.einsum("btd,dhk->bthk", xc, w[:, 1], precision=mm) + b3[1]
        v = jnp.einsum("btd,dhk->bthk", xc, w[:, 2], precision=mm) + b3[2]
        if impl == "ring":
            # sequence-parallel exact attention: T is a shard_map-local
            # shard; K/V rotate around cfg.ring_axis (SURVEY §5.7).
            from metatransformer_tpu.parallel import ring_attention as _ra

            out = _ra.ring_attention(
                q, k, v, axis_name=cfg.ring_axis, mask=mask, scale=scale
            )
        else:
            from metatransformer_tpu.ops import flash_attention as _fa

            out = _fa.flash_attention(q, k, v, mask=mask, scale=scale)
        out = out.reshape(b, t, d)
        out = (
            jnp.dot(out, p["proj_w"].astype(cd), precision=mm)
            + p["proj_b"].astype(cd)
        )
        return out.astype(x.dtype)

    q = checkpoint_name(
        jnp.einsum("btd,dhk->bhtk", xc, w[:, 0], precision=mm) + b3[0][:, None],
        "attn_q",
    )
    k = checkpoint_name(
        jnp.einsum("btd,dhk->bhtk", xc, w[:, 1], precision=mm) + b3[1][:, None],
        "attn_k",
    )
    v = checkpoint_name(
        jnp.einsum("btd,dhk->bhtk", xc, w[:, 2], precision=mm) + b3[2][:, None],
        "attn_v",
    )
    if impl == "performer":
        from metatransformer_tpu.ops import performer as _perf

        nf = cfg.performer_features or 2 * hd
        feats = jnp.asarray(
            _perf.orthogonal_random_features(cfg.performer_seed, nf, hd)
        )
        o = _perf.favor_attention(q, k, v, feats, mask=mask)
        proj = p["proj_w"].astype(cd).reshape(h, hd, d)
        out = (
            jnp.einsum("bhtk,hkd->btd", o, proj, precision=mm)
            + p["proj_b"].astype(cd)
        )
        return out.astype(x.dtype)
    if precision.is_bf16:
        logits = jnp.einsum("bhtk,bhsk->bhts", q * scale, k, precision=mm)
        if mask is not None:
            logits = jnp.where(mask[:, None, None, :], logits, jnp.bfloat16(-1e4))
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp((logits - m).astype(jnp.float32)).astype(v.dtype)
        probs = checkpoint_name(
            e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-6),
            "attn_probs",
        )
    else:
        logits = jnp.einsum(
            "bhtk,bhsk->bhts", q * scale, k,
            preferred_element_type=jnp.float32, precision=mm,
        )
        if mask is not None:
            logits = jnp.where(
                mask[:, None, None, :], logits, jnp.finfo(jnp.float32).min
            )
        probs = checkpoint_name(
            jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype),
            "attn_probs",
        )
    o = checkpoint_name(
        jnp.einsum("bhts,bhsk->bhtk", probs, v, precision=mm), "attn_o"
    )
    proj = p["proj_w"].astype(cd).reshape(h, hd, d)
    out = jnp.einsum("bhtk,hkd->btd", o, proj, precision=mm) + p["proj_b"].astype(cd)
    return out.astype(x.dtype)


def _flash_supported(seq_len: int, head_dim: int) -> bool:
    try:
        from metatransformer_tpu.ops import flash_attention as _fa

        return _fa.supported(seq_len, head_dim)
    except Exception:  # pragma: no cover - flash module optional at this stage
        return False


def _resolve_impl(cfg: EncoderConfig, seq_len: int, precision: Precision) -> str:
    """Pick the attention implementation for this (shape, policy).

    'fused' = the Pallas fused attention sublayer (ops/fused_block.py):
    short sequences, bf16 serving policy (fp32 parity keeps the XLA path
    whose matmul precision is exactly Precision.HIGHEST).
    """
    impl = cfg.attn_impl
    if impl != "auto":
        return impl
    from metatransformer_tpu.ops import fused_block as _fb

    if precision.is_bf16 and _fb.supported(seq_len, cfg.dim, cfg.num_heads):
        return "fused"
    if _flash_supported(seq_len, cfg.head_dim):
        return "flash"
    return "xla"


def mlp(x: jax.Array, p: Params, precision: Precision) -> jax.Array:
    """timm Mlp: Linear -> exact GELU -> Linear."""
    cd = precision.compute_dtype
    h = checkpoint_name(
        jnp.dot(x.astype(cd), p["fc1_w"].astype(cd), precision=precision.mm)
        + p["fc1_b"].astype(cd),
        "mlp_hidden",
    )
    # GELU in fp32 for the parity policy; in the compute dtype for bf16
    # serving (erf in bf16 costs < 1e-2 output drift, measured in tests).
    if precision.is_bf16:
        h = jax.nn.gelu(h, approximate=False)
    else:
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(cd)
    h = (
        jnp.dot(h, p["fc2_w"].astype(cd), precision=precision.mm)
        + p["fc2_b"].astype(cd)
    )
    return h.astype(x.dtype)


def block(
    x: jax.Array,
    p: Params,
    cfg: EncoderConfig,
    mask: Optional[jax.Array] = None,
    precision: Precision = FP32,
) -> jax.Array:
    """One pre-LN transformer block (timm ``Block`` semantics)."""
    if _resolve_impl(cfg, x.shape[1], precision) == "fused":
        from metatransformer_tpu.ops import fused_block as _fb

        x = _fb.attn_sublayer(
            x,
            p["norm1_scale"],
            p["norm1_bias"],
            p["qkv_w"],
            p["qkv_b"],
            p["proj_w"],
            p["proj_b"],
            mask=mask,
            num_heads=cfg.num_heads,
            ln_eps=cfg.ln_eps,
        )
        return _fb.mlp_sublayer(
            x,
            p["norm2_scale"],
            p["norm2_bias"],
            p["fc1_w"],
            p["fc1_b"],
            p["fc2_w"],
            p["fc2_b"],
            ln_eps=cfg.ln_eps,
        )
    h = layer_norm(x, p["norm1_scale"], p["norm1_bias"], cfg.ln_eps)
    x = x + attention(h, p, cfg, mask, precision)
    h = layer_norm(x, p["norm2_scale"], p["norm2_bias"], cfg.ln_eps)
    x = x + mlp(h, p, precision)
    return x


# Leaf names and per-layer shapes of the stacked encoder pytree.
def param_shapes(cfg: EncoderConfig) -> Dict[str, tuple]:
    d, m = cfg.dim, cfg.mlp_dim
    return {
        "norm1_scale": (d,),
        "norm1_bias": (d,),
        "qkv_w": (d, 3 * d),
        "qkv_b": (3 * d,),
        "proj_w": (d, d),
        "proj_b": (d,),
        "norm2_scale": (d,),
        "norm2_bias": (d,),
        "fc1_w": (d, m),
        "fc1_b": (m,),
        "fc2_w": (m, d),
        "fc2_b": (d,),
    }


def init(cfg: EncoderConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    """Random init (trunc-normal .02 weights, zeros bias, ones LN scale).

    Only used for from-scratch training / tests; real use loads the released
    checkpoint via :mod:`metatransformer_tpu.core.convert`.
    """
    shapes = param_shapes(cfg)
    keys = jax.random.split(key, len(shapes))
    params = {}
    for (name, shape), k in zip(shapes.items(), keys):
        full = (cfg.depth,) + shape
        if name.endswith("_w"):
            params[name] = (
                jax.random.truncated_normal(k, -2.0, 2.0, full, jnp.float32) * 0.02
            ).astype(dtype)
        elif "scale" in name:
            params[name] = jnp.ones(full, dtype)
        else:
            params[name] = jnp.zeros(full, dtype)
    return params


@functools.partial(
    jax.jit, static_argnames=("cfg", "precision", "pos_each_block", "remat")
)
def encode(
    params: Params,
    x: jax.Array,
    cfg: EncoderConfig,
    mask: Optional[jax.Array] = None,
    pos: Optional[jax.Array] = None,
    pos_each_block: bool = False,
    precision: Precision = FP32,
    remat: Any = None,
) -> jax.Array:
    """Run the full encoder as one ``lax.scan`` over stacked layer params.

    Args:
      params: stacked pytree from :func:`init` / the checkpoint converter.
      x: [B, T, D] token sequence (any dtype; computed per ``precision``).
      mask: optional [B, T] bool keep-mask for padded/ragged batches.
      pos: optional [B, T, D] (or [1, T, D]) positional embedding.
      pos_each_block: if True, adds ``pos`` at the *input of every* block
        (point-cloud backbone semantics, ``metatransformer.py:161-163``);
        if False and ``pos`` is given, adds it once before the stack.
      remat: overrides ``cfg.remat`` when not None (see EncoderConfig).
    """
    if remat is None:
        remat = cfg.remat
    if remat == "save":
        # The fused Pallas sublayers recompute their backward; the save
        # policy only pays off on the XLA block path where the tagged
        # intermediates exist. Long sequences keep flash attention (its
        # custom VJP stores q/k/v/o/lse — already O(T) memory).
        impl = _resolve_impl(cfg, x.shape[1], precision)
        if impl == "fused":
            impl = "xla"
        cfg = dataclasses.replace(cfg, attn_impl=impl)
    # Keep the residual stream in the compute dtype: casting once here
    # (instead of per-sublayer fp32<->bf16 roundtrips) halves VPU traffic
    # and activation memory in bf16 serving. LN still accumulates fp32.
    x = x.astype(precision.compute_dtype)
    if precision.is_bf16:
        # Pre-cast matmul weights/biases once, outside the depth scan: the
        # XLA and fused-kernel paths both consume them in bf16, and doing
        # it here (loop-invariant) avoids a per-layer/per-program cast.
        # LN params stay fp32 (LN accumulates fp32).
        _mm = ("qkv_w", "qkv_b", "proj_w", "proj_b",
               "fc1_w", "fc1_b", "fc2_w", "fc2_b")
        params = {
            k: (v.astype(jnp.bfloat16) if k in _mm else v)
            for k, v in params.items()
        }
    if pos is not None and not pos_each_block:
        x = x + pos.astype(x.dtype)

    def body(carry, layer_params):
        h = carry
        if pos_each_block and pos is not None:
            h = h + pos.astype(h.dtype)
        h = block(h, layer_params, cfg, mask, precision)
        return h, None

    if remat == "save":
        # Save-everything-expensive policy: forward stores the tagged
        # matmul outputs (q/k/v, probs, attn out, MLP hidden) so the
        # backward recomputes only elementwise ops. 3x forward FLOPs for
        # a full-FT step vs 4x under the fused sublayers' recompute VJP.
        body = jax.checkpoint(
            body,
            policy=jax.checkpoint_policies.save_only_these_names(*SAVE_NAMES),
        )
    elif remat:
        # Gradient checkpointing (the reference's `with_cp`, base/vit.py:
        # 332-333): recompute each block in the backward pass — activation
        # memory drops from O(depth) to O(1) blocks.
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, params)
    return x


def num_params(params: Params) -> int:
    return int(sum(np.prod(v.shape) for v in jax.tree_util.tree_leaves(params)))

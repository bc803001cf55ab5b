"""Text tokenizer: CLIP text encoder + zero-padding to encoder width.

Reference: ``Data2Seq/Text.py`` — openai CLIP ViT-B/32 ``encode_text``
(causal 12x512 transformer, quick-GELU, final LN, EOT pooling, text
projection) producing a 512-d embedding, zero-padded to 768
(``zero_padding`` at :15-19); dispatched from ``Data2Seq.py:27-28``.

Implemented natively in JAX with a converter from HuggingFace
``CLIPTextModelWithProjection`` weights (transformers is available
offline; actual LAION/openai weights load when a local path is given —
zero-egress environments run with random or converted local weights).
Token ids come from the host-side tokenizer (HF CLIPTokenizer when its
vocab is available); the device path starts at ids, like the reference's
``clip.tokenize``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class TextTokenizerConfig:
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    depth: int = 12
    num_heads: int = 8
    proj_dim: int = 512
    target_dim: int = 768  # zero-pad target (encoder width)
    ln_eps: float = 1e-5
    eot_token_id: int = 49407


def _layer_shapes(cfg: TextTokenizerConfig) -> Dict[str, tuple]:
    d, f = cfg.width, cfg.width * 4
    return {
        "ln1_scale": (d,), "ln1_bias": (d,),
        "qkv_w": (d, 3 * d), "qkv_b": (3 * d,),
        "proj_w": (d, d), "proj_b": (d,),
        "ln2_scale": (d,), "ln2_bias": (d,),
        "fc1_w": (d, f), "fc1_b": (f,),
        "fc2_w": (f, d), "fc2_b": (d,),
    }


def init(cfg: TextTokenizerConfig, key: jax.Array) -> Dict[str, jax.Array]:
    keys = jax.random.split(key, 4)
    params: Dict[str, jax.Array] = {
        "token_embed": jax.random.normal(keys[0], (cfg.vocab_size, cfg.width)) * 0.02,
        "pos_embed": jax.random.normal(keys[1], (cfg.context_length, cfg.width)) * 0.01,
        "final_ln_scale": jnp.ones((cfg.width,), jnp.float32),
        "final_ln_bias": jnp.zeros((cfg.width,), jnp.float32),
        "text_proj": jax.random.normal(keys[2], (cfg.width, cfg.proj_dim))
        * cfg.width**-0.5,
    }
    shapes = _layer_shapes(cfg)
    lkeys = jax.random.split(keys[3], len(shapes))
    for (name, shape), k in zip(shapes.items(), lkeys):
        full = (cfg.depth,) + shape
        if name.endswith("_w"):
            params[name] = jax.random.normal(k, full) * (shape[0] ** -0.5)
        elif "scale" in name:
            params[name] = jnp.ones(full)
        else:
            params[name] = jnp.zeros(full)
    return params


def _ln(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), -1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias).astype(x.dtype)


def quick_gelu(x: jax.Array) -> jax.Array:
    """CLIP's activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


def _block(x, p, cfg, mm):
    h = _ln(x, p["ln1_scale"], p["ln1_bias"], cfg.ln_eps)
    b, t, d = h.shape
    hd = d // cfg.num_heads
    qkv = (jnp.dot(h, p["qkv_w"], precision=mm) + p["qkv_b"]).reshape(
        b, t, 3, cfg.num_heads, hd
    )
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    logits = jnp.einsum(
        "bthd,bshd->bhts", q * hd**-0.5, k,
        preferred_element_type=jnp.float32, precision=mm,
    )
    causal = jnp.tril(jnp.ones((t, t), bool))
    logits = jnp.where(causal[None, None], logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, -1).astype(v.dtype)
    attn = jnp.einsum("bhts,bshd->bthd", probs, v, precision=mm).reshape(b, t, d)
    x = x + jnp.dot(attn, p["proj_w"], precision=mm) + p["proj_b"]
    h = _ln(x, p["ln2_scale"], p["ln2_bias"], cfg.ln_eps)
    h = quick_gelu(jnp.dot(h, p["fc1_w"], precision=mm) + p["fc1_b"])
    return x + jnp.dot(h, p["fc2_w"], precision=mm) + p["fc2_b"]


def encode_text(
    params: Dict[str, jax.Array],
    token_ids: jax.Array,  # int [B, T<=context_length]
    cfg: TextTokenizerConfig,
    mm: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """CLIP encode_text: ids -> [B, proj_dim] embedding (EOT-pooled)."""
    t = token_ids.shape[1]
    x = params["token_embed"][token_ids] + params["pos_embed"][None, :t]
    layer_names = list(_layer_shapes(cfg))
    stacked = {k: params[k] for k in layer_names}

    def body(carry, layer):
        return _block(carry, layer, cfg, mm), None

    x, _ = jax.lax.scan(body, x, stacked)
    x = _ln(x, params["final_ln_scale"], params["final_ln_bias"], cfg.ln_eps)
    # EOT pooling: openai CLIP takes features at argmax(ids) (EOT has the
    # highest token id).
    eot = jnp.argmax(token_ids, axis=-1)
    pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
    return jnp.dot(pooled, params["text_proj"], precision=mm)


def zero_padding(embedding: jax.Array, target_dim: int) -> jax.Array:
    """[B, d] -> [B, target_dim], zero-padded (``Text.py:15-19``)."""
    pad = target_dim - embedding.shape[-1]
    return jnp.pad(embedding, ((0, 0), (0, pad)))


def apply(
    params: Dict[str, jax.Array],
    token_ids: jax.Array,
    cfg: TextTokenizerConfig,
    mm: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """ids -> [B, 1, target_dim]: one 768-wide token per text, ready for
    the tokenize-then-concat multimodal path (README.md:122)."""
    emb = encode_text(params, token_ids, cfg, mm)
    return zero_padding(emb, cfg.target_dim)[:, None, :]


def convert_hf_clip_text(state: Dict[str, np.ndarray], cfg: TextTokenizerConfig):
    """HF CLIPTextModelWithProjection state dict (numpy) -> our pytree."""
    p = {k: np.asarray(v, np.float32) for k, v in state.items()}
    pre = "text_model."
    out = {
        "token_embed": p[pre + "embeddings.token_embedding.weight"],
        "pos_embed": p[pre + "embeddings.position_embedding.weight"],
        "final_ln_scale": p[pre + "final_layer_norm.weight"],
        "final_ln_bias": p[pre + "final_layer_norm.bias"],
        "text_proj": p["text_projection.weight"].T,
    }
    layers = []
    for i in range(cfg.depth):
        lp = pre + f"encoder.layers.{i}."
        q_w = p[lp + "self_attn.q_proj.weight"]
        k_w = p[lp + "self_attn.k_proj.weight"]
        v_w = p[lp + "self_attn.v_proj.weight"]
        layers.append(
            {
                "ln1_scale": p[lp + "layer_norm1.weight"],
                "ln1_bias": p[lp + "layer_norm1.bias"],
                "qkv_w": np.concatenate([q_w, k_w, v_w], axis=0).T,
                "qkv_b": np.concatenate(
                    [
                        p[lp + "self_attn.q_proj.bias"],
                        p[lp + "self_attn.k_proj.bias"],
                        p[lp + "self_attn.v_proj.bias"],
                    ]
                ),
                "proj_w": p[lp + "self_attn.out_proj.weight"].T,
                "proj_b": p[lp + "self_attn.out_proj.bias"],
                "ln2_scale": p[lp + "layer_norm2.weight"],
                "ln2_bias": p[lp + "layer_norm2.bias"],
                "fc1_w": p[lp + "mlp.fc1.weight"].T,
                "fc1_b": p[lp + "mlp.fc1.bias"],
                "fc2_w": p[lp + "mlp.fc2.weight"].T,
                "fc2_b": p[lp + "mlp.fc2.bias"],
            }
        )
    for name in _layer_shapes(cfg):
        out[name] = np.stack([layer[name] for layer in layers])
    return {k: jnp.asarray(v) for k, v in out.items()}

"""Graph prediction model (TokenGT-on-Meta-Transformer).

Reference: ``Graph/metatransformer/models/tokengt.py`` +
``modules/tokengt_graph_encoder.py:42-299`` — tokenizer -> (optional
embedding LayerNorm) -> 12 frozen 768-wide blocks run with **num_heads=32**
(:191-206) -> final LN -> graph token ``x[:, 0, :]`` -> LM-style head
(Linear+GELU+LN, then output projection). PCQM4Mv2 recipe: lap-node-id
k=16 with sign flip, L1 loss on 1 regression target.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from metatransformer_tpu.core import encoder as enc
from metatransformer_tpu.tokenizers import graph as graph_tok


@dataclasses.dataclass(frozen=True)
class GraphPredictorConfig:
    tokenizer: graph_tok.GraphTokenizerConfig = graph_tok.GraphTokenizerConfig()
    encoder: enc.EncoderConfig = enc.GRAPH_BASE  # 12x768, heads=32
    num_targets: int = 1  # PCQM4Mv2 regression
    layernorm_embedding: bool = True
    ln_eps: float = 1e-5


def init(cfg: GraphPredictorConfig, key: jax.Array) -> Dict[str, Any]:
    keys = jax.random.split(key, 4)
    d = cfg.encoder.dim
    params: Dict[str, Any] = {
        "tokenizer": graph_tok.init(cfg.tokenizer, keys[0]),
        "encoder": enc.init(cfg.encoder, keys[1]),
        "final_norm_scale": jnp.ones((d,), jnp.float32),
        "final_norm_bias": jnp.zeros((d,), jnp.float32),
        # LM-style head
        "head_transform_w": jax.random.normal(keys[2], (d, d)) * (d**-0.5),
        "head_transform_b": jnp.zeros((d,), jnp.float32),
        "head_norm_scale": jnp.ones((d,), jnp.float32),
        "head_norm_bias": jnp.zeros((d,), jnp.float32),
        "head_out_w": jax.random.normal(keys[3], (d, cfg.num_targets)) * (d**-0.5),
        "head_out_b": jnp.zeros((cfg.num_targets,), jnp.float32),
    }
    if cfg.layernorm_embedding:
        params["embed_norm_scale"] = jnp.ones((d,), jnp.float32)
        params["embed_norm_bias"] = jnp.zeros((d,), jnp.float32)
    return params


@functools.partial(jax.jit, static_argnames=("cfg", "precision", "train"))
def forward(
    params: Dict[str, Any],
    batch: Dict[str, jax.Array],
    cfg: GraphPredictorConfig,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    precision: enc.Precision = enc.FP32,
) -> jax.Array:
    tokens, keep_mask = graph_tok.apply(
        params["tokenizer"], batch, cfg.tokenizer, rng=rng, train=train,
        mm=precision.mm,
    )
    if cfg.layernorm_embedding:
        tokens = enc.layer_norm(
            tokens, params["embed_norm_scale"], params["embed_norm_bias"], cfg.ln_eps
        )
    x = enc.encode(
        params["encoder"], tokens, cfg.encoder, mask=keep_mask, precision=precision
    )
    x = enc.layer_norm(
        x, params["final_norm_scale"], params["final_norm_bias"], cfg.ln_eps
    )
    g = x[:, 0, :]  # graph token
    h = jnp.dot(g, params["head_transform_w"], precision=precision.mm)
    h = jax.nn.gelu(h + params["head_transform_b"], approximate=False)
    h = enc.layer_norm(h, params["head_norm_scale"], params["head_norm_bias"], cfg.ln_eps)
    return jnp.dot(h, params["head_out_w"], precision=precision.mm) + params["head_out_b"]


def l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """GraphPredictionL1Loss (``criterions/l1_loss.py:13-14``)."""
    return jnp.mean(jnp.abs(pred.squeeze(-1) - target))


def evaluate(
    params: Dict[str, Any],
    cfg: GraphPredictorConfig,
    batches,
    precision: enc.Precision = enc.FP32,
) -> Dict[str, float]:
    """MAE over an iterable of (collated graph batch, targets [B]) —
    the reference's eval entry (``Graph/metatransformer/evaluate/
    evaluate.py:1-137``: load checkpoint, run the valid split, report
    MAE). Padding rows (node_num == 0) are excluded from the mean."""
    import numpy as np

    errs = []
    for batch, targets in batches:
        pred = np.asarray(forward(params, batch, cfg, precision=precision))[:, 0]
        t = np.asarray(targets)
        valid = np.asarray(batch["node_num"]) > 0
        errs.append(np.abs(pred - t)[valid])
    all_err = np.concatenate(errs) if errs else np.zeros((0,))
    return {
        "mae": float(all_err.mean()) if len(all_err) else float("nan"),
        "n": int(len(all_err)),
    }


def evaluate_checkpoint(
    ckpt_dir: str,
    cfg: GraphPredictorConfig,
    batches,
    params_template: Optional[Dict[str, Any]] = None,
) -> Dict[str, float]:
    """Load best/latest trainable state from a Trainer checkpoint dir and
    evaluate (evaluate.py's --ckpt-path flow over utils.checkpoint)."""
    from metatransformer_tpu.utils import checkpoint as ckpt_lib

    resumed = ckpt_lib.auto_resume(ckpt_dir)
    if resumed is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    state, _epoch = resumed
    params = dict(params_template or {})
    params.update(state["trainable"])
    return evaluate(params, cfg, batches)

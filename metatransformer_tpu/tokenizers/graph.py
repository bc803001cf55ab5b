"""Graph tokenizer: TokenGT node+edge tokenization.

Reference: ``Data2Seq/Graph.py:43-305`` (= ``Graph/metatransformer/modules/
tokenizer.py``) — atom/edge embeddings (padding_idx 0), node identifiers
(random / Gaussian-orthogonal / Laplacian eigenvectors) injected as
concat(id[u], id[v]) through bias-free linears, type embeddings
(node-vs-edge), [graph]/[null] special tokens, padding masks.

TPU-native redesign: the reference flattens ragged graphs into
``sum(node_num)`` tensors with boolean scatter — shapes change per batch
and defeat jit. Here batches arrive **padded dense** (static max_n /
max_e, produced by the host collator in ``data.graph_collate``):

  node_data  int [B, max_n, F_n]   edge_data  int [B, max_e, F_e]
  edge_index int [B, max_e, 2]     node_num/edge_num int [B]
  lap_eigvec     [B, max_n, k]

Token layout is fixed: [graph][null] + max_n node slots + max_e edge
slots, each slot masked by its count. Attention is permutation-invariant
and slot positions carry no embedding, so this differs from the
reference's ragged packing only in where the padding sits — masked out
either way. QR-based ORF ids run on device (jnp.linalg.qr) but should be
precomputed on host for throughput, exactly as the reference does its
Laplacian eig in data workers (``Graph/metatransformer/data/algos.py``).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class GraphTokenizerConfig:
    num_atoms: int = 512 * 9  # PCQM4Mv2 offsets
    num_edge_types: int = 512 * 3
    dim: int = 768
    rand_node_id: bool = False
    rand_node_id_dim: int = 64
    orf_node_id: bool = False
    orf_node_id_dim: int = 64
    lap_node_id: bool = True
    lap_node_id_k: int = 16
    lap_node_id_sign_flip: bool = True
    type_id: bool = True


def init(cfg: GraphTokenizerConfig, key: jax.Array) -> Dict[str, jax.Array]:
    keys = jax.random.split(key, 8)
    params: Dict[str, jax.Array] = {
        "atom_embed": jax.random.normal(keys[0], (cfg.num_atoms, cfg.dim)) * 0.02,
        "edge_embed": jax.random.normal(keys[1], (cfg.num_edge_types, cfg.dim)) * 0.02,
        "graph_token": jax.random.normal(keys[2], (1, cfg.dim)) * 0.02,
        "null_token": jax.random.normal(keys[3], (1, cfg.dim)) * 0.02,
    }
    if cfg.rand_node_id:
        params["rand_encoder_w"] = jax.random.normal(
            keys[4], (2 * cfg.rand_node_id_dim, cfg.dim)
        ) * 0.02
    if cfg.orf_node_id:
        params["orf_encoder_w"] = jax.random.normal(
            keys[5], (2 * cfg.orf_node_id_dim, cfg.dim)
        ) * 0.02
    if cfg.lap_node_id:
        params["lap_encoder_w"] = jax.random.normal(
            keys[6], (2 * cfg.lap_node_id_k, cfg.dim)
        ) * 0.02
    if cfg.type_id:
        params["order_embed"] = jax.random.normal(keys[7], (2, cfg.dim)) * 0.02
    return params


def _embed_sum(table: jax.Array, ids: jax.Array) -> jax.Array:
    """Embedding with padding_idx=0 + sum over the feature columns.

    ids: int [B, M, F] -> [B, M, D]. Index 0 contributes zero (torch
    ``nn.Embedding(padding_idx=0)`` semantics).
    """
    table = table.at[0].set(0.0)
    return jnp.sum(table[ids], axis=-2)


def _index_embed(node_id: jax.Array, padded_index: jax.Array) -> jax.Array:
    """node_id [B, max_n, D], padded_index [B, T, 2] -> [B, T, 2D]
    (concat of the two endpoint identifiers; = get_index_embed :187-205)."""
    gathered = jnp.take_along_axis(
        node_id[:, :, None, :],
        padded_index[..., None].astype(jnp.int32),
        axis=1,
    )  # [B, T, 2, D] via broadcast gather on axis 1
    b, t, _, d = gathered.shape
    return gathered.reshape(b, t, 2 * d)


def _l2norm(x: jax.Array, axis: int = -1) -> jax.Array:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), 1e-12)


def orf_node_ids(key: jax.Array, b: int, max_n: int, dim: int) -> jax.Array:
    """Batched Gaussian-orthogonal random node identifiers [B, max_n, dim]
    (gaussian_orthogonal_random_matrix_batched :14-31, row-normalized)."""
    block = jax.random.normal(key, (b, max_n, max_n))
    q, _ = jnp.linalg.qr(block)
    orf = jnp.swapaxes(q, 1, 2)  # [B, max_n, max_n]
    if dim > max_n:
        orf = jnp.pad(orf, ((0, 0), (0, 0), (0, dim - max_n)))
    else:
        orf = orf[..., :dim]
    return _l2norm(orf)


def apply(
    params: Dict[str, jax.Array],
    batch: Dict[str, jax.Array],
    cfg: GraphTokenizerConfig,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    mm: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> Tuple[jax.Array, jax.Array]:
    """-> (tokens [B, 2+max_n+max_e, D], keep_mask [B, 2+max_n+max_e]).

    keep_mask is True on valid positions (inverse of the reference's
    padding_mask) — feed directly to the encoder's masked attention.
    """
    node_data = batch["node_data"]  # [B, max_n, Fn]
    edge_data = batch["edge_data"]  # [B, max_e, Fe]
    edge_index = batch["edge_index"]  # [B, max_e, 2]
    node_num = batch["node_num"]  # [B]
    edge_num = batch["edge_num"]  # [B]
    b, max_n = node_data.shape[:2]
    max_e = edge_data.shape[1]

    node_feature = _embed_sum(params["atom_embed"], node_data)  # [B, max_n, D]
    edge_feature = _embed_sum(params["edge_embed"], edge_data)  # [B, max_e, D]

    node_valid = jnp.arange(max_n)[None, :] < node_num[:, None]  # [B, max_n]
    edge_valid = jnp.arange(max_e)[None, :] < edge_num[:, None]  # [B, max_e]

    # Fixed slot layout: node slot i -> endpoints (i, i); edge slots carry
    # their (u, v).
    node_slots = jnp.broadcast_to(
        jnp.arange(max_n, dtype=jnp.int32)[None, :, None], (b, max_n, 2)
    )
    padded_index = jnp.concatenate([node_slots, edge_index.astype(jnp.int32)], axis=1)
    feature = jnp.concatenate([node_feature, edge_feature], axis=1)  # [B, T, D]

    def add_id_embed(feature, node_id, w):
        idx_embed = _index_embed(node_id, padded_index)
        return feature + jnp.dot(idx_embed.astype(w.dtype), w, precision=mm)

    if cfg.rand_node_id:
        assert rng is not None, "rand_node_id needs an rng"
        rng, sub = jax.random.split(rng)
        rid = _l2norm(jax.random.uniform(sub, (b, max_n, cfg.rand_node_id_dim)))
        feature = add_id_embed(feature, rid, params["rand_encoder_w"])

    if cfg.orf_node_id:
        assert rng is not None, "orf_node_id needs an rng"
        rng, sub = jax.random.split(rng)
        oid = orf_node_ids(sub, b, max_n, cfg.orf_node_id_dim)
        feature = add_id_embed(feature, oid, params["orf_encoder_w"])

    if cfg.lap_node_id:
        eigvec = batch["lap_eigvec"]  # [B, max_n, k_avail]
        k_avail = eigvec.shape[-1]
        if cfg.lap_node_id_k > k_avail:
            eigvec = jnp.pad(eigvec, ((0, 0), (0, 0), (0, cfg.lap_node_id_k - k_avail)))
        else:
            eigvec = eigvec[..., : cfg.lap_node_id_k]
        if cfg.lap_node_id_sign_flip and train:
            assert rng is not None, "sign flip needs an rng"
            rng, sub = jax.random.split(rng)
            signs = jnp.where(
                jax.random.uniform(sub, (b, 1, cfg.lap_node_id_k)) >= 0.5, 1.0, -1.0
            )
            eigvec = eigvec * signs
        feature = add_id_embed(feature, eigvec, params["lap_encoder_w"])

    if cfg.type_id:
        order = (padded_index[..., 0] == padded_index[..., 1]).astype(jnp.int32)
        feature = feature + params["order_embed"][order]

    valid = jnp.concatenate([node_valid, edge_valid], axis=1)  # [B, T]
    feature = jnp.where(valid[..., None], feature, 0.0)

    special = jnp.concatenate(
        [params["graph_token"], params["null_token"]], axis=0
    )[None]  # [1, 2, D]
    tokens = jnp.concatenate(
        [jnp.broadcast_to(special.astype(feature.dtype), (b, 2, cfg.dim)), feature],
        axis=1,
    )
    keep_mask = jnp.concatenate([jnp.ones((b, 2), bool), valid], axis=1)
    return tokens, keep_mask

"""Graph tokenizer semantics, collator, and TokenGT model tests."""

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.core import encoder
from metatransformer_tpu.data import graph_collate
from metatransformer_tpu.models import graph_predictor
from metatransformer_tpu.tokenizers import graph as graph_tok


def _toy_graphs():
    # triangle (3 nodes, 3 edges) and an edgeless pair (2 nodes)
    g1 = {
        "node_data": np.array([[1], [2], [3]], np.int32),
        "edge_index": np.array([[0, 1], [1, 2], [2, 0]], np.int32),
        "edge_data": np.array([[4], [5], [6]], np.int32),
    }
    g2 = {
        "node_data": np.array([[7], [8]], np.int32),
        "edge_index": np.zeros((0, 2), np.int32),
        "edge_data": np.zeros((0, 1), np.int32),
    }
    return [g1, g2]


def test_collate_and_lap_eig():
    batch = graph_collate.collate(_toy_graphs(), max_nodes=4, max_edges=4, lap_k=3)
    assert batch["node_num"].tolist() == [3, 2]
    assert batch["edge_num"].tolist() == [3, 0]
    # triangle normalized laplacian eigvals = [0, 1.5, 1.5]
    eigval = batch["lap_eigval"][0, 0]
    np.testing.assert_allclose(sorted(eigval), [0.0, 1.5, 1.5], atol=1e-5)


def test_embed_sum_padding_idx_zero():
    table = jnp.asarray(np.random.default_rng(0).standard_normal((10, 4), np.float32))
    ids = jnp.asarray([[[0, 3], [2, 0]]], jnp.int32)  # [1, 2, 2]
    out = np.asarray(graph_tok._embed_sum(table, ids))
    np.testing.assert_allclose(out[0, 0], np.asarray(table)[3], rtol=1e-6)
    np.testing.assert_allclose(out[0, 1], np.asarray(table)[2], rtol=1e-6)


def test_index_embed_gather():
    node_id = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 3, 4))  # [1,3,4]
    padded_index = jnp.asarray([[[0, 0], [1, 2]]], jnp.int32)  # [1, 2, 2]
    out = np.asarray(graph_tok._index_embed(node_id, padded_index))
    assert out.shape == (1, 2, 8)
    np.testing.assert_array_equal(out[0, 0], np.r_[np.arange(4), np.arange(4)])
    np.testing.assert_array_equal(out[0, 1], np.r_[np.arange(4, 8), np.arange(8, 12)])


def test_tokenizer_outputs_and_mask():
    cfg = graph_tok.GraphTokenizerConfig(
        num_atoms=32, num_edge_types=32, dim=16, lap_node_id_k=3
    )
    params = graph_tok.init(cfg, jax.random.PRNGKey(0))
    batch = {
        k: jnp.asarray(v)
        for k, v in graph_collate.collate(_toy_graphs(), 4, 4, lap_k=3).items()
    }
    tokens, keep = graph_tok.apply(params, batch, cfg)
    assert tokens.shape == (2, 2 + 4 + 4, 16)
    # [graph],[null] always valid; sample 0: 3 nodes + 3 edges; sample 1: 2 nodes
    np.testing.assert_array_equal(
        np.asarray(keep)[0], [1, 1, 1, 1, 1, 0, 1, 1, 1, 0]
    )
    np.testing.assert_array_equal(
        np.asarray(keep)[1], [1, 1, 1, 1, 0, 0, 0, 0, 0, 0]
    )
    # padded slots are zeroed
    assert np.abs(np.asarray(tokens)[1, 4:]).max() == 0.0


def test_type_embed_distinguishes_nodes_and_edges():
    cfg = graph_tok.GraphTokenizerConfig(
        num_atoms=32, num_edge_types=32, dim=16, lap_node_id=False, type_id=True
    )
    params = graph_tok.init(cfg, jax.random.PRNGKey(1))
    batch = {
        k: jnp.asarray(v)
        for k, v in graph_collate.collate(_toy_graphs(), 4, 4, lap_k=3).items()
    }
    # Same atom id for all nodes and edges, identical embedding tables ->
    # only the type embed differs between node and edge tokens.
    batch["node_data"] = jnp.ones_like(batch["node_data"])
    batch["edge_data"] = jnp.ones_like(batch["edge_data"])
    params["edge_embed"] = params["atom_embed"]
    tokens, _ = graph_tok.apply(params, batch, cfg)
    t = np.asarray(tokens)[0]
    node_tok, edge_tok = t[2], t[2 + 4]
    assert not np.allclose(node_tok, edge_tok)
    order = np.asarray(params["order_embed"])
    np.testing.assert_allclose(node_tok - edge_tok, order[1] - order[0], atol=1e-5)


def test_orf_ids_are_orthonormal():
    ids = np.asarray(graph_tok.orf_node_ids(jax.random.PRNGKey(0), 2, 8, 8))
    for b in range(2):
        gram = ids[b] @ ids[b].T
        np.testing.assert_allclose(gram, np.eye(8), atol=1e-5)


def test_graph_predictor_end_to_end_and_padding_invariance():
    cfg = graph_predictor.GraphPredictorConfig(
        tokenizer=graph_tok.GraphTokenizerConfig(
            num_atoms=32, num_edge_types=32, dim=32, lap_node_id_k=3
        ),
        encoder=encoder.EncoderConfig(dim=32, depth=2, num_heads=4),
    )
    params = graph_predictor.init(cfg, jax.random.PRNGKey(0))
    graphs = _toy_graphs()
    small = {
        k: jnp.asarray(v) for k, v in graph_collate.collate(graphs, 4, 4, 3).items()
    }
    big = {
        k: jnp.asarray(v) for k, v in graph_collate.collate(graphs, 7, 9, 3).items()
    }
    out_small = np.asarray(graph_predictor.forward(params, small, cfg))
    out_big = np.asarray(graph_predictor.forward(params, big, cfg))
    assert out_small.shape == (2, 1)
    # More padding must not change predictions (mask correctness).
    np.testing.assert_allclose(out_small, out_big, rtol=1e-4, atol=1e-5)
    # L1 loss
    loss = graph_predictor.l1_loss(jnp.asarray(out_small), jnp.asarray([0.5, 1.0]))
    assert np.isfinite(float(loss))

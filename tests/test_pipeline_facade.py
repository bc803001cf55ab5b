"""Data2Seq facade coverage for point/graph/text/tabular/hyper branches."""

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu import pipeline
from metatransformer_tpu.data import graph_collate
from metatransformer_tpu.tokenizers import (
    graph as gtok,
    hyper as htok,
    point as ptok,
    tabular as ttok,
    text as xtok,
)


def test_point_branch():
    d2s = pipeline.Data2Seq(
        "point", 32,
        config=ptok.PointTokenizerConfig(sample_ratio=0.25, group_size=4,
                                         embed_dim=32),
    )
    params = d2s.init(jax.random.PRNGKey(0))
    pts = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 3), np.float32))
    tokens = d2s(params, pts)
    assert tokens.shape == (2, 16, 32)


def test_graph_branch():
    cfg = gtok.GraphTokenizerConfig(num_atoms=16, num_edge_types=16, dim=16,
                                    lap_node_id_k=2)
    d2s = pipeline.Data2Seq("graph", 16, config=cfg)
    params = d2s.init(jax.random.PRNGKey(0))
    g = {
        "node_data": np.array([[1], [2]], np.int32),
        "edge_index": np.array([[0, 1]], np.int32),
        "edge_data": np.array([[3]], np.int32),
    }
    batch = {k: jnp.asarray(v) for k, v in
             graph_collate.collate([g], 4, 4, lap_k=2).items()}
    tokens = d2s(params, batch)
    assert tokens.shape == (1, 2 + 4 + 4, 16)


def test_text_branch():
    cfg = xtok.TextTokenizerConfig(
        vocab_size=50, context_length=8, width=16, depth=1, num_heads=2,
        proj_dim=8, target_dim=32, eot_token_id=49,
    )
    d2s = pipeline.Data2Seq("text", 32, config=cfg)
    params = d2s.init(jax.random.PRNGKey(0))
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 49, (3, 8)))
    tokens = d2s(params, ids)
    assert tokens.shape == (3, 1, 32)


def test_tabular_and_hyper_branches():
    tcfg = ttok.TabularTokenizerConfig(vocab_sizes=(3, 4), dim=16)
    d2s = pipeline.Data2Seq("tabular", 16, config=tcfg)
    params = d2s.init(jax.random.PRNGKey(0))
    tokens = d2s(params, jnp.asarray([[0, 1], [2, 3]], jnp.int32))
    assert tokens.shape == (2, 2, 16)

    hcfg = htok.HyperTokenizerConfig(img_size=2, near_band=1, num_tokens=4, dim=16)
    d2s = pipeline.Data2Seq("hyper", 16, config=hcfg)
    params = d2s.init(jax.random.PRNGKey(1))
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 4, 4), np.float32))
    tokens = d2s(params, x)
    assert tokens.shape == (2, 5, 16)  # cls + 4


def test_imu_aliases_time_series():
    d2s = pipeline.Data2Seq("imu", 16)
    assert d2s.config.dim == 16
    params = d2s.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 6, 1), np.float32))
    assert d2s(params, x).shape == (1, 6, 16)

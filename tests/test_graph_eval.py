"""OGB PCQM4Mv2 adapter (smiles -> OGB-layout graph) + the graph eval
entry (reference: ``Graph/metatransformer/data/ogb_datasets/
pcqm4mv2_pyg.py`` and ``evaluate/evaluate.py:1-137``)."""

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.core import encoder
from metatransformer_tpu.data import graph_collate
from metatransformer_tpu.data import ogb_smiles as og
from metatransformer_tpu.models import graph_predictor
from metatransformer_tpu.tokenizers import graph as graph_tok


def test_smiles_benzene():
    g = og.smiles2graph("c1ccccc1")
    assert g["num_nodes"] == 6
    nf = g["node_feat"]
    assert (nf[:, 0] == 5).all()  # carbon -> atomic-num index 6-1
    assert (nf[:, 7] == 1).all()  # aromatic
    assert (nf[:, 8] == 1).all()  # in ring
    assert (nf[:, 2] == 2).all()  # degree 2 (heavy neighbors)
    assert (nf[:, 4] == 1).all()  # one implicit H each
    # 6 aromatic bonds, both directions
    assert g["edge_index"].shape == (2, 12)
    assert (g["edge_feat"][:, 0] == 3).all()  # AROMATIC bond type


def test_smiles_functional_groups():
    # acetic acid CC(=O)O: 2 C, 2 O; one double bond
    g = og.smiles2graph("CC(=O)O")
    assert g["num_nodes"] == 4
    nums = g["node_feat"][:, 0] + 1
    assert sorted(nums.tolist()) == [6, 6, 8, 8]
    types = g["edge_feat"][::2, 0].tolist()
    assert types.count(1) == 1 and types.count(0) == 2  # 1 double, 2 single
    # methyl carbon has 3 implicit H
    assert g["node_feat"][0, 4] == 3

    # charged bracket atom: [O-] on nitrate-ish N(=O)[O-]
    g2 = og.smiles2graph("[O-]N=O")
    assert g2["node_feat"][0, 3] == 4  # charge -1 + 5 offset
    # ring-closure across branch: cyclohexane
    g3 = og.smiles2graph("C1CCCCC1")
    assert (g3["node_feat"][:, 8] == 1).all()
    assert g3["edge_index"].shape == (2, 12)


def test_smiles_to_collate_to_model():
    """smiles -> OGB graph -> collate -> TokenGT predictor forward."""
    graphs = [
        og.graph_to_collate_format(og.smiles2graph(s))
        for s in ("CCO", "c1ccccc1", "CC(=O)O")
    ]
    batch = {
        k: jnp.asarray(v)
        for k, v in graph_collate.collate(graphs, 8, 8, lap_k=3).items()
    }
    cfg = graph_predictor.GraphPredictorConfig(
        tokenizer=graph_tok.GraphTokenizerConfig(
            num_atoms=512, num_edge_types=64, dim=32, lap_node_id_k=3
        ),
        encoder=encoder.EncoderConfig(dim=32, depth=2, num_heads=4),
    )
    params = graph_predictor.init(cfg, jax.random.PRNGKey(0))
    out = graph_predictor.forward(params, batch, cfg)
    assert out.shape == (3, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_pcqm_csv_loader(tmp_path):
    p = tmp_path / "data.csv"
    p.write_text(
        "idx,smiles,homolumogap\n0,CCO,3.05\n1,c1ccccc1,6.2\n"
    )
    rows = og.load_pcqm4mv2_csv(str(p))
    assert rows == [("CCO", 3.05), ("c1ccccc1", 6.2)]


def test_evaluate_and_checkpoint_entry(tmp_path):
    cfg = graph_predictor.GraphPredictorConfig(
        tokenizer=graph_tok.GraphTokenizerConfig(
            num_atoms=512, num_edge_types=64, dim=32, lap_node_id_k=3
        ),
        encoder=encoder.EncoderConfig(dim=32, depth=2, num_heads=4),
    )
    params = graph_predictor.init(cfg, jax.random.PRNGKey(0))
    graphs = [
        og.graph_to_collate_format(og.smiles2graph(s)) for s in ("CCO", "CC")
    ]
    batch = {
        k: jnp.asarray(v)
        for k, v in graph_collate.collate(graphs, 8, 8, lap_k=3).items()
    }
    targets = np.asarray([3.0, 4.0], np.float32)
    res = graph_predictor.evaluate(params, cfg, [(batch, targets)])
    assert res["n"] == 2 and np.isfinite(res["mae"])
    # MAE of a constant-0-ish random-init model ~ |targets|
    pred = np.asarray(graph_predictor.forward(params, batch, cfg))[:, 0]
    assert abs(res["mae"] - np.abs(pred - targets).mean()) < 1e-6

    # checkpoint path: save trainable state, reload through the eval entry
    from metatransformer_tpu.utils import checkpoint as ckpt_lib

    ckpt_lib.save_rotating(str(tmp_path), {"trainable": params}, epoch=0)
    res2 = graph_predictor.evaluate_checkpoint(
        str(tmp_path), cfg, [(batch, targets)]
    )
    assert abs(res2["mae"] - res["mae"]) < 1e-6

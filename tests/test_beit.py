"""BEiT blocks + checkpoint remap: torch-oracle parity, shared-table
expansion, geometric rel-pos-bias resize, BEiT-adapter forward.

Reference parity targets:
``mmseg_custom/models/backbones/base/beit.py`` (block numerics),
``mmcv_custom/checkpoint.py:375-457`` (rel-pos-bias remaps).
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from metatransformer_tpu.core import beit, convert
from metatransformer_tpu.core import encoder as enc
from tests.torch_ref import make_beit_encoder


def _convert(blocks, window):
    sd = {k: v.detach().numpy() for k, v in blocks.state_dict().items()}
    return convert.convert_beit_state_dict(sd, dst_window=window)


def test_beit_matches_torch_oracle():
    window = (4, 4)
    blocks = make_beit_encoder(dim=64, depth=2, num_heads=2, window=window)
    params = {k: jnp.asarray(v) for k, v in _convert(blocks, window).items()}
    cfg = beit.BEiTConfig(dim=64, depth=2, num_heads=2, window=window)

    x = np.random.default_rng(0).standard_normal((2, 17, 64)).astype(np.float32)
    with torch.no_grad():
        want = blocks(torch.from_numpy(x.copy())).numpy()
    got = np.asarray(beit.encode(params, jnp.asarray(x), cfg))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_shared_rel_pos_table_expansion():
    """A checkpoint with one shared rel_pos_bias table gets it expanded to
    every layer (checkpoint.py:375-387)."""
    window = (3, 3)
    blocks = make_beit_encoder(dim=32, depth=3, num_heads=2, window=window)
    sd = {k: v.detach().numpy() for k, v in blocks.state_dict().items()}
    shared = sd.pop("0.attn.relative_position_bias_table")
    for i in range(3):
        sd.pop(f"{i}.attn.relative_position_bias_table", None)
    sd["rel_pos_bias.relative_position_bias_table"] = shared
    out = convert.convert_beit_state_dict(sd, dst_window=window)
    nrd = (2 * 3 - 1) ** 2 + 3
    assert out["rel_pos_table"].shape == (3, nrd, 2)
    for i in range(3):
        np.testing.assert_array_equal(out["rel_pos_table"][i], shared)


def test_rel_pos_table_geometric_resize():
    """Window change triggers the geometric-progression cubic resize; a
    constant table must stay (nearly) constant and the 3 cls rows pass
    through untouched."""
    src_window, dst_window = (5, 5), (8, 8)
    nrd_src = (2 * 5 - 1) ** 2 + 3
    table = np.full((nrd_src, 2), 0.7, np.float32)
    table[-3:] = [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]
    out = convert.resize_rel_pos_table(table, dst_window)
    nrd_dst = (2 * 8 - 1) ** 2 + 3
    assert out.shape == (nrd_dst, 2)
    np.testing.assert_allclose(out[:-3], 0.7, atol=1e-4)
    np.testing.assert_array_equal(out[-3:], table[-3:])


def test_beit_adapter_forward():
    """ViT-Adapter with block_type='beit' produces the 4-scale pyramid."""
    from metatransformer_tpu.models import vit_adapter

    cfg = vit_adapter.ViTAdapterConfig(
        encoder=enc.EncoderConfig(dim=32, depth=4, num_heads=4),
        img_size=64,
        patch_size=16,
        conv_inplane=8,
        deform_num_heads=4,
        interaction_indexes=((0, 1), (2, 3)),
        block_type="beit",
    )
    params = vit_adapter.init(cfg, jax.random.PRNGKey(0))
    assert "rel_pos_table" in params["encoder"]
    assert "gamma_1" in params["encoder"]
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 64, 64, 3), np.float32)
    )
    feats = vit_adapter.apply(params, x, cfg)
    assert [f.shape for f in feats] == [
        (1, 16, 16, 32), (1, 8, 8, 32), (1, 4, 4, 32), (1, 2, 2, 32),
    ]
    assert all(np.isfinite(np.asarray(f)).all() for f in feats)


def test_beit_grads_reach_gamma():
    window = (2, 2)
    cfg = beit.BEiTConfig(dim=32, depth=2, num_heads=2, window=window)
    params = beit.init(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 5, 32), np.float32))

    def loss(p):
        return jnp.sum(beit.encode(p, x, cfg) ** 2)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["gamma_1"]).max()) > 0
    assert float(jnp.abs(g["rel_pos_table"]).max()) > 0


def test_uniperceiver_matches_torch_oracle():
    """UniPerceiver BertLayer == beit.block with rel_index=None + k_bias
    (uniperceiver.py:111-150), through the checkpoint converter."""
    import torch

    from tests.torch_ref import make_uniperceiver_encoder

    blocks = make_uniperceiver_encoder(dim=64, depth=2, num_heads=2)
    sd = {k: v.detach().numpy() for k, v in blocks.state_dict().items()}
    # state dict keys look like '0.in_proj.weight' -> remap to the
    # uniperceiver naming ('layers.0.self_attn.in_proj.weight' family)
    remapped = {}
    for k, v in sd.items():
        i, sub = k.split(".", 1)
        if sub.startswith(("in_proj", "out_proj")):
            sub = "self_attn." + sub
        remapped[f"layers.{i}.{sub}"] = v
    params = {
        k: jnp.asarray(v)
        for k, v in convert.convert_uniperceiver_state_dict(remapped).items()
    }
    cfg = beit.BEiTConfig(dim=64, depth=2, num_heads=2)
    x = np.random.default_rng(3).standard_normal((2, 9, 64)).astype(np.float32)
    want = blocks(torch.from_numpy(x)).detach().numpy()

    def run(h):
        for i in range(cfg.depth):
            lp = {k: v[i] for k, v in params.items()}
            h = beit.block(h, lp, cfg, None)
        return h

    got = np.asarray(run(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_uniperceiver_adapter_forward():
    import dataclasses as dc

    from metatransformer_tpu.core import encoder as enc_mod
    from metatransformer_tpu.models import vit_adapter

    cfg = vit_adapter.ViTAdapterConfig(
        encoder=enc_mod.EncoderConfig(dim=64, depth=4, num_heads=2),
        img_size=64,
        conv_inplane=16,
        deform_num_heads=2,
        interaction_indexes=((0, 1), (2, 3)),
        block_type="uniperceiver",
    )
    params = vit_adapter.init(cfg, jax.random.PRNGKey(0))
    assert "rel_pos_table" not in params["encoder"]
    assert "k_bias" in params["encoder"]
    assert float(jnp.abs(params["encoder"]["gamma_1"]).max()) == 0.0
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((1, 64, 64, 3)), jnp.float32
    )
    feats = vit_adapter.apply(params, x, cfg)
    assert [f.shape[1:3] for f in feats] == [(16, 16), (8, 8), (4, 4), (2, 2)]
    assert all(np.isfinite(np.asarray(f)).all() for f in feats)


def test_windowed_relative_position_index_subsets_full():
    """For win == full grid, the windowed index equals the full index's
    non-cls block; for smaller windows every index stays in table range."""
    full = beit.relative_position_index((4, 4))
    win_full = beit.windowed_relative_position_index((4, 4), 4)
    np.testing.assert_array_equal(win_full, full[1:, 1:])
    win2 = beit.windowed_relative_position_index((4, 4), 2)
    assert win2.shape == (4, 4)
    nrd = (2 * 4 - 1) * (2 * 4 - 1)
    assert win2.min() >= 0 and win2.max() < nrd
    # diagonal = zero offset = same table row as the full grid's diagonal
    assert (np.diag(win2) == full[1, 1]).all()


def test_windowed_beit_adapter_forward():
    import dataclasses as dc

    from metatransformer_tpu.core import encoder as enc_mod
    from metatransformer_tpu.models import vit_adapter

    base = vit_adapter.ViTAdapterConfig(
        encoder=enc_mod.EncoderConfig(dim=64, depth=4, num_heads=2),
        img_size=64,
        conv_inplane=16,
        deform_num_heads=2,
        interaction_indexes=((0, 1), (2, 3)),
        block_type="beit",
    )
    params = vit_adapter.init(base, jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(7).standard_normal((1, 64, 64, 3)), np.float32
    )
    out_g = vit_adapter.apply(params, x, base)
    cfg_w = dc.replace(base, window_attn=(True, False, True, False),
                       window_size=2)
    out_w = vit_adapter.apply(params, x, cfg_w)
    assert [f.shape for f in out_w] == [f.shape for f in out_g]
    assert all(np.isfinite(np.asarray(f)).all() for f in out_w)
    assert np.abs(np.asarray(out_w[1]) - np.asarray(out_g[1])).max() > 1e-5

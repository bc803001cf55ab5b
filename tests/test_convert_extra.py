"""Converter edge cases: L14 inference, non-contiguous layers, demo CLI
ckpt path."""

import numpy as np
import pytest
import torch

from metatransformer_tpu.core import convert, encoder

from . import torch_ref


def test_large_scale_inference():
    blocks = torch_ref.make_encoder(dim=64, depth=24, num_heads=4, seed=0)
    state = {k: v.detach().numpy() for k, v in blocks.state_dict().items()}
    params = convert.convert_state_dict(state)
    cfg = convert.infer_config(params)
    assert cfg.depth == 24 and cfg.dim == 64
    # the real L14 rule: dim/64 heads
    assert convert.infer_config(
        {"norm1_scale": np.zeros((24, 1024))}
    ) == encoder.LARGE


def test_non_contiguous_layers_rejected():
    blocks = torch_ref.make_encoder(dim=32, depth=2, num_heads=2, seed=0)
    state = {k: v.detach().numpy() for k, v in blocks.state_dict().items()}
    # drop layer 0 -> indices {1} only
    state = {k: v for k, v in state.items() if k.startswith("1.")}
    with pytest.raises(ValueError, match="non-contiguous"):
        convert.convert_state_dict(state)


def test_pth_cli_roundtrip(tmp_path):
    blocks = torch_ref.make_encoder(dim=32, depth=2, num_heads=2, seed=1)
    pth = str(tmp_path / "enc.pth")
    npz = str(tmp_path / "enc.npz")
    torch.save(blocks.state_dict(), pth)
    convert.main([pth, npz])
    params, cfg = convert.load_npz(npz)
    assert cfg.depth == 2 and cfg.dim == 32
    assert params["qkv_w"].shape == (2, 32, 96)


def test_released_layout_strict_roundtrip():
    """The exact released-checkpoint key layout
    (``Meta-Transformer_base_patch16_encoder.pth``: flat nn.Sequential of
    12 timm Blocks, keys like ``0.attn.qkv.weight`` with torch [out, in]
    weight shapes — /root/reference/README.md:125-135), built by hand and
    mapped strict=True into the encoder pytree."""
    import jax.numpy as jnp

    from metatransformer_tpu.core import encoder

    rng = np.random.default_rng(0)
    d, depth = 768, 12
    layer_shapes = {
        "norm1.weight": (d,), "norm1.bias": (d,),
        "attn.qkv.weight": (3 * d, d), "attn.qkv.bias": (3 * d,),
        "attn.proj.weight": (d, d), "attn.proj.bias": (d,),
        "norm2.weight": (d,), "norm2.bias": (d,),
        "mlp.fc1.weight": (4 * d, d), "mlp.fc1.bias": (4 * d,),
        "mlp.fc2.weight": (d, 4 * d), "mlp.fc2.bias": (d,),
    }
    state = {
        f"{i}.{k}": rng.standard_normal(s).astype(np.float32) * 0.02
        for i in range(depth)
        for k, s in layer_shapes.items()
    }
    assert len(state) == 144  # the full released key set

    params = convert.convert_state_dict(state)
    cfg = convert.infer_config(params)
    assert (cfg.dim, cfg.depth, cfg.num_heads) == (768, 12, 12)
    # strict both ways: every checkpoint key consumed, every pytree leaf
    # present with the stacked-depth shape
    shapes = encoder.param_shapes(cfg)
    assert set(params) == set(shapes)
    for name, shape in shapes.items():
        assert params[name].shape == (depth,) + shape, name
    # torch stores Linear weights [out, in]; ours are [in, out]
    np.testing.assert_allclose(
        params["qkv_w"][3], state["3.attn.qkv.weight"].T, atol=0
    )
    x = jnp.asarray(
        rng.standard_normal((1, 197, d)).astype(np.float32)
    )
    out = encoder.encode(
        {k: jnp.asarray(v) for k, v in params.items()}, x, cfg
    )
    assert np.isfinite(np.asarray(out)).all()

    # strict=True failure modes: a missing key and an unknown key both raise
    missing = dict(state)
    missing.pop("7.mlp.fc2.bias")
    with pytest.raises(Exception):
        convert.convert_state_dict(missing)
    extra = dict(state)
    extra["0.attn.q_bias"] = np.zeros((d,), np.float32)
    with pytest.raises(Exception):
        convert.convert_state_dict(extra)


def test_released_layout_strict_roundtrip_l14():
    """Same strict both-ways mapping at the flagship L14 layout
    (``Meta-Transformer_large_patch14_encoder.pth``: 24 timm Blocks x
    1024 dim -> 288 flat keys, Image/README.md:19)."""
    rng = np.random.default_rng(1)
    d, depth = 1024, 24
    layer_shapes = {
        "norm1.weight": (d,), "norm1.bias": (d,),
        "attn.qkv.weight": (3 * d, d), "attn.qkv.bias": (3 * d,),
        "attn.proj.weight": (d, d), "attn.proj.bias": (d,),
        "norm2.weight": (d,), "norm2.bias": (d,),
        "mlp.fc1.weight": (4 * d, d), "mlp.fc1.bias": (4 * d,),
        "mlp.fc2.weight": (d, 4 * d), "mlp.fc2.bias": (d,),
    }
    state = {
        f"{i}.{k}": rng.standard_normal(s).astype(np.float32) * 0.02
        for i in range(depth)
        for k, s in layer_shapes.items()
    }
    assert len(state) == 288

    params = convert.convert_state_dict(state)
    cfg = convert.infer_config(params)
    assert cfg == encoder.LARGE
    assert (cfg.dim, cfg.depth, cfg.num_heads) == (1024, 24, 16)
    shapes = encoder.param_shapes(cfg)
    assert set(params) == set(shapes)
    for name, shape in shapes.items():
        assert params[name].shape == (depth,) + shape, name

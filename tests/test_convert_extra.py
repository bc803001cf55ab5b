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

"""Video / hyper-spectral / tabular tokenizer + model tests."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from metatransformer_tpu.core import encoder
from metatransformer_tpu.models import (
    hyper_classifier,
    tabular_classifier,
    video_classifier,
)
from metatransformer_tpu.tokenizers import hyper as hyper_tok
from metatransformer_tpu.tokenizers import tabular as tab_tok
from metatransformer_tpu.tokenizers import video as video_tok


def test_video_tokenizer_matches_torch_conv3d():
    cfg = video_tok.VideoTokenizerConfig(
        num_frames=4, img_size=16, patch_size=8, tubelet_size=2, in_channels=3, dim=24
    )
    torch.manual_seed(0)
    conv = torch.nn.Conv3d(3, 24, kernel_size=(2, 8, 8), stride=(2, 8, 8))
    params = video_tok.convert_torch_conv3d(
        conv.weight.detach().numpy(), conv.bias.detach().numpy()
    )
    clips = np.random.default_rng(0).standard_normal((2, 4, 16, 16, 3)).astype(
        np.float32
    )
    with torch.no_grad():
        # torch layout [B, C, T, H, W]
        x = torch.from_numpy(clips.transpose(0, 4, 1, 2, 3))
        want = conv(x).flatten(2).transpose(1, 2).numpy()
    got = np.asarray(video_tok.apply(params, jnp.asarray(clips), cfg))
    assert got.shape == (2, cfg.num_patches, 24)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_video_classifier_shapes():
    cfg = video_classifier.VideoClassifierConfig(
        tokenizer=video_tok.VideoTokenizerConfig(
            num_frames=4, img_size=16, patch_size=8, tubelet_size=2, dim=32
        ),
        encoder=encoder.EncoderConfig(dim=32, depth=2, num_heads=4),
        num_classes=7,
    )
    params = video_classifier.init(cfg, jax.random.PRNGKey(0))
    clips = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 4, 16, 16, 3), np.float32)
    )
    out = video_classifier.forward(params, clips, cfg)
    assert out.shape == (2, 7)
    assert np.isfinite(np.asarray(out)).all()


def test_hyper_tokenizer_and_classifier():
    tcfg = hyper_tok.HyperTokenizerConfig(img_size=4, near_band=3, num_tokens=8, dim=32)
    cfg = hyper_classifier.HyperClassifierConfig(
        tokenizer=tcfg,
        encoder=encoder.EncoderConfig(dim=32, depth=2, num_heads=4),
        num_classes=5,
    )
    params = hyper_classifier.init(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 8, tcfg.patch_dim), np.float32)
    )
    tokens = hyper_tok.apply(params["tokenizer"], x, tcfg, params["cls_token"])
    assert tokens.shape == (2, 9, 32)  # cls + 8
    out = hyper_classifier.forward(params, x, cfg)
    assert out.shape == (2, 5)


def test_tabular_offsets_and_lookup():
    tcfg = tab_tok.TabularTokenizerConfig(vocab_sizes=(3, 5, 2), dim=8)
    params = tab_tok.init(tcfg, jax.random.PRNGKey(0))
    cats = jnp.asarray([[0, 0, 0], [2, 4, 1]], jnp.int32)
    tokens = tab_tok.apply(params, cats, tcfg)
    assert tokens.shape == (2, 3, 8)
    table = np.asarray(params["embed"])
    # column offsets 0, 3, 8
    np.testing.assert_array_equal(np.asarray(tokens)[0, 0], table[0])
    np.testing.assert_array_equal(np.asarray(tokens)[1, 1], table[3 + 4])
    np.testing.assert_array_equal(np.asarray(tokens)[1, 2], table[8 + 1])


def test_tabular_classifier_with_continuous():
    tcfg = tab_tok.TabularTokenizerConfig(vocab_sizes=(3, 5), n_continuous=2, dim=16)
    cfg = tabular_classifier.TabularClassifierConfig(
        tokenizer=tcfg,
        encoder=encoder.EncoderConfig(dim=16, depth=1, num_heads=2),
        num_classes=2,
    )
    params = tabular_classifier.init(cfg, jax.random.PRNGKey(0))
    cats = jnp.asarray([[0, 1], [2, 3]], jnp.int32)
    cont = jnp.asarray([[0.5, -1.0], [1.5, 2.0]], jnp.float32)
    out = tabular_classifier.forward(params, cats, cfg, cont)
    assert out.shape == (2, 2)
    assert np.isfinite(np.asarray(out)).all()

def test_hyper_caf_mode():
    """CAF (Hyper-spectrum/train.py:22 --mode, metatransformer.py:96-107):
    identity-initialised skip mix => CAF == ViT at init exactly; after a
    gradient step the skipcat weights carry gradient (the fusion path is
    live); depth-2 config degenerates to zero skipcats."""
    tcfg = hyper_tok.HyperTokenizerConfig(
        img_size=4, near_band=2, num_tokens=8, dim=32
    )
    ecfg = encoder.EncoderConfig(dim=32, depth=4, num_heads=4)
    vit = hyper_classifier.HyperClassifierConfig(
        tokenizer=tcfg, encoder=ecfg, num_classes=5, mode="vit"
    )
    caf = hyper_classifier.HyperClassifierConfig(
        tokenizer=tcfg, encoder=ecfg, num_classes=5, mode="caf"
    )
    params = hyper_classifier.init(caf, jax.random.PRNGKey(0))
    assert params["skipcat_w"].shape == (2, 9, 9, 2)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 8, tcfg.patch_dim), np.float32)
    )
    out_caf = hyper_classifier.forward(params, x, caf)
    vit_params = {k: v for k, v in params.items() if not k.startswith("skipcat")}
    out_vit = hyper_classifier.forward(vit_params, x, vit)
    np.testing.assert_allclose(
        np.asarray(out_caf), np.asarray(out_vit), rtol=1e-5, atol=1e-5
    )

    labels = jnp.asarray([1, 3])

    def loss(p):
        logits = hyper_classifier.forward(p, x, caf)
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["skipcat_w"]).max()) > 0
    assert float(jnp.abs(g["skipcat_b"]).max()) > 0

    shallow = hyper_classifier.HyperClassifierConfig(
        tokenizer=tcfg,
        encoder=encoder.EncoderConfig(dim=32, depth=2, num_heads=4),
        num_classes=5,
        mode="caf",
    )
    p2 = hyper_classifier.init(shallow, jax.random.PRNGKey(2))
    assert p2["skipcat_w"].shape == (0, 9, 9, 2)
    assert hyper_classifier.forward(p2, x, shallow).shape == (2, 5)

"""Image tokenizer + full classifier parity vs torch (the M1 gate:
raw image -> logits as one jitted program, <=1e-3 vs PyTorch)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from metatransformer_tpu.core import convert, encoder
from metatransformer_tpu.heads import cls as cls_head
from metatransformer_tpu.models import image_classifier
from metatransformer_tpu.tokenizers import image as image_tok

from . import torch_ref


def test_patch_tokenizer_matches_torch_conv():
    cfg = image_tok.ImageTokenizerConfig(img_size=32, patch_size=8, in_channels=3, dim=24)
    torch.manual_seed(0)
    conv = torch.nn.Conv2d(3, 24, kernel_size=8, stride=8)
    params = image_tok.convert_torch_conv(
        conv.weight.detach().numpy(), conv.bias.detach().numpy()
    )
    x = np.random.default_rng(0).standard_normal((2, 32, 32, 3), dtype=np.float32)
    with torch.no_grad():
        # torch: NCHW conv -> flatten(2) -> transpose => [B, T, D]
        want = conv(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        want = want.flatten(2).transpose(1, 2).numpy()
    got = np.asarray(image_tok.apply(params, jnp.asarray(x), cfg))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_full_image_classifier_matches_torch():
    """End-to-end: patchify -> cls+pos -> blocks -> LN -> head vs torch."""
    rng = np.random.default_rng(1)
    dim, depth, heads, ncls, img, patch = 64, 2, 4, 5, 16, 8
    cfg = image_classifier.ImageClassifierConfig(
        tokenizer=image_tok.ImageTokenizerConfig(img, patch, 3, dim),
        encoder=encoder.EncoderConfig(dim=dim, depth=depth, num_heads=heads),
        num_classes=ncls,
    )
    params = image_classifier.init(cfg, jax.random.PRNGKey(0))

    # torch twin built from the SAME params.
    blocks = torch_ref.make_encoder(dim, depth, heads, seed=3)
    state = {k: v.detach().numpy() for k, v in blocks.state_dict().items()}
    params["encoder"] = {
        k: jnp.asarray(v) for k, v in convert.convert_state_dict(state).items()
    }

    x = rng.standard_normal((2, img, img, 3), dtype=np.float32)

    # Manual torch forward replicating the assembly.
    w = np.asarray(params["tokenizer"]["w"])  # [p*p*c, D]
    b = np.asarray(params["tokenizer"]["b"])
    pos = np.asarray(params["pos_embed"])
    cls_tok = np.asarray(params["prefix_tokens"])
    with torch.no_grad():
        patches = np.asarray(image_tok.patchify(jnp.asarray(x), patch))
        tokens = patches @ w + b
        tokens = np.concatenate(
            [np.broadcast_to(cls_tok, (2, 1, dim)), tokens], axis=1
        )
        h = torch.from_numpy((tokens + pos).astype(np.float32))
        h = blocks(h)
        ln = torch.nn.LayerNorm(dim, eps=1e-6)
        ln.weight.data = torch.from_numpy(np.asarray(params["norm_scale"]))
        ln.bias.data = torch.from_numpy(np.asarray(params["norm_bias"]))
        feats = ln(h)[:, 0, :]
        hw = torch.from_numpy(np.asarray(params["head"]["w0"]))
        hb = torch.from_numpy(np.asarray(params["head"]["b0"]))
        hln = torch.nn.LayerNorm(dim, eps=1e-6)
        hln.weight.data = torch.from_numpy(np.asarray(params["head"]["norm_scale"]))
        hln.bias.data = torch.from_numpy(np.asarray(params["head"]["norm_bias"]))
        want = (hln(feats) @ hw + hb).numpy()

    got = np.asarray(image_classifier.forward(params, jnp.asarray(x), cfg))
    assert got.shape == (2, ncls)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_cls_head_mlp_stack():
    cfg = cls_head.ClsHeadConfig(in_dim=16, num_classes=4, mlps=(32, 8), use_norm=False)
    params = cls_head.init(cfg, jax.random.PRNGKey(0))
    x = jnp.ones((3, 16))
    out = cls_head.apply(params, x, cfg)
    assert out.shape == (3, 4)
    # dropout path needs rng and stays deterministic in eval
    out2 = cls_head.apply(params, x, cfg, train=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_pool_modes():
    from metatransformer_tpu.models import classifier as clf

    e = encoder.EncoderConfig(dim=8, depth=1, num_heads=2)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 5, 8), np.float32))
    for mode, want_dim in [("cls", 8), ("mean", 8), ("cls,max", 16), ("cls,max,avg", 24)]:
        cfg = clf.ClassifierConfig(
            encoder=e,
            head=cls_head.ClsHeadConfig(8, 2),
            seq_len=4,
            pool=mode,
        )
        assert clf.pool(x, cfg).shape == (2, want_dim), mode

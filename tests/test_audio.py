"""Audio path: fbank DSP parity (jnp vs numpy oracle), tone sanity,
AST tokenizer parity vs torch strided conv, full pipeline smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from metatransformer_tpu.core import encoder
from metatransformer_tpu.models import audio_classifier
from metatransformer_tpu.ops import fbank as fbank_op
from metatransformer_tpu.tokenizers import audio as audio_tok


def test_fbank_jnp_matches_numpy_oracle():
    cfg = fbank_op.FbankConfig()
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)  # 1s @ 16k
    want = fbank_op.fbank_np(wav, cfg)
    got = np.asarray(fbank_op.fbank(jnp.asarray(wav[None]), cfg))[0]
    assert want.shape == (98, 128)  # 1 + (16000-400)//160 frames
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fbank_tone_peaks_at_expected_mel_bin():
    cfg = fbank_op.FbankConfig()
    t = np.arange(16000) / 16000.0
    for freq in (440.0, 2000.0):
        wav = np.sin(2 * np.pi * freq * t).astype(np.float32)
        feats = fbank_op.fbank_np(wav, cfg)
        peak_bin = int(np.median(np.argmax(feats, axis=1)))
        # expected mel bin for this frequency
        mel = lambda f: 1127.0 * np.log1p(f / 700.0)
        lo, hi = mel(20.0), mel(8000.0)
        expect = (mel(freq) - lo) / ((hi - lo) / (cfg.num_mel_bins + 1)) - 1
        assert abs(peak_bin - expect) <= 2, (freq, peak_bin, expect)


def test_fbank_dc_removal_and_preemphasis_flags():
    cfg = fbank_op.FbankConfig()
    wav = np.ones(1000, np.float32)  # pure DC
    feats = fbank_op.fbank_np(wav, cfg)
    # DC removed -> frames all zero -> log(eps) floor everywhere
    assert np.allclose(feats, np.log(fbank_op.EPS))


def test_ast_tokenizer_matches_torch_strided_conv():
    cfg = audio_tok.AudioTokenizerConfig(
        num_mel_bins=40, num_frames=60, patch_size=16, fstride=10, tstride=10, dim=24
    )
    torch.manual_seed(0)
    conv = torch.nn.Conv2d(1, 24, kernel_size=(16, 16), stride=(10, 10))
    params = audio_tok.convert_torch_conv(
        conv.weight.detach().numpy(), conv.bias.detach().numpy()
    )
    spec = np.random.default_rng(0).standard_normal((2, 60, 40)).astype(np.float32)
    with torch.no_grad():
        # AST forward: [B,T,F] -> unsqueeze(1) -> transpose(2,3) -> [B,1,F,T]
        x = torch.from_numpy(spec).unsqueeze(1).transpose(2, 3)
        want = conv(x).flatten(2).transpose(1, 2).numpy()
    got = np.asarray(audio_tok.apply(params, jnp.asarray(spec), cfg))
    assert cfg.f_patches == 3 and cfg.t_patches == 5
    assert got.shape == (2, 15, 24)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_rgb_channel_sum_init():
    rng = np.random.default_rng(0)
    rgb_w = rng.standard_normal((8, 3, 16, 16)).astype(np.float32)
    rgb_b = rng.standard_normal(8).astype(np.float32)
    params = audio_tok.init_from_rgb_patch(rgb_w, rgb_b)
    assert params["w"].shape == (16, 16, 1, 8)
    np.testing.assert_allclose(
        np.asarray(params["w"])[..., 0, :].transpose(2, 0, 1),
        rgb_w.sum(1)[:, :, :],
        rtol=1e-6,
    )


def test_waveform_to_logits_one_program():
    cfg = audio_classifier.AudioClassifierConfig(
        tokenizer=audio_tok.AudioTokenizerConfig(
            num_mel_bins=128, num_frames=98, patch_size=16, dim=32
        ),
        encoder=encoder.EncoderConfig(dim=32, depth=2, num_heads=4),
        num_classes=5,
    )
    params = audio_classifier.init(cfg, jax.random.PRNGKey(0))
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 16000)).astype(np.float32) * 0.1
    )
    logits = audio_classifier.forward_waveform(params, wav, cfg)
    assert logits.shape == (2, 5)
    assert np.isfinite(np.asarray(logits)).all()


class TestAdaptPosEmbed:
    """AudioSet-pretrained pos-embed cut/interp adaptation
    (ast_models.py:98-135)."""

    def _pos(self, f0=12, t0=101, d=8, prefix=2):
        rng = np.random.default_rng(0)
        return jnp.asarray(
            rng.standard_normal((1, prefix + f0 * t0, d)).astype(np.float32)
        )

    def test_cut_is_center_slice(self):
        pos = self._pos()
        out = audio_classifier.adapt_pos_embed(pos, (12, 101), (12, 25))
        assert out.shape == (1, 2 + 12 * 25, 8)
        grid = np.asarray(pos[:, 2:]).reshape(1, 12, 101, 8)
        start = 101 // 2 - 25 // 2
        expect = grid[:, :, start : start + 25].reshape(1, -1, 8)
        np.testing.assert_allclose(np.asarray(out[:, 2:]), expect)
        np.testing.assert_allclose(np.asarray(out[:, :2]), np.asarray(pos[:, :2]))

    def test_interpolate_grows_both_axes(self):
        pos = self._pos()
        out = audio_classifier.adapt_pos_embed(pos, (12, 101), (16, 128))
        assert out.shape == (1, 2 + 16 * 128, 8)
        # bilinear resize of a constant field stays constant
        const = jnp.concatenate(
            [jnp.zeros((1, 2, 8)), jnp.ones((1, 12 * 101, 8))], axis=1
        )
        out_c = audio_classifier.adapt_pos_embed(const, (12, 101), (16, 128))
        np.testing.assert_allclose(np.asarray(out_c[:, 2:]), 1.0, atol=1e-5)

    def test_mixed_cut_time_grow_freq(self):
        pos = self._pos()
        out = audio_classifier.adapt_pos_embed(pos, (12, 101), (14, 50))
        assert out.shape == (1, 2 + 14 * 50, 8)
        assert np.isfinite(np.asarray(out)).all()

    def test_identity_grid_is_noop(self):
        pos = self._pos()
        out = audio_classifier.adapt_pos_embed(pos, (12, 101), (12, 101))
        np.testing.assert_allclose(np.asarray(out), np.asarray(pos))

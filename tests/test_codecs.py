"""Serving-edge payload codecs: encoded bytes -> arrays -> features.

The production ingress layer the reference delegates to client-side
torchvision/decord/torchaudio preprocessing; here it is part of serving
(data/codecs.py + serving.maybe_decode/ServingDaemon.submit).
"""

import dataclasses
import io
import wave

import jax
import numpy as np
import pytest

from metatransformer_tpu import pipeline, serving
from metatransformer_tpu.core import encoder as enc
from metatransformer_tpu.data import codecs, video_decode
from metatransformer_tpu.ops import fbank as fbank_ops

pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def _jpeg_bytes(h=96, w=120, quality=90) -> bytes:
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (h, w, 3), np.uint8)
    bio = io.BytesIO()
    Image.fromarray(arr).save(bio, "JPEG", quality=quality)
    return bio.getvalue()


def _wav_bytes(seconds=0.5, sr=16000, freq=440.0) -> bytes:
    t = np.arange(int(sr * seconds)) / sr
    pcm = (np.sin(2 * np.pi * freq * t) * 2**14).astype(np.int16)
    bio = io.BytesIO()
    with wave.open(bio, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return bio.getvalue()


def _avi_bytes(t=10, h=64, w=80) -> bytes:
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    frames = np.clip(
        127 + 80 * np.sin(yy[None] / 12 + np.arange(t)[:, None, None] * 0.5),
        0, 255,
    ).astype(np.uint8)
    frames = np.repeat(frames[..., None], 3, -1)
    import tempfile, os

    with tempfile.NamedTemporaryFile(suffix=".avi", delete=False) as f:
        path = f.name
    video_decode.write_mjpeg_avi(frames, path)
    data = open(path, "rb").read()
    os.unlink(path)
    return data


@pytest.mark.fast
def test_sniff():
    assert codecs.sniff(_jpeg_bytes()) == "jpeg"
    assert codecs.sniff(_wav_bytes()) == "wav"
    assert codecs.sniff(_avi_bytes()) == "avi"
    assert codecs.sniff(codecs.encode_npy(np.zeros(3))) == "npy"
    assert codecs.sniff(codecs.encode_npz({"a": np.zeros(3)})) == "npz"
    assert codecs.sniff("hello world".encode()) == "utf8"
    bio = io.BytesIO()
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(bio, "PNG")
    assert codecs.sniff(bio.getvalue()) == "png"
    # demo._MEDIA_EXTS accepts all of these
    for fmt, kind in (("BMP", "bmp"), ("WEBP", "webp"), ("GIF", "gif"),
                      ("TIFF", "tiff")):
        bio = io.BytesIO()
        try:
            Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(bio, fmt)
        except (KeyError, OSError):  # PIL built without this codec
            continue
        assert codecs.sniff(bio.getvalue()) == kind


@pytest.mark.fast
def test_extra_image_formats_decode_as_images():
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, (80, 100, 3), np.uint8)
    for fmt in ("BMP", "WEBP", "GIF", "TIFF"):
        bio = io.BytesIO()
        try:
            Image.fromarray(arr).save(bio, fmt)
        except (KeyError, OSError):
            continue
        img = codecs.decode_payload("image", bio.getvalue(), img_size=32)
        assert img.shape == (1, 32, 32, 3) and img.dtype == np.uint8


@pytest.mark.fast
def test_animated_gif_decodes_to_sampled_clip():
    rng = np.random.default_rng(2)
    # 12 distinct frames so sampling is observable
    frames = [
        Image.fromarray(np.full((48, 64, 3), 20 * i, np.uint8))
        for i in range(12)
    ]
    bio = io.BytesIO()
    frames[0].save(
        bio, "GIF", save_all=True, append_images=frames[1:], duration=40
    )
    clip = codecs.decode_payload(
        "video", bio.getvalue(), num_frames=4, img_size=32
    )
    assert clip.shape == (1, 4, 32, 32, 3) and clip.dtype == np.uint8
    # sampled frames span the animation, not a repeated still
    means = clip[0].reshape(4, -1).mean(1)
    assert means[-1] > means[0] + 50


@pytest.mark.fast
def test_image_payloads():
    img = codecs.decode_payload("image", _jpeg_bytes(), img_size=64)
    assert img.shape == (1, 64, 64, 3) and img.dtype == np.uint8
    ir = codecs.decode_payload("infrared", _jpeg_bytes(), img_size=32)
    assert ir.shape == (1, 32, 32, 1)
    # a still image for the video modality becomes a repeated-frame clip
    clip = codecs.decode_payload("video", _jpeg_bytes(), img_size=32,
                                 num_frames=4)
    assert clip.shape == (1, 4, 32, 32, 3)
    np.testing.assert_array_equal(clip[0, 0], clip[0, 3])


@pytest.mark.fast
def test_avi_payload():
    clip = codecs.decode_payload("video", _avi_bytes(), img_size=48,
                                 num_frames=8)
    assert clip.shape == (1, 8, 48, 48, 3) and clip.dtype == np.uint8


@pytest.mark.fast
def test_wav_payload_matches_fbank_oracle():
    payload = _wav_bytes()
    spec = codecs.decode_payload("audio", payload, audio_frames=64,
                                 mel_bins=128)
    assert spec.shape == (1, 64, 128) and spec.dtype == np.float32
    # must equal the fbank numpy oracle on the same samples
    with wave.open(io.BytesIO(payload), "rb") as w:
        data = (
            np.frombuffer(w.readframes(w.getnframes()), np.int16)
            .astype(np.float32) / 32768.0
        )
    want = fbank_ops.fbank_np(data, fbank_ops.FbankConfig())[:64]
    n = want.shape[0]  # 0.5 s -> 48 frames; codecs zero-pads to 64
    np.testing.assert_allclose(spec[0, :n], want, rtol=1e-5, atol=1e-5)
    assert (spec[0, n:] == 0).all()


@pytest.mark.fast
def test_text_payload():
    ids = codecs.decode_payload("text", "a photo of a cat".encode())
    assert ids.shape == (1, 77) and ids.dtype == np.int32
    assert ids[0, 0] > 0 and (ids[0] == 0).sum() > 0  # SOT + zero pad


@pytest.mark.fast
def test_npy_npz_payloads():
    pts = np.random.default_rng(0).standard_normal((256, 3), np.float32)
    out = codecs.decode_payload("point", codecs.encode_npy(pts))
    np.testing.assert_array_equal(out, pts[None])
    g = {"x": np.zeros((5, 9), np.float32), "ids": np.arange(5)}
    out = codecs.decode_payload("graph", codecs.encode_npz(g))
    assert set(out) == {"x", "ids"} and out["x"].shape == (1, 5, 9)


@pytest.mark.fast
def test_wrong_container_rejected():
    with pytest.raises(ValueError, match="payload for modality"):
        codecs.decode_payload("audio", _jpeg_bytes())
    with pytest.raises(ValueError, match="tensor modalities"):
        codecs.decode_payload("point", b"not a container")


def _setup_daemon():
    cfg = serving.ServingConfig(
        encoder=enc.EncoderConfig(dim=32, depth=2, num_heads=2),
        precision=enc.FP32,
    )
    img = pipeline.Data2Seq("image", dim=32)
    img = pipeline.Data2Seq(
        "image", dim=32,
        config=dataclasses.replace(img.config, img_size=32, dim=32),
    )
    tok_params = img.init(jax.random.PRNGKey(0))
    enc_params = enc.init(cfg.encoder, jax.random.PRNGKey(1))
    disp = serving.Dispatcher({"image": (img, tok_params)}, enc_params, cfg)
    return serving.ServingDaemon(disp, decode_opts={"img_size": 32})


@pytest.mark.fast
def test_daemon_accepts_bytes_end_to_end():
    daemon = _setup_daemon()
    try:
        fut = daemon.submit(serving.Request("image", _jpeg_bytes()))
        out = fut.result(timeout=300)
        assert out.shape == (32,) and np.isfinite(out).all()
        # bytes and its pre-decoded array must serve identically
        arr = codecs.decode_payload("image", _jpeg_bytes(), img_size=32)
        fut2 = daemon.submit(serving.Request("image", arr))
        np.testing.assert_allclose(out, fut2.result(timeout=300), atol=1e-5)
        # malformed payload fails ITS future only, daemon stays up
        bad = daemon.submit(serving.Request("image", b"\xff\xd8\xffgarbage"))
        with pytest.raises(Exception):
            bad.result(timeout=60)
        ok = daemon.submit(serving.Request("image", _jpeg_bytes()))
        assert ok.result(timeout=300).shape == (32,)
    finally:
        daemon.stop()


@pytest.mark.fast
def test_mp4_payload_cv2():
    """MP4 bytes sniff by ISO-BMFF ftyp and decode through the cv2
    container path into the same clip protocol as AVI."""
    import os
    import tempfile

    cv2 = pytest.importorskip("cv2")
    frames = np.stack(
        [np.full((48, 64, 3), 40 * i, np.uint8) for i in range(6)]
    )
    with tempfile.NamedTemporaryFile(suffix=".mp4", delete=False) as f:
        path = f.name
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 12, (64, 48))
    assert wr.isOpened()
    for fr in frames:
        wr.write(fr[..., ::-1])
    wr.release()
    data = open(path, "rb").read()
    os.unlink(path)

    assert codecs.sniff(data) == "mp4"
    clip = codecs.decode_payload("video", data, img_size=32, num_frames=4)
    assert clip.shape == (1, 4, 32, 32, 3) and clip.dtype == np.uint8
    with pytest.raises(ValueError, match="mp4 payload"):
        codecs.decode_payload("image", data)


@pytest.mark.fast
def test_image_payload_cv2_matches_pil(monkeypatch):
    """The serving-edge decode produces the same geometry and near-equal
    pixels whether cv2 or the PIL fallback handles the payload."""
    pytest.importorskip("cv2")
    from metatransformer_tpu.data import image_folder

    payload = _jpeg_bytes()
    a = codecs.decode_payload("image", payload, img_size=64)
    monkeypatch.setattr(image_folder, "_CV2", None)
    monkeypatch.setattr(image_folder, "_CV2_TRIED", True)
    b = codecs.decode_payload("image", payload, img_size=64)
    assert a.shape == b.shape == (1, 64, 64, 3)
    err = np.abs(a.astype(np.float32) - b.astype(np.float32)).mean()
    assert err < 4.0, f"cv2/PIL serving-edge divergence {err}"

    ir_a = codecs.decode_payload("infrared", payload, img_size=32)
    monkeypatch.undo()
    ir_b = codecs.decode_payload("infrared", payload, img_size=32)
    assert ir_a.shape == ir_b.shape == (1, 32, 32, 1)
    err = np.abs(ir_a.astype(np.float32) - ir_b.astype(np.float32)).mean()
    assert err < 4.0, f"grayscale divergence {err}"

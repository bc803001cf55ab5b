"""Video-container ingestion: AVI files -> frames -> train batches.

The reference decodes Kinetics containers with decord
(Video/dataset/datasets.py:1-60); data/video_decode.py is the native
container layer (RIFF walk + PIL MJPEG / raw DIB). These tests cover the
container round-trip, metadata probe, sampled-index decode, and the
manifest pipeline end-to-end from .avi files.
"""

import json

import numpy as np
import pytest

from metatransformer_tpu.data import video_dataset, video_decode

pytest.importorskip("PIL")


def _smooth_frames(t=12, h=48, w=64):
    """Low-frequency content so JPEG loss stays small and boundable."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    frames = []
    for i in range(t):
        r = 127 + 100 * np.sin(yy / 16 + i * 0.4)
        g = 127 + 100 * np.cos(xx / 20 - i * 0.3)
        b = np.full((h, w), 30.0 + 10 * i)
        frames.append(np.stack([r, g, b], -1))
    return np.clip(np.stack(frames), 0, 255).astype(np.uint8)


@pytest.mark.fast
def test_mjpeg_roundtrip(tmp_path):
    frames = _smooth_frames()
    path = str(tmp_path / "clip.avi")
    video_decode.write_mjpeg_avi(frames, path, fps=30.0, quality=92)
    out = video_decode.read_avi(path)
    assert out.shape == frames.shape and out.dtype == np.uint8
    err = np.abs(out.astype(np.float32) - frames.astype(np.float32)).mean()
    assert err < 6.0, f"JPEG round-trip mean abs err {err}"


@pytest.mark.fast
def test_dib_roundtrip_exact(tmp_path):
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (5, 33, 47, 3), np.uint8)  # odd W: stride pad
    path = str(tmp_path / "raw.avi")
    video_decode.write_dib_avi(frames, path)
    out = video_decode.read_avi(path)
    np.testing.assert_array_equal(out, frames)


@pytest.mark.fast
def test_probe_and_count(tmp_path):
    frames = _smooth_frames(t=9, h=32, w=40)
    path = str(tmp_path / "clip.avi")
    video_decode.write_mjpeg_avi(frames, path, fps=24.0)
    info = video_decode.probe_avi(path)
    assert (info.width, info.height) == (40, 32)
    assert info.num_frames == 9
    assert abs(info.fps - 24.0) < 1e-6
    assert video_decode.count_frames(path) == 9


@pytest.mark.fast
def test_sampled_indices_decode(tmp_path):
    frames = _smooth_frames(t=12)
    path = str(tmp_path / "clip.avi")
    video_decode.write_dib_avi(frames, path)  # lossless -> exact compare
    idx = np.array([0, 3, 3, 11, 7])  # unordered + duplicate + last
    out = video_decode.read_avi(path, idx)
    np.testing.assert_array_equal(out, frames[idx])


@pytest.mark.fast
def test_avi_manifest_pipeline(tmp_path):
    """JSONL manifest of .avi clips -> iter_batches -> normalized batch,
    the same path the npy manifests take (decord-style sampled decode)."""
    rng = np.random.default_rng(0)
    items = []
    for i in range(4):
        clip_path = tmp_path / f"clip{i}.avi"
        video_decode.write_mjpeg_avi(_smooth_frames(t=10 + i), str(clip_path))
        items.append({"clip": str(clip_path), "label": i % 2})
    manifest = tmp_path / "manifest.jsonl"
    manifest.write_text("\n".join(json.dumps(it) for it in items))

    cfg = video_dataset.VideoDatasetConfig(num_frames=8, crop_size=32)
    loaded = video_dataset.read_manifest(str(manifest))
    batches = list(video_dataset.iter_batches(loaded, cfg, 2, rng))
    assert len(batches) == 2
    vid = batches[0]["video"]
    assert vid.shape == (2, 8, 32, 32, 3)
    assert np.isfinite(vid).all()
    assert batches[0]["label"].shape == (2,)


def test_truncated_file_rejected(tmp_path):
    path = tmp_path / "junk.avi"
    path.write_bytes(b"RIFF\x10\x00\x00\x00AVI junkdata")
    with pytest.raises(ValueError, match="no video stream"):
        video_decode.read_avi(str(path))


def test_non_avi_rejected(tmp_path):
    path = tmp_path / "x.avi"
    path.write_bytes(b"\x89PNG\r\n\x1a\nnot an avi file at all")
    with pytest.raises(ValueError, match="not a RIFF"):
        video_decode.read_avi(str(path))


# ---------------------------------------------------------------------------
# cv2/FFmpeg path: mp4 and other entropy-coded containers
# ---------------------------------------------------------------------------

cv2 = pytest.importorskip("cv2")


def _write_mp4(frames: np.ndarray, path: str, fps: float = 12.0) -> None:
    h, w = frames.shape[1:3]
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    assert wr.isOpened(), "cv2 FFmpeg backend cannot write mp4 here"
    for fr in frames:
        wr.write(fr[..., ::-1])  # RGB -> BGR
    wr.release()


@pytest.mark.fast
def test_mp4_roundtrip_cv2(tmp_path):
    frames = _smooth_frames(t=10)
    path = str(tmp_path / "clip.mp4")
    _write_mp4(frames, path)
    assert video_decode.count_video_frames(path) == 10
    out = video_decode.read_video(path)
    assert out.shape == frames.shape and out.dtype == np.uint8
    err = np.abs(out.astype(np.float32) - frames.astype(np.float32)).mean()
    assert err < 8.0, f"mp4 round-trip mean abs err {err}"


@pytest.mark.fast
def test_mp4_sampled_indices(tmp_path):
    frames = _smooth_frames(t=12)
    path = str(tmp_path / "clip.mp4")
    _write_mp4(frames, path)
    idx = np.array([0, 3, 3, 11, 7])  # unordered + duplicate + last
    out = video_decode.read_video(path, idx)
    assert out.shape == (5,) + frames.shape[1:]
    # lossy codec: compare against a full sequential decode instead
    full = video_decode.read_video(path)
    np.testing.assert_array_equal(out, full[idx])


@pytest.mark.fast
def test_mp4_manifest_pipeline(tmp_path):
    """.mp4 clips flow through the same manifest/iter_batches path as
    .avi and .npy (decord parity: Video/dataset/datasets.py:1-60)."""
    rng = np.random.default_rng(0)
    items = []
    for i in range(2):
        clip_path = tmp_path / f"clip{i}.mp4"
        _write_mp4(_smooth_frames(t=10 + i), str(clip_path))
        items.append({"clip": str(clip_path), "label": i})
    manifest = tmp_path / "manifest.jsonl"
    manifest.write_text("\n".join(json.dumps(it) for it in items))

    cfg = video_dataset.VideoDatasetConfig(num_frames=8, crop_size=32)
    loaded = video_dataset.read_manifest(str(manifest))
    batches = list(video_dataset.iter_batches(loaded, cfg, 2, rng))
    assert len(batches) == 1
    assert batches[0]["video"].shape == (2, 8, 32, 32, 3)
    assert np.isfinite(batches[0]["video"]).all()


@pytest.mark.fast
def test_compressed_avi_falls_back_to_cv2(tmp_path):
    """A non-MJPEG/DIB AVI (e.g. MPEG-4 fourcc) can't take the native
    RIFF walk; read_video must route it through cv2 instead of raising
    the native path's NotImplementedError."""
    frames = _smooth_frames(t=6)
    path = str(tmp_path / "xvid.avi")
    h, w = frames.shape[1:3]
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 12, (w, h))
    assert wr.isOpened()
    for fr in frames:
        wr.write(fr[..., ::-1])
    wr.release()
    with pytest.raises(NotImplementedError):
        video_decode.read_avi(path, np.array([0]))
    out = video_decode.read_video(path, np.array([0, 5]))
    assert out.shape == (2, h, w, 3)
    err = np.abs(out[0].astype(np.float32) - frames[0].astype(np.float32))
    assert err.mean() < 8.0

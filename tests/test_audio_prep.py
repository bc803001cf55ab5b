"""Speech-Commands-style manifest prep over a synthetic dataset tree."""

import json
import os
import wave

import numpy as np

from metatransformer_tpu.data import audio_prep, loaders


def _write_wav(path, sr=16000, n=8000, freq=440.0):
    t = np.arange(n) / sr
    data = (np.sin(2 * np.pi * freq * t) * 20000).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(data.tobytes())


def _make_tree(root):
    for label in ("yes", "no"):
        os.makedirs(os.path.join(root, label), exist_ok=True)
        for i in range(3):
            _write_wav(os.path.join(root, label, f"{i}.wav"), freq=300 + i * 100)
    os.makedirs(os.path.join(root, "_background_noise_"), exist_ok=True)
    with open(os.path.join(root, "validation_list.txt"), "w") as f:
        f.write("yes/1.wav\n")
    with open(os.path.join(root, "testing_list.txt"), "w") as f:
        f.write("no/2.wav\n")


def test_manifest_generation(tmp_path):
    root = str(tmp_path / "sc")
    out = str(tmp_path / "manifests")
    _make_tree(root)
    counts = audio_prep.write_manifests(root, out)
    assert counts == {"train": 4, "valid": 1, "test": 1}
    data = loaders.read_audio_manifest(
        os.path.join(out, "speechcommand_train_data.json")
    )
    assert len(data) == 4 and {"wav", "labels"} <= set(data[0])
    csv = open(os.path.join(out, "class_labels_indices.csv")).read()
    assert "yes" in csv and "no" in csv and "_background_noise_" not in csv


def test_wav_reader_and_fix_length(tmp_path):
    path = str(tmp_path / "tone.wav")
    _write_wav(path, n=8000, freq=440.0)
    wav, sr = audio_prep.load_wav(path)
    assert sr == 16000 and len(wav) == 8000
    assert np.abs(wav).max() <= 1.0
    fixed = audio_prep.fix_length(wav, 16000)
    assert len(fixed) == 16000 and np.all(fixed[8000:] == 0)
    # the 440 Hz tone must dominate the spectrum
    spec = np.abs(np.fft.rfft(wav))
    peak_hz = np.argmax(spec) * sr / len(wav)
    assert abs(peak_hz - 440.0) < 5


def test_norm_stats_match_direct_computation(tmp_path):
    """compute_norm_stats (get_norm_stats.py surface) == the mean/std of
    the concatenated per-clip fbanks."""
    from metatransformer_tpu.ops import fbank as fbank_lib

    root = str(tmp_path / "sc")
    _make_tree(root)
    out = str(tmp_path / "manifests")
    audio_prep.write_manifests(root, out)
    manifest = os.path.join(out, "speechcommand_train_data.json")

    mean, std = audio_prep.compute_norm_stats(manifest, num_samples=16000)

    with open(manifest) as f:
        items = json.load(f)["data"]
    feats = np.concatenate([
        fbank_lib.fbank_np(
            audio_prep.fix_length(audio_prep.load_wav(i["wav"])[0], 16000)
        ).ravel()
        for i in items
    ])
    np.testing.assert_allclose(mean, feats.mean(), rtol=1e-6)
    np.testing.assert_allclose(std, feats.std(), rtol=1e-5)

"""Audio dataset preparation: directory tree -> AST JSON manifests.

Reference: ``Audio/src/prep_sc.py:16-30`` — walks the Speech Commands V2
directory (one subdirectory per keyword), writes train/val/test JSON
manifests {"data": [{"wav", "labels"}...]} plus the label CSV, honoring
the official validation_list.txt / testing_list.txt splits when present.
Download-free: operates on any local directory in the same layout.
"""

from __future__ import annotations

import json
import os
import wave
from typing import Dict, List, Optional, Tuple

import numpy as np


def scan_dataset(root: str) -> Tuple[List[Dict[str, str]], List[str]]:
    """-> (entries [{'wav', 'labels'}...], sorted label list)."""
    labels = sorted(
        d for d in os.listdir(root)
        if os.path.isdir(os.path.join(root, d)) and not d.startswith("_")
    )
    entries = []
    for label in labels:
        for name in sorted(os.listdir(os.path.join(root, label))):
            if name.endswith(".wav"):
                entries.append(
                    {"wav": os.path.join(root, label, name), "labels": label}
                )
    return entries, labels


def _read_list(root: str, name: str) -> set:
    path = os.path.join(root, name)
    if not os.path.exists(path):
        return set()
    with open(path) as f:
        return {line.strip() for line in f if line.strip()}


def write_manifests(root: str, out_dir: str) -> Dict[str, int]:
    """Write train/valid/test JSON manifests + class_labels_indices.csv."""
    entries, labels = scan_dataset(root)
    val = _read_list(root, "validation_list.txt")
    test = _read_list(root, "testing_list.txt")
    splits: Dict[str, List] = {"train": [], "valid": [], "test": []}
    for e in entries:
        rel = os.path.relpath(e["wav"], root)
        if rel in test:
            splits["test"].append(e)
        elif rel in val:
            splits["valid"].append(e)
        else:
            splits["train"].append(e)
    os.makedirs(out_dir, exist_ok=True)
    for split, data in splits.items():
        with open(os.path.join(out_dir, f"speechcommand_{split}_data.json"), "w") as f:
            json.dump({"data": data}, f)
    with open(os.path.join(out_dir, "class_labels_indices.csv"), "w") as f:
        f.write("index,mid,display_name\n")
        for i, label in enumerate(labels):
            f.write(f"{i},/m/spcmd{i:02d},{label}\n")
    return {k: len(v) for k, v in splits.items()}


def load_wav(path: str) -> Tuple[np.ndarray, int]:
    """Minimal PCM16 wav reader (torchaudio.load equivalent for SC data)."""
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
        data = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
        if w.getnchannels() > 1:
            data = data.reshape(-1, w.getnchannels()).mean(1)
    return data, sr


def fix_length(wav: np.ndarray, num_samples: int) -> np.ndarray:
    """Pad/trim to a fixed sample count (SC clips are <=1 s)."""
    if len(wav) >= num_samples:
        return wav[:num_samples]
    return np.pad(wav, (0, num_samples - len(wav)))


def compute_norm_stats(
    manifest_path: str,
    num_samples: int = 16000,
    max_items: Optional[int] = None,
) -> Tuple[float, float]:
    """Dataset fbank mean/std for dataloader normalization.

    Reference: ``Audio/src/get_norm_stats.py`` — iterates the manifest,
    computes kaldi fbank per clip, accumulates the global frame mean and
    std that ``AudiosetDataset`` then applies as (x - mean) / (2 * std)
    (``Audio/src/dataloader.py:80-88``). Uses the numpy fbank twin
    (:func:`metatransformer_tpu.ops.fbank.fbank_np`) so prep stays
    host-side.
    """
    from metatransformer_tpu.ops import fbank as fbank_lib

    with open(manifest_path) as f:
        items = json.load(f)["data"]
    if max_items:
        items = items[:max_items]
    total = total_sq = count = 0.0
    for item in items:
        wav, _sr = load_wav(item["wav"])
        feats = fbank_lib.fbank_np(fix_length(wav, num_samples))
        total += float(feats.sum())
        total_sq += float(np.square(feats).sum())
        count += feats.size
    mean = total / max(count, 1.0)
    std = float(np.sqrt(max(total_sq / max(count, 1.0) - mean * mean, 1e-12)))
    return mean, std

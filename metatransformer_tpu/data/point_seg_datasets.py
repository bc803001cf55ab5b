"""Point-cloud segmentation dataset loaders: S3DIS rooms and ShapeNetPart.

References:
* S3DIS — ``PointCloud/openpoints/dataset/s3dis/s3dis.py``: rooms stored
  as per-object ``Annotations/{class}_{i}.txt`` files of ``x y z r g b``
  rows; training samples 1 m x 1 m blocks of ``num_points`` with the
  9-dim feature layout (xyz, rgb/255, normalized room xyz).
* ShapeNetPart — ``openpoints/dataset/shapenetpart/shapenetpart.py``:
  ``*.txt`` files of ``x y z nx ny nz seg_label`` rows under per-category
  synset dirs, with train/val/test JSON file lists.

Host-side numpy loaders (the reference does this in dataloader workers);
outputs are fixed-size arrays ready for the jitted seg models.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

S3DIS_CLASSES = (
    "ceiling", "floor", "wall", "beam", "column", "window", "door",
    "table", "chair", "sofa", "bookcase", "board", "clutter",
)
_S3DIS_IDX = {c: i for i, c in enumerate(S3DIS_CLASSES)}


def load_s3dis_room(room_dir: str) -> Tuple[np.ndarray, np.ndarray]:
    """``{room}/Annotations/{class}_{k}.txt`` objects -> (points [N, 6]
    xyzrgb, labels [N]). Unknown class names fall into 'clutter'
    (collect_indoor3d_data semantics)."""
    pts_list, lab_list = [], []
    for path in sorted(glob.glob(os.path.join(room_dir, "Annotations", "*.txt"))):
        cls = os.path.basename(path).split("_")[0]
        label = _S3DIS_IDX.get(cls, _S3DIS_IDX["clutter"])
        arr = np.loadtxt(path, dtype=np.float32).reshape(-1, 6)
        pts_list.append(arr)
        lab_list.append(np.full(len(arr), label, np.int64))
    if not pts_list:
        raise FileNotFoundError(f"no Annotations/*.txt under {room_dir}")
    return np.concatenate(pts_list), np.concatenate(lab_list)


def s3dis_block_sample(
    points: np.ndarray,  # [N, 6] xyzrgb
    labels: np.ndarray,  # [N]
    num_points: int,
    rng: np.random.Generator,
    block_size: float = 1.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Sample one block around a random seed point -> (feat [P, 9],
    labels [P]). Feature layout: centered xy + z, rgb/255, xyz normalized
    by the room extent (the classic 9-dim S3DIS input)."""
    xyz = points[:, :3]
    room_min, room_max = xyz.min(0), xyz.max(0)
    for _ in range(16):
        seed = xyz[rng.integers(len(xyz))]
        lo = seed[:2] - block_size / 2
        hi = seed[:2] + block_size / 2
        mask = np.all((xyz[:, :2] >= lo) & (xyz[:, :2] <= hi), axis=1)
        if mask.sum() >= max(num_points // 4, 1):
            break
    idx = np.where(mask)[0]
    sel = rng.choice(idx, num_points, replace=len(idx) < num_points)
    block = points[sel]
    feat = np.zeros((num_points, 9), np.float32)
    center = (lo + hi) / 2
    feat[:, 0:2] = block[:, 0:2] - center
    feat[:, 2] = block[:, 2]
    feat[:, 3:6] = block[:, 3:6] / 255.0
    feat[:, 6:9] = (block[:, :3] - room_min) / np.maximum(
        room_max - room_min, 1e-6
    )
    return feat, labels[sel]


def list_s3dis_rooms(
    root: str, test_area: int = 5, split: str = "train"
) -> List[str]:
    """``{root}/Area_{k}/{room}`` dirs; Area_{test_area} held out
    (the 6-fold protocol's single-fold slice)."""
    rooms = sorted(glob.glob(os.path.join(root, "Area_*", "*")))
    rooms = [r for r in rooms if os.path.isdir(r)]
    tag = f"Area_{test_area}"
    if split == "train":
        return [r for r in rooms if tag not in r]
    return [r for r in rooms if tag in r]


# ---------------------------------------------------------------------------
# ShapeNetPart
# ---------------------------------------------------------------------------

# synset -> (category name, part-label offset); 50 parts over 16 cats
SHAPENETPART_CATEGORIES = {
    "02691156": ("airplane", 0), "02773838": ("bag", 4),
    "02954340": ("cap", 6), "02958343": ("car", 8),
    "03001627": ("chair", 12), "03261776": ("earphone", 16),
    "03467517": ("guitar", 19), "03624134": ("knife", 22),
    "03636649": ("lamp", 24), "03642806": ("laptop", 28),
    "03790512": ("motorbike", 30), "03797390": ("mug", 36),
    "03948459": ("pistol", 38), "04099429": ("rocket", 41),
    "04225987": ("skateboard", 44), "04379243": ("table", 47),
}


def load_shapenetpart_file(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """``x y z nx ny nz seg`` rows -> (xyz [N, 3], normals [N, 3],
    seg labels [N])."""
    arr = np.loadtxt(path, dtype=np.float32).reshape(-1, 7)
    return arr[:, :3], arr[:, 3:6], arr[:, 6].astype(np.int64)


def load_shapenetpart_split(
    root: str, split: str = "train"
) -> List[Tuple[str, str]]:
    """``train_test_split/shuffled_{split}_file_list.json`` entries
    ``shape_data/{synset}/{id}`` -> [(synset, txt path)]."""
    with open(
        os.path.join(
            root, "train_test_split", f"shuffled_{split}_file_list.json"
        )
    ) as f:
        entries = json.load(f)
    out = []
    for e in entries:
        _, synset, sid = e.split("/")
        out.append((synset, os.path.join(root, synset, f"{sid}.txt")))
    return out


def shapenetpart_sample(
    path: str,
    synset: str,
    num_points: int,
    rng: np.random.Generator,
) -> Dict[str, np.ndarray]:
    """One shape -> fixed-size sample with globally-offset part labels and
    the category id (the seg head predicts all 50 parts; category
    conditions the valid slice — shapenetpart.py label layout)."""
    xyz, normals, seg = load_shapenetpart_file(path)
    name, offset = SHAPENETPART_CATEGORIES[synset]
    sel = rng.choice(len(xyz), num_points, replace=len(xyz) < num_points)
    # normalize into the unit sphere (pc_normalize)
    p = xyz[sel]
    p = p - p.mean(0)
    p = p / np.maximum(np.linalg.norm(p, axis=1).max(), 1e-6)
    cat_id = sorted(SHAPENETPART_CATEGORIES).index(synset)
    return {
        "points": p.astype(np.float32),
        "normals": normals[sel],
        "seg": seg[sel] + offset,
        "category": np.int64(cat_id),
        "category_name": name,
    }

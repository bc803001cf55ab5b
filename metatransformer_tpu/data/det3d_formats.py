"""Dataset format readers for the 3D-detection corpora: nuScenes table
JSONs, Waymo (pcdet-preprocessed layout), ONCE annotation JSONs.

References:
* nuScenes — ``AutonomousDriving/pcdet/datasets/nuscenes/
  nuscenes_dataset.py`` + the devkit's table schema (relational JSON
  tables keyed by token: sample, sample_data, sample_annotation,
  ego_pose, calibrated_sensor, category). We read the tables directly
  (the devkit the reference shells out to is an external dep).
* Waymo — ``pcdet/datasets/waymo/waymo_dataset.py``: the raw TFRecords
  are preprocessed once into per-frame ``.npy`` point arrays + an info
  list with an ``annos`` dict; we read THAT layout (the proto decode is
  the one-time offline step, out of the serving path).
* ONCE — ``pcdet/datasets/once/once_dataset.py`` + devkit: per-sequence
  ``{seq_id}.json`` with ``frames[*].annos`` (names, boxes_3d [N, 7]),
  lidar ``.bin`` files (x, y, z, intensity rows like KITTI).

All readers emit the native evaluators' frame records
(``nuscenes_eval.NuscFrame`` / ``waymo_eval.WaymoFrame``) so a raw
annotation tree drives ``evaluate`` end-to-end.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from metatransformer_tpu.data.nuscenes_eval import NuscFrame
from metatransformer_tpu.data.waymo_eval import WaymoFrame

# ---------------------------------------------------------------------------
# nuScenes
# ---------------------------------------------------------------------------

NUSC_TABLES = (
    "sample", "sample_data", "sample_annotation", "ego_pose",
    "calibrated_sensor", "category",
)

# detection-challenge class collapse (nuscenes_dataset map_name_from_general...)
NUSC_CLASS_MAP = {
    "vehicle.car": 0,
    "vehicle.truck": 1,
    "vehicle.bus.rigid": 2,
    "human.pedestrian.adult": 3,
    "vehicle.bicycle": 4,
}


def load_nusc_tables(root: str, version: str = "v1.0-mini") -> Dict[str, Dict]:
    """Each table JSON (a list of records) -> {token: record}."""
    out: Dict[str, Dict] = {}
    base = os.path.join(root, version)
    for name in NUSC_TABLES:
        with open(os.path.join(base, f"{name}.json")) as f:
            rows = json.load(f)
        out[name] = {r["token"]: r for r in rows}
    return out


def quaternion_yaw(q: Sequence[float]) -> float:
    """(w, x, y, z) -> yaw around +z (devkit quaternion_yaw: rotate the
    x-axis and take atan2 of its image)."""
    w, x, y, z = q
    # rotated x-axis components
    vx = 1.0 - 2.0 * (y * y + z * z)
    vy = 2.0 * (x * y + z * w)
    return float(np.arctan2(vy, vx))


def _quat_rot(q: Sequence[float]) -> np.ndarray:
    w, x, y, z = q
    return np.asarray(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )


def nusc_sample_annotations(
    tables: Dict[str, Dict],
    sample_token: str,
    class_map: Optional[Dict[str, int]] = None,
) -> NuscFrame:
    """Ground-truth boxes of one keyframe in the GLOBAL frame -> NuscFrame
    (x, y, z, dx, dy, dz, yaw). nuScenes stores size as (w, l, h); the
    eval frame wants (dx=l, dy=w, dz=h)."""
    class_map = class_map or NUSC_CLASS_MAP
    boxes, labels, vels = [], [], []
    for ann in tables["sample_annotation"].values():
        if ann["sample_token"] != sample_token:
            continue
        cat = ann.get("category_name")
        if cat not in class_map:
            continue
        x, y, z = ann["translation"]
        w, l, h = ann["size"]
        yaw = quaternion_yaw(ann["rotation"])
        boxes.append([x, y, z, l, w, h, yaw])
        labels.append(class_map[cat])
        vels.append(ann.get("velocity", [0.0, 0.0])[:2])
    return NuscFrame(
        boxes=np.asarray(boxes, np.float64).reshape(-1, 7),
        labels=np.asarray(labels, np.int64),
        velocities=np.asarray(vels, np.float64).reshape(-1, 2),
    )


def nusc_global_to_lidar(
    tables: Dict[str, Dict], sample_data_token: str, frame: NuscFrame
) -> NuscFrame:
    """Global-frame boxes -> the lidar sensor frame of one sample_data:
    undo ego_pose, then calibrated_sensor (devkit Box.translate/rotate
    chain in nuscenes_dataset get_sample_data)."""
    sd = tables["sample_data"][sample_data_token]
    ego = tables["ego_pose"][sd["ego_pose_token"]]
    cal = tables["calibrated_sensor"][sd["calibrated_sensor_token"]]
    boxes = frame.boxes.copy()
    if len(boxes):
        for trans, rot in (
            (ego["translation"], ego["rotation"]),
            (cal["translation"], cal["rotation"]),
        ):
            r = _quat_rot(rot)
            boxes[:, :3] = (boxes[:, :3] - np.asarray(trans)) @ r
            boxes[:, 6] -= quaternion_yaw(rot)
    return NuscFrame(
        boxes=boxes, labels=frame.labels, scores=frame.scores,
        velocities=frame.velocities,
    )


def read_nusc_lidar(path: str) -> np.ndarray:
    """nuScenes .pcd.bin: float32 rows (x, y, z, intensity, ring) ->
    [N, 5]."""
    return np.fromfile(path, np.float32).reshape(-1, 5)


# ---------------------------------------------------------------------------
# Waymo (pcdet preprocessed layout)
# ---------------------------------------------------------------------------

WAYMO_CLASS_MAP = {"Vehicle": 0, "Pedestrian": 1, "Cyclist": 2}


def read_waymo_points(path: str) -> np.ndarray:
    """Per-frame ``{sequence}/{frame:04d}.npy``: [N, 6]
    (x, y, z, intensity, elongation, NLZ flag)."""
    pts = np.load(path)
    if pts.ndim != 2 or pts.shape[1] < 3:
        raise ValueError(f"bad waymo point array {pts.shape} in {path}")
    return pts


def load_waymo_infos(path: str) -> List[Dict]:
    """The ``*.pkl`` info list written by the one-time preprocessor
    (waymo_dataset.get_infos): each info has ``point_cloud`` (lidar
    sequence + sample idx) and ``annos``."""
    with open(path, "rb") as f:
        infos = pickle.load(f)
    if not isinstance(infos, list):
        raise ValueError("waymo info file must hold a list of frame infos")
    return infos


def waymo_info_to_frame(
    info: Dict, class_map: Optional[Dict[str, int]] = None
) -> WaymoFrame:
    """info["annos"] {name, gt_boxes_lidar [N, 7], num_points_in_gt} ->
    WaymoFrame for the native evaluator."""
    class_map = class_map or WAYMO_CLASS_MAP
    annos = info["annos"]
    names = np.asarray(annos["name"])
    keep = np.asarray([n in class_map for n in names], bool)
    boxes = np.asarray(annos["gt_boxes_lidar"], np.float64).reshape(-1, 7)[keep]
    labels = np.asarray([class_map[n] for n in names[keep]], np.int64)
    npts = annos.get("num_points_in_gt")
    return WaymoFrame(
        boxes=boxes,
        labels=labels,
        num_points=(np.asarray(npts)[keep] if npts is not None else None),
    )


# ---------------------------------------------------------------------------
# ONCE
# ---------------------------------------------------------------------------

ONCE_CLASS_MAP = {"Car": 0, "Truck": 0, "Bus": 0, "Pedestrian": 1,
                  "Cyclist": 2}  # superclass collapse (once eval)


def read_once_lidar(path: str) -> np.ndarray:
    """ONCE lidar_roof ``.bin``: float32 (x, y, z, intensity) rows."""
    return np.fromfile(path, np.float32).reshape(-1, 4)


def load_once_sequence(path: str) -> List[Dict]:
    """``{seq_id}.json`` -> frame dicts (frame_id, pose, annos?)."""
    with open(path) as f:
        seq = json.load(f)
    return seq["frames"]


def once_frame_annotations(
    frame: Dict, class_map: Optional[Dict[str, int]] = None
) -> WaymoFrame:
    """frame["annos"] {names, boxes_3d [N, 7]} -> eval frame (the ONCE
    evaluator shares the WaymoFrame record)."""
    class_map = class_map or ONCE_CLASS_MAP
    annos = frame.get("annos") or {"names": [], "boxes_3d": []}
    names = np.asarray(annos["names"])
    boxes = np.asarray(annos["boxes_3d"], np.float64).reshape(-1, 7)
    keep = np.asarray([n in class_map for n in names], bool)
    return WaymoFrame(
        boxes=boxes[keep],
        labels=np.asarray([class_map[n] for n in names[keep]], np.int64),
    )

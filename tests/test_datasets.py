"""Dataset pipelines: 3D augmentor/gt-sampling, KITTI eval, ModelNet40/
ScanObjectNN loaders, Kinetics-style video pipeline — fixture-tested
(no real datasets in this environment; formats match the reference's)."""

import os

import numpy as np
import pytest

from metatransformer_tpu.data import (
    augmentor3d,
    kitti_eval,
    point_datasets,
    video_dataset,
)


# --------------------------- augmentor3d ----------------------------------

def _simple_scene(rng):
    pts = rng.uniform(-20, 20, (200, 4)).astype(np.float32)
    boxes = np.array(
        [[5.0, 5.0, 0.0, 4.0, 2.0, 1.5, 0.3],
         [-8.0, 2.0, 0.0, 0.8, 0.6, 1.7, 0.0]], np.float32
    )
    names = np.array(["Car", "Pedestrian"])
    inside = np.concatenate(
        [
            np.c_[b[None, :3] + rng.uniform(-0.2, 0.2, (12, 3)),
                  np.zeros((12, 1))]
            for b in boxes
        ]
    ).astype(np.float32)
    return np.concatenate([pts, inside]), boxes, names


def test_gt_database_and_sampler():
    rng = np.random.default_rng(0)
    pts, boxes, names = _simple_scene(rng)
    db = augmentor3d.build_gt_database(
        [{"points": pts, "gt_boxes": boxes, "gt_names": names}]
    )
    assert set(db) == {"Car", "Pedestrian"}
    assert db["Car"][0]["points"].shape[0] >= 12
    # db points are box-local
    assert np.abs(db["Car"][0]["points"][:, :3]).max() < 3.0

    cfg = augmentor3d.GTSamplerConfig(
        sample_groups={"Car": 3, "Pedestrian": 2}, min_points=5
    )
    new_pts, new_boxes, new_names = augmentor3d.sample_gt_boxes(
        db, pts, boxes, names, cfg, rng
    )
    # same db object placed at its stored pose collides with the existing
    # gt, so counts can stay - but never exceed targets, and no overlaps
    assert (new_names == "Car").sum() <= 3
    assert new_boxes.shape[0] >= boxes.shape[0]
    ov = augmentor3d.boxes_bev_overlap(new_boxes, new_boxes)
    np.fill_diagonal(ov, False)
    # sampled boxes (beyond the originals) must not overlap anything
    assert not ov[2:].any()


def test_world_augment_consistency():
    """Points inside a gt box stay inside it through the augment queue."""
    rng = np.random.default_rng(1)
    pts, boxes, names = _simple_scene(rng)
    inside_before = augmentor3d.points_in_box(pts, boxes[0]).sum()
    cfg = augmentor3d.Augmentor3DConfig(gt_sampling=None)
    out_pts, out_boxes, _ = augmentor3d.augment_scene(
        pts, boxes, names, cfg, rng
    )
    inside_after = augmentor3d.points_in_box(out_pts, out_boxes[0]).sum()
    assert inside_after == inside_before
    assert out_boxes.shape == boxes.shape


# --------------------------- kitti_eval -----------------------------------

def test_kitti_ap_perfect_and_empty():
    boxes = np.array([[10.0, 0, 0, 4, 2, 1.5, 0.0],
                      [20.0, 5, 0, 4, 2, 1.5, 0.5]], np.float32)
    ann = kitti_eval.KittiAnnotation(
        boxes=boxes, names=np.array(["Car", "Car"])
    )
    perfect = {"boxes": boxes, "scores": np.array([0.9, 0.8]),
               "names": np.array(["Car", "Car"])}
    ap = kitti_eval.ap_r40([perfect], [ann], "Car", difficulty=1, metric="3d")
    assert ap > 0.99
    none = {"boxes": np.zeros((0, 7)), "scores": np.zeros(0),
            "names": np.zeros(0, dtype="<U3")}
    assert kitti_eval.ap_r40([none], [ann], "Car") == 0.0


def test_kitti_ap_penalizes_false_positives():
    boxes = np.array([[10.0, 0, 0, 4, 2, 1.5, 0.0]], np.float32)
    ann = kitti_eval.KittiAnnotation(boxes=boxes, names=np.array(["Car"]))
    noisy = {
        "boxes": np.concatenate([boxes, boxes + 15.0]),
        "scores": np.array([0.6, 0.9]),  # the FP outranks the TP
        "names": np.array(["Car", "Car"]),
    }
    ap_noisy = kitti_eval.ap_r40([noisy], [ann], "Car")
    perfect = {"boxes": boxes, "scores": np.array([0.9]),
               "names": np.array(["Car"])}
    ap_perfect = kitti_eval.ap_r40([perfect], [ann], "Car")
    assert ap_noisy < ap_perfect


def test_kitti_difficulty_gates():
    boxes = np.array([[10.0, 0, 0, 4, 2, 1.5, 0.0]], np.float32)
    hard_gt = kitti_eval.KittiAnnotation(
        boxes=boxes, names=np.array(["Car"]),
        truncated=np.array([0.4]), occluded=np.array([2]),
        bbox_height=np.array([30.0]),
    )
    pred = {"boxes": boxes, "scores": np.array([0.9]),
            "names": np.array(["Car"])}
    # easy bucket ignores this gt entirely (no valid gt -> AP 0),
    # hard bucket counts it
    assert kitti_eval.ap_r40([pred], [hard_gt], "Car", difficulty=0) == 0.0
    assert kitti_eval.ap_r40([pred], [hard_gt], "Car", difficulty=2) > 0.99
    full = kitti_eval.evaluate([pred], [hard_gt], classes=("Car",))
    assert "Car_3d_hard" in full and full["Car_3d_hard"] > 0.99


# --------------------------- point datasets --------------------------------

def test_modelnet_h5_roundtrip(tmp_path):
    import h5py

    rng = np.random.default_rng(2)
    for shard in range(2):
        with h5py.File(tmp_path / f"ply_data_train{shard}.h5", "w") as f:
            f["data"] = rng.standard_normal((10, 128, 3)).astype(np.float32)
            f["label"] = rng.integers(0, 40, (10, 1))
    pts, labels = point_datasets.load_modelnet40_h5(str(tmp_path), "train")
    assert pts.shape == (20, 128, 3) and labels.shape == (20,)

    cfg = point_datasets.PointDatasetConfig(npoints=64)
    batches = point_datasets.make_batches(pts, labels, cfg, 8, rng)
    assert batches[0]["points"].shape == (8, 64, 3)
    assert batches[0]["label"].shape == (8,)

    with pytest.raises(FileNotFoundError):
        point_datasets.load_modelnet40_h5(str(tmp_path), "test")


def test_scanobjectnn_h5(tmp_path):
    import h5py

    os.makedirs(tmp_path / "main_split")
    with h5py.File(
        tmp_path / "main_split" / "training_objectdataset_augmentedrot_scale75.h5",
        "w",
    ) as f:
        f["data"] = np.zeros((5, 64, 3), np.float32)
        f["label"] = np.arange(5)
    pts, labels = point_datasets.load_scanobjectnn_h5(str(tmp_path), "train")
    assert pts.shape == (5, 64, 3) and labels.tolist() == [0, 1, 2, 3, 4]


# --------------------------- video dataset ---------------------------------

def test_video_sampling_and_views(tmp_path):
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, (64, 48, 64, 3), dtype=np.uint8)
    cfg = video_dataset.VideoDatasetConfig(num_frames=8, crop_size=32)

    idx = video_dataset.sample_frame_indices(64, 8, rng)
    assert len(idx) == 8 and (np.diff(idx) >= 0).all() and idx.max() < 64

    clip = video_dataset.train_clip(frames, cfg, rng)
    assert clip.shape == (8, 32, 32, 3)
    assert abs(float(clip.mean())) < 3.0  # normalized

    views = video_dataset.test_views(frames, cfg)
    assert views.shape == (15, 8, 32, 32, 3)  # 5 temporal x 3 spatial

    # manifest + batch iterator
    np.save(tmp_path / "clip0.npy", frames)
    import json

    with open(tmp_path / "manifest.jsonl", "w") as f:
        for _ in range(4):
            f.write(json.dumps(
                {"clip": str(tmp_path / "clip0.npy"), "label": 2}
            ) + "\n")
    items = video_dataset.read_manifest(str(tmp_path / "manifest.jsonl"))
    batches = list(video_dataset.iter_batches(items, cfg, 2, rng))
    assert len(batches) == 2
    assert batches[0]["video"].shape == (2, 8, 32, 32, 3)
    assert batches[0]["label"].tolist() == [2, 2]

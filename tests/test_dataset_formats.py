"""Fixture round-trips for the dataset format readers: nuScenes tables,
Waymo (pcdet layout), ONCE JSONs, S3DIS rooms, ShapeNetPart, and the TS
M4/UEA providers — each reader feeds its native evaluator or model input
end to end (VERDICT r2 missing #3/#4)."""

import json
import os
import pickle

import numpy as np

from metatransformer_tpu.data import det3d_formats as d3f
from metatransformer_tpu.data import nuscenes_eval, once_eval, waymo_eval
from metatransformer_tpu.data import point_seg_datasets as psd
from metatransformer_tpu.data import ts_providers as tsp

# ---------------------------------------------------------------------------
# nuScenes
# ---------------------------------------------------------------------------


def _write_nusc_fixture(root):
    base = os.path.join(root, "v1.0-mini")
    os.makedirs(base, exist_ok=True)
    q_yaw90 = [np.cos(np.pi / 4), 0.0, 0.0, np.sin(np.pi / 4)]  # +90deg
    tables = {
        "sample": [{"token": "s0", "timestamp": 0}],
        "sample_data": [
            {
                "token": "sd0", "sample_token": "s0",
                "ego_pose_token": "ep0", "calibrated_sensor_token": "cs0",
                "filename": "sweeps/LIDAR_TOP/f0.pcd.bin",
            }
        ],
        "ego_pose": [
            {"token": "ep0", "translation": [100.0, 50.0, 0.0],
             "rotation": q_yaw90}
        ],
        "calibrated_sensor": [
            {"token": "cs0", "translation": [1.0, 0.0, 1.8],
             "rotation": [1.0, 0.0, 0.0, 0.0]}
        ],
        "category": [{"token": "c0", "name": "vehicle.car"}],
        "sample_annotation": [
            {
                "token": "a0", "sample_token": "s0",
                "category_name": "vehicle.car",
                "translation": [110.0, 54.0, 1.0],
                "size": [1.9, 4.5, 1.7],  # (w, l, h)
                "rotation": q_yaw90,
            },
            {
                "token": "a1", "sample_token": "s0",
                "category_name": "movable_object.barrier",  # unmapped
                "translation": [0, 0, 0], "size": [1, 1, 1],
                "rotation": [1, 0, 0, 0],
            },
        ],
    }
    for name, rows in tables.items():
        with open(os.path.join(base, f"{name}.json"), "w") as f:
            json.dump(rows, f)


def test_nuscenes_tables_to_eval(tmp_path):
    _write_nusc_fixture(str(tmp_path))
    tables = d3f.load_nusc_tables(str(tmp_path))
    gt = d3f.nusc_sample_annotations(tables, "s0")
    assert gt.boxes.shape == (1, 7)  # the barrier is filtered
    # size reordered (w,l,h) -> (dx=l, dy=w, dz=h)
    np.testing.assert_allclose(gt.boxes[0, 3:6], [4.5, 1.9, 1.7])
    assert abs(gt.boxes[0, 6] - np.pi / 2) < 1e-6

    lidar = d3f.nusc_global_to_lidar(tables, "sd0", gt)
    # ego at (100,50) yaw 90: global (110,54) -> ego (4,-10,1); minus the
    # sensor mount (1,0,1.8) -> (3,-10,-0.8)
    np.testing.assert_allclose(lidar.boxes[0, :3], [3.0, -10.0, -0.8],
                               atol=1e-6)
    assert abs(lidar.boxes[0, 6]) < 1e-6  # yaw back to 0 in sensor frame

    # perfect predictions score mAP 1 in the native evaluator
    pred = nuscenes_eval.NuscFrame(
        boxes=lidar.boxes.copy(), labels=lidar.labels.copy(),
        scores=np.asarray([0.9]),
        velocities=np.zeros((1, 2)),
    )
    res = nuscenes_eval.evaluate([pred], [lidar], classes=(0,))
    assert res["mAP"] > 0.99


def test_quaternion_yaw():
    assert abs(d3f.quaternion_yaw([1, 0, 0, 0])) < 1e-9
    q = [np.cos(0.3), 0.0, 0.0, np.sin(0.3)]
    assert abs(d3f.quaternion_yaw(q) - 0.6) < 1e-9


# ---------------------------------------------------------------------------
# Waymo
# ---------------------------------------------------------------------------


def test_waymo_infos_to_eval(tmp_path):
    pts = np.random.default_rng(0).uniform(-1, 1, (256, 6)).astype(np.float32)
    npy = tmp_path / "seq0" / "0000.npy"
    os.makedirs(npy.parent, exist_ok=True)
    np.save(npy, pts)
    infos = [
        {
            "point_cloud": {"lidar_sequence": "seq0", "sample_idx": 0},
            "annos": {
                "name": np.asarray(["Vehicle", "Sign", "Pedestrian"]),
                "gt_boxes_lidar": np.asarray(
                    [
                        [10.0, 2.0, 1.0, 4.5, 1.9, 1.7, 0.2],
                        [5.0, 5.0, 2.0, 0.5, 0.5, 2.0, 0.0],
                        [3.0, -1.0, 0.9, 0.8, 0.8, 1.7, 1.0],
                    ]
                ),
                "num_points_in_gt": np.asarray([120, 4, 30]),
            },
        }
    ]
    with open(tmp_path / "infos.pkl", "wb") as f:
        pickle.dump(infos, f)

    loaded = d3f.load_waymo_infos(str(tmp_path / "infos.pkl"))
    frame = d3f.waymo_info_to_frame(loaded[0])
    assert frame.boxes.shape == (2, 7)  # Sign filtered
    assert frame.labels.tolist() == [0, 1]
    assert frame.num_points.tolist() == [120, 30]
    assert d3f.read_waymo_points(str(npy)).shape == (256, 6)

    pred = waymo_eval.WaymoFrame(
        boxes=frame.boxes.copy(), labels=frame.labels.copy(),
        scores=np.asarray([0.9, 0.8]),
    )
    res = waymo_eval.evaluate([pred], [frame], classes=(0, 1))
    assert res["AP_class0"] > 0.99 and res["AP_class1"] > 0.99


# ---------------------------------------------------------------------------
# ONCE
# ---------------------------------------------------------------------------


def test_once_json_to_eval(tmp_path):
    seq = {
        "frames": [
            {
                "frame_id": "000000",
                "pose": [0, 0, 0, 1, 0, 0, 0],
                "annos": {
                    "names": ["Car", "Pedestrian", "Unknown"],
                    "boxes_3d": [
                        [8.0, 1.0, 0.5, 4.2, 1.8, 1.6, 0.1],
                        [40.0, -3.0, 0.8, 0.7, 0.7, 1.7, 0.0],
                        [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.0],
                    ],
                },
            },
            {"frame_id": "000001", "pose": [0, 0, 0, 1, 0, 0, 0]},
        ]
    }
    with open(tmp_path / "seq.json", "w") as f:
        json.dump(seq, f)
    pts = np.zeros((32, 4), np.float32)
    pts.tofile(tmp_path / "000000.bin")

    frames = d3f.load_once_sequence(str(tmp_path / "seq.json"))
    assert len(frames) == 2
    gt = d3f.once_frame_annotations(frames[0])
    assert gt.boxes.shape == (2, 7)  # Unknown filtered
    assert d3f.read_once_lidar(str(tmp_path / "000000.bin")).shape == (32, 4)

    pred = waymo_eval.WaymoFrame(
        boxes=gt.boxes.copy(), labels=gt.labels.copy(),
        scores=np.asarray([0.95, 0.85]),
    )
    res = once_eval.evaluate([pred], [gt])
    assert res["AP_class0"] > 0.99
    # the pedestrian sits in the 30-50m ring
    assert res["AP_class1_30-50m"] > 0.99


# ---------------------------------------------------------------------------
# S3DIS / ShapeNetPart
# ---------------------------------------------------------------------------


def _write_s3dis_room(root, area, room):
    ann = os.path.join(root, f"Area_{area}", room, "Annotations")
    os.makedirs(ann, exist_ok=True)
    rng = np.random.default_rng(hash((area, room)) % 2**31)
    for name in ("wall_1", "chair_1", "bogus_1"):
        pts = rng.uniform(0, 2, (40, 6)).astype(np.float32)
        pts[:, 3:] = rng.uniform(0, 255, (40, 3))
        np.savetxt(os.path.join(ann, f"{name}.txt"), pts, fmt="%.4f")


def test_s3dis_room_and_blocks(tmp_path):
    for area, room in ((1, "office_1"), (5, "office_2")):
        _write_s3dis_room(str(tmp_path), area, room)
    train = psd.list_s3dis_rooms(str(tmp_path), test_area=5, split="train")
    test = psd.list_s3dis_rooms(str(tmp_path), test_area=5, split="test")
    assert len(train) == 1 and len(test) == 1

    pts, labels = psd.load_s3dis_room(train[0])
    assert pts.shape == (120, 6) and labels.shape == (120,)
    assert set(labels.tolist()) == {
        psd.S3DIS_CLASSES.index("wall"),
        psd.S3DIS_CLASSES.index("chair"),
        psd.S3DIS_CLASSES.index("clutter"),  # bogus -> clutter
    }
    feat, lab = psd.s3dis_block_sample(
        pts, labels, 64, np.random.default_rng(0)
    )
    assert feat.shape == (64, 9) and lab.shape == (64,)
    assert feat[:, 3:6].max() <= 1.0  # rgb scaled
    assert 0.0 <= feat[:, 6:9].min() and feat[:, 6:9].max() <= 1.0


def test_shapenetpart_split_and_sample(tmp_path):
    synset = "03001627"  # chair, offset 12
    os.makedirs(tmp_path / synset, exist_ok=True)
    rng = np.random.default_rng(1)
    arr = np.hstack(
        [
            rng.standard_normal((50, 3)),
            rng.standard_normal((50, 3)),
            rng.integers(0, 4, (50, 1)),
        ]
    )
    np.savetxt(tmp_path / synset / "shape0.txt", arr, fmt="%.4f")
    os.makedirs(tmp_path / "train_test_split", exist_ok=True)
    with open(
        tmp_path / "train_test_split" / "shuffled_train_file_list.json", "w"
    ) as f:
        json.dump([f"shape_data/{synset}/shape0"], f)

    files = psd.load_shapenetpart_split(str(tmp_path), "train")
    assert files == [(synset, str(tmp_path / synset / "shape0.txt"))]
    sample = psd.shapenetpart_sample(
        files[0][1], files[0][0], 32, np.random.default_rng(0)
    )
    assert sample["points"].shape == (32, 3)
    assert np.linalg.norm(sample["points"], axis=1).max() <= 1.0 + 1e-5
    assert sample["seg"].min() >= 12 and sample["seg"].max() < 16
    assert sample["category_name"] == "chair"


# ---------------------------------------------------------------------------
# M4 / UEA providers
# ---------------------------------------------------------------------------

M4_TRAIN = 'V1,V2,V3,V4,V5\n"H1",10,12,14,16\n"H2",5,6,,\n'
M4_TEST = 'V1,V2,V3\n"H1",18,20\n"H2",7,8\n'

TS_TEXT = """@problemName Toy
@timeStamps false
@univariate false
@classLabel true a b
@data
1,2,3:4,5,6:a
7,8,9:10,11,12:b
"""


def test_m4_provider(tmp_path):
    with open(tmp_path / "Hourly-train.csv", "w") as f:
        f.write(M4_TRAIN)
    with open(tmp_path / "Hourly-test.csv", "w") as f:
        f.write(M4_TEST)
    train = tsp.load_m4(str(tmp_path), "Hourly", "train")
    test = tsp.load_m4(str(tmp_path), "Hourly", "test")
    assert len(train["H1"]) == 4 and len(train["H2"]) == 2  # ragged tail

    win = tsp.m4_windows(train, test, "Hourly", seq_len_mult=1)
    h = tsp.M4_HORIZONS["Hourly"]
    assert win.x.shape == (2, h, 1) and win.y.shape == (2, h, 1)
    # H2 history shorter than seq_len -> left-padded with mask zeros
    i2 = win.ids.index("H2")
    assert win.x_mask[i2].sum() == 2
    np.testing.assert_allclose(win.x[i2, -2:, 0], [5, 6])
    np.testing.assert_allclose(win.y[i2, :2, 0], [7, 8])

    assert tsp.smape(np.asarray([1.0]), np.asarray([1.0])) == 0.0
    naive = tsp.naive2_forecast(np.asarray([1.0, 2.0, 3.0, 4.0]), 4, 2)
    np.testing.assert_allclose(naive, [3, 4, 3, 4])


def test_uea_provider(tmp_path):
    os.makedirs(tmp_path / "Toy", exist_ok=True)
    with open(tmp_path / "Toy" / "Toy_TRAIN.ts", "w") as f:
        f.write(TS_TEXT)
    data, labels, classes = tsp.load_uea(str(tmp_path), "Toy", "TRAIN")
    assert data.shape == (2, 3, 2)
    np.testing.assert_allclose(data[0, :, 0], [1, 2, 3])
    np.testing.assert_allclose(data[1, :, 1], [10, 11, 12])
    assert labels.tolist() == [0, 1] and classes == ["a", "b"]
    normed = tsp.normalize_uea(data)
    np.testing.assert_allclose(normed.mean(axis=1), 0.0, atol=1e-6)


# ---------------------------------------------------------------------------
# SemanticKITTI / ScanNet
# ---------------------------------------------------------------------------


def test_semantickitti_reader(tmp_path):
    seq = tmp_path / "sequences" / "00"
    os.makedirs(seq / "velodyne")
    os.makedirs(seq / "labels")
    pts = np.random.default_rng(0).uniform(-10, 10, (100, 4)).astype(np.float32)
    pts.tofile(seq / "velodyne" / "000000.bin")
    # raw labels: car=10 -> 1, moving-car=252 -> 1, road=40 -> 9,
    # unlabeled=0 -> 0; instance id in the high bits survives
    raw = np.array([10, 252, 40, 0] * 25, np.uint32)
    raw[0] |= np.uint32(7 << 16)
    raw.tofile(seq / "labels" / "000000.label")

    frames = psd.list_semantickitti_frames(str(tmp_path), "train")
    assert len(frames) == 1 and frames[0][1].endswith(".label")
    scan = psd.read_semantickitti_scan(frames[0][0])
    assert scan.shape == (100, 4)
    lab, inst = psd.read_semantickitti_label(frames[0][1])
    assert lab[:4].tolist() == [1, 1, 9, 0]  # learning_map applied
    assert inst[0] == 7 and inst[1] == 0

    # valid split sees nothing in this fixture (sequence 08 absent)
    assert psd.list_semantickitti_frames(str(tmp_path), "valid") == []


def test_scannet_scene_and_remap(tmp_path):
    rng = np.random.default_rng(1)
    coords = rng.uniform(0, 5, (200, 3)).astype(np.float32)
    colors = rng.uniform(0, 255, (200, 3)).astype(np.float32)
    # NYU40: wall=1 -> 0, chair=5 -> 4, desk=14 -> 12, lamp(35) -> ignored
    labels = np.array([1, 5, 14, 35] * 50, np.int64)
    np.savez(tmp_path / "scene0000_00.npz", coords=coords, colors=colors,
             labels=labels)

    scene = psd.load_scannet_scene(str(tmp_path / "scene0000_00.npz"))
    assert scene["labels"][:4].tolist() == [0, 4, 12, -1]
    feat, lab = psd.scannet_block_sample(scene, 64, np.random.default_rng(0))
    assert feat.shape == (64, 6) and lab.shape == (64,)
    assert feat[:, 3:].max() <= 1.0


def test_lyft_infos_sweeps_and_kitti_eval(tmp_path):
    """Lyft: truncated 5-float lidar + sweeps + gt pickle -> points with
    time channel and a KittiAnnotation the native evaluator scores."""
    rng = np.random.default_rng(0)
    # key frame: 40 points + one ego return + a ragged 3-float tail
    key = rng.normal(size=(40, 5)).astype(np.float32) * 10
    key[:, 0] = np.abs(key[:, 0]) + 3  # keep clear of the ego mask
    ego_pt = np.array([[0.2, 0.1, 0.0, 1.0, 0.0]], np.float32)
    raw = np.concatenate([key, ego_pt]).reshape(-1)
    raw = np.concatenate([raw, np.zeros(3, np.float32)])  # truncated row
    (tmp_path / "lidar").mkdir()
    raw.tofile(tmp_path / "lidar" / "key.bin")

    sweep = rng.normal(size=(10, 5)).astype(np.float32) * 10
    sweep[:, 0] = np.abs(sweep[:, 0]) + 3
    sweep.reshape(-1).tofile(tmp_path / "lidar" / "sweep.bin")
    tm = np.eye(4)
    tm[:3, 3] = [1.0, 2.0, 3.0]

    gt_boxes = np.array([[5.0, 0, 0, 4, 2, 1.5, 0.3],
                         [8.0, 3, 0, 0.8, 0.8, 1.7, 0.0]])
    infos = [{
        "lidar_path": "lidar/key.bin", "token": "t0",
        "sweeps": [{"lidar_path": "lidar/sweep.bin",
                    "transform_matrix": tm, "time_lag": 0.05}],
        "gt_boxes": gt_boxes,
        "gt_names": np.array(["car", "pedestrian"]),
    }]
    with open(tmp_path / "infos.pkl", "wb") as f:
        pickle.dump(infos, f)

    loaded = d3f.load_lyft_infos(str(tmp_path / "infos.pkl"))
    pts = d3f.lyft_points_with_sweeps(str(tmp_path), loaded[0], max_sweeps=2)
    assert pts.shape == (50, 5)  # ego point dropped, ragged tail dropped
    assert np.all(pts[:40, 4] == 0) and np.allclose(pts[40:, 4], 0.05)
    # sweep points were shifted by the transform translation
    assert np.allclose(pts[40:, :3], sweep[:, :3] + tm[:3, 3], atol=1e-5)

    ann = d3f.lyft_info_to_kitti_annotation(loaded[0])
    assert ann.names.tolist() == ["Car", "Pedestrian"]
    from metatransformer_tpu.data import kitti_eval
    # perfect predictions -> AP 100 on the lidar-frame native evaluator
    preds = [{"boxes": gt_boxes, "names": ann.names,
              "scores": np.array([0.9, 0.8])}]
    ap = kitti_eval.ap_r40(preds, [ann], "Car", difficulty=2, metric="bev")
    assert ap > 0.99


def test_pandaset_world_ego_round_trip_and_cuboids(tmp_path):
    """PandaSet: world->ego->world round trip, axis swap, yaw zrot."""
    pose = {"position": {"x": 10.0, "y": -4.0, "z": 1.0},
            "heading": {"w": np.cos(0.4), "x": 0.0, "y": 0.0,
                        "z": np.sin(0.4)}}  # pure z-rotation by 0.8 rad
    pts = np.random.default_rng(1).normal(size=(30, 3)) * 20
    back = d3f.pandaset_ego_to_world(d3f.pandaset_world_to_ego(pts, pose), pose)
    assert np.allclose(back, pts, atol=1e-9)

    # lidar table: one point dead ahead of the ego (world = pose pos +
    # R @ [0, 5, 0]; pandaset ego y = forward) must land at normative
    # x=+5 (x forward) after the swap
    r, t = d3f._pose_rt(pose)
    ahead_world = r @ np.array([0.0, 5.0, 0.0]) + t
    table = {"x": np.array([ahead_world[0]]), "y": np.array([ahead_world[1]]),
             "z": np.array([ahead_world[2]]), "i": np.array([127.5]),
             "d": np.array([0])}
    with open(tmp_path / "00.pkl", "wb") as f:
        pickle.dump(table, f)
    out = d3f.read_pandaset_lidar(str(tmp_path / "00.pkl"), pose)
    assert np.allclose(out[0, :3], [5.0, 0.0, 0.0], atol=1e-5)
    assert np.allclose(out[0, 3], 0.5)

    # cuboid at that same spot, world yaw 0 -> ego yaw == zrot; the
    # filtered second-sensor cuboid disappears
    cub = {"position.x": np.array([ahead_world[0], 0.0]),
           "position.y": np.array([ahead_world[1], 0.0]),
           "position.z": np.array([ahead_world[2], 0.0]),
           "dimensions.x": np.array([2.0, 1.0]),
           "dimensions.y": np.array([4.0, 1.0]),
           "dimensions.z": np.array([1.5, 1.0]),
           "yaw": np.array([0.0, 0.0]),
           "label": np.array(["Car", "Pedestrian"]),
           "cuboids.sensor_id": np.array([0, 1])}
    with open(tmp_path / "cub.pkl", "wb") as f:
        pickle.dump(cub, f)
    boxes, labels = d3f.read_pandaset_cuboids(str(tmp_path / "cub.pkl"), pose)
    assert boxes.shape == (1, 7) and labels.tolist() == ["Car"]
    assert np.allclose(boxes[0, :3], [5.0, 0.0, 0.0], atol=1e-4)
    # dims.x (pandaset width) -> normative dy, dims.y (length) -> dx
    assert np.allclose(boxes[0, 3:6], [4.0, 2.0, 1.5])
    zrot = d3f.pandaset_zrot_world_to_ego(pose)
    assert np.isclose(boxes[0, 6], zrot, atol=1e-6)


def test_m4_mase_and_owa():
    """MASE scales MAE by the in-sample seasonal-naive MAE; OWA averages
    naive2-normalized sMAPE and MASE — OWA of the naive2 forecast itself
    is exactly 1 (the M4 evaluation protocol's anchor property)."""
    from metatransformer_tpu.data import ts_providers as tsp

    rng = np.random.default_rng(0)
    season = 4
    history = (
        10 + np.sin(np.arange(40) * 2 * np.pi / season) + rng.normal(0, 0.1, 40)
    ).astype(np.float32)
    true = (
        10 + np.sin(np.arange(40, 48) * 2 * np.pi / season)
    ).astype(np.float32)

    n2 = tsp.naive2_forecast(history, len(true), season)
    assert abs(tsp.owa(n2, true, history, season) - 1.0) < 1e-6

    # a perfect forecast beats naive2: OWA < 1 (sMAPE/MASE both ~0)
    assert tsp.owa(true, true, history, season) < 0.05

    # MASE of the seasonal-naive in-sample scale on a pure repeat is ~0
    perfect_hist = np.tile(history[-season:], 10)
    assert tsp.mase(true, true, perfect_hist, season) == 0.0

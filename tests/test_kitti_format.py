"""KITTI raw-format readers: calib/label parsing, cam<->lidar transforms,
and a synthetic 3-frame fixture driven end-to-end into the native
``kitti_eval`` metric (reference:
``pcdet/datasets/kitti/kitti_dataset.py``, ``kitti_utils.py``)."""

import os

import numpy as np

from metatransformer_tpu.data import kitti_eval, kitti_format as kf

CALIB_TEXT = """P2: 700.0 0.0 600.0 45.0 0.0 700.0 180.0 -0.1 0.0 0.0 1.0 0.005
R0_rect: 1.0 0.0 0.0 0.0 1.0 0.0 0.0 0.0 1.0
Tr_velo_to_cam: 0.0 -1.0 0.0 -0.02 0.0 0.0 -1.0 -0.06 1.0 0.0 0.0 -0.27
"""

# two objects: a car and a pedestrian (devkit column layout)
LABEL_TEXT = (
    "Car 0.00 0 -1.57 600.0 170.0 650.0 210.0 1.50 1.60 3.90 "
    "2.0 1.5 15.0 -1.57\n"
    "Pedestrian 0.10 1 0.00 500.0 150.0 520.0 205.0 1.73 0.60 0.80 "
    "-3.0 1.4 10.0 0.00\n"
)


def test_parse_calib_and_point_roundtrip():
    calib = kf.parse_calib(CALIB_TEXT)
    assert calib.P2.shape == (3, 4) and calib.V2C.shape == (3, 4)
    pts = np.asarray([[10.0, 2.0, -1.0], [30.0, -5.0, 0.5]])
    back = calib.rect_to_lidar(calib.lidar_to_rect(pts))
    np.testing.assert_allclose(back, pts, atol=1e-9)
    # velodyne x-forward maps to camera z-forward (depth)
    rect = calib.lidar_to_rect(np.asarray([[10.0, 0.0, 0.0]]))
    assert rect[0, 2] > 9.0
    # projection lands near the principal point for a centered point
    uv = calib.lidar_to_img(np.asarray([[20.0, 0.0, -0.06]]))
    assert abs(uv[0, 0] - 600.0) < 40 and abs(uv[0, 1] - 180.0) < 40


def test_parse_label_fields():
    lab = kf.parse_label(LABEL_TEXT)
    assert list(lab["name"]) == ["Car", "Pedestrian"]
    np.testing.assert_allclose(lab["dimensions"][0], [1.50, 1.60, 3.90])
    np.testing.assert_allclose(lab["location"][1], [-3.0, 1.4, 10.0])
    assert lab["occluded"].tolist() == [0, 1]


def test_box_camera_lidar_roundtrip():
    calib = kf.parse_calib(CALIB_TEXT)
    lab = kf.parse_label(LABEL_TEXT)
    boxes = kf.boxes_camera_to_lidar(lab, calib)
    assert boxes.shape == (2, 7)
    # (l, w, h) columns come from devkit (h, w, l)
    np.testing.assert_allclose(boxes[0, 3:6], [3.90, 1.60, 1.50])
    # camera ry=-pi/2 (car facing along camera x) -> lidar heading ~0
    assert abs(boxes[0, 6]) < 1e-3
    back = kf.boxes_lidar_to_camera(boxes, calib)
    np.testing.assert_allclose(back["location"], lab["location"], atol=1e-9)
    np.testing.assert_allclose(back["dimensions"], lab["dimensions"], atol=1e-9)
    np.testing.assert_allclose(
        np.sin(back["rotation_y"]), np.sin(lab["rotation_y"]), atol=1e-9
    )


def _write_fixture(root, n_frames=3):
    rng = np.random.default_rng(0)
    base = os.path.join(root, "training")
    for d in ("calib", "label_2", "velodyne"):
        os.makedirs(os.path.join(base, d), exist_ok=True)
    for i in range(n_frames):
        fid = f"{i:06d}"
        with open(os.path.join(base, "calib", f"{fid}.txt"), "w") as f:
            f.write(CALIB_TEXT)
        with open(os.path.join(base, "label_2", f"{fid}.txt"), "w") as f:
            f.write(LABEL_TEXT)
        pts = rng.uniform(-1, 1, (64, 4)).astype(np.float32)
        pts[:, 0] = rng.uniform(0, 40, 64)
        pts.tofile(os.path.join(base, "velodyne", f"{fid}.bin"))
    return [f"{i:06d}" for i in range(n_frames)]


def test_fixture_to_eval_end_to_end(tmp_path):
    """Raw KITTI tree -> frames -> annotations -> kitti_eval: perfect
    predictions score AP_R40 = 1 on every class/difficulty/metric that
    has ground truth."""
    ids = _write_fixture(str(tmp_path))
    frames = [kf.read_frame(str(tmp_path), fid) for fid in ids]
    assert frames[0].points.shape == (64, 4)
    annos = [fr.annotation() for fr in frames]

    preds = []
    for fr in frames:
        boxes = fr.gt_boxes_lidar().astype(np.float32)
        preds.append(
            {
                "boxes": boxes,
                "names": fr.label["name"],
                "scores": np.linspace(0.9, 0.8, len(boxes)),
            }
        )
    res = kitti_eval.evaluate(preds, annos, classes=("Car", "Pedestrian"))
    assert res["Car_3d_easy"] == 1.0
    assert res["Car_bev_easy"] == 1.0
    # the pedestrian is occluded=1 -> excluded from easy, present at moderate
    assert res["Pedestrian_3d_moderate"] == 1.0

    # a shifted prediction misses at the 0.7 IoU gate
    bad = [dict(p) for p in preds]
    for p in bad:
        b = p["boxes"].copy()
        b[:, 0] += 2.5
        p["boxes"] = b
    res_bad = kitti_eval.evaluate(bad, annos, classes=("Car",))
    assert res_bad["Car_3d_easy"] < 0.5

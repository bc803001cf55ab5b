"""Raw-bytes image ingestion: JPEG files -> uint8 batches -> logits.

The reference starts training from files on disk (mmseg LoadImageFromFile,
torchvision ImageFolder trees); this covers the equivalent host pipeline
(data/image_folder.py) end-to-end, including the --data CLI wiring.
"""

import os

import numpy as np
import pytest

from metatransformer_tpu.data import image_folder

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


@pytest.fixture(scope="module")
def jpeg_tree(tmp_path_factory):
    """2 classes x 3 JPEGs with distinct sizes (exercises resize paths)."""
    root = tmp_path_factory.mktemp("imagefolder")
    rng = np.random.default_rng(0)
    sizes = [(64, 48), (48, 64), (80, 80)]
    for cls in ("cat", "dog"):
        d = root / cls
        d.mkdir()
        for i, (w, h) in enumerate(sizes):
            arr = rng.integers(0, 256, (h, w, 3), np.uint8)
            Image.fromarray(arr).save(d / f"{i}.jpg", quality=90)
    return str(root)


def test_scan_image_folder(jpeg_tree):
    samples, classes = image_folder.scan_image_folder(jpeg_tree)
    assert classes == ["cat", "dog"]
    assert len(samples) == 6
    labels = sorted(l for _, l in samples)
    assert labels == [0, 0, 0, 1, 1, 1]


def test_decode_eval_deterministic(jpeg_tree):
    samples, _ = image_folder.scan_image_folder(jpeg_tree)
    path = samples[0][0]
    a = image_folder.decode_image(path, size=32, train=False)
    b = image_folder.decode_image(path, size=32, train=False)
    assert a.shape == (32, 32, 3) and a.dtype == np.uint8
    np.testing.assert_array_equal(a, b)


def test_decode_train_augments(jpeg_tree):
    samples, _ = image_folder.scan_image_folder(jpeg_tree)
    path = samples[0][0]
    a = image_folder.decode_image(
        path, size=32, train=True, rng=np.random.default_rng(1)
    )
    b = image_folder.decode_image(
        path, size=32, train=True, rng=np.random.default_rng(2)
    )
    assert a.shape == b.shape == (32, 32, 3)
    assert not np.array_equal(a, b)  # different crops/flips


def test_loader_batches(jpeg_tree):
    loader = image_folder.ImageFolderLoader(
        jpeg_tree, batch_size=2, img_size=32, train=True, seed=0, workers=2
    )
    assert len(loader) == 3
    batches = list(loader)
    assert len(batches) == 3
    for b in batches:
        assert b["input"].shape == (2, 32, 32, 3)
        assert b["input"].dtype == np.uint8
        assert b["label"].dtype == np.int32
    # a full epoch shows every label
    labels = np.concatenate([b["label"] for b in batches])
    assert set(labels.tolist()) == {0, 1}


def test_manifest(jpeg_tree, tmp_path):
    samples, _ = image_folder.scan_image_folder(jpeg_tree)
    man = tmp_path / "train.tsv"
    man.write_text("".join(f"{p}\t{l}\n" for p, l in samples))
    loader = image_folder.ImageFolderLoader(
        str(man), batch_size=3, img_size=32, train=False, seed=0, workers=1
    )
    batches = list(loader)
    assert len(batches) == 2 and batches[0]["input"].shape == (3, 32, 32, 3)


def test_jpeg_to_logits_end_to_end(jpeg_tree):
    """Raw JPEG bytes on disk -> uint8 batch -> jitted forward -> logits
    (the 'raw input -> logits starts at the bytes a user has' bar)."""
    import jax

    from metatransformer_tpu import recipes
    from metatransformer_tpu.configs import load_config
    import metatransformer_tpu.configs as cfgs

    cfg = load_config(
        os.path.join(os.path.dirname(cfgs.__file__), "imagenet_metatransformer.yaml"),
        ["train.batch_size=2", "model.num_classes=2"],
    )
    recipe = recipes.build(cfg, jax.random.PRNGKey(0), smoke=True)
    batch = next(iter(recipe.data_loader(jpeg_tree, 2, 0, True)))
    assert batch["input"].dtype == np.uint8
    logits = recipe.forward(recipe.params, batch["input"], None)
    assert logits.shape == (2, 2)
    assert np.isfinite(np.asarray(logits)).all()


def test_cli_data_flag(jpeg_tree):
    """train_cli --data trains from the JPEG tree (smoke geometry)."""
    from metatransformer_tpu import train_cli
    import metatransformer_tpu.configs as cfgs

    rc = train_cli.main([
        "--cfg",
        os.path.join(os.path.dirname(cfgs.__file__), "imagenet_metatransformer.yaml"),
        "--smoke", "--epochs", "1", "--data", jpeg_tree,
        "train.batch_size=2", "model.num_classes=2",
    ])
    assert rc == 0


@pytest.mark.fast
def test_cv2_backend_matches_pil_geometry(tmp_path):
    """cv2 and PIL backends consume the same rng stream (same crop box,
    same flip decision) and agree pixel-wise up to resample-kernel
    differences on smooth content."""
    pytest.importorskip("cv2")
    from PIL import Image

    yy, xx = np.mgrid[0:96, 0:128].astype(np.float32)
    smooth = np.stack(
        [127 + 90 * np.sin(yy / 24), 127 + 90 * np.cos(xx / 32),
         np.full_like(yy, 80)], -1
    ).clip(0, 255).astype(np.uint8)
    path = str(tmp_path / "img.jpg")
    Image.fromarray(smooth).save(path, "JPEG", quality=95)

    a = image_folder.decode_image(path, 64, train=False, backend="cv2")
    b = image_folder.decode_image(path, 64, train=False, backend="pil")
    assert a.shape == b.shape == (64, 64, 3)
    err = np.abs(a.astype(np.float32) - b.astype(np.float32)).mean()
    assert err < 3.0, f"cv2/PIL eval-protocol divergence {err}"

    for seed in range(4):  # train path: identical geometry decisions
        a = image_folder.decode_image(
            path, 32, train=True, rng=np.random.default_rng(seed),
            backend="cv2")
        b = image_folder.decode_image(
            path, 32, train=True, rng=np.random.default_rng(seed),
            backend="pil")
        err = np.abs(a.astype(np.float32) - b.astype(np.float32)).mean()
        assert err < 6.0, f"seed {seed}: train-geometry divergence {err}"

"""Demo CLI: every modality's synthetic path runs raw -> logits."""

import numpy as np
import pytest

from metatransformer_tpu import demo


@pytest.mark.parametrize(
    "modality",
    ["image", "audio", "time-series", "point", "tabular", "graph", "hyper",
     "text", "imu", "infrared", "x-ray"],  # video omitted: full-geometry
     # encoder at 1568 tokens is needlessly slow on the 1-core CPU CI
)
def test_demo_synthetic(modality, capsys):
    assert demo.main(["--modality", modality, "--synthetic"]) == 0
    out = capsys.readouterr().out
    assert f"modality={modality}" in out and "pooled[0:8]" in out


def test_demo_with_head_and_npy_input(tmp_path, capsys):
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 224, 224, 3)).astype(np.float32)
    np.save(tmp_path / "img.npy", x)
    np.savez(tmp_path / "head.npz", w=rng.normal(size=(768, 10)).astype(np.float32),
             b=np.zeros(10, np.float32))
    rc = demo.main([
        "--modality", "image", "--input", str(tmp_path / "img.npy"),
        "--head", str(tmp_path / "head.npz"), "--top-k", "3",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "top-k:" in out and out.count("class ") == 3


@pytest.mark.fast
def test_demo_with_jpeg_input(tmp_path, capsys):
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 256, (240, 320, 3), np.uint8)).save(
        tmp_path / "photo.jpg", quality=90
    )
    rc = demo.main(["--modality", "image", "--input", str(tmp_path / "photo.jpg")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "modality=image" in out and "pooled[0:8]" in out

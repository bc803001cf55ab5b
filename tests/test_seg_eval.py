"""Whole-scene seg eval: voxel part splitting covers every point exactly
once, scene inference reassembles logits correctly, voting averages,
6-fold CM aggregation (reference: examples/segmentation/main.py load_data/
test + test_s3dis_6fold.py)."""

import numpy as np

from metatransformer_tpu.utils import seg_eval
from metatransformer_tpu.utils.metrics import ConfusionMatrix


def test_voxel_parts_partition():
    rng = np.random.default_rng(0)
    coord = rng.uniform(0, 2.0, (500, 3)).astype(np.float32)
    parts = seg_eval.voxel_parts(coord, voxel_size=0.5)
    allidx = np.concatenate(parts)
    assert len(allidx) == 500
    assert len(np.unique(allidx)) == 500  # exactly once
    # part sizes are non-increasing (k-th point per voxel)
    sizes = [len(p) for p in parts]
    assert sizes == sorted(sizes, reverse=True)


def test_scene_inference_reassembles():
    """An 'oracle' model that predicts class = floor(x) proves the
    scatter: full-scene predictions must match the rule at every point."""
    rng = np.random.default_rng(1)
    coord = rng.uniform(0, 3.0, (400, 3)).astype(np.float32)
    # forward sees *part-local* coords (shifted by part min); embed the
    # class in a feature channel instead so the oracle survives the shift
    label = np.floor(coord[:, 0]).astype(np.int64)  # 0..2
    feat = np.eye(3, dtype=np.float32)[label]

    def forward(x):  # [1, P, 6] -> logits [1, P, 3]
        return x[:, :, 3:6] * 10.0

    logits = seg_eval.scene_inference(forward, coord, feat, 0.4, 3)
    assert (logits.argmax(-1) == label).all()


def test_vote_logits_reduces_noise():
    """Voting averages out augmentation-dependent noise: a model whose
    logits depend on the scale draw has lower variance after voting."""
    rng = np.random.default_rng(2)
    pts = rng.standard_normal((2, 64, 3)).astype(np.float32)

    def forward(x):
        # logits = mean point norm (scale-sensitive) per sample
        s = np.linalg.norm(x, axis=-1).mean(-1, keepdims=True)
        return np.concatenate([s, -s], axis=-1)

    one = seg_eval.vote_logits(forward, pts, num_votes=1)
    many = seg_eval.vote_logits(forward, pts, num_votes=16)
    assert many.shape == one.shape
    # first vote is clean (scale=1): voting changes the result
    assert np.abs(many - one).max() > 1e-6


def test_six_fold_aggregate():
    cms = []
    rng = np.random.default_rng(3)
    for _ in range(6):
        cm = ConfusionMatrix(4)
        target = rng.integers(0, 4, 200)
        pred = np.where(rng.uniform(size=200) < 0.7, target,
                        rng.integers(0, 4, 200))
        cm.update(pred, target)
        cms.append(cm)
    out = seg_eval.six_fold_aggregate(cms)
    assert 0.5 < out["oa"] <= 1.0
    assert len(out["per_area_miou"]) == 6
    # aggregate equals a CM over the union of all areas
    union = ConfusionMatrix(4)
    for cm in cms:
        union.matrix += cm.matrix
    assert abs(out["miou"] - union.miou) < 1e-12

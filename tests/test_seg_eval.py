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


# ---------------------------------------------------------------------------
# ShapeNetPart instance-mIoU protocol (main.py:67-96 get_ins_mious)
# ---------------------------------------------------------------------------


def test_instance_mious_hand_computed():
    # category 1 (bag) has parts (4, 5). Shape of 4 points:
    # target = [4, 4, 5, 5], pred = [4, 5, 5, 5]
    # part 4: I=1, U=2 -> 0.5 ; part 5: I=2, U=3 -> 2/3
    pred = np.array([[4, 5, 5, 5]])
    target = np.array([[4, 4, 5, 5]])
    ious = seg_eval.instance_mious(pred, target, np.array([1]))
    assert abs(ious[0] - (0.5 + 2 / 3) / 2) < 1e-12


def test_instance_mious_union_zero_convention():
    # category 0 (airplane) has parts (0,1,2,3); only parts 0/1 appear and
    # match perfectly -> parts 2,3 get IoU=1 by the U==0 convention.
    pred = np.array([[0, 0, 1, 1]])
    target = np.array([[0, 0, 1, 1]])
    ious = seg_eval.instance_mious(pred, target, np.array([0]))
    assert ious[0] == 1.0
    # a stray prediction into part 2 breaks the convention for part 2 only:
    # parts 0 (I=1,U=2 -> .5), 1 (1.0), 2 (I=0,U=1 -> 0), 3 (U==0 -> 1)
    ious = seg_eval.instance_mious(
        np.array([[0, 2, 1, 1]]), target, np.array([0])
    )
    assert abs(ious[0] - (0.5 + 1.0 + 0.0 + 1.0) / 4) < 1e-12


def test_aggregate_ins_vs_cls_miou():
    # two shapes of cat 0 (ious 0.2, 0.4), one of cat 1 (iou 0.9):
    # ins = mean(all) = 0.5 ; cls = mean(0.3, 0.9) = 0.6
    ious = np.array([0.2, 0.4, 0.9])
    cls = np.array([0, 0, 1])
    agg = seg_eval.aggregate_part_mious(ious, cls, num_categories=16)
    assert abs(agg["ins_miou"] - 0.5) < 1e-12
    assert abs(agg["cls_miou"] - 0.6) < 1e-12
    assert abs(agg["per_cls_miou"][0] - 0.3) < 1e-12
    assert np.isnan(agg["per_cls_miou"][2])


def test_part_seg_refinement_relabels_tiny_parts():
    # 12 points in a bag (parts 4/5): one point mislabeled with an
    # out-of-category part id gets re-voted to its neighbours' label.
    rng = np.random.default_rng(0)
    coord = np.concatenate(
        [rng.normal(0, 0.01, (6, 3)), rng.normal(5, 0.01, (6, 3))]
    )[None]
    pred = np.array([[4, 4, 4, 4, 4, 17, 5, 5, 5, 5, 5, 5]])
    out = seg_eval.part_seg_refinement(
        pred, coord, np.array([1]), n=3
    )
    assert out[0, 5] == 4  # re-elected by the left cluster
    assert (out[0, :5] == 4).all() and (out[0, 6:] == 5).all()
    assert pred[0, 5] == 17  # input untouched


def test_shapenetpart_eval_metric_end_to_end():
    """The shapenetpart recipe exposes the ins/cls-mIoU --eval protocol."""
    import os

    import jax
    import metatransformer_tpu.configs as cfgs
    from metatransformer_tpu import recipes
    from metatransformer_tpu.configs.config import load_config

    cfg = load_config(
        os.path.join(
            os.path.dirname(cfgs.__file__),
            "shapenetpart_metatransformer.yaml",
        )
    )
    recipe = recipes.build(cfg, jax.random.PRNGKey(0), smoke=True)
    assert recipe.eval_metric is not None
    batches = list(recipe.synth(2, 2, seed=0))
    for b in batches:
        assert "cls" in b
        # labels live inside each shape's category parts
        for lab, c in zip(np.asarray(b["label"]), np.asarray(b["cls"])):
            parts = seg_eval.SHAPENETPART_CLS2PARTS[int(c)]
            assert set(np.unique(lab)) <= set(parts)
    stats = recipe.eval_metric(recipe.params, recipe.forward, batches)
    assert 0.0 <= stats["ins_miou"] <= 100.0
    assert 0.0 <= stats["cls_miou"] <= 100.0

"""Whole-scene segmentation evaluation: voxel sub-cloud chunking, voting,
6-fold aggregation.

Reference: ``PointCloud/examples/segmentation/main.py``:
- ``load_data`` (:64-110) voxel-sorts the full room and splits it into
  parts — part k takes the k-th point of every voxel — so each pass fits
  in memory and every original point is predicted exactly once
  ("multi_voxel" test mode);
- ``test`` (:508+) runs the model per part, scatters logits back to the
  full cloud and accumulates per-cloud + overall confusion matrices;
- ``test_s3dis_6fold.py`` sums the per-area confusion matrices and
  reports the all-area OA/mAcc/mIoU (cfg.allarea_cm.value += ...);
- classification voting (``examples/classification`` eval, PointNeXt
  protocol): average logits over ``num_votes`` random-scale augmented
  passes.

TPU-native: every part is padded to the first (largest) part's size so
all passes hit one cached XLA executable; padded tail points are masked
out of the scatter.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from metatransformer_tpu.utils.metrics import ConfusionMatrix


def voxel_parts(
    coord: np.ndarray, voxel_size: float
) -> List[np.ndarray]:
    """Split a full scene into index parts, part k = k-th point per voxel
    (load_data:88-110 'multi_voxel'). Union of parts = all points, no
    duplicates."""
    coord = np.asarray(coord)
    grid = np.floor((coord - coord.min(0)) / voxel_size).astype(np.int64)
    dims = grid.max(0) + 1
    key = (grid[:, 0] * dims[1] + grid[:, 1]) * dims[2] + grid[:, 2]
    order = np.argsort(key, kind="stable")
    key_sorted = key[order]
    _, starts, counts = np.unique(
        key_sorted, return_index=True, return_counts=True
    )
    parts = []
    k = 0
    while True:
        sel = counts > k
        if not sel.any():
            break
        parts.append(order[starts[sel] + k])
        k += 1
    return parts


def scene_inference(
    forward_fn: Callable[[np.ndarray], np.ndarray],
    coord: np.ndarray,  # [N, 3]
    feat: Optional[np.ndarray],  # [N, C] or None
    voxel_size: float,
    num_classes: int,
) -> np.ndarray:
    """Full-scene logits [N, num_classes] via per-part passes.

    ``forward_fn`` maps (points [1, P, 3(+C)]) -> logits [1, P, num_classes];
    parts are padded (by repeating index 0) to the first part's size so
    every pass reuses one executable (test:508+ semantics, each point
    predicted in exactly one part)."""
    n = coord.shape[0]
    parts = voxel_parts(coord, voxel_size)
    pad_to = len(parts[0])
    logits = np.zeros((n, num_classes), np.float32)
    for idx in parts:
        m = len(idx)
        padded = np.concatenate([idx, np.zeros(pad_to - m, idx.dtype)])
        sub = coord[padded]
        sub = sub - sub.min(0)  # coord_part -= min (test:560)
        if feat is not None:
            sub = np.concatenate([sub, feat[padded]], axis=-1)
        out = np.asarray(forward_fn(sub[None]))[0]
        logits[idx] = out[:m]
    return logits


def vote_logits(
    forward_fn: Callable[[np.ndarray], np.ndarray],
    points: np.ndarray,  # [B, N, 3]
    num_votes: int = 10,
    scale_range: Tuple[float, float] = (0.8, 1.2),
    seed: int = 0,
) -> np.ndarray:
    """Classification voting: mean logits over random anisotropic-scale
    augmented passes (the PointNeXt/openpoints voted-eval protocol)."""
    rng = np.random.default_rng(seed)
    acc = None
    for v in range(num_votes):
        scale = (
            rng.uniform(*scale_range, size=(1, 1, 3)).astype(np.float32)
            if v else np.ones((1, 1, 3), np.float32)  # first vote: clean
        )
        out = np.asarray(forward_fn(points * scale))
        acc = out if acc is None else acc + out
    return acc / num_votes


def six_fold_aggregate(
    cms: Sequence[ConfusionMatrix],
) -> Dict[str, object]:
    """Sum per-area confusion matrices -> all-area metrics
    (test_s3dis_6fold.py: cfg.allarea_cm.value += all_cm.value)."""
    total = ConfusionMatrix(cms[0].num_classes)
    for cm in cms:
        total.matrix += cm.matrix
    return {
        "oa": total.overall_accuracy,
        "macc": total.mean_accuracy,
        "miou": total.miou,
        "ious": total.iou,
        "per_area_miou": [cm.miou for cm in cms],
    }

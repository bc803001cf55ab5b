"""Named semi-detector wrappers end-to-end (pcdet semi_second.py role
pattern: teacher pseudo-labels -> student step -> EMA teacher)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from metatransformer_tpu.models import second, semi_detectors as sd


def test_semi_second_full_loop():
    cfg = second.SECONDConfig(
        voxel_size=(0.1, 0.1, 0.2),
        pc_range=(0.0, -3.2, -3.0, 6.4, 3.2, 2.0),
        spatial_shape=(25, 64, 64),
        max_voxels=256,
        widths=(4, 4, 8, 8, 8, 8),
        bev_channels=(8, 16),
        up_channels=8,
    )
    anchors = jnp.asarray(second.generate_anchors(cfg))
    semi = sd.semi_second(cfg, anchors)

    teacher = semi.init(cfg, jax.random.PRNGKey(0))
    student = jax.tree_util.tree_map(jnp.copy, teacher)
    rng = np.random.default_rng(5)
    pts = np.zeros((1, 128, 4), np.float32)
    pts[0, :, 0] = rng.uniform(0, 6.4, 128)
    pts[0, :, 1] = rng.uniform(-3.2, 3.2, 128)
    pts[0, :, 2] = rng.uniform(-3, 2, 128)
    pts = jnp.asarray(pts)

    boxes, labels, valid = semi.pseudo_labels(teacher, pts)
    assert boxes.shape[-1] == 7

    opt = optax.adam(1e-3)
    state = opt.init(student)
    step = semi.make_step(opt, ema_decay=0.9)
    student, teacher, state, loss, logs = step(
        student, teacher, state, pts, jnp.asarray(boxes), jnp.asarray(valid)
    )
    assert np.isfinite(float(loss))
    # teacher moved toward the student
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), teacher, student
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0

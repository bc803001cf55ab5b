"""Video RandAugment (reference Video/dataset/rand_augment.py semantics:
one op sequence per clip, applied to every frame identically)."""

import numpy as np

from metatransformer_tpu.data import rand_augment as ra


def _clip(t=4, h=16, w=16, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 255, (t, h, w, 3)).astype(np.float32)


def test_parse_config():
    cfg = ra.parse_config("rand-m7-n4-mstd0.5")
    assert cfg.magnitude == 7.0 and cfg.num_ops == 4 and cfg.mag_std == 0.5
    cfg2 = ra.parse_config("rand-m9-n2-mstd1.0")
    assert cfg2.magnitude == 9.0 and cfg2.num_ops == 2


def test_every_op_preserves_shape_and_range():
    frames = _clip()
    for name, op in ra.OPS.items():
        out = op(frames.copy(), 7.0)
        assert out.shape == frames.shape, name
        assert out.dtype == np.float32 or out.dtype == np.float64, name
        assert out.min() >= 0.0 - 1e-6 and out.max() <= 255.0 + 1e-6, name


def test_temporal_consistency():
    """Identical frames stay identical after augmentation — the whole
    clip gets ONE transform (no temporal flicker into the tubelets)."""
    one = _clip(t=1)
    frames = np.repeat(one, 4, axis=0)
    rng = np.random.default_rng(3)
    out = ra.rand_augment_clip(frames, ra.RandAugmentConfig(prob=1.0), rng)
    for t in range(1, 4):
        np.testing.assert_array_equal(out[t], out[0])


def test_geometric_ops_fill_and_move():
    frames = np.full((2, 16, 16, 3), 200.0, np.float32)
    np.random.seed(0)
    out = ra.translate_x(frames, 10.0)
    # large translate moves content out; fill value 128 appears
    assert (out == 128.0).any()
    out_r = ra.rotate(frames.copy(), 10.0)
    assert out_r.shape == frames.shape

    # identity-level affine ops change nothing
    np.random.seed(0)
    out0 = ra.shear_x(frames.copy(), 0.0)
    np.testing.assert_array_equal(out0, frames)


def test_value_ops_match_definitions():
    frames = _clip()
    np.testing.assert_allclose(ra.invert(frames, 0), 255.0 - frames)
    sol = ra.solarize(frames, ra._MAX_LEVEL)  # threshold 0: all inverted
    np.testing.assert_allclose(sol, 255.0 - frames)
    post = ra.posterize(frames, ra._MAX_LEVEL)
    # 1-bit posterize: only two levels per channel
    assert np.unique(post.astype(np.int64) >> 7).size <= 2
    ac = ra.autocontrast(frames, 0)
    assert ac.max() >= 254.0 and ac.min() <= 1.0


def test_rand_augment_changes_input_deterministically():
    frames = _clip(seed=5)
    cfg = ra.RandAugmentConfig(num_ops=4, magnitude=9.0, prob=1.0)
    out1 = ra.rand_augment_clip(frames, cfg, np.random.default_rng(7))
    out2 = ra.rand_augment_clip(frames, cfg, np.random.default_rng(7))
    np.testing.assert_array_equal(out1, out2)  # seeded determinism
    assert np.abs(out1 - frames).max() > 1.0  # actually augments


def test_train_clip_with_randaugment_and_erasing():
    from metatransformer_tpu.data import video_dataset as vd

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (24, 40, 40, 3)).astype(np.uint8)
    cfg = vd.VideoDatasetConfig(
        num_frames=4, crop_size=32, rand_augment="rand-m7-n4-mstd0.5",
        erase_prob=1.0,
    )
    clip = vd.train_clip(frames, cfg, np.random.default_rng(1))
    assert clip.shape == (4, 32, 32, 3)
    assert np.isfinite(clip).all()
    # plain pipeline (no RA/erase) differs
    cfg0 = vd.VideoDatasetConfig(num_frames=4, crop_size=32)
    clip0 = vd.train_clip(frames, cfg0, np.random.default_rng(1))
    assert np.abs(clip - clip0).max() > 1e-3

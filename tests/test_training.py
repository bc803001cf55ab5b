"""Training infrastructure: losses, schedules, layer decay, augment,
metrics, checkpoint/resume, EarlyStopping, and an end-to-end tiny fit."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from metatransformer_tpu.core import encoder
from metatransformer_tpu.models import image_classifier
from metatransformer_tpu.tokenizers import image as image_tok
from metatransformer_tpu.train import augment, ema, losses, optim, schedules
from metatransformer_tpu.train.trainer import Trainer, TrainerConfig
from metatransformer_tpu.utils import checkpoint as ckpt
from metatransformer_tpu.utils import metrics


def test_losses_sanity():
    logits = jnp.asarray([[10.0, -10.0], [-10.0, 10.0]])
    labels = jnp.asarray([0, 1])
    assert float(losses.cross_entropy(logits, labels)) < 1e-3
    assert float(losses.cross_entropy(logits, labels, 0.2)) > 0.0
    soft = jax.nn.one_hot(labels, 2)
    assert float(losses.soft_cross_entropy(logits, soft)) < 1e-3
    assert float(losses.bce_with_logits(logits, soft)) < 1e-3
    assert float(losses.focal(logits, labels)) < 1e-3
    assert 0 <= float(losses.dice(logits, labels)) < 0.01
    assert float(losses.l1(jnp.ones(3), jnp.ones(3))) == 0.0
    m = losses.masked_mse(jnp.asarray([1.0, 5.0]), jnp.asarray([1.0, 1.0]),
                          jnp.asarray([1.0, 0.0]))
    assert float(m) == 0.0


def test_schedules():
    s = schedules.cosine_with_warmup(1.0, 100, warmup_steps=10)
    assert float(s(0)) < 0.2
    assert abs(float(s(10)) - 1.0) < 0.01
    assert float(s(100)) < 0.01

    ms = schedules.multistep(1.0, [10, 20], gamma=0.5)
    assert float(ms(5)) == 1.0 and float(ms(15)) == 0.5 and float(ms(25)) == 0.25

    p = schedules.poly(1.0, 100, power=1.0)
    assert abs(p(50) - 0.5) < 1e-6

    oc = schedules.one_cycle(1.0, 100, pct_start=0.4)
    assert oc(0) < oc(40) and abs(oc(40) - 1.0) < 1e-6 and oc(99) < 0.01

    t1 = schedules.type1_halving(1.0, 10)
    assert t1(0) == 1.0 and t1(10) == 0.5 and t1(20) == 0.25


def test_schedules_jit_safe():
    """Every schedule must work as the optax lr inside a jitted step
    (traced step count) — ADVICE r1: poly/one_cycle previously raised
    TracerBoolConversionError."""
    for sched in (
        schedules.poly(1e-3, 100),
        schedules.one_cycle(1e-3, 100),
        schedules.step_decay(1e-3, 30),
        schedules.type1_halving(1e-3, 10),
        schedules.cosine_with_warmup(1e-3, 100, warmup_steps=10),
    ):
        tx = optax.adamw(sched)
        params = {"w": jnp.ones((4, 4))}
        state = tx.init(params)

        @jax.jit
        def step(params, state):
            grads = jax.tree_util.tree_map(jnp.ones_like, params)
            updates, state = tx.update(grads, state, params)
            return optax.apply_updates(params, updates), state

        for _ in range(3):
            params, state = step(params, state)
        assert jnp.isfinite(params["w"]).all()

    assert schedules.linear_scaled_lr(1e-3, 512) == 2e-3


def test_layer_decay_scaling():
    depth = 4
    tx = optim.scale_by_layer_decay(0.5, depth)
    updates = {
        "encoder": {"qkv_w": jnp.ones((depth, 2, 2))},
        "tokenizer": {"w": jnp.ones((2, 2))},
        "head": {"w0": jnp.ones((2, 2))},
    }
    state = tx.init(updates)
    scaled, _ = tx.update(updates, state)
    _, layer_f, _ = optim.layer_decay_factors(depth, 0.5)
    # encoder block i scaled by 0.5**(depth-i), embeddings by 0.5**(depth+1)
    # (mmcv LayerDecayOptimizerConstructor / Video optim_factory convention)
    for i in range(depth):
        np.testing.assert_allclose(
            np.asarray(scaled["encoder"]["qkv_w"])[i],
            float(layer_f[i]),
            rtol=1e-6,
        )
        np.testing.assert_allclose(float(layer_f[i]), 0.5 ** (depth - i), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(scaled["tokenizer"]["w"]), 0.5 ** (depth + 1), rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(scaled["head"]["w0"]), 1.0, rtol=1e-6)


def test_optimizer_factory():
    for name in ("adamw", "adam", "sgd", "lamb", "lars", "adabelief", "radam"):
        tx = optim.build(name, 1e-3, layer_decay=0.9, grad_clip=1.0)
        params = {"head": {"w0": jnp.ones((2, 2))}, "encoder": {"qkv_w": jnp.ones((12, 2, 2))}}
        state = tx.init(params)
        updates, _ = tx.update(params, state, params)
        assert jnp.isfinite(updates["head"]["w0"]).all(), name


def test_augmentations():
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((4, 8, 8, 3))
    y = jax.nn.one_hot(jnp.asarray([0, 1, 2, 3]), 4)
    mx, my = augment.mixup_batch(rng, x, y)
    assert mx.shape == x.shape and my.shape == y.shape
    np.testing.assert_allclose(np.asarray(my.sum(-1)), 1.0, rtol=1e-5)

    spec = jnp.ones((2, 100, 128))
    masked = augment.spec_augment(rng, spec, 48, 48)
    assert float(masked.mean()) < 1.0  # something was masked
    assert masked.shape == spec.shape

    pts = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 3), np.float32))
    rot = augment.rotate_points_z(rng, pts)
    # z-rotation preserves norms and z-coordinates
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(rot), axis=-1),
        np.linalg.norm(np.asarray(pts), axis=-1),
        rtol=1e-4,
    )
    np.testing.assert_allclose(np.asarray(rot)[..., 2], np.asarray(pts)[..., 2],
                               rtol=1e-5)
    st = augment.scale_and_translate_points(rng, pts)
    assert st.shape == pts.shape
    jt = augment.jitter_points(rng, pts)
    assert float(jnp.abs(jt - pts).max()) <= 0.05 + 1e-6

    er = augment.random_erase(rng, x)
    assert er.shape == x.shape


def test_confusion_matrix_and_kappa():
    cm = metrics.ConfusionMatrix(3)
    cm.update(np.array([0, 1, 2, 2]), np.array([0, 1, 1, 2]))
    assert abs(cm.overall_accuracy - 0.75) < 1e-6
    assert 0 < cm.kappa < 1
    assert 0 < cm.miou <= 1

    am = metrics.AverageMeter()
    am.update(1.0, 2)
    am.update(2.0, 2)
    assert am.avg == 1.5


def test_audio_stats_and_regression_metrics():
    scores = np.array([[0.9, 0.1], [0.2, 0.8], [0.7, 0.3]])
    targets = np.array([[1, 0], [0, 1], [1, 0]])
    stats = metrics.audio_stats(scores, targets)
    assert stats["acc"] == 1.0 and stats["mAP"] == 1.0 and stats["AUC"] == 1.0

    reg = metrics.regression_metrics(np.array([1.0, 2.0]), np.array([1.0, 1.0]))
    assert abs(reg["mae"] - 0.5) < 1e-6


def test_checkpoint_roundtrip_and_rotation(tmp_path):
    d = str(tmp_path)
    state = {"trainable": {"w": jnp.ones((2, 2)), "nested": {"b": jnp.zeros(3)}}}
    for epoch in range(7):
        ckpt.save_rotating(d, state, epoch, is_best=(epoch == 3), max_keep=3)
    kept = sorted(glob.glob(os.path.join(d, "ckpt_epoch_*.npz")))
    assert len(kept) == 3  # rotation
    resumed, epoch = ckpt.auto_resume(d)
    assert epoch == 6
    np.testing.assert_array_equal(
        np.asarray(resumed["trainable"]["w"]), np.ones((2, 2))
    )
    assert os.path.exists(os.path.join(d, "ckpt_best.npz"))


def test_early_stopping():
    es = ckpt.EarlyStopping(patience=2, mode="min")
    assert es(1.0) and not es(1.5) and not es(1.4)
    assert es.should_stop


def test_ema():
    p = {"w": jnp.zeros(2)}
    e = ema.init(p)
    e = ema.update(e, {"w": jnp.ones(2)}, decay=0.5)
    np.testing.assert_allclose(np.asarray(e["w"]), 0.5)


def test_trainer_fits_tiny_problem(tmp_path):
    """End-to-end: 2-class separable images, frozen encoder — acc -> 1."""
    cfg = image_classifier.ImageClassifierConfig(
        tokenizer=image_tok.ImageTokenizerConfig(img_size=8, patch_size=4, dim=16),
        encoder=encoder.EncoderConfig(dim=16, depth=1, num_heads=2),
        num_classes=2,
    )
    params = image_classifier.init(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = rng.standard_normal((64, 8, 8, 3)).astype(np.float32)
    y = (x.mean((1, 2, 3)) > 0).astype(np.int32)
    x[y == 1] += 1.0  # separable signal

    def data():
        for i in range(0, 64, 16):
            yield {
                "input": jnp.asarray(x[i : i + 16]),
                "label": jnp.asarray(y[i : i + 16]),
            }

    def forward(p, inputs, rng_):
        return image_classifier.forward(p, inputs, cfg)

    trainer = Trainer(
        forward,
        optim.build("adamw", 5e-3, encoder_depth=1),
        params,
        TrainerConfig(epochs=8, ckpt_dir=str(tmp_path), log_every=1000),
    )
    log = trainer.fit(data, val_data=data)
    assert log["val_acc"] > 0.9, log
    assert os.path.exists(os.path.join(str(tmp_path), "ckpt_latest.npz"))

    # Full resume: a fresh trainer restores trainable + optimizer moments +
    # global_step (ADVICE r1: previously only trainable was saved).
    trainer2 = Trainer(
        forward,
        optim.build("adamw", 5e-3, encoder_depth=1),
        image_classifier.init(cfg, jax.random.PRNGKey(1)),
        TrainerConfig(epochs=8, ckpt_dir=str(tmp_path), log_every=1000),
    )
    log2 = trainer2.fit(data, val_data=data, resume=True)
    assert log2 == {}  # resume epoch >= epochs: loop never runs, no NameError
    assert trainer2.global_step == trainer.global_step
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(trainer2.opt_state)[0]),
        np.asarray(jax.tree_util.tree_leaves(trainer.opt_state)[0]),
    )
    # restored trainable matches what was saved
    l1 = jax.tree_util.tree_leaves(trainer.trainable)
    l2 = jax.tree_util.tree_leaves(trainer2.trainable)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_config_system(tmp_path):
    from metatransformer_tpu.configs import load_config

    base = tmp_path / "base.yaml"
    base.write_text("a: 1\nnest:\n  x: 1\n  y: 2\n")
    child = tmp_path / "child.yaml"
    child.write_text("_base_: base.yaml\nnest:\n  y: 3\nb: 2\n")
    cfg = load_config(str(child), overrides=["nest.x=9", "c.d=hello"])
    assert cfg.a == 1 and cfg.b == 2
    assert cfg.nest.x == 9 and cfg.nest.y == 3
    assert cfg.c.d == "hello"

    # _delete_ replaces the subtree
    child2 = tmp_path / "child2.yaml"
    child2.write_text("_base_: base.yaml\nnest:\n  _delete_: true\n  z: 1\n")
    cfg2 = load_config(str(child2))
    assert "y" not in cfg2.nest and cfg2.nest.z == 1


def test_shipped_configs_load():
    import metatransformer_tpu.configs as cfgs
    from metatransformer_tpu.configs import load_config

    root = os.path.dirname(cfgs.__file__)
    for name in (
        "modelnet40_metatransformer.yaml",
        "speechcommands_metatransformer.yaml",
        "etth1_metatransformer.yaml",
    ):
        cfg = load_config(os.path.join(root, name))
        assert cfg.encoder.scale == "base"
        assert cfg.train.epochs > 0


def test_weight_averaging(tmp_path):
    """AST --wa semantics (Audio/src/run.py:68-70): uniform average of the
    epoch-range checkpoints; integer leaves come from the last one."""
    from metatransformer_tpu.utils import checkpoint as ckpt

    d = str(tmp_path)
    for e in range(1, 4):
        state = {
            "w": np.full((2, 2), float(e), np.float32),
            "nested": {"b": np.full((3,), 10.0 * e, np.float32)},
        }
        ckpt.save_rotating(d, state, epoch=e)

    avg = ckpt.average_epoch_range(d, 1, 3)
    np.testing.assert_allclose(avg["w"], 2.0)
    np.testing.assert_allclose(avg["nested"]["b"], 20.0)
    assert int(avg["epoch"]) == 3  # integer leaf: last checkpoint wins

    # sub-range
    avg12 = ckpt.average_epoch_range(d, 1, 2)
    np.testing.assert_allclose(avg12["w"], 1.5)

    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        ckpt.average_epoch_range(d, 7, 9)


def test_large_scale_jitter():
    """LSJ (upgraded_mask_rcnn pipeline): boxes scale with the image
    content and clip to the canvas; output shape is static."""
    import jax

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    boxes = jnp.asarray([[[4.0, 4.0, 16.0, 16.0]], [[0.0, 0.0, 30.0, 30.0]]])
    out, new_boxes, scale = augment.large_scale_jitter(
        jax.random.PRNGKey(3), imgs, boxes
    )
    assert out.shape == imgs.shape
    s = float(scale)
    assert 0.1 <= s <= 2.0
    expect = np.clip(np.asarray(boxes) * s, 0, 31)
    np.testing.assert_allclose(np.asarray(new_boxes), expect, atol=1e-5)
    # downscaled content leaves the off-canvas region empty; upscaled
    # content fills the whole canvas
    a = np.asarray(out[0])
    if s < 0.9:
        assert np.abs(a[int(32 * s) + 2 :]).max() < 1e-4


def test_cumulative_ensemble():
    """AST validate_ensemble semantics: running mean over epochs equals
    the mean of the stacked per-epoch predictions."""
    from metatransformer_tpu.utils.metrics import CumulativeEnsemble

    rng = np.random.default_rng(0)
    epochs = [rng.standard_normal((6, 3)) for _ in range(4)]
    ens = CumulativeEnsemble()
    for e in epochs:
        cum = ens.update(e)
    np.testing.assert_allclose(cum, np.mean(np.stack(epochs), axis=0),
                               atol=1e-12)

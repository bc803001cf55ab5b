"""Training resilience: async checkpointing and preemption handling
(SURVEY §5.3-5.4; the reference blocks on torch.save and has no
preemption story)."""

import os
import signal

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from metatransformer_tpu.train.trainer import Trainer, TrainerConfig
from metatransformer_tpu.utils import checkpoint as ckpt_lib


def _toy():
    rng = np.random.default_rng(0)

    def params():
        # fresh arrays per trainer: the jitted step donates its inputs
        return {
            "head": {
                "w": jnp.asarray(
                    np.random.default_rng(0).standard_normal((4, 3)) * 0.1,
                    jnp.float32,
                )
            },
            "encoder": {"s": jnp.ones((4,), jnp.float32)},
        }

    def forward(p, x, rng):
        return (x * p["encoder"]["s"]) @ p["head"]["w"]

    def batches(n):
        r = np.random.default_rng(1)
        return [
            {
                "input": jnp.asarray(r.standard_normal((8, 4)), jnp.float32),
                "label": jnp.asarray(r.integers(0, 3, 8), jnp.int32),
            }
            for _ in range(n)
        ]

    return params, forward, batches


def test_async_checkpointer_roundtrip(tmp_path):
    ck = ckpt_lib.AsyncCheckpointer()
    state = {"trainable": {"w": jnp.arange(6.0).reshape(2, 3)}}
    ck.save_rotating(str(tmp_path), state, 0, is_best=True)
    ck.save_rotating(str(tmp_path), state, 1)  # waits for save 0 first
    ck.wait()
    for name in ("ckpt_epoch_0000.npz", "ckpt_epoch_0001.npz",
                 "ckpt_latest.npz", "ckpt_best.npz"):
        assert os.path.exists(tmp_path / name), name
    loaded = ckpt_lib.load(str(tmp_path / "ckpt_latest.npz"))
    np.testing.assert_allclose(
        np.asarray(loaded["trainable"]["w"]), state["trainable"]["w"]
    )
    assert int(loaded["epoch"]) == 1


def test_async_checkpointer_propagates_errors(tmp_path):
    ck = ckpt_lib.AsyncCheckpointer()
    bad = str(tmp_path / "f")
    open(bad, "w").close()  # a FILE where a directory is needed
    ck.save_rotating(bad + "/sub", {"x": jnp.zeros(2)}, 0)
    with pytest.raises(OSError):
        ck.wait()
    # the checkpointer recovers for the next save
    ck.save_rotating(str(tmp_path), {"x": jnp.zeros(2)}, 0)
    ck.wait()


def test_trainer_async_ckpt_equals_sync(tmp_path):
    params, forward, batches = _toy()
    sync_dir, async_dir = str(tmp_path / "s"), str(tmp_path / "a")
    for d, use_async in ((sync_dir, False), (async_dir, True)):
        trainer = Trainer(
            forward, optax.sgd(0.1), params(),
            cfg=TrainerConfig(
                epochs=2, ckpt_dir=d, async_ckpt=use_async, log_every=1000
            ),
        )
        trainer.fit(lambda: batches(3), rng=jax.random.PRNGKey(0))
    a = ckpt_lib.load(os.path.join(sync_dir, "ckpt_latest.npz"))
    b = ckpt_lib.load(os.path.join(async_dir, "ckpt_latest.npz"))
    for la, lb in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-7)


def test_preemption_saves_and_resumes(tmp_path):
    params, forward, batches = _toy()
    d = str(tmp_path / "w")

    fired = {"done": False}

    def data_with_signal():
        # SIGTERM arrives mid-epoch-1; the trainer finishes the current
        # step, saves, and returns from fit cleanly
        for i, b in enumerate(batches(4)):
            if fired["done"] is False and trainer.epoch == 1 and i == 1:
                fired["done"] = True
                os.kill(os.getpid(), signal.SIGTERM)
            yield b

    trainer = Trainer(
        forward, optax.sgd(0.1), params(),
        cfg=TrainerConfig(
            epochs=10, ckpt_dir=d, handle_preemption=True, log_every=1000
        ),
    )
    trainer.fit(data_with_signal, rng=jax.random.PRNGKey(0))
    assert fired["done"]
    assert trainer.epoch == 1  # stopped during epoch 1, not epochs=10
    # handlers restored after fit
    assert signal.getsignal(signal.SIGTERM) in (
        signal.SIG_DFL, signal.default_int_handler, signal.Handlers.SIG_DFL,
    )
    # resumable state exists, labeled with the last completed epoch
    state, epoch = ckpt_lib.auto_resume(d)
    assert epoch == 0

    trainer2 = Trainer(
        forward, optax.sgd(0.1), params(),
        cfg=TrainerConfig(epochs=3, ckpt_dir=d, log_every=1000),
    )
    log = trainer2.fit(lambda: batches(2), resume=True,
                       rng=jax.random.PRNGKey(0))
    assert trainer2.epoch == 2  # resumed at epoch 1, ran through 2
    assert np.isfinite(log["loss"])

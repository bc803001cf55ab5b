"""Gradient accumulation (reference accum_iter,
Video/engine_for_finetuning.py:46-118 / fairseq update_freq):
accum_steps=k must reproduce the full-batch step exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from metatransformer_tpu.train import step as step_lib


def _toy():
    rng = np.random.default_rng(0)
    params = {
        "head": {
            "w": jnp.asarray(rng.standard_normal((6, 3)) * 0.1, jnp.float32),
            "b": jnp.zeros((3,), jnp.float32),
        },
        "encoder": {"scale": jnp.ones((6,), jnp.float32)},
    }

    def forward(p, x, rng):
        h = x * p["encoder"]["scale"]
        return h @ p["head"]["w"] + p["head"]["b"]

    batch = {
        "input": jnp.asarray(rng.standard_normal((8, 6)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 3, 8), jnp.int32),
    }
    return params, forward, batch


@pytest.mark.parametrize("accum", [2, 4, 8])
def test_accum_matches_full_batch(accum):
    params, forward, batch = _toy()
    tx = optax.sgd(0.1)
    trainable, frozen = step_lib.split_params(params)
    opt_state = tx.init(trainable)

    full = jax.jit(step_lib.make_train_step(forward, tx))
    acc = jax.jit(step_lib.make_train_step(forward, tx, accum_steps=accum))

    rng = jax.random.key(0)
    tr_f, _, m_f = full(trainable, frozen, opt_state, batch, rng)
    tr_a, _, m_a = acc(trainable, frozen, opt_state, batch, rng)

    # same mean gradient -> same updated params (forward ignores rng)
    for pf, pa in zip(jax.tree.leaves(tr_f), jax.tree.leaves(tr_a)):
        np.testing.assert_allclose(np.asarray(pf), np.asarray(pa), atol=1e-6)
    np.testing.assert_allclose(
        float(m_f["loss"]), float(m_a["loss"]), atol=1e-6
    )
    np.testing.assert_allclose(float(m_f["acc"]), float(m_a["acc"]), atol=1e-6)


def test_accum_requires_divisible_batch():
    params, forward, batch = _toy()
    tx = optax.sgd(0.1)
    trainable, frozen = step_lib.split_params(params)
    opt_state = tx.init(trainable)
    step = step_lib.make_train_step(forward, tx, accum_steps=3)
    with pytest.raises(ValueError, match="divisible"):
        step(trainable, frozen, opt_state, batch, jax.random.key(0))


def test_accum_through_trainer_config():
    from metatransformer_tpu.train.trainer import Trainer, TrainerConfig

    params, forward, batch = _toy()
    trainer = Trainer(
        forward,
        optax.sgd(0.1),
        params,
        cfg=TrainerConfig(epochs=1, accum_steps=4, log_every=1000),
    )
    metrics = trainer.train_epoch([batch, batch], jax.random.key(1))
    assert np.isfinite(metrics["loss"])

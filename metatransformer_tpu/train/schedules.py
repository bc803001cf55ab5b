"""LR schedules: the reference's four scheduler families as optax schedules.

Covers: cosine w/ warmup (openpoints/timm, Video ``cosine_scheduler``
utils.py:433), MultiStepLR (Audio traintest.py:62, X-Ray StepLR),
OneCycle (pcdet fastai ``learning_schedules_fastai.py``), poly power-1.0
(mmseg config ``lr_config`` poly), and Time-Series' ``adjust_learning_rate``
halving ("type1", utils/tools.py:11).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import optax


def cosine_with_warmup(
    base_lr: float,
    total_steps: int,
    warmup_steps: int = 0,
    min_lr: float = 1e-6,
    warmup_init_lr: float = 1e-6,
):
    if warmup_steps > 0:
        warmup = optax.linear_schedule(warmup_init_lr, base_lr, warmup_steps)
        cosine = optax.cosine_decay_schedule(
            base_lr, max(total_steps - warmup_steps, 1), alpha=min_lr / base_lr
        )
        return optax.join_schedules([warmup, cosine], [warmup_steps])
    return optax.cosine_decay_schedule(base_lr, total_steps, alpha=min_lr / base_lr)


def multistep(base_lr: float, milestones: Sequence[int], gamma: float = 0.5):
    """MultiStepLR: lr *= gamma at each milestone step."""
    return optax.piecewise_constant_schedule(
        base_lr, {int(m): gamma for m in milestones}
    )


def step_decay(base_lr: float, step_size: int, gamma: float = 0.1):
    """torch StepLR (X-Ray train.py:139)."""

    def sched(count):
        return base_lr * (gamma ** (count // step_size))

    return sched


def poly(base_lr: float, total_steps: int, power: float = 1.0, min_lr: float = 0.0):
    """mmseg poly policy: lr = base * (1 - t/T)^power.

    jit-safe: `count` may be a traced step counter (optax passes the
    jitted step index), so all branching is jnp arithmetic.
    """

    def sched(count):
        frac = 1.0 - jnp.minimum(count, total_steps) / total_steps
        return jnp.maximum(base_lr * (frac**power), min_lr)

    return sched


def one_cycle(base_lr: float, total_steps: int, pct_start: float = 0.4,
              div_factor: float = 10.0, final_div: float = 1e4):
    """fastai/pcdet OneCycle: warm up to base_lr then cosine to
    base_lr/final_div (``learning_schedules_fastai.py`` OneCycle).

    jit-safe: branchless via jnp.where so it can serve as the optax lr
    inside a jitted train step.
    """
    up = int(total_steps * pct_start)
    down = max(total_steps - up, 1)
    start = base_lr / div_factor
    end = base_lr / final_div

    def sched(count):
        up_frac = count / max(up, 1)
        rising = start + (base_lr - start) * 0.5 * (1 - jnp.cos(jnp.pi * up_frac))
        down_frac = jnp.minimum((count - up) / down, 1.0)
        falling = end + (base_lr - end) * 0.5 * (1 + jnp.cos(jnp.pi * down_frac))
        return jnp.where(count < up, rising, falling)

    return sched


def type1_halving(base_lr: float, steps_per_epoch: int):
    """Time-Series ``adjust_learning_rate`` 'type1': lr halves each epoch."""

    def sched(count):
        epoch = count // max(steps_per_epoch, 1)
        return base_lr * (0.5**epoch)

    return sched


def linear_scaled_lr(base_lr: float, batch_size: int, base_batch: int = 256):
    """Video's linear LR scaling x bs/256 (run_class_finetuning.py:694-700)."""
    return base_lr * batch_size / base_batch

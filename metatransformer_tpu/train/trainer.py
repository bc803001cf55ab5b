"""The unified Trainer: one engine replacing the reference's five.

(openpoints ``examples/classification/train.py:50-309``, Video
``engine_for_finetuning.py``, Audio ``traintest.py``, Time-Series
``exp_*.py``, pcdet ``train_utils.py`` — all epoch loops with the same
shape: train epoch -> validate -> LR schedule -> checkpoint/best/EMA.)

TPU-native: the train step is jitted once (donated args), data parallel
comes from the mesh sharding of the batch, bf16 by default, no GradScaler
(AMP is unnecessary in bf16 — SURVEY.md §7.1).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import numpy as np
import optax

from metatransformer_tpu.train import ema as ema_lib
from metatransformer_tpu.train import step as step_lib
from metatransformer_tpu.utils import checkpoint as ckpt_lib
from metatransformer_tpu.utils.logger import setup_logger


@dataclasses.dataclass
class TrainerConfig:
    epochs: int = 100
    val_freq: int = 1
    ckpt_dir: Optional[str] = None
    max_keep: int = 5
    use_ema: bool = False
    ema_decay: float = 0.9999
    early_stop_patience: Optional[int] = None
    best_mode: str = "max"  # "max" (acc) | "min" (loss/MAE)
    log_every: int = 50
    # gradient accumulation (reference accum_iter / update_freq): the
    # batch splits into accum_steps microbatches scanned inside ONE
    # jitted step — full-batch mean gradient, per-microbatch memory.
    accum_steps: int = 1
    # async_ckpt: serialize/IO epoch checkpoints in a background thread
    # (device snapshot stays synchronous — donated buffers).
    async_ckpt: bool = False
    # handle_preemption: SIGTERM/SIGINT -> finish the current step, save
    # a resumable checkpoint, return from fit cleanly (auto_resume redoes
    # the interrupted epoch on restart).
    handle_preemption: bool = False


class Trainer:
    """forward(params, inputs, rng)->logits + optax optimizer -> epochs.

    ``train_data`` / ``val_data`` are callables returning an iterable of
    batch dicts ({"input": ..., "label": ...}) per epoch — any host
    loader (grain / tf.data / numpy generator) plugs in.
    """

    def __init__(
        self,
        forward: Callable,
        optimizer: optax.GradientTransformation,
        params: Dict[str, Any],
        cfg: TrainerConfig = TrainerConfig(),
        loss_fn=step_lib.cross_entropy_loss,
        frozen_keys=step_lib.FROZEN_KEYS,
        val_metric: Optional[Callable] = None,
        jit_step: bool = True,
    ):
        self.cfg = cfg
        self.logger = setup_logger()
        self.trainable, self.frozen = step_lib.split_params(params, frozen_keys)
        self.optimizer = optimizer
        self.opt_state = optimizer.init(self.trainable)
        self.forward = forward
        # jit_step=False supports losses with host-side stages (e.g. the
        # Mask2Former Hungarian matching runs scipy per decoder layer);
        # value_and_grad still works eagerly there.
        raw_step = step_lib.make_train_step(
            forward, optimizer, loss_fn, accum_steps=cfg.accum_steps
        )
        self._step = (
            jax.jit(raw_step, donate_argnums=(0, 2)) if jit_step else raw_step
        )
        self._eval = jax.jit(lambda tr, fr, x: forward({**tr, **fr}, x, None))
        self.ema_params = (
            ema_lib.init(self.trainable) if cfg.use_ema else None
        )
        self.val_metric = val_metric
        self.early = (
            ckpt_lib.EarlyStopping(cfg.early_stop_patience, mode=cfg.best_mode)
            if cfg.early_stop_patience
            else None
        )
        self.epoch = 0
        self.global_step = 0
        self._async_ckpt = (
            ckpt_lib.AsyncCheckpointer() if cfg.async_ckpt else None
        )
        self._preempt: Optional[ckpt_lib.GracefulPreemption] = None

    @property
    def params(self) -> Dict[str, Any]:
        return step_lib.merge_params(self.trainable, self.frozen)

    def train_epoch(self, batches: Iterable[Dict[str, Any]], rng: jax.Array):
        losses, accs, n = [], [], 0
        t0 = time.perf_counter()
        for batch in batches:
            if self._preempt is not None and self._preempt.triggered:
                break  # step boundary: params/opt_state are consistent
            rng, sub = jax.random.split(rng)
            self.trainable, self.opt_state, metrics = self._step(
                self.trainable, self.frozen, self.opt_state, batch, sub
            )
            if self.cfg.use_ema:
                self.ema_params = ema_lib.update(
                    self.ema_params, self.trainable, self.cfg.ema_decay
                )
            self.global_step += 1
            n += 1
            if n % self.cfg.log_every == 0:
                self.logger.info(
                    "epoch %d step %d loss %.4f acc %.4f",
                    self.epoch, n, float(metrics["loss"]), float(metrics["acc"]),
                )
            losses.append(metrics["loss"])
            accs.append(metrics["acc"])
        dt = time.perf_counter() - t0
        return {
            "loss": float(np.mean([float(x) for x in losses])) if losses else 0.0,
            "acc": float(np.mean([float(x) for x in accs])) if accs else 0.0,
            "steps": n,
            "time_s": dt,
        }

    def validate(self, batches: Iterable[Dict[str, Any]]) -> Dict[str, float]:
        correct, total, preds, labels = 0, 0, [], []
        tr = self.ema_params if self.cfg.use_ema else self.trainable
        for batch in batches:
            logits = self._eval(tr, self.frozen, batch["input"])
            p = np.asarray(logits)
            y = np.asarray(batch["label"])
            preds.append(p)
            labels.append(y)
            correct += int((p.argmax(-1) == y).sum())
            total += len(y)
        out = {"acc": correct / max(total, 1)}
        if self.val_metric is not None:
            out.update(
                self.val_metric(np.concatenate(preds), np.concatenate(labels))
            )
        return out

    def fit(
        self,
        train_data: Callable[[], Iterable],
        val_data: Optional[Callable[[], Iterable]] = None,
        rng: Optional[jax.Array] = None,
        resume: bool = False,
    ) -> Dict[str, float]:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if resume and self.cfg.ckpt_dir:
            resumed = ckpt_lib.auto_resume(self.cfg.ckpt_dir)
            if resumed:
                state, epoch = resumed
                self.trainable = state["trainable"]
                # full resume: optimizer moments, EMA, global step
                # (pcdet checkpoint_state / openpoints resume_checkpoint parity)
                if "opt_state" in state:
                    self.opt_state = jax.tree_util.tree_unflatten(
                        jax.tree_util.tree_structure(self.opt_state),
                        jax.tree_util.tree_leaves(state["opt_state"]),
                    )
                if self.cfg.use_ema and "ema" in state:
                    self.ema_params = state["ema"]
                if "global_step" in state:
                    self.global_step = int(state["global_step"])
                self.epoch = epoch + 1
                self.logger.info("resumed from epoch %d", epoch)

        best_val = None
        log: Dict[str, float] = {}
        cm = (
            ckpt_lib.GracefulPreemption()
            if self.cfg.handle_preemption
            else None
        )
        if cm is not None:
            self._preempt = cm.__enter__()
        try:
            log = self._fit_loop(train_data, val_data, rng, best_val, log)
        finally:
            if cm is not None:
                cm.__exit__(None, None, None)
                self._preempt = None
            if self._async_ckpt is not None:
                self._async_ckpt.wait()
        return log

    def _ckpt_state(self) -> Dict[str, Any]:
        state = {
            "trainable": self.trainable,
            "opt_state": jax.tree_util.tree_leaves(self.opt_state),
            "global_step": np.int64(self.global_step),
        }
        if self.cfg.use_ema:
            state["ema"] = self.ema_params
        return state

    def _save_epoch(self, epoch: int, is_best: bool) -> None:
        state = self._ckpt_state()
        saver = (
            self._async_ckpt if self._async_ckpt is not None else ckpt_lib
        )
        saver.save_rotating(
            self.cfg.ckpt_dir, state, epoch,
            is_best=is_best, max_keep=self.cfg.max_keep,
        )

    def _fit_loop(self, train_data, val_data, rng, best_val, log):
        for epoch in range(self.epoch, self.cfg.epochs):
            self.epoch = epoch
            rng, sub = jax.random.split(rng)
            train_stats = self.train_epoch(train_data(), sub)
            if self._preempt is not None and self._preempt.triggered:
                # mid-epoch state goes to a dedicated ckpt_preempt.npz
                # (always, including epoch 0) so the clean end-of-epoch
                # rotation files are never overwritten; auto_resume
                # restarts the interrupted epoch with optimizer moments
                # and step counter intact
                self.logger.info(
                    "preempted during epoch %d: saving resumable state", epoch
                )
                if self.cfg.ckpt_dir:
                    if self._async_ckpt is not None:
                        self._async_ckpt.wait()
                    ckpt_lib.save_preempt(
                        self.cfg.ckpt_dir, self._ckpt_state(), resume_epoch=epoch
                    )
                break
            log = dict(train_stats)
            is_best = False
            if val_data is not None and (epoch + 1) % self.cfg.val_freq == 0:
                val_stats = self.validate(val_data())
                log.update({f"val_{k}": v for k, v in val_stats.items()})
                key = "val_acc" if "val_acc" in log else "val_loss"
                value = log[key]
                if self.early is not None:
                    is_best = self.early(value)
                    if self.early.should_stop:
                        self.logger.info("early stopping at epoch %d", epoch)
                        break
                else:
                    better = best_val is None or (
                        value > best_val
                        if self.cfg.best_mode == "max"
                        else value < best_val
                    )
                    if better:
                        best_val, is_best = value, True
            self.logger.info("epoch %d: %s", epoch, log)
            if self.cfg.ckpt_dir:
                self._save_epoch(epoch, is_best)
        return log

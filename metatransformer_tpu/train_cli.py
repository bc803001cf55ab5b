"""Training entry point: ``python -m metatransformer_tpu.train_cli
--cfg metatransformer_tpu/configs/modelnet40_metatransformer.yaml
[key=value overrides]``.

One CLI replacing the reference's per-subproject launchers (argparse
monoliths, dist_train.sh, mp.spawn, fairseq-train — SURVEY.md §5.6).
Builds model + optimizer + Trainer from the unified YAML config. With no
``--data`` directory it runs on synthetic data (smoke-train mode), so
every recipe is executable in this environment.
"""

from __future__ import annotations

import argparse
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.configs import load_config
from metatransformer_tpu.core import convert, encoder as enc
from metatransformer_tpu.train import optim, schedules
from metatransformer_tpu.train.trainer import Trainer, TrainerConfig


def _encoder_cfg(cfg) -> enc.EncoderConfig:
    scale = cfg.encoder.scale
    if scale == "large":
        return enc.LARGE
    if scale == "tiny":  # smoke-train scale for tests / CPU dry runs
        return enc.EncoderConfig(dim=64, depth=2, num_heads=4)
    return enc.BASE


def build_point(cfg, key):
    from metatransformer_tpu.models import point_classifier
    from metatransformer_tpu.tokenizers import point as point_tok

    ecfg = _encoder_cfg(cfg)
    mcfg = point_classifier.PointClassifierConfig(
        tokenizer=point_tok.PointTokenizerConfig(
            sample_ratio=cfg.model.tokenizer.sample_ratio,
            group_size=cfg.model.tokenizer.group_size,
            subsample=cfg.model.tokenizer.subsample,
            group=cfg.model.tokenizer.group,
            feature_type=cfg.model.tokenizer.feature_type,
            embed_dim=ecfg.dim,
        ),
        encoder=ecfg,
        num_classes=cfg.model.num_classes,
        global_feat=cfg.model.global_feat,
    )
    params = point_classifier.init(mcfg, key)

    def forward(p, x, rng):
        return point_classifier.forward(p, x, mcfg, precision=enc.BF16)

    def synth(batch_size, n_batches, seed):
        rng = np.random.default_rng(seed)
        n = cfg.train.get("num_points", 1024)
        for _ in range(n_batches):
            pts = rng.standard_normal((batch_size, n, 3)).astype(np.float32)
            labels = rng.integers(0, cfg.model.num_classes, batch_size)
            yield {"input": jnp.asarray(pts), "label": jnp.asarray(labels)}

    return params, forward, synth


def build_audio(cfg, key):
    from metatransformer_tpu.models import audio_classifier
    from metatransformer_tpu.tokenizers import audio as audio_tok

    frames = cfg.train.get("audio_length", 98)
    ecfg = _encoder_cfg(cfg)
    mcfg = audio_classifier.AudioClassifierConfig(
        tokenizer=audio_tok.AudioTokenizerConfig(
            num_mel_bins=cfg.model.tokenizer.num_mel_bins,
            num_frames=frames,
            patch_size=cfg.model.tokenizer.patch_size,
            fstride=cfg.model.tokenizer.fstride,
            tstride=cfg.model.tokenizer.tstride,
            dim=ecfg.dim,
        ),
        encoder=ecfg,
        num_classes=cfg.model.num_classes,
    )
    params = audio_classifier.init(mcfg, key)

    def forward(p, x, rng):
        return audio_classifier.forward_spectrogram(p, x, mcfg, precision=enc.BF16)

    def synth(batch_size, n_batches, seed):
        rng = np.random.default_rng(seed)
        for _ in range(n_batches):
            spec = rng.standard_normal(
                (batch_size, frames, cfg.model.tokenizer.num_mel_bins)
            ).astype(np.float32)
            labels = rng.integers(0, cfg.model.num_classes, batch_size)
            yield {"input": jnp.asarray(spec), "label": jnp.asarray(labels)}

    return params, forward, synth


BUILDERS: Dict[str, Callable] = {"point": build_point, "audio": build_audio}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cfg", required=True)
    p.add_argument("--ckpt", default=None, help="converted encoder .npz/.pth")
    p.add_argument(
        "--data", default=None, metavar="PATH",
        help="real dataset path (image recipes: ImageFolder tree of "
             "JPEG/PNG or a path\\tlabel manifest — raw bytes -> uint8 "
             "batches -> on-device scaling); omitted = synthetic data",
    )
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--steps-per-epoch", type=int, default=8)
    p.add_argument("--work-dir", default=None)
    p.add_argument(
        "--smoke", action="store_true",
        help="tiny-geometry structurally-identical model + synthetic data "
             "(every recipe is executable on CPU in seconds)",
    )
    p.add_argument(
        "--eval", action="store_true",
        help="evaluation-only: restore the latest checkpoint from "
             "--work-dir (if given) and report metrics without training — "
             "the reference's per-subproject test.py surface "
             "(AutonomousDriving/tools/test.py, Image/segmentation/test.py, "
             "X-Ray/test.py, Time-Series Exp_*.test)",
    )
    p.add_argument(
        "--profile", action="store_true",
        help="print params / FLOPs / throughput for the recipe's model and "
             "exit (PointCloud/examples/profile.py surface)",
    )
    p.add_argument(
        "--wa", nargs=2, type=int, default=None, metavar=("START", "END"),
        help="with --eval: average the parameters of ckpt_epoch_{START..END} "
             "before evaluating (AST weight-averaging eval, "
             "Audio/src/run.py:68-70 --wa/--wa_start/--wa_end)",
    )
    p.add_argument(
        "--ensemble", action="store_true",
        help="with --eval (classification recipes): average the prediction "
             "logits of every ckpt_epoch_*.npz in --work-dir "
             "(AST traintest.py ensemble validate)",
    )
    p.add_argument(
        "--eval-all", action="store_true",
        help="evaluate EVERY ckpt_epoch_*.npz in --work-dir and report "
             "the best (pcdet tools/test.py repeat_eval_ckpt)",
    )
    p.add_argument(
        "--compile-cache", nargs="?", const="", default=None, metavar="DIR",
        help="persistent XLA compilation cache (restart-warm executables; "
             "default dir: <repo>/.cache/xla)",
    )
    p.add_argument("overrides", nargs="*", help="key=value config overrides")
    args = p.parse_args(argv)

    if args.compile_cache is not None:
        from metatransformer_tpu.utils import compile_cache

        compile_cache.enable(args.compile_cache or compile_cache.DEFAULT_DIR)

    from metatransformer_tpu import recipes

    cfg = load_config(args.cfg, args.overrides)
    recipe = recipes.build(cfg, jax.random.PRNGKey(cfg.seed), smoke=args.smoke)
    params, forward, synth = recipe.params, recipe.forward, recipe.synth
    if args.ckpt:
        loader = convert.convert_pth if args.ckpt.endswith(".pth") else convert.load_npz
        params["encoder"], _ = loader(args.ckpt)

    epochs = args.epochs or cfg.train.get("epochs", 1)
    batch_size = cfg.train.batch_size

    if args.data:
        if recipe.data_loader is None:
            raise SystemExit(
                f"recipe for {cfg.get('modality', cfg.get('task'))!r} has "
                "no real-data loader; --data is not supported for it yet"
            )

        def train_batches():
            return recipe.data_loader(args.data, batch_size, cfg.seed, True)

        def val_batches():
            return recipe.data_loader(args.data, batch_size, cfg.seed + 1, False)
    else:

        def train_batches():
            return synth(batch_size, args.steps_per_epoch, cfg.seed)

        def val_batches():
            return synth(batch_size, 2, cfg.seed + 1)

    def eval_batches():
        if args.data:
            return val_batches()
        return synth(batch_size, args.steps_per_epoch, cfg.seed + 1)

    if args.profile:
        from metatransformer_tpu.utils import profiler

        batch = next(iter(synth(batch_size, 1, cfg.seed)))
        stats = profiler.profile_model(
            lambda p, x: forward(p, x, jax.random.PRNGKey(0)),
            params, batch["input"], batch_size,
        )
        print("profile:", {k: round(v, 4) for k, v in stats.items()})
        return 0
    total_steps = epochs * args.steps_per_epoch
    sched_name = cfg.train.get("schedule", "cosine")
    if sched_name == "cosine":
        lr = schedules.cosine_with_warmup(
            cfg.train.lr, total_steps,
            warmup_steps=cfg.train.get("warmup_epochs", 0) * args.steps_per_epoch,
        )
    elif sched_name == "multistep":
        lr = schedules.multistep(
            cfg.train.lr, [total_steps // 2, 3 * total_steps // 4]
        )
    elif sched_name == "type1":
        lr = schedules.type1_halving(cfg.train.lr, args.steps_per_epoch)
    elif sched_name == "one_cycle":
        lr = schedules.one_cycle(cfg.train.lr, total_steps)
    elif sched_name == "poly":
        lr = schedules.poly(cfg.train.lr, total_steps)
    elif sched_name == "step":
        lr = schedules.step_decay(cfg.train.lr, max(total_steps // 3, 1))
    elif sched_name == "constant":
        lr = cfg.train.lr
    else:
        raise SystemExit(f"unknown schedule {sched_name!r}; valid: cosine, "
                         "multistep, type1, one_cycle, poly, step, constant")

    tx = optim.build(
        cfg.train.get("optimizer", "adamw"), lr,
        weight_decay=cfg.train.get("weight_decay", 0.0),
        layer_decay=cfg.train.get("layer_decay"),
        encoder_depth=_encoder_cfg(cfg).depth,
    )
    # encoder.frozen: false -> full finetune (the reference's tuned recipes,
    # e.g. Audio 97% acc at 86.3M trainable params)
    frozen_keys = ("encoder",) if cfg.encoder.get("frozen", True) else ()
    trainer_kwargs = {}
    if recipe.loss_fn is not None:
        trainer_kwargs["loss_fn"] = recipe.loss_fn
    trainer = Trainer(
        forward, tx, params,
        frozen_keys=frozen_keys,
        jit_step=recipe.jit_step,
        cfg=TrainerConfig(
            epochs=epochs,
            ckpt_dir=args.work_dir,
            log_every=max(args.steps_per_epoch // 2, 1),
            early_stop_patience=cfg.train.get("early_stop_patience"),
            best_mode=recipe.best_mode,
            accum_steps=cfg.train.get("accum_steps", 1),
            async_ckpt=cfg.train.get("async_ckpt", False),
            handle_preemption=cfg.train.get("handle_preemption", False),
        ),
        **trainer_kwargs,
    )
    if args.eval_all:
        import glob as _glob
        import os as _os

        from metatransformer_tpu.utils import checkpoint as ckpt_lib

        if not args.work_dir:
            raise SystemExit("--eval-all needs --work-dir")
        ckpts = sorted(
            _glob.glob(_os.path.join(args.work_dir, "ckpt_epoch_*.npz"))
        )
        if not ckpts:
            raise SystemExit(f"no ckpt_epoch_*.npz under {args.work_dir}")
        key = "acc" if recipe.classification else "loss"
        best = None
        for path in ckpts:
            state = ckpt_lib.load(path)
            trainer.trainable = state["trainable"]
            stats = _evaluate(recipe, trainer, eval_batches())
            epoch = int(state.get("epoch", -1))
            print(f"eval epoch {epoch}:",
                  {k: round(v, 4) for k, v in stats.items()})
            better = best is None or (
                stats[key] > best[1][key]
                if recipe.best_mode == "max"
                else stats[key] < best[1][key]
            )
            if better:
                best = (epoch, stats)
        print("best:", {"epoch": best[0],
                        **{k: round(v, 4) for k, v in best[1].items()}})
        return 0

    if args.eval:
        from metatransformer_tpu.utils import checkpoint as ckpt_lib

        if args.ensemble:
            # AST ensemble validate: mean of per-checkpoint logits, then
            # argmax — classification recipes only.
            import glob as _glob
            import os as _os

            if not args.work_dir:
                raise SystemExit("--ensemble needs --work-dir")
            if not recipe.classification:
                raise SystemExit("--ensemble supports classification recipes")
            ckpts = sorted(
                _glob.glob(_os.path.join(args.work_dir, "ckpt_epoch_*.npz"))
            )
            if not ckpts:
                raise SystemExit(f"no ckpt_epoch_*.npz under {args.work_dir}")
            batches = list(eval_batches())
            summed = None
            for path in ckpts:
                trainer.trainable = ckpt_lib.load(path)["trainable"]
                params_k = trainer.params
                logits = [
                    np.asarray(recipe.forward(params_k, b["input"], None))
                    for b in batches
                ]
                summed = (
                    logits if summed is None
                    else [s + l for s, l in zip(summed, logits)]
                )
            labels = np.concatenate([np.asarray(b["label"]) for b in batches])
            preds = np.concatenate(summed).argmax(-1)
            acc = float((preds == labels).mean())
            print("eval:", {"acc": round(acc, 4),
                            "ensemble_size": len(ckpts)})
            return 0
        if args.wa is not None:
            if not args.work_dir:
                raise SystemExit("--wa needs --work-dir")
            state = ckpt_lib.average_epoch_range(
                args.work_dir, args.wa[0], args.wa[1]
            )
            trainer.trainable = state["trainable"]
        elif args.work_dir:
            resumed = ckpt_lib.auto_resume(args.work_dir)
            if resumed:
                trainer.trainable = resumed[0]["trainable"]
        stats = _evaluate(recipe, trainer, eval_batches())
        print("eval:", {k: round(v, 4) if isinstance(v, float) else v
                        for k, v in stats.items()})
        return 0

    log = trainer.fit(
        train_batches,
        # the generic val loop assumes class logits; structured tasks
        # (detection/segmentation losses in forward) train-only here
        val_data=val_batches if recipe.classification else None,
    )
    print("final:", {k: round(v, 4) if isinstance(v, float) else v
                     for k, v in log.items()})
    return 0


def _evaluate(recipe, trainer, batches) -> Dict[str, float]:
    """Checkpoint -> task metric, no training. Classification recipes get
    accuracy (+ any recipe val_metric via Trainer.validate); structured
    recipes (loss computed in forward) report mean loss."""
    from metatransformer_tpu.train import step as step_lib

    if recipe.eval_metric is not None:
        return recipe.eval_metric(trainer.params, recipe.forward, batches)
    if recipe.classification:
        return trainer.validate(batches)
    loss_fn = recipe.loss_fn or step_lib.cross_entropy_loss
    params = trainer.params
    losses = []
    for batch in batches:
        out = recipe.forward(params, batch["input"], jax.random.PRNGKey(0))
        losses.append(float(loss_fn(out, batch["label"])))
    return {"loss": float(np.mean(losses)), "batches": float(len(losses))}


if __name__ == "__main__":
    raise SystemExit(main())

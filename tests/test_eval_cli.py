"""--eval mode of the unified CLI: train with a work dir, then restore the
checkpoint and report metrics without training (the reference's test.py
eval-entry surface, SURVEY §4.2)."""

import os

from metatransformer_tpu import train_cli
import metatransformer_tpu.configs as cfgs

CFG_DIR = os.path.dirname(cfgs.__file__)


def _cfg(name):
    return os.path.join(CFG_DIR, name)


def test_eval_after_train_classification(tmp_path, capsys):
    wd = str(tmp_path / "run")
    rc = train_cli.main([
        "--cfg", _cfg("modelnet40_metatransformer.yaml"), "--smoke",
        "--epochs", "1", "--steps-per-epoch", "2", "--work-dir", wd,
        "train.batch_size=2",
    ])
    assert rc == 0
    rc = train_cli.main([
        "--cfg", _cfg("modelnet40_metatransformer.yaml"), "--smoke",
        "--eval", "--steps-per-epoch", "2", "--work-dir", wd,
        "train.batch_size=2",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "eval:" in out and "acc" in out


def test_eval_all_checkpoints(tmp_path, capsys):
    """--eval-all sweeps every epoch checkpoint and reports the best
    (pcdet repeat_eval_ckpt surface)."""
    wd = str(tmp_path / "run")
    rc = train_cli.main([
        "--cfg", _cfg("modelnet40_metatransformer.yaml"), "--smoke",
        "--epochs", "2", "--steps-per-epoch", "2", "--work-dir", wd,
        "train.batch_size=2",
    ])
    assert rc == 0
    rc = train_cli.main([
        "--cfg", _cfg("modelnet40_metatransformer.yaml"), "--smoke",
        "--eval-all", "--steps-per-epoch", "2", "--work-dir", wd,
        "train.batch_size=2",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("eval epoch") == 2 and "best:" in out


def test_eval_structured_recipe(capsys):
    """Structured (loss-in-forward) recipe: mean loss reported."""
    rc = train_cli.main([
        "--cfg", _cfg("modelnet40_pointmae_pretrain.yaml"), "--smoke",
        "--eval", "--steps-per-epoch", "2", "train.batch_size=2",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "eval:" in out and "loss" in out


def test_profile_mode(capsys):
    """--profile prints params/FLOPs/throughput and exits (the
    examples/profile.py launcher surface)."""
    rc = train_cli.main([
        "--cfg", _cfg("modelnet40_metatransformer.yaml"), "--smoke",
        "--profile", "train.batch_size=2",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "profile:" in out and "params_m" in out and "seq_per_s" in out


def test_eval_weight_averaging(tmp_path, capsys):
    """--eval --wa START END averages parameters over the epoch range before
    evaluating (AST Audio/src/run.py:68-70 weight-averaging eval)."""
    wd = str(tmp_path / "run")
    rc = train_cli.main([
        "--cfg", _cfg("modelnet40_metatransformer.yaml"), "--smoke",
        "--epochs", "2", "--steps-per-epoch", "2", "--work-dir", wd,
        "train.batch_size=2",
    ])
    assert rc == 0
    rc = train_cli.main([
        "--cfg", _cfg("modelnet40_metatransformer.yaml"), "--smoke",
        "--eval", "--wa", "0", "1", "--steps-per-epoch", "2",
        "--work-dir", wd, "train.batch_size=2",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "eval:" in out and "acc" in out


def test_eval_ensemble(tmp_path, capsys):
    """--eval --ensemble averages per-checkpoint prediction logits
    (AST traintest.py ensemble validate)."""
    wd = str(tmp_path / "run")
    rc = train_cli.main([
        "--cfg", _cfg("modelnet40_metatransformer.yaml"), "--smoke",
        "--epochs", "2", "--steps-per-epoch", "2", "--work-dir", wd,
        "train.batch_size=2",
    ])
    assert rc == 0
    rc = train_cli.main([
        "--cfg", _cfg("modelnet40_metatransformer.yaml"), "--smoke",
        "--eval", "--ensemble", "--steps-per-epoch", "2",
        "--work-dir", wd, "train.batch_size=2",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "eval:" in out and "ensemble_size" in out

"""Every shipped recipe YAML is executable end-to-end through the unified
CLI (the reference ships a working train entry per subproject —
``Image/segmentation/train.py:100-207``, ``AutonomousDriving/tools/
train.py:60-144``, ``Time-Series/run.py:109-118`` etc.; here one CLI must
drive them all). Smoke geometry + synthetic data: one tiny optimizer step
per recipe, which catches config rot and builder/model wiring breaks.
"""

import glob
import os

import pytest

import metatransformer_tpu.configs as cfgs
from metatransformer_tpu import train_cli

CFG_DIR = os.path.dirname(cfgs.__file__)
ALL_YAMLS = sorted(
    os.path.basename(p)
    for p in glob.glob(os.path.join(CFG_DIR, "*.yaml"))
    if os.path.basename(p) != "default.yaml"
)


def test_no_orphan_yamls():
    """The sweep below must cover every shipped recipe — exact count so a
    new YAML that fails to parametrize (or a deleted recipe) is caught."""
    assert len(ALL_YAMLS) == 55, sorted(ALL_YAMLS)


@pytest.mark.parametrize("name", ALL_YAMLS)
def test_recipe_executes(name):
    rc = train_cli.main(
        [
            "--cfg", os.path.join(CFG_DIR, name),
            "--smoke",
            "--epochs", "1",
            "--steps-per-epoch", "1",
            "train.batch_size=2",
        ]
    )
    assert rc == 0

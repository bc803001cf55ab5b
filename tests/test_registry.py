"""Model registry / config-driven builder."""

import pytest

from metatransformer_tpu.utils.registry import MODELS, Registry


def test_builtin_models_registered():
    for name in (
        "ImageClassifier", "AudioClassifier", "VideoClassifier",
        "PointClassifier", "PointSegmenter", "HyperClassifier",
        "TabularClassifier", "GraphPredictor", "TimeSeriesModel",
    ):
        assert name in MODELS
        mod = MODELS.get(name)
        assert hasattr(mod, "init") and hasattr(mod, "forward")


def test_registry_build_and_errors():
    reg = Registry("test")

    @reg.register()
    def make_thing(a, b=2):
        return a + b

    assert reg.build({"NAME": "make_thing", "a": 1}) == 3
    assert reg.build({"name": "make_thing", "a": 1, "b": 10}) == 11
    with pytest.raises(KeyError):
        reg.get("missing")
    with pytest.raises(KeyError):

        @reg.register("make_thing")
        def dup():
            pass

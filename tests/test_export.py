"""Deployment export tests (export.py): StableHLO artifact roundtrip,
symbolic batch, and the recipe CLI surface."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from metatransformer_tpu import export as exp_lib


def _fn_with_baked_params():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((8, 4)), jnp.float32)

    def fn(x):
        return jnp.tanh(x @ w)

    return fn


def test_roundtrip_matches_direct(tmp_path):
    fn = _fn_with_baked_params()
    x = jnp.asarray(np.random.default_rng(1).standard_normal((3, 8)), jnp.float32)
    blob = exp_lib.export_forward(fn, (x,))
    path = str(tmp_path / "m.jaxexport")
    exp_lib.save(path, blob)
    loaded = exp_lib.load(path)
    np.testing.assert_allclose(
        np.asarray(loaded.call(x)), np.asarray(fn(x)), atol=1e-6
    )


def test_symbolic_batch_serves_any_batch_size(tmp_path):
    fn = _fn_with_baked_params()
    example = jnp.zeros((2, 8), jnp.float32)
    blob = exp_lib.export_forward(fn, (example,), symbolic_batch=True)
    path = str(tmp_path / "m.jaxexport")
    exp_lib.save(path, blob)
    loaded = exp_lib.load(path)
    rng = np.random.default_rng(2)
    for b in (1, 3, 7):
        x = jnp.asarray(rng.standard_normal((b, 8)), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(loaded.call(x)), np.asarray(fn(x)), atol=1e-6
        )


def test_static_export_rejects_other_batch():
    fn = _fn_with_baked_params()
    blob = exp_lib.export_forward(fn, (jnp.zeros((2, 8), jnp.float32),))
    loaded = exp_lib.deserialize_bytes(blob)
    with pytest.raises(Exception):
        loaded.call(jnp.zeros((5, 8), jnp.float32))


def test_export_recipe_cli(tmp_path):
    out = str(tmp_path / "imagenet_smoke.jaxexport")
    rc = exp_lib.main([
        "--cfg", "metatransformer_tpu/configs/imagenet_metatransformer.yaml",
        "--out", out, "--smoke", "--batch", "2",
    ])
    assert rc == 0
    loaded = exp_lib.load(out)

    from metatransformer_tpu import recipes
    from metatransformer_tpu.configs import load_config

    cfg = load_config("metatransformer_tpu/configs/imagenet_metatransformer.yaml")
    recipe = recipes.build(cfg, jax.random.key(0), smoke=True)
    batch = next(iter(recipe.synth(2, 1, 0)))["input"]
    direct = np.asarray(recipe.forward(recipe.params, batch, None))
    served = np.asarray(loaded.call(batch))
    np.testing.assert_allclose(served, direct, atol=2e-2)  # bf16 path
    assert served.shape[0] == 2

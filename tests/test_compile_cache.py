"""Persistent XLA compilation cache (utils/compile_cache): the serving
cold-start feature — executables serialize to disk and a fresh process
skips the compile (24.9s -> 3.5s measured on the real chip for a B16
encode program; see BENCH_SERVING.md)."""

import jax
import jax.numpy as jnp
import numpy as np

from metatransformer_tpu.utils import compile_cache


def test_enable_creates_dir_and_persists_executables(tmp_path):
    d = compile_cache.enable(str(tmp_path / "xla"), min_compile_secs=0.0)
    assert compile_cache.entries(d) == 0

    # a non-trivial program with a unique constant (no collision with
    # programs other tests may have compiled before the cache was on)
    c = jnp.asarray(np.full((128, 128), 3.14159), jnp.float32)
    f = jax.jit(lambda x: jnp.tanh(x @ x + c).sum())
    out = float(f(jnp.ones((128, 128), jnp.float32)))
    assert np.isfinite(out)
    assert compile_cache.entries(d) >= 1


def test_entries_missing_dir_is_zero(tmp_path):
    assert compile_cache.entries(str(tmp_path / "nope")) == 0

"""Persistent XLA compilation cache: serving cold-start control.

The serving surface compiles one executable per (modality, batch-bucket)
composition; a cold 12-modality warmup costs 100-400 s of XLA compiles
(BENCH_SERVING.md). JAX's persistent compilation cache serializes
executables to disk so a restarted server (or a re-run benchmark) skips
straight to execution — measured on the real chip: a B16 encode program
drops 24.9 s -> 3.5 s process-cold.

The reference has no equivalent (its torch scripts re-JIT nothing but
also fuse nothing); this is the TPU deployment story's missing piece.

Call :func:`enable` before the first jit execution (it is harmless but
ineffective for programs already compiled in-process).
"""

from __future__ import annotations

import os

import jax

DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".cache",
    "xla",
)


def enable(
    cache_dir: str = DEFAULT_DIR, min_compile_secs: float = 0.5
) -> str:
    """Turn on the persistent compilation cache; returns the cache dir.

    ``min_compile_secs``: only programs whose compile took at least this
    long are persisted (skips trivial host programs).
    """
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", float(min_compile_secs)
    )
    return cache_dir


def entries(cache_dir: str = DEFAULT_DIR) -> int:
    """Number of cached executables on disk (0 if the dir is absent)."""
    try:
        return len(os.listdir(cache_dir))
    except OSError:
        return 0

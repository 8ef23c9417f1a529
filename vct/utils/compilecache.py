"""Persistent XLA compile cache for the CLI entry points.

On this project's target topology the chip can sit behind a network tunnel
where a cold compile of the production train step costs minutes; bench.py
has always pointed JAX at a persistent on-disk cache so repeat runs skip
the remote compile, but the CLI entry points (``vct.train``, ``vct.sweep``,
``vct.serve.*``, ``vct.caption``) did not — and they cannot use the env-var
route at all, because the interpreter may import jax at startup (sitecustomize)
before any vct code runs. ``jax.config.update`` works after import, so every
CLI main calls :func:`enable_persistent_compile_cache` first.

CPU backends get a host-fingerprinted directory (``vct/utils/hostcache.py``):
XLA:CPU persists AOT executables specialized to the build machine's CPU
features, and loading another machine's artifacts warns or dies (SIGILL).
"""

from __future__ import annotations

import os

from vct.utils.hostcache import machine_cache_dir

__all__ = ["enable_persistent_compile_cache"]

TPU_CACHE_DIR = "/tmp/vct_tpu_cache"  # shared with bench.py
CPU_CACHE_DIR = "/tmp/vct_jax_test_cache"  # shared with conftest/dryruns


def enable_persistent_compile_cache() -> str | None:
    """Point JAX at the persistent compile cache; returns the directory.

    A no-op (returns None) when the user already configured a cache via
    ``JAX_COMPILATION_CACHE_DIR`` — their choice wins, including setting it
    to the empty string to disable caching.
    """
    if "JAX_COMPILATION_CACHE_DIR" in os.environ:
        return None
    import jax

    if jax.config.jax_compilation_cache_dir:
        return None  # configured programmatically elsewhere
    path = (
        machine_cache_dir(CPU_CACHE_DIR)
        if jax.default_backend() == "cpu"
        else TPU_CACHE_DIR
    )
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path

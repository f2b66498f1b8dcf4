"""Persistent XLA compilation cache for the TPU-bound entry points.

First TPU compiles of the big programs are expensive (solver ~30-60 s,
the fully-fused lap episode ~4 min) and the accelerator tunnel on this
rig can drop for hours, so compile time inside a tunnel-up window is the
scarcest resource there is.  A persistent on-disk cache makes every
re-run of bench / tests_tpu / the breakdown tools after the first nearly
compile-free, across processes and across sessions.

Not enabled at import time: library users keep JAX's defaults.  The
entry points (bench.py, tests_tpu/conftest.py, solve_breakdown,
scaling_bench, lap_benchmark) opt in by calling
:func:`enable_persistent_cache` before their first compilation.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "autorally_tpu", "xla_cache")


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Point JAX's compilation cache at a persistent directory.

    Uses ``jax.config.update`` (NOT env vars — jax is pre-imported by
    sitecustomize in this image, so env-var config is ignored).  Safe to
    call more than once.  Returns the cache directory in use.
    """
    import jax

    path = cache_dir or os.environ.get(
        "AUTORALLY_TPU_CACHE_DIR", DEFAULT_CACHE_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # cache entries regardless of size; the big episode programs are the
    # whole point
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path

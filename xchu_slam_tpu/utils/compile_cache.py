"""Persistent XLA compilation cache shared across processes and runs.

The reference ships precompiled registration kernels (`libndt_cpu.so` /
`libndt_omp.so`, linked at `CMakeLists.txt:79,105`) so it pays zero compile
cost at startup; our XLA programs cost 20-140 s of compile per fresh process
(measured, BENCH_r01.json phase3: 143.6 s). Pointing every entry point at one
on-disk cache drops a warm process's compile to seconds — across CLI runs,
bench subprocesses, and rounds.
"""

from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
DEFAULT_DIR = os.path.join(_REPO_ROOT, ".jax_cache")


def enable(cache_dir: str | None = None) -> str:
    """Enable the persistent compilation cache. Safe to call repeatedly and
    before/after backend init; returns the cache directory in use."""
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get("XST_COMPILE_CACHE", DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache even quick compiles: a full CLI run compiles dozens of small
    # programs whose costs add up on the warmup path
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    try:
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    except Exception:  # knob absent/renamed on some jax versions
        pass
    return cache_dir

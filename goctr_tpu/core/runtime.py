"""Process-level runtime knobs."""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache — first-compile latency on this
    environment's remote-compile TPU relay runs minutes for large programs;
    caching makes every subsequent process start warm. Safe to call early
    (before or after jax import, pre-first-compile)."""
    import jax

    cache_dir = path or os.environ.get(
        "GOCTR_COMPILE_CACHE", os.path.expanduser("~/.cache/goctr_jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

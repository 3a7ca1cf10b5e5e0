"""Persistent XLA compilation cache.

TPU kernel compiles are expensive (and on remote-compile setups, very
expensive -- minutes per shape); the persistent cache makes every shape a
one-time cost across processes.  Call once before the first jit; safe to
call multiple times.
"""

from __future__ import annotations

import os

_enabled = False


def enable_compile_cache(cache_dir: str | None = None) -> str:
    """Enable jax's persistent compilation cache; returns the directory."""
    global _enabled
    import jax

    cache_dir = (
        cache_dir
        or os.environ.get("TPU_ALIGN_CACHE_DIR")
        or os.path.join(os.path.expanduser("~"), ".cache", "tpu_align", "xla")
    )
    if not _enabled:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
        _enabled = True
    return cache_dir

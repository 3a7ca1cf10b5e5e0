"""Persistent XLA compilation cache.

TPU kernel compiles are expensive (and on remote-compile setups, very
expensive -- minutes per shape); the persistent cache makes every shape a
one-time cost across processes.  Call once before the first jit; safe to
call multiple times.

The cache is only enabled for accelerator backends by default: XLA:CPU
AOT executable (de)serialization is unsound on some hosts (machine-feature
mismatches in cpu_aot_loader.cc escalate to hard segfaults inside the jax
compilation-cache put/get path), so persisting CPU executables can crash
the process that writes -- or later reads -- an entry.  Control with
TPU_ALIGN_CACHE: "auto" (default; accelerators only), "on" (force,
any backend), "off" (never).
"""

from __future__ import annotations

import os

_enabled = False
_dir = ""


def enable_compile_cache(cache_dir: str | None = None) -> str:
    """Enable jax's persistent compilation cache; returns the directory
    (empty string when the cache stays disabled)."""
    global _enabled, _dir
    import jax

    knob = os.environ.get("TPU_ALIGN_CACHE", "auto").lower()
    if knob in ("off", "0", "no", "none", "false"):
        return ""
    if _enabled:
        return _dir
    if knob != "on" and jax.default_backend() == "cpu":
        return ""  # see module docstring: CPU AOT (de)serialization segfaults
    cache_dir = (
        cache_dir
        or os.environ.get("TPU_ALIGN_CACHE_DIR")
        or os.path.join(os.path.expanduser("~"), ".cache", "tpu_align", "xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    _enabled = True
    _dir = cache_dir
    return cache_dir

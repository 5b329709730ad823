"""JAX environment setup: persistent compilation cache.

First compiles through the TPU tunnel in this environment take minutes; the
persistent cache makes every subsequent process start warm. Safe to call on
any backend.
"""

from __future__ import annotations

import os

_DONE = False


def setup_compilation_cache(path: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    import jax

    cache_dir = path or os.environ.get(
        "QMLTPU_COMPILATION_CACHE", os.path.expanduser("~/.cache/qmltpu_xla")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: run without the cache
    _DONE = True


def ensure_precision(cfg) -> None:
    """Enable jax x64 when the config asks for f64. Without this, float64
    arrays silently downcast to f32 and an "f64" run produces f32 numerics
    (the parity mode would be a lie). Safe to call repeatedly; enabling x64
    mid-process only affects traces made afterwards."""
    if getattr(cfg, "precision", None) == "f64":
        import jax

        if not jax.config.jax_enable_x64:
            jax.config.update("jax_enable_x64", True)

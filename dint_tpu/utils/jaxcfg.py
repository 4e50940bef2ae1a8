"""JAX runtime configuration helpers."""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache — decode shape variants compile
    once per machine instead of once per process."""
    import jax

    cache = path or os.path.join(
        os.path.expanduser("~"), ".cache", "dint_tpu_jax"
    )
    os.makedirs(cache, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

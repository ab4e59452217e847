"""Persistent XLA compilation cache.

The model zoo compiles large conv graphs; enabling JAX's persistent
compilation cache makes repeated CLI runs / test sessions start fast
(first compile is written to disk, later processes reuse it).  This has
no reference equivalent (the reference relies on cudnn autotune caching).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.environ.get("DVIE_CACHE_DIR", os.path.expanduser("~/.cache")),
    "dvie_tpu_xla_cache",
)

_enabled = False


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Idempotently enable the persistent compilation cache."""
    global _enabled
    if _enabled:
        return
    import jax

    path = cache_dir or _DEFAULT_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True

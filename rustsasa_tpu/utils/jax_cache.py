"""Persistent XLA compilation cache.

TPU compiles in this deployment go through a remote compile service and can
take minutes per (shape, backend) bucket; the persistent cache makes every
bucket a one-time cost across processes and sessions.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)

_enabled = False


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    """Idempotently enable the on-disk compilation cache."""
    global _enabled
    if _enabled:
        return
    import jax

    path = cache_dir or os.environ.get("RUSTSASA_TPU_CACHE", _DEFAULT_DIR)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
    except Exception:  # noqa: BLE001 - cache is best-effort
        pass

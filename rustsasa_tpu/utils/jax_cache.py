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


def enable_persistent_cache(
    cache_dir: str | None = None, *, library_call: bool = False
) -> None:
    """Idempotently enable the on-disk compilation cache.

    library_call=True marks a call made as a side effect of a library
    API (engine entry points).  Those must not mutate process-global JAX
    config under an embedding application that didn't ask for it — the
    cache dir redirect and jax_include_full_tracebacks_in_locations
    would leak into the host app's own JAX diagnostics.  Library-side
    calls therefore only act when the user opted in by setting the
    RUSTSASA_TPU_CACHE env var (or by calling this function directly /
    running one of our entry points first — it is idempotent).
    """
    global _enabled
    if _enabled:
        return
    if library_call and not os.environ.get("RUSTSASA_TPU_CACHE"):
        return
    import jax

    try:
        if cache_dir is None and jax.config.jax_compilation_cache_dir:
            # An embedding application already configured a cache;
            # respect it rather than redirecting compiles to ours.
            _enabled = True
            return
    except AttributeError:
        pass
    path = cache_dir or os.environ.get("RUSTSASA_TPU_CACHE", _DEFAULT_DIR)
    try:
        try:
            os.makedirs(path, exist_ok=True)
            writable = os.access(path, os.W_OK)
        except OSError:
            writable = False
        if not writable:
            # Shared/read-only install (e.g. root-owned site-packages):
            # fall back to a per-user cache instead of failing silently
            # or polluting the install tree.
            path = os.path.join(
                os.path.expanduser("~"), ".cache", "rustsasa_tpu",
                "jax_cache",
            )
            os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        # CRITICAL for cache hits: with full tracebacks in MLIR locations
        # (the default), the serialized Mosaic kernel payload inside the
        # tpu_custom_call embeds the CALLER's file/line.  The cache key's
        # strip-debuginfo pass cannot reach inside that payload, so every
        # distinct call site - and every code edit that shifts a caller
        # line - changed the key and forced a full remote recompile
        # (measured: 3-7 min per miss on this deployment).  Verified:
        # with this off, the canonicalized module is byte-identical
        # across call sites.  NOTE: the kernel file's OWN line numbers
        # remain in the payload - edits to ops/fused_kernel.py (even
        # comments) still invalidate keys; re-run `make precompile`
        # after touching kernel files.
        jax.config.update("jax_include_full_tracebacks_in_locations", False)
        _enabled = True
    except Exception:  # noqa: BLE001 - cache is best-effort
        pass

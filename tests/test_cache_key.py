"""Compile-cache key stability (the round-4 root-cause fix).

With full tracebacks in MLIR locations (jax default), the serialized
Mosaic kernel payload inside tpu_custom_call embeds the CALLER's
file/line - outside the reach of the cache key's strip-debuginfo pass -
so every call site and every caller line shift forced a full remote
recompile (measured 3-7 min each on the axon deployment).
enable_persistent_cache() flips jax_include_full_tracebacks_in_locations
off; this test cross-lowers the production banded kernel for the TPU
platform (jax.export works from the CPU suite) and pins that the
serialized module is byte-identical across distinct call sites - plus a
negative control proving the probe can detect the leak.
"""

import numpy as np
import pytest


def _export_from_callsite(filename: str, pad_lines: int) -> bytes:
    """Serialize the TPU lowering of the banded kernel from a synthetic
    call site (filename + line offset)."""
    src = "\n" * pad_lines + (
        "import jax\n"
        "import jax.export\n"
        "import rustsasa_tpu.ops.fused_kernel as fk\n"
        "def make(planes4, tparams, tmeta, sphere):\n"
        "    f = lambda a, b, c, d: fk.fused_sasa_q16_banded(\n"
        "        a, b, c, d, n_points=100, w=16)\n"
        "    return jax.export.export(jax.jit(f), platforms=['tpu'])(\n"
        "        planes4, tparams, tmeta, sphere)\n"
    )
    ns: dict = {}
    exec(compile(src, filename, "exec"), ns)  # noqa: S102 - test fixture
    planes4 = np.zeros((4, 256), np.uint16)
    tparams = np.zeros((2, 4), np.float32)
    tparams[:, 3] = 1.0
    tmeta = np.zeros((2, 2), np.int32)
    tmeta[:, 1] = 1
    tmeta[1, 0] = 1
    sphere = np.zeros((104, 128), np.float32)
    exported = ns["make"](planes4, tparams, tmeta, sphere)
    return exported.mlir_module_serialized


def test_cache_key_is_callsite_independent():
    import jax

    from rustsasa_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    # Negative control FIRST: with full tracebacks, the serialized module
    # must differ across call sites (otherwise this probe proves nothing).
    jax.config.update("jax_include_full_tracebacks_in_locations", True)
    try:
        leak_a = _export_from_callsite("/synthetic/site_a.py", 0)
        leak_b = _export_from_callsite("/synthetic/other_place.py", 17)
        if leak_a == leak_b:
            pytest.skip(
                "this jax version does not embed call sites; probe inert"
            )
        assert b"synthetic" in leak_a  # the caller file really leaks

        # The fix: with tracebacks off (what enable_persistent_cache
        # sets), identical modules -> identical persistent-cache keys.
        jax.config.update("jax_include_full_tracebacks_in_locations", False)
        fixed_a = _export_from_callsite("/synthetic/site_a.py", 0)
        fixed_b = _export_from_callsite("/synthetic/other_place.py", 17)
        assert fixed_a == fixed_b, (
            "serialized module differs across call sites even with "
            "tracebacks stripped - the persistent compile cache would "
            "miss for every caller (see utils/jax_cache.py)"
        )
        assert b"synthetic" not in fixed_a
    finally:
        jax.config.update("jax_include_full_tracebacks_in_locations", False)

"""Test configuration.

Tests run on the JAX CPU backend with 8 virtual devices so sharding tests
exercise a real (virtual) mesh without TPU hardware, and so the suite is
deterministic and runs anywhere.  Env vars must be set before jax imports.
"""

import os
import pathlib

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize may force-register a TPU backend and
# override jax_platforms after env vars are read; re-pin to CPU before any
# backend is initialized so the suite runs on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
# Self-contained: the quality dataset (88 FreeSASA PDBs gzipped + stored
# FreeSASA JSONs + awkward-PDB fixtures) is vendored in tests/data, so the
# quality gate runs everywhere and can never green-light by skipping.
REFERENCE_DATA = REPO_ROOT / "tests" / "data"


@pytest.fixture(scope="session")
def reference_data_dir() -> pathlib.Path:
    assert REFERENCE_DATA.is_dir(), "vendored test data missing"
    return REFERENCE_DATA


@pytest.fixture(scope="session")
def example_cif(reference_data_dir) -> pathlib.Path:
    return reference_data_dir / "pdbs" / "example.cif"

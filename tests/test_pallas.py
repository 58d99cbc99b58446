"""Pallas occlusion kernel parity tests (interpret mode on CPU).

The Pallas tile kernel must agree with the XLA scan path exactly (both are
f32 with the same comparison semantics).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rustsasa_tpu.ops.engine import BatchedSasaEngine, SasaParams, calculate_sasa_internal


def random_cluster(n, seed, spread=12.0):
    rng = np.random.default_rng(seed)
    coords = rng.uniform(0, spread, size=(n, 3)).astype(np.float32) + 100.0
    radii = rng.uniform(1.4, 1.9, size=n).astype(np.float32)
    return coords, radii


@pytest.mark.parametrize("n", [128, 300])
def test_pallas_matches_xla_single(n):
    coords, radii = random_cluster(n, seed=n)
    ref = calculate_sasa_internal(coords, radii, backend="xla")
    out = calculate_sasa_internal(coords, radii, backend="pallas_interpret")
    np.testing.assert_allclose(out, ref, atol=1e-3)
    assert (ref > 0).any()


def test_pallas_matches_xla_batched():
    structures = []
    for i, n in enumerate([100, 180, 256]):
        coords, radii = random_cluster(n, seed=10 + i)
        structures.append((coords, radii, None))
    xla = BatchedSasaEngine(SasaParams(), backend="xla").compute(structures)
    pal = BatchedSasaEngine(
        SasaParams(), backend="pallas_interpret"
    ).compute(structures)
    for a, b in zip(xla, pal):
        np.testing.assert_allclose(a, b, atol=1e-3)


def test_pallas_n_points_variants():
    coords, radii = random_cluster(128, seed=3)
    for n_points in (60, 100, 256):
        ref = calculate_sasa_internal(
            coords, radii, n_points=n_points, backend="xla"
        )
        out = calculate_sasa_internal(
            coords, radii, n_points=n_points, backend="pallas_interpret"
        )
        np.testing.assert_allclose(out, ref, atol=1e-3)


@pytest.mark.parametrize("n", [100, 128, 500])
def test_fused_matches_xla_single(n):
    coords, radii = random_cluster(n, seed=n + 7)
    ref = calculate_sasa_internal(coords, radii, backend="xla")
    out = calculate_sasa_internal(coords, radii, backend="fused_interpret")
    np.testing.assert_allclose(out, ref, atol=1e-3)


def test_fused_matches_xla_batched():
    structures = []
    for i, n in enumerate([90, 180, 256, 400]):
        coords, radii = random_cluster(n, seed=20 + i)
        structures.append((coords, radii, None))
    xla = BatchedSasaEngine(SasaParams(), backend="xla").compute(structures)
    fused = BatchedSasaEngine(
        SasaParams(), backend="fused_interpret", readback_dtype=jnp.float32
    ).compute(structures)
    for a, b in zip(xla, fused):
        np.testing.assert_allclose(a, b, atol=1e-3)
    # Default engine readback is f16 (the host link's readback direction is
    # its narrowest resource); rounding must stay inside f16 granularity,
    # far below every parity tolerance (golden eps=25 A^2/atom).
    f16 = BatchedSasaEngine(
        SasaParams(), backend="fused_interpret"
    ).compute(structures)
    for a, b in zip(xla, f16):
        assert b.dtype == np.float32
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=0.05)


def test_fused_group_ids_and_spread_structures():
    # Coincident atoms sharing a group id must not occlude (fused path).
    coords = np.array([[0, 0, 0], [0.5, 0, 0], [3.0, 0, 0]], np.float32) + 50.0
    radii = np.full(3, 1.8, np.float32)
    gids = np.array([5, 5, 9], np.int32)
    ref = calculate_sasa_internal(coords, radii, group_ids=gids, backend="xla")
    out = calculate_sasa_internal(
        coords, radii, group_ids=gids, backend="fused_interpret"
    )
    np.testing.assert_allclose(out, ref, atol=1e-3)

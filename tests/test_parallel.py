"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax


def test_virtual_mesh_available():
    assert len(jax.devices()) == 8


def test_sharded_step_matches_single_device():
    from rustsasa_tpu.ops.engine import _sasa_batched
    from rustsasa_tpu.parallel.mesh import (
        make_mesh,
        make_sharded_sasa,
        put_batch_sharded,
    )
    import __graft_entry__ as ge

    args = ge._example_batch(b=8, n=128)
    coords, radii, gid, valid, sphere, point_valid, probe = args

    ref, _ = _sasa_batched(
        coords, radii, gid, valid, sphere, point_valid, probe,
        k=64, n_points=100, backend="xla",
    )

    mesh = make_mesh(8)
    step = make_sharded_sasa(mesh, k=64, n_points=100)
    sasa, total, max_count = step(
        put_batch_sharded(mesh, coords),
        put_batch_sharded(mesh, radii),
        put_batch_sharded(mesh, gid),
        put_batch_sharded(mesh, valid),
        sphere, point_valid, probe,
    )
    np.testing.assert_allclose(np.asarray(sasa), np.asarray(ref), atol=1e-3)
    assert float(total[0]) == pytest.approx(float(np.asarray(ref).sum()), rel=1e-5)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge
    import jax

    fn, args = ge.entry()
    sasa, max_count = jax.jit(fn)(*args)
    assert np.asarray(sasa).shape == args[0].shape[:2]
    assert np.isfinite(np.asarray(sasa)).all()

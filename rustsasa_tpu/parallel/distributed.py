"""Multi-host distributed batch processing.

The reference is strictly single-process (SURVEY 2: no MPI/NCCL; rayon
threads only).  The TPU-native scale-out axis is jax.distributed over
hosts, with the corpus sharded per process:

  * each host reads ITS OWN file shard (round-robin by process index) -
    ingest bandwidth scales with hosts, no cross-host data motion;
  * per-structure results are written locally by the owning host
    (per-file outputs, as in the reference's directory mode);
  * the only collectives are run-level metrics (structure counts, total
    area, error counts) - an all-reduce over a tiny vector on the global
    mesh, riding ICI within a slice and DCN across slices.

Single-process runs degrade gracefully: shard = everything, reductions
are identity.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import numpy as np


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed when a multi-process env is configured.

    Returns True when running multi-process.  Arguments default to the
    standard JAX env vars; a bare single-host run is a no-op.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env) if env else None
    if not coordinator_address or not num_processes or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def shard_files(files: list[str], process_index: int | None = None,
                process_count: int | None = None) -> list[str]:
    """Round-robin file shard for this host (deterministic, size-balanced
    when the listing is sorted)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return files[pi::pc]


@dataclass
class GlobalReport:
    n_files: int
    n_ok: int
    n_errors: int
    total_area: float


def allreduce_metrics(
    n_files: int, n_ok: int, n_errors: int, total_area: float
) -> GlobalReport:
    """Sum run metrics across all hosts (identity on one process).

    Uses a tiny jitted psum over the global device set - the only
    cross-host communication in the batch pipeline.
    """
    local = np.array(
        [n_files, n_ok, n_errors, total_area], dtype=np.float32
    )
    if jax.process_count() == 1:
        summed = local
    else:
        from jax.sharding import Mesh, PartitionSpec as P

        devs = np.array(jax.devices())
        mesh = Mesh(devs, ("d",))

        def reduce_fn(x):
            return jax.lax.psum(x, "d")

        fn = jax.jit(
            jax.shard_map(
                reduce_fn, mesh=mesh, in_specs=P("d", None), out_specs=P()
            )
        )
        # Each local device contributes local/ndev_local so the global sum
        # equals the per-host sum over hosts.
        per_dev = np.tile(
            local / jax.local_device_count(), (jax.local_device_count(), 1)
        )
        arrs = jax.make_array_from_process_local_data(
            jax.sharding.NamedSharding(mesh, P("d", None)), per_dev
        )
        summed = np.asarray(fn(arrs)).reshape(-1)
    return GlobalReport(
        n_files=int(round(float(summed[0]))),
        n_ok=int(round(float(summed[1]))),
        n_errors=int(round(float(summed[2]))),
        total_area=float(summed[3]),
    )


def process_directory_distributed(
    input_dir: str,
    output_dir: str,
    options,
    output_format: str,
    **kwargs,
) -> GlobalReport:
    """Multi-host directory batch: shard files, process locally, reduce
    metrics globally.  Every host must call this collectively."""
    from ..batch import process_directory

    entries = sorted(os.listdir(input_dir))
    files = [f for f in entries if os.path.isfile(os.path.join(input_dir, f))]
    my_files = shard_files(files)

    # Process only this host's shard via a filtered view directory.
    report = process_directory(
        input_dir,
        output_dir,
        options,
        output_format,
        file_filter=set(my_files),
        **kwargs,
    )
    return allreduce_metrics(
        report.n_files, report.n_ok, len(report.errors), report.total_area
    )

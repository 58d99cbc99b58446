"""MD trajectory streaming SASA (the mdsasa-bolt workload, TPU-native).

Static topology + radii are resolved once; frame coordinate blocks stream
through the batched engine as [F, N] batches - every frame of a block is a
lane of the same fixed-shape kernel, so a whole trajectory compiles
exactly once per (N_pad, K) bucket.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..api import SASAOptions
from ..io.read import read_structure
from ..levels import Level, aggregate
from ..ops.engine import BatchedSasaEngine, SasaParams
from .dcd import DCDHeader, iter_frame_blocks, read_dcd, write_dcd

__all__ = [
    "DCDHeader",
    "read_dcd",
    "write_dcd",
    "iter_frame_blocks",
    "TrajectoryResult",
    "compute_trajectory_sasa",
]


@dataclass
class TrajectoryResult:
    n_frames: int
    n_atoms: int
    # Per-frame totals [F]; per-frame per-residue [F, R] when residue level.
    totals: np.ndarray
    residue_values: np.ndarray | None
    residue_names: list[str] | None


def compute_trajectory_sasa(
    topology_path: str,
    dcd_path: str,
    options: SASAOptions | None = None,
    *,
    block: int = 16,
) -> TrajectoryResult:
    """Per-frame SASA over a DCD trajectory.

    topology_path: PDB/mmCIF supplying atom identities and radii; the DCD
    must have the same atom count and order (the MDAnalysis convention the
    reference's mdsasa-bolt follows).
    """
    options = options or SASAOptions(level=Level.RESIDUE)
    structure = read_structure(topology_path)
    sel = options.build_selection(structure)

    engine = BatchedSasaEngine(
        SasaParams(
            probe_radius=options.probe_radius, n_points=options.n_points
        )
    )

    totals: list[float] = []
    residue_rows: list[np.ndarray] = []
    n_atoms_traj = None
    for _, _, coords in iter_frame_blocks(dcd_path, block=block):
        n_atoms_traj = coords.shape[1]
        if n_atoms_traj != structure.n_atoms():
            raise ValueError(
                f"trajectory has {n_atoms_traj} atoms but topology has "
                f"{structure.n_atoms()}"
            )
        frames = [
            (
                np.ascontiguousarray(coords[i][sel.atom_indices]),
                sel.radii,
                sel.group_ids,
            )
            for i in range(coords.shape[0])
        ]
        for i, atom_sasa in enumerate(engine.compute(frames)):
            totals.append(float(atom_sasa.sum()))
            if options.level is Level.RESIDUE:
                res = aggregate(sel, atom_sasa, Level.RESIDUE).residues
                residue_rows.append(
                    np.array([r.value for r in res], dtype=np.float32)
                )

    residue_values = (
        np.stack(residue_rows) if residue_rows else None
    )
    residue_names = (
        [str(n) for n in sel.res_name] if residue_rows else None
    )
    return TrajectoryResult(
        n_frames=len(totals),
        n_atoms=n_atoms_traj or 0,
        totals=np.array(totals, dtype=np.float32),
        residue_values=residue_values,
        residue_names=residue_names,
    )

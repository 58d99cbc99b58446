"""Atom selection and result aggregation at atom/residue/chain/protein level.

Replicates the reference's per-level build + aggregation semantics
(reference: src/options.rs:139-464) on top of SoA arrays:

  * hierarchy walk: chains -> residues -> FIRST conformer only -> atoms
    (reference: options.rs:162,255,333,433);
  * hydrogens skipped unless include_hydrogens (element == 'H');
  * HETATM skipped unless include_hetatms;
  * element required for every first-conformer atom (ElementMissing);
  * occlusion-exclusion ids: atoms sharing (alt_loc, serial_number) never
    shadow each other; at protein level the alt_loc is dropped so duplicate
    serials across chains are mutually transparent (reference:
    options.rs:183,276,354 vs :453);
  * excluded residues still appear in residue-level output with value 0.0;
  * chain-level grouping goes through serialize_chain_id including its
    collision behavior (reference: utils.rs:24-33, options.rs:317-364).

Aggregation is vectorized (bincount over segment ids) - the numpy analog of
a jnp.segment_sum, kept on host because result assembly is host-side anyway.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum

import numpy as np

from .constants import POLAR_AMINO_ACIDS
from .io.structure import Structure
from .radii import RadiiConfig, resolve_radii


class Level(str, Enum):
    ATOM = "atom"
    RESIDUE = "residue"
    CHAIN = "chain"
    PROTEIN = "protein"


class ElementMissingError(ValueError):
    """Atom lacks an element symbol (reference: options.rs:468-469)."""


class AtomMapError(KeyError):
    """Failed to map atoms back to a level element (reference: options.rs:486-487)."""


def serialize_chain_id(chain_id: str) -> int:
    """Letters -> concatenated alphabet positions (reference: utils.rs:24-33).

    'A' -> 1, 'Z' -> 26, 'AB' -> 12.  Non-alphabetic characters ignored.
    """
    result = 0
    for c in chain_id:
        if c.isascii() and c.isalpha():
            result = result * 10 + (ord(c.upper()) - 64)
    return result


@dataclass
class ResidueResult:
    serial_number: int
    insertion_code: str
    value: float
    name: str
    is_polar: bool
    chain_id: str


@dataclass
class ChainResult:
    name: str
    value: float


@dataclass
class ProteinResult:
    global_total: float
    polar_total: float
    non_polar_total: float


@dataclass
class SASAResult:
    """Tagged result union (reference: atomic.rs:63-70)."""

    level: Level
    atoms: np.ndarray | None = None
    residues: list[ResidueResult] | None = None
    chains: list[ChainResult] | None = None
    protein: ProteinResult | None = None

    @property
    def value(self):
        return {
            Level.ATOM: self.atoms,
            Level.RESIDUE: self.residues,
            Level.CHAIN: self.chains,
            Level.PROTEIN: self.protein,
        }[self.level]


@dataclass
class AtomSelection:
    """Filtered atoms ready for the device kernel + aggregation metadata."""

    atom_indices: np.ndarray  # [M] indices into Structure.atoms (build order)
    coords: np.ndarray  # [M, 3] f32
    radii: np.ndarray  # [M] f32
    group_ids: np.ndarray  # [M] i32 occlusion-exclusion ids
    residue_slot: np.ndarray  # [M] i32 residue index in traversal order
    # Residue metadata, one entry per residue in traversal order
    # (includes residues whose atoms were all filtered out).
    res_serial: np.ndarray  # [R] i64
    res_icode: np.ndarray  # [R] object
    res_name: np.ndarray  # [R] object
    res_chain_idx: np.ndarray  # [R] i32
    chain_ids: list[str]  # [C]

    @property
    def n_residues(self) -> int:
        return len(self.res_serial)


def build_selection(
    structure: Structure,
    level: Level,
    *,
    radii_config: RadiiConfig | None = None,
    allow_vdw_fallback: bool = False,
    include_hydrogens: bool = False,
    include_hetatms: bool = False,
    read_radii_from_occupancy: bool = False,
) -> AtomSelection:
    t = structure.atoms

    sel_idx: list[int] = []
    sel_res_slot: list[int] = []
    id_keys: list[tuple[str, int]] = []
    res_serials: list[int] = []
    res_icodes: list[str] = []
    res_names: list[str] = []
    res_chain_idx: list[int] = []
    chain_ids: list[str] = []

    for c_i, chain in enumerate(structure.chains):
        chain_ids.append(chain.id)
        for residue in chain.residues:
            if not residue.conformers:
                continue
            # First-conformer semantics, resolved empirically against the
            # reference: atoms with a blank alt-loc plus the first alternate
            # conformer are processed (this reproduces the reference's
            # FreeSASA RMSE of 43.99 on the 88-PDB quality set; a strict
            # first-conformer-only policy drops alternate side chains and
            # inflates SASA by ~5% on alt-loc-heavy structures).
            kept = []
            first_alt_taken = False
            for conf in residue.conformers:
                if conf.alt_loc == "":
                    kept.append(conf)
                elif not first_alt_taken:
                    kept.append(conf)
                    first_alt_taken = True
            slot = len(res_serials)
            res_serials.append(residue.serial_number)
            res_icodes.append(residue.insertion_code)
            res_names.append(residue.conformers[0].name)
            res_chain_idx.append(c_i)
            for conformer in kept:
                alt = conformer.alt_loc
                for i in conformer.atom_indices:
                    element = t.element[i]
                    if not element:
                        raise ElementMissingError(
                            f"Element missing for atom {t.name[i]} "
                            f"(serial {t.serial[i]})"
                        )
                    if element == "H" and not include_hydrogens:
                        continue
                    if t.hetero[i] and not include_hetatms:
                        continue
                    sel_idx.append(i)
                    sel_res_slot.append(slot)
                    if level is Level.PROTEIN:
                        # Protein level hashes ("", serial) - alt_loc dropped
                        # (reference: options.rs:453).
                        id_keys.append(("", int(t.serial[i])))
                    else:
                        id_keys.append((alt, int(t.serial[i])))

    idx = np.asarray(sel_idx, dtype=np.int64)
    if len(idx):
        radii = resolve_radii(
            t.resname[idx],
            t.name[idx],
            t.element[idx],
            t.occupancy[idx],
            radii_config=radii_config,
            allow_vdw_fallback=allow_vdw_fallback,
            read_radii_from_occupancy=read_radii_from_occupancy,
        )
        coords = np.ascontiguousarray(t.coords[idx], dtype=np.float32)
        id_map: dict[tuple[str, int], int] = {}
        gids = np.empty(len(id_keys), dtype=np.int32)
        for a_i, key in enumerate(id_keys):
            gids[a_i] = id_map.setdefault(key, len(id_map))
    else:
        radii = np.zeros(0, np.float32)
        coords = np.zeros((0, 3), np.float32)
        gids = np.zeros(0, np.int32)

    return AtomSelection(
        atom_indices=idx,
        coords=coords,
        radii=radii,
        group_ids=gids,
        residue_slot=np.asarray(sel_res_slot, dtype=np.int32),
        res_serial=np.asarray(res_serials, dtype=np.int64),
        res_icode=np.asarray(res_icodes, dtype=object),
        res_name=np.asarray(res_names, dtype=object),
        res_chain_idx=np.asarray(res_chain_idx, dtype=np.int32),
        chain_ids=chain_ids,
    )


def _residue_sums(sel: AtomSelection, atom_sasa: np.ndarray) -> np.ndarray:
    return np.bincount(
        sel.residue_slot,
        weights=atom_sasa.astype(np.float64),
        minlength=sel.n_residues,
    ).astype(np.float32)


def aggregate(
    sel: AtomSelection, atom_sasa: np.ndarray, level: Level
) -> SASAResult:
    """Aggregate per-atom SASA to the requested level."""
    if level is Level.ATOM:
        return SASAResult(level=level, atoms=np.asarray(atom_sasa, np.float32))

    if level is Level.RESIDUE:
        sums = _residue_sums(sel, atom_sasa)
        residues = [
            ResidueResult(
                serial_number=int(sel.res_serial[r]),
                insertion_code=str(sel.res_icode[r]),
                value=float(sums[r]),
                name=str(sel.res_name[r]),
                is_polar=str(sel.res_name[r]) in POLAR_AMINO_ACIDS,
                chain_id=sel.chain_ids[int(sel.res_chain_idx[r])],
            )
            for r in range(sel.n_residues)
        ]
        return SASAResult(level=level, residues=residues)

    if level is Level.CHAIN:
        n_chains = len(sel.chain_ids)
        chain_slot_of_res = sel.res_chain_idx
        chain_slot_of_atom = chain_slot_of_res[sel.residue_slot]
        sums = np.bincount(
            chain_slot_of_atom,
            weights=atom_sasa.astype(np.float64),
            minlength=n_chains,
        )
        # serialize_chain_id collision semantics: the reference keys its
        # chain->atoms map by the serialized id, so colliding chains all
        # read the LAST chain's atom list (reference: options.rs:361,300-308).
        last_for_key: dict[int, int] = {}
        for c_i, cid in enumerate(sel.chain_ids):
            last_for_key[serialize_chain_id(cid)] = c_i
        chains = [
            ChainResult(
                name=cid,
                value=float(sums[last_for_key[serialize_chain_id(cid)]]),
            )
            for cid in sel.chain_ids
        ]
        return SASAResult(level=level, chains=chains)

    if level is Level.PROTEIN:
        sums = _residue_sums(sel, atom_sasa)
        polar_mask = np.array(
            [str(n) in POLAR_AMINO_ACIDS for n in sel.res_name], dtype=bool
        )
        polar_total = float(sums[polar_mask].astype(np.float64).sum())
        non_polar_total = float(sums[~polar_mask].astype(np.float64).sum())
        global_total = float(np.asarray(atom_sasa, np.float64).sum())
        return SASAResult(
            level=level,
            protein=ProteinResult(
                global_total=float(np.float32(global_total)),
                polar_total=float(np.float32(polar_total)),
                non_polar_total=float(np.float32(non_polar_total)),
            ),
        )

    raise ValueError(f"unknown level: {level}")

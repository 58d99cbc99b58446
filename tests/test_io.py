"""Serialization and write-back tests (reference: tests/io.rs, src/utils/io.rs)."""

import numpy as np
import pytest

from rustsasa_tpu import SASAOptions, parse_structure
from rustsasa_tpu.io.pdb import parse_pdb, write_pdb
from rustsasa_tpu.io.cif import parse_cif, write_cif
from rustsasa_tpu.io.serialize import (
    SerializationError,
    parse_json_result,
    sasa_result_to_bfactors,
    sasa_result_to_json,
    sasa_result_to_xml,
)
from rustsasa_tpu.levels import (
    ChainResult,
    Level,
    ProteinResult,
    ResidueResult,
    SASAResult,
)

PDB_3ATOMS = """ATOM      1  N   ALA A   1      20.154  16.967  25.000  1.00 10.00           N
ATOM      2  CA  ALA A   1      19.030  16.155  25.000  1.00 15.00           C
ATOM      3  C   ALA A   1      17.948  16.712  25.000  1.00 20.00           C
END
"""

PDB_2RES = """ATOM      1  N   ALA A   1      20.154  16.967  25.000  1.00 10.00           N
ATOM      2  CA  ALA A   1      19.030  16.155  25.000  1.00 15.00           C
ATOM      3  N   GLY A   2      17.948  16.712  25.000  1.00 20.00           N
ATOM      4  CA  GLY A   2      16.500  17.000  25.000  1.00 25.00           C
END
"""

PDB_2CHAINS = """ATOM      1  N   ALA A   1      20.154  16.967  25.000  1.00 10.00           N
ATOM      2  CA  ALA A   1      19.030  16.155  25.000  1.00 15.00           C
ATOM      3  N   GLY B   1      17.948  16.712  25.000  1.00 20.00           N
ATOM      4  CA  GLY B   1      16.500  17.000  25.000  1.00 25.00           C
END
"""


def test_bfactor_writeback_atom():
    s = parse_pdb(PDB_3ATOMS)
    result = SASAResult(
        level=Level.ATOM, atoms=np.array([5.0, 10.0, 15.0], np.float32)
    )
    bf = sasa_result_to_bfactors(s, result)
    np.testing.assert_allclose(bf, [5.0, 10.0, 15.0], atol=1e-3)


def test_bfactor_writeback_residue():
    s = parse_pdb(PDB_2RES)
    result = SASAResult(
        level=Level.RESIDUE,
        residues=[
            ResidueResult(1, "", 100.0, "ALA", False, "A"),
            ResidueResult(2, "", 200.0, "GLY", False, "A"),
        ],
    )
    bf = sasa_result_to_bfactors(s, result)
    np.testing.assert_allclose(bf, [100.0, 100.0, 200.0, 200.0])


def test_bfactor_writeback_residue_serial_mismatch():
    s = parse_pdb(PDB_2RES)
    result = SASAResult(
        level=Level.RESIDUE,
        residues=[
            ResidueResult(9, "", 100.0, "ALA", False, "A"),
            ResidueResult(2, "", 200.0, "GLY", False, "A"),
        ],
    )
    with pytest.raises(SerializationError):
        sasa_result_to_bfactors(s, result)


def test_bfactor_writeback_chain():
    s = parse_pdb(PDB_2CHAINS)
    result = SASAResult(
        level=Level.CHAIN,
        chains=[ChainResult("A", 300.0), ChainResult("B", 400.0)],
    )
    bf = sasa_result_to_bfactors(s, result)
    np.testing.assert_allclose(bf, [300.0, 300.0, 400.0, 400.0])


def test_bfactor_writeback_protein():
    s = parse_pdb(PDB_3ATOMS)
    result = SASAResult(
        level=Level.PROTEIN, protein=ProteinResult(500.0, 200.0, 300.0)
    )
    bf = sasa_result_to_bfactors(s, result)
    np.testing.assert_allclose(bf, [500.0] * 3)


def test_hetatm_excluded_gets_zero_sasa_with_multi_chain():
    """reference: tests/io.rs:164-224 (serial collisions + HETATM zeros)."""
    pdb_content = """ATOM      1  N   ALA A   1       0.000   0.000   0.000  1.00 10.00           N
ATOM      2  CA  ALA A   1       1.458   0.000   0.000  1.00 10.00           C
ATOM      3  N   GLY A   2       3.000   0.000   0.000  1.00 10.00           N
ATOM      4  CA  GLY A   2       4.458   0.000   0.000  1.00 10.00           C
ATOM      5  N   ALA B   1      10.000   0.000   0.000  1.00 10.00           N
ATOM      6  CA  ALA B   1      11.458   0.000   0.000  1.00 10.00           C
HETATM    7  O   HOH A   3       6.000   0.000   0.000  1.00 10.00           O
HETATM    8  O   HOH B   2      13.000   0.000   0.000  1.00 10.00           O
END
"""
    s = parse_pdb(pdb_content)
    result = (
        SASAOptions.residue_level().with_allow_vdw_fallback(True).process(s)
    )
    for res in result.residues:
        if res.name == "HOH":
            assert res.value == 0.0
        else:
            assert res.value > 0.0
    a1 = [r for r in result.residues if r.chain_id == "A" and r.serial_number == 1]
    b1 = [r for r in result.residues if r.chain_id == "B" and r.serial_number == 1]
    assert len(a1) == 1
    assert len(b1) == 1


def test_json_schema_roundtrip():
    result = SASAResult(
        level=Level.RESIDUE,
        residues=[ResidueResult(7, "A", 12.5, "SER", True, "B")],
    )
    text = sasa_result_to_json(result)
    assert (
        text == '{"Residue":[{"serial_number":7,"insertion_code":"A",'
        '"value":12.5,"name":"SER","is_polar":true,"chain_id":"B"}]}'
    )
    back = parse_json_result(text)
    assert back.residues[0].value == 12.5
    assert back.residues[0].is_polar is True


def test_json_atom_and_protein_shapes():
    atom = SASAResult(level=Level.ATOM, atoms=np.array([1.5, 0.0], np.float32))
    assert sasa_result_to_json(atom) == '{"Atom":[1.5,0.0]}'
    prot = SASAResult(
        level=Level.PROTEIN, protein=ProteinResult(500.0, 200.0, 300.0)
    )
    assert (
        sasa_result_to_json(prot)
        == '{"Protein":{"global_total":500.0,"polar_total":200.0,'
        '"non_polar_total":300.0}}'
    )


def test_xml_shapes():
    chain = SASAResult(level=Level.CHAIN, chains=[ChainResult("A", 3.25)])
    assert (
        sasa_result_to_xml(chain)
        == "<Chain><name>A</name><value>3.25</value></Chain>"
    )


def test_pdb_roundtrip_with_bfactors():
    s = parse_pdb(PDB_2RES)
    text = write_pdb(s, np.array([1.0, 2.0, 3.0, 4.0], np.float32))
    s2 = parse_pdb(text)
    np.testing.assert_allclose(s2.atoms.bfactor, [1.0, 2.0, 3.0, 4.0])
    assert list(s2.atoms.name) == ["N", "CA", "N", "CA"]
    np.testing.assert_allclose(s2.atoms.coords, s.atoms.coords, atol=1e-3)


def test_cif_roundtrip_with_bfactors():
    s = parse_pdb(PDB_2CHAINS)
    text = write_cif(s, np.array([1.0, 2.0, 3.0, 4.0], np.float32))
    s2 = parse_cif(text)
    np.testing.assert_allclose(s2.atoms.bfactor, [1.0, 2.0, 3.0, 4.0])
    assert [c.id for c in s2.chains] == ["A", "B"]
    np.testing.assert_allclose(s2.atoms.coords, s.atoms.coords, atol=1e-3)


def test_parse_structure_sniffs_format():
    s = parse_structure(PDB_3ATOMS.encode())
    assert s.format == "pdb"
    assert s.n_atoms() == 3


def test_fast_selection_json_matches_generic():
    from rustsasa_tpu.io.serialize import fast_selection_json
    from rustsasa_tpu.levels import aggregate, build_selection
    from rustsasa_tpu.ops.engine import calculate_sasa_internal
    import json as _json

    s = parse_structure(PDB_2RES.encode())
    for level in (Level.ATOM, Level.RESIDUE, Level.CHAIN, Level.PROTEIN):
        sel = build_selection(s, level)
        sasa = calculate_sasa_internal(
            sel.coords, sel.radii, group_ids=sel.group_ids
        )
        fast = _json.loads(fast_selection_json(sel, sasa, level))
        generic = _json.loads(sasa_result_to_json(aggregate(sel, sasa, level)))
        if level is Level.RESIDUE:
            assert len(fast["Residue"]) == len(generic["Residue"])
            for a, b in zip(fast["Residue"], generic["Residue"]):
                assert a["serial_number"] == b["serial_number"]
                assert a["name"] == b["name"]
                assert a["chain_id"] == b["chain_id"]
                assert a["is_polar"] == b["is_polar"]
                assert abs(a["value"] - b["value"]) < 1e-4
        elif level is Level.ATOM:
            assert np.allclose(fast["Atom"], generic["Atom"], atol=1e-4)
        else:
            assert fast == generic


def test_fast_selection_xml_matches_generic():
    from rustsasa_tpu.io.serialize import fast_selection_xml
    from rustsasa_tpu.levels import aggregate, build_selection
    from rustsasa_tpu.ops.engine import calculate_sasa_internal

    s = parse_structure(PDB_2CHAINS.encode())
    for level in (Level.ATOM, Level.RESIDUE, Level.CHAIN, Level.PROTEIN):
        sel = build_selection(s, level)
        sasa = calculate_sasa_internal(
            sel.coords, sel.radii, group_ids=sel.group_ids
        )
        fast = fast_selection_xml(sel, sasa, level)
        generic = sasa_result_to_xml(aggregate(sel, sasa, level))
        if level in (Level.CHAIN, Level.PROTEIN):
            assert fast == generic
        else:
            # Same tag structure; float renderings differ (%.9g vs shortest)
            import re
            assert re.sub(r">[0-9.eE+-]+<", ">#<", fast) == re.sub(
                r">[0-9.eE+-]+<", ">#<", generic
            )


PDB_2MODELS = """MODEL        1
ATOM      1  N   ALA A   1      20.154  16.967  25.000  1.00 10.00           N
ATOM      2  CA  ALA A   1      19.030  16.155  25.000  1.00 15.00           C
ATOM      3  C   ALA A   1      17.948  16.712  25.000  1.00 20.00           C
ENDMDL
MODEL        2
ATOM      1  N   ALA A   1      20.254  17.067  25.100  1.00 10.00           N
ATOM      2  CA  ALA A   1      19.130  16.255  25.100  1.00 15.00           C
ATOM      3  C   ALA A   1      18.048  16.812  25.100  1.00 20.00           C
ENDMDL
END
"""


def test_multi_model_pdb_keeps_first_model():
    """NMR-style multi-model files: FIRST model only (pinned).

    FreeSASA (the accuracy gold standard of the reference's quality gate)
    computes SASA on the first model; processing all models at once would
    let near-identical copies occlude each other and collapse every SASA
    toward zero.  The reference's corpus has no multi-model fixture and
    its pdbtbx submodule is vendored empty, so its own behavior is
    unverifiable here - divergence (if any) is documented in PARITY.md.
    """
    s = parse_structure(PDB_2MODELS.encode())
    assert s.n_atoms() == 3
    # Model 1 coordinates, not model 2's.
    assert np.isclose(s.atoms.coords[0, 0], 20.154)

    single = parse_structure(PDB_3ATOMS.encode())
    r_multi = SASAOptions(level=Level.PROTEIN).process(s)
    r_single = SASAOptions(level=Level.PROTEIN).process(single)
    assert np.isclose(
        r_multi.protein.global_total, r_single.protein.global_total,
        rtol=1e-5,
    )


def test_multi_model_pdb_native_pipeline(tmp_path):
    from rustsasa_tpu.native import NativeFallback, native_process_file

    p = tmp_path / "nmr.pdb"
    p.write_text(PDB_2MODELS)
    try:
        ns = native_process_file(
            str(p), level="residue", include_hydrogens=False,
            include_hetatms=False, read_radii_from_occupancy=False,
            allow_vdw_fallback=False,
        )
    except NativeFallback:
        pytest.skip("native library unavailable")
    try:
        assert ns.coords.shape[0] == 3
        assert np.isclose(ns.coords[0, 0], 20.154)
    finally:
        ns.close()


def test_bfactor_fast_path_matches_hierarchy_walk(reference_data_dir):
    """The vectorized selection-based write-back must stamp EXACTLY the
    values the checked hierarchy walk produces, at every level, incl.
    multi-chain serial collisions and excluded (H/HETATM) atoms."""
    import numpy as np

    from rustsasa_tpu.api import SASAOptions
    from rustsasa_tpu.io import serialize as ser
    from rustsasa_tpu.io.read import read_structure
    from rustsasa_tpu.levels import Level

    files = [
        reference_data_dir / "pdbs" / "example.cif",
        reference_data_dir / "pdbs" / "151L_H3.pdb",
    ]
    for path in files:
        for level in (Level.RESIDUE, Level.CHAIN, Level.PROTEIN):
            s = read_structure(str(path))
            result, sel = SASAOptions(
                level=level
            ).process_with_selection(s)
            fast = ser.sasa_result_to_bfactors(s, result, selection=sel)
            slow = ser.sasa_result_to_bfactors(s, result, selection=None)
            np.testing.assert_array_equal(fast, slow), (path, level)


def test_nonfinite_structure_rejected(tmp_path):
    """A textual 'nan' coordinate/occupancy parses as a valid float; the
    selection layer must reject it as a per-file typed error in BOTH
    pipelines (downstream it would silently poison wire quantization
    and NaN-asymmetric culling reductions)."""
    import pytest as _pytest

    from rustsasa_tpu.api import SASAOptions
    from rustsasa_tpu.io.read import parse_structure
    from rustsasa_tpu.levels import Level

    pdb = (
        "ATOM      1  N   MET A   1         nan  12.019 -23.063  1.00  0.00"
        "           N\n"
        "ATOM      2  CA  MET A   1      23.269  12.428 -23.398  1.00  0.00"
        "           C\n"
    )
    st = parse_structure(pdb, path="nan.pdb")
    with _pytest.raises(ValueError, match="non-finite"):
        SASAOptions(level=Level.RESIDUE).build_selection(st)

    # Native pipeline: same typed rejection.
    from rustsasa_tpu.native import native_process_file, pipe_library

    if pipe_library() is not None:
        p = tmp_path / "nan.pdb"
        p.write_text(pdb)
        with _pytest.raises(ValueError, match="non-finite"):
            native_process_file(
                str(p), level="residue", include_hydrogens=False,
                include_hetatms=False, read_radii_from_occupancy=False,
                allow_vdw_fallback=False,
            )

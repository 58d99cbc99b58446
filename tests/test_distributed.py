"""Multi-process distributed batch test: 2 real processes, CPU backend.

Spawns two worker processes that initialize jax.distributed against a
local coordinator, shard a small corpus round-robin, process their shards
through the full batch pipeline, and all-reduce the run metrics.  Both
workers must report the SAME global totals, every input must be covered
exactly once, and total_area must be a real (non-zero) global sum.
"""

import json
import os
import shutil
import socket
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_process_directory_distributed_two_processes(
    reference_data_dir, tmp_path
):
    # Small corpus: a few real structures.
    src = reference_data_dir / "pdbs"
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    names = []
    for fname in ("example.cif", "bad_seqadv_1A06.pdb", "151L_H3.pdb"):
        path = src / fname
        if path.exists():
            shutil.copy(path, input_dir / fname)
            names.append(fname)
    assert len(names) >= 2

    out_dir = tmp_path / "out"
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)

    procs = []
    report_paths = []
    for pid in range(2):
        rp = tmp_path / f"report_{pid}.json"
        report_paths.append(rp)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, WORKER, coord, "2", str(pid),
                    str(input_dir), str(out_dir), str(rp),
                ],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
            )
        )
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]

    reports = [json.loads(rp.read_text()) for rp in report_paths]
    # Both processes observed the distributed world.
    for r in reports:
        assert r["process_count"] == 2
    assert {r["process_index"] for r in reports} == {0, 1}
    # All-reduced metrics agree across processes and cover the corpus.
    assert reports[0]["n_files"] == reports[1]["n_files"] == len(names)
    assert reports[0]["n_ok"] == reports[1]["n_ok"] == len(names)
    assert reports[0]["n_errors"] == 0
    assert reports[0]["total_area"] > 0.0
    assert (
        abs(reports[0]["total_area"] - reports[1]["total_area"])
        <= 1e-3 * reports[0]["total_area"]
    )
    # Every input produced exactly one output file (across both shards).
    produced = sorted(os.listdir(out_dir))
    assert produced == sorted(
        os.path.splitext(n)[0] + ".json" for n in names
    )

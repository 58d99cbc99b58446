"""Direct timing of fused_sasa on real packed corpus data.

Packs a slice of the bench corpus exactly like the engine does, then times
the pallas_call alone (device-only, warm) and reports cycles/j-atom-iter
so kernel changes can be compared against the VPU floor (~8-20 cycles).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from rustsasa_tpu.utils.jax_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from rustsasa_tpu.api import SASAOptions  # noqa: E402
from rustsasa_tpu.io.read import read_structure  # noqa: E402
from rustsasa_tpu.levels import Level  # noqa: E402
from rustsasa_tpu.ops import fused_kernel  # noqa: E402
from rustsasa_tpu.ops.engine import _round_bucket, _sphere_packed, _FUSED_M_BUCKETS  # noqa: E402

CORPUS = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rustsasa_tpu_bench_corpus"
LIMIT = int(sys.argv[2]) if len(sys.argv) > 2 else 512

files = sorted(os.path.join(CORPUS, f) for f in os.listdir(CORPUS))[:LIMIT]
options = SASAOptions(level=Level.RESIDUE)
triples = []
for f in files:
    sel = options.build_selection(read_structure(f))
    triples.append((sel.coords, sel.radii, sel.group_ids))
n_atoms = sum(t[0].shape[0] for t in triples)

t0 = time.time()
planes, jlist, offsets, failed = fused_kernel.pack_structures(
    triples, 1.4, 100
)
print(f"pack {time.time()-t0:.2f}s  failed={len(failed)}", flush=True)

m = planes.shape[1]
m_pad = _round_bucket(m, _FUSED_M_BUCKETS)
planes = np.pad(planes, ((0, 0), (0, m_pad - m)))
jlist = np.pad(jlist, ((0, (m_pad - m) // fused_kernel.ATOM_TILE), (0, 0)))

tiles = m // fused_kernel.ATOM_TILE
jiters = int(jlist[:, 0].sum()) * fused_kernel.ATOM_TILE
print(
    f"{len(files)} files, {n_atoms} atoms, {tiles} tiles (pad {m_pad}), "
    f"avg j-tiles/i-tile {jlist[:tiles, 0].mean():.1f}, "
    f"{jiters/1e6:.1f}M j-iters",
    flush=True,
)

sphere_packed = _sphere_packed(100)
sphere128 = np.zeros((sphere_packed.shape[0], 128), dtype=np.float32)
sphere128[:, 0:4] = sphere_packed

# Distinct input VALUES per repetition: the axon tunnel memoizes repeated
# identical (executable, args) calls, so warm timings on the same buffers
# read ~0ms.  A 1e-5 A coordinate jitter changes nothing about the work.
variants = []
for rep in range(4):
    p = planes.copy()
    p[0:3, :] += np.float32(1e-5 * rep)
    variants.append(jax.device_put(p))
jlist_d = jax.device_put(jlist)
sphere_d = jax.device_put(sphere128)

t0 = time.time()
out = np.asarray(
    fused_kernel.fused_sasa(variants[0], jlist_d, sphere_d, n_points=100)
)
print(f"first call (compile?) {time.time()-t0:.2f}s  total={out.sum():.1f}",
      flush=True)

times = []
for rep in range(1, 4):
    t0 = time.time()
    out = np.asarray(
        fused_kernel.fused_sasa(variants[rep], jlist_d, sphere_d, n_points=100)
    )
    times.append(time.time() - t0)
best = min(times)
print(
    f"warm {best*1000:.1f}ms -> {best/jiters*1e9:.0f} ns/j-iter "
    f"({best/jiters*940e6:.0f} cycles), "
    f"{n_atoms/best/1e6:.2f} Matoms/s device-only",
    flush=True,
)

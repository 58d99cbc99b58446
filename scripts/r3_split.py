"""Decisive split: is the proteome bench wire-bound or compute-bound?

On this axon backend block_until_ready does NOT wait for execution; only a
real device->host readback synchronizes.  Every phase below is therefore
timed with a readback of a tiny (or the real) output so queues are drained
inside the measured window, and a sync precedes every timer start.
"""
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, "/root/repo")
from rustsasa_tpu.utils.jax_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from rustsasa_tpu.native import native_process_file  # noqa: E402
from rustsasa_tpu.ops import fused_kernel  # noqa: E402
from rustsasa_tpu.ops.engine import _sphere_packed  # noqa: E402

CORPUS = "/tmp/rustsasa_tpu_bench_corpus"
M_PAD = 2097152


@jax.jit
def _tiny(x):
    return x * 1.0


def sync():
    """Drain the device queue: enqueue a trivial op and read it back."""
    np.asarray(_tiny(np.zeros(8, np.float32)))


def jentry(e):
    """Decode a u32 jlist entry -> (tile_id, group_mask)."""
    return int(e) & 0xFFFF, (int(e) >> 16) & 0xFFFF


files = sorted(os.listdir(CORPUS))[:900]
pool = ThreadPoolExecutor(max_workers=4)


def load(path):
    return native_process_file(
        os.path.join(CORPUS, path), level="residue", include_hydrogens=False,
        include_hetatms=False, read_radii_from_occupancy=False,
        allow_vdw_fallback=False,
    )


handles = list(pool.map(load, files))
triples = [(h.coords, h.radii, h.gids) for h in handles]
n_atoms = sum(t[0].shape[0] for t in triples)
planes, jlist, offsets, failed = fused_kernel.pack_structures(triples, 1.4, 100)
m = planes.shape[1]
print(f"{len(files)} files, {n_atoms} atoms, M={m}", flush=True)

planes_p = np.pad(planes, ((0, 0), (0, M_PAD - m)))
jlist_p = np.pad(jlist, ((0, (M_PAD - m) // 128), (0, 0)))
sphere = np.zeros((104, 128), np.float32)
sphere[:, 0:4] = _sphere_packed(100)

t0 = time.time()
sync()
print(f"tiny op first (incl. device init): {time.time()-t0:.1f}s", flush=True)

# f16 output = exactly the production bench shape/dtype.
t0 = time.time()
out = fused_kernel.fused_sasa(planes_p, jlist_p, sphere, n_points=100,
                              out_dtype=jnp.float16)
res = np.asarray(out)
print(f"first call+readback (warm disk cache): {time.time()-t0:.1f}s", flush=True)

for r in range(3):
    t0 = time.perf_counter()
    out = fused_kernel.fused_sasa(planes_p, jlist_p, sphere, n_points=100,
                                  out_dtype=jnp.float16)
    res = np.asarray(out)
    t_e2e = time.perf_counter() - t0
    print(f"warm e2e (xfer+kernel+readback) run{r}: {t_e2e*1e3:.0f}ms "
          f"-> {n_atoms/t_e2e/1e6:.2f} Matoms/s", flush=True)

# transfer-only, synced
sync()
t0 = time.perf_counter()
d_planes = jax.device_put(planes_p)
d_jlist = jax.device_put(jlist_p)
d_sphere = jax.device_put(sphere)
sync()
t_h2d = time.perf_counter() - t0
mb = (planes_p.nbytes + jlist_p.nbytes + sphere.nbytes) / 1e6
print(f"h2d only (synced): {t_h2d*1e3:.0f}ms for {mb:.0f}MB = {mb/t_h2d:.0f}MB/s",
      flush=True)

# kernel-only on resident data, synced via tiny readback of the output
for r in range(3):
    sync()
    t0 = time.perf_counter()
    out = fused_kernel.fused_sasa(d_planes, d_jlist, d_sphere, n_points=100,
                                  out_dtype=jnp.float16)
    _ = np.asarray(out[0:8])  # tiny slice readback still syncs the kernel
    t_k = time.perf_counter() - t0
    print(f"kernel-only+tiny-readback run{r}: {t_k*1e3:.0f}ms "
          f"-> {n_atoms/t_k/1e6:.2f} Matoms/s", flush=True)

sync()
t0 = time.perf_counter()
full = np.asarray(out)
t_d2h = time.perf_counter() - t0
print(f"d2h readback (synced queue): {t_d2h*1e3:.0f}ms for {full.nbytes/1e6:.1f}MB "
      f"= {full.nbytes/1e6/t_d2h:.1f}MB/s", flush=True)

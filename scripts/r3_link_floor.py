"""Measure the raw TPU link characteristics of this deployment.

CAVEAT THAT INVALIDATED THE FIRST VERSION: on this axon backend
`jax.block_until_ready` does NOT wait for execution; only a real
device->host readback synchronizes.  Every timing below syncs by reading
back (a slice of) the result inside the measured window.

Numbers produced:
  - dispatch floor: warm round-trip of a trivial jitted op + readback
    (the minimum achievable single-call latency through this link);
  - h2d / d2h sustained bandwidth (readback-synced);
  - warm production fused call at the single-protein bucket (M=8192).
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
from rustsasa_tpu.utils.jax_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import numpy as np  # noqa: E402

dev = jax.devices()[0]
print(f"device: {dev}", flush=True)
out = {}


@jax.jit
def trivial(x):
    return x + 1.0


x_small = np.zeros(8, np.float32)
t0 = time.time()
np.asarray(trivial(x_small))
print(f"trivial first call (compile): {time.time()-t0:.3f}s", flush=True)
times = []
for _ in range(30):
    t0 = time.perf_counter()
    np.asarray(trivial(x_small))  # readback = the only real sync
    times.append(time.perf_counter() - t0)
times.sort()
out["dispatch_floor_median_ms"] = round(times[15] * 1e3, 2)
out["dispatch_floor_min_ms"] = round(times[0] * 1e3, 2)
print(
    f"dispatch floor (trivial op + readback): median {times[15]*1e3:.2f}ms "
    f"min {times[0]*1e3:.2f}ms",
    flush=True,
)

rng = np.random.default_rng(0)
for mb in (16, 64):
    buf = rng.random((mb * 1024 * 1024 // 4,)).astype(np.float32)
    d = jax.device_put(buf)
    np.asarray(d[0:8])  # drain
    t0 = time.perf_counter()
    d = jax.device_put(buf)
    np.asarray(d[0:8])  # tiny readback forces the transfer to complete
    h2d = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = np.asarray(d)
    d2h = time.perf_counter() - t0
    out[f"h2d_{mb}mb_mbps"] = round(mb / h2d, 1)
    out[f"d2h_{mb}mb_mbps"] = round(mb / d2h, 1)
    print(
        f"{mb:4d}MB  h2d {mb/h2d:7.1f} MB/s ({h2d*1e3:7.1f}ms)   "
        f"d2h {mb/d2h:7.1f} MB/s ({d2h*1e3:7.1f}ms)",
        flush=True,
    )

# Production banded fused call at the single-protein bucket.
from rustsasa_tpu.ops import engine, fused_kernel  # noqa: E402

n = 2622
coords = (rng.random((n, 3)) * 40).astype(np.float32)
radii = np.full(n, 1.7, np.float32)
gids = np.arange(n, dtype=np.int32)
sphere = engine._sphere128_device(100)
packed = fused_kernel.pack_structures_q16([(coords, radii, gids)], 1.4)
planes4, tparams, tmeta, offsets = packed
m = planes4.shape[1]
m_pad = engine._round_bucket(m, engine._FUSED_M_BUCKETS)
planes4 = np.pad(planes4, ((0, 0), (0, m_pad - m)))
pad_t = (m_pad - m) // 128
tparams = np.pad(tparams, ((0, pad_t), (0, 0)))
tmeta = np.pad(tmeta, ((0, pad_t), (0, 0)))
t0 = time.time()
np.asarray(fused_kernel.fused_sasa_q16_banded(
    planes4, tparams, tmeta, sphere, n_points=100, w=32))
print(f"fused banded first call (M={m_pad}, warm cache): {time.time()-t0:.1f}s",
      flush=True)
times = []
for _ in range(10):
    planes4 = planes4.copy()  # defeat memoization
    t0 = time.perf_counter()
    np.asarray(fused_kernel.fused_sasa_q16_banded(
        planes4, tparams, tmeta, sphere, n_points=100, w=32))
    times.append(time.perf_counter() - t0)
times.sort()
out["fused_single_protein_device_median_ms"] = round(times[5] * 1e3, 1)
print(
    f"fused banded warm (2622 atoms, M={m_pad}): median {times[5]*1e3:.1f}ms "
    f"min {times[0]*1e3:.1f}ms",
    flush=True,
)
print(json.dumps(out))

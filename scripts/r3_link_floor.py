"""Measure the raw TPU link characteristics of this deployment.

Numbers needed before any latency/throughput optimization:
  - dispatch floor: warm round-trip of a trivial jitted op (the minimum
    achievable single-call latency through this host<->TPU link);
  - host->device bandwidth (large device_put);
  - device->host bandwidth (large readback);
  - first-call time of the production fused kernel with a WARM persistent
    cache (does the Mosaic compile actually hit the cache?).
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from rustsasa_tpu.utils.jax_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

dev = jax.devices()[0]
print(f"device: {dev}", flush=True)


@jax.jit
def trivial(x):
    return x + 1.0


x_small = np.zeros(8, np.float32)
t0 = time.time()
jax.block_until_ready(trivial(x_small))
print(f"trivial first call (compile): {time.time()-t0:.3f}s", flush=True)
times = []
for _ in range(30):
    t0 = time.perf_counter()
    jax.block_until_ready(trivial(x_small))
    times.append(time.perf_counter() - t0)
times.sort()
print(
    f"dispatch floor (trivial op round-trip): median {times[15]*1e3:.2f}ms "
    f"min {times[0]*1e3:.2f}ms",
    flush=True,
)

# Pipelined dispatch: N calls enqueued, one sync at the end.
t0 = time.perf_counter()
ys = [trivial(x_small) for _ in range(50)]
jax.block_until_ready(ys)
print(f"50 async trivial calls, 1 sync: {(time.perf_counter()-t0)*1e3:.1f}ms "
      f"({(time.perf_counter()-t0)*20:.2f}ms/call)", flush=True)

for mb in (16, 64, 256):
    buf = np.random.default_rng(0).random((mb * 1024 * 1024 // 4,)).astype(np.float32)
    jax.block_until_ready(jax.device_put(buf))  # warm path
    t0 = time.perf_counter()
    d = jax.device_put(buf)
    jax.block_until_ready(d)
    h2d = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = np.asarray(d)
    d2h = time.perf_counter() - t0
    print(
        f"{mb:4d}MB  h2d {mb/h2d:7.1f} MB/s ({h2d*1e3:7.1f}ms)   "
        f"d2h {mb/d2h:7.1f} MB/s ({d2h*1e3:7.1f}ms)",
        flush=True,
    )

# Production fused kernel, first call with warm persistent cache.
from rustsasa_tpu.ops import fused_kernel  # noqa: E402

rng = np.random.default_rng(2)
n = 8192 - 64
coords = (rng.random((n, 3)) * 40).astype(np.float32)
radii = np.full(n, 1.7, np.float32)
gids = np.arange(n, dtype=np.int32)
planes, jlist, offsets, failed = fused_kernel.pack_structures(
    [(coords, radii, gids)], 1.4, 100
)
m = planes.shape[1]
m_pad = 8192
planes = np.pad(planes, ((0, 0), (0, m_pad - m)))
jlist = np.pad(jlist, ((0, (m_pad - m) // 128), (0, 0)))
sphere = np.zeros((104, 128), np.float32)
from rustsasa_tpu.ops.engine import _sphere_packed  # noqa: E402

sphere[:, 0:4] = _sphere_packed(100)
t0 = time.time()
out = fused_kernel.fused_sasa(planes, jlist, sphere, n_points=100)
jax.block_until_ready(out)
print(f"fused first call (M=8192, warm disk cache): {time.time()-t0:.1f}s",
      flush=True)
t0 = time.perf_counter()
out = fused_kernel.fused_sasa(planes, jlist, sphere, n_points=100)
jax.block_until_ready(out)
print(f"fused warm call: {(time.perf_counter()-t0)*1e3:.1f}ms", flush=True)

"""Precompile the fused-kernel shape buckets into the persistent cache
and report warm throughput per bucket."""
import sys
sys.path.insert(0, "/root/repo")
from rustsasa_tpu.utils.jax_cache import enable_persistent_cache
enable_persistent_cache()
import time
import numpy as np
import rustsasa_tpu.ops.engine as E

rng = np.random.default_rng(0)

def protein_like(n):
    side = (n / 0.1) ** (1 / 3)
    c = rng.uniform(0, side, (n, 3)).astype(np.float32)
    r = rng.uniform(1.4, 1.9, n).astype(np.float32)
    return c, r, None

eng = E.BatchedSasaEngine(E.SasaParams(), backend="fused")
for m in E._FUSED_M_BUCKETS:
    # Fill the bucket with 2048-atom protein-density structures.
    count = max(1, m // 2048)
    structures = [protein_like(2000) for _ in range(count)]
    t0 = time.time()
    outs = eng.compute(structures)
    print(f"bucket {m}: compiled+ran in {time.time()-t0:.1f}s", flush=True)
    for _ in range(2):
        t0 = time.time()
        outs = eng.compute(structures)
        el = time.time() - t0
        atoms = count * 2000
        print(
            f"bucket {m}: warm {el*1000:.0f}ms for {atoms} atoms "
            f"-> {atoms/el/1e6:.2f} Matoms/s",
            flush=True,
        )

# Wider band buckets (w=64 / w=127): chunks containing a structure of
# 33-64 / 65-127 tiles compile separate (M, w) variants.  The first two
# rows are the SINGLE-FILE CLI shapes: one 33-64-tile file lands in the
# 8192 bucket at w=64, one 65-127-tile file in 32768 at w=127.
for m, big_n in [(8192, 5000), (32768, 12000),
                 (32768, 8000), (131072, 8000), (524288, 8000),
                 (2097152, 8000), (4194304, 8000),
                 (131072, 16000), (2097152, 16000), (4194304, 16000)]:
    structures = [protein_like(big_n)]
    structures += [
        protein_like(2000)
        for _ in range(max(0, (m - 2 * big_n) // 2048))
    ]
    t0 = time.time()
    eng.compute(structures)
    print(
        f"bucket {m} w-band({big_n} atoms): compiled+ran in "
        f"{time.time()-t0:.1f}s",
        flush=True,
    )

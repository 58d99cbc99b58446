import sys, os; sys.path.insert(0, "/root/repo")
from rustsasa_tpu.utils.jax_cache import enable_persistent_cache
enable_persistent_cache()
import time, numpy as np
from rustsasa_tpu.ops.engine import BatchedSasaEngine, SasaParams, _FUSED_M_BUCKETS

rng = np.random.default_rng(0)
eng = BatchedSasaEngine(SasaParams(), backend='fused')
for m in _FUSED_M_BUCKETS:
    n = max(m // 2, 256)
    side = (n / 0.1) ** (1/3)
    c = rng.uniform(0, side, (n, 3)).astype(np.float32)
    r = rng.uniform(1.4, 1.9, n).astype(np.float32)
    t0 = time.time()
    out = eng.compute([(c, r, None)])
    print(f'bucket {m}: compiled+ran in {time.time()-t0:.1f}s, sum={out[0].sum():.0f}', flush=True)
    t0 = time.time()
    out = eng.compute([(c, r, None)])
    print(f'bucket {m}: warm {time.time()-t0:.2f}s for {n} atoms -> {n/(time.time()-t0)/1e6:.2f} Matoms/s', flush=True)

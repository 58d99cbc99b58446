"""Round-3 kernel study #2/#3: cut the per-executed-j op count via MXU.

The production inner loop spends 7 [P,A] vector ops per streamed j-atom
(3 mul + 2 add for dot(s, v), sub, max).  The margin decomposes as

  margin_ij(p) = lim_ij - dot(s_p, c_i) + dot(s_p, c_j)
               = (LIMT[j, i] + TJ[p, j]) - SXI[p, i]

where LIMT (per tile-pair, [A_j, A_i]) and TJ ([P, A_j]) and SXI (per
i-tile, [P, A_i]) all come off the MXU (K=3 contractions - nearly free,
and the MXU is otherwise idle).  SXI is j-independent, so it hoists out
of the max:  occ_pre = max_j (LIMT[j,:] + TJ[:,j]);  occluded iff
occ_pre > SXI.  The inner loop is then ~3 wide ops per j... IF the
per-j column extraction of TJ is cheap.

Variants measured (results recorded in ops/fused_kernel.py docstring):
  mp_rot:    glist compaction + one dynamic lane-roll of TJ per group,
             static column extracts.  MEASURED 1.90 vs base 3.05
             Matoms/s - dynamic roll + VMEM round-trips lose.
  mp_static: NO glist; 16 static 8-atom groups each guarded by
             pl.when(mask bit), occlusion accumulated in VMEM scratch.
             All TJ/LIMT slices are static.  Costs: ~16 conds/pair +
             a [P,A] VMEM RMW per admitted group.

Outputs are compared against the production kernel (count deltas; the
matmul decomposition reorders f32 arithmetic, so boundary points may
flip - deltas must stay tiny and rare).
"""
import functools
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
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from rustsasa_tpu.native import native_process_file  # noqa: E402
from rustsasa_tpu.ops import fused_kernel as fk  # noqa: E402

ATOM_TILE = 128
JLIST_ROWS = 128
_NEG_BIG = np.float32(-1e30)
M_PAD = 2097152
CORPUS = "/tmp/rustsasa_tpu_bench_corpus"
HI = jax.lax.Precision.HIGHEST


@jax.jit
def _tiny(x):
    return x * 1.0


def sync():
    np.asarray(_tiny(np.zeros(8, np.float32)))


def mp_static_kernel(sphere_ref, planes_i_ref, jlist_ref, planes_t_hbm_ref,
                     out_ref, jbuf, occ_buf, sems):
    a = planes_i_ref.shape[1]
    p = sphere_ref.shape[0]
    ci = planes_i_ref[0:3, :]  # [3, A]
    reffi = planes_i_ref[3:4, :]
    gidi = planes_i_ref[4:5, :]
    r2i = reffi * reffi
    inv2ri = 0.5 / jnp.maximum(reffi, 1e-6)
    s3 = sphere_ref[:, 0:3]  # [P, 3]
    sxi = jax.lax.dot_general(
        s3, ci, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=HI,
    )  # [P, A]
    ci2 = jnp.sum(ci * ci, axis=0, keepdims=True)  # [1, A]

    occ_buf[...] = jnp.full((p, a), _NEG_BIG)

    jrow = jax.lax.rem(pl.program_id(0), 8)
    cnt = jlist_ref[jrow, 0]

    def start_dma(slot, idx):
        entry = jlist_ref[jrow, idx + 1]
        j = jax.lax.bitwise_and(entry, 0xFFFF)
        return pltpu.make_async_copy(
            planes_t_hbm_ref.at[pl.ds(j * a, a), :],
            jbuf.at[pl.ds(slot * a, a), :],
            sems.at[slot],
        )

    @pl.when(cnt > 0)
    def _():
        start_dma(0, 0).start()

    def process(idx, carry):
        slot = jax.lax.rem(idx, 2)

        @pl.when(idx + 1 < cnt)
        def _():
            start_dma(1 - slot, idx + 1).start()

        entry = jlist_ref[jrow, idx + 1]
        mask = jax.lax.shift_right_logical(entry, 16)
        start_dma(slot, idx).wait()
        base = slot * a
        rows = jbuf[pl.ds(base, a), :]  # [A_j, 128]
        cj = rows[:, 0:3]
        rj = rows[:, 3:4]
        gk = rows[:, 4:5]
        cj2 = jnp.sum(cj * cj, axis=1, keepdims=True)  # [A_j, 1]
        cji = jax.lax.dot_general(
            cj, ci, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI,
        )  # [A_j, A_i]
        v2t = cj2 - 2.0 * cji + ci2
        limt = (rj * rj - v2t - r2i) * inv2ri
        limt = jnp.where((gidi == gk) | (gk == 0.0), _NEG_BIG, limt)
        tj = jax.lax.dot_general(
            s3, cj, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI,
        )  # [P, A_j]

        for g in range(16):
            @pl.when(jax.lax.bitwise_and(
                jax.lax.shift_right_logical(mask, g), 1) == 1)
            def _(g=g):
                acc = occ_buf[...]
                for r in range(8):
                    c = g * 8 + r
                    acc = jnp.maximum(
                        acc, limt[c:c + 1, :] + tj[:, c:c + 1]
                    )
                occ_buf[...] = acc
        return carry

    jax.lax.fori_loop(0, cnt, process, jnp.int32(0))
    occ = occ_buf[...] - sxi
    pv = sphere_ref[:, 3:4] * jnp.ones((1, a), dtype=jnp.float32)
    out_ref[...] = jnp.sum(
        jnp.where((occ <= 0.0) & (pv > 0.0), 1.0, 0.0),
        axis=0, keepdims=True,
    )


@functools.partial(jax.jit, static_argnames=("variant",))
def run_variant(planes, jlist, sphere128, *, variant):
    m = planes.shape[1]
    if variant == "base":
        return fk._counts_call(planes, jlist, sphere128, interpret=False)
    planes_t = jnp.zeros((m, 128), dtype=jnp.float32)
    planes_t = planes_t.at[:, 0:fk.N_PLANES].set(planes.T)
    t = m // ATOM_TILE
    p = sphere128.shape[0]
    t_pad = ((t + 7) // 8) * 8
    if jlist.shape[0] != t_pad:
        jlist = jnp.pad(jlist, ((0, t_pad - jlist.shape[0]), (0, 0)))
    return pl.pallas_call(
        mp_static_kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((p, 128), lambda i: (0, 0)),
            pl.BlockSpec((fk.N_PLANES, ATOM_TILE), lambda i: (0, i)),
            pl.BlockSpec((8, JLIST_ROWS), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, ATOM_TILE), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((1, m), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * ATOM_TILE, 128), jnp.float32),
            pltpu.VMEM((p, ATOM_TILE), jnp.float32),  # occ accumulator
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(sphere128, planes, jlist, planes_t)


def main():
    files = sorted(os.listdir(CORPUS))[:800]
    pool = ThreadPoolExecutor(max_workers=4)

    def load(path):
        return native_process_file(
            os.path.join(CORPUS, path), level="residue",
            include_hydrogens=False, include_hetatms=False,
            read_radii_from_occupancy=False, allow_vdw_fallback=False,
        )

    handles = list(pool.map(load, files))
    triples = [(h.coords, h.radii, h.gids) for h in handles]
    n_atoms = sum(t[0].shape[0] for t in triples)
    planes4, tparams, tmeta, offsets = fk.pack_structures_q16(triples, 1.4)
    m = planes4.shape[1]
    q = planes4.astype(np.float32)
    par = np.repeat(tparams, 128, axis=0)
    planes = np.zeros((8, M_PAD), np.float32)
    planes[0, :m] = q[0] * par[:, 3] + par[:, 0]
    planes[1, :m] = q[1] * par[:, 3] + par[:, 1]
    planes[2, :m] = q[2] * par[:, 3] + par[:, 2]
    planes[3, :m] = q[3] * np.float32(1.0 / fk.R_QUANT)
    qvalid = planes[3] > 0
    planes[4, :m] = np.where(
        qvalid[:m], np.arange(m, dtype=np.float32) + 1.0, 0.0
    )
    tmeta_p = np.zeros((M_PAD // 128, 2), np.int32)
    tmeta_p[: m // 128] = tmeta

    jl = jax.jit(
        lambda p_, v_, t_: fk.build_jlist_banded(p_, v_, t_, w=32)
    )(planes, qvalid, tmeta_p)
    d_planes = jax.device_put(planes)
    d_jlist = jax.device_put(jl)
    sphere = np.zeros((104, 128), np.float32)
    from rustsasa_tpu.ops.engine import _sphere_packed

    sphere[:, 0:4] = _sphere_packed(100)
    d_sphere = jax.device_put(sphere)
    print(f"{len(files)} files, {n_atoms} atoms, M={M_PAD}", flush=True)
    sync()

    ref = None
    for variant in ("base", "mp_static", "base", "mp_static"):
        t0 = time.time()
        out = run_variant(d_planes, d_jlist, d_sphere, variant=variant)
        counts = np.asarray(out)
        t_first = time.time() - t0
        times = []
        for _ in range(3):
            sync()
            t0 = time.perf_counter()
            out = run_variant(d_planes, d_jlist, d_sphere, variant=variant)
            _ = np.asarray(out[0, 0:8])
            times.append(time.perf_counter() - t0)
        tbest = min(times)
        if ref is None:
            ref = counts
            dmax = dmean = 0.0
        else:
            d = np.abs(counts - ref)
            dmax, dmean = float(d.max()), float(d.mean())
        print(
            f"{variant:10s} first {t_first:6.1f}s  warm {tbest*1e3:7.1f}ms "
            f" {n_atoms/tbest/1e6:6.2f} Matoms/s  max|dc|={dmax:.1f} "
            f"mean|dc|={dmean:.5f}",
            flush=True,
        )


if __name__ == "__main__":
    main()

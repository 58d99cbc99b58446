"""Round-4 kernel study: tile-level occlusion-saturation skip.

Round 3 established that PER-GROUP conds (one per 8 j-atoms, ~150 vector
ops) lose to branchless streaming.  This study tests a 16x coarser guard:
once every point of every atom in the i-tile is occluded (margin > 0
everywhere), the remaining j-tiles of its list cannot change the result -
skip them.  One saturation check per J-TILE (~1,100 vector ops of work
guarded by ~30 ops of check), so the cond amortizes where the group conds
could not.  Interior tiles saturate early thanks to the nearest-first
j-list order; surface tiles never saturate and pay only the check.

Exactness: a skipped update can only re-occlude already-occluded points,
so counts are BIT-IDENTICAL to the production kernel (asserted below).

Variants:
  prod         : the production kernel verbatim (reference timing)
  tilesat_vmem : occ accumulator in VMEM scratch; pl.when skips the whole
                 j-tile body (DMA + compaction + stream) once saturated
  tilesat_cond : occ carried in registers; lax.cond per j-tile
  satNN        : tilesat_vmem but checking every 2nd/4th tile

Pad point rows (n_points..P) start pre-saturated (+1) so they cannot
block the check; pad ATOM lanes keep -BIG margins, so only a structure's
final tile is check-exempt.
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
from rustsasa_tpu.ops import fused_kernel  # noqa: E402
from rustsasa_tpu.ops.engine import _sphere_packed  # noqa: E402

ATOM_TILE = 128
JLIST_ROWS = 128
GROUPS_PER_TILE = 16
J_GROUP = 8
_NEG_BIG = np.float32(-1e30)
M_PAD = 2097152
CORPUS = "/tmp/rustsasa_tpu_bench_corpus"


@jax.jit
def _tiny(x):
    return x * 1.0


def sync():
    np.asarray(_tiny(np.zeros(8, np.float32)))


def make_kernel(variant, check_every=1):
    vmem_occ = variant.startswith("tilesat_vmem") or variant.startswith("sat")

    def kern(
        sphere_ref, planes_i_ref, jlist_ref, planes_t_hbm_ref,
        out_ref, jbuf, sphere_b, glist_ref, occ_ref, done_ref, sems,
    ):
        a = planes_i_ref.shape[1]
        p = sphere_ref.shape[0]
        xi = planes_i_ref[0:1, :]
        yi = planes_i_ref[1:2, :]
        zi = planes_i_ref[2:3, :]
        reffi = planes_i_ref[3:4, :]
        gidi = planes_i_ref[4:5, :]
        r2i = reffi * reffi
        inv2ri = 0.5 / jnp.maximum(reffi, 1e-6)

        ones_a = jnp.ones((1, a), dtype=jnp.float32)
        sphere_b[0] = sphere_ref[:, 0:1] * ones_a
        sphere_b[1] = sphere_ref[:, 1:2] * ones_a
        sphere_b[2] = sphere_ref[:, 2:3] * ones_a

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

        # Pad point rows start saturated so they can't block the check.
        pv_col = sphere_ref[:, 3:4]  # [P, 1]
        occ_init = jnp.where(
            pv_col * ones_a > 0.0, jnp.float32(_NEG_BIG), jnp.float32(1.0)
        )

        def stream_tile(idx, occ):
            """DMA wait + group compaction + branchless stream of tile idx."""
            slot = jax.lax.rem(idx, 2)
            entry = jlist_ref[jrow, idx + 1]
            mask = jax.lax.shift_right_logical(entry, 16)
            pos = jnp.int32(0)
            for g in range(GROUPS_PER_TILE):
                glist_ref[pos] = jnp.int32(g)
                pos = pos + jax.lax.bitwise_and(
                    jax.lax.shift_right_logical(mask, g), 1
                )

            start_dma(slot, idx).wait()
            base = slot * a

            def kgroup(k, occ):
                g = glist_ref[k]
                rows = jbuf[pl.ds(base + g * J_GROUP, J_GROUP), :]
                xk = rows[:, 0:1]
                yk = rows[:, 1:2]
                zk = rows[:, 2:3]
                rk = rows[:, 3:4]
                gk = rows[:, 4:5]
                vxg = xi - xk
                vyg = yi - yk
                vzg = zi - zk
                v2g = vxg * vxg + vyg * vyg + vzg * vzg
                limg = (rk * rk - v2g - r2i) * inv2ri
                limg = jnp.where((gidi == gk) | (gk == 0.0), _NEG_BIG, limg)
                for r in range(J_GROUP):
                    dots = (
                        sphere_b[0] * vxg[r:r + 1, :]
                        + (
                            sphere_b[1] * vyg[r:r + 1, :]
                            + sphere_b[2] * vzg[r:r + 1, :]
                        )
                    )
                    occ = jnp.maximum(occ, limg[r:r + 1, :] - dots)
                return occ

            return jax.lax.fori_loop(0, pos, kgroup, occ)

        if variant == "prod":
            @pl.when(cnt > 0)
            def _():
                start_dma(0, 0).start()

            def process(idx, occ):
                slot = jax.lax.rem(idx, 2)

                @pl.when(idx + 1 < cnt)
                def _():
                    start_dma(1 - slot, idx + 1).start()

                return stream_tile(idx, occ)

            occ = jax.lax.fori_loop(0, cnt, process, occ_init)

        else:  # tilesat_vmem / satNN
            occ_ref[...] = occ_init
            done_ref[0] = jnp.int32(0)

            @pl.when(cnt > 0)
            def _():
                start_dma(0, 0).start()

            def process(idx, _):
                @pl.when(done_ref[0] == 0)
                def _():
                    slot = jax.lax.rem(idx, 2)

                    @pl.when(idx + 1 < cnt)
                    def _():
                        start_dma(1 - slot, idx + 1).start()

                    occ = occ_ref[...]
                    occ = stream_tile(idx, occ)
                    occ_ref[...] = occ

                    def check():
                        sat = (jnp.min(occ) > 0.0).astype(jnp.int32)
                        done_ref[0] = sat

                        # Record where we stopped so the in-flight
                        # prefetch (started for idx+1 above) can be
                        # drained after the loop - an un-waited DMA
                        # would leak a signaled semaphore into the
                        # NEXT grid step's double buffering.
                        @pl.when(sat == 1)
                        def _():
                            done_ref[1] = idx

                    if check_every == 1:
                        check()
                    else:
                        pl.when(
                            jax.lax.rem(idx, check_every) == check_every - 1
                        )(check)
                return _

            jax.lax.fori_loop(0, cnt, process, None)

            @pl.when(done_ref[0] == 1)
            def _():
                k = done_ref[1]

                @pl.when(k + 1 < cnt)
                def _():
                    start_dma(jax.lax.rem(k + 1, 2), k + 1).wait()

            occ = occ_ref[...]

        pv = pv_col * ones_a
        out_ref[...] = jnp.sum(
            jnp.where((occ <= 0.0) & (pv > 0.0), 1.0, 0.0),
            axis=0, keepdims=True,
        )

    return kern


@functools.partial(jax.jit, static_argnames=("variant", "check_every"))
def run_variant_counts(planes5, jlist, sphere128, *, variant, check_every=1):
    m = planes5.shape[1]
    planes = jnp.zeros((8, m), dtype=jnp.float32)
    planes = planes.at[0:5].set(planes5)
    if jlist.dtype == jnp.uint32:
        jlist = jax.lax.bitcast_convert_type(jlist, jnp.int32)
    planes_t = jnp.zeros((m, 128), dtype=jnp.float32)
    planes_t = planes_t.at[:, 0:8].set(planes.T)
    t = m // ATOM_TILE
    p = sphere128.shape[0]
    t_pad = ((t + 7) // 8) * 8
    if jlist.shape[0] != t_pad:
        jlist = jnp.pad(jlist, ((0, t_pad - jlist.shape[0]), (0, 0)))
    out = pl.pallas_call(
        make_kernel(variant, check_every),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((p, 128), lambda i: (0, 0)),
            pl.BlockSpec((8, ATOM_TILE), lambda i: (0, i)),
            pl.BlockSpec((8, JLIST_ROWS), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, ATOM_TILE), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((1, m), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * ATOM_TILE, 128), jnp.float32),
            pltpu.VMEM((3, p, ATOM_TILE), jnp.float32),
            pltpu.SMEM((GROUPS_PER_TILE,), jnp.int32),
            pltpu.VMEM((p, ATOM_TILE), jnp.float32),
            pltpu.SMEM((2,), jnp.int32),  # [done, stop_idx]
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(sphere128, planes, jlist, planes_t)
    return out.reshape(m).astype(jnp.float16)


def main():
    files = sorted(os.listdir(CORPUS))[:900]
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
    planes, jlist, offsets, failed = fused_kernel.pack_structures(
        triples, 1.4, 100
    )
    m = planes.shape[1]
    planes_p = np.pad(planes, ((0, 0), (0, M_PAD - m)))
    jlist_p = np.pad(jlist, ((0, (M_PAD - m) // 128), (0, 0)))
    sphere = np.zeros((104, 128), np.float32)
    sphere[:, 0:4] = _sphere_packed(100)
    print(f"{len(files)} files, {n_atoms} atoms, M={M_PAD}", flush=True)
    sync()

    d_planes = jax.device_put(planes_p)
    d_jlist = jax.device_put(jlist_p)
    d_sphere = jax.device_put(sphere)
    sync()

    ref_counts = None
    cases = [("prod", 1), ("tilesat_vmem", 1), ("sat2", 2), ("sat4", 4)]
    for variant, ce in cases:
        t0 = time.time()
        out = run_variant_counts(
            d_planes, d_jlist, d_sphere, variant=variant, check_every=ce
        )
        counts = np.asarray(out)
        t_first = time.time() - t0
        times = []
        for _ in range(4):
            sync()
            t0 = time.perf_counter()
            out = run_variant_counts(
                d_planes, d_jlist, d_sphere, variant=variant, check_every=ce
            )
            _ = np.asarray(out[0:8])
            times.append(time.perf_counter() - t0)
        tbest = min(times)
        if ref_counts is None:
            ref_counts = counts
            dmax = 0.0
        else:
            dmax = float(np.abs(
                counts.astype(np.float32) - ref_counts.astype(np.float32)
            ).max())
        print(
            f"{variant:14s} ce={ce}  first(+compile) {t_first:6.1f}s  "
            f"warm {tbest*1e3:7.1f}ms  {n_atoms/tbest/1e6:6.2f} Matoms/s  "
            f"max|dc|={dmax:.1f}",
            flush=True,
        )


if __name__ == "__main__":
    main()

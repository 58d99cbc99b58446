"""Round-3 kernel study: cut per-executed-candidate cost on REAL corpus data.

Baseline measured this round: 1.62 Matoms/s kernel-only on a 2M-slot corpus
chunk; executed j/atom (post 8-group early-out) = 727 vs 464 truly in reach.
Variants attack the gap and the 91-cycle per-executed-j cost:

  base     : the production kernel (reference timing)
  jskip    : per-j-atom skip - an [8]-row reach test gates each unrolled
             [P,A] update (saves ~36% of executed blocks)
  group4   : 4-atom j-groups + per-j skip (tighter early-out granularity)
  bf16     : dots chain in bfloat16 (2x VPU packing; accuracy probe only)
  nocond   : jskip but with arithmetic select instead of cond (control)

Each variant runs on the same real 2M-slot packed chunk; outputs are
compared against base (max |delta| in counts) to catch semantic breaks.
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
_NEG_BIG = np.float32(-1e30)
M_PAD = 2097152
CORPUS = "/tmp/rustsasa_tpu_bench_corpus"


@jax.jit
def _tiny(x):
    return x * 1.0


def sync():
    np.asarray(_tiny(np.zeros(8, np.float32)))


def make_kernel(variant):
    group = 4 if variant == "group4" else 8
    bf16p = variant == "bf16p"  # proper bf16: resident bf16 sphere + occ

    def kern(
        sphere_ref, planes_i_ref, jlist_ref, planes_t_hbm_ref,
        out_ref, jbuf, sphere_b, sems,
    ):
        a = planes_i_ref.shape[1]
        xi = planes_i_ref[0:1, :]
        yi = planes_i_ref[1:2, :]
        zi = planes_i_ref[2:3, :]
        reffi = planes_i_ref[3:4, :]
        gidi = planes_i_ref[4:5, :]
        r2i = reffi * reffi
        inv2ri = 0.5 / jnp.maximum(reffi, 1e-6)

        ones_a = jnp.ones((1, a), dtype=jnp.float32)
        if bf16p:
            sphere_b[0] = (sphere_ref[:, 0:1] * ones_a).astype(jnp.bfloat16)
            sphere_b[1] = (sphere_ref[:, 1:2] * ones_a).astype(jnp.bfloat16)
            sphere_b[2] = (sphere_ref[:, 2:3] * ones_a).astype(jnp.bfloat16)
        else:
            sphere_b[0] = sphere_ref[:, 0:1] * ones_a
            sphere_b[1] = sphere_ref[:, 1:2] * ones_a
            sphere_b[2] = sphere_ref[:, 2:3] * ones_a

        jrow = jax.lax.rem(pl.program_id(0), 8)
        cnt = jlist_ref[jrow, 0]

        def start_dma(slot, idx):
            j = jlist_ref[jrow, idx + 1]
            return pltpu.make_async_copy(
                planes_t_hbm_ref.at[pl.ds(j * a, a), :],
                jbuf.at[pl.ds(slot * a, a), :],
                sems.at[slot],
            )

        @pl.when(cnt > 0)
        def _():
            start_dma(0, 0).start()

        def process(idx, occ):
            slot = jax.lax.rem(idx, 2)

            @pl.when(idx + 1 < cnt)
            def _():
                start_dma(1 - slot, idx + 1).start()

            start_dma(slot, idx).wait()
            base = slot * a

            def kgroup(g, occ):
                rows = jbuf[pl.ds(base + g * group, group), :]
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
                reach = reffi + rk
                hitmat = v2g - reach * reach

                if variant == "nogroupcond":
                    # control: NO group-level early-out at all
                    for r in range(group):
                        dots = (
                            sphere_b[0] * vxg[r:r + 1, :]
                            + (sphere_b[1] * vyg[r:r + 1, :]
                               + sphere_b[2] * vzg[r:r + 1, :])
                        )
                        occ = jnp.maximum(occ, limg[r:r + 1, :] - dots)
                    return occ

                if bf16p:
                    vx16 = vxg.astype(jnp.bfloat16)
                    vy16 = vyg.astype(jnp.bfloat16)
                    vz16 = vzg.astype(jnp.bfloat16)
                    lim16 = limg.astype(jnp.bfloat16)

                    def do(occ):
                        for r in range(group):
                            dots = (
                                sphere_b[0] * vx16[r:r + 1, :]
                                + (sphere_b[1] * vy16[r:r + 1, :]
                                   + sphere_b[2] * vz16[r:r + 1, :])
                            )
                            occ = jnp.maximum(occ, lim16[r:r + 1, :] - dots)
                        return occ
                    hit = jnp.min(hitmat) < 0.0
                    return jax.lax.cond(hit, do, lambda o: o, occ)

                if variant == "base":
                    def do(occ):
                        for r in range(group):
                            dots = (
                                sphere_b[0] * vxg[r:r + 1, :]
                                + (sphere_b[1] * vyg[r:r + 1, :]
                                   + sphere_b[2] * vzg[r:r + 1, :])
                            )
                            occ = jnp.maximum(occ, limg[r:r + 1, :] - dots)
                        return occ
                    hit = jnp.min(hitmat) < 0.0
                    return jax.lax.cond(hit, do, lambda o: o, occ)

                if variant == "bf16":
                    def do(occ):
                        for r in range(group):
                            vx16 = vxg[r:r + 1, :].astype(jnp.bfloat16)
                            vy16 = vyg[r:r + 1, :].astype(jnp.bfloat16)
                            vz16 = vzg[r:r + 1, :].astype(jnp.bfloat16)
                            dots = (
                                sphere_b[0].astype(jnp.bfloat16) * vx16
                                + (sphere_b[1].astype(jnp.bfloat16) * vy16
                                   + sphere_b[2].astype(jnp.bfloat16) * vz16)
                            )
                            occ = jnp.maximum(
                                occ, limg[r:r + 1, :] - dots.astype(jnp.float32)
                            )
                        return occ
                    hit = jnp.min(hitmat) < 0.0
                    return jax.lax.cond(hit, do, lambda o: o, occ)

                # jskip / group4 / nocond: per-j gating
                hitrow = jnp.min(hitmat, axis=1)  # [group]

                def do(occ):
                    for r in range(group):
                        def upd(o):
                            dots = (
                                sphere_b[0] * vxg[r:r + 1, :]
                                + (sphere_b[1] * vyg[r:r + 1, :]
                                   + sphere_b[2] * vzg[r:r + 1, :])
                            )
                            return jnp.maximum(o, limg[r:r + 1, :] - dots)
                        if variant == "nocond":
                            occ = upd(occ)
                        else:
                            occ = jax.lax.cond(
                                hitrow[r] < 0.0, upd, lambda o: o, occ
                            )
                    return occ

                hit = jnp.min(hitmat) < 0.0
                return jax.lax.cond(hit, do, lambda o: o, occ)

            return jax.lax.fori_loop(0, a // group, kgroup, occ)

        occ_dtype = jnp.bfloat16 if bf16p else jnp.float32
        occ0 = jnp.full((sphere_ref.shape[0], a), _NEG_BIG, dtype=occ_dtype)
        occ = jax.lax.fori_loop(0, cnt, process, occ0)
        pv = sphere_ref[:, 3:4] * jnp.ones((1, a), dtype=jnp.float32)
        accessible = jnp.sum(
            jnp.where((occ.astype(jnp.float32) <= 0.0) & (pv > 0.0), 1.0, 0.0),
            axis=0, keepdims=True,
        )
        out_ref[...] = accessible

    return kern


@functools.partial(jax.jit, static_argnames=("variant",))
def run_variant_counts(planes5, jlist, sphere128, *, variant):
    m = planes5.shape[1]
    planes = jnp.zeros((8, m), dtype=jnp.float32)
    planes = planes.at[0:5].set(planes5)
    jlist = jlist.astype(jnp.int32)
    planes_t = jnp.zeros((m, 128), dtype=jnp.float32)
    planes_t = planes_t.at[:, 0:8].set(planes.T)
    t = m // ATOM_TILE
    p = sphere128.shape[0]
    out = pl.pallas_call(
        make_kernel(variant),
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
            pltpu.VMEM(
                (3, p, ATOM_TILE),
                jnp.bfloat16 if variant == "bf16p" else jnp.float32,
            ),
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
    for variant in ("base", "nogroupcond", "bf16p"):
        t0 = time.time()
        out = run_variant_counts(d_planes, d_jlist, d_sphere, variant=variant)
        counts = np.asarray(out)
        t_first = time.time() - t0
        times = []
        for _ in range(3):
            sync()
            t0 = time.perf_counter()
            out = run_variant_counts(
                d_planes, d_jlist, d_sphere, variant=variant
            )
            _ = np.asarray(out[0:8])
            times.append(time.perf_counter() - t0)
        tbest = min(times)
        if ref_counts is None:
            ref_counts = counts
            dmax = dmean = 0.0
        else:
            d = np.abs(counts.astype(np.float32)
                       - ref_counts.astype(np.float32))
            dmax, dmean = float(d.max()), float(d.mean())
        print(
            f"{variant:12s} first(+compile) {t_first:6.1f}s  "
            f"warm {tbest*1e3:7.1f}ms  {n_atoms/tbest/1e6:6.2f} Matoms/s  "
            f"max|dc|={dmax:.1f} mean|dc|={dmean:.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()

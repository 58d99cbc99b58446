"""Round-4: per-i-ATOM fine culling in the banded device jlist builder.

Sizing (r4_cull_granularity.py, 60 real structures): streamed j/atom is
1185 with the production 4x32-atom i-sub-box stage, 911 when a j-group is
admitted only if some i-ATOM (point + own r_eff) reaches its AABB - a 23%
stream cut, strictly conservative (point-to-box distance lower-bounds
every true pair distance, and r_i + jg_max_r upper-bounds pair reach), so
kernel counts are bit-identical.

This script measures on a real 2M-slot corpus chunk:
  - jlist build time: production build_jlist_banded vs the atombox stage
  - kernel time with each jlist
  - end-to-end (build + kernel) for both
"""
import functools
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, "/root/repo")
from rustsasa_tpu.utils.jax_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rustsasa_tpu.native import native_process_file  # noqa: E402
from rustsasa_tpu.ops import fused_kernel as fk  # noqa: E402
from rustsasa_tpu.ops.engine import _sphere_packed  # noqa: E402

ATOM_TILE = fk.ATOM_TILE
GROUPS_PER_TILE = fk.GROUPS_PER_TILE
J_GROUP = fk.J_GROUP
JLIST_ROWS = fk.JLIST_ROWS
JLIST_CAP = fk.JLIST_CAP
CORPUS = "/tmp/rustsasa_tpu_bench_corpus"
M_PAD = 2097152


@jax.jit
def _tiny(x):
    return x * 1.0


def sync():
    np.asarray(_tiny(np.zeros(8, np.float32)))


def build_jlist_atombox(planes, qvalid, tmeta, *, w):
    """build_jlist_banded with the fine stage upgraded to per-i-atom
    point-to-box tests (one j-group admitted iff ANY i-atom reaches its
    AABB).  Coarse tile-pair stage unchanged."""
    m = planes.shape[1]
    t = m // ATOM_TILE
    ng = t * GROUPS_PER_TILE
    big = jnp.float32(3e4)
    c = planes[0:3].T  # [M, 3]
    r = planes[3]
    cmin_src = jnp.where(qvalid[:, None], c, big)
    cmax_src = jnp.where(qvalid[:, None], c, -big)
    rmasked = jnp.where(qvalid, r, 0.0)
    gmin = cmin_src.reshape(ng, J_GROUP, 3).min(axis=1)
    gmax = cmax_src.reshape(ng, J_GROUP, 3).max(axis=1)
    gmaxr = rmasked.reshape(ng, J_GROUP).max(axis=1)
    tmin = gmin.reshape(t, GROUPS_PER_TILE, 3).min(axis=1)
    tmax = gmax.reshape(t, GROUPS_PER_TILE, 3).max(axis=1)
    tmaxr = gmaxr.reshape(t, GROUPS_PER_TILE).max(axis=1)

    start = tmeta[:, 0]
    ts_len = tmeta[:, 1]
    slack = jnp.float32(fk.DEVICE_CULL_SLACK)
    iidx = jnp.arange(t, dtype=jnp.int32)
    end = start + ts_len
    nd = 2 * w - 1

    def shifted(x):
        pad = [(w - 1, w - 1)] + [(0, 0)] * (x.ndim - 1)
        xp = jnp.pad(x, pad)
        return jnp.stack(
            [jax.lax.slice_in_dim(xp, d, d + t, axis=0) for d in range(nd)]
        )

    offs = jnp.arange(-(w - 1), w, dtype=jnp.int32)
    j = iidx[None, :] + offs[:, None]
    valid = (j >= start[None, :]) & (j < end[None, :])

    jt_min = shifted(tmin)
    jt_max = shifted(tmax)
    jt_maxr = shifted(tmaxr)
    gap = jnp.maximum(
        jnp.maximum(tmin[None] - jt_max, jt_min - tmax[None]), 0.0
    )
    sep2 = jnp.sum(gap * gap, axis=-1)
    reach = tmaxr[None] + jt_maxr + slack
    act = valid & (sep2 <= reach * reach)

    # FINE STAGE (changed): i-ATOMS vs shifted j-group AABBs.
    # [nd, T, 16, A] point-to-box admission, reduced over atoms.  Blocked
    # over nd via lax.map to bound working-set size.
    c_t = jnp.where(qvalid[:, None], c, big).reshape(t, ATOM_TILE, 3)
    r_t = rmasked.reshape(t, ATOM_TILE)
    jg_min = shifted(gmin.reshape(t, GROUPS_PER_TILE, 3))  # [nd,T,16,3]
    jg_max = shifted(gmax.reshape(t, GROUPS_PER_TILE, 3))
    jg_maxr = shifted(gmaxr.reshape(t, GROUPS_PER_TILE))  # [nd,T,16]

    def one_shift(args):
        mn, mx, mr = args  # [..., T,16,3] x2, [..., T,16]
        g = jnp.maximum(
            jnp.maximum(
                mn[..., :, :, None, :] - c_t[..., :, None, :, :],
                c_t[..., :, None, :, :] - mx[..., :, :, None, :],
            ),
            0.0,
        )  # [..., T, 16, A, 3]
        pb2 = jnp.sum(g * g, axis=-1)  # [..., T, 16, A]
        rr = r_t[..., :, None, :] + mr[..., :, :, None] + slack
        return jnp.any(pb2 <= rr * rr, axis=-1)  # [..., T, 16]

    blk = int(os.environ.get("ATOMBOX_BLK", "1"))
    if blk <= 1:
        bits = jax.lax.map(one_shift, (jg_min, jg_max, jg_maxr))
    elif blk >= nd:
        bits = one_shift((jg_min, jg_max, jg_maxr))
    else:
        nb = -(-nd // blk)
        pad = nb * blk - nd

        def padnd(x):
            return jnp.pad(
                x, [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            ).reshape((nb, blk) + x.shape[1:])

        bits = jax.lax.map(
            one_shift, (padnd(jg_min), padnd(jg_max), padnd(jg_maxr))
        ).reshape((nb * blk,) + jg_maxr.shape[1:])[:nd]
    mask = jnp.sum(
        jnp.where(bits, jnp.int32(1), jnp.int32(0))
        << jnp.arange(GROUPS_PER_TILE, dtype=jnp.int32)[None, None, :],
        axis=-1,
    )
    act = act & (mask > 0)

    key = jnp.where(act, sep2, jnp.float32(np.inf)).T
    entries = (jax.lax.shift_left(mask, 16) | j).T
    key_s, ent_s = jax.lax.sort((key, entries), num_keys=1, dimension=1)
    count = jnp.sum(act, axis=0).astype(jnp.int32)
    nkeep = min(nd, JLIST_CAP)
    jlist = jnp.zeros((t, JLIST_ROWS), dtype=jnp.int32)
    jlist = jlist.at[:, 0].set(count)
    jlist = jlist.at[:, 1:1 + nkeep].set(ent_s[:, :nkeep])
    return jlist


@functools.partial(jax.jit, static_argnames=("w", "fine"))
def build_only(planes4, tparams, tmeta, *, w, fine):
    m = planes4.shape[1]
    q = planes4.astype(jnp.float32)
    par = jnp.repeat(tparams, ATOM_TILE, axis=0)
    planes = jnp.zeros((fk.N_PLANES, m), dtype=jnp.float32)
    planes = planes.at[0].set(q[0] * par[:, 3] + par[:, 0])
    planes = planes.at[1].set(q[1] * par[:, 3] + par[:, 1])
    planes = planes.at[2].set(q[2] * par[:, 3] + par[:, 2])
    planes = planes.at[3].set(q[3] * np.float32(1.0 / fk.R_QUANT))
    qvalid = q[3] > 0.0
    slot_gid = jnp.arange(m, dtype=jnp.float32) + 1.0
    planes = planes.at[4].set(jnp.where(qvalid, slot_gid, 0.0))
    build = build_jlist_atombox if fine == "atombox" else fk.build_jlist_banded
    return build(planes, qvalid, tmeta, w=w), planes


@functools.partial(jax.jit, static_argnames=("n_points", "w", "fine"))
def full(planes4, tparams, tmeta, sphere128, *, n_points, w, fine):
    jlist, planes = build_only(planes4, tparams, tmeta, w=w, fine=fine)
    counts = fk._counts_call(planes, jlist, sphere128, interpret=False)
    return counts.reshape(planes4.shape[1]).astype(jnp.uint8)


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
    planes4, tparams, tmeta, offsets = fk.pack_structures_q16(triples, 1.4)
    m = planes4.shape[1]
    pad_t = (M_PAD - m) // ATOM_TILE
    planes4 = np.pad(planes4, ((0, 0), (0, M_PAD - m)))
    tparams = np.pad(tparams, ((0, pad_t), (0, 0)))
    tmeta = np.pad(tmeta, ((0, pad_t), (0, 0)))
    sphere = np.zeros((104, 128), np.float32)
    sphere[:, 0:4] = _sphere_packed(100)
    print(f"{len(files)} files, {n_atoms} atoms, M={M_PAD}", flush=True)
    sync()
    d_p4 = jax.device_put(planes4)
    d_tp = jax.device_put(tparams)
    d_tm = jax.device_put(tmeta)
    d_sp = jax.device_put(sphere)
    sync()

    ref = None
    for fine in ("sub32", "atombox"):
        # build-only timing
        jl, _ = build_only(d_p4, d_tp, d_tm, w=32, fine=fine)
        jl_np = np.asarray(jl)
        streamed = (
            float((jl_np[:, 0]).sum()) * 0  # placeholder, refined below
        )
        # streamed j-atoms/atom: popcount of masks * 8, weighted by tile
        masks = jl_np[:, 1:].astype(np.uint32) >> 16
        pop = np.zeros_like(masks, dtype=np.int32)
        mm = masks.copy()
        for _ in range(16):
            pop += (mm & 1).astype(np.int32)
            mm >>= 1
        row_groups = np.array([
            pop[i, :jl_np[i, 0]].sum() for i in range(jl_np.shape[0])
        ])
        streamed = float((row_groups * J_GROUP).mean())
        times = []
        for _ in range(4):
            sync()
            t0 = time.perf_counter()
            jl, _ = build_only(d_p4, d_tp, d_tm, w=32, fine=fine)
            _ = np.asarray(jl[0:1, 0:8])
            times.append(time.perf_counter() - t0)
        t_build = min(times)

        out = full(d_p4, d_tp, d_tm, d_sp, n_points=100, w=32, fine=fine)
        counts = np.asarray(out)
        times = []
        for _ in range(4):
            sync()
            t0 = time.perf_counter()
            out = full(d_p4, d_tp, d_tm, d_sp, n_points=100, w=32, fine=fine)
            _ = np.asarray(out[0:8])
            times.append(time.perf_counter() - t0)
        t_full = min(times)
        if ref is None:
            ref = counts
            dmax = 0.0
        else:
            dmax = float(np.abs(
                counts.astype(np.int32) - ref.astype(np.int32)).max())
        print(
            f"{fine:8s} build {t_build*1e3:7.1f}ms  "
            f"build+kernel {t_full*1e3:7.1f}ms  "
            f"{n_atoms/t_full/1e6:5.2f} Matoms/s  "
            f"streamed/tile-atom ~{streamed:6.0f}  max|dc|={dmax:.0f}",
            flush=True,
        )


if __name__ == "__main__":
    main()

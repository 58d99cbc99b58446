"""Round-5 experiment: paired-64-atom-half lane streaming.

Sized in round 4 (ROUND4_NOTES): per-HALF j-group admission (i-tile split
into two 64-atom halves over the 128 lanes) cuts streamed j-work/atom
911 -> ~783 (14.1% raw).  The catch: a group admitted for only one half
must share its [P,128] margin update with a group of the other half via
per-lane selects, which costs ~5 extra [8,128] ops per 8-row block.

Scheme measured here ("pair64"):
  * device builder emits TWO aligned tensors per i-tile row:
    jlistA = (maskA<<16)|j  and jmaskB (low 16 bits), where maskA/maskB
    are the per-half point-to-box admissions;
  * kernel splits each entry into both = A&B, onlyA = A&~B,
    onlyB = B&~A; streams `both` exactly like production (16-row pairs),
    and the single-half groups as MIXED blocks: k-th onlyA group on
    lanes 0-63 paired with k-th onlyB group on lanes 64-127, two mixed
    blocks per loop iteration;
  * list-tail safety: the branchless compaction writes slot 0 on every
    iteration, so clamped reads of an empty list hit a real group id;
    streaming a non-admitted group is exact (the margin self-masks
    out-of-reach pairs), so no select-on-empty is needed.

Counts must equal production EXACTLY (conservative-culling invariance).
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
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from rustsasa_tpu.native import native_process_file  # noqa: E402
from rustsasa_tpu.ops import fused_kernel as fk  # noqa: E402
from rustsasa_tpu.ops.engine import _sphere_packed  # noqa: E402

ATOM_TILE = 128
JLIST_ROWS = 128
GROUPS_PER_TILE = 16
J_GROUP = 8
_NEG_BIG = np.float32(-1e30)
M_PAD = 2097152
W = 32
CORPUS = "/tmp/rustsasa_tpu_bench_corpus"
N_PLANES = 8


@jax.jit
def _tiny(x):
    return x * 1.0


def sync():
    np.asarray(_tiny(np.zeros(8, np.float32)))


def build_jlist_banded_2h(planes, qvalid, tmeta, *, w):
    """Per-half variant of fused_kernel.build_jlist_banded.

    Returns (jlistA [T, JLIST_ROWS] i32, jmaskB [T, JLIST_ROWS] i32).
    """
    m = planes.shape[1]
    t = m // ATOM_TILE
    ng = t * GROUPS_PER_TILE
    big = jnp.float32(3e4)
    c = planes[0:3].T
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

    c_t = jnp.where(qvalid[:, None], c, big).reshape(t, ATOM_TILE, 3)
    r_t = rmasked.reshape(t, ATOM_TILE)
    jg_min = shifted(gmin.reshape(t, GROUPS_PER_TILE, 3))
    jg_max = shifted(gmax.reshape(t, GROUPS_PER_TILE, 3))
    jg_maxr = shifted(gmaxr.reshape(t, GROUPS_PER_TILE))

    def one_shift(args):
        mn, mx, mr = args
        g = jnp.maximum(
            jnp.maximum(
                mn[:, :, None, :] - c_t[:, None, :, :],
                c_t[:, None, :, :] - mx[:, :, None, :],
            ),
            0.0,
        )  # [T, 16, A, 3]
        pb2 = jnp.sum(g * g, axis=-1)  # [T, 16, A]
        rr = r_t[:, None, :] + mr[:, :, None] + slack
        hit = pb2 <= rr * rr  # [T, 16, A]
        half = hit.reshape(t, GROUPS_PER_TILE, 2, ATOM_TILE // 2)
        return jnp.any(half, axis=-1)  # [T, 16, 2]

    bits = jax.lax.map(one_shift, (jg_min, jg_max, jg_maxr))  # [nd,T,16,2]
    weights = jnp.arange(GROUPS_PER_TILE, dtype=jnp.int32)
    mask_a = jnp.sum(
        jnp.where(bits[..., 0], 1, 0) << weights[None, None, :], axis=-1
    )
    mask_b = jnp.sum(
        jnp.where(bits[..., 1], 1, 0) << weights[None, None, :], axis=-1
    )
    act = act & ((mask_a | mask_b) > 0)

    key = jnp.where(act, sep2, jnp.float32(np.inf)).T
    entries = (jax.lax.shift_left(mask_a, 16) | j).T
    entries_b = mask_b.T
    key_s, ent_s, entb_s = jax.lax.sort(
        (key, entries, entries_b), num_keys=1, dimension=1
    )
    count = jnp.sum(act, axis=0).astype(jnp.int32)
    nkeep = min(nd, JLIST_ROWS - 1)
    jlist = jnp.zeros((t, JLIST_ROWS), dtype=jnp.int32)
    jlist = jlist.at[:, 0].set(count)
    jlist = jlist.at[:, 1:1 + nkeep].set(ent_s[:, :nkeep])
    jmaskb = jnp.zeros((t, JLIST_ROWS), dtype=jnp.int32)
    jmaskb = jmaskb.at[:, 1:1 + nkeep].set(entb_s[:, :nkeep])
    return jlist, jmaskb


def _pack_nibbles(mask):
    """[..., ] i32 16-bit masks -> (w1, w2, count): packed lists of set
    bit positions, 4 bits each, nibble k = k-th set bit; vectorized."""
    npos = jnp.zeros_like(mask)
    w1 = jnp.zeros_like(mask)
    w2 = jnp.zeros_like(mask)
    for g in range(GROUPS_PER_TILE):
        bit = jax.lax.shift_right_logical(mask, g) & 1
        in1 = (npos < 8).astype(jnp.int32) * bit
        in2 = (npos >= 8).astype(jnp.int32) * bit
        w1 = w1 | jax.lax.shift_left(g * in1, 4 * jnp.minimum(npos, 7))
        w2 = w2 | jax.lax.shift_left(
            g * in2, 4 * jnp.maximum(npos - 8, 0)
        )
        npos = npos + bit
    return w1, w2, npos


def build_jlist_nibble(planes, qvalid, tmeta, *, w):
    """Like fused_kernel.build_jlist_banded but emits PRE-COMPACTED group
    lists: entry = (count<<16)|tile, plus two word planes with the
    admitted group ids packed 4 bits each - the kernel's 16-step scalar
    compaction chain disappears."""
    jlist_m, _ = _build_masks(planes, qvalid, tmeta, w=w)
    return jlist_m


def _build_masks(planes, qvalid, tmeta, *, w, per_half=False):
    m = planes.shape[1]
    t = m // ATOM_TILE
    ng = t * GROUPS_PER_TILE
    big = jnp.float32(3e4)
    c = planes[0:3].T
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

    c_t = jnp.where(qvalid[:, None], c, big).reshape(t, ATOM_TILE, 3)
    r_t = rmasked.reshape(t, ATOM_TILE)
    jg_min = shifted(gmin.reshape(t, GROUPS_PER_TILE, 3))
    jg_max = shifted(gmax.reshape(t, GROUPS_PER_TILE, 3))
    jg_maxr = shifted(gmaxr.reshape(t, GROUPS_PER_TILE))

    def one_shift(args):
        mn, mx, mr = args
        g = jnp.maximum(
            jnp.maximum(
                mn[:, :, None, :] - c_t[:, None, :, :],
                c_t[:, None, :, :] - mx[:, :, None, :],
            ),
            0.0,
        )
        pb2 = jnp.sum(g * g, axis=-1)
        rr = r_t[:, None, :] + mr[:, :, None] + slack
        hit = pb2 <= rr * rr
        if per_half:
            half = hit.reshape(t, GROUPS_PER_TILE, 2, ATOM_TILE // 2)
            return jnp.any(half, axis=-1)
        return jnp.any(hit, axis=-1)

    bits = jax.lax.map(one_shift, (jg_min, jg_max, jg_maxr))
    weights = jnp.arange(GROUPS_PER_TILE, dtype=jnp.int32)
    if per_half:
        mask_a = jnp.sum(
            jnp.where(bits[..., 0], 1, 0) << weights[None, None, :], axis=-1
        )
        mask_b = jnp.sum(
            jnp.where(bits[..., 1], 1, 0) << weights[None, None, :], axis=-1
        )
        union = mask_a | mask_b
    else:
        mask_a = mask_b = union = jnp.sum(
            jnp.where(bits, 1, 0) << weights[None, None, :], axis=-1
        )
    act = act & (union > 0)

    key = jnp.where(act, sep2, jnp.float32(np.inf)).T
    w1, w2, gcount = _pack_nibbles(union)
    entries = (jax.lax.shift_left(gcount, 16) | j).T
    ops = [key, entries, w1.T, w2.T]
    if per_half:
        bw1, bw2, bcnt = _pack_nibbles(mask_a & mask_b)
        aw1, aw2, acnt = _pack_nibbles(
            mask_a & jax.lax.bitwise_not(mask_b)
        )
        ow1, ow2, ocnt = _pack_nibbles(
            mask_b & jax.lax.bitwise_not(mask_a)
        )
        pe = (
            jax.lax.shift_left(bcnt, 10)
            | jax.lax.shift_left(acnt, 5)
            | ocnt
        )
        ops += [bw1.T, bw2.T, aw1.T, aw2.T, ow1.T, ow2.T, pe.T]
    sorted_ops = jax.lax.sort(tuple(ops), num_keys=1, dimension=1)
    count = jnp.sum(act, axis=0).astype(jnp.int32)
    nkeep = min(nd, JLIST_ROWS - 1)

    def to_plane(x):
        out = jnp.zeros((t, JLIST_ROWS), dtype=jnp.int32)
        return out.at[:, 1:1 + nkeep].set(x[:, :nkeep])

    jl = to_plane(sorted_ops[1]).at[:, 0].set(count)
    planes_out = [jl] + [to_plane(x) for x in sorted_ops[2:]]
    return planes_out, count


def _pair64_kernel(
    sphere_ref, planes_i_ref, jlist_ref, jmaskb_ref, planes_t_hbm_ref,
    out_ref, jbuf, sphere_b, gboth_ref, ga_ref, gb_ref, sems,
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
    sphere_b[0] = sphere_ref[:, 0:1] * ones_a
    sphere_b[1] = sphere_ref[:, 1:2] * ones_a
    sphere_b[2] = sphere_ref[:, 2:3] * ones_a

    # Lane-half selector: lanes 0..63 take the A-group, 64..127 the B.
    hm = jax.lax.broadcasted_iota(jnp.int32, (1, a), 1) < (a // 2)

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

    def load_group(base, g):
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
        return vxg, vyg, vzg, limg

    def load_mixed(base, ga, gb):
        rows_a = jbuf[pl.ds(base + ga * J_GROUP, J_GROUP), :]
        rows_b = jbuf[pl.ds(base + gb * J_GROUP, J_GROUP), :]
        xk = jnp.where(hm, rows_a[:, 0:1], rows_b[:, 0:1])
        yk = jnp.where(hm, rows_a[:, 1:2], rows_b[:, 1:2])
        zk = jnp.where(hm, rows_a[:, 2:3], rows_b[:, 2:3])
        rk = jnp.where(hm, rows_a[:, 3:4], rows_b[:, 3:4])
        gk = jnp.where(hm, rows_a[:, 4:5], rows_b[:, 4:5])
        vxg = xi - xk
        vyg = yi - yk
        vzg = zi - zk
        v2g = vxg * vxg + vyg * vyg + vzg * vzg
        limg = (rk * rk - v2g - r2i) * inv2ri
        limg = jnp.where((gidi == gk) | (gk == 0.0), _NEG_BIG, limg)
        return vxg, vyg, vzg, limg

    def process(idx, occ):
        slot = jax.lax.rem(idx, 2)

        @pl.when(idx + 1 < cnt)
        def _():
            start_dma(1 - slot, idx + 1).start()

        entry = jlist_ref[jrow, idx + 1]
        mask_a = jax.lax.shift_right_logical(entry, 16)
        mask_b = jmaskb_ref[jrow, idx + 1]
        both = jax.lax.bitwise_and(mask_a, mask_b)
        only_a = jax.lax.bitwise_and(mask_a, jax.lax.bitwise_not(mask_b))
        only_b = jax.lax.bitwise_and(mask_b, jax.lax.bitwise_not(mask_a))

        pos = jnp.int32(0)
        na = jnp.int32(0)
        nb = jnp.int32(0)
        for g in range(GROUPS_PER_TILE):
            gboth_ref[pos] = jnp.int32(g)
            pos = pos + jax.lax.bitwise_and(
                jax.lax.shift_right_logical(both, g), 1
            )
            ga_ref[na] = jnp.int32(g)
            na = na + jax.lax.bitwise_and(
                jax.lax.shift_right_logical(only_a, g), 1
            )
            gb_ref[nb] = jnp.int32(g)
            nb = nb + jax.lax.bitwise_and(
                jax.lax.shift_right_logical(only_b, g), 1
            )

        start_dma(slot, idx).wait()
        base = slot * a

        def kpair(k, occ):
            g1 = gboth_ref[k * 2]
            g2 = gboth_ref[jnp.minimum(k * 2 + 1, pos - 1)]
            vx1, vy1, vz1, l1 = load_group(base, g1)
            vx2, vy2, vz2, l2 = load_group(base, g2)
            vxg = jnp.concatenate([vx1, vx2], axis=0)
            vyg = jnp.concatenate([vy1, vy2], axis=0)
            vzg = jnp.concatenate([vz1, vz2], axis=0)
            limg = jnp.concatenate([l1, l2], axis=0)
            for r in range(2 * J_GROUP):
                dots = (
                    sphere_b[0] * vxg[r:r + 1, :]
                    + (
                        sphere_b[1] * vyg[r:r + 1, :]
                        + sphere_b[2] * vzg[r:r + 1, :]
                    )
                )
                occ = jnp.maximum(occ, limg[r:r + 1, :] - dots)
            return occ

        occ = jax.lax.fori_loop(0, jax.lax.div(pos + 1, 2), kpair, occ)

        # Mixed stream: k-th single-half-A group rides lanes 0-63 while
        # the k-th single-half-B group rides 64-127; two mixed blocks per
        # iteration.  Clamped reads beyond a list's end re-stream an
        # already-admitted group (idempotent, exact).
        nmix = jnp.maximum(na, nb)
        na_c = jnp.maximum(na - 1, 0)
        nb_c = jnp.maximum(nb - 1, 0)

        def kmixed(k, occ):
            ga1 = ga_ref[jnp.minimum(k * 2, na_c)]
            gb1 = gb_ref[jnp.minimum(k * 2, nb_c)]
            ga2 = ga_ref[jnp.minimum(k * 2 + 1, na_c)]
            gb2 = gb_ref[jnp.minimum(k * 2 + 1, nb_c)]
            vx1, vy1, vz1, l1 = load_mixed(base, ga1, gb1)
            vx2, vy2, vz2, l2 = load_mixed(base, ga2, gb2)
            vxg = jnp.concatenate([vx1, vx2], axis=0)
            vyg = jnp.concatenate([vy1, vy2], axis=0)
            vzg = jnp.concatenate([vz1, vz2], axis=0)
            limg = jnp.concatenate([l1, l2], axis=0)
            for r in range(2 * J_GROUP):
                dots = (
                    sphere_b[0] * vxg[r:r + 1, :]
                    + (
                        sphere_b[1] * vyg[r:r + 1, :]
                        + sphere_b[2] * vzg[r:r + 1, :]
                    )
                )
                occ = jnp.maximum(occ, limg[r:r + 1, :] - dots)
            return occ

        return jax.lax.fori_loop(
            0, jax.lax.div(nmix + 1, 2), kmixed, occ
        )

    occ0 = jnp.full((sphere_ref.shape[0], a), _NEG_BIG)
    occ = jax.lax.fori_loop(0, cnt, process, occ0)
    pv = sphere_ref[:, 3:4] * jnp.ones((1, a), dtype=jnp.float32)
    out_ref[...] = jnp.sum(
        jnp.where((occ <= 0.0) & (pv > 0.0), 1.0, 0.0),
        axis=0, keepdims=True,
    )


def _nibble_kernel(
    sphere_ref, planes_i_ref, jlist_ref, w1_ref, w2_ref, planes_t_hbm_ref,
    out_ref, jbuf, sphere_b, sems,
):
    """Production streaming, but group ids come PRE-COMPACTED from the
    builder as packed 4-bit lists — the per-entry 16-step scalar
    compaction chain is gone."""
    a = planes_i_ref.shape[1]
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

    @pl.when(cnt > 0)
    def _():
        start_dma(0, 0).start()

    def load_group(base, g):
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
        return vxg, vyg, vzg, limg

    def process(idx, occ):
        slot = jax.lax.rem(idx, 2)

        @pl.when(idx + 1 < cnt)
        def _():
            start_dma(1 - slot, idx + 1).start()

        entry = jlist_ref[jrow, idx + 1]
        gcount = jax.lax.shift_right_logical(entry, 16)
        w1 = w1_ref[jrow, idx + 1]
        w2 = w2_ref[jrow, idx + 1]

        start_dma(slot, idx).wait()
        base = slot * a

        def nib(i):
            wsel = jnp.where(i < 8, w1, w2)
            sh = 4 * jax.lax.rem(i, 8)
            return jax.lax.bitwise_and(
                jax.lax.shift_right_logical(wsel, sh), 0xF
            )

        last = jnp.maximum(gcount - 1, 0)

        def kpair(k, occ):
            g1 = nib(k * 2)
            g2 = nib(jnp.minimum(k * 2 + 1, last))
            vx1, vy1, vz1, l1 = load_group(base, g1)
            vx2, vy2, vz2, l2 = load_group(base, g2)
            vxg = jnp.concatenate([vx1, vx2], axis=0)
            vyg = jnp.concatenate([vy1, vy2], axis=0)
            vzg = jnp.concatenate([vz1, vz2], axis=0)
            limg = jnp.concatenate([l1, l2], axis=0)
            for r in range(2 * J_GROUP):
                dots = (
                    sphere_b[0] * vxg[r:r + 1, :]
                    + (
                        sphere_b[1] * vyg[r:r + 1, :]
                        + sphere_b[2] * vzg[r:r + 1, :]
                    )
                )
                occ = jnp.maximum(occ, limg[r:r + 1, :] - dots)
            return occ

        return jax.lax.fori_loop(
            0, jax.lax.div(gcount + 1, 2), kpair, occ
        )

    occ0 = jnp.full((sphere_ref.shape[0], a), _NEG_BIG)
    occ = jax.lax.fori_loop(0, cnt, process, occ0)
    pv = sphere_ref[:, 3:4] * jnp.ones((1, a), dtype=jnp.float32)
    out_ref[...] = jnp.sum(
        jnp.where((occ <= 0.0) & (pv > 0.0), 1.0, 0.0),
        axis=0, keepdims=True,
    )


def _counts_call_nibble(planes, jplanes, sphere128):
    jl, w1, w2 = jplanes
    m = planes.shape[1]
    planes_t = jnp.zeros((m, 128), dtype=jnp.float32)
    planes_t = planes_t.at[:, 0:N_PLANES].set(planes.T)
    t = m // ATOM_TILE
    p = sphere128.shape[0]
    t_pad = ((t + 7) // 8) * 8
    if jl.shape[0] != t_pad:
        jl = jnp.pad(jl, ((0, t_pad - jl.shape[0]), (0, 0)))
        w1 = jnp.pad(w1, ((0, t_pad - w1.shape[0]), (0, 0)))
        w2 = jnp.pad(w2, ((0, t_pad - w2.shape[0]), (0, 0)))
    smem_spec = pl.BlockSpec(
        (8, JLIST_ROWS), lambda i: (i // 8, 0), memory_space=pltpu.SMEM
    )
    return pl.pallas_call(
        _nibble_kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((p, 128), lambda i: (0, 0)),
            pl.BlockSpec((N_PLANES, ATOM_TILE), lambda i: (0, i)),
            smem_spec, smem_spec, smem_spec,
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, ATOM_TILE), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((1, m), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * ATOM_TILE, 128), jnp.float32),
            pltpu.VMEM((3, p, ATOM_TILE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(sphere128, planes, jl, w1, w2, planes_t)


@functools.partial(jax.jit, static_argnames=("n_points", "w"))
def nibble_banded(planes4, tparams, tmeta, sphere128, *, n_points, w):
    m = planes4.shape[1]
    q = planes4.astype(jnp.float32)
    par = jnp.repeat(tparams, ATOM_TILE, axis=0)
    planes = jnp.zeros((N_PLANES, m), dtype=jnp.float32)
    planes = planes.at[0].set(q[0] * par[:, 3] + par[:, 0])
    planes = planes.at[1].set(q[1] * par[:, 3] + par[:, 1])
    planes = planes.at[2].set(q[2] * par[:, 3] + par[:, 2])
    planes = planes.at[3].set(q[3] * np.float32(1.0 / fk.R_QUANT))
    slot_gid = jnp.arange(m, dtype=jnp.float32) + 1.0
    qvalid = q[3] > 0.0
    planes = planes.at[4].set(jnp.where(qvalid, slot_gid, 0.0))
    jplanes, _ = _build_masks(planes, qvalid, tmeta, w=w)
    counts = _counts_call_nibble(planes, jplanes, sphere128)
    return counts.reshape(m).astype(jnp.uint8)


def _counts_call_2h(planes, jlist, jmaskb, sphere128):
    m = planes.shape[1]
    planes_t = jnp.zeros((m, 128), dtype=jnp.float32)
    planes_t = planes_t.at[:, 0:N_PLANES].set(planes.T)
    t = m // ATOM_TILE
    p = sphere128.shape[0]
    t_pad = ((t + 7) // 8) * 8
    if jlist.shape[0] != t_pad:
        jlist = jnp.pad(jlist, ((0, t_pad - jlist.shape[0]), (0, 0)))
        jmaskb = jnp.pad(jmaskb, ((0, t_pad - jmaskb.shape[0]), (0, 0)))
    return pl.pallas_call(
        _pair64_kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((p, 128), lambda i: (0, 0)),
            pl.BlockSpec((N_PLANES, ATOM_TILE), lambda i: (0, i)),
            pl.BlockSpec(
                (8, JLIST_ROWS), lambda i: (i // 8, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (8, JLIST_ROWS), lambda i: (i // 8, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, ATOM_TILE), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((1, m), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * ATOM_TILE, 128), jnp.float32),
            pltpu.VMEM((3, p, ATOM_TILE), jnp.float32),
            pltpu.SMEM((GROUPS_PER_TILE,), jnp.int32),
            pltpu.SMEM((GROUPS_PER_TILE,), jnp.int32),
            pltpu.SMEM((GROUPS_PER_TILE,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(sphere128, planes, jlist, jmaskb, planes_t)


@functools.partial(jax.jit, static_argnames=("n_points", "w"))
def pair64_banded(planes4, tparams, tmeta, sphere128, *, n_points, w):
    m = planes4.shape[1]
    q = planes4.astype(jnp.float32)
    par = jnp.repeat(tparams, ATOM_TILE, axis=0)
    planes = jnp.zeros((N_PLANES, m), dtype=jnp.float32)
    planes = planes.at[0].set(q[0] * par[:, 3] + par[:, 0])
    planes = planes.at[1].set(q[1] * par[:, 3] + par[:, 1])
    planes = planes.at[2].set(q[2] * par[:, 3] + par[:, 2])
    planes = planes.at[3].set(q[3] * np.float32(1.0 / fk.R_QUANT))
    slot_gid = jnp.arange(m, dtype=jnp.float32) + 1.0
    qvalid = q[3] > 0.0
    planes = planes.at[4].set(jnp.where(qvalid, slot_gid, 0.0))
    jlist, jmaskb = build_jlist_banded_2h(planes, qvalid, tmeta, w=w)
    counts = _counts_call_2h(planes, jlist, jmaskb, sphere128)
    return counts.reshape(m).astype(jnp.uint8)


def main():
    files = sorted(os.listdir(CORPUS))
    pool = ThreadPoolExecutor(max_workers=4)

    def load(path):
        return native_process_file(
            os.path.join(CORPUS, path), level="residue",
            include_hydrogens=False, include_hetatms=False,
            read_radii_from_occupancy=False, allow_vdw_fallback=False,
        )

    triples = []
    slots = 0
    for h in pool.map(load, files):
        n = h.coords.shape[0]
        nt = -(-n // ATOM_TILE)
        if nt > W:
            continue
        if slots + nt * ATOM_TILE > M_PAD:
            break
        triples.append((h.coords.copy(), h.radii.copy(),
                        np.arange(n, dtype=np.int32)))
        slots += nt * ATOM_TILE
    n_atoms = sum(t[0].shape[0] for t in triples)
    planes4, tparams, tmeta, offsets = fk.pack_structures_q16(triples, 1.4)
    m = planes4.shape[1]
    if m > M_PAD:
        raise SystemExit(f"chunk overflow {m}")
    pad_t = (M_PAD - m) // ATOM_TILE
    planes4 = np.pad(planes4, ((0, 0), (0, M_PAD - m)))
    tparams = np.pad(tparams, ((0, pad_t), (0, 0)))
    tmeta = np.pad(tmeta, ((0, pad_t), (0, 0)))
    sphere = np.zeros((104, 128), np.float32)
    sphere[:, 0:4] = _sphere_packed(100)
    print(f"{len(triples)} structures, {n_atoms} atoms, M={M_PAD}",
          flush=True)
    sync()
    d_p4 = jax.device_put(planes4)
    d_tp = jax.device_put(tparams)
    d_tm = jax.device_put(tmeta)
    d_sp = jax.device_put(sphere)
    sync()

    ref = None
    for name, fn in (
        ("prod", lambda: fk.fused_sasa_q16_banded(
            d_p4, d_tp, d_tm, d_sp, n_points=100, w=W)),
        ("nibble", lambda: nibble_banded(
            d_p4, d_tp, d_tm, d_sp, n_points=100, w=W)),
        ("pair64", lambda: pair64_banded(
            d_p4, d_tp, d_tm, d_sp, n_points=100, w=W)),
    ):
        t0 = time.time()
        counts = np.asarray(fn())
        t_first = time.time() - t0
        times = []
        for _ in range(4):
            sync()
            t0 = time.perf_counter()
            out = fn()
            _ = np.asarray(out[0:8])
            times.append(time.perf_counter() - t0)
        tbest = min(times)
        if ref is None:
            ref = counts
            dmax = 0
        else:
            dmax = int(np.abs(
                counts.astype(np.int32) - ref.astype(np.int32)
            ).max())
        print(
            f"{name:8s} first(+compile) {t_first:6.1f}s  "
            f"warm {tbest * 1e3:7.1f}ms  "
            f"{n_atoms / tbest / 1e6:6.2f} Matoms/s  max|dc|={dmax}",
            flush=True,
        )


if __name__ == "__main__":
    main()

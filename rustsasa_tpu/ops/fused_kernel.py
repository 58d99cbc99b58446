"""Fused Pallas SASA kernel: no neighbor lists, no top-k, no gathers.

The list-based path pays for an [N,N] distance matrix, a top-k sort and a
large irregular gather - all HBM-bound and gather-serialized on TPU.  This
kernel replaces the whole neighbor pipeline with a tiled direct evaluation
(the TPU analog of the reference's cell list, reference:
src/structures/spatial_grid.rs):

  * atoms are Morton-sorted per structure (host side) so spatial locality
    maps to tile locality;
  * grid over 128-atom i-tiles; each i-tile loops over the j-tiles of its
    own structure, AABB-culled: a tile pair is processed only when the
    boxes are within occlusion reach (max r_eff_i + max r_eff_j) - the
    analog of the reference's half-shell cell iteration, minus the
    branching: culling is a scalar predicate per tile pair;
  * surviving j-tiles are DMA'd into VMEM and every j-atom updates the
    [P points x A atoms] occlusion mask with exact f32 arithmetic:
    dot(s_p, v) < (thr_j - |v|^2 - r_eff_i^2) / (2 r_eff_i),
    which self-masks out-of-reach pairs (limit < -|v| whenever
    |v| > r_eff_i + r_j + probe), so no candidate cutoff test is needed;
  * per-j-atom early-out: if no i-atom in the tile is within reach the
    [P, A] update is skipped (scalar-predicated, no divergence).

Everything after the per-structure packing runs in one pallas_call per
chunk; HBM traffic is one linear read of the atom planes per active tile
pair (4KB DMAs) plus the output row.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ATOM_TILE = 128
_NEG_BIG = np.float32(-1e30)
_FAR = np.float32(3.0e4)  # AABB sentinel for all-padding tiles

# planes rows: x, y, z, r_eff, gid(+1, 0=padding), unused*3
N_PLANES = 8
# tile table lanes: minx,miny,minz,maxx,maxy,maxz,max_reff,unused
TILE_TAB_W = 8


def _fused_kernel(
    sphere_ref,  # [P, 128] f32: cols 0..2 sx,sy,sz; col 3 point_valid
    planes_i_ref,  # [N_PLANES, A] f32: this i-tile's atom planes
    tile_tab_ref,  # [T_pad, TILE_TAB_W] f32 in VMEM
    rng_ref,  # [T_pad, TILE_TAB_W] i32 in VMEM: cols 0/1 = j range
    area_ref,  # [1, A] f32
    planes_hbm_ref,  # [N_PLANES, M] f32 in ANY/HBM: all atom planes
    out_ref,  # [1, A] f32
    jbuf,  # SMEM scratch [N_PLANES, A]: j-tile consumed as scalars
    occ_ref,  # VMEM scratch [P, A]: occlusion-margin accumulator
    sem,  # DMA semaphore
):
    i = pl.program_id(0)
    a = planes_i_ref.shape[1]

    xi = planes_i_ref[0:1, :]
    yi = planes_i_ref[1:2, :]
    zi = planes_i_ref[2:3, :]
    reffi = planes_i_ref[3:4, :]
    gidi = planes_i_ref[4:5, :]
    r2i = reffi * reffi
    inv2ri = 0.5 / jnp.maximum(reffi, 1e-6)

    ones_a = jnp.ones((1, a), dtype=jnp.float32)
    sxb = sphere_ref[:, 0:1] * ones_a  # [P, A]
    syb = sphere_ref[:, 1:2] * ones_a
    szb = sphere_ref[:, 2:3] * ones_a
    pv = sphere_ref[:, 3:4] * ones_a

    occ_ref[...] = jnp.full_like(occ_ref, _NEG_BIG)

    # i-tile bounds (scalars).
    iminx = tile_tab_ref[i, 0]
    iminy = tile_tab_ref[i, 1]
    iminz = tile_tab_ref[i, 2]
    imaxx = tile_tab_ref[i, 3]
    imaxy = tile_tab_ref[i, 4]
    imaxz = tile_tab_ref[i, 5]
    imaxr = tile_tab_ref[i, 6]

    def process_tile(j):
        dma = pltpu.make_async_copy(
            planes_hbm_ref.at[:, pl.ds(j * a, a)], jbuf, sem
        )
        dma.start()
        dma.wait()

        def katom(k, occ):
            # Branchless occlusion-margin update: occluded iff
            # margin = lim - dot(s, v) > 0 for any neighbor; the limit
            # self-masks out-of-reach atoms and the gid/padding test folds
            # into the same max-accumulation.  5 [P,A] vector ops/atom.
            xk = jbuf[0, k]
            yk = jbuf[1, k]
            zk = jbuf[2, k]
            rk = jbuf[3, k]
            gk = jbuf[4, k]
            vx = xi - xk
            vy = yi - yk
            vz = zi - zk
            v2 = vx * vx + vy * vy + vz * vz
            lim = (rk * rk - v2 - r2i) * inv2ri
            lim = jnp.where((gidi == gk) | (gk == 0.0), _NEG_BIG, lim)
            dots = sxb * vx + (syb * vy + szb * vz)
            return jnp.maximum(occ, lim - dots)

        tile_occ = jax.lax.fori_loop(
            0, a, katom, jnp.full((sphere_ref.shape[0], a), _NEG_BIG)
        )
        occ_ref[...] = jnp.maximum(occ_ref[...], tile_occ)

    def maybe_tile(j, carry):
        # AABB separation vs occlusion reach (all scalar SMEM math).
        dx = jnp.maximum(
            jnp.maximum(iminx - tile_tab_ref[j, 3], tile_tab_ref[j, 0] - imaxx),
            0.0,
        )
        dy = jnp.maximum(
            jnp.maximum(iminy - tile_tab_ref[j, 4], tile_tab_ref[j, 1] - imaxy),
            0.0,
        )
        dz = jnp.maximum(
            jnp.maximum(iminz - tile_tab_ref[j, 5], tile_tab_ref[j, 2] - imaxz),
            0.0,
        )
        sep2 = dx * dx + dy * dy + dz * dz
        reach = imaxr + tile_tab_ref[j, 6]

        @pl.when(sep2 <= reach * reach)
        def _():
            process_tile(j)

        return carry

    jstart = rng_ref[i, 0]
    jend = rng_ref[i, 1]
    jax.lax.fori_loop(jstart, jend, maybe_tile, 0)

    # Occluded iff the accumulated margin is strictly positive
    # (matches the reference's `dot < limit` strict comparison, lib.rs:146).
    accessible = jnp.sum(
        jnp.where((occ_ref[...] <= 0.0) & (pv > 0.0), 1.0, 0.0),
        axis=0,
        keepdims=True,
    )
    out_ref[...] = accessible * area_ref[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_sasa(
    planes: jnp.ndarray,  # [N_PLANES, M] f32
    tile_tab: jnp.ndarray,  # [T, TILE_TAB_W] f32
    tile_rng: jnp.ndarray,  # [T, 2] i32
    area: jnp.ndarray,  # [1, M] f32
    sphere128: jnp.ndarray,  # [P, 128] f32
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    m = planes.shape[1]
    t = m // ATOM_TILE
    p = sphere128.shape[0]

    t_pad = tile_tab.shape[0]
    rng8 = jnp.zeros((t_pad, TILE_TAB_W), dtype=jnp.int32)
    rng8 = rng8.at[: tile_rng.shape[0], 0:2].set(tile_rng)
    out = pl.pallas_call(
        _fused_kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((p, 128), lambda i: (0, 0)),
            pl.BlockSpec((N_PLANES, ATOM_TILE), lambda i: (0, i)),
            # Tables stay in VMEM; per-tile scalars are read with dynamic
            # SUBLANE indices (legal in Mosaic; SMEM at this size is not -
            # SMEM scalars cost 64B each and the budget is 1MB).
            pl.BlockSpec((t_pad, TILE_TAB_W), lambda i: (0, 0)),
            pl.BlockSpec((t_pad, TILE_TAB_W), lambda i: (0, 0)),
            pl.BlockSpec((1, ATOM_TILE), lambda i: (0, i)),
            pl.BlockSpec(memory_space=pl.ANY),  # full planes, DMA-d
        ],
        out_specs=pl.BlockSpec((1, ATOM_TILE), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((1, m), jnp.float32),
        scratch_shapes=[
            # SMEM: the j-tile atom planes are consumed as scalars
            # (dynamic per-atom indexing is an SMEM operation on TPU).
            pltpu.SMEM((N_PLANES, ATOM_TILE), jnp.float32),
            pltpu.VMEM((p, ATOM_TILE), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(sphere128, planes, tile_tab, rng8, area, planes)
    return out.reshape(m)


def _morton_codes(coords: np.ndarray) -> np.ndarray:
    """30-bit Morton codes from quantized coordinates (10 bits/axis)."""
    q = coords - coords.min(axis=0, keepdims=True)
    scale = 1023.0 / max(float(q.max()), 1e-6)
    q = np.minimum((q * scale).astype(np.uint32), 1023)

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    return spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)


def pack_structures(
    structures: list[tuple[np.ndarray, np.ndarray, np.ndarray]],
    probe: float,
    n_points: int,
):
    """Host-side packing for the fused kernel.

    structures: list of (coords [n,3] f32, radii [n] f32, gids [n] i32).
    Returns (planes [8, M], tile_tab [T,8], tile_rng [T,2], area [1,M],
             offsets) where offsets[i] is (start, n, perm_inverse) for
    unpacking per-structure results.
    """
    tiles_per = [
        -(-s[0].shape[0] // ATOM_TILE) for s in structures
    ]
    total_tiles = sum(tiles_per)
    m = total_tiles * ATOM_TILE
    planes = np.zeros((N_PLANES, m), dtype=np.float32)
    area = np.zeros((1, m), dtype=np.float32)
    tile_tab = np.empty((total_tiles, TILE_TAB_W), dtype=np.float32)
    tile_tab[:, 0:3] = _FAR
    tile_tab[:, 3:6] = -_FAR
    tile_tab[:, 6:] = 0.0
    tile_rng = np.zeros((total_tiles, 2), dtype=np.int32)

    offsets = []
    tile0 = 0
    pos = 0
    four_pi_over_n = 4.0 * np.pi / n_points
    for s_i, (coords, radii, gids) in enumerate(structures):
        n = coords.shape[0]
        nt = tiles_per[s_i]
        order = np.argsort(_morton_codes(coords), kind="stable")
        inv = np.empty(n, dtype=np.int64)
        inv[order] = np.arange(n)
        c = coords[order]
        r_eff = radii[order] + np.float32(probe)
        g = gids[order].astype(np.float64) + 1.0

        planes[0:3, pos:pos + n] = c.T
        planes[3, pos:pos + n] = r_eff
        planes[4, pos:pos + n] = g
        area[0, pos:pos + n] = four_pi_over_n * r_eff * r_eff

        # Vectorized per-tile AABB + max reach.
        slots = nt * ATOM_TILE
        cmin = np.full((slots, 3), _FAR, dtype=np.float32)
        cmin[:n] = c
        cmax = np.full((slots, 3), -_FAR, dtype=np.float32)
        cmax[:n] = c
        rpad = np.zeros(slots, dtype=np.float32)
        rpad[:n] = r_eff
        sl = slice(tile0, tile0 + nt)
        tile_tab[sl, 0:3] = cmin.reshape(nt, ATOM_TILE, 3).min(axis=1)
        tile_tab[sl, 3:6] = cmax.reshape(nt, ATOM_TILE, 3).max(axis=1)
        tile_tab[sl, 6] = rpad.reshape(nt, ATOM_TILE).max(axis=1)
        tile_rng[sl] = (tile0, tile0 + nt)

        offsets.append((pos, n, inv))
        tile0 += nt
        pos += nt * ATOM_TILE

    return planes, tile_tab, tile_rng, area, offsets

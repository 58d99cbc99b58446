"""Pallas TPU occlusion kernel.

The hot loop of Shrake-Rupley: for every (atom, test-point) pair, decide
whether any neighbor occludes the point.  The reference does this with
per-atom SIMD + early exit (reference: src/lib.rs:94-224); on TPU we invert
the layout for lane parallelism:

  * tile = 128 atoms on LANES x P test points on SUBLANES;
  * per neighbor step k the occlusion update is a rank-1 outer-product
    pattern: dots[p, a] = sx[p]*vx[a] + sy[p]*vy[a] + sz[p]*vz[a],
    occluded |= dots < limit[a] - pure VPU broadcasting, no gathers,
    no transposes inside the loop;
  * neighbor records arrive pre-gathered as [K, N] component planes
    (vx, vy, vz, limit), K-major so each loop step reads one sublane row;
  * a scalar-prefetched per-tile neighbor bound trims the K loop: sparse
    tiles stop early (the TPU analog of the reference's early exit, without
    divergent control flow inside a tile);
  * everything stays in VMEM; the [N, K, P] dot tensor the XLA path
    materializes in chunks never exists here.

Accessible-point counts become SASA via the same 4*pi*r^2*acc/n formula.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Atoms per tile (lane count).
ATOM_TILE = 128
# Hard cap on padded point count for the Pallas path ([P, 128] f32 working
# set must fit VMEM comfortably); larger requests fall back to XLA.
MAX_P_PAD = 2048


def _occlusion_tile_kernel(
    kmax_ref,  # scalar prefetch: [n_tiles] i32, per-tile neighbor bound
    sphere_ref,  # [P, 128] f32: cols 0..2 = sx,sy,sz; col 3 = point_valid
    vx_ref,  # [K, A] f32
    vy_ref,  # [K, A] f32
    vz_ref,  # [K, A] f32
    lim_ref,  # [K, A] f32 (-BIG on invalid neighbor slots)
    area_ref,  # [1, A] f32: 4*pi*r_eff^2/n_points, 0 for padding atoms
    out_ref,  # [1, A] f32: per-atom SASA
):
    p = sphere_ref.shape[0]
    a = vx_ref.shape[1]
    # Hoist the lane-broadcast of the sphere planes out of the neighbor
    # loop: [P,1] -> [P,A] lane-splats are expensive per op; done once here,
    # the loop body only needs sublane-splats of [1,A] rows (cheap).
    ones_a = jnp.ones((1, a), dtype=jnp.float32)
    sxb = sphere_ref[:, 0:1] * ones_a  # [P, A]
    syb = sphere_ref[:, 1:2] * ones_a
    szb = sphere_ref[:, 2:3] * ones_a
    pv = sphere_ref[:, 3:4] * ones_a

    def body(k, occ):
        vx = vx_ref[k, :].reshape(1, a)
        vy = vy_ref[k, :].reshape(1, a)
        vz = vz_ref[k, :].reshape(1, a)
        lim = lim_ref[k, :].reshape(1, a)
        dots = sxb * vx + syb * vy + szb * vz
        # f32 0/1 accumulation: Mosaic legalizes the dynamic-bound loop
        # with a float carry where a vector-of-i1 carry does not.
        return jnp.maximum(occ, (dots < lim).astype(jnp.float32))

    kmax = kmax_ref[pl.program_id(0)]
    occ = jax.lax.fori_loop(
        0, kmax, body, jnp.zeros((p, a), dtype=jnp.float32)
    )
    accessible = jnp.sum(
        jnp.where((occ == 0.0) & (pv > 0.0), 1.0, 0.0),
        axis=0,
        keepdims=True,
    )  # [1, A]
    out_ref[...] = accessible * area_ref[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def occlusion_sasa_pallas(
    v: jnp.ndarray,  # [N, K, 3] center - neighbor position
    limit: jnp.ndarray,  # [N, K], -BIG where invalid
    area_factor: jnp.ndarray,  # [N] = 4*pi*r_eff^2/n_points (0 for padding)
    sphere_packed: jnp.ndarray,  # [P, 128] packed sphere planes
    tile_kmax: jnp.ndarray,  # [n_tiles] i32
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the tiled occlusion kernel; returns per-atom SASA [N]."""
    n, k, _ = v.shape
    assert n % ATOM_TILE == 0, n
    n_tiles = n // ATOM_TILE
    p = sphere_packed.shape[0]

    # K-major component planes: one sublane row per neighbor step.
    vx = v[:, :, 0].T  # [K, N]
    vy = v[:, :, 1].T
    vz = v[:, :, 2].T
    lim = limit.T
    area = area_factor.reshape(1, n)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            # index maps receive (grid_idx, scalar_prefetch_ref)
            pl.BlockSpec((p, 128), lambda i, _: (0, 0)),  # sphere (replicated)
            pl.BlockSpec((k, ATOM_TILE), lambda i, _: (0, i)),  # vx
            pl.BlockSpec((k, ATOM_TILE), lambda i, _: (0, i)),  # vy
            pl.BlockSpec((k, ATOM_TILE), lambda i, _: (0, i)),  # vz
            pl.BlockSpec((k, ATOM_TILE), lambda i, _: (0, i)),  # limit
            pl.BlockSpec((1, ATOM_TILE), lambda i, _: (0, i)),  # area factor
        ],
        out_specs=pl.BlockSpec((1, ATOM_TILE), lambda i, _: (0, i)),
    )
    out = pl.pallas_call(
        _occlusion_tile_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        interpret=interpret,
    )(tile_kmax, sphere_packed, vx, vy, vz, lim, area)
    return out.reshape(n)


def pack_sphere(sphere: np.ndarray, point_valid: np.ndarray) -> np.ndarray:
    """Pack [P,3] points + [P] validity into the kernel's [P, 128] layout."""
    p = sphere.shape[0]
    packed = np.zeros((p, 128), dtype=np.float32)
    packed[:, 0:3] = sphere
    packed[:, 3] = point_valid.astype(np.float32)
    return packed


def supports(n_pad: int, p_pad: int) -> bool:
    return n_pad % ATOM_TILE == 0 and p_pad <= MAX_P_PAD

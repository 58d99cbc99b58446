"""Fused Pallas SASA kernel: no neighbor lists, no top-k, no gathers.

The list-based path pays for an [N,N] distance matrix, a top-k sort and a
large irregular gather - all HBM-bound and gather-serialized on TPU.  This
kernel replaces the whole neighbor pipeline with a tiled direct evaluation
(the TPU analog of the reference's cell list, reference:
src/structures/spatial_grid.rs):

  * atoms are Morton-sorted per structure (host side) so spatial locality
    maps to tile locality;
  * culling happens at TWO granularities - tile pairs, plus a 16-bit
    mask of which 8-atom j-groups are in reach (the analog of the
    reference's half-shell cell iteration, spatial_grid.rs:174-192).
    The PRODUCTION path computes it ON DEVICE (build_jlist_banded: the
    host only centers/sorts/quantizes); the host packers
    (pack_structures) produce the same format for structures the banded
    path can't take (>127 tiles, non-unique gids, >1300 A extent).
    Each jlist entry is a u32: (group_mask << 16) | j_tile_id;
  * per admitted j-tile the kernel DMAs its planes into VMEM and runs a
    BRANCHLESS scalar compaction of the mask into a tiny SMEM list of
    admitted group indices (store-then-conditionally-advance - no
    lax.cond anywhere: conds measured 50-80 cycles each on this Mosaic
    backend, scripts/r3_kernel_variants.py, and a cond-based group
    early-out made the kernel 20% SLOWER than straight-line streaming);
  * the hot loop streams only admitted groups: every j-atom updates the
    [P points x A atoms] occlusion margin with exact f32 arithmetic:
    margin = (thr_j - |v|^2 - r_eff_i^2)/(2 r_eff_i) - dot(s_p, v),
    occluded iff margin > 0 for any neighbor.  The margin self-masks
    out-of-reach pairs (limit < -|v| whenever |v| > r_eff_i + r_j + probe)
    so no per-pair cutoff test is needed - 7 [P, A] vector ops per j-atom,
    retired ~4 vregs/cycle by the VPU's 4 ALUs;
  * double-buffered DMA overlaps the next j-tile fetch with compute.

Measured dead-ends (scripts/kernel_experiments.py,
scripts/r3_kernel_variants.py, scripts/r3_maxplus.py; TPU v5e): a
max-plus reformulation via separable dots (dot(s, c_i - c_j) = SXI - TJ
off the MXU, 2 wide ops/j) ran 1.6x SLOWER than the 7-op chain with
dynamic lane rolls (mp_rot, 1.90 Matoms/s) and 1.3x slower with fully
static 16-way pl.when group guards + VMEM occlusion accumulator
(mp_static, 2.38) - column extraction, conds and RMW round-trips all
cost more than the saved arithmetic; FMA reordering is 1.7x slower than the
mul/add chain; bfloat16 margins are 17% SLOWER than f32 (the VPU does
not double bf16 throughput here) while costing accuracy; lax.cond-based
group/atom early-outs all lose to branchless streaming plus group
masks; 4-atom j-groups (32-bit masks in a parallel SMEM array, 10%
fewer streamed j-atoms - measured 1,143 vs 1,023 per atom) ran 1.45x
SLOWER - per-group fori/prep overhead amortizes over 4 instead of 8
j-atoms and swamps the candidate saving.

Round-4 measured results (scripts/r4_saturation.py, r4_microkernel.py,
r4_cull_granularity.py, r4_atombox.py; same real 2M-slot corpus chunk):
a tile-level occlusion-saturation skip (one guard per j-TILE, occ in
VMEM, 16x coarser than the losing per-group conds) is ALSO a dead end -
625ms prod vs 659/643/632ms checking every 1/2/4 tiles: tiles of these
~2.6k-atom structures rarely have all 128 atoms fully buried.  Split
occlusion accumulators (halved max-dependency chain): no effect
(628.7 vs 631.7ms).  Two WINS shipped: (1) streaming admitted groups in
PAIRS (16 margin updates per loop iteration) cut per-iteration overhead
- 584 vs 632ms, bit-identical; (2) per-i-atom point-to-box fine culling
in the banded builder cut streamed j/atom 1185 -> 911 measured
(bit-identical counts; +60ms build buys ~120ms kernel per 2M chunk).
Triple-group streaming (24 updates/iteration) measured only +1.1% over
pairs (578.5 vs 585.0ms - amortization is exhausted at 16); not worth
the shape churn.  The shipped kernel streams ~870 j/atom against a 733
group-granularity floor (3.1-3.4 Matoms/s kernel-only depending on
tunnel window).

Round-5 measured results (scripts/r5_pair64.py, r5_qwire.py; same real
2M-slot chunk, w=32 banded path; chunk split: build ~107ms of which the
point-to-box fine stage is ~75, kernel ~498ms):
  * paired-64-atom-half lane streaming (round-4 sizing: per-half j-group
    admission cuts lane-weighted streamed work 911 -> 783 j/atom) is a
    DEAD END in its realizable forms.  Per-half admission is real, but
    converting it to fewer [P,A] blocks requires pairing an
    only-left-half group with an only-right-half one in a single mixed
    block (per-lane selects):
      - per-ENTRY pairing (groups of one j-tile): only 3.3% fewer
        blocks - within one (i-tile, j-tile) pair the single-half
        groups are one-sided (707,983 of 827,819 unpairable) - and the
        extra fori + 16-step 3-way compaction measured NET 2.2% SLOWER
        (618.6 vs 604.8ms, bit-identical counts);
      - pairing across j-tiles recovers the full 13.7% fewer blocks
        (simulated on real masks) but needs either stash copies
        (8-16 vreg moves per single-half group = 7-13% of baseline
        vreg-ops, erasing the win) or a multi-slot DMA window with
        pending-leftover bookkeeping whose extra per-entry loops pay
        the same fori-carry cost that made per-entry pairing lose;
      - builder-side pre-compacted nibble group lists (kills the
        kernel's 16-step scalar compaction entirely) measured a WASH
        (602.4 vs 604.4ms): the compaction chain was already hidden
        behind the j-tile DMA wait.  Scalar work before the DMA wait is
        free; only vector-op and loop-carry overheads are real.
  * The shipped round-5 lever is the q13 wire (6 B/slot, see
    MAX_Q13_EXTENT): 823.6 -> 782.5ms per chunk measured end-to-end in
    a calm window, with 2-3x the saving when the link degrades - it
    attacks the congestion-sensitive h2d instead of the compute.

Everything after the per-structure packing runs in one pallas_call per
chunk; HBM traffic is one 64KB read per active tile pair plus the output.
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

# planes rows: x, y, z, r_eff, gid(+1, 0=padding), unused*3
N_PLANES = 8
# j-list column layout (u32): col 0 = count, cols 1..count = entries
# (group_mask << 16) | j_tile_id.  Mask bit g covers j-atoms
# [8g, 8g+8) of that tile.
JLIST_ROWS = 128
JLIST_CAP = JLIST_ROWS - 1
# j-atoms per masked group.
J_GROUP = 8
GROUPS_PER_TILE = ATOM_TILE // J_GROUP


class JListOverflow(ValueError):
    """An i-tile has more than JLIST_CAP in-reach j-tiles."""


def _fused_count_kernel(
    sphere_ref,  # [P, 128] f32: cols 0..2 sx,sy,sz; col 3 point_valid
    planes_i_ref,  # [N_PLANES, A] f32: this i-tile's atom planes
    jlist_ref,  # [8, JLIST_ROWS] i32 SMEM window: row i%8 = count + entries
    planes_t_hbm_ref,  # [M, 128] f32 in ANY/HBM: atom-major planes (lane-padded)
    out_ref,  # [1, A] f32: accessible-point counts
    jbuf,  # VMEM scratch [2*A, 128]: double-buffered j-tiles
    sphere_b,  # VMEM scratch [3, P, A]: pre-broadcast sphere planes
    glist_ref,  # SMEM scratch [GROUPS_PER_TILE]: compacted group indices
    sems,  # DMA semaphores [2]
):
    a = planes_i_ref.shape[1]

    xi = planes_i_ref[0:1, :]
    yi = planes_i_ref[1:2, :]
    zi = planes_i_ref[2:3, :]
    reffi = planes_i_ref[3:4, :]
    gidi = planes_i_ref[4:5, :]
    r2i = reffi * reffi
    inv2ri = 0.5 / jnp.maximum(reffi, 1e-6)

    # Stage the lane-broadcast sphere planes in VMEM ONCE; the inner loop
    # stream-loads them per use.  Keeping them as live register values
    # (4 x 16 vregs) blows the register file and spills every inner op.
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

    def process(idx, occ):
        slot = jax.lax.rem(idx, 2)

        @pl.when(idx + 1 < cnt)
        def _():
            start_dma(1 - slot, idx + 1).start()

        # Branchless compaction of the host-computed group mask into a
        # tiny SMEM index list while the DMA is in flight: store the
        # group index unconditionally, advance the cursor only when its
        # mask bit is set.  Pure scalar-unit work, no lax.cond.
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

        def load_group(g):
            # 8 j-atoms per load: ONE sublane-sliced load replaces 40
            # dynamic scalar reads (measured ~23 cycles each).
            rows = jbuf[pl.ds(base + g * J_GROUP, J_GROUP), :]  # [8, 128]
            xk = rows[:, 0:1]
            yk = rows[:, 1:2]
            zk = rows[:, 2:3]
            rk = rows[:, 3:4]
            gk = rows[:, 4:5]
            vxg = xi - xk  # [8, A] outer broadcasts
            vyg = yi - yk
            vzg = zi - zk
            v2g = vxg * vxg + vyg * vyg + vzg * vzg
            limg = (rk * rk - v2g - r2i) * inv2ri
            limg = jnp.where((gidi == gk) | (gk == 0.0), _NEG_BIG, limg)
            return vxg, vyg, vzg, limg

        # Admitted groups stream in PAIRS: one loop iteration loads two
        # 8-atom groups and unrolls 16 [P,A] margin updates, so the
        # per-iteration overhead (glist reads, loop bookkeeping, prep
        # chains) amortizes over 16 j-atoms instead of 8 - measured 7.5%
        # faster than single-group streaming (scripts/r4_microkernel.py),
        # bit-identical results.  An odd count duplicates its last group;
        # the max-accumulate is idempotent, so that is free and exact.
        def kpair(k, occ):
            g1 = glist_ref[k * 2]
            g2 = glist_ref[jnp.minimum(k * 2 + 1, pos - 1)]
            vx1, vy1, vz1, l1 = load_group(g1)
            vx2, vy2, vz2, l2 = load_group(g2)
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

        return jax.lax.fori_loop(0, jax.lax.div(pos + 1, 2), kpair, occ)

    occ0 = jnp.full((sphere_ref.shape[0], a), _NEG_BIG)
    occ = jax.lax.fori_loop(0, cnt, process, occ0)

    # Occluded iff the accumulated margin is strictly positive
    # (matches the reference's `dot < limit` strict comparison, lib.rs:146).
    pv = sphere_ref[:, 3:4] * jnp.ones((1, a), dtype=jnp.float32)
    out_ref[...] = jnp.sum(
        jnp.where((occ <= 0.0) & (pv > 0.0), 1.0, 0.0),
        axis=0,
        keepdims=True,
    )


# Rows of the host->device transfer format: x, y, z, r_eff, gid(+1).
# The kernel works on N_PLANES(=8)-row blocks; the 3 spare rows are
# zero-padded ON DEVICE so they never ride the host link.
N_XFER_PLANES = 5


def _counts_call(planes, jlist, sphere128, *, interpret):
    """Shared pallas_call: 8-row planes [8, M] f32 -> counts [1, M] f32."""
    m = planes.shape[1]
    if jlist.dtype == jnp.uint32:
        # Bit-preserving: entries with group-mask bit 15 set would
        # overflow a value cast; the kernel decodes with logical shifts.
        jlist = jax.lax.bitcast_convert_type(jlist, jnp.int32)
    else:
        jlist = jlist.astype(jnp.int32)
    # Atom-major copy for j-tile DMAs, lane-padded to 128 (HBM slice
    # shapes must be 128-aligned in the minor dimension).
    planes_t = jnp.zeros((m, 128), dtype=jnp.float32)
    planes_t = planes_t.at[:, 0:N_PLANES].set(planes.T)
    t = m // ATOM_TILE
    p = sphere128.shape[0]
    t_pad = ((t + 7) // 8) * 8
    if jlist.shape[0] != t_pad:
        jlist = jnp.pad(jlist, ((0, t_pad - jlist.shape[0]), (0, 0)))

    return pl.pallas_call(
        _fused_count_kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((p, 128), lambda i: (0, 0)),
            pl.BlockSpec((N_PLANES, ATOM_TILE), lambda i: (0, i)),
            # J-lists ride in SMEM (8-tile windows): dynamic scalar
            # indexing on both dims is an SMEM capability.
            pl.BlockSpec(
                (8, JLIST_ROWS), lambda i: (i // 8, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # full planes, DMA'd
        ],
        out_specs=pl.BlockSpec((1, ATOM_TILE), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((1, m), jnp.float32),
        scratch_shapes=[
            # VMEM j-tile buffers: scalars are read with dynamic-sublane
            # indices (legal in Mosaic; SMEM DMAs measured far slower).
            pltpu.VMEM((2 * ATOM_TILE, 128), jnp.float32),
            pltpu.VMEM((3, p, ATOM_TILE), jnp.float32),
            pltpu.SMEM((GROUPS_PER_TILE,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(sphere128, planes, jlist, planes_t)


@functools.partial(
    jax.jit, static_argnames=("n_points", "out_dtype", "interpret")
)
def fused_sasa(
    planes5: jnp.ndarray,  # [N_XFER_PLANES, M] f32
    jlist: jnp.ndarray,  # [T, JLIST_ROWS] u32 (mask<<16)|tile_id
    sphere128: jnp.ndarray,  # [P, 128] f32
    *,
    n_points: int,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Legacy f32-planes entry (fallback path: non-unique gids etc.)."""
    m = planes5.shape[1]
    # Everything derivable from the 5 transfer planes is computed on
    # device: the high-latency host link moves 20B/atom-slot, not 44.
    planes = jnp.zeros((N_PLANES, m), dtype=jnp.float32)
    planes = planes.at[0:N_XFER_PLANES].set(planes5)
    r_eff = planes5[3]
    area = jnp.where(
        planes5[4] > 0.0,
        np.float32(4.0 * np.pi / n_points) * r_eff * r_eff,
        0.0,
    )
    counts = _counts_call(planes, jlist, sphere128, interpret=interpret)
    return (counts.reshape(m) * area).astype(out_dtype)


# Fixed radius dequant scale: r_eff = qr * 2^-13 (exact in f32); covers
# r_eff < 8 A at 1.2e-4 A resolution.  qr == 0 marks padding slots.
R_QUANT = 8192.0

# q13 wire format (6 B/atom-slot vs q16's 8): the host link is the
# narrowest resource and in degraded windows drops to ~30-40 MB/s
# (measured; calm ~86), where the 16.8 MB q16 chunk wire rivals the
# kernel itself.  Coordinates ride as 13-bit against the structure box
# (step = extent/8191 <= 0.0122 A at the 100 A cap; structures above
# the cap keep the noise-free q16 wire) and r_eff as an 8-bit
# index into a per-chunk palette of EXACT f32 values (ProtOr + probe
# resolve to ~21 distinct radii), so dequantized radii are bit-identical
# to the f32 path.  Layout (3x13 + 8 = 47 of 48 bits):
#   wire_a u32[M]: qx(13) | qy(13) | qz_hi(6)
#   wire_b u16[M]: qz_lo(7) | palette_index(8) | spare(1)
# palette[0] = 0 is reserved: index 0 marks padding slots.
# Measured (scripts/r5_qwire.py, real 2M chunk incl. h2d + readback, at
# the 12-bit draft of this format): 823.6 -> 782.5 ms/chunk calm-window;
# the saving scales inversely with link bandwidth, so congested windows
# gain 2-3x more.  Quality gate (88-PDB, deterministic): residue-chain
# RMSE 43.64 (q16-only) -> 45.92 (limit 63.99).  Caveat from measurement:
# 12-bit scored 44.67 - BETTER vs FreeSASA despite 2x the coordinate
# noise, because quantization biases SASA slightly upward (example.cif:
# +24 A^2 at 12-bit, +16 at 13-bit over the f32 path's 20096.6) and the
# larger bias happened to cancel against FreeSASA; 13-bit is strictly
# closer to our own exact f32 results, which is the fidelity that counts.
MAX_Q13_EXTENT = 100.0

# Band widths for the DEVICE-side culling path: a chunk whose largest
# structure has <= w tiles builds its j-lists on the TPU (see
# build_jlist_banded).  127 = JLIST_CAP, so a full band can never
# overflow a j-list row; chunks with bigger structures use the host
# culling path.  The ladder is finer at the small end: the banded
# build's cost is proportional to the band width nd = 2w-1, and typical
# AlphaFold-scale proteins (1-4k atoms = 8-32 tiles) otherwise pay a
# 32-tile band - w=16/24 cut the per-chunk build ~25-50% for them.
W_BUCKETS = (16, 24, 32, 64, 127)

# Slack for the device-side AABB cull.  Unlike the host cull (which must
# stay conservative across u16 quantization, CULL_SLACK=0.08), the
# device cull and the kernel read the SAME dequantized f32 coordinates,
# so only f32 rounding of the separation test needs covering (~1e-4 on
# protein-scale values).
DEVICE_CULL_SLACK = 0.01
# Conservative reach slack added during tile-pair culling so the cull
# stays valid for coordinates quantized at up to ~1300 A structure extent
# (u16 step <= 0.02 A; see quantize_packed).  Larger structures use the
# legacy f32 path.
CULL_SLACK = 0.08
MAX_Q_EXTENT = 1300.0


@functools.partial(jax.jit, static_argnames=("n_points", "interpret"))
def fused_sasa_q16(
    planes4: jnp.ndarray,  # [4, M] u16: qx, qy, qz, qr
    tparams: jnp.ndarray,  # [T, 4] f32: ox, oy, oz, cscale per tile
    jlist: jnp.ndarray,  # [T, JLIST_ROWS] u32 (mask<<16)|tile_id
    sphere128: jnp.ndarray,  # [P, 128] f32
    *,
    n_points: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Quantized-wire entry: 8B/atom-slot over the host link, occlusion
    COUNTS back (u8, or u16 when n_points > 255).

    The host link is this deployment's narrowest resource (~86 MB/s
    sustained, scripts/r3_split.py); coordinates ride as u16 against a
    per-structure box (step <= extent/65535, <= 0.002 A for typical
    proteins) and radii as u16 * 2^-13.  Gids are synthesized on device
    as the slot index - valid whenever the structure's gids are unique
    per atom (the packer verifies; others use the legacy path).  SASA is
    reconstructed on host as counts * 4*pi*r_eff^2/n, which is EXACT
    f32 - unlike the old f16 area readback.
    """
    m = planes4.shape[1]
    q = planes4.astype(jnp.float32)  # [4, M]
    par = jnp.repeat(tparams, ATOM_TILE, axis=0)  # [M, 4]
    planes = jnp.zeros((N_PLANES, m), dtype=jnp.float32)
    planes = planes.at[0].set(q[0] * par[:, 3] + par[:, 0])
    planes = planes.at[1].set(q[1] * par[:, 3] + par[:, 1])
    planes = planes.at[2].set(q[2] * par[:, 3] + par[:, 2])
    planes = planes.at[3].set(q[3] * np.float32(1.0 / R_QUANT))
    slot_gid = jnp.arange(m, dtype=jnp.float32) + 1.0
    planes = planes.at[4].set(jnp.where(q[3] > 0.0, slot_gid, 0.0))
    counts = _counts_call(planes, jlist, sphere128, interpret=interpret)
    out_dtype = jnp.uint8 if n_points <= 255 else jnp.uint16
    return counts.reshape(m).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("n_points", "w", "interpret"))
def fused_sasa_q13_banded(
    wire_a: jnp.ndarray,  # [M] u32: qx|qy|qz_hi
    wire_b: jnp.ndarray,  # [M] u16: qz_lo|palette_idx
    palette: jnp.ndarray,  # [256] f32 r_eff values, [0] = 0 (padding)
    tparams: jnp.ndarray,  # [T, 4] f32: ox, oy, oz, cscale per tile
    tmeta: jnp.ndarray,  # [T, 2] i32: (tile_start, ts_len) per tile
    sphere128: jnp.ndarray,  # [P, 128] f32
    *,
    n_points: int,
    w: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """6 B/slot wire + device-side culling (see MAX_Q13_EXTENT note)."""
    m = wire_a.shape[0]
    wa = wire_a.astype(jnp.uint32)
    wb = wire_b.astype(jnp.uint32)
    qx = (wa & 0x1FFF).astype(jnp.float32)
    qy = ((wa >> 13) & 0x1FFF).astype(jnp.float32)
    qz = (((wa >> 26) & 0x3F) << 7 | (wb & 0x7F)).astype(jnp.float32)
    ridx = ((wb >> 7) & 0xFF).astype(jnp.int32)
    # Gather-free palette lookup: a 2M-slot jnp.take measured ~17 ms on
    # device; the iota-compare select-sum fuses to ~2.4 ms and is EXACT
    # (picks the f32 palette value, adds only zeros).
    r_eff = jnp.sum(
        jnp.where(
            ridx[:, None]
            == jnp.arange(palette.shape[0], dtype=jnp.int32)[None, :],
            palette[None, :],
            0.0,
        ),
        axis=1,
    )
    par = jnp.repeat(tparams, ATOM_TILE, axis=0)
    planes = jnp.zeros((N_PLANES, m), dtype=jnp.float32)
    planes = planes.at[0].set(qx * par[:, 3] + par[:, 0])
    planes = planes.at[1].set(qy * par[:, 3] + par[:, 1])
    planes = planes.at[2].set(qz * par[:, 3] + par[:, 2])
    planes = planes.at[3].set(r_eff)
    qvalid = ridx > 0
    slot_gid = jnp.arange(m, dtype=jnp.float32) + 1.0
    planes = planes.at[4].set(jnp.where(qvalid, slot_gid, 0.0))
    jlist = build_jlist_banded(planes, qvalid, tmeta, w=w)
    counts = _counts_call(planes, jlist, sphere128, interpret=interpret)
    out_dtype = jnp.uint8 if n_points <= 255 else jnp.uint16
    return counts.reshape(m).astype(out_dtype)


def pack_structures_q13(structures: list, probe: float):
    """Host packing for the 6 B/slot q13 wire (numpy spec).

    Same contract as pack_structures_q16 but returns
    (wire_a [M] u32, wire_b [M] u16, palette [256] f32, tparams, tmeta,
    offsets), or None when any structure is ineligible (extent >
    MAX_Q13_EXTENT, or more than 255 distinct r_eff values in the chunk
    — e.g. occupancy-column radii) — the caller falls back to q16.
    The native C++ packer (fastpack_q13) implements the same layout.
    """
    from ..native import fastpack_q13

    out = fastpack_q13(structures, float(probe))
    if out is not None:
        return out if out != "ineligible" else None
    return _pack_structures_q13_numpy(structures, probe)


def _pack_structures_q13_numpy(structures: list, probe: float):
    tiles_per = [-(-s[0].shape[0] // ATOM_TILE) for s in structures]
    total_tiles = sum(tiles_per)
    if total_tiles > 65535:
        raise ValueError(
            f"chunk too large for u16 tile ids: {total_tiles} tiles"
        )
    m = total_tiles * ATOM_TILE
    wire_a = np.zeros(m, dtype=np.uint32)
    wire_b = np.zeros(m, dtype=np.uint16)
    tparams = np.zeros((total_tiles, 4), dtype=np.float32)
    tparams[:, 3] = 1.0
    tmeta = np.zeros((total_tiles, 2), dtype=np.int32)

    # Chunk-global radius palette, keyed by the exact qr bucket (1/8192 A
    # grid — ProtOr radii are spaced >= 0.01 A so buckets never collide).
    # Index 0 is reserved to mark padding slots.
    qr_to_idx = np.zeros(65536, dtype=np.uint16)
    palette = np.zeros(256, dtype=np.float32)
    n_pal = 1

    offsets = []
    tile0 = 0
    pos = 0
    for coords, radii, _gids in structures:
        n = coords.shape[0]
        nt = -(-n // ATOM_TILE)
        center = np.round(
            coords.mean(axis=0, dtype=np.float64) * 256.0
        ) / 256.0
        c = coords - center.astype(np.float32)
        order = np.argsort(_morton_codes(c), kind="stable")
        inv = np.empty(n, dtype=np.int64)
        inv[order] = np.arange(n)
        c = c[order]
        r_eff = (radii[order] + np.float32(probe)).astype(np.float32)

        cmin = c.min(axis=0)
        extent = float((c.max(axis=0) - cmin).max())
        if not extent <= MAX_Q13_EXTENT:  # NaN-safe negation
            return None
        scale = np.float32(max(extent, 1e-6) / 8191.0)
        q = np.clip(
            np.rint((c - cmin[None, :]) / scale), 0, 8191
        ).astype(np.uint32)

        qr = np.rint(r_eff * R_QUANT)
        if not (
            float(qr.max(initial=0.0)) <= 65535.0
            and float(qr.min(initial=1.0)) >= 1.0
        ):  # NaN-safe negation
            return None
        qr = qr.astype(np.int64)
        # Palette registration in INPUT-atom order (first-seen), exactly
        # like the native packer's prescan, so both emit identical bytes.
        r_in = (np.asarray(radii, dtype=np.float32) + np.float32(probe))
        qr_in = np.rint(r_in * R_QUANT).astype(np.int64)
        uniq, first = np.unique(qr_in, return_index=True)
        for u in uniq[np.argsort(first)]:
            if qr_to_idx[u] == 0:
                if n_pal >= 256:
                    return None
                # Exact f32 value for this bucket (first occurrence).
                palette[n_pal] = r_in[qr_in == u][0]
                qr_to_idx[u] = n_pal
                n_pal += 1
        ridx = qr_to_idx[qr].astype(np.uint32)

        sl = slice(pos, pos + n)
        wire_a[sl] = q[:, 0] | (q[:, 1] << 13) | ((q[:, 2] >> 7) << 26)
        wire_b[sl] = ((q[:, 2] & 0x7F) | (ridx << 7)).astype(np.uint16)
        t0, t1 = tile0, tile0 + nt
        tparams[t0:t1, 0:3] = cmin
        tparams[t0:t1, 3] = scale
        tmeta[t0:t1, 0] = tile0
        tmeta[t0:t1, 1] = nt
        offsets.append((pos, n, inv))
        tile0 += nt
        pos += nt * ATOM_TILE
    return wire_a, wire_b, palette, tparams, tmeta, offsets


def build_jlist_banded(
    planes: jnp.ndarray,  # [N_PLANES, M] f32 dequantized
    qvalid: jnp.ndarray,  # [M] bool (real atom slots)
    tmeta: jnp.ndarray,  # [T, 2] i32: (first tile of own structure, n tiles)
    *,
    w: int,
) -> jnp.ndarray:
    """Tile-pair culling ON DEVICE -> [T, JLIST_ROWS] i32 j-lists.

    The host culling path (pack_structures) spends most of its CPU on the
    [nt x nt] AABB tests, group masks and nearest-first sort, and ships
    512B/tile of j-lists over the narrow host link.  On this 2-core host
    that work IS the pipeline bottleneck, so the banded path moves it to
    the TPU: tiles of one structure occupy a contiguous index band
    (tile_start .. tile_start+ts_len), so each i-tile tests exactly the
    `w`-wide band of its own structure (w static, >= max tiles/structure
    in the chunk).  AABBs are reduced from the SAME dequantized
    coordinates the kernel reads; the 16-bit 8-atom-group masks use
    per-i-atom point-to-box admission (tighter than the host packer's
    box-box test - the kernel's result is admission-order- and
    admission-set-invariant as long as culling stays conservative), and
    w <= JLIST_CAP makes row overflow impossible by construction.
    Nearest-first (AABB separation) row order kept for determinism.
    """
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
    slack = jnp.float32(DEVICE_CULL_SLACK)
    iidx = jnp.arange(t, dtype=jnp.int32)
    end = start + ts_len

    # Candidates are indexed by RELATIVE tile offset d = j - i, d in
    # (-w, w): a gather-free formulation (XLA gathers measured ~10x the
    # cost of the whole rest of this build on TPU).  The shifted j-tile
    # views come from static slices of a padded array, stacked into ONE
    # [2w-1, T, ...] tensor so every test below is a single wide op (a
    # 63-step python loop of tiny ops was overhead-bound).  Per-row
    # validity (j inside the structure's own band) caps actives at
    # ts_len <= w <= JLIST_CAP, so overflow stays impossible.
    nd = 2 * w - 1

    def shifted(x):
        """[T, ...] -> [nd, T, ...]: window d holds x[i + d - (w-1)]."""
        pad = [(w - 1, w - 1)] + [(0, 0)] * (x.ndim - 1)
        xp = jnp.pad(x, pad)
        return jnp.stack(
            [jax.lax.slice_in_dim(xp, d, d + t, axis=0) for d in range(nd)]
        )

    offs = jnp.arange(-(w - 1), w, dtype=jnp.int32)  # [nd]
    j = iidx[None, :] + offs[:, None]  # [nd, T]
    valid = (j >= start[None, :]) & (j < end[None, :])

    jt_min = shifted(tmin)  # [nd, T, 3]
    jt_max = shifted(tmax)
    jt_maxr = shifted(tmaxr)  # [nd, T]
    gap = jnp.maximum(
        jnp.maximum(tmin[None] - jt_max, jt_min - tmax[None]), 0.0
    )
    sep2 = jnp.sum(gap * gap, axis=-1)  # [nd, T]
    reach = tmaxr[None] + jt_maxr + slack
    act = valid & (sep2 <= reach * reach)

    # Fine granularity: every i-ATOM (point + its own r_eff) vs the
    # j-tile's 16 8-atom-group AABBs.  A 128-atom Morton range is often
    # L-shaped; any box drawn around parts of it covers empty space and
    # falsely admits j-groups no i-atom can reach.  Point-to-box
    # admission is the tightest i-side test available without pair
    # distances and stays conservative: the point-box gap lower-bounds
    # every (i-atom, j-atom) distance and r_i + jg_max_r upper-bounds
    # pair reach.  Measured on 60 real structures
    # (scripts/r4_cull_granularity.py): streamed j/atom 1185 (4x32-atom
    # i-sub-boxes, round-3) -> 911 here, vs a 733 group-granularity
    # floor; finer i-BOXES were a dead end (16x8-atom boxes: 1141).
    # Kernel counts are bit-identical; the extra build cost (~60ms/2M
    # chunk, HBM-bound over the [nd,T,16,A] test space) buys ~120ms of
    # kernel time (scripts/r4_atombox.py).
    c_t = jnp.where(qvalid[:, None], c, big).reshape(t, ATOM_TILE, 3)
    r_t = rmasked.reshape(t, ATOM_TILE)
    jg_min = shifted(gmin.reshape(t, GROUPS_PER_TILE, 3))  # [nd, T, 16, 3]
    jg_max = shifted(gmax.reshape(t, GROUPS_PER_TILE, 3))
    jg_maxr = shifted(gmaxr.reshape(t, GROUPS_PER_TILE))  # [nd, T, 16]

    def one_shift(args):
        mn, mx, mr = args  # [T, 16, 3] x2, [T, 16]
        g = jnp.maximum(
            jnp.maximum(
                mn[:, :, None, :] - c_t[:, None, :, :],
                c_t[:, None, :, :] - mx[:, :, None, :],
            ),
            0.0,
        )  # [T, 16, A, 3]
        pb2 = jnp.sum(g * g, axis=-1)  # [T, 16, A]
        rr = r_t[:, None, :] + mr[:, :, None] + slack
        # Float max-reduce + one compare instead of bool any-reduce:
        # identical admissions (rr^2 - pb2 >= 0 <=> pb2 <= rr^2; padding
        # slots have r_t = 0 and far-away coords, so their margins are
        # hugely negative), measured 20% faster for the whole banded
        # build (101.3 vs 126.3 ms standalone, /tmp-era r5 fine-layout
        # A/B; the [T,16,A]->[T,16] bool reduction was the bottleneck).
        return jnp.max(rr * rr - pb2, axis=-1) >= 0.0  # [T, 16]

    bits = jax.lax.map(one_shift, (jg_min, jg_max, jg_maxr))  # [nd, T, 16]
    mask = jnp.sum(
        jnp.where(bits, jnp.int32(1), jnp.int32(0))
        << jnp.arange(GROUPS_PER_TILE, dtype=jnp.int32)[None, None, :],
        axis=-1,
    )  # [nd, T] i32, 16 low bits used
    act = act & (mask > 0)

    # Nearest-first compaction: sort each band row by masked separation;
    # inactive entries sink to the end with +inf keys.
    key = jnp.where(act, sep2, jnp.float32(np.inf)).T  # [T, nd]
    entries = (jax.lax.shift_left(mask, 16) | j).T
    key_s, ent_s = jax.lax.sort((key, entries), num_keys=1, dimension=1)
    count = jnp.sum(act, axis=0).astype(jnp.int32)
    nkeep = min(nd, JLIST_CAP)
    jlist = jnp.zeros((t, JLIST_ROWS), dtype=jnp.int32)
    jlist = jlist.at[:, 0].set(count)
    jlist = jlist.at[:, 1:1 + nkeep].set(ent_s[:, :nkeep])
    return jlist


@functools.partial(
    jax.jit, static_argnames=("n_points", "w", "interpret")
)
def fused_sasa_q16_banded(
    planes4: jnp.ndarray,  # [4, M] u16: qx, qy, qz, qr
    tparams: jnp.ndarray,  # [T, 4] f32: ox, oy, oz, cscale per tile
    tmeta: jnp.ndarray,  # [T, 2] i32: (tile_start, ts_len) per tile
    sphere128: jnp.ndarray,  # [P, 128] f32
    *,
    n_points: int,
    w: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Quantized wire + DEVICE-side culling: 8B/atom-slot in (no j-lists
    ride the link), occlusion counts (u8/u16) back.  One jit: dequant,
    banded AABB culling (build_jlist_banded) and the Pallas kernel fuse
    into a single dispatch.
    """
    m = planes4.shape[1]
    q = planes4.astype(jnp.float32)  # [4, M]
    par = jnp.repeat(tparams, ATOM_TILE, axis=0)  # [M, 4]
    planes = jnp.zeros((N_PLANES, m), dtype=jnp.float32)
    planes = planes.at[0].set(q[0] * par[:, 3] + par[:, 0])
    planes = planes.at[1].set(q[1] * par[:, 3] + par[:, 1])
    planes = planes.at[2].set(q[2] * par[:, 3] + par[:, 2])
    planes = planes.at[3].set(q[3] * np.float32(1.0 / R_QUANT))
    slot_gid = jnp.arange(m, dtype=jnp.float32) + 1.0
    qvalid = q[3] > 0.0
    planes = planes.at[4].set(jnp.where(qvalid, slot_gid, 0.0))
    jlist = build_jlist_banded(planes, qvalid, tmeta, w=w)
    counts = _counts_call(planes, jlist, sphere128, interpret=interpret)
    out_dtype = jnp.uint8 if n_points <= 255 else jnp.uint16
    return counts.reshape(m).astype(out_dtype)


def pack_structures_q16(structures: list, probe: float):
    """Host packing for the banded device-cull path (numpy spec).

    Per structure: center (f64 mean rounded to a 1/256 A grid), Morton
    sort, quantize coordinates to u16 against the structure's own box and
    r_eff to u16/8192 - NO neighbor work; culling happens on device
    (build_jlist_banded).  Returns
    (planes4 [4, M] u16, tparams [T, 4] f32, tmeta [T, 2] i32, offsets)
    with offsets[i] = (slot, n, inv), or None when any structure is
    unquantizable (extent > MAX_Q_EXTENT or r_eff >= 8 A) - the caller
    falls back to the f32/host-cull path.  The native C++ packer
    (fastpack_q16) implements the same layout bit-identically.
    """
    from ..native import fastpack_q16

    out = fastpack_q16(structures, float(probe))
    if out is not None:
        return out
    return _pack_structures_q16_numpy(structures, probe)


def _pack_structures_q16_numpy(structures: list, probe: float):
    tiles_per = [-(-s[0].shape[0] // ATOM_TILE) for s in structures]
    total_tiles = sum(tiles_per)
    if total_tiles > 65535:
        raise ValueError(
            f"chunk too large for u16 tile ids: {total_tiles} tiles"
        )
    m = total_tiles * ATOM_TILE
    planes4 = np.zeros((4, m), dtype=np.uint16)
    tparams = np.zeros((total_tiles, 4), dtype=np.float32)
    tparams[:, 3] = 1.0
    tmeta = np.zeros((total_tiles, 2), dtype=np.int32)

    offsets = []
    tile0 = 0
    pos = 0
    for coords, radii, _gids in structures:
        n = coords.shape[0]
        nt = -(-n // ATOM_TILE)
        center = np.round(
            coords.mean(axis=0, dtype=np.float64) * 256.0
        ) / 256.0
        c = coords - center.astype(np.float32)
        order = np.argsort(_morton_codes(c), kind="stable")
        inv = np.empty(n, dtype=np.int64)
        inv[order] = np.arange(n)
        c = c[order]
        r_eff = radii[order] + np.float32(probe)

        cmin = c.min(axis=0)
        extent = float((c.max(axis=0) - cmin).max())
        if not extent <= MAX_Q_EXTENT:  # NaN-safe negation
            return None
        scale = np.float32(max(extent, 1e-6) / 65535.0)
        q = np.rint((c - cmin[None, :]) / scale)
        planes4[0:3, pos:pos + n] = np.clip(q, 0, 65535).astype(np.uint16).T
        qr = np.rint(r_eff * R_QUANT)
        if not float(qr.max(initial=0.0)) <= 65535.0:  # NaN-safe
            return None
        planes4[3, pos:pos + n] = np.maximum(qr, 1.0).astype(np.uint16)
        t0, t1 = tile0, tile0 + nt
        tparams[t0:t1, 0:3] = cmin
        tparams[t0:t1, 3] = scale
        tmeta[t0:t1, 0] = tile0
        tmeta[t0:t1, 1] = nt
        offsets.append((pos, n, inv))
        tile0 += nt
        pos += nt * ATOM_TILE
    return planes4, tparams, tmeta, offsets


def quantize_packed(planes5: np.ndarray, spans: list) -> tuple:
    """Quantize f32 transfer planes -> (planes4 u16 [4,M], tparams [T,4]).

    spans: list of (pos, n) slot ranges, one per packed structure (padding
    slots between spans get qr=0).  Returns None if any structure's extent
    exceeds MAX_Q_EXTENT (caller falls back to the f32 path).

    The packers center coordinates per structure, so the box is symmetric
    and small; one uniform scale per structure keeps the grid isotropic.
    """
    m = planes5.shape[1]
    t = m // ATOM_TILE
    planes4 = np.zeros((4, m), dtype=np.uint16)
    tparams = np.zeros((t, 4), dtype=np.float32)
    tparams[:, 3] = 1.0  # neutral scale for unused tiles
    for pos, n in spans:
        if n == 0:
            continue
        sl = slice(pos, pos + n)
        c = planes5[0:3, sl]
        cmin = c.min(axis=1)
        extent = float((c.max(axis=1) - cmin).max())
        if not extent <= MAX_Q_EXTENT:  # NaN-safe negation
            return None
        scale = np.float32(max(extent, 1e-6) / 65535.0)
        q = np.rint((c - cmin[:, None]) / scale)
        planes4[0:3, sl] = np.clip(q, 0, 65535).astype(np.uint16)
        qr = np.rint(planes5[3, sl] * R_QUANT)
        if not float(qr.max(initial=0.0)) <= 65535.0:  # NaN-safe
            return None  # r_eff >= 8 A: exotic probe/radius, f32 path
        planes4[3, sl] = np.maximum(qr, 1.0).astype(np.uint16)
        t0, t1 = pos // ATOM_TILE, -(-(pos + n) // ATOM_TILE)
        tparams[t0:t1, 0:3] = cmin
        tparams[t0:t1, 3] = scale
    return planes4, tparams


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
    Returns (planes [5, M], jlist [T, 128] u32 (mask<<16)|id, offsets,
    failed) where
    offsets[i] = (start, n, perm_inverse) for unpacking results and
    `failed` lists input indices whose tiling overflowed JLIST_CAP
    (callers route those through the list-based path); their offsets are
    None and their slots are zeroed.

    Dispatches to the native C++ packer (native/fastparse.cpp fastpack,
    same layout contract, parity-tested) when the library is available;
    this numpy implementation is the fallback and the executable spec.
    """
    from ..native import fastpack

    out = fastpack(structures, float(probe))
    if out is not None:
        return out
    return _pack_structures_numpy(structures, probe, n_points)


def _pack_structures_numpy(structures, probe, n_points):
    tiles_per = [-(-s[0].shape[0] // ATOM_TILE) for s in structures]
    total_tiles = sum(tiles_per)
    if total_tiles > 65535:
        raise ValueError(
            f"chunk too large for u16 tile ids: {total_tiles} tiles"
        )
    m = total_tiles * ATOM_TILE
    planes = np.zeros((N_XFER_PLANES, m), dtype=np.float32)
    jlist = np.zeros((total_tiles, JLIST_ROWS), dtype=np.uint32)

    offsets = []
    failed: list[int] = []
    tile0 = 0
    pos = 0
    for s_i, (coords, radii, gids) in enumerate(structures):
        n = coords.shape[0]
        nt = tiles_per[s_i]
        # Center per structure: |c| ~ 30 instead of ~300 keeps every f32
        # intermediate (|v|^2, dot chains) well away from cancellation.
        # Rounding the f64 mean to a 1/256 A grid makes the center - and
        # hence the whole packing - bit-identical to the native C++
        # packer, whose sequential f64 sum orders differently.
        center = np.round(
            coords.mean(axis=0, dtype=np.float64) * 256.0
        ) / 256.0
        coords = coords - center.astype(np.float32)
        order = np.argsort(_morton_codes(coords), kind="stable")
        inv = np.empty(n, dtype=np.int64)
        inv[order] = np.arange(n)
        c = coords[order]
        r_eff = radii[order] + np.float32(probe)
        g = gids[order].astype(np.float64) + 1.0

        planes[0:3, pos:pos + n] = c.T
        planes[3, pos:pos + n] = r_eff
        planes[4, pos:pos + n] = g

        # Vectorized per-tile AND per-8-group AABBs + max reach; padding
        # slots are neutral.
        slots = nt * ATOM_TILE
        ng = nt * GROUPS_PER_TILE
        big = np.float32(3e4)
        cmin = np.full((slots, 3), big, dtype=np.float32)
        cmin[:n] = c
        cmax = np.full((slots, 3), -big, dtype=np.float32)
        cmax[:n] = c
        rpad = np.zeros(slots, dtype=np.float32)
        rpad[:n] = r_eff
        gmin = cmin.reshape(ng, J_GROUP, 3).min(axis=1)
        gmax = cmax.reshape(ng, J_GROUP, 3).max(axis=1)
        gmaxr = rpad.reshape(ng, J_GROUP).max(axis=1)
        tmin = gmin.reshape(nt, GROUPS_PER_TILE, 3).min(axis=1)
        tmax = gmax.reshape(nt, GROUPS_PER_TILE, 3).max(axis=1)
        tmaxr = gmaxr.reshape(nt, GROUPS_PER_TILE).max(axis=1)

        # Host-side tile-pair culling: [nt, nt] AABB separation test.
        gap = np.maximum(
            np.maximum(
                tmin[:, None, :] - tmax[None, :, :],
                tmin[None, :, :] - tmax[:, None, :],
            ),
            0.0,
        )
        sep2 = (gap * gap).sum(axis=2)
        # CULL_SLACK keeps the cull conservative under u16 coordinate
        # quantization (quantize_packed) - the kernel sees coordinates
        # moved by up to ~0.01 A relative to the f32 values culled here.
        reach = tmaxr[:, None] + tmaxr[None, :] + np.float32(CULL_SLACK)
        active = sep2 <= reach * reach  # [nt_i, nt_j]
        ii, jj = np.nonzero(active)
        masks = np.zeros(len(ii), dtype=np.uint32)
        if len(ii):
            # Fine culling: i-tile AABB vs each of the j-tile's 16 8-atom
            # group AABBs -> 16-bit mask per admitted pair.  The kernel
            # streams ONLY masked-in groups (the measured gap: ~2035
            # admitted j/atom at tile granularity vs ~875 at group
            # granularity).
            jg = (jj[:, None] * GROUPS_PER_TILE
                  + np.arange(GROUPS_PER_TILE)[None, :])  # [p, 16]
            ggap = np.maximum(
                np.maximum(
                    tmin[ii][:, None, :] - gmax[jg],
                    gmin[jg] - tmax[ii][:, None, :],
                ),
                0.0,
            )
            gsep2 = (ggap * ggap).sum(axis=2)  # [p, 16]
            greach = (tmaxr[ii][:, None] + gmaxr[jg]
                      + np.float32(CULL_SLACK))
            bits = gsep2 <= greach * greach  # [p, 16]
            masks = (
                bits.astype(np.uint32)
                << np.arange(GROUPS_PER_TILE, dtype=np.uint32)[None, :]
            ).sum(axis=1, dtype=np.uint32)
            # Pairs whose tile AABBs touch but no group does: drop.
            keep = masks != 0
            ii, jj, masks = ii[keep], jj[keep], masks[keep]
            pair_sep2 = sep2[ii, jj]
        counts = np.bincount(ii, minlength=nt)
        if counts.max(initial=0) > JLIST_CAP:
            # Pathological tiling (e.g. Morton folds spanning the box):
            # zero this structure's slots and let the caller reroute it.
            planes[:, pos:pos + n] = 0.0
            failed.append(s_i)
            offsets.append(None)
            tile0 += nt
            pos += nt * ATOM_TILE
            continue
        sl = slice(tile0, tile0 + nt)
        jlist[sl, 0] = counts
        if len(ii):
            # Deterministic nearest-first order within each row (by AABB
            # separation): keeps this packer bit-compatible with the
            # native C++ packer and the device-side banded builder, which
            # sort the same way.  (The shipped kernel streams branchlessly
            # - order does not affect its speed.)
            row_order = np.lexsort((pair_sep2, ii))
            ii = ii[row_order]
            jj = jj[row_order]
            masks = masks[row_order]
            starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
            row_pos = np.arange(len(ii)) - np.repeat(starts, counts)
            jlist[tile0 + ii, 1 + row_pos] = (
                (masks << np.uint32(16)) | (jj + tile0).astype(np.uint32)
            )

        offsets.append((pos, n, inv))
        tile0 += nt
        pos += nt * ATOM_TILE

    return planes, jlist, offsets, failed

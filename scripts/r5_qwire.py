"""Round-5 wire-format experiment: 8B -> 6B per atom-slot h2d.

This deployment's host link is the narrowest resource, and in degraded
windows it drops to ~30-40 MB/s (measured in-session; calm ~86 MB/s,
scripts/r3_split.py) — at 36 MB/s the 16.8MB q16 chunk wire costs
~450 ms, comparable to the whole kernel.  Candidate format:

  wireA u32[M]: qx(12) | qy(12) | qz_hi(8)
  wireB u16[M]: qz_lo(4) | radius_palette_index(8) | spare(4)
  palette f32[256]: exact r_eff values (radius + probe resolve to ~21
  distinct f32s from the ProtOr table, so the palette is tiny and the
  dequantized radii are BIT-EXACT vs the f32 path)

Coordinates quantize to 12 bits against the structure box: step =
extent/4095 <= 0.02 A for extent <= 100 A (0.024 worst-case, vs the 0.02 bound
today's q16 path accepts at its 1300 A extent cap.  Structures over the
cap keep the q16 path.  qz==0 can't mark padding anymore (z loses its
low bits), so padding slots are marked by palette index 0 with
palette[0] = 0.0 reserved.
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

ATOM_TILE = 128
W = 32
M_PAD = 2097152
CORPUS = "/tmp/rustsasa_tpu_bench_corpus"
MAX_Q12_EXTENT = 100.0


@jax.jit
def _tiny(x):
    return x * 1.0


def sync():
    np.asarray(_tiny(np.zeros(8, np.float32)))


def pack_q12(structures, probe):
    """Numpy spec of the 6B/slot packer (C++ port follows the winner)."""
    tiles_per = [-(-s[0].shape[0] // ATOM_TILE) for s in structures]
    total_tiles = sum(tiles_per)
    m = total_tiles * ATOM_TILE
    wire_a = np.zeros(m, dtype=np.uint32)
    wire_b = np.zeros(m, dtype=np.uint16)
    tparams = np.zeros((total_tiles, 4), dtype=np.float32)
    tparams[:, 3] = 1.0
    tmeta = np.zeros((total_tiles, 2), dtype=np.int32)

    # Palette: index 0 reserved for padding slots.
    palette_vals: dict[float, int] = {}
    palette = [np.float32(0.0)]

    offsets = []
    tile0 = 0
    pos = 0
    for coords, radii, _g in structures:
        n = coords.shape[0]
        nt = -(-n // ATOM_TILE)
        center = np.round(
            coords.mean(axis=0, dtype=np.float64) * 256.0
        ) / 256.0
        c = coords - center.astype(np.float32)
        order = np.argsort(fk._morton_codes(c), kind="stable")
        inv = np.empty(n, dtype=np.int64)
        inv[order] = np.arange(n)
        c = c[order]
        r_eff = (radii[order] + np.float32(probe)).astype(np.float32)

        cmin = c.min(axis=0)
        extent = float((c.max(axis=0) - cmin).max())
        if extent > MAX_Q12_EXTENT:
            return None
        scale = np.float32(max(extent, 1e-6) / 4095.0)
        q = np.clip(
            np.rint((c - cmin[None, :]) / scale), 0, 4095
        ).astype(np.uint32)
        ridx = np.empty(n, dtype=np.uint32)
        for k, rv in enumerate(r_eff):
            key = float(rv)
            idx = palette_vals.get(key)
            if idx is None:
                if len(palette) >= 256:
                    return None
                idx = len(palette)
                palette_vals[key] = idx
                palette.append(np.float32(key))
            ridx[k] = idx
        sl = slice(pos, pos + n)
        wire_a[sl] = q[:, 0] | (q[:, 1] << 12) | ((q[:, 2] >> 4) << 24)
        wire_b[sl] = ((q[:, 2] & 0xF) | (ridx << 4)).astype(np.uint16)
        t0, t1 = tile0, tile0 + nt
        tparams[t0:t1, 0:3] = cmin
        tparams[t0:t1, 3] = scale
        tmeta[t0:t1, 0] = tile0
        tmeta[t0:t1, 1] = nt
        offsets.append((pos, n, inv))
        tile0 += nt
        pos += nt * ATOM_TILE
    pal = np.zeros(256, dtype=np.float32)
    pal[: len(palette)] = palette
    return wire_a, wire_b, pal, tparams, tmeta, offsets


@functools.partial(jax.jit, static_argnames=("n_points", "w"))
def fused_sasa_q12_banded(
    wire_a, wire_b, palette, tparams, tmeta, sphere128, *, n_points, w
):
    m = wire_a.shape[0]
    wa = wire_a.astype(jnp.uint32)
    wb = wire_b.astype(jnp.uint32)
    qx = (wa & 0xFFF).astype(jnp.float32)
    qy = ((wa >> 12) & 0xFFF).astype(jnp.float32)
    qz = (((wa >> 24) & 0xFF) << 4 | (wb & 0xF)).astype(jnp.float32)
    ridx = ((wb >> 4) & 0xFF).astype(jnp.int32)
    r_eff = jnp.take(palette, ridx)
    par = jnp.repeat(tparams, ATOM_TILE, axis=0)
    planes = jnp.zeros((fk.N_PLANES, m), dtype=jnp.float32)
    planes = planes.at[0].set(qx * par[:, 3] + par[:, 0])
    planes = planes.at[1].set(qy * par[:, 3] + par[:, 1])
    planes = planes.at[2].set(qz * par[:, 3] + par[:, 2])
    planes = planes.at[3].set(r_eff)
    qvalid = ridx > 0
    slot_gid = jnp.arange(m, dtype=jnp.float32) + 1.0
    planes = planes.at[4].set(jnp.where(qvalid, slot_gid, 0.0))
    jlist = fk.build_jlist_banded(planes, qvalid, tmeta, w=w)
    counts = fk._counts_call(planes, jlist, sphere128, interpret=False)
    out_dtype = jnp.uint8 if n_points <= 255 else jnp.uint16
    return counts.reshape(m).astype(out_dtype)


def main():
    files = sorted(os.listdir(CORPUS))
    pool = ThreadPoolExecutor(max_workers=4)

    def load(p):
        return native_process_file(
            os.path.join(CORPUS, p), level="residue",
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

    planes4, tparams16, tmeta16, _ = fk.pack_structures_q16(triples, 1.4)
    m = planes4.shape[1]
    pad_t = (M_PAD - m) // ATOM_TILE
    planes4 = np.pad(planes4, ((0, 0), (0, M_PAD - m)))
    tparams16 = np.pad(tparams16, ((0, pad_t), (0, 0)))
    tmeta16 = np.pad(tmeta16, ((0, pad_t), (0, 0)))

    t0 = time.time()
    q12 = pack_q12(triples, 1.4)
    t_pack12 = time.time() - t0
    assert q12 is not None
    wire_a, wire_b, pal, tparams12, tmeta12, _ = q12
    wire_a = np.pad(wire_a, (0, M_PAD - m))
    wire_b = np.pad(wire_b, (0, M_PAD - m))
    tparams12 = np.pad(tparams12, ((0, pad_t), (0, 0)))
    tmeta12 = np.pad(tmeta12, ((0, pad_t), (0, 0)))
    print(f"{len(triples)} structures, {n_atoms} atoms; "
          f"q12 numpy pack {t_pack12:.2f}s, palette {int(pal.argmin())}",
          flush=True)

    sphere = np.zeros((104, 128), np.float32)
    sphere[:, 0:4] = _sphere_packed(100)
    d_sp = jax.device_put(sphere)
    sync()

    # End-to-end dispatch timing INCLUDING the h2d of the wire arrays
    # (numpy in, like the engine does): this is what the pipeline pays.
    ref = None
    for name, fn in (
        ("q16", lambda: fk.fused_sasa_q16_banded(
            planes4, tparams16, tmeta16, d_sp, n_points=100, w=W)),
        ("q12", lambda: fused_sasa_q12_banded(
            wire_a, wire_b, pal, tparams12, tmeta12, d_sp,
            n_points=100, w=W)),
    ):
        counts = np.asarray(fn())
        times = []
        for _ in range(4):
            sync()
            t0 = time.perf_counter()
            out = fn()
            _ = np.asarray(out)
            times.append(time.perf_counter() - t0)
        tbest = min(times)
        if ref is None:
            ref = counts
            dmax = 0
        else:
            dmax = int(np.abs(
                counts.astype(np.int32) - ref.astype(np.int32)
            ).max())
            nd = int((counts != ref).sum())
            print(f"  count deltas: max {dmax}, n_diff {nd}")
        print(
            f"{name:4s} warm best {tbest * 1e3:7.1f}ms  "
            f"{n_atoms / tbest / 1e6:6.2f} Matoms/s (incl. h2d)",
            flush=True,
        )


if __name__ == "__main__":
    main()

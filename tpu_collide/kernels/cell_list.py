"""Cell-list layout: the data structure feeding the fused Pallas kernel.

XLA's general gather lowers poorly on TPU (measured ~190 ms for one 16k x
216 candidate gather block at 1M objects — gathers, not math, dominate the
pure-XLA detection path at scale). The cell list removes gathers entirely:

  * ONE multi-operand `lax.sort` (key = flat cell id) co-sorts every field —
    no argsort + per-field gather round-trips;
  * cells are ordered band-major: the x axis splits into bands of
    `band_cells` cells and the sort key is (band, z, y, x-within-band). A
    "brow" (band-local cell-row: one y, one z, one band) is contiguous in
    sorted order, so each tile's broad-phase candidates are a small static
    set of contiguous windows — one per (band shift, z shift) combination.
    With one band this is exactly the classic (z, y, x) order (windows:
    1 in 2D, 3 in 3D). With ~square bands (auto_band_cells) each 128-object
    storage row covers a compact patch instead of a kilometers-long x strip.
    NB: measured a WASH at 1M (BENCH_NOTES "Kernel v3") — a row's x-extent
    equals the band width, so the x-guard cannot prune adjacent bands and
    the unbanded layout was already at its row-granularity pruning floor.
    Kept as a parity-tested option for density regimes where candidate
    geometry differs;
  * fields are laid out 2D as [R, LANE] so every Mosaic DMA is a statically
    8-row-aligned 2D slice, and every compute access is a FULL dynamic row —
    Mosaic crashes on dynamic 1D offsets and on lane sub-slices of
    dynamically-indexed rows (found empirically); tiles are TILE = 8*LANE
    objects = 8 rows (see the LANE/TILE constants below);
  * per-tile window tables (start row, row count, brow range) are computed
    here; the kernel masks alignment padding exactly using each candidate's
    brow id (carried as a field), so no phantom pairs and no double
    counting.

Capacity: windows are clamped to `window_max` elements; the excess is
counted in `overflow` (never silently dropped — SURVEY.md hard part #1).

Kernel-path constraint: stencil halfwidth 1 (cell_size >= search_radius),
asserted.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from tpu_collide.core.config import SystemConfig
from tpu_collide.core.state import ObjectState

import os

LANE = 128          # elements per storage row (1 VPU lane-group)
# objects per kernel tile (fused_detect processes TILE//LANE own storage
# rows per grid step; window DMA starts align to one tile). 2048 halves
# the per-tile fixed costs (window DMA re-reads, slot init, loop setup)
# vs the round-2 tile of 1024; overridable for A/B probes.
TILE = int(os.environ.get("TPU_COLLIDE_TILE", "1024"))
ALIGN = TILE
assert TILE % (8 * LANE) == 0, "TILE must be a multiple of 8 storage rows"


# `row` is the brow id, -1 for dead/padding objects — it doubles as the
# validity flag (row >= 0 <=> alive), so no separate `valid` field rides
# through the sort/DMA path.
FIELD_NAMES = ("x", "y", "z", "vx", "vy", "vz", "ax", "ay", "az",
               "size", "heading", "otype", "oid", "row")
# z-component field indices (z, vz, az) — identically 0 for 2D worlds, so
# their sort operands, kernel DMAs and block math are compiled out there.
Z_FIELD_IDX = (2, 5, 8)


# Packed SMEM guard-table encodings (tables_packed=True). The per-storage-row
# tables are the kernel's SMEM bill; at 10M objects (R=78k rows) separate
# lo/hi tables blow the ~1 MB SMEM budget, so each pair packs into one int32:
#   rb  = (brow_lo) * ROW_PACK + (brow_hi + 2)                (rhi >= -1)
#   x   = floor(xlo - world_lo) * X_PACK + ceil(xhi - world_lo) + 1
# Packing caps brow ids below ROW_PACK - 2, so banded layouts (whose brow
# count is nbands * ny * nz) use separate lo/hi tables whenever they fit the
# budget — chosen automatically in build_cell_list. X bounds are quantized
# to whole meters RELATIVE to world lo only in PACKED mode (conservative:
# 1 m slack vs a >= 1 m search radius); unpacked mode carries raw f32
# (lo, hi) pairs — exact bounds, no per-iteration div/mod in the kernel,
# and no 32.7 km world-extent cap.
ROW_PACK = 32768     # packed mode: brow ids must stay below ROW_PACK - 2
X_PACK = 65536       # packed x-extent must stay below 32767 m
X_MAX = 32765.0
# SMEM spend (bytes) above which the per-row tables switch to the packed
# encoding; beyond what even packing can fit, build_cell_list raises with
# remediation guidance. The ~1 MB figure is the empirical Mosaic budget.
_SMEM_UNPACKED_MAX = 600_000
_SMEM_TOTAL_MAX = 980_000


@partial(jax.tree_util.register_dataclass,
         data_fields=["fields", "w_rw", "w_rb_a", "w_rb_b",
                      "row_rb_a", "row_rb_b", "row_xa", "row_xb",
                      "row_xa_w", "row_xb_w",
                      "cr_start",
                      "n_alive", "overflow"],
         meta_fields=["num_tiles", "window_rows", "n_windows", "shifts",
                      "tables_packed", "wide_oid", "cand_lanes"])
@dataclasses.dataclass(frozen=True)
class CellList:
    """Sorted SoA fleet + per-tile candidate windows.

    fields: [14, R, LANE] f32 in FIELD_NAMES order;
            R = (num_tiles*TILE + window_rows*LANE) / LANE (guard tail of
            dead slots so window DMAs never read out of bounds).
    `row` is the brow id (band * ny * nz + y + ny * z; -1 for
    dead/padding — the validity flag).
    w_rw: [T, W] int32 — window start storage row (8-aligned) * 4096 +
    storage-row count (packed; count < 4096 asserted).
    w_rb_a/w_rb_b: [T, W] int32 — inclusive BROW range the window must match
    (alignment padding is masked by this). tables_packed=True packs the pair
    ROW_PACK-style into w_rb_a (w_rb_b is a dummy).
    row_rb_a/row_rb_b, row_xa/row_xb: per-STORAGE-row guard tables (brow
    range, x range) consumed as scalar prefetch by the kernel so block
    pruning costs zero in-kernel reductions. Brow tables follow the same
    packing convention. X tables: unpacked mode carries RAW f32 (lo, hi)
    bounds in row_xa/row_xb — no quantization, and no per-iteration
    integer div/mod on the scalar core (the block loop pays ~160 ns of
    scalar/branch machinery per candidate row even when x-pruned —
    BENCH_NOTES r3 microprobe — and the unpack was part of it; raw
    bounds also tighten pruning slightly vs the meter-quantized ones).
    Packed mode (SMEM pressure, >~4.6M objects) keeps the quantized
    X_PACK pair in row_xa with row_xb a dummy.
    cr_start: [nbrows+1] int32 — sorted ELEMENT index where each brow
    begins; the kernel derives storage-row floors/ceils from it (one table
    instead of separate floor/ceil tables — SMEM).
    shifts: static ascending brow-id deltas, one candidate window per shift
    ((band shift)*ny*nz + (z shift)*ny over the +-1 neighborhoods).
    """
    fields: jax.Array
    w_rw: jax.Array
    w_rb_a: jax.Array
    w_rb_b: jax.Array
    row_rb_a: jax.Array
    row_rb_b: jax.Array
    row_xa: jax.Array    # [R] f32 x-lo (unpacked) | i32 packed pair
    row_xb: jax.Array    # [R] f32 x-hi (unpacked) | [1] i32 dummy
    # candidate-granularity x-guard tables ([R / (cand_lanes/LANE)]; [1]
    # dummies when cand_lanes == LANE — the kernel reads the narrow
    # tables for candidates then): the kernel's block loop walks
    # candidate rows of cand_lanes lanes, so its x guard reads these;
    # the per-own-row guards keep the tighter LANE tables. (Candidate
    # brow-range correctness is per-element via c_ok, so no wide rb
    # tables are needed.)
    row_xa_w: jax.Array
    row_xb_w: jax.Array
    cr_start: jax.Array  # [nbrows+1] i32 sorted element index of brow start
    n_alive: jax.Array
    overflow: jax.Array
    num_tiles: int
    window_rows: int     # in cand_lanes-wide rows (kernel window length)
    n_windows: int
    shifts: tuple
    tables_packed: bool
    wide_oid: bool = False
    cand_lanes: int = LANE

    @property
    def oid_flat(self) -> jax.Array:
        """[num_tiles*TILE] int32 DECODED global oid of the non-guard slots:
        halo mirrors (mark_halo encoding, shard/halo.extend_with_halo) are
        unmarked back to their true id; dead/padding rows are -1. Wide mode
        recombines the (hi, lo) field pair."""
        n = self.num_tiles * TILE
        lo = self.fields[FIELD_NAMES.index("oid")].reshape(-1)[:n].astype(
            jnp.int32)
        if not self.wide_oid:
            return jnp.where(lo <= -2, -lo - 2, lo)
        hi = self.fields[len(FIELD_NAMES)].reshape(-1)[:n].astype(jnp.int32)
        hi_u = jnp.where(hi <= -2, -hi - 2, hi)
        return jnp.where(lo >= 0, hi_u * (1 << 24) + lo, -1)

    @property
    def own_flat(self) -> jax.Array:
        """[num_tiles*TILE] bool — True for OWNED alive rows (excludes both
        dead/padding rows and halo mirrors). The halo mark rides the oid
        field (narrow: oid = -(id + 2); wide: hi = -(hi + 2))."""
        n = self.num_tiles * TILE
        lo = self.fields[FIELD_NAMES.index("oid")].reshape(-1)[:n]
        if not self.wide_oid:
            return lo >= 0.0
        hi = self.fields[len(FIELD_NAMES)].reshape(-1)[:n]
        return (lo >= 0.0) & (hi >= 0.0)


def resolve_band_cells(cfg: SystemConfig) -> int:
    """The configured band width in cells: None -> one band (classic
    (z, y, x) order), 0 -> auto (square-ish storage rows), else verbatim."""
    bc = cfg.grid.band_cells
    nx = cfg.grid_dims[0]
    if bc is None:
        return nx
    if bc == 0:
        return auto_band_cells(cfg)
    assert 1 <= bc, f"band_cells must be >= 1, got {bc}"
    return min(bc, nx)


def auto_band_cells(cfg: SystemConfig) -> int:
    """Band width that makes a 128-object storage row cover a ~square patch.

    A row of LANE objects spans area LANE/rho (rho = per-z-layer 2D density),
    so width W = sqrt(LANE/rho) balances x slack against y slack when the
    kernel prunes at row granularity. Widened if needed until the guard
    tables fit the SMEM budget."""
    nx, ny, nz = cfg.grid_dims
    ex = max(1.0, cfg.world.extent[0])
    ey = max(1.0, cfg.world.extent[1])
    rho = cfg.num_objects / max(1, nz) / (ex * ey)
    if rho <= 0:
        return nx
    w_m = (LANE / rho) ** 0.5
    bc = max(1, min(nx, round(w_m / cfg.grid.cell_size)))
    # SMEM: brow tables scale with nbands = nx/bc; widen bands until the
    # budget holds (R-sized tables are the other, band-independent term)
    n = cfg.num_objects
    r_rows = -(-n // LANE) + 512
    while bc < nx:
        nbrows = (-(-nx // bc)) * ny * nz
        smem = 4 * (3 * r_rows + nbrows + 1) + 12 * (-(-n // TILE)) * 9
        if smem <= _SMEM_UNPACKED_MAX:
            break
        bc *= 2
    return min(bc, nx)


def band_shifts(cfg: SystemConfig, band_cells: int,
                z_reach: int = 1) -> tuple:
    """Static ascending brow-id deltas of the candidate neighborhoods:
    (band +-1) x (z +-z_reach) around an object's own brow. One contiguous
    candidate window per shift. z_reach > 1 serves the fused PREDICT path,
    whose class-advanced queries can sit several z-layers from the
    object's current cell."""
    nx, ny, nz = cfg.grid_dims
    nrows = ny * nz
    nbands = -(-nx // band_cells)
    zr = min(z_reach, nz)
    sb_list = (-1, 0, 1) if nbands > 1 else (0,)
    sz_list = (tuple(range(-zr, zr + 1)) if cfg.world.is_3d else (0,))
    return tuple(sorted({sb * nrows + sz * ny
                         for sb in sb_list for sz in sz_list}))


def default_window_rows(cfg: SystemConfig,
                        band_cells: int | None = None) -> int:
    """Static window capacity in storage rows: ~ (tile span + 3 brows of
    mean density + alignment slack), rounded up to 8 rows."""
    nx, ny, nz = cfg.grid_dims
    if band_cells is None:
        band_cells = resolve_band_cells(cfg)
    nbrows = (-(-nx // band_cells)) * ny * nz
    mean_per_brow = cfg.num_objects / max(1, nbrows)
    # tile span + ~4 brows of mean density + start-alignment slack (< ALIGN)
    # + end rounding (< LANE)
    elems = int(4 * mean_per_brow) + TILE + ALIGN + LANE
    rows = -(-elems // LANE)
    return -(-rows // 8) * 8


def build_cell_list(state: ObjectState, cfg: SystemConfig,
                    window_rows: int | None = None,
                    extra: jax.Array | None = None,
                    brow_widen=0, z_reach: int = 1,
                    wide_oid: bool | None = None,
                    interpret: bool = False) -> CellList:
    """See module docstring. Two optional knobs serve the fused PREDICT
    path (kernels/fused_detect.py emit='predict'):

    extra: [N] f32 per-object scalar co-sorted with the fields and appended
    as fields[NF] (the trajectory class for prediction). The detection
    kernels read exactly NF field rows, so the extra row is invisible to
    them.
    brow_widen: widen every tile's candidate window by this many brows on
    each side (python int or traced scalar) — prediction queries TODAY's
    layout at PREDICTED positions, which can sit up to
    ceil(max_displacement / cell) brows away from the object's current
    brow. The in-kernel spans widen symmetrically (the widen rides the
    scalar-prefetch parameters).
    z_reach: z-layer neighborhood half-width for the static shift list
    (default 1; prediction widens it to cover vertical displacement)."""
    nx, ny, nz = cfg.grid_dims
    assert cfg.stencil_halfwidth == 1, (
        "fused kernel path requires cell_size >= search_radius "
        f"(stencil halfwidth 1, got {cfg.stencil_halfwidth})")
    n = state.n
    num_tiles = -(-n // TILE)
    # oids ride through the sort and kernel as exact f32 integers; halo
    # mirrors are marked by NEGATION (-(oid + 2), shard/halo.extend_with_halo)
    # so sharding costs no id range. Fleets whose ids need more than 24 bits
    # carry them as an (hi, lo) field pair instead (wide mode).
    if wide_oid is None:
        wide_oid = cfg.grid.wide_oid
    if wide_oid is None:
        wide_oid = cfg.num_objects + 2 > 2 ** 24
    if not wide_oid:
        assert cfg.num_objects + 2 <= 2 ** 24, (
            "fused kernel stores oids in f32 (exact to 2^24): fleets past "
            "~16.7M objects need GridConfig.wide_oid=True")
    bandc = resolve_band_cells(cfg)
    nbands = -(-nx // bandc)
    nrows = ny * nz
    nbrows = nbands * nrows
    shifts = band_shifts(cfg, bandc, z_reach)
    n_windows = len(shifts)
    if window_rows is None:
        window_rows = default_window_rows(cfg, bandc)
    assert window_rows % 8 == 0
    # candidate-row width: the kernel processes [LANE own x cl_w cand]
    # pair blocks; group = storage rows per candidate block row. The
    # `window_rows` PARAMETER stays in LANE-row units (external sizing
    # contract); CellList.window_rows carries the WIDE count.
    cl_w = cfg.grid.cand_lanes or LANE
    assert cl_w in (LANE, 2 * LANE, 4 * LANE), (
        f"cand_lanes must be 128, 256 or 512 (got {cl_w})")
    group = cl_w // LANE
    window_rows_w = -(-window_rows // group)
    window_rows_w = -(-window_rows_w // 8) * 8
    assert window_rows_w < 4096, "w_rw packing caps windows at 4095 rows"
    window_max = window_rows_w * cl_w
    np_pad = num_tiles * TILE + window_max
    np_pad = -(-np_pad // (8 * cl_w)) * (8 * cl_w)
    R = np_pad // LANE

    # Guard-table encoding: separate lo/hi tables unless SMEM pressure
    # demands the packed pairs (which cap brow ids at ROW_PACK - 2).
    smem_unpacked = 4 * (4 * R + (4 * R // group if group > 1 else 0)
                         + (nbrows + 1)
                         + 3 * num_tiles * n_windows + num_tiles)
    tables_packed = smem_unpacked > _SMEM_UNPACKED_MAX
    assert group == 1 or not tables_packed, (
        "cand_lanes > 128 needs unpacked guard tables; this fleet's scale "
        "forces the packed encoding — use cand_lanes=None here")
    if tables_packed:
        assert nbrows + 16 < ROW_PACK, (
            f"{nbrows} brows need packed guard tables at this scale but "
            f"exceed the ROW_PACK range; use larger band_cells / larger "
            "cells in y/z, or shard the world")
        smem = 4 * (2 * R + (nbrows + 1)
                    + 2 * num_tiles * n_windows + num_tiles)
        # only the PACKED x encoding quantizes lo-relative meters into
        # 15 bits; unpacked raw-f32 guards carry any world extent
        assert cfg.world.hi[0] - cfg.world.lo[0] <= X_MAX, (
            "packed x-guard tables cap the world x-extent at ~32.7 km; "
            "shard wider worlds (or stay under the unpacked-table scale)")
    else:
        smem = smem_unpacked
    assert smem < _SMEM_TOTAL_MAX, (
        f"guard tables need ~{smem} B of SMEM (> {_SMEM_TOTAL_MAX}); use "
        "larger band_cells / larger cells, or shard the world")

    lo = jnp.asarray(cfg.world.lo, jnp.float32)
    nd = jnp.asarray((nx, ny, nz), jnp.int32)
    c3 = jnp.clip(jnp.floor((state.pos - lo) / cfg.grid.cell_size
                            ).astype(jnp.int32), 0, nd - 1)
    bx = c3[:, 0] // bandc
    brow = bx * nrows + (c3[:, 1] + ny * c3[:, 2])
    flat = brow * bandc + (c3[:, 0] - bx * bandc)
    num_ids = nbrows * bandc            # >= num_cells (x padding in last band)
    flat = jnp.where(state.alive, flat, num_ids)

    # one co-sort of every field (no gathers); dead objects carry the
    # num_ids sentinel key, so aliveness post-sort is sflat < num_ids
    if wide_oid:
        # (hi, lo) split with the halo mark (oid <= -2 means -(id + 2),
        # extend_with_halo) moved onto the hi half so lo stays a clean
        # 24-bit value for the kernel's pair-identity test
        oid_i = state.oid
        mark = oid_i <= -2
        orig = jnp.where(mark, -oid_i - 2, oid_i)
        oid_lo = jnp.where(orig >= 0, orig & 0xFFFFFF, -1)
        oid_hi = jnp.where(orig >= 0, orig >> 24, -1)
        oid_hi = jnp.where(mark, -oid_hi - 2, oid_hi)
        oid_f = oid_lo.astype(jnp.float32)
    else:
        oid_f = state.oid.astype(jnp.float32)
    # 2D worlds (zero z extent): z/vz/az are 0 by contract on this path —
    # they are dropped from the sort (3 fewer co-sort operands, ~20% of the
    # build) and their kernel DMAs/math are compiled out; the field layout
    # keeps its canonical 14 slots (zero-filled) so downstream indexing is
    # unchanged.
    flat2d = not cfg.world.is_3d
    core = [state.pos[:, 0], state.pos[:, 1], state.pos[:, 2],
            state.vel[:, 0], state.vel[:, 1], state.vel[:, 2],
            state.acc[:, 0], state.acc[:, 1], state.acc[:, 2],
            state.size, state.heading,
            state.otype.astype(jnp.float32),
            oid_f]
    if flat2d:
        core = [a for i, a in enumerate(core) if i not in Z_FIELD_IDX]
    ops = (flat, *core)
    if wide_oid:
        ops = ops + (oid_hi.astype(jnp.float32),)
    if extra is not None:
        ops = ops + (extra.astype(jnp.float32),)
    # lax.sort measured ~1.0 ms at 1M x 14 operands and payload-insensitive
    # — a staged Pallas bitonic co-sort lost by ~12 ms and was retired to
    # .probe/block_sort.py (BENCH_NOTES r3 "Pallas sort probe" + CORRECTION)
    sorted_ops = jax.lax.sort(ops, num_keys=1, is_stable=False,
                              dimension=0)
    sflat = sorted_ops[0]
    srow_f = jnp.where(sflat < num_ids,
                       jnp.clip(sflat // bandc, 0,
                                nbrows - 1).astype(jnp.float32),
                       -1.0)

    def pad(a, fill=0.0):
        return jnp.pad(a, (0, np_pad - n), constant_values=fill)

    n_core = len(FIELD_NAMES) - 1 - (3 if flat2d else 0)
    sorted_core = list(sorted_ops[1:1 + n_core])
    if flat2d:
        zcol = jnp.zeros_like(sorted_core[0])
        for zi in Z_FIELD_IDX:
            sorted_core.insert(zi, zcol)
    stacked = ([pad(a) for a in sorted_core]
               + [pad(srow_f, -1.0)]
               + [pad(a) for a in sorted_ops[1 + n_core:]])
    oid_idx = FIELD_NAMES.index("oid")
    stacked[oid_idx] = jnp.where(jnp.arange(np_pad) < n,
                                 stacked[oid_idx], -1.0)
    if wide_oid:
        stacked[len(FIELD_NAMES)] = jnp.where(
            jnp.arange(np_pad) < n, stacked[len(FIELD_NAMES)], -1.0)
    fields = jnp.stack(stacked, axis=0).reshape(len(stacked), -1, LANE)

    # brow start table: only BROW boundaries are needed (not per-cell
    # starts), and the keys are already sorted — ~nbrows searchsorted
    # queries (~20 gathers of [nbrows+1]) beat both the 400k-query
    # searchsorted (79 ms at 1M) and the scatter histogram (33 ms) that
    # earlier rounds used. Dead objects sort to the tail with brow sentinel
    # nbrows, so row_start[nbrows] is n_alive.
    srow_sorted = jnp.minimum(sflat // bandc, nbrows)
    row_start = jnp.searchsorted(
        srow_sorted, jnp.arange(nbrows + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    n_alive = row_start[nbrows]

    # per-tile window tables: one contiguous window per static brow shift,
    # chain-clipped in ascending shift order so windows never overlap (a
    # candidate row is visited through exactly one window)
    srow_i = jnp.clip(sflat // bandc, 0, nbrows - 1)
    spad = jnp.pad(srow_i, (0, np_pad - n), constant_values=nbrows - 1)
    t_first = jnp.arange(num_tiles, dtype=jnp.int32) * TILE
    t_last = jnp.minimum(t_first + TILE - 1, n - 1)
    r_lo = spad[t_first]
    r_hi = spad[t_last]
    tile_dead = t_first >= n_alive

    ranges = []
    prev_hi = None
    for s in shifts:
        lo_s = r_lo + s - 1 - brow_widen
        hi_s = r_hi + s + 1 + brow_widen
        if prev_hi is not None:
            lo_s = jnp.maximum(lo_s, prev_hi + 1)
            hi_s = jnp.maximum(hi_s, prev_hi)
        prev_hi = hi_s
        ranges.append((lo_s, hi_s))

    wr, wn, rlo_l, rhi_l = [], [], [], []
    excess = jnp.int32(0)
    for lo_r, hi_r in ranges:
        a = jnp.clip(lo_r, 0, nbrows)
        b = jnp.clip(hi_r + 1, 0, nbrows)
        b = jnp.maximum(b, a)
        st_ = row_start[a]
        en_ = row_start[b]
        # only DMA STARTS need 8-row alignment (8 * cl_w elements in the
        # wide candidate-row space); ends just round up to whole candidate
        # rows (the DMA length is the static window_rows either way — wn
        # only drives the in-kernel guards)
        align_w = max(ALIGN, 8 * cl_w)
        st_a = (st_ // align_w) * align_w
        en_a = jnp.minimum(-(-en_ // cl_w) * cl_w, num_tiles * TILE)
        en_a = jnp.maximum(en_a, st_a)
        ln = jnp.where(tile_dead, 0, en_a - st_a)
        excess = excess + jnp.sum(jnp.maximum(ln - window_max, 0))
        wr.append(st_a // cl_w)
        wn.append(jnp.minimum(ln, window_max) // cl_w)
        rlo_l.append(a)
        rhi_l.append(b - 1)

    # per-storage-row guard tables (vector reductions here are ~free; the
    # kernel reads them as SMEM scalars)
    srow2d = fields[FIELD_NAMES.index("row")]
    valid2d = srow2d >= 0.0
    x2d = fields[FIELD_NAMES.index("x")]
    big = jnp.float32(3.0e38)
    row_rlo = jnp.min(jnp.where(valid2d, srow2d, big), axis=1)
    row_rhi = jnp.max(jnp.where(valid2d, srow2d, -big), axis=1)
    row_xlo = jnp.min(jnp.where(valid2d, x2d, big), axis=1)
    row_xhi = jnp.max(jnp.where(valid2d, x2d, -big), axis=1)
    # empty rows: (rlo, rhi) = (large, -1) so no guard ever passes
    row_rlo = jnp.where(row_rhi < 0, jnp.float32(nbrows + 9), row_rlo)
    row_rhi = jnp.maximum(row_rhi, -1.0)

    # x guards: raw f32 (lo, hi) pair in unpacked mode (exact bounds, no
    # in-kernel div/mod); packed mode quantizes to whole meters relative
    # to world lo — conservative (floor lo / ceil hi), never wrong
    if tables_packed:
        wlo = jnp.float32(cfg.world.lo[0])
        xq_lo = jnp.clip(jnp.floor(row_xlo - wlo), 0.0,
                         X_MAX).astype(jnp.int32)
        xq_hi = jnp.clip(jnp.ceil(row_xhi - wlo), 0.0,
                         X_MAX).astype(jnp.int32)
        row_xa = xq_lo * X_PACK + xq_hi + 1
        row_xb = jnp.zeros((1,), jnp.int32)
    else:
        row_xa = row_xlo
        row_xb = row_xhi

    # candidate-granularity x-guard tables: per-group union of the
    # LANE-row bounds (min lo / max hi — empty-row sentinels compose:
    # lo=big, hi=-big never pass). group == 1 passes [1] dummies — the
    # kernel reads the narrow tables for candidates then, and aliasing
    # real tables here would silently double the SMEM spend.
    if group > 1:
        R_w = R // group
        row_xa_w = jnp.min(row_xlo.reshape(R_w, group), axis=1)
        row_xb_w = jnp.max(row_xhi.reshape(R_w, group), axis=1)
    else:
        row_xa_w = row_xb_w = None

    w_row = jnp.stack(wr, axis=1).astype(jnp.int32)
    w_nrows = jnp.stack(wn, axis=1).astype(jnp.int32)
    w_rlo = jnp.stack(rlo_l, axis=1).astype(jnp.int32)
    w_rhi = jnp.stack(rhi_l, axis=1).astype(jnp.int32)
    row_rlo_i = row_rlo.astype(jnp.int32)
    row_rhi_i = row_rhi.astype(jnp.int32)
    dummy = jnp.zeros((1,), jnp.int32)
    if tables_packed:
        row_rb_a = row_rlo_i * ROW_PACK + row_rhi_i + 2
        row_rb_b = dummy
        w_rb_a = w_rlo * ROW_PACK + w_rhi + 2
        w_rb_b = dummy
    else:
        row_rb_a, row_rb_b = row_rlo_i, row_rhi_i
        w_rb_a, w_rb_b = w_rlo, w_rhi.reshape(-1)
    return CellList(
        fields=fields,
        w_rw=w_row * 4096 + w_nrows,
        w_rb_a=w_rb_a.reshape(-1), w_rb_b=w_rb_b.reshape(-1),
        row_rb_a=row_rb_a, row_rb_b=row_rb_b,
        row_xa=row_xa, row_xb=row_xb,
        row_xa_w=(dummy if row_xa_w is None else row_xa_w),
        row_xb_w=(dummy if row_xb_w is None else row_xb_w),
        cr_start=row_start.astype(jnp.int32),
        n_alive=n_alive.astype(jnp.int32),
        overflow=excess.astype(jnp.int32),
        num_tiles=num_tiles, window_rows=window_rows_w, n_windows=n_windows,
        shifts=shifts, tables_packed=tables_packed, wide_oid=wide_oid,
        cand_lanes=cl_w)

"""Cell-list layout: the data structure feeding the fused Pallas kernel.

XLA's general gather lowers poorly on TPU (measured ~190 ms for one 16k x
216 candidate gather block at 1M objects — gathers, not math, dominate the
pure-XLA detection path at scale). The cell list removes gathers entirely:

  * ONE multi-operand `lax.sort` (key = flat cell id) co-sorts every field —
    no argsort + per-field gather round-trips;
  * because flat cell id is row-major (x fastest), a (y, z) cell-row is
    contiguous in sorted order and rows y-1, y, y+1 of one z are adjacent —
    each tile's broad-phase candidates are 1 contiguous window (2D) or 3
    disjoint windows (3D, one per z-layer);
  * fields are laid out 2D as [R, LANE] so every Mosaic DMA is a statically
    8-row-aligned 2D slice, and every compute access is a FULL dynamic row —
    Mosaic crashes on dynamic 1D offsets and on lane sub-slices of
    dynamically-indexed rows (found empirically); tiles are TILE = 8*LANE
    objects = 8 rows (see the LANE/TILE constants below);
  * per-tile window tables (start row, row count, cell-row range) are
    computed here; the kernel masks alignment padding exactly using each
    candidate's cell-row id (carried as a field), so no phantom pairs and
    no double counting.

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

LANE = 128          # elements per storage row (1 VPU lane-group)
TILE = 1024         # objects per kernel tile = 8 storage rows (DMA aligned)
ALIGN = 1024

FIELD_NAMES = ("x", "y", "z", "vx", "vy", "vz", "ax", "ay", "az",
               "size", "heading", "otype", "oid", "valid", "row")


# Packed SMEM guard-table encodings. The per-storage-row tables are the
# kernel's SMEM bill (4 x R scalars blew the ~1 MB SMEM budget at 10M
# objects, R=78k); packing each pair into one int32 halves it:
#   rb  = (cell_row_lo) * ROW_PACK + (cell_row_hi + 2)      (rhi >= -1)
#   x   = floor(xlo - world_lo) * X_PACK + ceil(xhi - world_lo) + 1
# X bounds are quantized to whole meters RELATIVE to world lo (the guard
# is a conservative pruning hint — 1 m slack vs a >= 1 m search radius).
ROW_PACK = 32768     # cell-row ids must stay below ROW_PACK - 2
X_PACK = 65536       # packed x-extent must stay below 32767 m
X_MAX = 32765.0


@partial(jax.tree_util.register_dataclass,
         data_fields=["fields", "w_rw", "w_rb",
                      "row_rb", "row_x",
                      "cr_floor", "cr_ceil",
                      "n_alive", "overflow"],
         meta_fields=["num_tiles", "window_rows", "n_windows"])
@dataclasses.dataclass(frozen=True)
class CellList:
    """Sorted SoA fleet + per-tile candidate windows.

    fields: [15, R, LANE] f32 in FIELD_NAMES order;
            R = (num_tiles*TILE + window_rows*LANE) / LANE (guard tail of
            dead slots so window DMAs never read out of bounds).
    `valid` is 1.0 for alive objects; `row` is the (y + ny*z) cell-row id
    (-1 for dead/padding).
    w_rw: [T, W] int32 — window start storage row (8-aligned) * 4096 +
    storage-row count (packed; count < 4096 asserted).
    w_rb: [T, W] int32 — inclusive CELL-row range the window must match
    (alignment padding is masked by this), ROW_PACK-packed.
    row_rb/row_x: per-STORAGE-row guard tables (cell-row range, x range;
    packed as documented above) consumed as scalar prefetch by the kernel
    so block pruning costs zero in-kernel reductions.
    """
    fields: jax.Array
    w_rw: jax.Array
    w_rb: jax.Array
    row_rb: jax.Array    # [R] i32 packed (min, max) cell-row of alive objs
    row_x: jax.Array     # [R] i32 packed (min, max) x of alive objs
    cr_floor: jax.Array  # [nrows+1] i32 storage row where cell-row begins
    cr_ceil: jax.Array   # [nrows+1] i32 ceil storage row of cell-row start
    n_alive: jax.Array
    overflow: jax.Array
    num_tiles: int
    window_rows: int
    n_windows: int

    @property
    def oid_flat(self) -> jax.Array:
        """[num_tiles*TILE] int32 oid of the owned (non-guard) slots."""
        n = self.num_tiles * TILE
        return self.fields[FIELD_NAMES.index("oid")].reshape(-1)[:n].astype(
            jnp.int32)


def default_window_rows(cfg: SystemConfig) -> int:
    """Static window capacity in storage rows: ~ (tile span + 3 cell-rows of
    mean density + alignment slack), rounded up to 8 rows."""
    nx, ny, nz = cfg.grid_dims
    mean_per_row = cfg.num_objects / max(1, ny * nz)
    elems = int(4 * mean_per_row) + TILE + 2 * ALIGN
    rows = -(-elems // LANE)
    return -(-rows // 8) * 8


def build_cell_list(state: ObjectState, cfg: SystemConfig,
                    window_rows: int | None = None) -> CellList:
    nx, ny, nz = cfg.grid_dims
    assert cfg.stencil_halfwidth == 1, (
        "fused kernel path requires cell_size >= search_radius "
        f"(stencil halfwidth 1, got {cfg.stencil_halfwidth})")
    num_cells = cfg.num_cells
    n = state.n
    num_tiles = -(-n // TILE)
    # oids ride through the sort and kernel as f32 and must stay exact;
    # the sharded path offsets halo oids by num_objects (so needs 2x)
    oid_max = cfg.num_objects * (2 if cfg.shard.num_shards > 1 else 1)
    assert oid_max < 2 ** 24, (
        "fused kernel stores oids in f32: fleets past ~16.7M objects "
        "(8.3M sharded) need the oid fields widened (ROADMAP)")
    if window_rows is None:
        window_rows = default_window_rows(cfg)
    assert window_rows % 8 == 0
    assert window_rows < 4096, "w_rw packing caps windows at 4095 rows"
    nrows_chk = cfg.grid_dims[1] * cfg.grid_dims[2]
    assert nrows_chk + 16 < ROW_PACK, (
        f"{nrows_chk} cell-rows exceed the packed guard-table range; "
        "use larger cells in y/z")
    assert cfg.world.hi[0] - cfg.world.lo[0] <= X_MAX, (
        "packed x-guard tables cap the world x-extent at ~32.7 km; "
        "shard wider worlds")
    window_max = window_rows * LANE
    np_pad = num_tiles * TILE + window_max
    n_windows = 3 if cfg.world.is_3d else 1

    lo = jnp.asarray(cfg.world.lo, jnp.float32)
    nd = jnp.asarray((nx, ny, nz), jnp.int32)
    c3 = jnp.clip(jnp.floor((state.pos - lo) / cfg.grid.cell_size
                            ).astype(jnp.int32), 0, nd - 1)
    flat = c3[:, 0] + nx * (c3[:, 1] + ny * c3[:, 2])
    flat = jnp.where(state.alive, flat, num_cells)

    # one co-sort of every field (no gathers)
    ops = (flat,
           state.pos[:, 0], state.pos[:, 1], state.pos[:, 2],
           state.vel[:, 0], state.vel[:, 1], state.vel[:, 2],
           state.acc[:, 0], state.acc[:, 1], state.acc[:, 2],
           state.size, state.heading,
           state.otype.astype(jnp.float32),
           state.oid.astype(jnp.float32),
           state.alive.astype(jnp.float32))
    sorted_ops = jax.lax.sort(ops, num_keys=1, is_stable=False, dimension=0)
    sflat = sorted_ops[0]
    nrows = ny * nz
    srow_f = jnp.where(sorted_ops[14] > 0.5,
                       jnp.clip(sflat // nx, 0, nrows - 1).astype(jnp.float32),
                       -1.0)

    def pad(a, fill=0.0):
        return jnp.pad(a, (0, np_pad - n), constant_values=fill)

    stacked = [pad(a) for a in sorted_ops[1:]] + [pad(srow_f, -1.0)]
    oid_idx = FIELD_NAMES.index("oid")
    stacked[oid_idx] = jnp.where(jnp.arange(np_pad) < n,
                                 stacked[oid_idx], -1.0)
    fields = jnp.stack(stacked, axis=0).reshape(len(FIELD_NAMES), -1, LANE)

    # bucket offsets + cell-row table (scatter-histogram: >2x faster than
    # TPU searchsorted at 1M/400k — index/grid.bucket_starts)
    from tpu_collide.index.grid import bucket_starts
    starts = bucket_starts(flat, num_cells)
    n_alive = starts[num_cells]
    row_start = starts[jnp.arange(nrows + 1, dtype=jnp.int32) * nx]

    # per-tile window tables
    srow_i = jnp.clip(sflat // nx, 0, nrows - 1)
    spad = jnp.pad(srow_i, (0, np_pad - n), constant_values=nrows - 1)
    t_first = jnp.arange(num_tiles, dtype=jnp.int32) * TILE
    t_last = jnp.minimum(t_first + TILE - 1, n - 1)
    r_lo = spad[t_first]
    r_hi = spad[t_last]
    tile_dead = t_first >= n_alive

    # 3D: three DISJOINT cell-row ranges (overlapping shifted ranges would
    # double-count pairs when a tile spans z-layers)
    if cfg.world.is_3d:
        lo1, hi1 = r_lo - 1 - ny, r_hi + 1 - ny
        lo2 = jnp.maximum(r_lo - 1, hi1 + 1)
        hi2 = jnp.maximum(r_hi + 1, hi1)
        lo3 = jnp.maximum(r_lo - 1 + ny, hi2 + 1)
        hi3 = jnp.maximum(r_hi + 1 + ny, hi2)
        ranges = ((lo1, hi1), (lo2, hi2), (lo3, hi3))
    else:
        ranges = ((r_lo - 1, r_hi + 1),)

    wr, wn, rlo_l, rhi_l = [], [], [], []
    excess = jnp.int32(0)
    for lo_r, hi_r in ranges:
        a = jnp.clip(lo_r, 0, nrows)
        b = jnp.clip(hi_r + 1, 0, nrows)
        b = jnp.maximum(b, a)
        st_ = row_start[a]
        en_ = row_start[b]
        st_a = (st_ // ALIGN) * ALIGN
        en_a = jnp.minimum(-(-en_ // ALIGN) * ALIGN, num_tiles * TILE)
        en_a = jnp.maximum(en_a, st_a)
        ln = jnp.where(tile_dead, 0, en_a - st_a)
        excess = excess + jnp.sum(jnp.maximum(ln - window_max, 0))
        wr.append(st_a // LANE)
        wn.append(jnp.minimum(ln, window_max) // LANE)
        rlo_l.append(a)
        rhi_l.append(b - 1)

    # per-storage-row guard tables (vector reductions here are ~free; the
    # kernel reads them as SMEM scalars)
    srow2d = fields[FIELD_NAMES.index("row")]
    valid2d = fields[FIELD_NAMES.index("valid")] > 0.5
    x2d = fields[FIELD_NAMES.index("x")]
    big = jnp.float32(3.0e38)
    row_rlo = jnp.min(jnp.where(valid2d, srow2d, big), axis=1)
    row_rhi = jnp.max(jnp.where(valid2d, srow2d, -big), axis=1)
    row_xlo = jnp.min(jnp.where(valid2d, x2d, big), axis=1)
    row_xhi = jnp.max(jnp.where(valid2d, x2d, -big), axis=1)
    # empty rows: (rlo, rhi) = (large, -1) so no guard ever passes
    row_rlo = jnp.where(row_rhi < 0, jnp.float32(nrows + 9), row_rlo)
    row_rhi = jnp.maximum(row_rhi, -1.0)

    # pack the guard tables (SMEM budget; see module constants). x bounds
    # quantize to whole meters relative to world lo — conservative
    # (floor lo / ceil hi), never wrong, >= half the SMEM.
    row_rb = (row_rlo.astype(jnp.int32) * ROW_PACK
              + row_rhi.astype(jnp.int32) + 2)
    wlo = jnp.float32(cfg.world.lo[0])
    xq_lo = jnp.clip(jnp.floor(row_xlo - wlo), 0.0, X_MAX).astype(jnp.int32)
    xq_hi = jnp.clip(jnp.ceil(row_xhi - wlo), 0.0, X_MAX).astype(jnp.int32)
    row_x = xq_lo * X_PACK + xq_hi + 1

    # cell-row -> storage-row boundary tables: candidate storage rows for
    # cell-rows [a, b] are [cr_floor[a], cr_ceil[b+1]) — the kernel iterates
    # exactly that span instead of guard-branching over the whole window
    cr_floor = row_start // LANE
    cr_ceil = -(-row_start // LANE)

    w_row = jnp.stack(wr, axis=1).astype(jnp.int32)
    w_nrows = jnp.stack(wn, axis=1).astype(jnp.int32)
    w_rlo = jnp.stack(rlo_l, axis=1).astype(jnp.int32)
    w_rhi = jnp.stack(rhi_l, axis=1).astype(jnp.int32)
    return CellList(
        fields=fields,
        row_rb=row_rb, row_x=row_x,
        cr_floor=cr_floor.astype(jnp.int32),
        cr_ceil=cr_ceil.astype(jnp.int32),
        w_rw=w_row * 4096 + w_nrows,
        w_rb=w_rlo * ROW_PACK + w_rhi + 2,
        n_alive=n_alive.astype(jnp.int32),
        overflow=excess.astype(jnp.int32),
        num_tiles=num_tiles, window_rows=window_rows, n_windows=n_windows)

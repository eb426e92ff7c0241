"""Host-side config autotuning from fleet statistics (VERDICT r2 #9).

The reference adapted grid resolution to density at runtime
(spatial_index.py:139-160, 302-412). The TPU design keeps the compiled
program static and instead (a) counts capacity overflow + regrows between
steps (Scene auto_window), and (b) — here — picks the static capacities
RIGHT on the first step from a host-side pass over the actual fleet: the
per-tile candidate-window need is computed exactly (same brow/window
arithmetic as kernels/cell_list.py, in numpy), so hand-tuning
`window_rows` for skewed fleets (the 80/20 city distribution needed 224
by hand in round 1, two regrow steps in round 2) is gone.
"""
from __future__ import annotations

import numpy as np

from tpu_collide.core.config import SystemConfig
from tpu_collide.kernels.cell_list import (ALIGN, LANE, TILE,
                                           band_shifts, resolve_band_cells)


def suggest_window_rows(state, cfg: SystemConfig, margin_rows: int = 8,
                        z_reach: int = 1, brow_widen: int = 0) -> int:
    """Exact static window capacity for THIS fleet: the maximum, over all
    tiles and candidate windows, of the window's element count under the
    cell-list layout — computed host-side in numpy (a few ms at 100k).
    The returned value makes the first step's broad phase overflow-free
    for the given positions (subsequent density drift is still covered by
    the counted-overflow + regrow path).

    brow_widen/z_reach mirror build_cell_list's prediction knobs so the
    fused predict path can be tuned the same way."""
    nx, ny, nz = cfg.grid_dims
    bandc = resolve_band_cells(cfg)
    nbands = -(-nx // bandc)
    nrows = ny * nz
    nbrows = nbands * nrows
    shifts = band_shifts(cfg, bandc, z_reach)

    pos = np.asarray(state.pos)
    alive = np.asarray(state.alive)
    lo = np.asarray(cfg.world.lo, np.float32)
    c3 = np.clip((np.floor((pos - lo) / cfg.grid.cell_size)).astype(int),
                 0, np.asarray((nx, ny, nz)) - 1)
    bx = c3[:, 0] // bandc
    brow = bx * nrows + (c3[:, 1] + ny * c3[:, 2])
    brow = np.where(alive, brow, nbrows)          # dead -> sentinel tail
    srow = np.sort(brow)
    n_alive = int(alive.sum())

    counts = np.bincount(srow[:n_alive], minlength=nbrows + 1)
    starts = np.concatenate([[0], np.cumsum(counts)])  # [nbrows+2]

    n = pos.shape[0]
    num_tiles = -(-n // TILE)
    t_first = np.arange(num_tiles) * TILE
    t_last = np.minimum(t_first + TILE - 1, n - 1)
    # tiles fully in the dead tail need no window
    t_last_alive = np.minimum(t_last, max(n_alive - 1, 0))
    r_lo = srow[np.minimum(t_first, max(n_alive - 1, 0))]
    r_hi = srow[t_last_alive]

    need = 0
    prev_hi = None
    for s in shifts:
        lo_s = r_lo + s - 1 - brow_widen
        hi_s = r_hi + s + 1 + brow_widen
        if prev_hi is not None:
            lo_s = np.maximum(lo_s, prev_hi + 1)
            hi_s = np.maximum(hi_s, prev_hi)
        prev_hi = hi_s
        a = np.clip(lo_s, 0, nbrows)
        b = np.clip(hi_s + 1, 0, nbrows)
        b = np.maximum(b, a)
        elems = starts[b] - starts[a]
        elems = np.where(t_first < n_alive, elems, 0)
        need = max(need, int(elems.max(initial=0)))

    # start alignment slack (< ALIGN) + end rounding (< LANE)
    rows = -(-(need + ALIGN + LANE) // LANE)
    return (-(-rows // 8) * 8) + margin_rows


def suggest_cell_capacity(state, cfg: SystemConfig, margin: int = 2) -> int:
    """Exact XLA-gather-path bucket capacity for THIS fleet: the maximum
    live-cell occupancy (+ margin), host-side in numpy. The gather path
    (index/grid.gather_candidates) drops objects beyond
    GridConfig.cell_capacity from their bucket's candidate list (counted
    as grid_overflow, never silent); sizing the capacity from the actual
    densest cell makes detect()/predict() complete for the given
    positions without hand-tuning — the runtime analog of the reference's
    density-driven cell splits (spatial_index.py:139-160) for the gather
    backend. Rounded up to a multiple of 4 so retune hysteresis doesn't
    thrash on single-object density jitter."""
    nx, ny, nz = cfg.grid_dims
    pos = np.asarray(state.pos)
    alive = np.asarray(state.alive)
    lo = np.asarray(cfg.world.lo, np.float32)
    c3 = np.clip((np.floor((pos - lo) / cfg.grid.cell_size)).astype(int),
                 0, np.asarray((nx, ny, nz)) - 1)
    cid = (c3[:, 0] * ny + c3[:, 1]) * nz + c3[:, 2]
    occ = np.bincount(cid[alive], minlength=1)
    need = int(occ.max(initial=0)) + margin
    return max(4, -(-need // 4) * 4)


def measure_survivor_need(cfg: SystemConfig, state, keys=None,
                          interpret: bool = False) -> int:
    """Device probe for the precise path's survivor compaction: the max,
    over the given physics-step key sequence (or the current positions when
    keys is None), of the compacted survivor count
    sum_over_own(min(emitted, survivor_k)) — exactly how many slot entries
    fused_scene_precise's top-cap compaction must hold for those steps.
    Runs the kernel in survivor mode WITHOUT the sweep/refine tail, so the
    probe costs a fraction of a precise step per key and never depends on
    the current precise_survivor_cap (chicken-and-egg free: `emitted` comes
    from the kernel counters, not the compaction)."""
    import jax
    import jax.numpy as jnp
    from tpu_collide.kernels.cell_list import build_cell_list
    from tpu_collide.kernels.fused_detect import fused_topk
    from tpu_collide.sim.integrator import integrate

    k = cfg.detect.survivor_k

    def need(st):
        cl = build_cell_list(st, cfg, interpret=interpret)
        _, _, _, emitted, _ = fused_topk(cl, cfg, interpret,
                                         mode="survivors")
        return jnp.sum(jnp.where(cl.own_flat, jnp.minimum(emitted, k), 0),
                       dtype=jnp.int32)

    if keys is None:
        return int(jax.jit(need)(state))

    def body(st, key):
        st = integrate(st, key, cfg)
        return st, need(st)

    def run(st, ks):
        _, needs = jax.lax.scan(body, st, ks)
        return jnp.max(needs)

    return int(jax.jit(run)(state, keys))


def suggest_survivor_cap(cfg: SystemConfig, state, keys=None,
                         interpret: bool = False) -> int:
    """Fleet-exact `DetectionConfig.precise_survivor_cap` (the analog of
    suggest_window_rows for the precise sweep, VERDICT r3 Next #5): the
    sampled stage-3 sweep's cost is LINEAR in the static cap, and the 2N
    default is often 10-40x oversized for sparse 3D fleets. Sized from the
    measured need + 1/8 headroom, rounded up to a power of two (min 1024)
    so density jitter doesn't thrash recompiles; under-sizing from later
    density drift is counted (alert_overflow), never silent, and the
    Scene/bench regrow paths recover."""
    need = measure_survivor_need(cfg, state, keys, interpret=interpret)
    cap = max(1024, need + need // 8 + LANE)
    return 1 << (cap - 1).bit_length()


def suggest_cell_size(cfg: SystemConfig) -> float:
    """Smallest legal cell for the fused path: the search radius (the
    1-cell stencil must cover it). Larger cells only add dead pair math;
    smaller ones are illegal on the kernel path — so the policy is
    max(cell_size, r)."""
    return max(cfg.grid.cell_size, cfg.detect.search_radius)


def tune_config(cfg: SystemConfig, state=None) -> tuple:
    """(cfg', window_rows): cell size clamped legal + fleet-exact window
    capacity (None when no fleet is given — the mean-density default then
    applies) + the stage-1 block gate selected by world dimensionality.
    A host-side helper for config authors; the Scene facades apply the
    window half themselves (suggest_window_rows) when adopting a
    fleet."""
    import dataclasses
    cs = suggest_cell_size(cfg)
    if cs != cfg.grid.cell_size:
        cfg = cfg.replace(grid=dataclasses.replace(cfg.grid, cell_size=cs))
    # gate_stage1 skips stage-2+ on pair blocks with no stage-1 hit:
    # measured a clear win at sparse 3D densities (1M: 215 -> 209 ms,
    # 10M: 2.91 -> 2.50 s) and a small loss at dense 2D (100k: 28.5 ->
    # 33.9 ms) — BENCH_NOTES "stage-1 gate". Results identical either
    # way, so the policy is simply: on for 3D worlds, off for 2D.
    want_g1 = cfg.world.is_3d
    if cfg.detect.gate_stage1 != want_g1:
        cfg = cfg.replace(detect=dataclasses.replace(
            cfg.detect, gate_stage1=want_g1))
    wr = suggest_window_rows(state, cfg) if state is not None else None
    return cfg, wr

"""Fused broad+narrow-phase Pallas kernel.

Per TILE-object tile (8 storage rows of LANE), this kernel does what the
XLA path spreads over gather_candidates + detect_rows (SURVEY.md §7 stage
4): DMA the tile's contiguous candidate windows (cell_list.py) from HBM
into VMEM and run the 4-stage fast-mode detection math on [LANE own x LANE
cand] pair blocks entirely on-chip, reducing per-object best-risk + risk
counts.
No [N, K] candidate arrays ever touch HBM and no irregular gathers exist.

Loop nest per tile:   window (1 or 3 z-layers, disjoint cell-row ranges)
                    -> own storage row (8)
                    -> EXACTLY the candidate storage rows that own row needs
Each own row's candidate span ([its cell-rows +-1] mapped through
prefetched cell-row -> storage-row tables) is computed in SMEM scalars, so
there is no per-row adjacency branching at all; an x-overlap pl.when prunes
the remaining far blocks.

Mosaic constraints honored (found empirically, see repo history): HBM DMA
slices are 2D with 8-aligned dynamic row starts hinted via pl.multiple_of;
VMEM scratch is only ever read as FULL dynamically-indexed rows (dynamic 1D
offsets and lane sub-slices of dynamic rows crash the compiler); DMA
endpoints are whole buffers or aligned slices; accumulators live in VMEM
scratch because lax.cond with vector-carried values SIGABRTs the compiler
(register-carried accumulators were tried and reverted).

Scope: fast (constant-velocity) stage-3 semantics — the production/scale
path. The sampled constant-acceleration 'precise' mode stays on the XLA
path (engine.make_step), which is the alert-parity reference.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_collide.core.config import SystemConfig
from tpu_collide.kernels.cell_list import CellList, TILE, LANE, FIELD_NAMES

NF = len(FIELD_NAMES)   # 15
ROWS = TILE // LANE     # 8 own storage rows per tile
_BIG = 3.0e38

(_X, _Y, _Z, _VX, _VY, _VZ, _AX, _AY, _AZ,
 _SIZE, _HEAD, _TYPE, _OID, _VALID, _ROW) = range(NF)


def _kernel(w_row_ref, w_nrows_ref, w_rlo_ref, w_rhi_ref,
            row_rlo_ref, row_rhi_ref, row_xlo_ref, row_xhi_ref,
            cr_floor_ref, cr_ceil_ref,
            *refs,
            cfg: SystemConfig, window_rows: int, n_windows: int):
    hbm = refs[:NF]
    outs = refs[NF:NF + 9]
    rest = refs[NF + 9:]
    own = rest[:NF]                    # 15 x VMEM (ROWS, LANE)
    win = rest[NF:2 * NF]              # 15 x VMEM (window_rows, LANE)
    outbuf = rest[2 * NF:2 * NF + 9]   # 9 x VMEM (ROWS, LANE)
    sem_own, sem_win, sem_out = rest[2 * NF + 9:]
    det = cfg.detect
    t = pl.program_id(0)

    base = pl.multiple_of(t * ROWS, ROWS)
    for f in range(NF):
        pltpu.make_async_copy(hbm[f].at[pl.ds(base, ROWS), :],
                              own[f], sem_own.at[f]).start()
    for f in range(NF):
        pltpu.make_async_copy(hbm[f].at[pl.ds(base, ROWS), :],
                              own[f], sem_own.at[f]).wait()

    zero = jnp.zeros((ROWS, LANE), jnp.float32)
    outbuf[0][:, :] = zero                       # best risk
    outbuf[1][:, :] = zero - 1.0                 # best oid
    outbuf[2][:, :] = zero + _BIG                # ttc
    outbuf[3][:, :] = zero + _BIG                # dist
    outbuf[4][:, :] = zero                       # rel speed
    outbuf[5][:, :] = zero                       # cpx
    outbuf[6][:, :] = zero                       # cpy
    outbuf[7][:, :] = zero                       # cpz
    outbuf[8][:, :] = zero                       # count

    conv = 1.0 if det.convention == "physical" else -1.0
    r_max = det.search_radius
    r2_max = r_max * r_max
    dtt = det.time_step
    t_max = det.time_window - det.time_step + 1e-6

    def window_pass(w, _):
        # window tables are flattened [T*W] (2D SMEM operands pad to 128
        # lanes and blow the 1 MB SMEM budget at large T)
        wi = t * n_windows + w
        wrow = pl.multiple_of(w_row_ref[wi], ROWS)
        wn = w_nrows_ref[wi]
        rlo_i = w_rlo_ref[wi]
        rhi_i = w_rhi_ref[wi]
        rlo = rlo_i.astype(jnp.float32)
        rhi = rhi_i.astype(jnp.float32)
        wn_eff = jnp.minimum(wn, window_rows)

        @pl.when(wn > 0)
        def _():
            for f in range(NF):
                pltpu.make_async_copy(
                    hbm[f].at[pl.ds(wrow, window_rows), :],
                    win[f], sem_win.at[f]).start()
            for f in range(NF):
                pltpu.make_async_copy(
                    hbm[f].at[pl.ds(wrow, window_rows), :],
                    win[f], sem_win.at[f]).wait()

            def sub_pass(s, _):
                go = base + s
                sr_lo = row_rlo_ref[go]
                sr_hi = row_rhi_ref[go]
                ox_lo = row_xlo_ref[go]
                ox_hi = row_xhi_ref[go]
                ovalid = own[_VALID][s, :][:, None]
                o_ok = ovalid > 0.5
                colv = lambda f: own[f][s, :][:, None]
                ox, oy, oz = colv(_X), colv(_Y), colv(_Z)
                ovx, ovy, ovz = colv(_VX), colv(_VY), colv(_VZ)
                oax, oay, oaz = colv(_AX), colv(_AY), colv(_AZ)
                osize, ohead = colv(_SIZE), colv(_HEAD)
                otype, ooid = colv(_TYPE), colv(_OID)

                # exact candidate storage-row span for this sub-block: the
                # cell-rows [sr_lo-1, sr_hi+1] clipped to this window's
                # range, mapped through the cr_floor/cr_ceil tables — no
                # per-row adjacency branching at all
                tab_max = jnp.int32(cr_floor_ref.shape[0] - 1)
                a = jnp.maximum(sr_lo - 1, rlo_i)
                b = jnp.minimum(sr_hi + 1, rhi_i)
                a_c = jnp.clip(a, 0, tab_max)
                b_c = jnp.clip(b + 1, 0, tab_max)
                c_lo = jnp.clip(cr_floor_ref[a_c] - wrow, 0, wn_eff)
                c_hi = jnp.clip(cr_ceil_ref[b_c] - wrow, 0, wn_eff)
                c_hi = jnp.where(b < a, c_lo, c_hi)

                def crow_pass(c, _):
                    gr = wrow + c
                    cx_lo = row_xlo_ref[gr]
                    cx_hi = row_xhi_ref[gr]

                    # x-overlap guard (sorted order makes rows x-coherent)
                    @pl.when((cx_lo <= ox_hi + r_max)
                             & (cx_hi >= ox_lo - r_max))
                    def _():
                        rowv = lambda f: win[f][c, :][None, :]
                        cx, cy, cz = rowv(_X), rowv(_Y), rowv(_Z)
                        cvx, cvy, cvz = rowv(_VX), rowv(_VY), rowv(_VZ)
                        cax, cay, caz = rowv(_AX), rowv(_AY), rowv(_AZ)
                        csize, chead = rowv(_SIZE), rowv(_HEAD)
                        ctype, coid = rowv(_TYPE), rowv(_OID)
                        cvalid, crow = rowv(_VALID), rowv(_ROW)
                        c_ok = ((cvalid > 0.5) & (crow >= rlo)
                                & (crow <= rhi))

                        # stage 1: exact radius + alive + no self
                        dxp, dyp, dzp = cx - ox, cy - oy, cz - oz
                        d2 = dxp * dxp + dyp * dyp + dzp * dzp
                        ok = (c_ok & o_ok & (coid != ooid)
                              & (d2 <= r2_max))

                        # stage 2: closest approach
                        dvx, dvy, dvz = cvx - ovx, cvy - ovy, cvz - ovz
                        rs2 = dvx * dvx + dvy * dvy + dvz * dvz
                        dot = dxp * dvx + dyp * dvy + dzp * dvz
                        rs2s = jnp.where(rs2 > 1e-12, rs2, 1.0)
                        ts = -(conv * dot) / rs2s
                        dax, day, daz = cax - oax, cay - oay, caz - oaz
                        cdx = dxp + dvx * ts + 0.5 * dax * ts * ts
                        cdy = dyp + dvy * ts + 0.5 * day * ts * ts
                        cdz = dzp + dvz * ts + 0.5 * daz * ts * ts
                        cd2 = cdx * cdx + cdy * cdy + cdz * cdz
                        safe = ((osize + csize) * 0.5
                                + det.safe_distance_base)
                        safe2 = safe * safe
                        ok &= ((rs2 >= det.min_relative_speed ** 2)
                               & (ts >= 0.0) & (ts <= det.time_window)
                               & (cd2 <= safe2))

                        # stage 3 (fast): first |p + v t| = safe crossing,
                        # snapped to the dt lattice
                        bq = 2.0 * dot
                        cq = d2 - safe2
                        disc = bq * bq - 4.0 * rs2 * cq
                        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                        t_en = (-bq - sq) / (2.0 * rs2s)
                        t_ex = (-bq + sq) / (2.0 * rs2s)
                        inside = cq <= 0.0
                        t_fi = jnp.where(inside, 0.0,
                                         jnp.maximum(t_en, 0.0))
                        t_sn = jnp.ceil(t_fi / dtt - 1e-6) * dtt
                        sok = inside | ((t_sn >= t_en - 1e-6)
                                        & (t_sn <= t_ex + 1e-6))
                        hit = (ok & (disc >= 0.0) & (rs2 > 1e-12)
                               & sok & (t_sn <= t_max))
                        t_hit = jnp.where(inside, 0.0, t_sn)
                        hdx = dxp + dvx * t_hit
                        hdy = dyp + dvy * t_hit
                        hdz = dzp + dvz * t_hit
                        d_hit = jnp.sqrt(hdx * hdx + hdy * hdy
                                         + hdz * hdz)

                        # stage 4: weighted risk
                        risk = (
                            det.weight_distance * (1.0 - d_hit / safe)
                            + det.weight_time
                            * (1.0 - jnp.minimum(
                                1.0, t_hit / det.max_warning_time))
                            + det.weight_speed
                            * jnp.minimum(1.0, jnp.sqrt(rs2)
                                          / det.max_relative_speed)
                            + det.weight_angle
                            * jnp.sin(jnp.abs(ohead - chead))
                            + det.weight_type
                            * jnp.where(ctype == otype,
                                        det.same_type_factor,
                                        det.diff_type_factor))
                        risk = jnp.where(hit,
                                         jnp.clip(risk, 0.0, 1.0), -1.0)

                        # midpoint at t_hit
                        mx = ox + 0.5 * dxp + 0.5 * (ovx + cvx) * t_hit
                        my = oy + 0.5 * dyp + 0.5 * (ovy + cvy) * t_hit
                        mz = oz + 0.5 * dzp + 0.5 * (ovz + cvz) * t_hit

                        # per-object best in this block; on ties each field
                        # takes the min among tied candidates
                        m = jnp.max(risk, axis=1, keepdims=True)
                        is_best = risk >= m
                        mins = lambda v: jnp.min(
                            jnp.where(is_best, v, _BIG), axis=1)
                        mrow = m[:, 0]

                        prev = outbuf[0][s, :]
                        upd = mrow > prev
                        ones = jnp.ones_like(risk)
                        pick = lambda k, new: jnp.where(
                            upd, mins(new), outbuf[k][s, :])[None, :]
                        outbuf[1][pl.ds(s, 1), :] = pick(1, coid * ones)
                        outbuf[2][pl.ds(s, 1), :] = pick(2, t_hit)
                        outbuf[3][pl.ds(s, 1), :] = pick(3, d_hit)
                        outbuf[4][pl.ds(s, 1), :] = pick(
                            4, jnp.sqrt(rs2) * ones)
                        outbuf[5][pl.ds(s, 1), :] = pick(5, mx * ones)
                        outbuf[6][pl.ds(s, 1), :] = pick(6, my * ones)
                        outbuf[7][pl.ds(s, 1), :] = pick(7, mz * ones)
                        outbuf[0][pl.ds(s, 1), :] = jnp.maximum(
                            prev, mrow)[None, :]
                        outbuf[8][pl.ds(s, 1), :] = (
                            outbuf[8][s, :] + jnp.sum(
                                jnp.where(hit, 1.0, 0.0), axis=1)
                        )[None, :]

                    return 0

                return jax.lax.fori_loop(c_lo, c_hi, crow_pass, 0)

            jax.lax.fori_loop(0, ROWS, sub_pass, 0)

        return 0

    jax.lax.fori_loop(0, n_windows, window_pass, 0)

    outbuf[0][:, :] = jnp.maximum(outbuf[0][:, :], 0.0)
    for f in range(9):
        pltpu.make_async_copy(outbuf[f],
                              outs[f].at[pl.ds(base, ROWS), :],
                              sem_out.at[f]).start()
    for f in range(9):
        pltpu.make_async_copy(outbuf[f],
                              outs[f].at[pl.ds(base, ROWS), :],
                              sem_out.at[f]).wait()


def fused_detect(cl: CellList, cfg: SystemConfig, interpret: bool = False):
    """Run the kernel. Returns per-sorted-object arrays (N = num_tiles*TILE):
    (best_risk [N], best_oid i32, best_ttc, best_dist, best_rel_speed,
    col_pos [N, 3], count i32). interpret=True uses the Pallas interpreter
    (CPU tests)."""
    T = cl.num_tiles
    wr = cl.window_rows
    kern = functools.partial(_kernel, cfg=cfg, window_rows=wr,
                             n_windows=cl.n_windows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=10,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * NF,
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 9,
        scratch_shapes=(
            [pltpu.VMEM((ROWS, LANE), jnp.float32)] * NF    # own
            + [pltpu.VMEM((wr, LANE), jnp.float32)] * NF    # window
            + [pltpu.VMEM((ROWS, LANE), jnp.float32)] * 9   # accumulators
            + [pltpu.SemaphoreType.DMA((NF,)),
               pltpu.SemaphoreType.DMA((NF,)),
               pltpu.SemaphoreType.DMA((9,))]
        ),
    )
    out_shape = [jax.ShapeDtypeStruct((T * ROWS, LANE), jnp.float32)
                 for _ in range(9)]
    field_list = [cl.fields[i] for i in range(NF)]
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(cl.w_row.reshape(-1), cl.w_nrows.reshape(-1),
      cl.w_rlo.reshape(-1), cl.w_rhi.reshape(-1),
      cl.row_rlo, cl.row_rhi, cl.row_xlo, cl.row_xhi,
      cl.cr_floor, cl.cr_ceil, *field_list)
    n = T * TILE
    risk, oid, ttc, dist, rs, cpx, cpy, cpz, cnt = (
        o.reshape(n) for o in outs)
    col_pos = jnp.stack([cpx, cpy, cpz], axis=-1)
    return (risk, oid.astype(jnp.int32), ttc, dist, rs, col_pos,
            cnt.astype(jnp.int32))

"""XLA post-pass over the fused kernel's top-k slots.

The kernel (fused_detect.py) returns per-object slots of (packed key,
candidate sorted index) plus counters. This module turns those into the
engine's outputs:

  * fast mode: scene top-A selection happens directly on the raw packed
    keys (they ARE the XLA scene ranking key 2*priority + risk); only the
    selected A pairs get their payload (ttc/dist/col_pos/...) recomputed by
    gathering candidate fields from the sorted cell-list arrays — A ~ 1k
    gathers instead of the round-1 design's 6 extra kernel output buffers.
  * precise mode: slots hold stage-2 survivors; they are compacted to
    `precise_survivor_cap` records and swept with the constant-acceleration
    sampled stage 3 (detect/pipeline._precise_sweep) — the reference's
    exact semantics (collision_detection.py:296-342) at fused-kernel scale.

All recomputation reuses detect/pipeline's stage functions on gathered
pairs, so refined values match the XLA reference path op-for-op.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpu_collide.core.config import SystemConfig
from tpu_collide.kernels.cell_list import CellList, FIELD_NAMES, LANE
from tpu_collide.kernels.fused_detect import (fused_topk, KEY_Q,
                                              PACKED_NONE, PACKED_OCC_MIN)
from tpu_collide.detect.pipeline import (_pair_safe_distance, _dist_at_time,
                                         _fast_first_crossing,
                                         _precise_sweep, _risk_score)
from tpu_collide.alerts.extract import AlertBatch, compute_priority

NF = len(FIELD_NAMES)
_FI = {name: i for i, name in enumerate(FIELD_NAMES)}


def decode_key(slots: jax.Array, cand_lanes: int = LANE) -> jax.Array:
    """Ranking key (2*priority + risk, or risk - 2 for sub-threshold hits)
    from a packed slot value (combined = round(key*kq)*CL + column, with
    kq*CL == KEY_Q*LANE invariant across candidate-row widths).
    Quantized to 1/kq."""
    kq = KEY_Q * (LANE / cand_lanes)
    return jnp.floor(slots * (1.0 / cand_lanes)) * (1.0 / kq)


def decode_risk(slots: jax.Array, cand_lanes: int = LANE) -> jax.Array:
    """risk from a packed slot value (valid only where occupied):
    qualifying keys are 2*priority + risk, sub-threshold keys are risk - 2;
    both satisfy risk = key - 2*floor(key/2). Quantized to 1/kq."""
    key = decode_key(slots, cand_lanes)
    return key - 2.0 * jnp.floor(key * 0.5)


@dataclasses.dataclass(frozen=True)
class RefinedPairs:
    """Recomputed detection quantities for explicit (own, cand) sorted-index
    pairs. `hit` is the full stage-1..3 pass recomputed in XLA."""
    hit: jax.Array        # [P] bool
    risk: jax.Array       # [P] f32 (0 where ~hit)
    ttc: jax.Array        # [P] f32 (inf where ~hit)
    distance: jax.Array   # [P] f32 distance at collision time
    rel_speed: jax.Array  # [P] f32
    col_pos: jax.Array    # [P, 3] f32
    priority: jax.Array   # [P] int32
    own_oid: jax.Array    # [P] int32
    cand_oid: jax.Array   # [P] int32


def refine_pairs(cl: CellList, own_idx: jax.Array, cand_idx: jax.Array,
                 cfg: SystemConfig, mode: str) -> RefinedPairs:
    """Recompute stages 1-4 for pairs given as indices into the sorted
    cell-list layout. mode='fast' uses the closed-form constant-velocity
    stage 3; mode='precise' runs the sampled constant-acceleration sweep
    (run this only on compacted survivor lists — it is a T-step loop)."""
    flat = cl.fields.reshape(cl.fields.shape[0], -1)
    nmax = flat.shape[1] - 1
    oi = jnp.clip(own_idx, 0, nmax)
    ci = jnp.clip(cand_idx, 0, nmax)

    # ONE [P, NFK] row gather per side instead of ~14 per-field 1D gathers
    # (gathers, not math, dominate these tails on TPU — same pattern as
    # refine_offset's flat_t / detect_rows' fmat; the transpose is a
    # once-per-step cost shared with nothing else but ~14x fewer gathers)
    flat_t = flat.T
    fo = flat_t[oi]                                  # [P, NFK]
    fc = flat_t[ci]
    return refine_rows(fo, fc, cfg, mode, cl.wide_oid)


def refine_rows(fo: jax.Array, fc: jax.Array, cfg: SystemConfig,
                mode: str, wide_oid: bool) -> RefinedPairs:
    """Stages 1-4 on PRE-GATHERED [P, NFK] field rows (one row per pair
    side). Split out of refine_pairs so callers whose index sets are
    mostly redundant can build fo/fc without [P]-row gathers: the hot
    top-up's own side is H distinct rows broadcast over every candidate
    and its cand side is H*S contiguous spans — the 1M profiler trace
    (results/profile_1m_r5.json) priced the two [122880, NFK] gathers at
    ~6 ms/step, vs ~free as a broadcast + dynamic slices."""
    det = cfg.detect

    def vec3(f, names):
        return jnp.stack([f[:, _FI[n]] for n in names], axis=-1)

    pos_o = vec3(fo, ("x", "y", "z"))
    pos_c = vec3(fc, ("x", "y", "z"))
    vel_o = vec3(fo, ("vx", "vy", "vz"))
    vel_c = vec3(fc, ("vx", "vy", "vz"))
    acc_o = vec3(fo, ("ax", "ay", "az"))
    acc_c = vec3(fc, ("ax", "ay", "az"))
    size_o = fo[:, _FI["size"]]
    size_c = fc[:, _FI["size"]]
    head_o = fo[:, _FI["heading"]]
    head_c = fc[:, _FI["heading"]]
    type_o = fo[:, _FI["otype"]]
    type_c = fc[:, _FI["otype"]]
    # pair identity on the RAW oid fields (halo mirrors keep their mark so
    # an object and its mirror stay distinct); reported oids are DECODED
    # (halo unmarked, wide (hi, lo) recombined)
    lo_o = fo[:, _FI["oid"]].astype(jnp.int32)
    lo_c = fc[:, _FI["oid"]].astype(jnp.int32)
    if wide_oid:
        hi_o = fo[:, NF].astype(jnp.int32)
        hi_c = fc[:, NF].astype(jnp.int32)
        not_self = (lo_o != lo_c) | (hi_o != hi_c)
        hi_uo = jnp.where(hi_o <= -2, -hi_o - 2, hi_o)
        hi_uc = jnp.where(hi_c <= -2, -hi_c - 2, hi_c)
        oid_o = jnp.where(lo_o >= 0, hi_uo * (1 << 24) + lo_o, -1)
        oid_c = jnp.where(lo_c >= 0, hi_uc * (1 << 24) + lo_c, -1)
    else:
        not_self = lo_o != lo_c
        oid_o = jnp.where(lo_o <= -2, -lo_o - 2, lo_o)
        oid_c = jnp.where(lo_c <= -2, -lo_c - 2, lo_c)
    alive_o = fo[:, _FI["row"]] >= 0.0    # row -1 = dead/padding
    alive_c = fc[:, _FI["row"]] >= 0.0

    # stage 1
    rel_pos = pos_c - pos_o
    cur_dist = jnp.linalg.norm(rel_pos, axis=-1)
    ok1 = (alive_o & alive_c & not_self
           & (cur_dist <= det.search_radius))

    # stage 2 (detect/pipeline.py semantics, incl. the sign convention)
    sep_vel = vel_c - vel_o
    sep_acc = acc_c - acc_o
    rel_speed = jnp.linalg.norm(sep_vel, axis=-1)
    safe = _pair_safe_distance(size_o, size_c, det)
    conv = 1.0 if det.convention == "physical" else -1.0
    dot = conv * jnp.sum(rel_pos * sep_vel, axis=-1)
    rs2 = jnp.where(rel_speed > 0, rel_speed * rel_speed, 1.0)
    t_star = -dot / rs2
    closest = _dist_at_time(rel_pos, sep_vel, sep_acc, t_star)
    pass2 = (ok1 & (rel_speed >= det.min_relative_speed)
             & (t_star >= 0.0) & (t_star <= det.time_window)
             & (closest <= safe))

    # stage 3
    if mode == "fast":
        hit, t_hit, d_hit = _fast_first_crossing(rel_pos, sep_vel, safe, det)
        hit &= pass2
    else:
        hit, t_hit, d_hit = _precise_sweep(rel_pos, sep_vel, sep_acc,
                                           safe, det)
        hit &= pass2

    # collision position = midpoint of the two predicted positions
    t_h = jnp.where(hit, t_hit, 0.0)[..., None]
    fut_o = pos_o + vel_o * t_h + 0.5 * acc_o * t_h * t_h
    fut_c = pos_c + vel_c * t_h + 0.5 * acc_c * t_h * t_h
    col_pos = 0.5 * (fut_o + fut_c)

    # stage 4
    risk = _risk_score(jnp.where(hit, d_hit, 0.0), jnp.where(hit, t_hit, 0.0),
                       rel_speed, head_o, head_c, type_o, type_c, safe, det)
    risk = jnp.where(hit, risk, 0.0)
    ttc = jnp.where(hit, t_hit, jnp.inf)
    prio = compute_priority(risk, ttc, cfg)
    return RefinedPairs(
        hit=hit, risk=risk, ttc=ttc,
        distance=jnp.where(hit, d_hit, jnp.inf),
        rel_speed=jnp.where(hit, rel_speed, 0.0),
        col_pos=col_pos, priority=prio, own_oid=oid_o, cand_oid=oid_c)


@dataclasses.dataclass(frozen=True)
class FusedSceneResult:
    alerts: AlertBatch
    num_checked: jax.Array     # [] i32 stage-1 pairs (within radius)
    num_risks: jax.Array       # [] i32 per-direction detected risks
    max_risk: jax.Array        # [] f32
    alert_overflow: jax.Array  # [] i32 qualifying pairs beyond per-object
                               # slots (fast) / survivors beyond slots+cap
                               # (precise) — possible (not certain) alert
                               # coverage loss; 0 means the list is exact


def _alert_batch(valid, soid_sel, ref: RefinedPairs, cfg) -> AlertBatch:
    return AlertBatch(
        vehicle_oid=jnp.where(valid, soid_sel, -1),
        other_oid=jnp.where(valid, ref.cand_oid, -1),
        risk=jnp.where(valid, ref.risk, 0.0),
        ttc=jnp.where(valid, ref.ttc, jnp.inf),
        distance=jnp.where(valid, ref.distance, jnp.inf),
        rel_speed=jnp.where(valid, ref.rel_speed, 0.0),
        priority=jnp.where(valid, ref.priority, 0),
        col_pos=ref.col_pos,
        valid=valid,
        count=jnp.sum(valid, dtype=jnp.int32),
    )


def _hot_topup(cl: CellList, cfg: SystemConfig, qual: jax.Array, k: int):
    """Exact top-up for HOT rows (own rows whose qualifying pair count
    exceeds the k kernel slots — the only source of alert_overflow in fast
    mode). Instead of re-running the whole fleet at a bigger k (r4's
    adopt-k paid +44 ms at 1M for a handful of rows), the up-to-H hottest
    rows get their full 1-cell-stencil neighborhoods — the exact candidate
    set the kernel scans, re-derived from cl.cr_start brow spans per
    static shift — re-refined in XLA, and their exact pair keys replace
    their (possibly truncated) slot keys in the scene selection. Rows
    beyond H stay slot-covered and counted in alert_overflow, so the
    certificate contract is unchanged: alert_overflow == 0 still means
    provably complete, it just happens at small k now.

    Returns (covered [m] bool, hkey [P] f32 scene rank key (-1 invalid),
    hown [P] i32, hcand [P] i32) with P = H * n_shifts * window span.
    The whole pair computation sits behind a lax.cond on any-hot, so
    fleets with no hot rows pay only the top-k row scan."""
    det = cfg.detect
    H = det.hot_topup
    m = qual.shape[0]
    own = cl.own_flat
    hot = own & (qual > k)
    n_hot = jnp.sum(hot, dtype=jnp.int32)
    # hottest rows first: overflow concentrates where qual is largest
    hot_rank = jnp.where(hot, qual.astype(jnp.float32), -1.0)
    if m % LANE == 0 and m >= LANE * H:
        # two-stage scan: a full top_k over [m] cost 1.23 ms/step at 1M
        # (trace sort.205, results/profile_1m_r5.json) to find a handful
        # of rows. Stage 1 ranks LANE-row blocks by max (any block
        # holding a hot row outranks every hot-free block, so with
        # n_hot <= H every hot block survives the cut and stage 2 finds
        # ALL hot rows — same certificate as before). With n_hot > H the
        # covered subset can differ from the global hottest-H (still H
        # hot rows; the uncovered remainder stays counted either way).
        blk = hot_rank.reshape(-1, LANE)
        bq, bi = jax.lax.top_k(jnp.max(blk, axis=1), H)
        cand_rank = blk[bi].reshape(-1)                      # [H * LANE]
        cand_rows = (bi[:, None] * LANE
                     + jnp.arange(LANE, dtype=bi.dtype)[None, :]).reshape(-1)
        top_q, sel = jax.lax.top_k(cand_rank, H)
        hot_rows = cand_rows[sel]
    else:
        top_q, hot_rows = jax.lax.top_k(hot_rank, H)
    hot_valid = top_q > 0.0
    covered = jnp.zeros((m,), bool).at[hot_rows].set(hot_valid)

    shifts = cl.shifts
    S = len(shifts)
    R_flat = cl.fields.shape[1] * cl.fields.shape[2]
    brow_all = cl.fields[_FI["row"]].reshape(-1)
    nbrows = cl.cr_start.shape[0] - 1
    # static span cap per shift: a single object's span is 3 consecutive
    # brows. The auto-bander targets ~LANE elements per brow (≈3 rows),
    # but SMEM table limits force fatter brows at 10M+ — scale the cap
    # with the actual mean brow occupancy (static: both m and nbrows are
    # trace-time constants), 4x headroom over the 3-brow mean, floor 16
    # rows. Spans past the cap are COUNTED (short, the usual honesty
    # contract) so the certificate never lies.
    mean_rows = -(-3 * m // max(1, nbrows * cl.cand_lanes))
    W = min(cl.window_rows, max(16, 4 * mean_rows)) * cl.cand_lanes
    # dynamic_slice bound below; W == R_flat covers the WHOLE layout, so
    # the min can never introduce a shortfall the cap hadn't already
    W = min(W, R_flat)
    b_hot = jnp.clip(brow_all[hot_rows].astype(jnp.int32), 0, nbrows - 1)

    def compute(_):
        # Candidate spans are CONTIGUOUS runs of the sorted layout
        # ([start, end) per hot row x shift), and the own side is H
        # distinct rows broadcast — so fo/fc are built from H tiny
        # gathers + H*S dynamic slices of the packed [R_flat, NFK]
        # field matrix instead of two [H*S*W]-row gathers (the trace
        # priced those at ~6 ms/step at 1M: results/profile_1m_r5.json
        # fusion.10/fusion.11).
        flat_t = cl.fields.reshape(cl.fields.shape[0], -1).T
        NFK = flat_t.shape[1]
        row_col = _FI["row"]
        warange = jnp.arange(W, dtype=jnp.int32)
        short = jnp.int32(0)
        starts, ends = [], []
        for si, d in enumerate(shifts):
            lo = jnp.clip(b_hot + d - 1, 0, nbrows)
            hi = jnp.clip(b_hot + d + 2, 0, nbrows)
            start = cl.cr_start[lo]
            end = cl.cr_start[hi]
            short = short + jnp.sum(
                jnp.where(hot_valid,
                          jnp.maximum(end - start - W, 0), 0),
                dtype=jnp.int32)
            starts.append(start)
            ends.append(end)
        fc_h, p_h, use_h = [], [], []
        for h in range(H):
            fc_s, p_s, use_s = [], [], []
            for si, d in enumerate(shifts):
                start = starts[si][h]
                # clamped like dynamic_slice itself; positions below
                # `start` that the clamp drags in are masked by p >= start
                astart = jnp.clip(start, 0, R_flat - W)
                sl = jax.lax.dynamic_slice(flat_t, (astart, 0), (W, NFK))
                p = astart + warange
                cb = sl[:, row_col].astype(jnp.int32)
                rel = cb - (b_hot[h] + d)
                in_rng = ((p >= start) & (p < ends[si][h])
                          & (cb >= 0) & (rel >= -1) & (rel <= 1))
                # clipping can make nearby shifts' spans overlap on tiny
                # grids — each candidate brow belongs to the FIRST shift
                # whose nominal range holds it, so no pair enters twice
                for dp in shifts[:si]:
                    relp = cb - (b_hot[h] + dp)
                    in_rng &= ~((relp >= -1) & (relp <= 1))
                fc_s.append(sl)
                p_s.append(p)
                use_s.append(in_rng)
            fc_h.append(jnp.concatenate(fc_s, axis=0))       # [S*W, NFK]
            p_h.append(jnp.concatenate(p_s))
            use_h.append(jnp.concatenate(use_s))
        fc = jnp.stack(fc_h)                             # [H, S*W, NFK]
        cand = jnp.stack(p_h)                            # [H, S*W]
        use = jnp.stack(use_h) & hot_valid[:, None]
        hown = jnp.broadcast_to(hot_rows[:, None], cand.shape).reshape(-1)
        hcand = cand.reshape(-1)
        fo_rows = flat_t[jnp.clip(hot_rows, 0, R_flat - 1)]   # [H, NFK]
        fo = jnp.broadcast_to(fo_rows[:, None, :], fc.shape)
        ref = refine_rows(fo.reshape(-1, NFK), fc.reshape(-1, NFK),
                          cfg, mode="fast", wide_oid=cl.wide_oid)
        q = (use.reshape(-1) & ref.hit
             & (ref.risk >= cfg.alerts.risk_low))
        # hot keys enter the scene selection in the SAME packed encoding
        # as the slot keys (column part 0) — no decode pass over the
        # [m, k] slot array, and ranking stays bit-compatible with the
        # kernel's (quantized key, column) order
        kq = KEY_Q * (LANE / cl.cand_lanes)
        hkey = jnp.where(
            q, jnp.round((ref.priority.astype(jnp.float32) * 2.0
                          + ref.risk) * kq) * cl.cand_lanes,
            PACKED_NONE)
        return hkey, hown, hcand, short

    def empty(_):
        P = H * S * W
        return (jnp.full((P,), PACKED_NONE, jnp.float32),
                jnp.zeros((P,), jnp.int32), jnp.zeros((P,), jnp.int32),
                jnp.int32(0))

    hkey, hown, hcand, short = jax.lax.cond(n_hot > 0, compute, empty, 0)
    return covered, hkey, hown, hcand, short


def fused_scene_fast(cl: CellList, cfg: SystemConfig,
                     interpret: bool = False) -> FusedSceneResult:
    """Fast-mode fused pipeline after the cell-list build: kernel top-k ->
    scene top-A on raw packed keys -> refine selected pairs -> AlertBatch.

    Alert semantics: each object's qualifying pairs enter from its own side
    (the reference's per-vehicle alert view, warning_system.py:120-197), so
    both directions of a pair may appear. The list equals the XLA scene
    selection whenever alert_overflow == 0.

    Sharded fleets: halo mirrors carry NEGATED oids (-(id + 2),
    shard/halo.extend_with_halo mark_halo), so cl.own_flat excludes them
    from alerts/risk counts and reported oids decode back automatically."""
    keys, idx_slots, checked, emitted, qual = fused_topk(
        cl, cfg, interpret, mode="hits", idx_layout="slots")
    m, k = keys.shape
    soid = cl.oid_flat
    own = cl.own_flat

    def slot_gather(flat):
        # candidate index for flat slot positions (row * k + j) from the
        # UNSTACKED per-slot buffers: k tiny [a] gathers + a one-hot
        # select — skips interleaving + int-converting all m*k entries
        # (~1.4 ms/step at 1M; see fused_topk idx_layout)
        rows, j = flat // k, flat % k
        cands = jnp.stack([s[rows] for s in idx_slots], axis=1)   # [a, k]
        oh = j[:, None] == jnp.arange(k, dtype=j.dtype)[None, :]
        return jnp.sum(jnp.where(oh, cands, 0.0), axis=1).astype(jnp.int32)

    occupied = keys > PACKED_OCC_MIN
    if cfg.detect.hot_topup > 0:
        # hot-object exact top-up: rows with qual > k swap their truncated
        # slot keys for exact XLA-refined neighborhood keys in the scene
        # selection; alert_overflow then counts only rows past the hot cap
        covered, hkey, hown, hcand, short = _hot_topup(cl, cfg, qual, k)
        sel = jnp.where(own[:, None] & occupied & ~covered[:, None],
                        keys, PACKED_NONE)
        a = min(cfg.alerts.max_scene_alerts, m * k + hkey.shape[0])
        if a < m:
            # two-stage EXACT scene top-A: stage 1 takes the top-A rows by
            # their best slot key (exact: a row holding a true top-A slot
            # has row-max >= that slot, so if it missed the row cut there
            # would be A rows whose maxima — each itself a slot — beat
            # that slot, contradiction); stage 2 ranks only those rows'
            # A*k slots. Shrinks the top_k input ~k x (the refine tail
            # was ~11 ms at 1M, ~150 ms at 10M on the flat m*k form).
            row_best = jnp.max(sel, axis=1)
            B = 8
            if m % B == 0 and a * B <= m:
                # block pre-cut for the row cut, same argument one level
                # up: a block holding a true top-A row has block-max >=
                # that row's best slot, so if it missed the block cut
                # there would be A block maxima — each itself a slot
                # from a distinct row — beating that slot. The full-[m]
                # row top_k cost 1.26 ms/step at 1M (trace sort.206,
                # results/profile_1m_r5.json); this reduces it to a
                # [m/8] block top_k + an [a*8] row top_k.
                blkb = row_best.reshape(-1, B)
                _, bi = jax.lax.top_k(jnp.max(blkb, axis=1), a)
                cand_rows = (bi[:, None] * B
                             + jnp.arange(B, dtype=bi.dtype)).reshape(-1)
                _, sel_i = jax.lax.top_k(blkb[bi].reshape(-1), a)
                rows_a = cand_rows[sel_i]
            else:
                _, rows_a = jax.lax.top_k(row_best, a)
            slot_keys = sel[rows_a].reshape(-1)            # [a*k]
            allk = jnp.concatenate([slot_keys, hkey])
            top_key, top_i = jax.lax.top_k(allk, a)
            is_slot = top_i < a * k
            si = jnp.clip(top_i, 0, a * k - 1)
            flat_slot = rows_a[si // k] * k + si % k
        else:
            allk = jnp.concatenate([sel.reshape(-1), hkey])
            top_key, top_i = jax.lax.top_k(allk, a)
            is_slot = top_i < m * k
            flat_slot = jnp.clip(top_i, 0, m * k - 1)
        valid = top_key >= 0.0                   # qualifying keys only
        hj = jnp.clip(top_i - (a * k if a < m else m * k), 0,
                      hkey.shape[0] - 1)
        own_slot = jnp.where(is_slot, flat_slot // k, hown[hj])
        cand_idx = jnp.where(is_slot, slot_gather(flat_slot), hcand[hj])
        oflow_rows = own & ~covered
    else:
        sel = jnp.where(own[:, None] & occupied, keys, PACKED_NONE)
        a = min(cfg.alerts.max_scene_alerts, m * k)
        top_key, top_flat = jax.lax.top_k(sel.reshape(-1), a)
        valid = top_key >= 0.0                   # qualifying keys only
        own_slot = top_flat // k
        cand_idx = slot_gather(top_flat)
        oflow_rows = own
        short = jnp.int32(0)
    ref = refine_pairs(cl, own_slot, cand_idx, cfg, mode="fast")
    valid &= ref.hit & (ref.risk >= cfg.alerts.risk_low)
    alerts = _alert_batch(valid, soid[own_slot], ref, cfg)

    slot_risk = jnp.where(occupied, decode_risk(keys, cl.cand_lanes), 0.0)
    return FusedSceneResult(
        alerts=alerts,
        num_checked=checked,
        num_risks=jnp.sum(jnp.where(own, emitted, 0), dtype=jnp.int32),
        max_risk=jnp.max(slot_risk),
        alert_overflow=short + jnp.sum(
            jnp.where(oflow_rows, jnp.maximum(qual - k, 0), 0),
            dtype=jnp.int32),
    )


def fused_scene_precise(cl: CellList, cfg: SystemConfig,
                        interpret: bool = False) -> FusedSceneResult:
    """Precise-mode fused pipeline: kernel emits per-object stage-2
    survivor slots; survivors compact to `precise_survivor_cap` records;
    the sampled constant-acceleration sweep + risk scoring run on the
    compacted list (exact reference stage-3 semantics at kernel scale)."""
    det = cfg.detect
    keys, idx, checked, emitted, qual = fused_topk(cl, cfg, interpret,
                                                   mode="survivors")
    m, k = keys.shape
    soid = cl.oid_flat
    own = cl.own_flat

    occupied = (keys > PACKED_OCC_MIN) & own[:, None]
    sel = jnp.where(occupied, keys, PACKED_NONE)
    cap = min(cfg.survivor_cap, m * k)
    top_key, top_flat = jax.lax.top_k(sel.reshape(-1), cap)
    svalid = top_key >= 0.0                 # packed survivor keys in [0, 1]
    own_slot = top_flat // k
    cand_idx = idx.reshape(-1)[top_flat]
    ref = refine_pairs(cl, own_slot, cand_idx, cfg, mode="precise")
    hit = ref.hit & svalid
    ref = dataclasses.replace(
        ref, hit=hit,
        risk=jnp.where(hit, ref.risk, 0.0),
        ttc=jnp.where(hit, ref.ttc, jnp.inf),
        distance=jnp.where(hit, ref.distance, jnp.inf),
        rel_speed=jnp.where(hit, ref.rel_speed, 0.0),
        priority=jnp.where(hit, ref.priority, 0))

    # scene top-A over the swept records, XLA ranking key
    keep = hit & (ref.risk >= cfg.alerts.risk_low)
    rank = jnp.where(keep, ref.priority.astype(jnp.float32) * 2.0 + ref.risk,
                     -1.0)
    a = min(cfg.alerts.max_scene_alerts, cap)
    top_rank, sel_i = jax.lax.top_k(rank, a)
    valid = top_rank >= 0.0
    take = lambda x: x[sel_i]
    ref_a = RefinedPairs(**{f.name: take(getattr(ref, f.name))
                            for f in dataclasses.fields(RefinedPairs)})
    alerts = _alert_batch(valid, soid[own_slot][sel_i], ref_a, cfg)

    n_surv = jnp.sum(jnp.where(occupied, 1, 0), dtype=jnp.int32)
    slot_overflow = jnp.sum(
        jnp.where(own, jnp.maximum(emitted - k, 0), 0), dtype=jnp.int32)
    return FusedSceneResult(
        alerts=alerts,
        num_checked=checked,
        num_risks=jnp.sum(hit, dtype=jnp.int32),
        max_risk=jnp.max(jnp.where(hit, ref.risk, 0.0)),
        alert_overflow=(slot_overflow
                        + jnp.maximum(n_surv - cap, 0).astype(jnp.int32)),
    )


def _predict_hot_topup(cl, cfg, flat, flat_t, m, offs, uncert, excess_s,
                       slot_cols, merged, slot_oflow, w_stat0, widens,
                       merge_k, sub_window):
    """Exact re-merge for predict rows whose per-offset slot truncations
    the certificate could NOT prove harmless (the step path's hot top-up,
    transplanted to prediction). For the hottest flagged (offset, row)
    pairs the offset's FULL candidate list is recomputed in XLA over
    widened cr_start brow spans (a superset of the kernel's widened
    windows — candidate membership is decided by the radius check, so
    supersets are exact) and its exact top-merge_k is ADDED to the row's
    merge pool — duplicates are harmless because the merge dedups by
    other-id keeping the max, and identical pairs carry identical values.
    Adding entries can only RAISE a row's merge_k-th pool risk, so
    certificates already granted stay sound. Flagged pairs beyond the
    static recompute budget, span shortfalls, and fleets whose traced
    displacement exceeds the static widening bound all FAIL CLOSED: their
    excess stays in slot_oflow."""
    import dataclasses as _dc
    from tpu_collide.detect.predict import merge_pair_risks
    from tpu_collide.detect.pipeline import (_pair_safe_distance,
                                             _precise_sweep, _risk_score)
    det = cfg.detect
    n_off = offs.shape[0]
    HOT_F = min(1024, n_off * m)         # flagged (offset, row) recomputes
    H_U = min(512, m)                    # union rows re-merged

    excess_u = jnp.where(uncert, excess_s, 0)               # [n_off, m]
    total_unc = jnp.sum(excess_u, dtype=jnp.int32)
    flat_ex = excess_u.reshape(-1).astype(jnp.float32)
    fex, fidx = jax.lax.top_k(flat_ex, HOT_F)
    f_valid = fex > 0.0
    f_off = fidx // m
    f_row = fidx % m
    urow_ex = jnp.sum(excess_u, axis=0).astype(jnp.float32)  # [m]
    uex, urows = jax.lax.top_k(urow_ex, H_U)
    u_valid = uex > 0.0
    row2slot = jnp.full((m,), -1, jnp.int32).at[urows].set(
        jnp.where(u_valid, jnp.arange(H_U, dtype=jnp.int32), -1))

    # widened candidate spans (static length, counted shortfall)
    nbrows = cl.cr_start.shape[0] - 1
    span_brows = 3 + 2 * w_stat0
    mean_rows = -(-span_brows * m // max(1, nbrows * cl.cand_lanes))
    X1 = min(cl.window_rows, max(8, 2 * mean_rows)) * cl.cand_lanes
    X = X1 * len(cl.shifts)
    R_flat = flat.shape[1]
    brow_all = flat[_FI["row"]]
    EK = min(merge_k, X)
    C = 64                                # flagged rows per map chunk
    n_chunk = -(-HOT_F // C)
    pad = n_chunk * C - HOT_F
    padc = lambda a, v: jnp.concatenate(
        [a, jnp.full((pad,), v, a.dtype)]) if pad else a

    def chunk_body(xs):
        """Exact per-offset detection for C flagged (offset, row) pairs —
        op-for-op the refine_offset / predict_collisions expressions,
        with the offset a PER-ROW value. Chunked via lax.map so the
        [C*X, NFK] candidate gather stays ~tens of MB."""
        f_row, f_off, f_valid = xs
        b_f = jnp.clip(brow_all[f_row].astype(jnp.int32), 0, nbrows - 1)
        # per-row TRACED widening (this offset's actual fleet-displacement
        # bound, same formula as the kernel's window widening) — the
        # static w_stat0 config bound over-widens spans ~4x on tame
        # fleets, which made every dense-core span overflow the static
        # cap and fail the whole certificate closed (r5 TPU probe)
        wdn = widens[jnp.clip(f_off, 0, n_off - 1)]
        idx_s, ok_s = [], []
        short = jnp.zeros_like(b_f)           # per-ROW shortfall
        for d in cl.shifts:
            lo = jnp.clip(b_f + d - 1 - wdn, 0, nbrows)
            hi = jnp.clip(b_f + d + 2 + wdn, 0, nbrows)
            start = cl.cr_start[lo]
            end = cl.cr_start[hi]
            short = short + jnp.maximum(end - start - X1, 0)
            idx = start[:, None] + jnp.arange(X1, dtype=jnp.int32)[None, :]
            ok_s.append(idx < end[:, None])
            idx_s.append(jnp.clip(idx, 0, R_flat - 1))
        cand = jnp.concatenate(idx_s, axis=1)               # [C, X]
        use = jnp.concatenate(ok_s, axis=1) & f_valid[:, None]

        ci = cand.reshape(-1)
        cf = flat_t[ci]                                     # [C*X, NFK]
        fo = flat_t[jnp.clip(f_row, 0, R_flat - 1)]         # [C, NFK]
        bo = lambda col: jnp.broadcast_to(col[:, None], (C, X)).reshape(-1)
        go = lambda name: bo(fo[:, _FI[name]])
        gc = lambda name: cf[:, _FI[name]]
        v3 = lambda f, names: jnp.stack([f(n) for n in names], axis=-1)
        p_o = v3(go, ("x", "y", "z"))
        p_c = v3(gc, ("x", "y", "z"))
        v_o = v3(go, ("vx", "vy", "vz"))
        v_c = v3(gc, ("vx", "vy", "vz"))
        a_o = v3(go, ("ax", "ay", "az"))
        a_c = v3(gc, ("ax", "ay", "az"))
        c_o = bo(fo[:, -1]).astype(jnp.int32)[:, None]      # traj class
        t_o = bo(offs[jnp.clip(f_off, 0, n_off - 1)])
        t_ob = t_o[:, None]
        p_cv = p_o + v_o * t_ob
        p_acc = p_cv + 0.5 * a_o * t_ob * t_ob
        pred = jnp.where(c_o == 0, p_o, jnp.where(c_o == 1, p_cv, p_acc))
        o_pos = p_c + v_c * t_ob + 0.5 * a_c * t_ob * t_ob
        alive_o = go("row") >= 0.0
        alive_c = gc("row") >= 0.0
        lo_o = go("oid").astype(jnp.int32)
        lo_c = gc("oid").astype(jnp.int32)
        if cl.wide_oid:
            hi_o = bo(fo[:, NF]).astype(jnp.int32)
            hi_c = cf[:, NF].astype(jnp.int32)
            not_self = (lo_o != lo_c) | (hi_o != hi_c)
            hi_uc = jnp.where(hi_c <= -2, -hi_c - 2, hi_c)
            oid_c = jnp.where(lo_c >= 0, hi_uc * (1 << 24) + lo_c, -1)
        else:
            not_self = lo_o != lo_c
            oid_c = jnp.where(lo_c <= -2, -lo_c - 2, lo_c)
        ok = (alive_o & alive_c & not_self & use.reshape(-1)
              & (jnp.linalg.norm(p_c - pred, axis=-1)
                 <= det.search_radius))
        safe = _pair_safe_distance(go("size"), gc("size"), det)
        sub_det = _dc.replace(det, time_window=sub_window)
        hit, t_hit, d_hit = _precise_sweep(o_pos - pred, v_c - v_o,
                                           a_c - a_o, safe, sub_det)
        hit = hit & ok
        rel_speed = jnp.linalg.norm(v_c - v_o, axis=-1)
        risk = _risk_score(jnp.where(hit, d_hit, 0.0),
                           jnp.where(hit, t_hit, 0.0),
                           rel_speed, go("heading"), gc("heading"),
                           go("otype").astype(jnp.int32),
                           gc("otype").astype(jnp.int32), safe, det)
        risk = jnp.where(hit, risk, 0.0)
        ttc = jnp.where(hit, t_hit + t_o, jnp.inf)
        dist = jnp.where(hit, d_hit, jnp.inf)

        # exact top-merge_k per flagged (offset, row): entries beyond an
        # offset's local top-merge_k can never reach the global pool
        rk = jnp.where(hit, risk, -1.0).reshape(C, X)
        tk, ti = jax.lax.top_k(rk, EK)
        gat = lambda a: jnp.take_along_axis(a.reshape(C, X), ti, 1)
        e_other = gat(oid_c.astype(jnp.float32)).astype(jnp.int32)
        e_hit = tk >= 0.0
        return (e_other, e_hit, jnp.where(e_hit, tk, 0.0),
                jnp.where(e_hit, gat(ttc), jnp.inf),
                jnp.where(e_hit, gat(dist), jnp.inf), short)

    def run_topup(_):
        xs = tuple(padc(a, v).reshape(n_chunk, C)
                   for a, v in ((f_row, 0), (f_off, 0)))
        xs += (padc(f_valid, False).reshape(n_chunk, C),)
        eo, eh, er, et, ed, shorts = jax.lax.map(chunk_body, xs)
        unp = lambda a: a.reshape(n_chunk * C, EK)[:HOT_F]
        return (unp(eo), unp(eh), unp(er), unp(et), unp(ed),
                shorts.reshape(n_chunk * C)[:HOT_F])

    def skip_topup(_):
        z = lambda v, dt: jnp.full((HOT_F, EK), v, dt)
        return (z(0, jnp.int32), z(False, bool), z(0.0, jnp.float32),
                z(jnp.inf, jnp.float32), z(jnp.inf, jnp.float32),
                jnp.zeros((HOT_F,), jnp.int32))

    e_other, e_hit, e_risk, e_ttc, e_dist, short = jax.lax.cond(
        total_unc > 0, run_topup, skip_topup, 0)

    # scatter extras into [H_U, n_off, EK] (one dump slot for non-union).
    # A flagged pair counts as covered only if its row is in the union
    # set AND its span did not overflow the static cap (a shorted span's
    # exact list is incomplete — it must neither supersede the slot
    # columns nor certify; per-pair, so one dense-core overflow no longer
    # fails the whole certificate closed)
    u_slot = row2slot[jnp.clip(f_row, 0, m - 1)]
    okf = f_valid & (u_slot >= 0) & (short == 0)
    tgt = jnp.where(okf, u_slot * n_off + jnp.clip(f_off, 0, n_off - 1),
                    H_U * n_off)
    zb = lambda v, dt: jnp.full((H_U * n_off + 1, EK), v, dt)
    x_other = zb(0, jnp.int32).at[tgt].set(e_other)[:-1]
    x_hit = zb(False, bool).at[tgt].set(e_hit)[:-1]
    x_risk = zb(0.0, jnp.float32).at[tgt].set(e_risk)[:-1]
    x_ttc = zb(jnp.inf, jnp.float32).at[tgt].set(e_ttc)[:-1]
    x_dist = zb(jnp.inf, jnp.float32).at[tgt].set(e_dist)[:-1]
    resh = lambda a: a.reshape(H_U, n_off * EK)

    # union re-merge: slot columns + exact extras. Recomputed offsets'
    # slot columns are EXCLUDED — their exact top-EK supersedes them, and
    # keeping both would put duplicate (pair, offset) entries in the
    # pre-dedup pool, eating top-merge_k slots and displacing distinct
    # pairs (caught by the fused-vs-XLA predict parity test).
    other_s, hit_s, risk_s, ttc_s, dist_s = slot_cols
    kk_slots = hit_s.shape[1] // n_off
    recomp = jnp.zeros((H_U * n_off + 1,), bool).at[tgt].set(okf)[:-1]
    keep_cols = ~jnp.repeat(recomp.reshape(H_U, n_off), kk_slots, axis=1)
    hit_u = hit_s[urows] & keep_cols
    catu = lambda s, x: jnp.concatenate([s[urows], resh(x)], axis=1)
    mo, mv, mr, mt, md = merge_pair_risks(
        catu(other_s, x_other),
        jnp.concatenate([hit_u, resh(x_hit)], axis=1),
        catu(risk_s, x_risk), catu(ttc_s, x_ttc), catu(dist_s, x_dist),
        merge_k)
    upd = lambda big, small: big.at[urows].set(
        jnp.where(u_valid[:, None], small, big[urows]))
    o_m, v_m, r_m, t_m, d_m = merged
    merged = (upd(o_m, mo), upd(v_m, mv), upd(r_m, mr), upd(t_m, mt),
              upd(d_m, md))

    # certificate update: covered flagged pairs are exact now; everything
    # else (beyond the budget, outside the union set, shorted spans)
    # fails closed and stays counted
    covered = jnp.sum(jnp.where(okf, fex, 0.0)).astype(jnp.int32)
    slot_oflow = total_unc - covered
    return merged, slot_oflow


def fused_predict_rows(state, cls, cfg: SystemConfig,
                       horizon: float = 10.0, step: float = 0.5,
                       sub_window: float = 1.0, merge_k: int = 32,
                       k_slots: int = 8, window_rows: Optional[int] = None,
                       interpret: bool = False):
    """Row-space core of the fused prediction: takes the per-object
    trajectory CLASS array (aligned with `state` order; halo mirrors may
    ride along with marked oids and stationary class — their query rows
    are masked by `own`), returns per-SORTED-ROW merged records:

        (other_oid [m, merge_k] i32 DECODED, valid, risk, ttc, dist,
         soid [m] i32 decoded row oids, own [m] bool,
         overflow [] i32 window overflow,
         slot_oflow [] i32 UNCERTIFIED slot truncations (possible
         coverage loss — see fused_predict's counter docs),
         slot_trunc [] i32 raw counted truncations incl. the
         certified-harmless ones)

    The sharded path (shard/predict.py backend='fused') consumes this
    directly — no object-indexed scatter, which would need a
    num_objects-sized buffer per shard.

    Same semantics and return tuple as detect/predict.predict_collisions
    (unbanded layouts, 2D and 3D — 3D widens the static z-shift list to
    every layer a class-advanced query can reach): per offset the kernel
    evaluates
    class-advanced own objects against const-accel-advanced candidates
    drawn from TODAY's sorted layout (the reference's current-grid quirk,
    collision_detection.py:800-812), sweeps the 1 s sub-window in-block,
    and keeps per-object top-k_slots risks; selected pairs are recomputed
    in XLA with the SAME helpers predict_collisions uses, so values match
    op-for-op and only candidate selection rides the kernel. Candidate
    windows widen by the fleet's max displacement per offset, so coverage
    is a superset of the reference's pred-cell stencil (capacity
    overflows are counted in the returned CellList, never silent).

    `other` entries are OIDs (== state indices for arange-oid fleets).
    """
    from tpu_collide.kernels.cell_list import build_cell_list, TILE
    from tpu_collide.detect.predict import (classify_trajectories,
                                            merge_pair_risks)

    det = cfg.detect
    from tpu_collide.kernels.cell_list import resolve_band_cells
    assert resolve_band_cells(cfg) == cfg.grid_dims[0], (
        "fused_predict requires the unbanded layout (band_cells=None)")
    offsets = [float(o) for o in np.arange(0.0, horizon, step)]
    o_max = offsets[-1] if offsets else 0.0
    sub_steps = int(round(sub_window / det.time_step))

    # fleet-exact displacement bound per offset (class advance uses the
    # CURRENT velocity/acceleration, so |v| t + 0.5 |a| t^2 bounds it)
    vmag = jnp.where(state.alive, jnp.linalg.norm(state.vel, axis=-1), 0.0)
    amag = jnp.where(state.alive, jnp.linalg.norm(state.acc, axis=-1), 0.0)
    vmax = jnp.max(vmag)
    amax = jnp.max(amag)

    def disp(o):
        return vmax * o + 0.5 * amax * o * o

    cell = cfg.grid.cell_size
    widen_max = jnp.ceil(disp(o_max) / cell).astype(jnp.int32)
    # 3D: the static z-shift list must reach every layer a predicted query
    # can touch (displacement + the search radius), bounded by the CONFIG
    # motion limits (data beyond them overflows windows, counted)
    w_stat0 = int(np.ceil(
        (cfg.sim.max_speed * o_max
         + 0.5 * cfg.sim.accel_range * o_max * o_max)
        / cell)) if o_max > 0 else 0
    z_reach = (w_stat0 + 1) if cfg.world.is_3d else 1
    if window_rows is None:
        # static window capacity must hold the widened ranges; size from
        # the CONFIG motion bounds (the traced fleet bound drives the
        # ranges; excess over this static guess is counted in overflow)
        from tpu_collide.kernels.cell_list import LANE, ALIGN
        w_stat = int(np.ceil(
            (cfg.sim.max_speed * o_max
             + 0.5 * cfg.sim.accel_range * o_max * o_max) / cell))
        nbrows = cfg.grid_dims[1] * cfg.grid_dims[2]
        mean_per_brow = cfg.num_objects / max(1, nbrows)
        elems = int((4 + 2 * w_stat) * mean_per_brow) + TILE + ALIGN + LANE
        window_rows = -(-(-(-elems // LANE)) // 8) * 8
    cl = build_cell_list(state, cfg, window_rows=window_rows,
                         extra=cls.astype(jnp.float32),
                         brow_widen=widen_max, z_reach=z_reach,
                         interpret=interpret)

    flat = cl.fields.reshape(cl.fields.shape[0], -1)
    nmax = flat.shape[1] - 1
    m = cl.num_tiles * TILE
    soid = cl.oid_flat
    # one [pairs, NFK] row gather per offset instead of ~14 per-field
    # gathers: the transpose is loop-invariant across the offset scan and
    # gathers, not math, are the expensive op on TPU
    flat_t = flat.T

    def refine_offset(o, keys, idx):
        """Recompute (hit, risk, ttc, dist) for the selected pairs with the
        XLA predict helpers — values bit-match predict_collisions."""
        from tpu_collide.detect.pipeline import (_pair_safe_distance,
                                                 _precise_sweep, _risk_score)
        occupied = keys > PACKED_OCC_MIN
        kk = idx.shape[1]
        ci = jnp.clip(idx.reshape(-1), 0, nmax)
        cf = flat_t[ci]                               # [pairs, NFK]
        g = lambda name, rows: cf[:, _FI[name]]
        # own rows are arange repeated kk times — gather each own field
        # ONCE at [m] and broadcast, instead of a [m*kk] gather (gathers,
        # not math, are the expensive op on TPU)
        bo = lambda arr: jnp.broadcast_to(
            arr[:m, None], (m, kk)).reshape(-1)
        go = lambda name: bo(flat[_FI[name]])
        gv = lambda name: (go(name), g(name, ci))
        pox, pcx = gv("x")
        poy, pcy = gv("y")
        poz, pcz = gv("z")
        vox, vcx = gv("vx")
        voy, vcy = gv("vy")
        voz, vcz = gv("vz")
        aox, acx = gv("ax")
        aoy, acy = gv("ay")
        aoz, acz = gv("az")
        p_o = jnp.stack([pox, poy, poz], -1)
        p_c = jnp.stack([pcx, pcy, pcz], -1)
        v_o = jnp.stack([vox, voy, voz], -1)
        v_c = jnp.stack([vcx, vcy, vcz], -1)
        a_o = jnp.stack([aox, aoy, aoz], -1)
        a_c = jnp.stack([acx, acy, acz], -1)
        c_o = bo(flat[-1]).astype(jnp.int32)[:, None]   # trajectory class
                                                        # (last sorted field)
        t_o = jnp.float32(o)
        # class-predicted own position (detect/predict._predicted_position)
        p_cv = p_o + v_o * t_o
        p_acc = p_cv + 0.5 * a_o * t_o * t_o
        pred = jnp.where(c_o == 0, p_o, jnp.where(c_o == 1, p_cv, p_acc))
        # candidate advanced const-accel (predict.py :808-812)
        o_pos = p_c + v_c * t_o + 0.5 * a_c * t_o * t_o
        alive_o = bo(flat[_FI["row"]]) >= 0.0
        alive_c = cf[:, _FI["row"]] >= 0.0
        lo_o = bo(flat[_FI["oid"]]).astype(jnp.int32)
        lo_c = cf[:, _FI["oid"]].astype(jnp.int32)
        if cl.wide_oid:
            hi_o = bo(flat[NF]).astype(jnp.int32)
            hi_c = cf[:, NF].astype(jnp.int32)
            not_self = (lo_o != lo_c) | (hi_o != hi_c)
            hi_uc = jnp.where(hi_c <= -2, -hi_c - 2, hi_c)
            oid_c = jnp.where(lo_c >= 0, hi_uc * (1 << 24) + lo_c, -1)
        else:
            not_self = lo_o != lo_c
            oid_c = jnp.where(lo_c <= -2, -lo_c - 2, lo_c)
        ok = (alive_o & alive_c & not_self
              & (jnp.linalg.norm(p_c - pred, axis=-1) <= det.search_radius))
        safe = _pair_safe_distance(go("size"), g("size", ci), det)
        sub_det = dataclasses.replace(det, time_window=sub_window)
        hit, t_hit, d_hit = _precise_sweep(o_pos - pred, v_c - v_o,
                                           a_c - a_o, safe, sub_det)
        hit = hit & ok & occupied.reshape(-1)
        rel_speed = jnp.linalg.norm(v_c - v_o, axis=-1)
        risk = _risk_score(jnp.where(hit, d_hit, 0.0),
                           jnp.where(hit, t_hit, 0.0),
                           rel_speed, go("heading"), g("heading", ci),
                           go("otype").astype(jnp.int32),
                           g("otype", ci).astype(jnp.int32), safe, det)
        risk = jnp.where(hit, risk, 0.0)
        ttc = jnp.where(hit, t_hit + t_o, jnp.inf)
        dist = jnp.where(hit, d_hit, jnp.inf)
        other = oid_c
        shape = (m, kk)
        return (other.reshape(shape), hit.reshape(shape),
                risk.reshape(shape), ttc.reshape(shape),
                dist.reshape(shape))

    # One offset per lax.scan step: the predict kernel's offset params are
    # all TRACED scalars (pred_ref), so a single Mosaic compile serves every
    # offset. The old per-offset python loop instantiated one structurally
    # identical pallas_call per offset and Mosaic compiled each separately —
    # ~2.5 min/offset at deep-z configs (BENCH_NOTES r3), linear in
    # horizon/step. Stacked [n_off, m, k] outputs transpose to the exact
    # column order the old per-offset concatenation produced.
    offs = jnp.asarray(offsets, jnp.float32)
    disps = vmax * offs + 0.5 * amax * offs * offs
    widens = jnp.ceil(disps / cell)

    own_flat = cl.own_flat

    # quantization granularity of the packed slot keys: a dropped hit's
    # TRUE risk can exceed the lowest KEPT slot's decoded (quantized) key
    # by at most one quantization step plus rounding; 0.51/kq covers both
    # halves of the round plus FMA-fusion ulps in the refined recompute
    # (local import: the window-sizing branch above does a conditional
    # `from cell_list import LANE`, which makes the module-level LANE
    # unbound here whenever window_rows was passed explicitly)
    from tpu_collide.kernels.cell_list import LANE as _LANE
    kq_eff = KEY_Q * (_LANE / cl.cand_lanes)
    key_margin = 0.51 / kq_eff

    def off_body(slot_trunc, xs):
        o, wdn, dsp = xs
        keys, idx, _, emitted, _ = fused_topk(
            cl, cfg, interpret, mode="predict",
            pred_params=(o, wdn, dsp),
            k_slots=k_slots, sub_steps=sub_steps)
        # hits beyond an object's k_slots at THIS offset fall out of its
        # slot list before the merge ever sees them — count them (the
        # emitted counter saturates at CNT_MAX which only UNDER-counts,
        # so 0 still certifies). Whether a truncation can actually LOSE
        # coverage is decided after the merge: slots hold the top-k hits
        # by (quantized) risk, so every dropped hit is bounded above by
        # the lowest kept slot's key + margin; if that bound is strictly
        # below the object's cross-offset merge_k-th pool risk, the drop
        # is PROVABLY harmless (it could never enter the final top-merge_k)
        excess = jnp.where(own_flat,
                           jnp.maximum(emitted - k_slots, 0), 0)
        slot_trunc = slot_trunc + jnp.sum(excess, dtype=jnp.int32)
        # lowest kept slot's quantized key (all k slots hold real hits
        # whenever excess > 0, since emitted > k_slots)
        kmin = decode_key(keys[:, k_slots - 1], cl.cand_lanes)
        bound = kmin + key_margin
        return slot_trunc, refine_offset(o, keys, idx) + (excess, bound)

    slot_trunc, stk = jax.lax.scan(off_body, jnp.int32(0),
                                   (offs, widens, disps))
    cat = lambda j: stk[j].transpose(1, 0, 2).reshape(m, -1)
    other_s, hit_s, risk_s, ttc_s, dist_s = (cat(j) for j in range(5))
    excess_s, bound_s = stk[5], stk[6]            # [n_off, m]

    # merge per pair IN SORTED-ROW SPACE (rows map 1:1 to objects, so this
    # commutes with the oid scatter the unsharded wrapper applies after)
    *merged, kth = merge_pair_risks(other_s, hit_s, risk_s, ttc_s, dist_s,
                                    merge_k, return_kth=True)
    # truncation certificate: a truncated offset's dropped hits are all
    # <= bound; strictly below the merge_k-th pool risk (exact, recomputed)
    # means they could not have displaced anything in the final merged
    # list — count only the UNCERTIFIED excess as possible coverage loss.
    # kth is -1.0 when the pool holds fewer than merge_k hits, in which
    # case any drop could have entered and is always uncertified (every
    # bound is >= -1 + margin there, since truncated slots hold real hits
    # with keys >= 0).
    uncert = (excess_s > 0) & (bound_s >= kth[None, :])
    slot_oflow = jnp.sum(jnp.where(uncert, excess_s, 0), dtype=jnp.int32)

    if det.hot_topup > 0:
        merged, slot_oflow = _predict_hot_topup(
            cl, cfg, flat, flat_t, m, offs, uncert, excess_s,
            (other_s, hit_s, risk_s, ttc_s, dist_s), merged, slot_oflow,
            w_stat0, widens.astype(jnp.int32), merge_k, sub_window)
    return tuple(merged) + (soid, own_flat, cl.overflow, slot_oflow,
                            slot_trunc)


def fused_predict(state, hist, cfg: SystemConfig,
                  horizon: float = 10.0, step: float = 0.5,
                  sub_window: float = 1.0, merge_k: int = 32,
                  k_slots: int = 8, window_rows: Optional[int] = None,
                  interpret: bool = False):
    """Trajectory prediction at fused-kernel scale (ROADMAP r2 #13) for a
    single-device fleet: classify trajectories, run the row-space core,
    scatter merged rows back to object order by oid. Same semantics and
    return tuple as detect/predict.predict_collisions plus THREE counters:

      * overflow — candidate windows too small for the density;
      * slot_oflow — UNCERTIFIED per-offset slot truncations: some object
        had more hits at one offset than k_slots AND the dropped hits'
        risk bound reaches its final merge_k-th pool risk, so the merged
        list may be missing pairs;
      * slot_trunc — RAW counted truncations (incl. the certified-harmless
        ones: drops provably below everything the merge kept).

    All counted, never silent; overflow == slot_oflow == 0 certifies the
    merged set equals the canonical path's (truncations may still be
    counted in slot_trunc — the certificate proves those could not have
    changed the output). `other` entries are OIDs (== state indices for
    arange-oid fleets)."""
    from tpu_collide.detect.predict import classify_trajectories

    n = state.n
    cls = classify_trajectories(hist)
    (other_r, valid_r, risk_r, ttc_r, dist_r, soid, own, overflow,
     slot_oflow, slot_trunc) = \
        fused_predict_rows(state, cls, cfg, horizon=horizon, step=step,
                           sub_window=sub_window, merge_k=merge_k,
                           k_slots=k_slots, window_rows=window_rows,
                           interpret=interpret)
    tgt = jnp.where(soid >= 0, soid, n)      # dead/guard rows drop
    scat = lambda a, fill: jnp.full((n + 1, a.shape[1]), fill,
                                    a.dtype).at[tgt].set(a, mode="drop")[:-1]
    return (scat(other_r, 0), scat(valid_r, False), scat(risk_r, 0.0),
            scat(ttc_r, jnp.inf), scat(dist_r, jnp.inf), overflow,
            slot_oflow, slot_trunc)

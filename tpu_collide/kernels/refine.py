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
from typing import Callable, Optional

import jax
import jax.numpy as jnp

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


def decode_key(slots: jax.Array) -> jax.Array:
    """Ranking key (2*priority + risk, or risk - 2 for sub-threshold hits)
    from a packed slot value (combined = round(key*KEY_Q)*LANE + column).
    Quantized to 1/KEY_Q."""
    return jnp.floor(slots * (1.0 / LANE)) * (1.0 / KEY_Q)


def decode_risk(slots: jax.Array) -> jax.Array:
    """risk from a packed slot value (valid only where occupied):
    qualifying keys are 2*priority + risk, sub-threshold keys are risk - 2;
    both satisfy risk = key - 2*floor(key/2). Quantized to 1/KEY_Q."""
    key = decode_key(slots)
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
    det = cfg.detect
    flat = cl.fields.reshape(NF, -1)
    nmax = flat.shape[1] - 1
    oi = jnp.clip(own_idx, 0, nmax)
    ci = jnp.clip(cand_idx, 0, nmax)

    def vec3(i, names):
        return jnp.stack([flat[_FI[n]][i] for n in names], axis=-1)

    pos_o = vec3(oi, ("x", "y", "z"))
    pos_c = vec3(ci, ("x", "y", "z"))
    vel_o = vec3(oi, ("vx", "vy", "vz"))
    vel_c = vec3(ci, ("vx", "vy", "vz"))
    acc_o = vec3(oi, ("ax", "ay", "az"))
    acc_c = vec3(ci, ("ax", "ay", "az"))
    size_o = flat[_FI["size"]][oi]
    size_c = flat[_FI["size"]][ci]
    head_o = flat[_FI["heading"]][oi]
    head_c = flat[_FI["heading"]][ci]
    type_o = flat[_FI["otype"]][oi]
    type_c = flat[_FI["otype"]][ci]
    oid_o = flat[_FI["oid"]][oi].astype(jnp.int32)
    oid_c = flat[_FI["oid"]][ci].astype(jnp.int32)
    alive_o = flat[_FI["row"]][oi] >= 0.0    # row -1 = dead/padding
    alive_c = flat[_FI["row"]][ci] >= 0.0

    # stage 1
    rel_pos = pos_c - pos_o
    cur_dist = jnp.linalg.norm(rel_pos, axis=-1)
    ok1 = (alive_o & alive_c & (oid_o != oid_c)
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


def _alert_batch(valid, soid_sel, ref: RefinedPairs, cfg,
                 decode_other) -> AlertBatch:
    other = ref.cand_oid
    if decode_other is not None:
        other = decode_other(other)
    return AlertBatch(
        vehicle_oid=jnp.where(valid, soid_sel, -1),
        other_oid=jnp.where(valid, other, -1),
        risk=jnp.where(valid, ref.risk, 0.0),
        ttc=jnp.where(valid, ref.ttc, jnp.inf),
        distance=jnp.where(valid, ref.distance, jnp.inf),
        rel_speed=jnp.where(valid, ref.rel_speed, 0.0),
        priority=jnp.where(valid, ref.priority, 0),
        col_pos=ref.col_pos,
        valid=valid,
        count=jnp.sum(valid, dtype=jnp.int32),
    )


def fused_scene_fast(cl: CellList, cfg: SystemConfig,
                     interpret: bool = False,
                     n_own_oid: Optional[int] = None,
                     decode_other: Optional[Callable] = None
                     ) -> FusedSceneResult:
    """Fast-mode fused pipeline after the cell-list build: kernel top-k ->
    scene top-A on raw packed keys -> refine selected pairs -> AlertBatch.

    Alert semantics: each object's qualifying pairs enter from its own side
    (the reference's per-vehicle alert view, warning_system.py:120-197), so
    both directions of a pair may appear. The list equals the XLA scene
    selection whenever alert_overflow == 0.

    n_own_oid (sharded): only rows with oid in [0, n_own_oid) emit alerts /
    count risks (halo mirrors carry oid + n_own_oid)."""
    keys, idx, checked, emitted, qual = fused_topk(cl, cfg, interpret,
                                                   mode="hits")
    m, k = keys.shape
    soid = cl.oid_flat
    own = soid >= 0 if n_own_oid is None else (
        (soid >= 0) & (soid < n_own_oid))

    occupied = keys > PACKED_OCC_MIN
    sel = jnp.where(own[:, None] & occupied, keys, PACKED_NONE)
    a = min(cfg.alerts.max_scene_alerts, m * k)
    top_key, top_flat = jax.lax.top_k(sel.reshape(-1), a)
    valid = top_key >= 0.0                       # qualifying keys only
    own_slot = top_flat // k
    cand_idx = idx.reshape(-1)[top_flat]
    ref = refine_pairs(cl, own_slot, cand_idx, cfg, mode="fast")
    valid &= ref.hit & (ref.risk >= cfg.alerts.risk_low)
    alerts = _alert_batch(valid, soid[own_slot], ref, cfg, decode_other)

    slot_risk = jnp.where(occupied, decode_risk(keys), 0.0)
    return FusedSceneResult(
        alerts=alerts,
        num_checked=checked,
        num_risks=jnp.sum(jnp.where(own, emitted, 0), dtype=jnp.int32),
        max_risk=jnp.max(slot_risk),
        alert_overflow=jnp.sum(
            jnp.where(own, jnp.maximum(qual - k, 0), 0), dtype=jnp.int32),
    )


def fused_scene_precise(cl: CellList, cfg: SystemConfig,
                        interpret: bool = False,
                        n_own_oid: Optional[int] = None,
                        decode_other: Optional[Callable] = None
                        ) -> FusedSceneResult:
    """Precise-mode fused pipeline: kernel emits per-object stage-2
    survivor slots; survivors compact to `precise_survivor_cap` records;
    the sampled constant-acceleration sweep + risk scoring run on the
    compacted list (exact reference stage-3 semantics at kernel scale)."""
    det = cfg.detect
    keys, idx, checked, emitted, qual = fused_topk(cl, cfg, interpret,
                                                   mode="survivors")
    m, k = keys.shape
    soid = cl.oid_flat
    own = soid >= 0 if n_own_oid is None else (
        (soid >= 0) & (soid < n_own_oid))

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
    alerts = _alert_batch(valid, soid[own_slot][sel_i], ref_a, cfg,
                          decode_other)

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

"""The sharded step: `shard_map` over a 1D spatial device mesh.

This is the TPU-native realization of the reference's entire distributed
platform (SURVEY.md §2.10/§2.11): geographic sharding (data_sharding.py),
the message broker (messaging.py), compute nodes (compute_node.py) and the
scheduler (scheduler.py) collapse into one SPMD program — each device owns a
world slab, exchanges halos/migrants with slab neighbors over ICI via
ppermute, detects locally, and contributes per-shard alert top-k. Global
stats ride a psum.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tpu_collide.core.config import SystemConfig
from tpu_collide.core.state import ObjectState
from tpu_collide.index.grid import build_grid
from tpu_collide.detect.pipeline import detect_pairs
from tpu_collide.alerts.extract import extract_alerts, AlertBatch
from tpu_collide.sim.integrator import integrate
from tpu_collide.shard.halo import (migrate, halo_exchange, extend_with_halo,
                                    slab_bounds)
from tpu_collide.engine import StepOutput


def shard_slots(cfg: SystemConfig) -> int:
    """Per-shard slot capacity: even split x headroom, padded to 8."""
    d = cfg.shard.num_shards
    base = -(-cfg.num_objects // d)
    slots = int(base * cfg.shard.slot_headroom)
    return -(-slots // 8) * 8


def make_mesh(cfg: SystemConfig, devices=None) -> Mesh:
    d = cfg.shard.num_shards
    if devices is None:
        devices = jax.devices()[:d]
    assert len(devices) == d, f"need {d} devices, have {len(devices)}"
    slab_w = (cfg.world.hi[0] - cfg.world.lo[0]) / d
    assert cfg.sim.max_speed * cfg.sim.dt < slab_w, \
        "objects could cross more than one slab per step"
    assert cfg.shard.halo_width >= cfg.detect.search_radius, \
        "halo must cover the detection search radius"
    import numpy as np
    return Mesh(np.asarray(devices), (cfg.shard.axis_name,))


def _detect_tail_xla(state: ObjectState, cfg: SystemConfig,
                     boundaries: jax.Array, s: jax.Array) -> StepOutput:
    """Halo exchange + XLA detection over owned + halo rows; alerts
    emitted only for owned rows; stats psum-reduced."""
    ax = cfg.shard.axis_name
    halo_buf, halo_valid, halo_dropped = halo_exchange(state, cfg, s,
                                                       boundaries)
    ext = extend_with_halo(state, halo_buf, halo_valid)
    index = build_grid(ext.pos, ext.alive, cfg)
    pairs = detect_pairs(ext, index, cfg)
    n_own = state.n
    own_mask = jnp.arange(ext.n) < n_own
    alerts = extract_alerts(ext, pairs, cfg, query_mask=own_mask)

    own_valid = pairs.valid & own_mask[:, None]
    # per-shard alert count becomes a [1] vector so shard_map can
    # concatenate it to a global [D] vector
    alerts = dataclasses.replace(alerts, count=alerts.count.reshape(1))
    from tpu_collide.engine import grid_overflow
    return StepOutput(
        alerts=alerts,
        num_pairs_checked=jax.lax.psum(pairs.num_checked, ax),
        num_risks=jax.lax.psum(
            jnp.sum(own_valid, dtype=jnp.int32), ax),
        max_risk=jax.lax.pmax(jnp.max(pairs.risk), ax),
        num_alive=jax.lax.psum(jnp.sum(state.alive, dtype=jnp.int32), ax),
        overflow=jax.lax.psum(
            grid_overflow(index, cfg).astype(jnp.int32), ax),
        alert_overflow=jax.lax.psum(pairs.survivor_overflow, ax),
    ), halo_dropped


def _detect_tail_fused(state: ObjectState, cfg: SystemConfig,
                       boundaries: jax.Array, s: jax.Array,
                       interpret: bool,
                       window_rows: int | None = None) -> StepOutput:
    """Halo exchange + fused-kernel detection (both modes). Halo mirrors
    carry oid + num_objects so they are distinguishable after the
    cell-list sort; only owner rows emit alerts."""
    from tpu_collide.kernels.cell_list import build_cell_list
    from tpu_collide.kernels.refine import (fused_scene_fast,
                                            fused_scene_precise)
    ax = cfg.shard.axis_name
    n_glob = cfg.num_objects
    halo_buf, halo_valid, halo_dropped = halo_exchange(state, cfg, s,
                                                       boundaries)
    ext = extend_with_halo(state, halo_buf, halo_valid,
                           halo_oid_offset=n_glob)
    cl = build_cell_list(ext, cfg, window_rows=window_rows)
    scene_fn = (fused_scene_fast if cfg.detect.mode == "fast"
                else fused_scene_precise)
    res = scene_fn(cl, cfg, interpret=interpret, n_own_oid=n_glob,
                   decode_other=lambda o: jnp.where(o >= n_glob,
                                                    o - n_glob, o))
    alerts = dataclasses.replace(res.alerts,
                                 count=res.alerts.count.reshape(1))
    return StepOutput(
        alerts=alerts,
        num_pairs_checked=jax.lax.psum(res.num_checked, ax),
        num_risks=jax.lax.psum(res.num_risks, ax),
        max_risk=jax.lax.pmax(res.max_risk, ax),
        num_alive=jax.lax.psum(jnp.sum(state.alive, dtype=jnp.int32), ax),
        overflow=jax.lax.psum(cl.overflow, ax),
        alert_overflow=jax.lax.psum(res.alert_overflow, ax),
    ), halo_dropped


def _local_step(state: ObjectState, key: jax.Array, boundaries: jax.Array,
                cfg: SystemConfig
                ) -> Tuple[ObjectState, StepOutput, jax.Array]:
    """Per-shard body. state/key are the LOCAL shard ([slots] arrays);
    boundaries is the replicated [D+1] slab-wall array (dynamic
    re-tiling, shard/balance.py)."""
    ax = cfg.shard.axis_name
    s = jax.lax.axis_index(ax)
    key = jax.random.fold_in(key, s)

    # physics on owned objects
    state = integrate(state, key, cfg)

    # migration: ownership follows position
    state, mig_dropped = migrate(state, cfg, s, boundaries)

    out, halo_dropped = _detect_tail_xla(state, cfg, boundaries, s)
    return state, out, mig_dropped.reshape(1) + halo_dropped.reshape(1)


def _local_step_fused(state: ObjectState, key: jax.Array,
                      boundaries: jax.Array, cfg: SystemConfig,
                      interpret: bool = False,
                      window_rows: int | None = None
                      ) -> Tuple[ObjectState, StepOutput, jax.Array]:
    """Per-shard body on the fused Pallas kernel (both 'fast' and 'precise'
    detection modes): integrate -> migrate -> halo -> cell-list build +
    fused broad/narrow top-k slots + XLA refine -> per-shard alert top-k.
    The other endpoint's shard emits its own direction of each
    cross-boundary pair, matching the single-device fused path."""
    ax = cfg.shard.axis_name
    s = jax.lax.axis_index(ax)
    key = jax.random.fold_in(key, s)
    state = integrate(state, key, cfg)
    state, mig_dropped = migrate(state, cfg, s, boundaries)
    out, halo_dropped = _detect_tail_fused(state, cfg, boundaries, s,
                                           interpret, window_rows)
    return state, out, mig_dropped.reshape(1) + halo_dropped.reshape(1)


def _local_step_scenario(state: ObjectState, scen, key: jax.Array,
                         boundaries: jax.Array, cfg: SystemConfig,
                         roads, cities, backend: str,
                         interpret: bool = False,
                         window_rows: int | None = None):
    """Per-shard body with device movement modes (sim/scenario.py):
    scenario physics -> migration that CARRIES the per-object scenario
    state (mode/road/target) with each migrating object -> halo ->
    detection tail on either backend."""
    from tpu_collide.sim.scenario import scenario_integrate, ScenarioState

    ax = cfg.shard.axis_name
    s = jax.lax.axis_index(ax)
    key = jax.random.fold_in(key, s)
    state, scen = scenario_integrate(state, scen, key, cfg, roads, cities)
    extra = {"mode": scen.mode, "road": scen.road,
             "target": scen.target, "target_ok": scen.target_ok}
    state, extra, mig_dropped = migrate(state, cfg, s, boundaries,
                                        extra=extra)
    scen = ScenarioState(**extra)
    if backend == "fused":
        out, halo_dropped = _detect_tail_fused(state, cfg, boundaries, s,
                                               interpret, window_rows)
    else:
        out, halo_dropped = _detect_tail_xla(state, cfg, boundaries, s)
    return state, scen, out, mig_dropped.reshape(1) + halo_dropped.reshape(1)


def equal_boundaries(cfg: SystemConfig):
    """Default [D+1] slab walls: equal x-slabs."""
    import numpy as np
    d = cfg.shard.num_shards
    return jnp.asarray(np.linspace(cfg.world.lo[0], cfg.world.hi[0], d + 1),
                       jnp.float32)


def check_boundaries(cfg: SystemConfig, boundaries) -> None:
    """Host-side validity check for dynamic slab walls: monotone, pinned to
    world bounds, and wide enough that (a) the halo band covers the search
    radius and (b) no object can cross more than one slab per step."""
    import numpy as np
    b = np.asarray(boundaries)
    assert b.shape == (cfg.shard.num_shards + 1,)
    assert abs(b[0] - cfg.world.lo[0]) < 1e-3
    assert abs(b[-1] - cfg.world.hi[0]) < 1e-3
    min_w = float(np.diff(b).min())
    need = max(cfg.shard.halo_width, cfg.sim.max_speed * cfg.sim.dt)
    assert min_w >= need, (
        f"slab width {min_w:.1f} < required {need:.1f} "
        f"(halo_width / max_speed*dt)")


def make_sharded_step(cfg: SystemConfig, mesh: Mesh, donate: bool = True,
                      backend: str = "xla", interpret: bool = False,
                      window_rows: int | None = None):
    """Compile the SPMD step. State layout: every array's leading dim is
    num_shards * shard_slots(cfg), sharded along the mesh axis; each shard
    owns the slots of its slab. backend='fused' runs the Pallas cell-list
    kernel per shard (both detection modes; interpret=True for CPU tests).

    The returned callable is step(state, key, boundaries=None): boundaries
    is an optional [D+1] slab-wall array (see shard/balance.py re-tiling);
    None uses equal slabs."""
    ax = cfg.shard.axis_name
    spec_state = ObjectState(
        pos=P(ax), vel=P(ax), acc=P(ax), heading=P(ax), size=P(ax),
        otype=P(ax), alive=P(ax), oid=P(ax))
    spec_alerts = AlertBatch(
        vehicle_oid=P(ax), other_oid=P(ax), risk=P(ax), ttc=P(ax),
        distance=P(ax), rel_speed=P(ax), priority=P(ax), col_pos=P(ax),
        valid=P(ax), count=P(ax))
    # psum/pmax-reduced scalars are replicated across the mesh -> P()
    spec_out = StepOutput(alerts=spec_alerts, num_pairs_checked=P(),
                          num_risks=P(), max_risk=P(), num_alive=P(),
                          overflow=P(), alert_overflow=P())

    if backend == "fused":
        body = partial(_local_step_fused, cfg=cfg, interpret=interpret,
                       window_rows=window_rows)
        # pallas_call outputs carry no varying-manual-axes metadata, which
        # trips shard_map's VMA checker — disable it for the kernel body
        # (the XLA body keeps the check; it caught real bugs)
        check_vma = False
    else:
        body = partial(_local_step, cfg=cfg)
        check_vma = True
    f = jax.shard_map(
        body, mesh=mesh,
        # key + boundaries replicated (key folded per shard in the body)
        in_specs=(spec_state, P(), P()),
        out_specs=(spec_state, spec_out, P(ax)),
        check_vma=check_vma,
    )
    jf = jax.jit(f, donate_argnums=(0,) if donate else ())
    default_b = equal_boundaries(cfg)

    def step(state, key, boundaries=None):
        return jf(state, key,
                  default_b if boundaries is None else boundaries)

    return step


def make_sharded_scenario_step(cfg: SystemConfig, mesh: Mesh, roads, cities,
                               donate: bool = True, backend: str = "xla",
                               interpret: bool = False,
                               window_rows: int | None = None):
    """Sharded step with device movement modes: per-object scenario state
    (mode/road/target) is sharded alongside the fleet and MIGRATES with
    objects across slab walls; road/city tables are replicated. Returned
    callable: step(state, scen, key, boundaries=None) ->
    (state, scen, StepOutput, dropped[D])."""
    from tpu_collide.sim.scenario import ScenarioState

    ax = cfg.shard.axis_name
    spec_state = ObjectState(
        pos=P(ax), vel=P(ax), acc=P(ax), heading=P(ax), size=P(ax),
        otype=P(ax), alive=P(ax), oid=P(ax))
    spec_scen = ScenarioState(mode=P(ax), road=P(ax), target=P(ax),
                              target_ok=P(ax))
    spec_alerts = AlertBatch(
        vehicle_oid=P(ax), other_oid=P(ax), risk=P(ax), ttc=P(ax),
        distance=P(ax), rel_speed=P(ax), priority=P(ax), col_pos=P(ax),
        valid=P(ax), count=P(ax))
    spec_out = StepOutput(alerts=spec_alerts, num_pairs_checked=P(),
                          num_risks=P(), max_risk=P(), num_alive=P(),
                          overflow=P(), alert_overflow=P())
    spec_tables = jax.tree.map(lambda _: P(), (roads, cities))

    body = partial(_local_step_scenario, cfg=cfg, backend=backend,
                   interpret=interpret, window_rows=window_rows)

    def wrapped(state, scen, key, boundaries, roads_, cities_):
        return body(state, scen, key, boundaries, roads=roads_,
                    cities=cities_)

    f = jax.shard_map(
        wrapped, mesh=mesh,
        in_specs=(spec_state, spec_scen, P(), P()) + spec_tables,
        out_specs=(spec_state, spec_scen, spec_out, P(ax)),
        # fused pallas outputs carry no VMA metadata (see make_sharded_step)
        check_vma=(backend != "fused"),
    )
    jf = jax.jit(f, donate_argnums=(0, 1) if donate else ())
    default_b = equal_boundaries(cfg)

    def step(state, scen, key, boundaries=None):
        return jf(state, scen, key,
                  default_b if boundaries is None else boundaries,
                  roads, cities)

    return step


def _local_apply_updates(state: ObjectState, upd: dict,
                         boundaries: jax.Array, cfg: SystemConfig):
    """Per-shard body for sharded ingest: apply a replicated batch of
    location updates (SORTED by oid, -1-padded) to whichever shard owns
    each update's position. Existing copies update in place; copies now
    owned by a different shard are killed there; new/migrated objects
    insert into free slots. Returns (state, dropped)."""
    ax = cfg.shard.axis_name
    s = jax.lax.axis_index(ax)
    d = cfg.shard.num_shards
    b_oid = upd["oid"]                               # [B] i32 sorted, -1 pad
    bsz = b_oid.shape[0]
    owner = jnp.clip(
        jnp.searchsorted(boundaries, upd["pos"][:, 0], side="right") - 1,
        0, d - 1)
    valid_upd = b_oid >= 0
    mine = valid_upd & (owner == s)

    # match local slots against the batch (batch is oid-sorted)
    pos_in_b = jnp.clip(jnp.searchsorted(b_oid, state.oid), 0, bsz - 1)
    found = state.alive & (b_oid[pos_in_b] == state.oid)

    # 1) in-place update of slots whose oid is in the batch and stays mine
    upd_here = found & (owner[pos_in_b] == s)
    fields = ("pos", "vel", "acc", "heading", "size", "otype")
    new_fields = {}
    for f in fields:
        cur = getattr(state, f)
        new = upd[f][pos_in_b]
        m = upd_here.reshape((-1,) + (1,) * (cur.ndim - 1))
        new_fields[f] = jnp.where(m, new, cur)
    # 2) kill copies that moved to another shard via this ingest
    alive = state.alive & ~(found & (owner[pos_in_b] != s))
    state = state.replace(alive=alive, **new_fields)

    # 3) insert entries owned here but not present in any local slot
    present = jnp.zeros(bsz, bool).at[
        jnp.where(found, pos_in_b, bsz)].set(True, mode="drop")
    ins = mine & ~present
    rank = jnp.cumsum(ins.astype(jnp.int32)) - 1
    free = jnp.argsort(state.alive)[:bsz]            # dead slots first
    n_free = jnp.sum(~state.alive, dtype=jnp.int32)
    can = ins & (rank < n_free) & (rank < bsz)
    slot = free[jnp.clip(rank, 0, bsz - 1)]
    tgt = jnp.where(can, slot, state.n)              # n = dropped sentinel
    ins_fields = {}
    for f in fields:
        cur = getattr(state, f)
        ins_fields[f] = cur.at[tgt].set(upd[f], mode="drop")
    oid_new = state.oid.at[tgt].set(b_oid, mode="drop")
    alive_new = state.alive.at[tgt].set(True, mode="drop")
    state = state.replace(oid=oid_new, alive=alive_new, **ins_fields)
    dropped = jnp.sum(ins & ~can, dtype=jnp.int32)
    return state, dropped.reshape(1)


def make_sharded_ingest(cfg: SystemConfig, mesh: Mesh):
    """Compile the sharded per-vehicle ingest: apply(state, upd,
    boundaries=None) -> (state, dropped [D]). `upd` is a dict of
    oid-SORTED, -1-padded host arrays (oid [B] i32, pos [B,3], vel, acc,
    heading, size, otype). The reference's POST /vehicles/location path
    for mesh fleets — the broker hop becomes one replicated batch + a
    per-shard scatter."""
    ax = cfg.shard.axis_name
    spec_state = ObjectState(
        pos=P(ax), vel=P(ax), acc=P(ax), heading=P(ax), size=P(ax),
        otype=P(ax), alive=P(ax), oid=P(ax))
    spec_upd = {f: P() for f in ("oid", "pos", "vel", "acc", "heading",
                                 "size", "otype")}
    f = jax.shard_map(
        partial(_local_apply_updates, cfg=cfg), mesh=mesh,
        in_specs=(spec_state, spec_upd, P()),
        out_specs=(spec_state, P(ax)),
        check_vma=True,
    )
    jf = jax.jit(f, donate_argnums=(0,))
    default_b = equal_boundaries(cfg)

    def apply(state, upd, boundaries=None):
        return jf(state, upd,
                  default_b if boundaries is None else boundaries)

    return apply


def distribute_state(state_global: ObjectState, cfg: SystemConfig,
                     mesh: Mesh, boundaries=None, extra=None):
    """Host-side: scatter a globally-generated fleet into per-shard slots by
    slab (equal slabs, or the given [D+1] dynamic walls). Returns the
    mesh-sharded state ([D * slots] leading dim) — plus the identically
    distributed `extra` dict (e.g. scenario arrays) when given.

    (This is ingest/bootstrap, not the hot path — plain numpy.)"""
    import numpy as np
    d = cfg.shard.num_shards
    slots = shard_slots(cfg)

    pos = np.asarray(state_global.pos)
    alive = np.asarray(state_global.alive)
    if boundaries is None:
        lo = cfg.world.lo[0]
        w = (cfg.world.hi[0] - cfg.world.lo[0]) / d
        shard_of = np.clip(((pos[:, 0] - lo) // w).astype(int), 0, d - 1)
    else:
        b = np.asarray(boundaries)
        shard_of = np.clip(np.searchsorted(b, pos[:, 0], side="right") - 1,
                           0, d - 1)

    fields = {f: np.asarray(getattr(state_global, f))
              for f in ("pos", "vel", "acc", "heading", "size", "otype",
                        "alive", "oid")}
    xfields = {("x:" + f): np.asarray(v) for f, v in (extra or {}).items()}
    out = {f: np.zeros((d * slots,) + v.shape[1:], v.dtype)
           for f, v in {**fields, **xfields}.items()}
    out["oid"][:] = -1
    for sh in range(d):
        idx = np.flatnonzero((shard_of == sh) & alive)
        if len(idx) > slots:
            raise ValueError(
                f"shard {sh} overflow: {len(idx)} objects > {slots} slots; "
                f"raise ShardConfig.slot_headroom")
        dst = sh * slots + np.arange(len(idx))
        for f in fields:
            out[f][dst] = fields[f][idx]
        for f, v in xfields.items():
            out[f][dst] = v[idx]
        out["alive"][sh * slots:(sh + 1) * slots][len(idx):] = False

    from jax.sharding import NamedSharding
    sharding = NamedSharding(mesh, P(cfg.shard.axis_name))
    put = lambda v: jax.device_put(jnp.asarray(v), sharding)
    arrs = {f: put(v) for f, v in out.items() if not f.startswith("x:")}
    arrs["alive"] = arrs["alive"].astype(bool)
    state = ObjectState(**arrs)
    if extra is None:
        return state
    return state, {f: put(out["x:" + f]) for f in extra}


def collect_state(state_sharded: ObjectState) -> ObjectState:
    """Host-side: gather the sharded state to one addressable array set."""
    return jax.tree.map(lambda x: jnp.asarray(jax.device_get(x)),
                        state_sharded)

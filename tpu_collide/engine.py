"""The engine: one jitted step = the whole reference hot path.

What the reference spreads over broker dispatch + compute-node sweeps +
detector + warning system (SURVEY.md §3.3/§3.5: EarlyWarningSystem 2 Hz loop
-> per-vehicle 4-stage detection -> AlertManager heapq) collapses here into a
single XLA program:

    integrate -> build grid (sort) -> broad phase (stencil gather)
              -> narrow phase (4-stage) -> alert top-k

No host round-trips inside the step; state stays in HBM between steps.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from tpu_collide.core.config import SystemConfig
from tpu_collide.core.state import ObjectState
from tpu_collide.index.grid import build_grid
from tpu_collide.detect.pipeline import detect_pairs, PairRisks
from tpu_collide.alerts.extract import extract_alerts, AlertBatch
from tpu_collide.sim.integrator import integrate


@partial(jax.tree_util.register_dataclass,
         data_fields=["alerts", "num_pairs_checked", "num_risks",
                      "max_risk", "num_alive"],
         meta_fields=[])
@dataclasses.dataclass(frozen=True)
class StepOutput:
    alerts: AlertBatch
    num_pairs_checked: jax.Array   # [] int32 — candidate pairs examined
    num_risks: jax.Array           # [] int32 — stage-4 risks produced
    max_risk: jax.Array            # [] f32
    num_alive: jax.Array           # [] int32


def detect_only(state: ObjectState, cfg: SystemConfig) -> PairRisks:
    """Index build + 4-stage detection, no physics. The `detect_collisions`
    analog (collision_detection.py:110-193) for an externally-updated fleet."""
    index = build_grid(state.pos, state.alive, cfg)
    return detect_pairs(state, index, cfg)


def step(state: ObjectState, key: jax.Array,
         cfg: SystemConfig) -> tuple[ObjectState, StepOutput]:
    """One full scene step (the benchmark 'request' unit,
    optimized_performance_test.py:850-981): physics + full index rebuild +
    detection + prediction + alert extraction."""
    state = integrate(state, key, cfg)
    index = build_grid(state.pos, state.alive, cfg)
    pairs = detect_pairs(state, index, cfg)
    alerts = extract_alerts(state, pairs, cfg)
    out = StepOutput(
        alerts=alerts,
        num_pairs_checked=jnp.sum(
            (pairs.other >= 0) & (pairs.risk >= -1), dtype=jnp.int32),
        num_risks=jnp.sum(pairs.valid, dtype=jnp.int32),
        max_risk=jnp.max(pairs.risk),
        num_alive=jnp.sum(state.alive, dtype=jnp.int32),
    )
    return state, out


def make_step(cfg: SystemConfig, donate: bool = True):
    """Compile `step` with the config baked in (static). Donates the input
    state so HBM is reused in place."""
    fn = partial(step, cfg=cfg)
    return jax.jit(fn, donate_argnums=(0,) if donate else ())


def make_detect(cfg: SystemConfig):
    return jax.jit(partial(detect_only, cfg=cfg))

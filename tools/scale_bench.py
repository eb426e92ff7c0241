"""Flagship-scale TPU drives beyond bench.py --full: 10M fast/precise and
the sharded 1M step on the 1-device mesh (VERDICT r4 Next #1's "manual
drives"). ONE TPU client at a time on this box — run only after bench.py
finishes (CLAUDE.md tunnel rule).

Methodology = bench.bench_fused_scan: device-rate scan chunks, one scalar
fetch per chunk, every StepOutput field consumed (bench._consume), worst
per-step window overflow and alert-slot overflow folded separately across
the run; adopt_k re-runs once at the fleet-exact slot count, probe_cap
pre-sizes the precise survivor cap. Prints one JSON line per config.

Configs mirror BENCH_NOTES "BASELINE config 5": 20x20x1 km world, 50 m
cells (10M), and the 1M-3D bench world on a num_shards=1 mesh for the
sharded-overhead row.

Usage: python tools/scale_bench.py [--which 10m,10mp,1ms] [--steps N]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_collide.core.utils import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np


def cfg_10m(mode="fast"):
    import tpu_collide as tc
    from tpu_collide.core.config import (WorldConfig, GridConfig,
                                         DetectionConfig, AlertConfig)
    return tc.SystemConfig(
        num_objects=10_000_000,
        world=WorldConfig(hi=(20000., 20000., 1000.)),
        grid=GridConfig(cell_size=50.0),
        detect=DetectionConfig(mode=mode, search_radius=50.0,
                               count_checked=False, gate_stage1=True),
        alerts=AlertConfig(max_scene_alerts=4096,
                           max_alerts_per_object=8))


def cfg_1m():
    import tpu_collide as tc
    from tpu_collide.core.config import (WorldConfig, GridConfig,
                                         DetectionConfig, AlertConfig)
    return tc.SystemConfig(
        num_objects=1_000_000,
        world=WorldConfig(hi=(10000., 10000., 500.)),
        grid=GridConfig(cell_size=50.0),
        detect=DetectionConfig(mode="fast", search_radius=50.0,
                               count_checked=False, gate_stage1=True),
        alerts=AlertConfig(max_scene_alerts=4096))


def run_fused(tag, cfg, steps, chunk, probe_cap=False):
    from bench import bench_fused_scan
    a, best, out, wof, wao, cfg_used = bench_fused_scan(
        cfg, steps=steps, chunk=chunk, probe_cap=probe_cap)
    row = {"config": tag, "avg_ms": round(a, 1), "best_ms": round(best, 1),
           "overflow": wof, "aoflow": wao,
           "risks_last": int(np.asarray(out.num_risks)),
           "k": (cfg_used.detect.survivor_k
                 if cfg.detect.mode == "precise"
                 else cfg_used.alerts.max_alerts_per_object)}
    if cfg.detect.mode == "precise":
        row["cap"] = cfg_used.survivor_cap
    print(json.dumps(row), flush=True)
    return row


def run_sharded_1m(steps=12, chunk=4):
    """Sharded fused 1M on the num_shards=1 mesh: measures the shard_map +
    halo/migration wrapper overhead over the unsharded step (BENCH_NOTES
    r3: 250.3 vs 210.1 ms). Every per-step output consumed."""
    import tpu_collide as tc
    from tpu_collide.core.config import ShardConfig
    from tpu_collide.sim import generate_fleet
    from tpu_collide.shard import (make_mesh, make_sharded_step,
                                   distribute_state)
    from bench import _consume

    cfg = cfg_1m().replace(shard=ShardConfig(num_shards=1,
                                             halo_capacity=256,
                                             migrate_capacity=64))
    mesh = make_mesh(cfg)
    fleet = generate_fleet(jax.random.key(0), cfg, distribution="uniform")
    st = distribute_state(fleet, cfg, mesh)
    stepf = make_sharded_step(cfg, mesh, donate=False, backend="fused")

    def chunk_fn(state, key):
        keys = jax.random.split(key, chunk)

        def body(s, k):
            s, out, dropped = stepf(s, k)
            return s, (_consume(out) + jnp.sum(dropped),
                       out.overflow, out.alert_overflow)

        state, (cks, ofs, aos) = jax.lax.scan(body, state, keys)
        return state, jnp.stack([jnp.sum(cks),
                                 jnp.max(ofs).astype(jnp.float32),
                                 jnp.max(aos).astype(jnp.float32)])

    run = jax.jit(chunk_fn)
    st2, probe = run(st, jax.random.key(1))
    np.asarray(probe)
    lat, wof, wao = [], 0, 0
    for i in range(max(1, steps // chunk)):
        t0 = time.perf_counter()
        st2, probe = run(st2, jax.random.key(2 + i))
        v = np.asarray(probe)
        lat.append((time.perf_counter() - t0) / chunk * 1e3)
        wof = max(wof, int(v[1]))
        wao = max(wao, int(v[2]))
    row = {"config": "1m_sharded_fused_1dev",
           "avg_ms": round(sum(lat) / len(lat), 1),
           "best_ms": round(min(lat), 1), "overflow": wof, "aoflow": wao}
    print(json.dumps(row), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="10m,10mp,1ms")
    ap.add_argument("--steps", type=int, default=9)
    args = ap.parse_args()
    which = set(args.which.split(","))
    rows = []
    if "10m" in which:
        rows.append(run_fused("10m_3d_fast", cfg_10m("fast"),
                              steps=args.steps, chunk=3))
    if "10mp" in which:
        rows.append(run_fused("10m_3d_precise", cfg_10m("precise"),
                              steps=6, chunk=2, probe_cap=True))
    if "1ms" in which:
        rows.append(run_sharded_1m())
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "scale_bench_r5.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"# wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()

"""Mine a real jax.profiler trace of the fused step (ROADMAP #7 / VERDICT
r4 Next #9): per-op DEVICE durations to cross-check the TPU_COLLIDE_ABLATE
anatomy (BENCH_NOTES "Kernel ablation anatomy").

The axon tunnel DOES forward device planes (probed 2026-08-20: the trace's
/device:TPU:0 track carries XLA-op events with device_duration_ps), so this
captures real per-op device time, not host shadows. ONE TPU client at a
time on this box (CLAUDE.md tunnel rule).

Method: jit the same scan-chunk program bench._fused_scan_once times
(`chunk` steps per dispatch, every StepOutput field consumed), warm it,
then trace ONE dispatch and aggregate the TPU track's complete events by
op name. Per-step ms = track total / chunk. Pallas kernel time shows up as
the fused_topk custom call; everything else is the XLA build/refine/alert
tail. Writes results/profile_<tag>.json and prints a table + one JSON line.

Usage: python tools/profile_step.py [--config 1m|100k] [--chunk 5]
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
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


def build_cfg(which: str):
    import tpu_collide as tc
    from tpu_collide.core.config import (WorldConfig, GridConfig,
                                         DetectionConfig, AlertConfig)
    if which == "1m":
        return tc.SystemConfig(          # bench.py --full 1M-3D config
            num_objects=1_000_000,
            world=WorldConfig(hi=(10000., 10000., 500.)),
            grid=GridConfig(cell_size=50.0),
            detect=DetectionConfig(mode="fast", search_radius=50.0,
                                   count_checked=False, gate_stage1=True),
            alerts=AlertConfig(max_scene_alerts=4096,
                               max_alerts_per_object=4))
    if which == "100k":
        return tc.SystemConfig(          # bench.py --full 100k-2D config
            num_objects=100_000,
            world=WorldConfig(hi=(10000., 10000., 0.)),
            grid=GridConfig(cell_size=100.0),
            detect=DetectionConfig(mode="fast", search_radius=100.0,
                                   count_checked=False),
            alerts=AlertConfig(max_scene_alerts=4096,
                               max_alerts_per_object=8))
    raise SystemExit(f"unknown config {which!r}")


def trace_once(cfg, chunk: int, trace_dir: str):
    from bench import _consume
    from tpu_collide.engine import step_fused
    from tpu_collide.sim import generate_fleet

    state = generate_fleet(jax.random.key(0), cfg, distribution="uniform")

    def chunk_fn(state, key):
        keys = jax.random.split(key, chunk)

        def body(st, k):
            st, out = step_fused(st, k, cfg)
            return st, (_consume(out), out.overflow, out.alert_overflow)

        state, (cks, ofs, aos) = jax.lax.scan(body, state, keys)
        return state, jnp.stack([jnp.sum(cks),
                                 jnp.max(ofs).astype(jnp.float32),
                                 jnp.max(aos).astype(jnp.float32)])

    run = jax.jit(chunk_fn, donate_argnums=(0,))
    t0 = time.time()
    state, probe = run(state, jax.random.key(1))
    np.asarray(probe)
    print(f"# compile+first dispatch {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    state, probe = run(state, jax.random.key(2))
    np.asarray(probe)
    steady = (time.time() - t0) / chunk * 1e3
    print(f"# steady dispatch {steady:.1f} ms/step", flush=True)
    with jax.profiler.trace(trace_dir):
        state, probe = run(state, jax.random.key(3))
        v = np.asarray(probe)
    assert int(v[1]) == 0, f"window overflow {int(v[1])} in traced chunk"
    return steady, int(v[1]), int(v[2])


def mine(trace_dir: str, chunk: int):
    """Aggregate the TPU track by EXCLUSIVE duration (an event's time
    minus its nested children — jit_*/while/conditional wrappers span
    their whole bodies, so inclusive sums double-count ~3x)."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    assert paths, f"no trace json under {trace_dir}"
    with gzip.open(paths[-1]) as f:
        t = json.load(f)
    ev = t["traceEvents"]
    pids = {e["pid"]: e["args"]["name"] for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tpu_pids = {p for p, n in pids.items() if "TPU" in n}
    rows = [e for e in ev
            if e.get("ph") == "X" and e.get("pid") in tpu_pids]
    # nesting per (pid, tid) via a start-sorted stack
    durs = collections.Counter()          # exclusive us by op name
    srcs = collections.Counter()          # exclusive us by source file
    bytes_by = collections.Counter()
    spans = []
    by_track = collections.defaultdict(list)
    for e in rows:
        by_track[(e["pid"], e.get("tid", 0))].append(e)
        spans.append((e["ts"], e["ts"] + e.get("dur", 0)))
    for track in by_track.values():
        track.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack = []
        for e in track:
            s, d = e["ts"], e.get("dur", 0)
            while stack and s >= stack[-1][1]:
                stack.pop()
            excl = d
            # subtract children later: do a second pass instead
            e["_excl"] = d
            if stack:
                stack[-1][2]["_excl"] -= d
            stack.append((s, s + d, e))
        for e in track:
            excl = max(0, e["_excl"])
            durs[e["name"]] += excl
            a = e.get("args", {})
            src = a.get("source", "")
            key = src.split("/")[-1] if src else e["name"].split(".")[0]
            srcs[key] += excl
            bytes_by[key] += int(a.get("bytes_accessed", 0) or 0)
    spans.sort()
    busy, cur_s, cur_e = 0.0, None, None
    for s, e in spans:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                busy += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        busy += cur_e - cur_s
    span = spans[-1][1] - spans[0][0] if spans else 0.0
    return durs, srcs, busy, span


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="1m", choices=["1m", "100k"])
    ap.add_argument("--chunk", type=int, default=5)
    ap.add_argument("--trace-dir", default="/tmp/tpu_collide_trace")
    args = ap.parse_args()

    cfg = build_cfg(args.config)
    tdir = f"{args.trace_dir}_{args.config}"
    steady, wof, wao = trace_once(cfg, args.chunk, tdir)
    durs, srcs, busy_us, span_us = mine(tdir, args.chunk)

    total_us = sum(durs.values())
    rows = sorted(durs.items(), key=lambda kv: -kv[1])[:20]
    print(f"\n# device-track EXCLUSIVE totals for ONE {args.chunk}-step "
          f"dispatch ({args.config}):")
    print(f"# sum-of-ops {total_us/1e3:.1f} ms, busy(merged) "
          f"{busy_us/1e3:.1f} ms, span {span_us/1e3:.1f} ms, "
          f"per-step busy {busy_us/1e3/args.chunk:.1f} ms "
          f"(steady host view {steady:.1f} ms)")
    for name, us in rows:
        print(f"{us/1e3/args.chunk:9.3f} ms/step  {name[:90]}")
    per_step = {}
    print("\n# by source (exclusive):")
    for g, us in srcs.most_common(15):
        print(f"{us/1e3/args.chunk:9.3f} ms/step  {g}")
        per_step[g] = round(us / 1e3 / args.chunk, 3)

    out = {
        "config": args.config, "chunk": args.chunk,
        "steady_host_ms_per_step": round(steady, 2),
        "device_busy_ms_per_step": round(busy_us / 1e3 / args.chunk, 2),
        "device_span_ms": round(span_us / 1e3, 2),
        "overflow": wof, "aoflow": wao,
        "by_source_ms_per_step": per_step,
        "top_ops_ms_per_step": {n[:120]: round(u / 1e3 / args.chunk, 3)
                                for n, u in rows},
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results",
        f"profile_{args.config}_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\n{json.dumps({'profile': out['by_source_ms_per_step'], 'per_step_busy_ms': out['device_busy_ms_per_step'], 'config': args.config})}")
    print(f"# wrote {path}")


if __name__ == "__main__":
    main()

"""1M-3D fast small-k operating-point probe (hot top-up makes k a pure
operating point: alert_overflow == 0 certifies completeness at ANY k).

Measured ladder so far (BENCH_NOTES "r5 campaign" #3-4): k=7 adopt 254.4
-> k=4+H=32 227.6 -> k=4+H=8 213.7 -> +two-stage top-A 205.4 certified;
k=2+H=128 is a LOSS (237.4, thousands of rows hot). The untried midpoint
is k=3 (emit extraction rounds and slot-insert compares drop 4 -> 3 on
the densest blocks; hot-row population sits between the k=4 handful and
the k=2 thousands — H raised to absorb it). ONE TPU client at a time
(CLAUDE.md).

Usage: python tools/probe_k2_1m.py [--k 3] [--hot 32] [--steps 30]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_collide.core.utils import enable_compile_cache

enable_compile_cache()

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=2)
    ap.add_argument("--hot", type=int, default=64)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--chunk", type=int, default=15)
    args = ap.parse_args()

    import tpu_collide as tc
    from tpu_collide.core.config import (WorldConfig, GridConfig,
                                         DetectionConfig, AlertConfig)
    from bench import bench_fused_scan

    cfg = tc.SystemConfig(          # bench.py --full 1M-3D config, small k
        num_objects=1_000_000,
        world=WorldConfig(hi=(10000., 10000., 500.)),
        grid=GridConfig(cell_size=50.0),
        detect=DetectionConfig(mode="fast", search_radius=50.0,
                               count_checked=False, gate_stage1=True,
                               hot_topup=args.hot),
        alerts=AlertConfig(max_scene_alerts=4096,
                           max_alerts_per_object=args.k))
    a, best, out, wof, wao, cfg_used = bench_fused_scan(
        cfg, steps=args.steps, chunk=args.chunk, adopt_k=False)
    row = {"config": f"1m_fast_k{args.k}_hot{args.hot}",
           "avg_ms": round(a, 2), "best_ms": round(best, 2),
           "overflow": wof, "aoflow": wao,
           "risks_last": int(np.asarray(out.num_risks)),
           "certified": (wof == 0 and wao == 0)}
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()

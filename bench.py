"""Benchmark: full-scene steps/s on the reference's headline config.

Reference baseline (BASELINE.md): the optimized CPU harness at 1000 vehicles
achieved 9.44 full-scene steps/s (avg 99.32 ms, p99 314.57 ms); each step =
physics update + full index rebuild + collision detection + TTC prediction
for the whole fleet (optimized_performance_test.py:850-981). This bench runs
the identical workload shape as one jitted step and reports steps/s with
vs_baseline = ours / 9.44.

Prints ONE JSON line.
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

BASELINE_STEPS_PER_S = 9.44          # results/optimized_perf_test_1000vehicles…
BASELINE_AVG_MS = 99.32
BASELINE_P99_MS = 314.57


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--objects", type=int, default=1000)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--chunk", type=int, default=50)
    ap.add_argument("--mode", default="precise", choices=["precise", "fast"])
    args = ap.parse_args()

    import tpu_collide as tc
    from tpu_collide.core.config import DetectionConfig
    from tpu_collide.sim import generate_fleet
    from tpu_collide.engine import step

    cfg = tc.SystemConfig(
        num_objects=args.objects,
        detect=DetectionConfig(mode=args.mode),
    )

    state = generate_fleet(jax.random.key(0), cfg)

    def chunk_fn(state, key):
        keys = jax.random.split(key, args.chunk)

        def body(st, k):
            st, out = step(st, k, cfg)
            return st, (out.num_risks, out.alerts.count)

        return jax.lax.scan(body, state, keys)

    run = jax.jit(chunk_fn, donate_argnums=(0,))

    # warmup/compile
    state, _ = jax.block_until_ready(run(state, jax.random.key(1)))

    n_chunks = max(1, args.steps // args.chunk)
    chunk_ms = []
    total_risks = 0
    for i in range(n_chunks):
        t0 = time.perf_counter()
        state, (risks, counts) = jax.block_until_ready(
            run(state, jax.random.key(2 + i)))
        chunk_ms.append((time.perf_counter() - t0) * 1e3)
        total_risks += int(jnp.sum(risks))

    steps_done = n_chunks * args.chunk
    total_ms = sum(chunk_ms)
    steps_per_s = steps_done / (total_ms / 1e3)
    avg_step_ms = total_ms / steps_done
    worst_chunk_step_ms = max(chunk_ms) / args.chunk

    print(json.dumps({
        "metric": f"full-scene steps/s ({args.objects} vehicles, "
                  f"{args.mode} 4-stage detection, TPU)",
        "value": round(steps_per_s, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / BASELINE_STEPS_PER_S, 2),
        "avg_step_ms": round(avg_step_ms, 4),
        "worst_chunk_step_ms": round(worst_chunk_step_ms, 4),
        "baseline_steps_per_s": BASELINE_STEPS_PER_S,
        "baseline_avg_ms": BASELINE_AVG_MS,
        "steps": steps_done,
        "total_risks": total_risks,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()

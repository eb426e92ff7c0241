"""End-to-end load generator + failure injector + performance analyzer.

The reference's load-testing toolkit (load_generator.py:39-865, SURVEY.md
§2.12): open-loop request generation against the REST surface with ramp-up,
latency/throughput/error capture and CSV artifacts, cross-run comparison,
and a FailureInjector client for the fault-injection endpoint (which the
reference never implemented server-side; ours exists —
api/stdlib_server.py /api/admin/inject-failure).

Targets: 'http' (any tpu-collide REST server) or 'scene' (in-process Scene,
no network) — the kafka/redis sinks of the reference were test-harness-only
clients of services the repo never provisioned (SURVEY.md §2.11).
"""
from __future__ import annotations

import dataclasses
import json
import math
import os
import random
import statistics
import time
import urllib.request
import urllib.error
from datetime import datetime
from typing import Any, Dict, List, Optional

from tpu_collide.core.utils import get_logger

logger = get_logger(__name__)


@dataclasses.dataclass
class LoadTestResult:
    target_tps: float
    duration_s: float
    requests: int
    errors: int
    latencies_ms: List[float]

    @property
    def throughput(self) -> float:
        return self.requests / max(self.duration_s, 1e-9)

    @property
    def error_rate(self) -> float:
        return self.errors / self.requests * 100 if self.requests else 0.0

    def percentile(self, p: float) -> float:
        if not self.latencies_ms:
            return 0.0
        s = sorted(self.latencies_ms)
        return s[min(len(s) - 1, int(p * len(s)))]

    def summary(self) -> Dict[str, Any]:
        lat = self.latencies_ms
        return {
            "target_tps": self.target_tps,
            "duration_s": round(self.duration_s, 2),
            "requests": self.requests,
            "errors": self.errors,
            "error_rate_pct": round(self.error_rate, 2),
            "throughput_rps": round(self.throughput, 2),
            "avg_ms": round(statistics.fmean(lat), 2) if lat else 0.0,
            "p95_ms": round(self.percentile(0.95), 2),
            "p99_ms": round(self.percentile(0.99), 2),
            "max_ms": round(max(lat), 2) if lat else 0.0,
        }


class LoadGenerator:
    """Open-loop location-update load with linear ramp-up (reference
    load_generator.py:119-344)."""

    def __init__(self, target: str = "http://127.0.0.1:8000",
                 scene=None, seed: int = 0,
                 map_size=(10_000.0, 10_000.0)):
        self.target = target
        self.scene = scene                 # in-process mode when set
        self.rng = random.Random(seed)
        self.map_size = map_size

    def _payload(self, i: int) -> Dict[str, Any]:
        speed = self.rng.uniform(5, 20)
        heading = self.rng.uniform(0, 2 * math.pi)
        return {
            "vehicle_id": f"load-veh-{i}",
            "position": {"x": self.rng.uniform(0, self.map_size[0]),
                         "y": self.rng.uniform(0, self.map_size[1]), "z": 0},
            "velocity": {"x": speed * math.cos(heading),
                         "y": speed * math.sin(heading), "z": 0},
            "heading": heading,
        }

    def _send(self, payload: Dict[str, Any]) -> bool:
        if self.scene is not None:
            from tpu_collide.core.types import LocationData, Position, Vector
            self.scene.ingest(LocationData(
                vehicle_id=payload["vehicle_id"],
                position=Position(**payload["position"]),
                velocity=Vector(**payload["velocity"]),
                heading=payload["heading"]))
            return True
        req = urllib.request.Request(
            self.target + "/vehicles/location",
            data=json.dumps(payload).encode(), method="POST",
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=5) as r:
                return r.status == 200
        except (urllib.error.URLError, OSError):
            return False

    def run_load_test(self, target_tps: float, duration: float,
                      ramp_up: float = 0.0,
                      num_vehicles: int = 1000) -> LoadTestResult:
        """reference load_generator.py:119-233: linear ramp to target_tps."""
        res = LoadTestResult(target_tps, 0.0, 0, 0, [])
        start = time.perf_counter()
        i = 0
        while True:
            now = time.perf_counter() - start
            if now >= duration:
                break
            # floor the ramped rate at 1 rps — near t=0 the ramp would give
            # tps ~ 0 and 1/tps a multi-hour sleep
            tps = (max(1.0, target_tps * min(1.0, now / ramp_up))
                   if ramp_up > 0 else target_tps)
            t0 = time.perf_counter()
            ok = self._send(self._payload(i % num_vehicles))
            res.latencies_ms.append((time.perf_counter() - t0) * 1e3)
            res.requests += 1
            res.errors += 0 if ok else 1
            i += 1
            if tps > 0:
                sleep = (1.0 / tps) - (time.perf_counter() - t0)
                if sleep > 0:
                    time.sleep(min(sleep, 1.0))
        res.duration_s = time.perf_counter() - start
        return res

    def save_results(self, result: LoadTestResult,
                     output_dir: str = "results") -> str:
        """CSV artifacts (reference :346-410)."""
        os.makedirs(output_dir, exist_ok=True)
        stamp = datetime.now().strftime("%Y%m%d_%H%M%S")
        base = os.path.join(output_dir, f"load_test_{stamp}")
        with open(base + "_latencies.csv", "w") as f:
            f.write("latency_ms\n")
            for v in result.latencies_ms:
                f.write(f"{v}\n")
        with open(base + "_summary.json", "w") as f:
            json.dump(result.summary(), f, indent=2)
        return base


class FailureInjector:
    """Fault-injection client (reference load_generator.py:748-865). The
    reference POSTed to /api/admin/inject-failure which its server never
    implemented; ours does."""

    def __init__(self, target: str = "http://127.0.0.1:8000"):
        self.target = target

    def _post(self, body: Dict[str, Any]) -> Dict[str, Any]:
        req = urllib.request.Request(
            self.target + "/api/admin/inject-failure",
            data=json.dumps(body).encode(), method="POST",
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=5) as r:
            return json.loads(r.read())

    def inject_object_loss(self, fraction: float = 0.1) -> Dict[str, Any]:
        return self._post({"type": "drop_objects", "fraction": fraction})

    def reset(self) -> Dict[str, Any]:
        return self._post({"type": "reset"})


class PerformanceAnalyzer:
    """Cross-run comparison report (reference load_generator.py:506-745)."""

    @staticmethod
    def load_latencies(path: str) -> List[float]:
        with open(path) as f:
            next(f)                       # header
            return [float(line) for line in f if line.strip()]

    @staticmethod
    def compare(runs: Dict[str, List[float]]) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, lat in runs.items():
            s = sorted(lat)
            out[name] = {
                "count": len(s),
                "avg_ms": round(statistics.fmean(s), 3) if s else 0.0,
                "p50_ms": round(s[len(s) // 2], 3) if s else 0.0,
                "p95_ms": round(s[min(len(s) - 1, int(0.95 * len(s)))], 3)
                if s else 0.0,
                "p99_ms": round(s[min(len(s) - 1, int(0.99 * len(s)))], 3)
                if s else 0.0,
                "max_ms": round(s[-1], 3) if s else 0.0,
            }
        return out

    @staticmethod
    def report(runs: Dict[str, List[float]], path: Optional[str] = None) -> str:
        cmp_ = PerformanceAnalyzer.compare(runs)
        lines = ["run,count,avg_ms,p50_ms,p95_ms,p99_ms,max_ms"]
        for name, m in cmp_.items():
            lines.append(f"{name},{m['count']},{m['avg_ms']},{m['p50_ms']},"
                         f"{m['p95_ms']},{m['p99_ms']},{m['max_ms']}")
        text = "\n".join(lines)
        if path:
            with open(path, "w") as f:
                f.write(text + "\n")
        return text

"""Dependency-free HTTP server for the REST surface.

Serves the same routes as api/rest.py using only the standard library, for
environments without fastapi/uvicorn (this framework must run anywhere JAX
runs). Same JSON envelope {success, message, data}; same paths as the
reference api.py:88-391.
"""
from __future__ import annotations

import dataclasses
import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional, Tuple

from tpu_collide.core.types import LocationData, Position, Vector
from tpu_collide.core.utils import get_logger
from tpu_collide.api.scene import Scene

logger = get_logger(__name__)


def _ok(data: Any = None, message: str = "ok") -> Dict[str, Any]:
    return {"success": True, "message": message, "data": data}


def _err(message: str) -> Dict[str, Any]:
    return {"success": False, "message": message, "data": None}


class SceneHTTPServer:
    """Threaded stdlib HTTP server around a Scene. Handlers hold a lock so
    device access is single-threaded."""

    def __init__(self, scene: Scene, host: str = "127.0.0.1",
                 port: int = 8000, scheduler=None):
        self.scene = scene
        self.scheduler = scheduler
        self.host, self.port = host, port
        self._lock = threading.Lock()
        self._server: Optional[ThreadingHTTPServer] = None
        self._thread: Optional[threading.Thread] = None

    # ---- route table ----

    def handle(self, method: str, path: str, body: Optional[dict],
               query: Dict[str, str]) -> Tuple[int, Dict[str, Any]]:
        scene = self.scene
        with self._lock:
            if method == "GET" and path == "/health":
                import time
                return 200, _ok({"timestamp": time.time(), "status": "ok"})

            if method == "POST" and path == "/vehicles/location":
                b = body or {}
                try:
                    loc = LocationData(
                        vehicle_id=b["vehicle_id"],
                        position=Position(**b.get("position", {})),
                        velocity=Vector(**b.get("velocity", {})),
                        acceleration=Vector(**b.get("acceleration", {})),
                        heading=b.get("heading", 0.0))
                except (KeyError, TypeError) as e:
                    return 400, _err(f"bad location payload: {e}")
                scene.ingest(loc, size=b.get("size", 2.0),
                             vtype=b.get("vehicle_type", "car"))
                return 200, _ok(message="Location updated")

            m = re.fullmatch(r"/vehicles/([^/]+)/location", path)
            if method == "GET" and m:
                loc = scene.get_location(m.group(1))
                if loc is None:
                    return 404, _err(f"vehicle {m.group(1)} not found")
                return 200, _ok(loc.to_dict())

            m = re.fullmatch(r"/vehicles/([^/]+)/history", path)
            if method == "GET" and m:
                return 200, _ok([l.to_dict()
                                 for l in scene.get_history(m.group(1))])

            m = re.fullmatch(r"/vehicles/([^/]+)/risks", path)
            if method == "GET" and m:
                return 200, _ok([dataclasses.asdict(r)
                                 for r in scene.get_vehicle_risks(m.group(1))])

            m = re.fullmatch(r"/risks/([^/]+)", path)
            if method == "GET" and m:
                a = scene.alert_manager.alerts.get(m.group(1))
                if a is None:
                    return 404, _err("risk not found")
                return 200, _ok(dataclasses.asdict(a))

            m = re.fullmatch(r"/grids/([^/]+)/vehicles", path)
            if method == "GET" and m:
                try:
                    cx, cy = (int(v) for v in m.group(1).split("_")[:2])
                except ValueError:
                    return 400, _err("grid_id must be '<cx>_<cy>'")
                return 200, _ok(scene.grid_vehicles(cx, cy))

            if method == "GET" and path == "/alerts":
                min_risk = float(query.get("min_risk", 0.0))
                return 200, _ok([dataclasses.asdict(a)
                                 for a in scene.alerts(min_risk)])

            m = re.fullmatch(r"/alerts/([^/]+)/acknowledge", path)
            if method == "POST" and m:
                if scene.alert_manager.acknowledge_alert(m.group(1)):
                    return 200, _ok(message="acknowledged")
                return 404, _err("alert not found")

            if method == "POST" and path == "/step":
                out = scene.step(int((body or {}).get("steps", 1)))
                return 200, _ok({"step_count": scene.step_count,
                                 "num_risks": int(out.num_risks),
                                 "num_alerts": int(out.alerts.count)})

            if method == "POST" and path == "/detect":
                batch = scene.detect()
                return 200, _ok({"num_alerts": int(batch.count)})

            if method == "GET" and path == "/stats":
                return 200, _ok(scene.stats())

            if method == "GET" and path == "/api/collision/metrics":
                s = scene.stats()
                return 200, _ok({
                    "detection_count": s["step_count"],
                    "avg_detection_time_ms": s["avg_step_ms"],
                    "max_detection_time_ms": s["max_step_ms"],
                    "active_alerts": s["alerts"]["active"]})

            if method == "POST" and path == "/api/admin/inject-failure":
                import numpy as np
                import jax.numpy as jnp
                kind = (body or {}).get("type", "reset")
                if kind == "drop_objects":
                    frac = float((body or {}).get("fraction", 0.1))
                    with scene._device_lock:
                        alive = np.asarray(scene.state.alive).copy()
                        idx = np.flatnonzero(alive)
                        kill = idx[:int(len(idx) * frac)]
                        alive[kill] = False
                        scene.state = scene.state.replace(
                            alive=jnp.asarray(alive))
                        scene._num_alive = int(alive.sum())
                    return 200, _ok({"killed": int(len(kill))})
                if kind == "reset":
                    return 200, _ok(message="faults cleared")
                return 400, _err(f"unknown fault type {kind!r}")

            return 404, _err(f"no route {method} {path}")

    # ---- server plumbing ----

    def _make_handler(self):
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _dispatch(self, method):
                from urllib.parse import urlparse, parse_qsl
                u = urlparse(self.path)
                query = dict(parse_qsl(u.query))
                body = None
                length = int(self.headers.get("Content-Length") or 0)
                if length:
                    try:
                        body = json.loads(self.rfile.read(length))
                    except json.JSONDecodeError:
                        self._reply(400, _err("invalid JSON body"))
                        return
                try:
                    code, payload = outer.handle(method, u.path, body, query)
                except Exception as e:  # noqa: BLE001
                    logger.error("handler error %s %s: %s", method, u.path, e)
                    code, payload = 500, _err(str(e))
                self._reply(code, payload)

            def _reply(self, code, payload):
                raw = json.dumps(payload, default=str).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(raw)))
                self.end_headers()
                self.wfile.write(raw)

            def do_GET(self):
                self._dispatch("GET")

            def do_POST(self):
                self._dispatch("POST")

            def do_DELETE(self):
                self._dispatch("DELETE")

        return Handler

    def start(self) -> int:
        """Start serving in a daemon thread; returns the bound port."""
        self._server = ThreadingHTTPServer((self.host, self.port),
                                           self._make_handler())
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        daemon=True)
        self._thread.start()
        logger.info("scene HTTP server on %s:%d", self.host, self.port)
        return self.port

    def stop(self) -> None:
        if self._server:
            self._server.shutdown()
            self._server.server_close()
        if self._thread:
            self._thread.join(timeout=5)

"""REST API — FastAPI server with the reference's endpoint surface.

Paths and response envelope match the reference (api.py:88-391) so existing
clients port 1:1:

  GET  /health
  POST /vehicles/location            (ingest -> broker + Scene buffer)
  GET  /vehicles/{id}/location
  GET  /vehicles/{id}/history
  GET  /vehicles/{id}/risks
  GET  /risks/{id}
  POST /tasks
  POST /nodes  DELETE /nodes/{id}  POST /nodes/{id}/load
  GET  /grids/{id}/vehicles

Additions beyond the reference (it polled these but never implemented them,
SURVEY.md §2.12/§4):

  GET  /alerts                       (active alerts, min_risk filter)
  POST /alerts/{id}/acknowledge
  POST /step                         (advance the scene N steps)
  GET  /stats                        (aggregate metrics tree)
  GET  /api/collision/metrics       (the metrics path performance_monitor.py
                                     polls, performance_monitor.py:397-589)
  POST /api/admin/inject-failure    (fault injection the reference's
                                     FailureInjector client expected,
                                     load_generator.py:748-865)
"""
from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, List, Optional

from tpu_collide.core.config import SystemConfig
from tpu_collide.core.types import LocationData, Position, Vector, Task
from tpu_collide.core.utils import get_logger
from tpu_collide.api.scene import Scene
from tpu_collide.runtime.messaging import MessageBroker, LocationDataProducer
from tpu_collide.runtime.reliability import ThrottlingManager

logger = get_logger(__name__)


def _ok(data: Any = None, message: str = "ok") -> Dict[str, Any]:
    return {"success": True, "message": message, "data": data}


def _err(message: str) -> Dict[str, Any]:
    return {"success": False, "message": message, "data": None}


def create_app(scene: Scene, broker: Optional[MessageBroker] = None,
               scheduler=None, throttling: Optional[ThrottlingManager] = None):
    """Build the FastAPI app around a Scene. Import of fastapi is deferred so
    headless/bench environments never pay for it."""
    from fastapi import FastAPI
    from fastapi.middleware.cors import CORSMiddleware
    from pydantic import BaseModel, Field

    class PositionModel(BaseModel):
        x: float = 0.0
        y: float = 0.0
        z: float = 0.0

    class VectorModel(BaseModel):
        x: float = 0.0
        y: float = 0.0
        z: float = 0.0

    class LocationDataModel(BaseModel):
        vehicle_id: str
        position: PositionModel
        velocity: VectorModel = Field(default_factory=VectorModel)
        acceleration: VectorModel = Field(default_factory=VectorModel)
        heading: float = 0.0
        size: float = 2.0
        vehicle_type: str = "car"
        timestamp: Optional[float] = None

    class TaskModel(BaseModel):
        task_type: str
        payload: Dict[str, Any] = Field(default_factory=dict)
        priority: int = 0
        grid_id: Optional[str] = None
        timeout_s: float = 30.0

    class NodeModel(BaseModel):
        node_id: str
        host: str = "local"
        port: int = 0
        grid_ids: List[str] = Field(default_factory=list)

    class LoadModel(BaseModel):
        cpu_usage: float = 0.0
        memory_usage: float = 0.0
        queue_size: int = 0
        processing_rate: float = 0.0
        average_latency: float = 0.0

    class StepModel(BaseModel):
        steps: int = 1

    app = FastAPI(title="tpu-collide API",
                  description="TPU-native real-time collision detection",
                  version="1.0.0")
    app.add_middleware(CORSMiddleware, allow_origins=["*"],
                       allow_credentials=True, allow_methods=["*"],
                       allow_headers=["*"])
    producer = LocationDataProducer(broker) if broker else None
    fault_state = {"injected": []}

    def _throttle(endpoint: str) -> bool:
        return throttling is None or throttling.allow_request(endpoint)

    @app.get("/health")
    async def health():
        return _ok({"timestamp": time.time(), "status": "ok"})

    @app.post("/vehicles/location")
    async def update_location(loc: LocationDataModel):
        if not _throttle("/vehicles/location"):
            return _err("throttled")
        data = LocationData(
            vehicle_id=loc.vehicle_id,
            position=Position(**loc.position.model_dump()),
            velocity=Vector(**loc.velocity.model_dump()),
            acceleration=Vector(**loc.acceleration.model_dump()),
            heading=loc.heading,
            timestamp=loc.timestamp or time.time())
        scene.ingest(data, size=loc.size, vtype=loc.vehicle_type)
        if producer is not None:
            await producer.send_location(data)
        return _ok(message="Location updated")

    @app.get("/vehicles/{vehicle_id}/location")
    async def get_location(vehicle_id: str):
        loc = scene.get_location(vehicle_id)
        if loc is None:
            return _err(f"vehicle {vehicle_id} not found")
        return _ok(loc.to_dict())

    @app.get("/vehicles/{vehicle_id}/history")
    async def get_history(vehicle_id: str):
        return _ok([l.to_dict() for l in scene.get_history(vehicle_id)])

    @app.get("/vehicles/{vehicle_id}/risks")
    async def get_vehicle_risks(vehicle_id: str):
        return _ok([dataclasses.asdict(r)
                    for r in scene.get_vehicle_risks(vehicle_id)])

    @app.get("/risks/{risk_id}")
    async def get_risk(risk_id: str):
        a = scene.alert_manager.alerts.get(risk_id)
        if a is None:
            return _err(f"risk {risk_id} not found")
        return _ok(dataclasses.asdict(a))

    @app.post("/tasks")
    async def submit_task(task: TaskModel):
        if scheduler is None:
            return _err("no scheduler configured")
        import uuid
        t = Task(task_id=f"task-{uuid.uuid4()}", task_type=task.task_type,
                 payload=task.payload, priority=task.priority,
                 grid_id=task.grid_id, timeout_s=task.timeout_s)
        tid = await scheduler.submit_task(t)
        return _ok({"task_id": tid})

    @app.post("/nodes")
    async def register_node(node: NodeModel):
        if scheduler is None:
            return _err("no scheduler configured")
        from tpu_collide.core.types import NodeInfo
        scheduler.register_node(NodeInfo(
            node_id=node.node_id, host=node.host, port=node.port,
            grid_ids=node.grid_ids))
        return _ok(message="Node registered")

    @app.delete("/nodes/{node_id}")
    async def unregister_node(node_id: str):
        if scheduler is None:
            return _err("no scheduler configured")
        scheduler.unregister_node(node_id)
        return _ok(message="Node unregistered")

    @app.post("/nodes/{node_id}/load")
    async def update_load(node_id: str, load: LoadModel):
        if scheduler is None:
            return _err("no scheduler configured")
        from tpu_collide.core.types import LoadMetrics
        scheduler.update_node_load(node_id, LoadMetrics(
            cpu_usage=load.cpu_usage, memory_usage=load.memory_usage,
            queue_size=load.queue_size,
            processing_rate=load.processing_rate,
            average_latency=load.average_latency))
        return _ok(message="Load updated")

    @app.get("/grids/{grid_id}/vehicles")
    async def grid_vehicles(grid_id: str):
        """grid_id = 'x_y' cell coordinates; returns resident vehicle ids."""
        try:
            cx, cy = (int(v) for v in grid_id.split("_")[:2])
        except ValueError:
            return _err("grid_id must be '<cx>_<cy>'")
        cs = scene.cfg.grid.cell_size
        lo = scene.cfg.world.lo
        center = (lo[0] + (cx + 0.5) * cs, lo[1] + (cy + 0.5) * cs, 0.0)
        ids = scene.query_radius(center, cs * 0.7071 + 1e-3)
        return _ok(ids)

    # ---- additions ----

    @app.get("/alerts")
    async def alerts(min_risk: float = 0.0):
        return _ok([dataclasses.asdict(a) for a in scene.alerts(min_risk)])

    @app.post("/alerts/{alert_id}/acknowledge")
    async def ack(alert_id: str):
        if scene.alert_manager.acknowledge_alert(alert_id):
            return _ok(message="acknowledged")
        return _err(f"alert {alert_id} not found")

    @app.post("/step")
    async def step(body: StepModel):
        import asyncio
        out = await asyncio.get_running_loop().run_in_executor(
            None, scene.step, body.steps)     # device work off the loop
        return _ok({"step_count": scene.step_count,
                    "num_risks": int(out.num_risks),
                    "num_alerts": int(out.alerts.count),
                    "max_risk": float(out.max_risk)})

    @app.post("/detect")
    async def detect():
        import asyncio
        batch = await asyncio.get_running_loop().run_in_executor(
            None, scene.detect)
        return _ok({"num_alerts": int(batch.count)})

    @app.get("/stats")
    async def stats():
        return _ok(scene.stats())

    @app.get("/api/collision/metrics")
    async def collision_metrics():
        s = scene.stats()
        return _ok({"detection_count": s["step_count"],
                    "avg_detection_time_ms": s["avg_step_ms"],
                    "max_detection_time_ms": s["max_step_ms"],
                    "active_alerts": s["alerts"]["active"]})

    @app.post("/api/admin/inject-failure")
    async def inject_failure(body: Dict[str, Any]):
        """Fault injection (the endpoint the reference's FailureInjector
        posted to but the reference never implemented). Supported:
        {'type': 'drop_objects', 'fraction': f} kills a fraction of the
        fleet; {'type': 'reset'} clears injected faults."""
        import numpy as np
        import jax.numpy as jnp
        kind = body.get("type", "reset")
        if kind == "drop_objects":
            frac = float(body.get("fraction", 0.1))
            with scene._device_lock:
                alive = np.asarray(scene.state.alive).copy()
                idx = np.flatnonzero(alive)
                kill = idx[:int(len(idx) * frac)]
                alive[kill] = False
                scene.state = scene.state.replace(alive=jnp.asarray(alive))
                scene._num_alive = int(alive.sum())
            fault_state["injected"].append({"type": kind, "killed": len(kill)})
            return _ok({"killed": int(len(kill))})
        if kind == "reset":
            fault_state["injected"].clear()
            return _ok(message="faults cleared")
        return _err(f"unknown fault type {kind!r}")

    return app


class ApiServer:
    """uvicorn wrapper (reference api.py:88-391)."""

    def __init__(self, scene: Scene, broker: Optional[MessageBroker] = None,
                 scheduler=None, host: str = "127.0.0.1", port: int = 8000):
        self.scene = scene
        self.host, self.port = host, port
        self.app = create_app(scene, broker=broker, scheduler=scheduler)

    async def serve(self) -> None:
        import uvicorn
        server = uvicorn.Server(uvicorn.Config(
            self.app, host=self.host, port=self.port, log_level="warning"))
        await server.serve()


class ApiClient:
    """Async HTTP client mirroring every endpoint (reference
    api.py:394-598). Uses httpx or aiohttp when available; otherwise a
    stdlib urllib fallback running in a worker thread (this framework must
    run anywhere JAX runs)."""

    def __init__(self, base_url: str = "http://127.0.0.1:8000"):
        self.base_url = base_url.rstrip("/")

    def _request_sync(self, method: str, path: str, json_body=None):
        import json as _json
        import urllib.error
        import urllib.request
        data = (_json.dumps(json_body).encode()
                if json_body is not None else None)
        req = urllib.request.Request(
            self.base_url + path, data=data, method=method,
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=30) as r:
                return _json.loads(r.read())
        except urllib.error.HTTPError as e:
            body = e.read()
            try:
                return _json.loads(body)
            except ValueError:
                # non-JSON error body (proxy/ingress page): surface status
                return {"success": False,
                        "message": f"HTTP {e.code}: {body[:200]!r}",
                        "data": None}

    async def _request(self, method: str, path: str, json_body=None):
        try:
            import httpx
        except ImportError:
            httpx = None
        if httpx is not None:
            async with httpx.AsyncClient() as c:
                r = await c.request(method, self.base_url + path,
                                    json=json_body)
                return r.json()
        try:
            import aiohttp
        except ImportError:
            aiohttp = None
        if aiohttp is not None:
            async with aiohttp.ClientSession() as s:
                async with s.request(method, self.base_url + path,
                                     json=json_body) as r:
                    return await r.json()
        import asyncio
        return await asyncio.get_running_loop().run_in_executor(
            None, self._request_sync, method, path, json_body)

    async def health(self):
        return await self._request("GET", "/health")

    async def update_location(self, location: dict):
        return await self._request("POST", "/vehicles/location", location)

    async def get_location(self, vehicle_id: str):
        return await self._request("GET", f"/vehicles/{vehicle_id}/location")

    async def get_history(self, vehicle_id: str):
        return await self._request("GET", f"/vehicles/{vehicle_id}/history")

    async def get_vehicle_risks(self, vehicle_id: str):
        return await self._request("GET", f"/vehicles/{vehicle_id}/risks")

    async def get_risk(self, risk_id: str):
        return await self._request("GET", f"/risks/{risk_id}")

    async def submit_task(self, task: dict):
        return await self._request("POST", "/tasks", task)

    async def register_node(self, node: dict):
        return await self._request("POST", "/nodes", node)

    async def unregister_node(self, node_id: str):
        return await self._request("DELETE", f"/nodes/{node_id}")

    async def update_node_load(self, node_id: str, load: dict):
        return await self._request("POST", f"/nodes/{node_id}/load", load)

    async def grid_vehicles(self, grid_id: str):
        return await self._request("GET", f"/grids/{grid_id}/vehicles")

    async def alerts(self, min_risk: float = 0.0):
        return await self._request("GET", f"/alerts?min_risk={min_risk}")

    async def acknowledge(self, alert_id: str):
        return await self._request("POST", f"/alerts/{alert_id}/acknowledge")

    async def step(self, steps: int = 1):
        return await self._request("POST", "/step", {"steps": steps})

    async def stats(self):
        return await self._request("GET", "/stats")

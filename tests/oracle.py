"""NumPy oracle: a literal, slow re-implementation of the reference's
canonical 4-stage detection math (collision_detection.py:110-513), used as
the ground truth for parity tests. Deliberately written pair-at-a-time in
plain Python so it is an independent derivation from the vectorized JAX code.

Computed in float32 to match device arithmetic.
"""
from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import numpy as np

F = np.float32


def _predict(pos, vel, acc, t):
    return pos + vel * F(t) + F(0.5) * acc * F(t) * F(t)


def _dist(a, b):
    return F(np.sqrt(np.sum((a - b) ** 2, dtype=F)))


def oracle_detect_pair(pos1, vel1, acc1, size1, heading1, type1,
                       pos2, vel2, acc2, size2, heading2, type2,
                       search_radius=100.0, time_window=10.0, time_step=0.1,
                       safe_base=5.0, max_warning_time=10.0,
                       max_rel_speed=50.0, convention="physical",
                       ) -> Optional[Tuple[float, float, float]]:
    """Returns (risk, collision_time, distance_at_collision) or None.

    Mirrors stages 1-4 for a single ordered pair (vehicle=1, other=2).
    convention='reference' replicates the reference's closest-approach sign
    bug (collision_detection.py:252-277, DEVIATIONS.md #1); 'physical' is the
    corrected default."""
    pos1, vel1, acc1 = (np.asarray(x, F) for x in (pos1, vel1, acc1))
    pos2, vel2, acc2 = (np.asarray(x, F) for x in (pos2, vel2, acc2))

    # stage 1: spatial filter (exact radius; ref spatial_index.py:261-269)
    if _dist(pos1, pos2) > F(search_radius):
        return None

    # stage 2: temporal filter (ref collision_detection.py:229-294)
    rel_velocity = vel1 - vel2
    rel_position = pos2 - pos1
    rel_speed = F(np.sqrt(np.sum(rel_velocity ** 2, dtype=F)))
    if rel_speed < F(0.1):
        return None
    if convention == "reference":
        dot = F(np.sum(rel_position * rel_velocity, dtype=F))
    else:
        dot = F(np.sum(rel_position * (vel2 - vel1), dtype=F))
    # (the reference's 'diverging' early-continue is subsumed by t* < 0)
    t_closest = F(-dot / (rel_speed * rel_speed))
    if t_closest < 0 or t_closest > time_window:
        return None
    closest_distance = _dist(_predict(pos1, vel1, acc1, t_closest),
                             _predict(pos2, vel2, acc2, t_closest))
    safe = F((size1 + size2) / 2.0 + safe_base)
    if closest_distance > safe:
        return None

    # stage 3: precise sampled detection (ref :296-342)
    hit_t = hit_d = None
    for k in range(int(time_window / time_step)):
        t = F(k) * F(time_step)
        d = _dist(_predict(pos1, vel1, acc1, t), _predict(pos2, vel2, acc2, t))
        if d <= safe:
            hit_t, hit_d = t, d
            break
    if hit_t is None:
        return None

    # stage 4: risk assessment (ref :344-389)
    heading_diff = abs(F(heading1) - F(heading2))
    angle_factor = F(math.sin(heading_diff))
    type_factor = F(0.5) if type1 == type2 else F(0.8)
    distance_factor = F(1.0) - hit_d / safe
    time_factor = F(1.0) - min(F(1.0), hit_t / F(max_warning_time))
    speed_factor = min(F(1.0), rel_speed / F(max_rel_speed))
    risk = (F(0.3) * distance_factor + F(0.3) * time_factor
            + F(0.2) * speed_factor + F(0.1) * angle_factor
            + F(0.1) * type_factor)
    risk = max(F(0.0), min(F(1.0), risk))
    return float(risk), float(hit_t), float(hit_d)


def oracle_detect_all(pos, vel, acc, size, heading, otype, alive=None,
                      **kw) -> Dict[Tuple[int, int], Tuple[float, float, float]]:
    """All ordered pairs (i, j), i != j, both alive."""
    n = pos.shape[0]
    if alive is None:
        alive = np.ones(n, bool)
    out = {}
    for i in range(n):
        if not alive[i]:
            continue
        for j in range(n):
            if i == j or not alive[j]:
                continue
            r = oracle_detect_pair(
                pos[i], vel[i], acc[i], size[i], heading[i], otype[i],
                pos[j], vel[j], acc[j], size[j], heading[j], otype[j], **kw)
            if r is not None:
                out[(i, j)] = r
    return out


def oracle_priority(risk: float, ttc: float) -> int:
    """Reference warning_system.py:287-311."""
    if risk >= 0.8 and ttc < 3.0:
        return 3
    if risk >= 0.8 or ttc < 5.0:
        return 2
    if risk >= 0.6:
        return 1
    return 0

"""Fused Pallas kernel (cell-list) vs the XLA fast path — interpret mode on
CPU. Validates: identical risk counts, per-object best risks, window
alignment masking (no phantom pairs), 3D disjoint windows (no double
counting), and overflow accounting."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import tpu_collide as tc
from tpu_collide.core.config import (WorldConfig, GridConfig,
                                     DetectionConfig, AlertConfig)
from tpu_collide.core.state import state_from_numpy
from tpu_collide.sim import generate_fleet
from tpu_collide.engine import step_fused, make_step
from tpu_collide.kernels.cell_list import build_cell_list, TILE
from tpu_collide.kernels.fused_detect import fused_detect


def cfg2d(n=500, world=2000.0, alerts=256):
    return tc.SystemConfig(
        num_objects=n, world=WorldConfig(hi=(world, world, 0.0)),
        grid=GridConfig(cell_size=100.0, cell_capacity=64),
        detect=DetectionConfig(mode="fast"),
        alerts=AlertConfig(max_scene_alerts=alerts))


def fleet3d(n=400, key=3):
    cfg = tc.SystemConfig(
        num_objects=n, world=WorldConfig(hi=(1000.0, 1000.0, 300.0)),
        grid=GridConfig(cell_size=100.0, cell_capacity=64),
        detect=DetectionConfig(mode="fast"),
        alerts=AlertConfig(max_scene_alerts=256))
    st = generate_fleet(jax.random.key(key), cfg, distribution="uniform")
    st = st.replace(
        pos=st.pos.at[:, 2].set(
            jax.random.uniform(jax.random.key(9), (n,)) * 300.0),
        vel=st.vel.at[:, 2].set(
            jax.random.normal(jax.random.key(10), (n,)) * 3.0))
    return cfg, st


def xla_best(state, cfg):
    """Per-object best risk + risk count from the XLA fast path."""
    from tpu_collide.engine import make_detect
    pairs = make_detect(cfg)(state)
    risk = np.asarray(jnp.where(pairs.valid, pairs.risk, -1.0))
    cnt = np.asarray(jnp.sum(pairs.valid, axis=1))
    best = risk.max(axis=1)
    return np.maximum(best, 0.0), cnt


def fused_best(state, cfg):
    cl = build_cell_list(state, cfg)
    risk, oid, ttc, dist, rs, col, cnt = fused_detect(cl, cfg,
                                                      interpret=True)
    soid = np.asarray(cl.oid_flat)
    n = state.n
    out_r = np.zeros(n)
    out_c = np.zeros(n, int)
    for i, o in enumerate(soid):
        if o >= 0:
            out_r[o] = float(risk[i])
            out_c[o] = int(cnt[i])
    return out_r, out_c, int(cl.overflow)


@pytest.mark.parametrize("dim", ["2d", "3d"])
def test_fused_matches_xla_per_object(dim):
    if dim == "2d":
        cfg = cfg2d()
        st = generate_fleet(jax.random.key(0), cfg)
    else:
        cfg, st = fleet3d()
    want_r, want_c = xla_best(st, cfg)
    got_r, got_c, overflow = fused_best(st, cfg)
    assert overflow == 0
    np.testing.assert_array_equal(got_c, want_c)
    np.testing.assert_allclose(got_r, want_r, atol=1e-5)


def test_fused_step_alert_coverage():
    """step_fused emits each object's best pair from BOTH directions
    (reference per-vehicle alert semantics); as UNORDERED pairs its alerts
    cover the XLA scene list except pairs that are no object's best, and
    values match exactly on common pairs."""
    cfg = cfg2d()
    st = generate_fleet(jax.random.key(0), cfg)
    key = jax.random.key(1)
    _, o_x = make_step(cfg, donate=False)(st, key)
    _, o_f = step_fused(st, key, cfg, interpret=True)
    assert int(o_f.num_risks) == int(o_x.num_risks)

    def aset(o, unordered):
        v = np.asarray(o.alerts.valid)
        out = {}
        for a, b, r, t in zip(
                np.asarray(o.alerts.vehicle_oid)[v],
                np.asarray(o.alerts.other_oid)[v],
                np.asarray(o.alerts.risk)[v],
                np.asarray(o.alerts.ttc)[v]):
            k = (min(int(a), int(b)), max(int(a), int(b))) if unordered \
                else (int(a), int(b))
            out[k] = (float(r), float(t))
        return out
    ax = aset(o_x, unordered=True)       # XLA list is already pair-deduped
    af = aset(o_f, unordered=True)
    assert set(af) <= set(ax)
    assert len(af) >= 0.85 * len(ax)     # per-object-best covers the bulk
    for k in af:
        np.testing.assert_allclose(ax[k], af[k], rtol=1e-5, atol=1e-5)


def test_fused_head_on():
    cfg = cfg2d(n=2, world=300.0)
    pos = np.array([[0, 0, 0], [100, 0, 0]], np.float32)
    vel = np.array([[10, 0, 0], [-10, 0, 0]], np.float32)
    st = state_from_numpy(pos, vel, np.zeros((2, 3), np.float32),
                          np.array([0.0, np.pi], np.float32),
                          np.full(2, 2.0, np.float32),
                          np.zeros(2, np.int32))
    _, out = step_fused(st, jax.random.key(0), cfg, interpret=True)
    # per-vehicle semantics: the pair appears from BOTH directions
    assert int(out.alerts.count) == 2
    v = np.asarray(out.alerts.valid)
    pairs = {(int(a), int(b)) for a, b in zip(
        np.asarray(out.alerts.vehicle_oid)[v],
        np.asarray(out.alerts.other_oid)[v])}
    assert pairs == {(0, 1), (1, 0)}
    for ttc in np.asarray(out.alerts.ttc)[v]:
        assert abs(float(ttc) - 4.6) < 0.11   # one dt of physics happened


def test_window_overflow_counted():
    """Cramming the fleet into one cell with a tiny window must report
    overflow instead of silently dropping."""
    cfg = cfg2d(n=600, world=2000.0)
    pos = np.full((600, 3), 50.0, np.float32)
    pos[:, 2] = 0.0
    st = state_from_numpy(pos, np.zeros((600, 3), np.float32),
                          np.zeros((600, 3), np.float32),
                          np.zeros(600, np.float32),
                          np.full(600, 2.0, np.float32),
                          np.zeros(600, np.int32))
    cl = build_cell_list(st, cfg, window_rows=8)   # 8*256 = 2048 >= 600: fits
    assert int(cl.overflow) == 0
    # now a fleet bigger than the window
    n = 4000
    pos = np.zeros((n, 3), np.float32) + 50.0
    st = state_from_numpy(pos, np.zeros((n, 3), np.float32),
                          np.zeros((n, 3), np.float32),
                          np.zeros(n, np.float32),
                          np.full(n, 2.0, np.float32),
                          np.zeros(n, np.int32))
    cl = build_cell_list(st, cfg, window_rows=8)
    assert int(cl.overflow) > 0

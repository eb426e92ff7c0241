"""Kernel compile-time flags: count_checked opt-out (r3 perf lever) must
not change alerts/risks, and the packed emitted/qual counter must agree
with the XLA path's per-object counts."""
import numpy as np
import jax
import pytest

pytestmark = pytest.mark.slow

import tpu_collide as tc
from tpu_collide.core.config import (WorldConfig, GridConfig,
                                     DetectionConfig, AlertConfig)
from tpu_collide.sim import generate_fleet
from tpu_collide.engine import step_fused, make_step


def cfg2d(mode="fast", count_checked=True):
    return tc.SystemConfig(
        num_objects=500, world=WorldConfig(hi=(2000.0, 2000.0, 0.0)),
        grid=GridConfig(cell_size=100.0, cell_capacity=64),
        detect=DetectionConfig(mode=mode, count_checked=count_checked),
        alerts=AlertConfig(max_scene_alerts=256))


def amap(o):
    v = np.asarray(o.alerts.valid)
    return {(min(int(a), int(b)), max(int(a), int(b))): (float(r), float(t))
            for a, b, r, t in zip(
                np.asarray(o.alerts.vehicle_oid)[v],
                np.asarray(o.alerts.other_oid)[v],
                np.asarray(o.alerts.risk)[v],
                np.asarray(o.alerts.ttc)[v])}


@pytest.mark.parametrize("mode", ["fast", "precise"])
def test_count_checked_off_same_alerts(mode):
    cfg_on = cfg2d(mode=mode)
    cfg_off = cfg2d(mode=mode, count_checked=False)
    st = generate_fleet(jax.random.key(0), cfg_on)
    key = jax.random.key(1)
    _, o_on = step_fused(st, key, cfg_on, interpret=True)
    _, o_off = step_fused(st, key, cfg_off, interpret=True)
    assert int(o_on.num_pairs_checked) > 0
    assert int(o_off.num_pairs_checked) == -1      # compiled out, flagged
    assert int(o_off.num_risks) == int(o_on.num_risks)
    assert int(o_off.alert_overflow) == int(o_on.alert_overflow) == 0
    a_on, a_off = amap(o_on), amap(o_off)
    assert a_off == a_on
    # and the XLA path still agrees with the counting config
    _, o_x = make_step(cfg_on, donate=False)(st, key)
    assert int(o_on.num_pairs_checked) == int(o_x.num_pairs_checked)


@pytest.mark.parametrize("dim", ["2d", "3d"])
def test_angle_form_product_parity(dim):
    """angle_form='product' (row-level transcendentals in the kernel):
    exact kernel-vs-XLA parity in product mode, and values within float
    noise of the literal 'direct' form."""
    if dim == "2d":
        cfg_d = cfg2d()
        st = generate_fleet(jax.random.key(3), cfg_d)
    else:
        cfg_d = tc.SystemConfig(
            num_objects=400, world=WorldConfig(hi=(1000.0, 1000.0, 300.0)),
            grid=GridConfig(cell_size=100.0, cell_capacity=64),
            detect=DetectionConfig(mode="fast"),
            alerts=AlertConfig(max_scene_alerts=256))
        st = generate_fleet(jax.random.key(3), cfg_d,
                            distribution="uniform")
        import jax.numpy as jnp
        st = st.replace(
            pos=st.pos.at[:, 2].set(
                jax.random.uniform(jax.random.key(9), (400,)) * 300.0))
    cfg_p = cfg_d.replace(detect=cfg_d.detect.__class__(
        mode="fast", angle_form="product"))
    key = jax.random.key(1)
    _, o_xp = make_step(cfg_p, donate=False)(st, key)
    _, o_fp = step_fused(st, key, cfg_p, interpret=True)
    assert int(o_fp.num_risks) == int(o_xp.num_risks)
    assert int(o_fp.alert_overflow) == 0
    ap, fp = amap(o_xp), amap(o_fp)
    assert set(fp) == set(ap)
    for k in fp:
        np.testing.assert_allclose(ap[k], fp[k], rtol=1e-5, atol=1e-5)
    # product vs direct: same pair set, risks within float noise
    _, o_xd = make_step(cfg_d, donate=False)(st, key)
    ad = amap(o_xd)
    assert set(ad) == set(ap)
    for k in ad:
        np.testing.assert_allclose(ad[k][0], ap[k][0], atol=1e-5)


def test_packed_counter_saturates_instead_of_wrapping(monkeypatch):
    """The packed emitted/qual counter SATURATES at CNT_MAX per half. A
    plain wrap at CNT_PACK would read (qual mod CNT_PACK) — e.g. 20 mod 16
    = 4 <= k — and FALSELY certify alert completeness (review finding).
    Shrink the pack constants so a 21-object converging ring crosses them:
    the center object's ~20 qualifying pairs must decode as the saturated
    CNT_MAX, keeping alert_overflow > 0."""
    from tpu_collide.kernels import fused_detect as fd
    from tpu_collide.core.state import state_from_numpy

    monkeypatch.setattr(fd, "CNT_PACK", 16.0)
    monkeypatch.setattr(fd, "CNT_MAX", 7.0)

    n = 21
    pos = np.zeros((n, 3), np.float32)
    vel = np.zeros((n, 3), np.float32)
    for i in range(n - 1):
        ang = 2 * np.pi * i / (n - 1)
        pos[i + 1] = [60 * np.cos(ang), 60 * np.sin(ang), 0.0]
        vel[i + 1] = [-12 * np.cos(ang), -12 * np.sin(ang), 0.0]
    pos += 500.0
    pos[:, 2] = 0.0
    st = state_from_numpy(pos, vel, np.zeros((n, 3), np.float32),
                          np.zeros(n, np.float32),
                          np.full(n, 2.0, np.float32),
                          np.zeros(n, np.int32))
    cfg = tc.SystemConfig(
        num_objects=n, world=WorldConfig(hi=(1000.0, 1000.0, 0.0)),
        grid=GridConfig(cell_size=100.0, cell_capacity=64),
        # hot_topup=0: observe the raw counter contract (the r5 top-up
        # would exactly COVER the saturated hot row — the saturation
        # still matters there too, as the qual > k hot trigger)
        detect=DetectionConfig(mode="fast", hot_topup=0),
        alerts=AlertConfig(max_scene_alerts=64))
    _, out = step_fused(st, jax.random.key(0), cfg, interpret=True)
    # the center object alone has ~20 qualifying pairs > CNT_MAX=7:
    # saturation keeps the overflow certificate FAILED (a wrap would give
    # 20 mod 16 = 4 <= k = 4 -> aoflow 0, silently incomplete)
    assert int(out.alert_overflow) > 0


@pytest.mark.parametrize("mode", ["fast", "precise"])
def test_block_gates_do_not_change_results(mode):
    """gate_stage1/gate_stage2 are pure skip-dead-block-math levers: every
    combination must produce identical risks, counters and alert maps (a
    sparse 3D fleet so a real fraction of pair blocks IS dead at each
    gate)."""
    base = tc.SystemConfig(
        num_objects=800, world=WorldConfig(hi=(1000.0, 1000.0, 300.0)),
        grid=GridConfig(cell_size=100.0, cell_capacity=64),
        detect=DetectionConfig(mode=mode),
        alerts=AlertConfig(max_scene_alerts=256))
    st = generate_fleet(jax.random.key(5), base, distribution="uniform")
    st = st.replace(pos=st.pos.at[:, 2].set(
        jax.random.uniform(jax.random.key(6), (800,)) * 300.0))
    key = jax.random.key(7)
    outs = {}
    for g1 in (False, True):
        for g2 in (False, True):
            import dataclasses
            cfg = base.replace(detect=dataclasses.replace(
                base.detect, gate_stage1=g1, gate_stage2=g2))
            _, o = step_fused(st, key, cfg, interpret=True)
            outs[(g1, g2)] = (int(o.num_risks), int(o.num_pairs_checked),
                              int(o.alert_overflow), amap(o))
    ref = outs[(False, True)]                      # the default config
    assert ref[0] > 0
    for combo, got in outs.items():
        assert got == ref, combo


@pytest.mark.parametrize("mode", ["fast", "precise"])
def test_cand_lanes_exact_parity(mode):
    """cand_lanes=256/512 (wide candidate rows: [128 own x CL cand] pair
    blocks) must produce IDENTICAL results to the classic 128-lane blocks
    in both detection modes — risks, checked counter, overflow counters
    and the alert map. The slot-key quantizer rescales (kq*CL invariant)
    so even packed slot ordering is preserved up to documented
    selection-order granularity; at these densities the outputs are
    bit-equal."""
    import dataclasses
    base = tc.SystemConfig(
        num_objects=800, world=WorldConfig(hi=(1500.0, 1500.0, 200.0)),
        grid=GridConfig(cell_size=100.0, cell_capacity=64),
        detect=DetectionConfig(mode=mode),
        alerts=AlertConfig(max_scene_alerts=256))
    st = generate_fleet(jax.random.key(0), base, distribution="uniform")
    st = st.replace(pos=st.pos.at[:, 2].set(
        jax.random.uniform(jax.random.key(1), (800,)) * 200.0))
    key = jax.random.key(2)
    outs = {}
    for clw in (None, 256, 512):
        cfg = base.replace(grid=dataclasses.replace(base.grid,
                                                    cand_lanes=clw))
        _, o = step_fused(st, key, cfg, interpret=True)
        outs[clw] = (int(o.num_risks), int(o.num_pairs_checked),
                     int(o.overflow), int(o.alert_overflow), amap(o))
    assert outs[None][0] > 0
    assert outs[256] == outs[None]
    assert outs[512] == outs[None]

"""Fused-kernel trajectory prediction (kernels/refine.fused_predict,
ROADMAP r2 #13) vs the canonical XLA predict path — interpret mode on CPU.
Selection rides the kernel; values are recomputed with the XLA helpers, so
per-pair risks/ttc must match predict_collisions bit-for-bit whenever both
paths keep the pair."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

import tpu_collide as tc
from tpu_collide.core.config import (WorldConfig, GridConfig,
                                     DetectionConfig, AlertConfig)
from tpu_collide.sim import generate_fleet
from tpu_collide.index.grid import build_grid
from tpu_collide.detect.predict import (empty_history, update_history,
                                        predict_collisions)
from tpu_collide.kernels.refine import fused_predict


def _fleet_with_history(n=300, world=1500.0, seed=0, ticks=4):
    cfg = tc.SystemConfig(
        num_objects=n, world=WorldConfig(hi=(world, world, 0.0)),
        grid=GridConfig(cell_size=100.0, cell_capacity=96),
        detect=DetectionConfig(mode="fast"),
        alerts=AlertConfig(max_scene_alerts=512))
    st = generate_fleet(jax.random.key(seed), cfg)
    hist = empty_history(n)
    t = 0.0
    for _ in range(ticks):
        t += 0.1
        hist = update_history(hist, st, t)
        st = st.replace(pos=st.pos + st.vel * 0.1)
    return cfg, st, hist


def _risk_map(other, valid, risk, ttc):
    v = np.asarray(valid)
    o = np.asarray(other)
    r = np.asarray(risk)
    t = np.asarray(ttc)
    out = {}
    for i in range(v.shape[0]):
        for kk in np.nonzero(v[i])[0]:
            out[(i, int(o[i, kk]))] = (float(r[i, kk]), float(t[i, kk]))
    return out


@pytest.mark.parametrize("seed", [0, 1])
def test_fused_predict_matches_xla(seed):
    cfg, st, hist = _fleet_with_history(seed=seed)
    # oids are arange, so the XLA path's indices ARE oids
    assert np.array_equal(np.asarray(st.oid), np.arange(st.n))

    index = build_grid(st.pos, st.alive, cfg)
    want = predict_collisions(st, hist, index, cfg, horizon=5.0, step=0.5)
    got = fused_predict(st, hist, cfg, horizon=5.0, step=0.5,
                        interpret=True)
    assert int(got[5]) == 0, "window overflow would make coverage partial"
    assert int(got[6]) == 0, "slot overflow would make the merge partial"

    wm = _risk_map(*want[:4])
    gm = _risk_map(*got[:4])
    assert wm, "fleet produced no predicted risks; test is vacuous"
    assert set(gm) == set(wm)
    for k in wm:
        np.testing.assert_allclose(gm[k], wm[k], rtol=1e-6, atol=1e-6)


def test_fused_predict_matches_xla_3d():
    """3D prediction: the static z-shift list reaches every layer a
    class-advanced query can touch."""
    n = 150
    cfg = tc.SystemConfig(
        num_objects=n, world=WorldConfig(hi=(600.0, 600.0, 300.0)),
        grid=GridConfig(cell_size=100.0, cell_capacity=96),
        detect=DetectionConfig(mode="fast"),
        alerts=AlertConfig(max_scene_alerts=512))
    st = generate_fleet(jax.random.key(3), cfg, distribution="uniform")
    st = st.replace(
        pos=st.pos.at[:, 2].set(
            jax.random.uniform(jax.random.key(9), (n,)) * 300.0),
        vel=st.vel.at[:, 2].set(
            jax.random.normal(jax.random.key(10), (n,)) * 3.0))
    hist = empty_history(n)
    t = 0.0
    for _ in range(4):
        t += 0.1
        hist = update_history(hist, st, t)
        st = st.replace(pos=st.pos + st.vel * 0.1)
    index = build_grid(st.pos, st.alive, cfg)
    want = predict_collisions(st, hist, index, cfg, horizon=2.0, step=0.5)
    got = fused_predict(st, hist, cfg, horizon=2.0, step=0.5,
                        interpret=True)
    assert int(got[5]) == 0
    assert int(got[6]) == 0
    wm = _risk_map(*want[:4])
    gm = _risk_map(*got[:4])
    assert wm, "no predicted risks in 3D fleet; vacuous"
    assert set(gm) == set(wm)
    for k in wm:
        np.testing.assert_allclose(gm[k], wm[k], rtol=1e-6, atol=1e-6)


def test_scene_predict_fused_backend():
    """Scene(backend='fused').predict rides the kernel path and returns the
    same CollisionRisks as the canonical Scene path."""
    from tpu_collide.api import Scene

    cfg, st, hist = _fleet_with_history(n=200, seed=2)

    def run(backend):
        sc = Scene(cfg, backend=backend, interpret=True)
        sc.adopt_fleet(st)
        t = 0.0
        for _ in range(4):
            t += 0.1
            sc.record_trajectories(dt=0.1)
            sc.state = sc.state.replace(pos=sc.state.pos + sc.state.vel * 0.1)
        return sc.predict(horizon=5.0, step=0.5)

    want = run("xla")
    got = run("fused")
    wm = {(r.vehicle_id, r.other_vehicle_id): r.risk_level for r in want}
    gm = {(r.vehicle_id, r.other_vehicle_id): r.risk_level for r in got}
    assert wm, "no predicted risks; vacuous"
    assert set(gm) == set(wm)
    for k in wm:
        np.testing.assert_allclose(gm[k], wm[k], rtol=1e-6)


def test_scene_predict_window_regrow():
    """Prediction window overflow triggers the adaptive regrow: the next
    predict call runs with doubled windows and full coverage."""
    from tpu_collide.api import Scene
    from tpu_collide.core.state import state_from_numpy

    n = 1600
    cfg = tc.SystemConfig(
        num_objects=n, world=WorldConfig(hi=(2000.0, 2000.0, 0.0)),
        grid=GridConfig(cell_size=100.0, cell_capacity=256),
        detect=DetectionConfig(mode="fast"),
        alerts=AlertConfig(max_scene_alerts=512))
    rng = np.random.default_rng(0)
    # dense 2-cell-tall strip: per-brow density far above the mean the
    # static window sizing assumes
    pos = np.zeros((n, 3), np.float32)
    pos[:, 0] = rng.uniform(0, 2000, n)
    pos[:, 1] = rng.uniform(900, 1100, n)
    vel = rng.normal(0, 8, (n, 3)).astype(np.float32)
    vel[:, 2] = 0.0
    st = state_from_numpy(pos, vel, np.zeros((n, 3), np.float32),
                          np.zeros(n, np.float32),
                          np.full(n, 2.0, np.float32),
                          np.zeros(n, np.int32))
    sc = Scene(cfg, backend="fused", interpret=True)
    sc.adopt_fleet(st)
    sc._predict_windows = 8          # start absurdly small: force overflow
    t = 0.0
    for _ in range(3):
        t += 0.1
        sc.record_trajectories(dt=0.1)
        sc.state = sc.state.replace(pos=sc.state.pos + sc.state.vel * 0.1)
    sc.predict(horizon=5.0, step=1.0)
    assert sc._predict_windows > 8, "overflow did not trigger the regrow"
    regrows = sc.window_regrows
    # converges: repeated predicts keep doubling until coverage holds
    for _ in range(6):
        before = sc._predict_windows
        sc.predict(horizon=5.0, step=1.0)
        if sc._predict_windows == before:
            break
    assert sc.window_regrows >= regrows


def test_xla_predict_counts_bucket_overflow(caplog):
    """The XLA predict path's broad phase drops bucket entries beyond
    cell_capacity (index/grid.gather_candidates); those misses must be
    COUNTED and warned about, never silent (found on a real-TPU drive:
    at a 5k city-skew fleet with the default cell_capacity=16 the XLA
    predict quietly returned 70 fewer pairs than the fused path, whose
    windows cover all densities). With adequate capacity both backends
    return identical risk sets."""
    import logging
    from tpu_collide.api import Scene

    def run(cfg, backend):
        sc = Scene(cfg, backend=backend, interpret=(backend == "fused"))
        st = generate_fleet(jax.random.key(5), cfg)
        sc.adopt_fleet(st)
        for _ in range(3):
            sc.record_trajectories(dt=0.1)
            sc.state = sc.state.replace(pos=sc.state.pos + sc.state.vel * 0.1)
        # the fused path self-heals window/slot overflow on the NEXT call;
        # loop until a call completes without a regrow
        for _ in range(5):
            before = sc.window_regrows
            out = sc.predict(horizon=5.0, step=0.5)
            if sc.window_regrows == before:
                break
        return out

    tight = tc.SystemConfig(
        num_objects=200, world=WorldConfig(hi=(500.0, 500.0, 0.0)),
        grid=GridConfig(cell_size=100.0, cell_capacity=4),
        detect=DetectionConfig(mode="fast"),
        alerts=AlertConfig(max_scene_alerts=8192))
    with caplog.at_level(logging.WARNING, logger="tpu_collide.api.scene"):
        run(tight, "xla")
    assert any("overflow their grid buckets" in r.message for r in
               caplog.records), "silent bucket truncation in XLA predict"

    roomy = tight.replace(grid=GridConfig(cell_size=100.0,
                                          cell_capacity=96))
    want = run(roomy, "xla")
    got = run(roomy, "fused")
    wm = {(r.vehicle_id, r.other_vehicle_id): r.risk_level for r in want}
    gm = {(r.vehicle_id, r.other_vehicle_id): r.risk_level for r in got}
    assert wm, "no predicted risks; vacuous"
    assert set(gm) == set(wm)


def _converging_cluster(n=96, seed=1, r_lo=30.0, r_hi=70.0):
    """n objects on a ring all heading at one point: every offset is
    hit-dense, so per-offset slot truncation is guaranteed at small
    k_slots — the certificate's stress fleet."""
    rng = np.random.default_rng(seed)
    ang = rng.uniform(0, 2 * np.pi, n)
    r0 = rng.uniform(r_lo, r_hi, n)
    pos = np.zeros((n, 3), np.float32)
    pos[:, 0] = 500.0 + r0 * np.cos(ang)
    pos[:, 1] = 500.0 + r0 * np.sin(ang)
    vel = np.zeros((n, 3), np.float32)
    sp = rng.uniform(4, 7, n)
    vel[:, 0] = -sp * np.cos(ang)
    vel[:, 1] = -sp * np.sin(ang)
    from tpu_collide.core.state import state_from_numpy
    st = state_from_numpy(pos, vel, np.zeros((n, 3), np.float32),
                          np.zeros(n, np.float32),
                          np.full(n, 2.0, np.float32),
                          np.zeros(n, np.int32))
    cfg = tc.SystemConfig(
        num_objects=n, world=WorldConfig(hi=(1000.0, 1000.0, 0.0)),
        grid=GridConfig(cell_size=100.0, cell_capacity=128),
        detect=DetectionConfig(mode="fast"),
        alerts=AlertConfig(max_scene_alerts=8192))
    hist = empty_history(n)
    t = 0.0
    for _ in range(4):
        t += 0.1
        hist = update_history(hist, st, t)
        st = st.replace(pos=st.pos + st.vel * 0.1)
    return cfg, st, hist


def test_predict_truncation_certificate_harmless():
    """Per-offset slot truncation whose drops are provably below the final
    merged top-merge_k is CERTIFIED harmless (slot_oflow 0, slot_trunc
    counted) and the merged output equals the canonical path exactly —
    the r4 certificate that turns counted truncations into proven-complete
    results (refine.fused_predict_rows)."""
    cfg, st, hist = _converging_cluster()
    got = fused_predict(st, hist, cfg, horizon=10.0, step=0.5,
                        k_slots=8, merge_k=8, interpret=True)
    assert int(got[5]) == 0
    assert int(got[7]) > 0, "fleet produced no truncations; test is vacuous"
    assert int(got[6]) == 0, "dense-cluster drops should all certify"
    index = build_grid(st.pos, st.alive, cfg)
    want = predict_collisions(st, hist, index, cfg, horizon=10.0, step=0.5,
                              merge_k=8)
    wm = _risk_map(*want[:4])
    gm = _risk_map(*got[:4])
    assert wm and set(gm) == set(wm)
    for k in wm:
        np.testing.assert_allclose(gm[k], wm[k], rtol=1e-6, atol=1e-6)


def test_predict_truncation_certificate_flags_loss():
    """When dropped hits COULD have entered the merged list and the hot
    top-up is DISABLED, the certificate must refuse (slot_oflow > 0):
    same fleet, merge_k wider than the per-offset slots can feed — a
    known-lossy operating point."""
    import dataclasses as dc
    cfg, st, hist = _converging_cluster()
    cfg = cfg.replace(detect=dc.replace(cfg.detect, hot_topup=0))
    got = fused_predict(st, hist, cfg, horizon=10.0, step=0.5,
                        k_slots=8, merge_k=16, interpret=True)
    assert int(got[7]) > 0
    assert int(got[6]) > 0, (
        "this operating point loses pairs (verified by hand vs the "
        "canonical path) — a 0 here would be a false completeness claim")


def test_predict_hot_topup_repairs_lossy_point():
    """The r5 predict hot top-up: the same known-lossy operating point
    (k_slots=8 feeding merge_k=16) comes back CERTIFIED (slot_oflow 0)
    with the merged output exactly equal to the canonical path — flagged
    (offset, row) truncations are re-detected exactly over widened
    cr_start spans and re-merged (refine._predict_hot_topup)."""
    cfg, st, hist = _converging_cluster()
    got = fused_predict(st, hist, cfg, horizon=10.0, step=0.5,
                        k_slots=8, merge_k=16, interpret=True)
    assert int(got[5]) == 0
    assert int(got[7]) > 0, "fleet produced no truncations; test is vacuous"
    assert int(got[6]) == 0, "top-up left uncertified truncations"
    index = build_grid(st.pos, st.alive, cfg)
    want = predict_collisions(st, hist, index, cfg, horizon=10.0, step=0.5,
                              merge_k=16)
    wm = _risk_map(*want[:4])
    gm = _risk_map(*got[:4])
    assert wm and set(gm) == set(wm)
    for k in wm:
        np.testing.assert_allclose(gm[k], wm[k], rtol=1e-6, atol=1e-6)


def test_predict_traces_one_kernel_for_all_offsets():
    """Offset params are traced scalars riding a lax.scan (refine.py), so
    the predict kernel appears ONCE in the jaxpr no matter how many offsets
    the horizon spans — Mosaic compile cost is O(1) in horizon/step. The old
    per-offset python loop instantiated one structurally identical
    pallas_call per offset and compiled each separately (~2.5 min/offset at
    deep-z configs, BENCH_NOTES r3)."""
    cfg, st, hist = _fleet_with_history(n=128, world=800.0)

    def n_kernels(horizon):
        jx = jax.make_jaxpr(
            lambda s, h: fused_predict(s, h, cfg, horizon=horizon,
                                       step=0.5, interpret=True))(st, hist)
        return str(jx).count("pallas_call")

    assert n_kernels(1.0) == n_kernels(4.0)  # 2 offsets vs 8 offsets

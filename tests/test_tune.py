"""Host-side config autotuning (VERDICT r2 #9): fleet-exact window sizing
makes skewed fleets certify on the FIRST build — no hand-tuning, no regrow
warm-up."""
import numpy as np
import pytest
import jax

import tpu_collide as tc
from tpu_collide.core.config import WorldConfig, GridConfig, DetectionConfig
from tpu_collide.sim import generate_fleet
from tpu_collide.kernels.cell_list import build_cell_list, default_window_rows
from tpu_collide.kernels.tune import (suggest_window_rows, suggest_cell_size,
                                      tune_config)


def skew_cfg(n=20_000):
    return tc.SystemConfig(
        num_objects=n, world=WorldConfig(hi=(4000.0, 4000.0, 0.0)),
        grid=GridConfig(cell_size=100.0),
        detect=DetectionConfig(mode="fast"))


@pytest.mark.slow
def test_suggested_windows_clear_dense_skew_on_first_build():
    """A fleet with 60% of objects crammed into one dense strip: the
    mean-density default window overflows; the fleet-exact suggestion
    clears it on the first build."""
    from tpu_collide.core.state import state_from_numpy
    cfg = skew_cfg()
    n = cfg.num_objects
    rng = np.random.default_rng(0)
    pos = np.zeros((n, 3), np.float32)
    n_dense = int(0.6 * n)
    pos[:n_dense, 0] = rng.uniform(1000.0, 1200.0, n_dense)
    pos[:n_dense, 1] = rng.uniform(1000.0, 1200.0, n_dense)
    pos[n_dense:, 0] = rng.uniform(0.0, 4000.0, n - n_dense)
    pos[n_dense:, 1] = rng.uniform(0.0, 4000.0, n - n_dense)
    st = state_from_numpy(pos, np.zeros((n, 3), np.float32),
                          np.zeros((n, 3), np.float32),
                          np.zeros(n, np.float32),
                          np.full(n, 2.0, np.float32),
                          np.zeros(n, np.int32))
    # the mean-density default underestimates the dense strip
    dflt = default_window_rows(cfg)
    cl0 = build_cell_list(st, cfg, window_rows=dflt)
    assert int(cl0.overflow) > 0, "fleet too tame to discriminate"
    wr = suggest_window_rows(st, cfg)
    assert wr > dflt
    cl1 = build_cell_list(st, cfg, window_rows=wr)
    assert int(cl1.overflow) == 0


def test_suggested_windows_not_wasteful_on_uniform():
    cfg = skew_cfg(n=8000)
    st = generate_fleet(jax.random.key(1), cfg, distribution="uniform")
    wr = suggest_window_rows(st, cfg)
    # exact sizing stays in the neighborhood of the mean-density default
    assert wr <= 3 * default_window_rows(cfg)
    assert int(build_cell_list(st, cfg, window_rows=wr).overflow) == 0


def test_suggest_cell_size_clamps_to_radius():
    cfg = skew_cfg().replace(grid=GridConfig(cell_size=40.0))
    assert suggest_cell_size(cfg) == cfg.detect.search_radius
    cfg2, wr = tune_config(cfg)
    assert cfg2.grid.cell_size == cfg.detect.search_radius
    assert wr is None


def test_scene_self_tunes_from_fleet():
    from tpu_collide.api import Scene
    cfg = skew_cfg(n=4000)
    st = generate_fleet(jax.random.key(2), cfg)
    sc = Scene(cfg, state=st, backend="fused", interpret=True)
    # the chosen windows clear the fleet's densest tile on the first build
    cl = build_cell_list(st, cfg, window_rows=sc._window_rows)
    assert int(cl.overflow) == 0
    assert sc._window_rows >= suggest_window_rows(st, cfg, margin_rows=0)


def test_suggest_3d_banded_layouts():
    cfg = tc.SystemConfig(
        num_objects=5000, world=WorldConfig(hi=(2000.0, 2000.0, 300.0)),
        grid=GridConfig(cell_size=100.0, band_cells=4),
        detect=DetectionConfig(mode="fast"))
    st = generate_fleet(jax.random.key(3), cfg, distribution="uniform")
    wr = suggest_window_rows(st, cfg)
    assert int(build_cell_list(st, cfg, window_rows=wr).overflow) == 0


def test_suggest_survivor_cap_exact_and_certified():
    """Fleet-exact precise survivor cap (VERDICT r3 Next #5): the probe's
    cap covers the measured need, is far below the 2N default for a sparse
    fleet, and a precise fused step at that cap still certifies complete
    (alert_overflow 0) with the same alert set as the 2N-cap run."""
    import dataclasses
    import jax.numpy as jnp
    from tpu_collide.kernels.tune import (measure_survivor_need,
                                          suggest_survivor_cap)

    cfg = skew_cfg(n=2000).replace(detect=DetectionConfig(mode="precise"))
    st = generate_fleet(jax.random.key(4), cfg, distribution="city_skew")
    need = measure_survivor_need(cfg, st, interpret=True)
    cap = suggest_survivor_cap(cfg, st, interpret=True)
    assert need >= 0
    assert cap >= need

    def alert_set(c):
        f = tc.make_step(c, donate=False, backend="fused", interpret=True)
        _, out = f(st, jax.random.key(5))
        assert int(out.alert_overflow) == 0
        a = out.alerts
        cnt = int(np.asarray(a.count).reshape(-1)[0])
        return {(int(a.vehicle_oid[i]), int(a.other_oid[i]))
                for i in range(cnt)}

    # integrate() moves the fleet before detection; probe the moved state
    # the same way the step will see it by padding need with the margin —
    # the suggested cap's 1/8 + TILE headroom covers one step of drift
    # for this config's speeds
    cfg_cap = cfg.replace(detect=dataclasses.replace(
        cfg.detect, precise_survivor_cap=cap))
    assert cfg_cap.survivor_cap == cap < 2 * cfg.num_objects
    assert alert_set(cfg_cap) == alert_set(cfg)


def test_suggest_survivor_cap_keyed_probe_tracks_steps():
    """With a key sequence the probe folds the max need across the evolved
    trajectory (lax.scan), matching per-step measurement."""
    import jax.numpy as jnp
    from tpu_collide.kernels.tune import measure_survivor_need
    from tpu_collide.sim.integrator import integrate

    cfg = skew_cfg(n=1000).replace(detect=DetectionConfig(mode="precise"))
    st = generate_fleet(jax.random.key(6), cfg, distribution="city_skew")
    keys = jax.random.split(jax.random.key(7), 3)
    folded = measure_survivor_need(cfg, st, keys, interpret=True)
    worst = 0
    cur = st
    for k in keys:
        cur = jax.jit(lambda s, kk: integrate(s, kk, cfg))(cur, k)
        worst = max(worst, measure_survivor_need(cfg, cur, interpret=True))
    assert folded == worst


def test_tune_config_selects_stage1_gate_by_dimensionality():
    """gate_stage1 policy: on for 3D worlds (sparse blocks, measured win
    at 1M/10M), off for 2D (dense blocks, measured loss at 100k) —
    results are identical either way (tests/test_kernel_flags.py), so
    the tuner just picks the faster compile."""
    from tpu_collide.core.config import WorldConfig
    cfg2d = skew_cfg()
    cfg2d_t, _ = tune_config(cfg2d)
    assert not cfg2d_t.detect.gate_stage1
    cfg3d = skew_cfg().replace(world=WorldConfig(hi=(2000.0, 2000.0,
                                                     300.0)))
    cfg3d_t, _ = tune_config(cfg3d)
    assert cfg3d_t.detect.gate_stage1

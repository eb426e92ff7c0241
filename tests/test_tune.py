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

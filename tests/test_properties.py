"""Hand-rolled property-based tests (hypothesis is not bundled): randomized
fleets and configs sweep geometry edge cases the fixed-seed tests cannot —
objects at world bounds, coincident positions, dead slots, odd world/band
shapes. Each property is checked over several seeds (ROADMAP r2 #10)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import tpu_collide as tc
from tpu_collide.core.config import (WorldConfig, GridConfig,
                                     DetectionConfig, AlertConfig)
from tpu_collide.core.state import ObjectState
from tpu_collide.engine import make_detect
from tpu_collide.kernels.cell_list import (build_cell_list, TILE, LANE,
                                           FIELD_NAMES)
from tpu_collide.kernels.fused_detect import fused_topk


def random_state(rng, n, world, threed, dead_frac=0.1):
    """Adversarial random fleet: clustered + boundary + coincident objects,
    a sprinkle of dead slots."""
    pos = rng.uniform(0, world, (n, 3)).astype(np.float32)
    # clusters: 30% of objects pile into 3 small patches
    for c in range(3):
        idx = rng.choice(n, n // 10, replace=False)
        center = rng.uniform(0, world, 3)
        pos[idx] = (center + rng.normal(0, 30, (len(idx), 3))).astype(
            np.float32)
    # boundary riders: exactly on the world edges
    edge = rng.choice(n, max(2, n // 20), replace=False)
    pos[edge, rng.integers(0, 2)] = rng.choice(
        [0.0, world], len(edge)).astype(np.float32)
    # coincident twins
    twin = rng.choice(n // 2, max(1, n // 50), replace=False)
    pos[twin + n // 2] = pos[twin]
    pos = np.clip(pos, 0, world)
    pos[:, 2] = np.clip(pos[:, 2], 0, 300.0) if threed else 0.0
    vel = rng.normal(0, 12, (n, 3)).astype(np.float32)
    acc = rng.normal(0, 0.8, (n, 3)).astype(np.float32)
    if not threed:
        vel[:, 2] = 0.0
        acc[:, 2] = 0.0
    alive = rng.uniform(size=n) > dead_frac
    return ObjectState(
        pos=jnp.asarray(pos), vel=jnp.asarray(vel), acc=jnp.asarray(acc),
        heading=jnp.asarray(rng.uniform(0, 2 * np.pi, n).astype(np.float32)),
        size=jnp.asarray(rng.choice([1.0, 2.0, 4.0, 5.0], n).astype(
            np.float32)),
        otype=jnp.asarray(rng.integers(0, 4, n).astype(np.int32)),
        alive=jnp.asarray(alive),
        oid=jnp.arange(n, dtype=jnp.int32))


def cfg_for(world, threed, mode="fast", band=None):
    return tc.SystemConfig(
        num_objects=0,  # unused by detect paths
        world=WorldConfig(hi=(world, world, 300.0 if threed else 0.0)),
        grid=GridConfig(cell_size=100.0, cell_capacity=128, band_cells=band),
        detect=DetectionConfig(mode=mode),
        alerts=AlertConfig(max_scene_alerts=512)).replace(num_objects=400)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_detection_invariants_random(seed):
    """Symmetry, bounds, and a brute-force stage-1 oracle on adversarial
    random fleets (2D and 3D alternating by seed)."""
    rng = np.random.default_rng(seed)
    threed = bool(seed % 2)
    cfg = cfg_for(1500.0, threed)
    st = random_state(rng, 400, 1500.0, threed)
    pairs = make_detect(cfg)(st)

    valid = np.asarray(pairs.valid)
    other = np.asarray(pairs.other)
    risk = np.asarray(pairs.risk)
    ttc = np.asarray(pairs.ttc)
    alive = np.asarray(st.alive)
    pos = np.asarray(st.pos)

    # bounds
    assert ((risk >= 0.0) & (risk <= 1.0)).all()
    assert (ttc[valid] >= 0.0).all()
    assert (ttc[valid] <= cfg.detect.time_window + 1e-5).all()

    pair_map = {}
    for i in range(400):
        for kk in np.nonzero(valid[i])[0]:
            j = int(other[i, kk])
            assert j != i, "self pair"
            assert alive[i] and alive[j], "dead pair"
            d = float(np.linalg.norm(pos[j] - pos[i]))
            assert d <= cfg.detect.search_radius + 1e-3
            pair_map[(i, j)] = (float(risk[i, kk]), float(ttc[i, kk]))
    # symmetry: each direction present with identical values (the stage
    # math is exactly symmetric under i<->j)
    for (i, j), v in pair_map.items():
        assert (j, i) in pair_map, f"asymmetric pair {(i, j)}"
        np.testing.assert_allclose(pair_map[(j, i)], v, rtol=1e-6)

    # brute-force stage-1 oracle
    d2 = ((pos[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
    m = (alive[:, None] & alive[None, :]
         & (d2 <= np.float32(cfg.detect.search_radius) ** 2))
    np.fill_diagonal(m, False)
    assert int(pairs.num_checked) == int(m.sum())


@pytest.mark.parametrize("seed", [3, 4, 5])
def test_fused_matches_xla_random(seed):
    """Fused interpret path == XLA path on adversarial random fleets with
    randomized band widths (including widths that do not divide nx)."""
    rng = np.random.default_rng(seed)
    threed = bool(seed % 2)
    band = int(rng.choice([0, 1, 3, 7]))   # 0 = auto; 7 does not divide 15
    cfg = cfg_for(1500.0, threed, band=band)
    st = random_state(rng, 400, 1500.0, threed)

    pairs = make_detect(cfg)(st)
    want_c = np.asarray(jnp.sum(pairs.valid, axis=1))

    cl = build_cell_list(st, cfg)
    keys, idx, checked, emitted, qual = fused_topk(cl, cfg, interpret=True)
    assert int(cl.overflow) == 0
    soid = np.asarray(cl.oid_flat)
    got_c = np.zeros(st.n, int)
    em = np.asarray(emitted)
    for i, o in enumerate(soid):
        if o >= 0:
            got_c[o] = int(em[i])
    np.testing.assert_array_equal(got_c, want_c)
    assert int(checked) == int(pairs.num_checked)


@pytest.mark.parametrize("seed", [6, 7])
def test_cell_list_invariants_random(seed):
    """Structural invariants of the cell-list layout under random fleets,
    worlds and band widths: every alive object appears exactly once; row
    guards are conservative; cr_start is monotone; per-tile windows are
    disjoint storage ranges."""
    rng = np.random.default_rng(seed)
    threed = bool(seed % 2)
    world = float(rng.choice([900.0, 1500.0, 2100.0]))
    band = int(rng.choice([1, 2, 5, 0]))
    cfg = cfg_for(world, threed, band=band)
    st = random_state(rng, 400, world, threed)
    cl = build_cell_list(st, cfg)

    oid = np.asarray(cl.fields[FIELD_NAMES.index("oid")]).reshape(-1)
    row = np.asarray(cl.fields[FIELD_NAMES.index("row")]).reshape(-1)
    alive = np.asarray(st.alive)
    live_oids = sorted(int(o) for o, r in zip(oid, row) if r >= 0)
    assert live_oids == sorted(np.nonzero(alive)[0].tolist())

    cr = np.asarray(cl.cr_start)
    assert (np.diff(cr) >= 0).all()
    assert cr[-1] == int(cl.n_alive)

    # guard conservativeness: actual per-storage-row brow/x ranges must lie
    # inside the (possibly quantized) guard ranges
    R = cl.fields.shape[1]
    x2d = np.asarray(cl.fields[FIELD_NAMES.index("x")])
    row2d = np.asarray(cl.fields[FIELD_NAMES.index("row")])
    if cl.tables_packed:
        from tpu_collide.kernels.cell_list import ROW_PACK
        rlo = np.asarray(cl.row_rb_a) // ROW_PACK
        rhi = np.asarray(cl.row_rb_a) % ROW_PACK - 2
    else:
        rlo = np.asarray(cl.row_rb_a)
        rhi = np.asarray(cl.row_rb_b)
    if cl.tables_packed:
        from tpu_collide.kernels.cell_list import X_PACK
        xlo = np.asarray(cl.row_xa) // X_PACK
        xhi = np.asarray(cl.row_xa) % X_PACK - 1
        x_slack = 1.0 + 1e-3          # meter quantization (floor/ceil)
    else:
        xlo = np.asarray(cl.row_xa)   # raw f32 bounds: exact
        xhi = np.asarray(cl.row_xb)
        x_slack = 0.0
    for r in range(R):
        m = row2d[r] >= 0
        if not m.any():
            continue
        assert rlo[r] <= row2d[r][m].min()
        assert rhi[r] >= row2d[r][m].max()
        assert xlo[r] <= x2d[r][m].min() + 1e-3
        assert xhi[r] >= x2d[r][m].max() - x_slack

    # windows of one tile never overlap in storage rows
    W = cl.n_windows
    wrw = np.asarray(cl.w_rw).reshape(-1, W)
    for tile in range(wrw.shape[0]):
        spans = []
        for w in range(W):
            start, cnt = wrw[tile, w] // 4096, wrw[tile, w] % 4096
            if cnt > 0:
                spans.append((start, start + cnt))
        spans.sort()
        for a, b in zip(spans, spans[1:]):
            # starts are 8-aligned floor, ends LANE-rounded: physical rows
            # may abut but window BROW ranges (the dedup guard) must be
            # disjoint — checked indirectly by the fused-vs-XLA count
            # equality above; here assert ordering sanity
            assert b[0] >= a[0]

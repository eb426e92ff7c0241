"""Staged Pallas bitonic co-sort (.probe/block_sort.py) — RETIRED probe.

The kernel was removed from the package (measured-DEAD vs lax.sort,
BENCH_NOTES r3); this test moved with it. Run from the repo root with
`python -m pytest .probe/test_block_sort.py` (the import shim below loads
the sibling module). The end-to-end GridConfig.pallas_sort parity test was
dropped with the config knob.

Contract: `co_sort(ops)` is a drop-in for
`lax.sort(ops, num_keys=1, is_stable=False)` up to key-tie order —
keys come back ascending and the multiset of full operand ROWS is
preserved exactly. Plus end-to-end: a fused detection step over a
Pallas-sorted cell list matches the lax.sort build bit-for-bit on risk
counts and alert sets (both sorts are unstable; detection semantics are
tie-order independent)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_collide as tc
from tpu_collide.core.config import (WorldConfig, GridConfig,
                                     DetectionConfig, AlertConfig)
import importlib.util as _ilu
import os as _os
_spec = _ilu.spec_from_file_location(
    "block_sort", _os.path.join(_os.path.dirname(__file__), "block_sort.py"))
block_sort = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(block_sort)
co_sort = block_sort.co_sort


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def _rows(ops):
    """Canonical row multiset: rows sorted by every column."""
    cols = [np.asarray(o) for o in ops]
    order = np.lexsort(tuple(reversed(cols)))
    return [c[order] for c in cols]


@pytest.mark.parametrize("n,block_elems", [
    (4096, 2048),        # one block, pow2
    (5000, 2048),        # pad path
    (16384, 2048),       # cross-block XLA stages + tails (3 levels)
    (30000, 4096),       # pad + multi-level
])
def test_cosort_matches_lax_sort(rng, n, block_elems):
    key = jnp.asarray(rng.integers(0, 997, n).astype(np.int32))
    pays = [jnp.asarray(rng.normal(size=n).astype(np.float32))
            for _ in range(3)]
    ops = (key, *pays)
    got = co_sort(ops, interpret=True, block_elems=block_elems, force=True)
    ref = jax.lax.sort(ops, num_keys=1, is_stable=False, dimension=0)
    k = np.asarray(got[0])
    assert np.all(k[1:] >= k[:-1])
    assert np.array_equal(k, np.asarray(ref[0]))
    for a, b in zip(_rows(got), _rows(ref)):
        assert np.array_equal(a, b)


def test_cosort_degenerate_keys(rng):
    """All-equal and two-value keys exercise every tie path."""
    n = 4096
    for key_np in (np.zeros(n, np.int32),
                   rng.integers(0, 2, n).astype(np.int32)):
        pay = jnp.asarray(rng.normal(size=n).astype(np.float32))
        got = co_sort((jnp.asarray(key_np), pay), interpret=True,
                      block_elems=2048, force=True)
        k = np.asarray(got[0])
        assert np.all(k[1:] >= k[:-1])
        for a, b in zip(_rows(got), _rows((key_np, pay))):
            assert np.array_equal(a, b)


def test_cosort_small_n_falls_back_to_lax_sort(rng):
    n = 1000
    key = jnp.asarray(rng.integers(0, 50, n).astype(np.int32))
    pay = jnp.asarray(rng.normal(size=n).astype(np.float32))
    got = co_sort((key, pay), interpret=True)
    ref = jax.lax.sort((key, pay), num_keys=1, is_stable=False, dimension=0)
    assert np.array_equal(np.asarray(got[0]), np.asarray(ref[0]))

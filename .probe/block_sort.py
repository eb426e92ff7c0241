"""Staged bitonic co-sort: a Pallas alternative to the cell-list build's
multi-operand `lax.sort` (GridConfig.pallas_sort).

STATUS — measured NEGATIVE result (r3, real v5e, device-rate, 1M x 14
operands): this staged sort loses to lax.sort by ~12 ms, and a clean
re-measure (BENCH_NOTES "CORRECTION") puts lax.sort itself at only
~1.0 ms — XLA's TPU sort lowering is already well staged (the design
premise of one-HBM-round-trip-per-stage would need >HBM bandwidth to
explain the measured time) and payload-insensitive (2 -> 14 operands
costs ~nothing), while this module's VMEM-resident compare-exchange
passes run far below VPU peak. Sort-permutation-then-gather loses too
(TPU gathers: ~1.5 ns/element). Kept (default OFF) as a tested, exact
baseline for future multi-pass sort work; see BENCH_NOTES "Pallas sort
probe" + its CORRECTION section for both the polluted and clean probe
matrices.

The network itself is TPU-friendly (no per-lane gathers — only
compare-exchanges at power-of-two distances, all expressible as rolls /
reshapes + selects). This module runs the standard network, staged:

  * one Pallas pass locally sorts VMEM-resident blocks of `block_elems`
    (all k <= B stages — the majority of the network's stage-visits —
    touch HBM once);
  * for each k > B: the j >= B cross-block stages run as plain XLA
    elementwise passes (reshape + select fuses into ~one HBM pass per
    stage — these are the few stages whose exchange distance genuinely
    exceeds a block);
  * the j < B tail of each k runs as one more Pallas block pass.

HBM passes: 1 + sum_{k>B}(log2(k/B) + 1) instead of ~log2(N)^2/2.

Inside a block ([BR, LANE] f32/i32, element e = row*LANE + lane):
  * exchange distance j >= LANE pairs rows r and r^(j/LANE): a static
    reshape [G, 2, dr, LANE] exposes partners as adjacent slabs — two
    selects per operand, no data movement;
  * j < LANE pairs lanes l and l^j: partners via two static lane rolls
    (pltpu.roll) + an iota select;
  * the ascending/descending direction of element e at merge size k is
    bit k of e — a lane-iota mask (k < LANE), a row-iota mask
    (LANE <= k < B), or a per-block scalar ((g*B) & k, k >= B).

Exactness: pure compare-exchange on the int32/f32 operands — the output
is a permutation (same multiset, keys ascending), which is all
`lax.sort(..., is_stable=False)` guarantees too. Tie ORDER can differ
from XLA's; everything downstream is tie-order independent (cell-list
windows/guards are conservative; detection results are pair-set
semantics; tests/test_block_sort.py pins the contract).

Padding: N rounds up to a power of two; pad keys are INT32_MAX (above
the cell list's `num_ids` dead-object sentinel), so pads sort strictly
last and slicing [:N] recovers exactly the input multiset.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

LANE = 128
# default Pallas block: 2^15 elements = 256 storage rows. VMEM at 14
# operands: 14 * 256 * 128 * 4 B = 1.8 MB of scratch (plus compiler
# temporaries) — comfortably inside the ~16 MB budget; the local pass
# then covers 120 of the 210 stage-visits of a 2^20 network in one
# HBM round-trip.
BLOCK_ELEMS = int(os.environ.get("TPU_COLLIDE_SORT_BLOCK", str(1 << 15)))
# below this the staging machinery cannot beat one XLA sort call
_MIN_PALLAS_ELEMS = 1 << 14
# Max bitonic stages unrolled into ONE pallas_call. The full 2^15-block
# local prefix is 120 stages; unrolling all of them (x ~14 operands)
# built an MLIR program that got the remote Mosaic compile helper
# OOM-killed (SIGKILL — same failure class as the k=32 slot limit,
# CLAUDE.md). Chunking trades a few extra HBM round-trips (each ~an
# elementwise pass) for bounded per-kernel program size; the pass count
# is still ~an order of magnitude under XLA's one-pass-per-stage sort.
MAX_STAGES_PER_PASS = int(os.environ.get("TPU_COLLIDE_SORT_STAGES", "40"))


def _ceil_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def _key_sentinel(dtype):
    if jnp.issubdtype(dtype, jnp.integer):
        return jnp.iinfo(dtype).max
    return jnp.asarray(jnp.inf, dtype)


def _cmpex_rows(xs, dr: int, asc, BR: int):
    """Compare-exchange rows r <-> r + dr for r in even dr-slabs (the
    element-XOR-j pairing at j = dr*LANE), direction `asc` (bool scalar
    or [G,1,1,1] mask). xs: list of [BR, LANE] values, xs[0] = key."""
    G = BR // (2 * dr)
    key = xs[0].reshape(G, 2, dr, LANE)
    a_k, b_k = key[:, 0], key[:, 1]
    # a is the lower element of each pair: swap iff out of order for the
    # direction (ties keep — consistent across operands by construction).
    # NB pure i1 logical ops: Mosaic cannot lower selects/equality ON
    # bool-valued operands ("Unsupported target bitwidth for truncation").
    swap = (asc & (a_k > b_k)) | (~asc & (a_k < b_k))   # [G, dr, LANE]
    out = []
    for x in xs:
        v = x.reshape(G, 2, dr, LANE)
        a, b = v[:, 0], v[:, 1]
        na = jnp.where(swap, b, a)
        nb = jnp.where(swap, a, b)
        out.append(jnp.stack([na, nb], axis=1).reshape(BR, LANE))
    return out


def _cmpex_lanes(xs, j: int, asc, lane_iota):
    """Compare-exchange lanes l <-> l^j (j < LANE) in every row,
    direction `asc` (scalar bool or broadcastable row mask)."""
    is_lo = (lane_iota & j) == 0                  # [1, LANE]
    fwd = LANE - j                                # roll shifts must be >= 0
    key = xs[0]
    pk = jnp.where(is_lo, pltpu.roll(key, fwd, axis=1),
                   pltpu.roll(key, j, axis=1))
    # i1-only logic (no bool selects/equality — Mosaic trunc limitation)
    want_min = ~(is_lo ^ asc)                     # broadcasts either form
    take = (want_min & (pk < key)) | (~want_min & (pk > key))
    out = []
    for x in xs:
        p = jnp.where(is_lo, pltpu.roll(x, fwd, axis=1),
                      pltpu.roll(x, j, axis=1))
        out.append(jnp.where(take, p, x))
    return out


def _stage(xs, j: int, k: int, g, B: int, BR: int, row_iota, lane_iota):
    """One bitonic stage (merge size k, exchange distance j) on a block's
    values; g = traced block index (element offset g*B)."""
    if k >= B:
        asc = ((g * B) & k) == 0                  # traced scalar bool
    elif k >= LANE:
        asc = (row_iota & (k // LANE)) == 0       # [BR, 1]
    else:
        asc = (lane_iota & k) == 0                # [1, LANE]
    if j >= LANE:
        # row-space direction mask: reshape the row mask alongside when it
        # varies by row; scalars broadcast as-is
        if k >= B:
            asc_r = asc
        else:
            dr = j // LANE
            kr = k // LANE                        # >= 2*dr (j <= k/2)
            G = BR // (2 * dr)
            o = jax.lax.broadcasted_iota(jnp.int32, (G, 1, 1), 0)
            asc_r = ((o * (2 * dr)) & kr) == 0
        return _cmpex_rows(xs, j // LANE, asc_r, BR)
    return _cmpex_lanes(xs, j, asc, lane_iota)


def _block_kernel(*refs, n_ops: int, BR: int, stages: tuple):
    """One Pallas pass: DMA a block in, run `stages` (a static list of
    (j, k) pairs), DMA it back. In/out HBM buffers are aliased."""
    hbm = refs[:n_ops]
    outs = refs[n_ops:2 * n_ops]
    scratch = refs[2 * n_ops:2 * n_ops + n_ops]
    sem_in, sem_out = refs[2 * n_ops + n_ops:]
    g = pl.program_id(0)
    base = pl.multiple_of(g * BR, 8)
    for f in range(n_ops):
        pltpu.make_async_copy(hbm[f].at[pl.ds(base, BR), :], scratch[f],
                              sem_in.at[f]).start()
    for f in range(n_ops):
        pltpu.make_async_copy(hbm[f].at[pl.ds(base, BR), :], scratch[f],
                              sem_in.at[f]).wait()
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (BR, 1), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    xs = [scratch[f][:, :] for f in range(n_ops)]
    for (j, k) in stages:
        xs = _stage(xs, j, k, g, BR * LANE, BR, row_iota, lane_iota)
    for f in range(n_ops):
        scratch[f][:, :] = xs[f]
    for f in range(n_ops):
        pltpu.make_async_copy(scratch[f], outs[f].at[pl.ds(base, BR), :],
                              sem_out.at[f]).start()
    for f in range(n_ops):
        pltpu.make_async_copy(scratch[f], outs[f].at[pl.ds(base, BR), :],
                              sem_out.at[f]).wait()


def _block_pass(ops2d, stages: tuple, interpret: bool,
                max_stages: int | None = None):
    """Run `stages` over all blocks as aliased in-place Pallas passes,
    at most `max_stages` bitonic stages unrolled per pallas_call (see
    MAX_STAGES_PER_PASS). Chunking is exact: these stages never exchange
    across block boundaries, so consecutive passes compose to the same
    network."""
    ms = max_stages or MAX_STAGES_PER_PASS
    if len(stages) > ms:
        n_chunks = -(-len(stages) // ms)
        per = -(-len(stages) // n_chunks)
        for i in range(0, len(stages), per):
            ops2d = _one_block_pass(ops2d, stages[i:i + per], interpret)
        return ops2d
    return _one_block_pass(ops2d, stages, interpret)


def _one_block_pass(ops2d, stages: tuple, interpret: bool):
    n_ops = len(ops2d)
    R = ops2d[0].shape[0]
    BR = min(R, BLOCK_ELEMS // LANE)
    kern = functools.partial(_block_kernel, n_ops=n_ops, BR=BR,
                             stages=stages)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(R // BR,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * n_ops,
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * n_ops,
        scratch_shapes=(
            [pltpu.VMEM((BR, LANE), o.dtype) for o in ops2d]
            + [pltpu.SemaphoreType.DMA((n_ops,)),
               pltpu.SemaphoreType.DMA((n_ops,))]),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(o.shape, o.dtype) for o in ops2d],
        input_output_aliases={i: i for i in range(n_ops)},
        interpret=interpret,
    )(*ops2d)


def _xla_stage(ops, j: int, k: int):
    """One cross-block stage as plain XLA elementwise ops (fuses to ~one
    HBM pass): pairs e <-> e^j over flat [Npad] operands."""
    n = ops[0].shape[0]
    G = n // (2 * j)
    key = ops[0].reshape(G, 2, j)
    a_k, b_k = key[:, 0], key[:, 1]
    o = jnp.arange(G, dtype=jnp.int32)[:, None]
    asc = ((o * (2 * j)) & k) == 0
    swap = jnp.where(asc, a_k > b_k, a_k < b_k)
    out = []
    for x in ops:
        v = x.reshape(G, 2, j)
        a, b = v[:, 0], v[:, 1]
        na = jnp.where(swap, b, a)
        nb = jnp.where(swap, a, b)
        out.append(jnp.stack([na, nb], axis=1).reshape(n))
    return out


def local_stages(B: int) -> tuple:
    """The full intra-block prefix of the network: k = 2..B."""
    out = []
    k = 2
    while k <= B:
        j = k // 2
        while j >= 1:
            out.append((j, k))
            j //= 2
        k *= 2
    return tuple(out)


def tail_stages(B: int, k: int) -> tuple:
    """The intra-block tail of merge size k (> B): j = B/2..1."""
    out = []
    j = B // 2
    while j >= 1:
        out.append((j, k))
        j //= 2
    return tuple(out)


def co_sort(ops, interpret: bool = False, block_elems: int | None = None,
            force: bool = False):
    """Sort every [N] operand by ops[0] ascending (drop-in for
    `lax.sort(ops, num_keys=1, is_stable=False, dimension=0)` up to tie
    order). Falls back to lax.sort for small N unless `force`."""
    n = int(ops[0].shape[0])
    npad = _ceil_pow2(n)
    B = block_elems or BLOCK_ELEMS
    if npad < max(2 * LANE * 8, B if force else _MIN_PALLAS_ELEMS):
        return jax.lax.sort(ops, num_keys=1, is_stable=False, dimension=0)
    B = min(B, npad)
    assert B % (LANE * 8) == 0, "block_elems must be a multiple of 1024"

    key = ops[0]
    sent = _key_sentinel(key.dtype)
    padded = [jnp.pad(key, (0, npad - n), constant_values=sent)]
    padded += [jnp.pad(x, (0, npad - n)) for x in ops[1:]]
    ops2d = [x.reshape(-1, LANE) for x in padded]

    ops2d = _block_pass(ops2d, local_stages(B), interpret)
    k = 2 * B
    while k <= npad:
        flat = [x.reshape(-1) for x in ops2d]
        j = k // 2
        while j >= B:
            flat = _xla_stage(flat, j, k)
            j //= 2
        ops2d = [x.reshape(-1, LANE) for x in flat]
        ops2d = _block_pass(ops2d, tail_stages(B, k), interpret)
        k *= 2
    return tuple(x.reshape(-1)[:n] for x in ops2d)

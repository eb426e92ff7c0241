"""Fused broad+narrow-phase Pallas kernel: per-object top-k pair slots.

Per TILE-object tile (8 storage rows of LANE), this kernel does what the
XLA path spreads over gather_candidates + detect_rows (SURVEY.md §7 stage
4): DMA the tile's contiguous candidate windows (cell_list.py) from HBM
into VMEM and run the detection math on [LANE own x LANE cand] pair blocks
entirely on-chip. No [N, K] candidate arrays ever touch HBM and no
irregular gathers exist.

Output design (round 2): instead of reducing full pair payloads per object,
each object keeps K SLOTS of (key, candidate-sorted-index) ranked by key,
plus three counters. The payload (ttc/dist/col_pos/...) for the few pairs
that actually surface as alerts is recomputed afterwards in XLA by
gathering the candidate's fields from the already-sorted cell-list arrays
(kernels/refine.py) — slots are 2 numbers, not 8, so the kernel does less
work per block than the round-1 best-pair reduction while giving EXACT
scene-alert parity whenever no object has more than K qualifying pairs
(overflow is counted, never silent).

Key packing (mode="hits", fast stage-3):
    qualifying hit (risk >= risk_low):  key = 2*priority + risk  (>= 0)
    sub-threshold hit:                  key = risk - 2           ([-2, -1.7))
    no hit / padding:                   key = -3
2*priority + risk is EXACTLY the scene ranking key used by the XLA alert
extractor (alerts/extract.py), so a scene top-A over raw slot keys equals
the XLA scene selection; qualifying pairs always outrank sub-threshold ones
so none is evicted while count_qualifying <= K.

Slots physically store a SECOND packing that makes top-k extraction one
reduce per iteration: combined = round(key*KEY_Q)*LANE + lane_column — an
exact f32 integer (|combined| < 2^23), unique per block column, ordered
lexicographically by (quantized key, column). The block max IS the best
(key, column) pair; masking the extracted element is an exact value
compare; and the column rides along for free. Ranking granularity is
1/KEY_Q = 1.22e-4 in key units — selection-order noise only; alert VALUES
are recomputed exactly in the refine pass. Decode: col = combined mod
LANE, key = (combined div LANE)/KEY_Q, risk = key - 2*floor(key/2),
sign(combined) == qualifying (kernels/refine.py decode_slot).

mode="survivors" (precise stage-3 support, reference
collision_detection.py:296-342): slots hold stage-2 survivors ranked by
closest-approach proximity, key = 1 - d_closest^2/safe^2 in [0, 1]; the
constant-acceleration sampled sweep then runs in XLA on the compacted
survivor list (detect/pipeline._precise_sweep), which is how 'precise'
semantics scale past the chunked-XLA path.

Counters: pairs checked (stage-1 pass: alive, non-self, within search
radius — the cross-backend `num_pairs_checked` definition) is a SCENE
total, accumulated as a sublane-reduced broadcast (every row of the
counter buffer carries the same partial; fused_topk divides the buffer sum
by ROWS — ~2x cheaper per block than a per-own-row RMW, measured). Pairs
emitted-class (hits / survivors) and qualifying hits (risk >= risk_low;
== emitted in survivor mode) stay per object — the alert-overflow
accounting needs them row-accurate.

Loop nest per tile:   window (one per static brow shift: (band +-1) x
                      (z +-1) — 1 in 2D unbanded, 3 in 3D unbanded, up to
                      9 banded; disjoint brow ranges)
                    -> own storage row (8)
                    -> EXACTLY the candidate storage rows that own row needs
Each own row's candidate span ([its brows +-1, per shift] mapped through
the prefetched brow -> sorted-element-start table) is computed in SMEM
scalars, so there is no per-row adjacency branching at all; an x-overlap
pl.when prunes the remaining far blocks — with the banded layout
(cell_list.auto_band_cells) rows are ~square patches, so this row-granular
pruning removes most dead pair math (the 1M step's dominant cost).

Window DMAs are DOUBLE-BUFFERED: the window loop unrolls statically (the
shift list is static) so the buffer slot is a python parity bit, and
window w+1's 14-field DMA is issued before window w's compute — the
probe-measured ~28 ms of DMA wait at 1M overlaps block math.

Mosaic constraints honored (found empirically, see repo history): HBM DMA
slices are 2D with 8-aligned dynamic row starts hinted via pl.multiple_of;
VMEM scratch is only ever read as FULL dynamically-indexed rows (dynamic 1D
offsets and lane sub-slices of dynamic rows crash the compiler); DMA
endpoints are whole buffers or aligned slices; accumulators live in VMEM
scratch because lax.cond with vector-carried values SIGABRTs the compiler
(register-carried accumulators were tried and reverted).
"""
from __future__ import annotations

import functools
import os

# Ablation instrumentation (perf attribution on real hardware, BENCH_NOTES
# r3 "kernel ablation"): "noblocks" keeps the full loop/guard/DMA skeleton
# but replaces every pair-block body with one tiny RMW; "s1" additionally
# runs the candidate reads + stage-1 math + its reduce. Results are
# MEANINGLESS under ablation — measurement only, never set in production.
_ABLATE = os.environ.get("TPU_COLLIDE_ABLATE", "")
# Experiment (exact semantics, measured LOSS): run the emit tail
# UNCONDITIONALLY on stage-2-live blocks instead of behind the cmax
# guard - removes the two emit scalar syncs per firing block; hit-less
# survivor blocks pay a no-op insert instead (empty-slot noise stays
# below PACKED_OCC_MIN, the counter adds zero - both already-tolerated
# behaviors). 1M-3D measured 213.1 ms vs 205-208 gated (BENCH_NOTES):
# the guard earns its syncs. Kept env-gated for other-density retries.
_EMIT_NOGATE = os.environ.get("TPU_COLLIDE_EMIT_NOGATE", "") == "1"
# DEFAULT-ON (exact semantics): a THIRD sparsity tier in the emit switch —
# blocks whose max per-own emit count is exactly 2 extract 2 rounds
# instead of all k. The tier branches ride the already-materialized cmax
# scalar (no additional vector->scalar sync); exactness follows the same
# argument as the existing 1-tier (every row's emits <= cmax, surplus
# extractions are the tolerated no-op inserts of non-emitted maxima).
# Measured on the real chip, bit-identical results both configs
# (BENCH_NOTES "1M-3D BELOW 200 ms"): 100k-2D k=8 23.27 -> 20.80 ms,
# 1M-3D k=4 199.82 -> 198.93 ms. TPU_COLLIDE_EMIT_MIDTIER=0 disables.
_EMIT_MIDTIER = os.environ.get("TPU_COLLIDE_EMIT_MIDTIER", "1") == "1"

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_collide.core.config import SystemConfig
from tpu_collide.kernels.cell_list import CellList, TILE, LANE, FIELD_NAMES

NF = len(FIELD_NAMES)   # 14
ROWS = TILE // LANE     # 8 own storage rows per tile
_BIG = 3.0e38
KEY_NONE = -3.0         # slot/init key for "nothing here"
KEY_SUB = -2.0          # sub-threshold hits live at risk + KEY_SUB
KEY_Q = 8192.0          # key quantizer for the packed slot encoding
PACKED_NONE = KEY_NONE * KEY_Q * LANE   # packed form of an empty slot
# slots strictly above this hold a real pair (the lowest emitted key is
# KEY_SUB + 0 risk); empty slots sit at PACKED_NONE (+ column noise from
# no-op insertions of non-emitted block maxima)
PACKED_OCC_MIN = KEY_SUB * KEY_Q * LANE - 1.0
# per-object emitted/qualifying counters pack into ONE buffer (one RMW per
# firing block instead of two): value = emitted * CNT_PACK + qualifying.
# Each half SATURATES at CNT_MAX (the accumulate clamps both components) —
# exact below it, and a saturated qualifying count still FAILS the
# alert_overflow certificate (CNT_MAX >> k <= 16), so saturation can never
# falsely certify completeness (a plain wrap at CNT_PACK could: 4100 mod
# 4096 = 4 <= k would read as "fits in slots").
CNT_PACK = 4096.0
CNT_MAX = 2047.0

(_X, _Y, _Z, _VX, _VY, _VZ, _AX, _AY, _AZ,
 _SIZE, _HEAD, _TYPE, _OID, _ROW) = range(NF)


def _kernel(w_rw_ref, w_rb_a_ref, w_rb_b_ref,
            row_rb_a_ref, row_rb_b_ref, row_xa_ref, row_xb_ref,
            row_xa_w_ref, row_xb_w_ref,
            cr_start_ref, pred_ref,
            *refs,
            cfg: SystemConfig, window_rows: int, shifts: tuple,
            tables_packed: bool, k: int, emit: str, sub_steps: int = 0,
            wide_oid: bool = False, cand_lanes: int = LANE):
    n_windows = len(shifts)
    n_out = 2 * k + 2
    # candidate-row width: pair blocks are [LANE own x CL cand]; the block
    # loop walks CL-lane candidate rows (GridConfig.cand_lanes), amortizing
    # the per-iteration loop/branch/sync machinery over `group` storage
    # rows at the cost of group-granular x pruning. window_rows, window
    # starts (w_rw) and the wide x-guard tables are all in CL-row units;
    # the slot key quantizer rescales (kq * CL invariant) so the packed
    # slot constants and ordering are unchanged.
    CL = cand_lanes
    kq = KEY_Q * (LANE / CL)      # exact: KEY_Q and CL are powers of two
    # wide_oid carries the oid hi-half as fields[NF]; predict mode carries
    # the trajectory class as the LAST sorted field; pred_ref = [offset_s,
    # brow_widen, max_disp_m] scalars (zeros in the detection modes)
    n_wide = 1 if wide_oid else 0
    NFK = NF + n_wide + (1 if emit == "predict" else 0)
    _HI = NF                      # oid hi-half field index (wide mode)
    _CLS = NF + n_wide            # trajectory-class field index (predict)
    # 2D worlds: z/vz/az are identically 0 (cell_list zero-fills them and
    # drops their sort operands) — skip their DMAs and compile out their
    # block math. The oid field(s) are skipped TOO: pair identity inside
    # the kernel is the INDEX diagonal (each object occupies exactly one
    # sorted slot — halo mirrors are copies of *other* shards' objects, so
    # no object appears twice in one shard's extended state), which costs
    # one static-mask AND instead of a [LANE, LANE] oid compare and frees
    # the oid/hi window DMAs; refine re-checks identity on decoded oids.
    flat2d = not cfg.world.is_3d
    from tpu_collide.kernels.cell_list import Z_FIELD_IDX
    skip_f = set(Z_FIELD_IDX) if flat2d else set()
    skip_f.add(_OID)
    if wide_oid:
        skip_f.add(_HI)
    skip_f = frozenset(skip_f)
    field_ids = [f for f in range(NFK) if f not in skip_f]
    hbm = refs[:NFK]                       # [R, LANE] views (own-tile DMA)
    hbm_w = refs[NFK:2 * NFK]              # [R/group, CL] views (windows)
    outs = refs[2 * NFK:2 * NFK + n_out]
    rest = refs[2 * NFK + n_out:]
    own = rest[:NFK]                       # NFK x VMEM (ROWS, LANE)
    win = rest[NFK:3 * NFK]                # 2 x NFK VMEM (window_rows, CL)
    okey = rest[3 * NFK:3 * NFK + k]       # k x VMEM (ROWS, LANE) slot keys
    oidx = rest[3 * NFK + k:3 * NFK + 2 * k]  # k x VMEM slot cand indices
    # counters: [0] scene-total stage-1 checked (broadcast-accumulated;
    # compiled out when det.count_checked is False), [1] PACKED per-object
    # emitted*CNT_PACK + qualifying — one RMW instead of two (exact while
    # per-object emitted <= CNT_MAX; beyond that the certificate has long
    # failed anyway since qualifying > k)
    ocnt = rest[3 * NFK + 2 * k:3 * NFK + 2 * k + 2]
    sem_own, sem_win, sem_out = rest[3 * NFK + n_out:]
    det = cfg.detect
    al = cfg.alerts
    t = pl.program_id(0)
    t_off = pred_ref[0]                    # prediction offset (s)
    widen_i = pred_ref[1].astype(jnp.int32)
    max_disp = pred_ref[2]

    base = pl.multiple_of(t * ROWS, ROWS)
    for f in field_ids:
        pltpu.make_async_copy(hbm[f].at[pl.ds(base, ROWS), :],
                              own[f], sem_own.at[f]).start()

    def win_meta(w):
        wrw = w_rw_ref[t * n_windows + w]
        return pl.multiple_of(wrw // 4096, ROWS), wrw % 4096

    def issue_window(w, slot):
        """Start the window-w DMA into buffer `slot` (double buffering:
        window w+1 streams in while window w computes)."""
        wrow, wn = win_meta(w)

        @pl.when(wn > 0)
        def _():
            for f in field_ids:
                pltpu.make_async_copy(
                    hbm_w[f].at[pl.ds(wrow, window_rows), :],
                    win[slot * NFK + f], sem_win.at[slot * NFK + f]).start()

    issue_window(0, 0)
    for f in field_ids:
        pltpu.make_async_copy(hbm[f].at[pl.ds(base, ROWS), :],
                              own[f], sem_own.at[f]).wait()

    zero = jnp.zeros((ROWS, LANE), jnp.float32)
    for j in range(k):
        okey[j][:, :] = zero + PACKED_NONE
        oidx[j][:, :] = zero - 1.0
    # ocnt[0] (scene-total checked) is CL lanes wide: its accumulate is a
    # sublane-reduced broadcast of the [LANE, CL] block, and the total is
    # layout-independent (buffer sum / ROWS)
    ocnt[0][:, :] = jnp.zeros((ROWS, CL), jnp.float32)
    ocnt[1][:, :] = zero

    def s3(ab, c):
        """ab + c where c is an optional z term (None in 2D worlds —
        compiled out instead of multiplying by zero)."""
        return ab if c is None else ab + c

    conv = 1.0 if det.convention == "physical" else -1.0
    r_max = det.search_radius
    r2_max = r_max * r_max
    dtt = det.time_step
    t_max = det.time_window - det.time_step + 1e-6
    wlo_x = cfg.world.lo[0]       # packed x-guard values are lo-relative
    # tpu.iota only produces integers; cast to f32 for the select math
    col_iota = jax.lax.broadcasted_iota(
        jnp.int32, (LANE, CL), 1).astype(jnp.float32)
    # index self-test: pair (i, j) is the SAME object exactly when its
    # global sorted indices coincide: go*LANE + i == gr*CL + j. The iota
    # difference is static; one scalar add + compare per block resolves it
    # (see skip_f note above)
    diag_base = (jax.lax.broadcasted_iota(jnp.int32, (LANE, CL), 0)
                 - jax.lax.broadcasted_iota(jnp.int32, (LANE, CL), 1))

    def unpack_rb(a_ref, b_ref, i):
        """(brow_lo, brow_hi) guard pair at index i (packed or split)."""
        if tables_packed:
            from tpu_collide.kernels.cell_list import ROW_PACK
            v = a_ref[i]
            return v // ROW_PACK, v % ROW_PACK - 2
        return a_ref[i], b_ref[i]

    if tables_packed:
        def read_x(i):
            """(x_lo, x_hi) f32 from the packed, lo-relative,
            meter-quantized guard scalar (conservative bounds)."""
            from tpu_collide.kernels.cell_list import X_PACK
            v = row_xa_ref[i]
            return ((v // X_PACK).astype(jnp.float32) + wlo_x,
                    (v % X_PACK - 1).astype(jnp.float32) + wlo_x)

    else:
        def read_x(i):
            """Raw f32 bounds — two SMEM reads, no scalar-core div/mod
            in the block loop (BENCH_NOTES r3 microprobe: the loop pays
            ~160 ns/row of scalar machinery even on x-pruned rows)."""
            return row_xa_ref[i], row_xb_ref[i]

    if CL == LANE:
        # candidate rows ARE storage rows; the wide refs are [1] dummies
        read_x_cand = read_x
    else:
        def read_x_cand(i):
            """Candidate-row bounds at CL-row granularity."""
            return row_xa_w_ref[i], row_xb_w_ref[i]

    def window_pass(w, slot):
        # window tables are flattened [T*W] (2D SMEM operands pad to 128
        # lanes and blow the 1 MB SMEM budget at large T)
        wi = t * n_windows + w
        wrow, wn = win_meta(w)
        rlo_i, rhi_i = unpack_rb(w_rb_a_ref, w_rb_b_ref, wi)
        wn_eff = jnp.minimum(wn, window_rows)
        wbuf = win[slot * NFK:(slot + 1) * NFK]

        def angle_f(s, c, ohead, chead):
            """Stage-4 sin(|heading_i - heading_j|) — 'product' form runs
            the transcendentals on the two 128-lane heading ROWS instead
            of the [LANE, LANE] block (pipeline._angle_factor identity;
            identical expression on the XLA side)."""
            if det.angle_form != "product":
                return jnp.sin(jnp.abs(ohead - chead))
            oh = own[_HEAD][s, :]
            ch = wbuf[_HEAD][c, :]
            sd = (jnp.sin(oh)[:, None] * jnp.cos(ch)[None, :]
                  - jnp.cos(oh)[:, None] * jnp.sin(ch)[None, :])
            return jnp.where(ohead >= chead, sd, -sd)

        @pl.when(wn > 0)
        def _():
            for f in field_ids:
                pltpu.make_async_copy(
                    hbm[f].at[pl.ds(wrow, window_rows), :],
                    wbuf[f], sem_win.at[slot * NFK + f]).wait()

            def sub_pass(s, _):
                go = base + s
                sr_lo, sr_hi = unpack_rb(row_rb_a_ref, row_rb_b_ref, go)
                ox_lo, ox_hi = read_x(go)
                o_ok = own[_ROW][s, :][:, None] >= 0.0   # row -1 = dead
                # z-component loads are None for 2D worlds; every z term
                # downstream is compiled out via the `s3` helper
                colv = lambda f: (None if f in skip_f
                                  else own[f][s, :][:, None])
                ox, oy, oz = colv(_X), colv(_Y), colv(_Z)
                ovx, ovy, ovz = colv(_VX), colv(_VY), colv(_VZ)
                oax, oay, oaz = colv(_AX), colv(_AY), colv(_AZ)
                osize, ohead = colv(_SIZE), colv(_HEAD)
                otype = colv(_TYPE)

                # exact candidate storage-row spans for this sub-block:
                # the brows [sr_lo-1, sr_hi+1] PLUS their shifted copies
                # (one per static shift: (band +-1) x (z +-1) deltas in
                # brow-id space; round-1 bug: the z shifts were missing, so
                # cross-z-layer candidates were only seen when a tile
                # happened to span a layer), chain-disjointified in shift
                # order so no candidate row is visited twice, clipped to
                # this window's range and mapped through the cr_start
                # table — no per-row adjacency branching
                tab_max = jnp.int32(cr_start_ref.shape[0] - 1)
                sa = sr_lo - 1 - widen_i
                sb = sr_hi + 1 + widen_i
                spans = []
                prev = None
                for sft in shifts:
                    s_lo = sa + sft
                    s_hi = sb + sft
                    if prev is not None:
                        s_lo = jnp.maximum(s_lo, prev + 1)
                        s_hi = jnp.maximum(s_hi, prev)
                    prev = s_hi
                    spans.append((s_lo, s_hi))

                def make_crow_pass(a_f, b_f):
                    # a_f/b_f: THIS span's cell-row bounds — the guard must
                    # be per-span (not per-window) because abutting spans
                    # can share a boundary storage row (cell-rows are not
                    # lane-aligned); a window-level guard would count its
                    # candidates twice
                    def crow_pass(c, _):
                        gr = wrow + c
                        cx_lo, cx_hi = read_x_cand(gr)

                        def insert_cands(kb, ib, cands):
                            """Insert (m_v, i_v) candidates into the
                            descending slot lists (pure registers)."""
                            for m_v, i_v in cands:
                                g = [m_v > kb[j] for j in range(k)]
                                nkb, nib = [], []
                                for j in range(k):
                                    at_j = g[j] if j == 0 else (
                                        g[j] & ~g[j - 1])
                                    if j == 0:
                                        nk = jnp.where(at_j, m_v, kb[0])
                                        ni = jnp.where(at_j, i_v, ib[0])
                                    else:
                                        nk = jnp.where(
                                            at_j, m_v,
                                            jnp.where(g[j - 1],
                                                      kb[j - 1], kb[j]))
                                        ni = jnp.where(
                                            at_j, i_v,
                                            jnp.where(g[j - 1],
                                                      ib[j - 1], ib[j]))
                                    nkb.append(nk)
                                    nib.append(ni)
                                kb, ib = nkb, nib
                            return kb, ib

                        def extract(keym, n_iter):
                            """Top-n_iter (packed key, cand index) per own
                            lane. The packed encoding makes each iteration
                            ONE reduce: block values are unique integers
                            ordered by (quantized key, column), so the max
                            IS the best pair, masking is an exact value
                            compare, and the column decodes with a mod."""
                            gbase = (gr * CL).astype(jnp.float32)
                            cm = (jnp.round(keym * kq) * CL
                                  + col_iota)
                            out = []
                            for _t in range(n_iter):
                                m2 = jnp.max(cm, axis=1,
                                             keepdims=True)
                                if _t + 1 < n_iter:
                                    cm = jnp.where(cm == m2, -_BIG,
                                                   cm)
                                m_v = m2[:, 0]
                                col = m_v - jnp.floor(
                                    m_v * (1.0 / CL)) * CL
                                out.append((m_v, gbase + col))
                            return out

                        def emit_slots(key, emitted, qual):
                            """Shared tail: packed emitted/qualifying
                            counter + sparsity-switched top-k insertion."""
                            if _ABLATE == "noemit":
                                ocnt[1][0:1, :] = ocnt[1][0:1, :] + jnp.max(
                                    jnp.where(emitted, 1.0, 0.0))
                                return
                            emitted_row = jnp.sum(
                                jnp.where(emitted, 1.0, 0.0), axis=1)
                            if _EMIT_NOGATE:
                                old = ocnt[1][s, :]
                                e_old = jnp.floor(old * (1.0 / CNT_PACK))
                                q_old = old - e_old * CNT_PACK
                                e_new = jnp.minimum(e_old + emitted_row,
                                                    CNT_MAX)
                                q_new = jnp.minimum(
                                    q_old + jnp.sum(
                                        jnp.where(qual, 1.0, 0.0), axis=1),
                                    CNT_MAX)
                                ocnt[1][pl.ds(s, 1), :] = (
                                    e_new * CNT_PACK + q_new)[None, :]
                                kb = [okey[j][s, :] for j in range(k)]
                                ib = [oidx[j][s, :] for j in range(k)]
                                nkb, nib = insert_cands(
                                    kb, ib, extract(key, k))
                                for j in range(k):
                                    okey[j][pl.ds(s, 1), :] = (
                                        nkb[j][None, :])
                                    oidx[j][pl.ds(s, 1), :] = (
                                        nib[j][None, :])
                                return
                            cmax = jnp.max(emitted_row)

                            @pl.when(cmax > 0.5)
                            def _():
                                if _ABLATE != "emitnc":
                                    old = ocnt[1][s, :]
                                    e_old = jnp.floor(old * (1.0 / CNT_PACK))
                                    q_old = old - e_old * CNT_PACK
                                    e_new = jnp.minimum(e_old + emitted_row,
                                                        CNT_MAX)
                                    q_new = jnp.minimum(
                                        q_old + jnp.sum(
                                            jnp.where(qual, 1.0, 0.0),
                                            axis=1),
                                        CNT_MAX)
                                    ocnt[1][pl.ds(s, 1), :] = (
                                        e_new * CNT_PACK + q_new)[None, :]
                                kb = [okey[j][s, :] for j in range(k)]
                                ib = [oidx[j][s, :] for j in range(k)]

                                def write_slots(nkb, nib):
                                    if _ABLATE == "emitnw":
                                        acc = nkb[0] + nib[0]
                                        for j in range(1, k):
                                            acc = acc + nkb[j] + nib[j]
                                        okey[0][pl.ds(s, 1), :] = \
                                            acc[None, :]
                                        return
                                    for j in range(k):
                                        okey[j][pl.ds(s, 1), :] = \
                                            nkb[j][None, :]
                                        oidx[j][pl.ds(s, 1), :] = \
                                            nib[j][None, :]

                                @pl.when(cmax <= 1.5)
                                def _():
                                    write_slots(*insert_cands(
                                        kb, ib, extract(key, 1)))

                                if _EMIT_MIDTIER and k > 2:
                                    # power-of-two tier ladder (r4): blocks
                                    # extract the smallest power-of-two
                                    # rounds >= their cmax instead of all k
                                    # — the certified k=8/16 operating
                                    # points pay near-k=4 emit cost on the
                                    # dominant cmax<=4 blocks. Exactness:
                                    # identical argument to the 2-tier
                                    # (n_iter >= cmax extracts every row's
                                    # emits; surplus extractions are the
                                    # tolerated no-op inserts). All tier
                                    # branches ride the ONE materialized
                                    # cmax scalar — no extra vector->scalar
                                    # sync.
                                    tiers = [2]
                                    while tiers[-1] * 2 < k:
                                        tiers.append(tiers[-1] * 2)
                                    prev = 1.5
                                    for n_it in tiers:
                                        @pl.when((cmax > prev)
                                                 & (cmax <= n_it + 0.5))
                                        def _(n_it=n_it):
                                            write_slots(*insert_cands(
                                                kb, ib, extract(key, n_it)))
                                        prev = n_it + 0.5

                                    @pl.when(cmax > prev)
                                    def _():
                                        write_slots(*insert_cands(
                                            kb, ib, extract(key, k)))
                                else:
                                    @pl.when(cmax > 1.5)
                                    def _():
                                        write_slots(*insert_cands(
                                            kb, ib, extract(key, k)))

                        # x-overlap guard (sorted order makes rows x-coherent)
                        @pl.when((cx_lo <= ox_hi + r_max + max_disp)
                                 & (cx_hi >= ox_lo - r_max - max_disp))
                        def _():
                            if _ABLATE == "noblocks":
                                ocnt[0][0:1, :] = ocnt[0][0:1, :] + 1.0
                                return
                            rowv = lambda f: (None if f in skip_f
                                              else wbuf[f][c, :][None, :])
                            cx, cy, cz = rowv(_X), rowv(_Y), rowv(_Z)
                            cvx, cvy, cvz = rowv(_VX), rowv(_VY), rowv(_VZ)
                            cax, cay, caz = rowv(_AX), rowv(_AY), rowv(_AZ)
                            csize, chead = rowv(_SIZE), rowv(_HEAD)
                            ctype = rowv(_TYPE)
                            # pair identity = index diagonal (one sorted
                            # slot per object; see skip_f note)
                            not_self = (diag_base
                                        + (go * LANE - gr * CL)) != 0
                            # span bounds are clipped to >= 0, so the
                            # brow range test alone rejects dead/padding
                            # rows (their brow is -1)
                            crow = rowv(_ROW)
                            c_ok = (crow >= a_f) & (crow <= b_f)

                            if emit == "predict":
                                # own advanced by trajectory CLASS, exactly
                                # detect/predict._predicted_position;
                                # candidates stay CURRENT for the stage-1
                                # quirk (today's grid queried at tomorrow's
                                # position, reference :800-803)
                                ocls = colv(_CLS)
                                mv = jnp.where(ocls >= 0.5, 1.0, 0.0)
                                av = jnp.where(ocls >= 1.5, 1.0, 0.0)
                                t2h = 0.5 * t_off * t_off
                                px = ox + ovx * t_off * mv + oax * t2h * av
                                py = oy + ovy * t_off * mv + oay * t2h * av
                                pz = (None if flat2d else
                                      oz + ovz * t_off * mv + oaz * t2h * av)
                                dqx, dqy = cx - px, cy - py
                                dqz = None if flat2d else cz - pz
                                dq2 = s3(dqx * dqx + dqy * dqy,
                                         None if flat2d else dqz * dqz)
                                ok1 = (c_ok & o_ok & not_self
                                       & (dq2 <= r2_max))
                                if det.count_checked:
                                    ocnt[0][:, :] = ocnt[0][:, :] + jnp.sum(
                                        jnp.where(ok1, 1.0, 0.0), axis=0,
                                        keepdims=True)
                                g1max = jnp.max(jnp.where(ok1, 1.0, 0.0))

                                @pl.when(g1max > 0.5)
                                def _():
                                    # candidate advanced const-accel
                                    # (reference :808-812); sampled
                                    # first-hit sweep over the 1 s
                                    # sub-window mirrors _precise_sweep
                                    # op-for-op
                                    acx = cx + cvx * t_off + cax * t2h
                                    acy = cy + cvy * t_off + cay * t2h
                                    sx, sy = acx - px, acy - py
                                    dvx = cvx - ovx
                                    dvy = cvy - ovy
                                    dax = cax - oax
                                    day = cay - oay
                                    if flat2d:
                                        sz = dvz = daz = None
                                    else:
                                        acz = cz + cvz * t_off + caz * t2h
                                        sz = acz - pz
                                        dvz = cvz - ovz
                                        daz = caz - oaz
                                    safe = ((osize + csize) * 0.5
                                            + det.safe_distance_base)
                                    hit = safe < 0.0
                                    t_hit = jnp.where(hit, 0.0, jnp.inf)
                                    d_hit = t_hit
                                    for kk in range(sub_steps):
                                        t_s = jnp.float32(kk) * jnp.float32(
                                            dtt)
                                        ddx = sx + dvx * t_s \
                                            + 0.5 * dax * t_s * t_s
                                        ddy = sy + dvy * t_s \
                                            + 0.5 * day * t_s * t_s
                                        ddz = (None if flat2d else
                                               sz + dvz * t_s
                                               + 0.5 * daz * t_s * t_s)
                                        d = jnp.sqrt(s3(
                                            ddx * ddx + ddy * ddy,
                                            None if flat2d else ddz * ddz))
                                        nh = (~hit) & (d <= safe)
                                        t_hit = jnp.where(nh, t_s, t_hit)
                                        d_hit = jnp.where(nh, d, d_hit)
                                        hit = hit | nh
                                    hit = hit & ok1
                                    rs2 = s3(dvx * dvx + dvy * dvy,
                                             None if flat2d else dvz * dvz)
                                    risk = (
                                        det.weight_distance
                                        * (1.0 - jnp.where(hit, d_hit, 0.0)
                                           / safe)
                                        + det.weight_time
                                        * (1.0 - jnp.minimum(
                                            1.0, jnp.where(hit, t_hit, 0.0)
                                            / det.max_warning_time))
                                        + det.weight_speed
                                        * jnp.minimum(
                                            1.0, jnp.sqrt(rs2)
                                            / det.max_relative_speed)
                                        + det.weight_angle
                                        * angle_f(s, c, ohead, chead)
                                        + det.weight_type
                                        * jnp.where(ctype == otype,
                                                    det.same_type_factor,
                                                    det.diff_type_factor))
                                    risk = jnp.clip(risk, 0.0, 1.0)
                                    key = jnp.where(hit, risk, KEY_NONE)
                                    emit_slots(key, hit, hit)
                                return

                            # stage 1: exact radius + alive + no self
                            # (z terms compiled out for 2D worlds — z/vz/az
                            # are identically 0 there, so results are exact)
                            dxp, dyp = cx - ox, cy - oy
                            dzp = None if flat2d else cz - oz
                            d2 = s3(dxp * dxp + dyp * dyp,
                                    None if flat2d else dzp * dzp)
                            ok1 = (c_ok & o_ok & not_self
                                   & (d2 <= r2_max))

                            if _ABLATE == "s1":
                                ocnt[0][:, :] = ocnt[0][:, :] + jnp.sum(
                                    jnp.where(ok1, 1.0, 0.0), axis=0,
                                    keepdims=True)
                                return

                            # Optional stage-1 gate (gate_stage1): skip stage-2,
                            # its counter add (zero for dead blocks — exact) and
                            # BOTH syncs when the block has no stage-1 hit at all.
                            def s2_body():
                                # stage 2: closest approach (const-accel distance at
                                # t*, reference collision_detection.py:229-294)
                                dvx, dvy = cvx - ovx, cvy - ovy
                                dvz = None if flat2d else cvz - ovz
                                rs2 = s3(dvx * dvx + dvy * dvy,
                                         None if flat2d else dvz * dvz)
                                dot = s3(dxp * dvx + dyp * dvy,
                                         None if flat2d else dzp * dvz)
                                rs2s = jnp.where(rs2 > 1e-12, rs2, 1.0)
                                ts = -(conv * dot) / rs2s
                                dax, day = cax - oax, cay - oay
                                daz = None if flat2d else caz - oaz
                                cdx = dxp + dvx * ts + 0.5 * dax * ts * ts
                                cdy = dyp + dvy * ts + 0.5 * day * ts * ts
                                cdz = (None if flat2d else
                                       dzp + dvz * ts + 0.5 * daz * ts * ts)
                                cd2 = s3(cdx * cdx + cdy * cdy,
                                         None if flat2d else cdz * cdz)
                                safe = ((osize + csize) * 0.5
                                        + det.safe_distance_base)
                                safe2 = safe * safe
                                ok2 = ok1 & ((rs2 >= det.min_relative_speed ** 2)
                                             & (ts >= 0.0) & (ts <= det.time_window)
                                             & (cd2 <= safe2))

                                # stage-1 counter: a sublane reduce +
                                # broadcast add (all ROWS rows get the same
                                # partial, so the scene total is the buffer
                                # sum / ROWS — exact in f32, and ~2x cheaper
                                # than the old per-own-row RMW, measured).
                                # Compiled out entirely by count_checked=False
                                # (~12 ms at 1M).
                                if det.count_checked:
                                    ocnt[0][:, :] = ocnt[0][:, :] + jnp.sum(
                                        jnp.where(ok1, 1.0, 0.0), axis=0,
                                        keepdims=True)

                                # Everything downstream — stage 3/4, priority,
                                # key packing, the remaining counters, slot
                                # insertion — only matters for stage-2
                                # SURVIVORS, the rare class. Gating the block
                                # on having any survivor skips ~half the block
                                # math most of the time at SPARSE densities
                                # (3D swarms) — a clear win despite the
                                # ~200 ns/block vector->scalar sync. At DENSE
                                # 2D configs nearly every block fires and the
                                # gate is pure overhead: gate_stage2=False
                                # compiles it out (results identical — the
                                # emit tail keeps its own guards).
                                def s34_body():
                                    if emit == "hits":
                                        # stage 3 (fast): first |p + v t| = safe
                                        # crossing, snapped to the dt lattice
                                        bq = 2.0 * dot
                                        cq = d2 - safe2
                                        disc = bq * bq - 4.0 * rs2 * cq
                                        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                                        t_en = (-bq - sq) / (2.0 * rs2s)
                                        t_ex = (-bq + sq) / (2.0 * rs2s)
                                        inside = cq <= 0.0
                                        t_fi = jnp.where(inside, 0.0,
                                                         jnp.maximum(t_en, 0.0))
                                        t_sn = jnp.ceil(t_fi / dtt - 1e-6) * dtt
                                        sok = inside | ((t_sn >= t_en - 1e-6)
                                                        & (t_sn <= t_ex + 1e-6))
                                        hit = (ok2 & (disc >= 0.0) & (rs2 > 1e-12)
                                               & sok & (t_sn <= t_max))
                                        t_hit = jnp.where(inside, 0.0, t_sn)
                                        hdx = dxp + dvx * t_hit
                                        hdy = dyp + dvy * t_hit
                                        hdz = (None if flat2d else
                                               dzp + dvz * t_hit)
                                        d_hit = jnp.sqrt(s3(
                                            hdx * hdx + hdy * hdy,
                                            None if flat2d else hdz * hdz))

                                        # stage 4: weighted risk
                                        risk = (
                                            det.weight_distance * (1.0 - d_hit / safe)
                                            + det.weight_time
                                            * (1.0 - jnp.minimum(
                                                1.0, t_hit / det.max_warning_time))
                                            + det.weight_speed
                                            * jnp.minimum(1.0, jnp.sqrt(rs2)
                                                          / det.max_relative_speed)
                                            + det.weight_angle
                                            * angle_f(s, c, ohead, chead)
                                            + det.weight_type
                                            * jnp.where(ctype == otype,
                                                        det.same_type_factor,
                                                        det.diff_type_factor))
                                        risk = jnp.clip(risk, 0.0, 1.0)

                                        # priority rules (warning_system.py:287-311) —
                                        # the packed key 2*prio + risk IS the XLA scene
                                        # ranking key (alerts/extract.py)
                                        crit = ((risk >= al.risk_high)
                                                & (t_hit < al.ttc_critical))
                                        high = ((risk >= al.risk_high)
                                                | (t_hit < al.ttc_high))
                                        med = risk >= al.risk_medium
                                        prio = jnp.where(
                                            crit, 3.0, jnp.where(high, 2.0,
                                                                 jnp.where(med, 1.0,
                                                                           0.0)))
                                        qual = hit & (risk >= al.risk_low)
                                        key = jnp.where(
                                            qual, 2.0 * prio + risk,
                                            jnp.where(hit, risk + KEY_SUB, KEY_NONE))
                                        emitted = hit
                                    else:
                                        # stage-2 survivors for the XLA precise sweep;
                                        # rank by closest-approach proximity
                                        key = jnp.where(ok2, 1.0 - cd2 / safe2,
                                                        KEY_NONE)
                                        emitted = ok2
                                        qual = ok2
                                    emit_slots(key, emitted, qual)

                                if det.gate_stage2:
                                    s2max = jnp.max(jnp.where(ok2, 1.0, 0.0))
                                    pl.when(s2max > 0.5)(s34_body)
                                else:
                                    s34_body()

                            if det.gate_stage1:
                                g1max = jnp.max(jnp.where(ok1, 1.0, 0.0))
                                pl.when(g1max > 0.5)(s2_body)
                            else:
                                s2_body()

                        return 0
                    return crow_pass

                for (slo, shi) in spans:
                    a = jnp.maximum(slo, rlo_i)
                    b = jnp.minimum(shi, rhi_i)
                    a_c = jnp.clip(a, 0, tab_max)
                    b_c = jnp.clip(b + 1, 0, tab_max)
                    # storage floor/ceil of a brow boundary from its sorted
                    # element index (one SMEM table serves both)
                    c_lo = jnp.clip(cr_start_ref[a_c] // CL - wrow,
                                    0, wn_eff)
                    c_hi = jnp.clip((cr_start_ref[b_c] + CL - 1) // CL
                                    - wrow, 0, wn_eff)
                    c_hi = jnp.where(b < a, c_lo, c_hi)
                    jax.lax.fori_loop(
                        c_lo, c_hi,
                        make_crow_pass(a.astype(jnp.float32),
                                       b.astype(jnp.float32)), 0)
                return 0

            jax.lax.fori_loop(0, ROWS, sub_pass, 0)

        return 0

    # windows unroll statically so the double-buffer slot is a python
    # int (scratch lists cannot be indexed by traced values); window w+1's
    # DMA is issued before window w computes
    for w in range(n_windows):
        if w + 1 < n_windows:
            issue_window(w + 1, (w + 1) % 2)
        window_pass(w, w % 2)

    bufs = list(okey) + list(oidx) + list(ocnt)
    for f in range(n_out):
        pltpu.make_async_copy(bufs[f],
                              outs[f].at[pl.ds(base, ROWS), :],
                              sem_out.at[f]).start()
    for f in range(n_out):
        pltpu.make_async_copy(bufs[f],
                              outs[f].at[pl.ds(base, ROWS), :],
                              sem_out.at[f]).wait()


def fused_topk(cl: CellList, cfg: SystemConfig, interpret: bool = False,
               mode: str = "hits", pred_params=None, k_slots: int = None,
               sub_steps: int = 0, idx_layout: str = "stacked"):
    """Run the kernel. N = num_tiles*TILE sorted-object slots; K slots each.

    idx_layout="slots" returns idx as the kernel's raw per-slot [N] f32
    buffers (a k-list, values exact integers) instead of the stacked
    [N, K] i32 — the axis-1 stack is a layout interleave and the astype
    converts all N*K entries, ~1.4 ms/step at 1M for a consumer that
    gathers only the top-A winners (trace copy.33/reshape.1383,
    results/profile_1m_r5.json); the fast scene path selects first and
    converts a entries instead.

    Returns (keys [N, K] f32 packed, idx [N, K] i32 candidate sorted index
    (-1 = empty slot), checked [] i32 SCENE-TOTAL stage-1 pairs (the kernel
    accumulates it broadcast across sublanes — a plain sum of the raw
    buffer is ROWS x the true count, corrected here; -1 when
    DetectionConfig.count_checked compiled it out), emitted [N] i32,
    qual [N] i32 — both ride ONE packed per-object counter buffer
    (emitted * CNT_PACK + qual, exact to CNT_MAX emitted/step).
    mode='hits' emits fast stage-3 hits; mode='survivors'
    emits stage-2 survivors for the XLA precise sweep. interpret=True uses
    the Pallas interpreter (CPU tests).

    mode='predict' (kernels/refine.fused_predict): the cell list must carry
    the trajectory class as fields[NF] (build_cell_list(extra=...)).
    pred_params = (offset_s, brow_widen, max_disp_m) traced scalars;
    sub_steps = sub-window sample count; slots rank by predicted risk."""
    assert mode in ("hits", "survivors", "predict")
    n_wide = 1 if cl.wide_oid else 0
    if mode == "predict":
        assert pred_params is not None and k_slots is not None
        assert cl.fields.shape[0] == NF + n_wide + 1, (
            "predict mode needs the trajectory-class extra field "
            "(build_cell_list(extra=cls))")
        k = k_slots
    else:
        k = (cfg.alerts.max_alerts_per_object if mode == "hits"
             else cfg.detect.survivor_k)
    assert k >= 1
    # k = 32 crashes the Mosaic compiler with no diagnostic (remote
    # tpu_compile_helper exit 1 — the insert/extract chains unroll k-fold);
    # k = 16 is the largest empirically-validated slot count on real TPUs.
    assert k <= 16, (
        f"per-object slot count {k} exceeds the Mosaic-validated maximum "
        "of 16; densities needing more should raise max_scene_alerts and "
        "accept the counted alert_overflow, or shard the world")
    T = cl.num_tiles
    wr = cl.window_rows                 # in cand_lanes-wide rows
    CL = cl.cand_lanes
    n_out = 2 * k + 2
    nfk = NF + n_wide + (1 if mode == "predict" else 0)
    # VMEM budget guard: the double-buffered windows dominate the scratch
    # bill; past ~16 MiB Mosaic fails with a scoped-vmem OOM only AFTER
    # minutes of remote compile (observed at window_rows=1024 x 15 predict
    # fields). Fail fast with the actionable knobs instead.
    vmem_bytes = 4 * (nfk * ROWS * LANE + 2 * nfk * wr * CL
                      + (2 * k + 1) * ROWS * LANE + ROWS * CL)
    if vmem_bytes > 16 * 2 ** 20 and not interpret:
        raise ValueError(
            f"fused kernel VMEM scratch {vmem_bytes / 2**20:.1f} MiB "
            f"(window_rows={wr} x {nfk} fields, double-buffered) exceeds "
            "the ~16 MiB TPU budget; lower window_rows (denser worlds can "
            "accept counted window overflow), drop to 2D (z fields compile "
            "out), or shard the world so each shard's windows shrink")
    kern = functools.partial(_kernel, cfg=cfg, window_rows=wr,
                             shifts=cl.shifts,
                             tables_packed=cl.tables_packed,
                             k=k, emit=mode, sub_steps=sub_steps,
                             wide_oid=cl.wide_oid, cand_lanes=CL)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=11,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * (2 * nfk),
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * n_out,
        scratch_shapes=(
            [pltpu.VMEM((ROWS, LANE), jnp.float32)] * nfk   # own
            + [pltpu.VMEM((wr, CL), jnp.float32)] * (2 * nfk)  # windows x2
            # slots + the per-object packed counter are LANE wide; the
            # scene-total checked counter (index 2k) is CL wide
            + [pltpu.VMEM((ROWS, LANE), jnp.float32)] * (2 * k)
            + [pltpu.VMEM((ROWS, CL), jnp.float32)]
            + [pltpu.VMEM((ROWS, LANE), jnp.float32)]
            + [pltpu.SemaphoreType.DMA((nfk,)),
               pltpu.SemaphoreType.DMA((2 * nfk,)),
               pltpu.SemaphoreType.DMA((n_out,))]
        ),
    )
    out_shape = ([jax.ShapeDtypeStruct((T * ROWS, LANE), jnp.float32)
                  for _ in range(2 * k)]
                 + [jax.ShapeDtypeStruct((T * ROWS, CL), jnp.float32),
                    jax.ShapeDtypeStruct((T * ROWS, LANE), jnp.float32)])
    field_list = [cl.fields[i] for i in range(nfk)]
    # wide views for the window DMAs: [R, LANE] -> [R/group, CL] is a pure
    # row-major reinterpret (same bytes)
    field_list_w = [cl.fields[i].reshape(-1, CL) for i in range(nfk)]
    if pred_params is None:
        pred = jnp.zeros((3,), jnp.float32)
    else:
        pred = jnp.stack([jnp.asarray(v, jnp.float32)
                          for v in pred_params])
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(cl.w_rw.reshape(-1), cl.w_rb_a, cl.w_rb_b,
      cl.row_rb_a, cl.row_rb_b, cl.row_xa, cl.row_xb,
      cl.row_xa_w, cl.row_xb_w,
      cl.cr_start, pred, *field_list, *field_list_w)
    n = T * TILE
    keys = jnp.stack([outs[j].reshape(n) for j in range(k)], axis=1)
    if idx_layout == "slots":
        idx = [outs[k + j].reshape(n) for j in range(k)]   # f32, unstacked
    else:
        idx = jnp.stack([outs[k + j].reshape(n) for j in range(k)],
                        axis=1).astype(jnp.int32)
    if cfg.detect.count_checked:
        # per-slot partials are small exact f32 ints; sum in int32 (the
        # total times ROWS can pass 2^24, where f32 summation would round)
        checked = jnp.sum(outs[2 * k].astype(jnp.int32)) // ROWS
    else:
        checked = jnp.int32(-1)        # compiled out (DetectionConfig)
    cnt = outs[2 * k + 1].reshape(n).astype(jnp.int32)
    emitted = cnt // int(CNT_PACK)
    qual = cnt % int(CNT_PACK)
    return keys, idx, checked, emitted, qual

"""Frozen configuration tree for the TPU-native collision-detection framework.

One layered, immutable config replaces the reference's scattered module-level
constants and constructor defaults (reference: collision_detection.py:18-28,
warning_system.py:18-27, compute_node.py:648-672, models.py:67-94). Everything
that shapes a compiled program (grid dims, stencil width, candidate capacity,
time steps) is static here so `jax.jit` traces once.
"""
from __future__ import annotations

import dataclasses
import json
import math
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class WorldConfig:
    """Axis-aligned world bounds. Reference map default is 10 km x 10 km
    (optimized_performance_test.py:56) with z unused; we keep positions 3D."""
    lo: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    hi: Tuple[float, float, float] = (10_000.0, 10_000.0, 0.0)

    @property
    def extent(self) -> Tuple[float, float, float]:
        return tuple(h - l for l, h in zip(self.lo, self.hi))

    @property
    def is_3d(self) -> bool:
        return (self.hi[2] - self.lo[2]) > 0.0


@dataclasses.dataclass(frozen=True)
class GridConfig:
    """Sort-based uniform grid (replaces the dict-of-sets adaptive grid,
    reference spatial_index.py:31-432, and the uniform grid of
    optimized_performance_test.py:257-353).

    cell_size should be >= the detection search radius so a 1-cell stencil
    covers it; `stencil_halfwidth` grows automatically otherwise.
    cell_capacity bounds how many objects we gather per cell during the
    broad phase (objects beyond it in a cell are dropped from *that cell's*
    candidate list — size it for worst-case density; the 80/20 city skew in
    the reference generator concentrates objects, see SURVEY.md hard part #1).
    """
    cell_size: float = 100.0
    cell_capacity: int = 16
    # Fused-kernel cell ordering: split the x axis into bands of `band_cells`
    # cells and sort band-major ((band, z, y, x) instead of (z, y, x)). Each
    # 128-object storage row then covers a compact ~square patch instead of
    # a kilometers-long x strip. Measured a WASH at 1M (see BENCH_NOTES
    # "Kernel v3" for why row granularity floors the pruning either way);
    # kept as a parity-tested option. None = unbanded (one band); 0 = auto
    # (kernels/cell_list.auto_band_cells). Semantics are unchanged either
    # way — only evaluation order/coverage of the identical pair set.
    band_cells: int | None = None
    # Object ids ride the fused kernel's cell-list co-sort as exact f32
    # integers (<= 2^24). wide_oid=True carries them as an (hi, lo) field
    # pair instead, lifting the id range to int32 (fleets past ~16.7M
    # objects). None = auto: wide whenever num_objects needs it. The extra
    # sort operand + DMA field costs a few % of the build, so it stays off
    # for ordinary fleets.
    wide_oid: bool | None = None
    # (A staged Pallas bitonic co-sort knob lived here through r3; it
    # measured ~12 ms SLOWER than the ~1 ms lax.sort at 1M x 14 operands
    # and was retired to .probe/block_sort.py — BENCH_NOTES r3 "Pallas
    # sort probe" + CORRECTION.)
    # Candidate-row width (lanes) of the fused kernel's pair blocks:
    # None/128 = classic [128 own x 128 cand] blocks; 256/512 process 2/4
    # storage rows of candidates per block-loop iteration, amortizing the
    # ~160 ns/iteration loop/branch/sync machinery (BENCH_NOTES r3
    # microprobe) at the cost of coarser x-guard granularity. Detection
    # results are EXACTLY identical at any width (parity-tested both
    # modes; the slot key quantizer rescales so packed ordering is
    # unchanged). MEASURED A LOSS at the 1M-3D bench config (256: 240 ms
    # vs 208.5 at 128): unbanded storage rows span ~2.5 km of x there, so
    # 2-row groups overlap nearly everything and the x-guard stops
    # pruning — examined math grows faster than loop overhead shrinks.
    # Kept for dense/short-row regimes; default None. Requires unpacked
    # guard tables (fleets under the ~4.6M-object SMEM threshold).
    cand_lanes: int | None = None


@dataclasses.dataclass(frozen=True)
class DetectionConfig:
    """Canonical 4-stage detection semantics
    (reference collision_detection.py:18-28, 229-389, 484-513)."""
    search_radius: float = 100.0          # stage-1 spatial filter radius (m)
    time_window: float = 10.0             # prediction window (s)
    time_step: float = 0.1                # stage-3 sampling step (s)
    safe_distance_base: float = 5.0       # SAFE_DISTANCE_DEFAULT
    max_warning_time: float = 10.0        # MAX_WARNING_TIME
    max_relative_speed: float = 50.0      # MAX_RELATIVE_SPEED
    min_relative_speed: float = 0.1       # stage-2 rel-speed floor
    weight_distance: float = 0.3
    weight_time: float = 0.3
    weight_speed: float = 0.2
    weight_angle: float = 0.1
    weight_type: float = 0.1
    same_type_factor: float = 0.5
    diff_type_factor: float = 0.8
    # 'precise' = sampled constant-acceleration sweep (reference stage 3,
    # collision_detection.py:296-342). 'fast' = closed-form constant-velocity
    # first-crossing (quadratic) — the speed-of-light path for benchmarks.
    mode: str = "precise"
    # Stage-3 sweep runs only on stage-2 survivors, compacted to this many
    # pairs per detection block (semantically identical: stage 3 is only
    # reachable through stage 2 in the reference, collision_detection.py:
    # 143-151; excess survivors beyond the cap are counted in overflow).
    # None (default) scales with the fleet: max(4096, 2*num_objects) —
    # measured survivor counts run ~1-1.5x num_objects at bench densities
    # (100k: aoflow 0 at 2N, r3), and the sweep+refine cost is linear in
    # this STATIC cap (~0.18 us/slot), so headroom is paid every step.
    # Overflow stays counted; Scene regrows on it.
    precise_survivor_cap: int | None = None
    # Per-object stage-2 survivor slots kept by the fused kernel in precise
    # mode (kernels/fused_detect.py mode='survivors'); survivors beyond this
    # are counted in alert_overflow. 8 covers any plausible simultaneous
    # near-collision count per object; raise for pathological densities.
    survivor_k: int = 8
    # Hot-object exact top-up (fused fast mode, kernels/refine.py): rows
    # whose qualifying pair count exceeds the k alert slots get their full
    # 1-cell-stencil neighborhood re-refined exactly in XLA (bounded by the
    # cell-list cr_start spans) and merged into the scene selection, so the
    # fleet keeps small-k kernel cost while dense outliers stay provably
    # complete. alert_overflow then counts only rows beyond this cap (and
    # any counted span shortfall past the 16-row hot window).
    # 0 disables (pre-r5 behavior: every qualifying-past-k row is counted).
    # 8 covers measured hot-row counts with headroom (1M-3D bench: ~1-3
    # hot rows; the top-up pass costs ~linearly in this cap).
    hot_topup: int = 8
    # Stage-2 closest-approach sign convention. The reference computes
    # t* = -dot(rel_pos, rel_vel)/|rel_vel|^2 with rel_pos = other - vehicle
    # but rel_vel = vehicle - other (collision_detection.py:252-277), which
    # makes t* NEGATIVE for approaching pairs — head-on collisions are
    # filtered out and only already-overlapping separating pairs alert.
    # 'physical' (default) fixes the sign; 'reference' replicates the bug
    # bit-for-bit for parity testing. See DEVIATIONS.md #1.
    convention: str = "physical"
    # Stage-4 angle factor sin(|heading_i - heading_j|): 'product' (default)
    # uses the identity sin(|a-b|) = sign(a-b)*(sin a cos b - cos a sin b),
    # which lets the fused kernel compute the transcendentals per 128-lane
    # ROW instead of per [128,128] block (measured -15 ms at 1M, -8 ms at
    # 100k). The XLA pipeline uses the identical expression, so
    # cross-backend parity is exact; values differ from the literal form
    # only by float rounding (~1e-7, inside every parity tolerance —
    # DEVIATIONS #18). 'direct' evaluates the reference expression
    # literally (collision_detection.py:364-365).
    angle_form: str = "product"
    # Fused-kernel stage-3/4 gate: True (default) skips the post-stage-2
    # block math when a [128x128] pair block has no stage-2 survivor — a
    # clear win at sparse densities (3D swarms) for the ~200 ns/block
    # vector->scalar sync it costs. At dense 2D configs nearly every block
    # fires and the gate is pure overhead; False compiles it out (results
    # identical — the emit tail keeps its own guards).
    gate_stage2: bool = True
    # Fused-kernel stage-1 gate: True additionally skips stage-2 AND the
    # stage-2 gate's sync when a pair block has no stage-1 hit at all (no
    # alive non-self pair within search_radius) — the same pattern the
    # predict kernel mode always uses. Worth it only when a meaningful
    # fraction of x-overlap-surviving blocks are completely dead (see
    # BENCH_NOTES "stage-1 gate" for the measured trade per config).
    # Results are identical either way (skipped blocks emit nothing; the
    # stage-1 counter adds zero for dead blocks). Default False.
    gate_stage1: bool = False
    # Stage-1 pair counter (num_pairs_checked): the cross-backend honesty
    # metric costs a per-block accumulate in the fused kernel (~12 ms at 1M,
    # measured). False compiles it out; num_pairs_checked then reports -1.
    # Alert results, risk counts and the alert_overflow completeness
    # certificate are unaffected.
    count_checked: bool = True

    @property
    def num_time_steps(self) -> int:
        # reference: `for t in range(int(time_window / time_step))` → 0..T-1
        return int(self.time_window / self.time_step)


@dataclasses.dataclass(frozen=True)
class AlertConfig:
    """Alert thresholds and priority rules (reference warning_system.py:18-27,
    287-311) plus fixed-size top-k extraction (TPU needs static shapes)."""
    risk_low: float = 0.3
    risk_medium: float = 0.6
    risk_high: float = 0.8
    ttc_critical: float = 3.0
    ttc_high: float = 5.0
    max_alerts_per_object: int = 4        # per-object top-k kept on device
    max_scene_alerts: int = 1024          # scene-level top-k returned per step
    alert_expiry_s: float = 30.0          # host AlertManager expiry
    resend_interval_s: float = 0.5        # unacked re-send interval


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Fleet physics matching the measured harness
    (optimized_performance_test.py:139-198)."""
    dt: float = 0.1
    accel_change_prob: float = 0.1
    accel_range: float = 1.0
    max_speed: float = 30.0
    min_heading_speed: float = 0.1
    speed_min: float = 5.0                # initial speed U(5, 20)
    speed_max: float = 20.0
    city_fraction: float = 0.8            # 80/20 city skew


@dataclasses.dataclass(frozen=True)
class ShardConfig:
    """Spatial sharding over a device mesh (replaces data_sharding.py +
    messaging.py — SURVEY.md §2.10/§2.11). The world splits along x into
    `num_shards` equal slabs, one per device. Cross-boundary visibility (the
    halo problem the reference left unsolved, compute_node.py:343-368) is
    handled by ppermute'ing a boundary band of width `halo_width` (must
    cover the detection search radius) to slab neighbors each step; objects
    crossing a slab boundary migrate the same way.

    halo_capacity / migrate_capacity are static buffer sizes (objects per
    step per direction); overflow drops the farthest objects and is counted
    in step stats. slot_headroom scales per-shard slot count above the even
    split so density skew (80/20 cities) doesn't overflow shard storage."""
    num_shards: int = 1
    axis_name: str = "shard"
    halo_width: float = 100.0
    halo_capacity: int = 256
    migrate_capacity: int = 64
    slot_headroom: float = 2.0
    # 2D tiling: num_shards_y > 1 splits the world along y as well, making
    # an (x, y) device grid (the octree-region analog of the reference's
    # SpatialPartitioner, spatial_index.py:716-769). Halo/migration run in
    # two phases (x then y); the y pass re-mirrors the x halo so corner
    # neighborhoods are covered. halo_width applies to both axes.
    num_shards_y: int = 1
    axis_name_y: str = "shard_y"
    # 3D tiling: num_shards_z > 1 additionally splits the world along z,
    # making an (x, y, z) device grid — useful for deep-z worlds (stacked
    # aviation layers) where z-skewed density needs z walls to balance.
    # (It does NOT shrink the fused kernel's z-window count: that is
    # 2*z_reach+1 from cell size and vertical reach, shard-independent.)
    # Halo/migration gain a third phase (x, then
    # y, then z; each later pass re-mirrors the earlier-extended state so
    # edge/corner neighborhoods arrive in <= 3 hops). halo_width applies
    # to every sharded axis.
    num_shards_z: int = 1
    axis_name_z: str = "shard_z"

    @property
    def total_shards(self) -> int:
        return self.num_shards * self.num_shards_y * self.num_shards_z


@dataclasses.dataclass(frozen=True)
class SystemConfig:
    num_objects: int = 1000
    world: WorldConfig = WorldConfig()
    grid: GridConfig = GridConfig()
    detect: DetectionConfig = DetectionConfig()
    alerts: AlertConfig = AlertConfig()
    sim: SimConfig = SimConfig()
    shard: ShardConfig = ShardConfig()

    # ---- static derived quantities (shape the compiled program) ----

    @property
    def grid_dims(self) -> Tuple[int, int, int]:
        ext = self.world.extent
        cs = self.grid.cell_size
        return tuple(max(1, int(math.ceil(e / cs)) if e > 0 else 1) for e in ext)

    @property
    def num_cells(self) -> int:
        nx, ny, nz = self.grid_dims
        return nx * ny * nz

    @property
    def survivor_cap(self) -> int:
        """Static stage-2 survivor compaction capacity (precise mode)."""
        c = self.detect.precise_survivor_cap
        return c if c is not None else max(4096, 2 * self.num_objects)

    @property
    def stencil_halfwidth(self) -> int:
        return max(1, int(math.ceil(self.detect.search_radius / self.grid.cell_size)))

    @property
    def stencil_size(self) -> int:
        w = 2 * self.stencil_halfwidth + 1
        return w * w * (w if self.world.is_3d else 1)

    @property
    def max_candidates(self) -> int:
        """Broad-phase candidate slots per object (static K)."""
        return self.stencil_size * self.grid.cell_capacity

    # ---- (de)serialization (config/flag system, SURVEY.md §5) ----

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, s: str) -> "SystemConfig":
        d = json.loads(s)
        return cls(
            num_objects=d.get("num_objects", 1000),
            world=WorldConfig(**{**d.get("world", {}),
                                 **{k: tuple(v) for k, v in d.get("world", {}).items()
                                    if k in ("lo", "hi")}}),
            grid=GridConfig(**d.get("grid", {})),
            detect=DetectionConfig(**d.get("detect", {})),
            alerts=AlertConfig(**d.get("alerts", {})),
            sim=SimConfig(**d.get("sim", {})),
            shard=ShardConfig(**d.get("shard", {})),
        )

    def replace(self, **kw) -> "SystemConfig":
        return dataclasses.replace(self, **kw)


# Vehicle type table (reference optimized_performance_test.py:69-70,
# vehicle_simulator.py:323-324): car=2.0, truck=4.0, bus=5.0, motorcycle=1.0.
VEHICLE_TYPES = ("car", "truck", "bus", "motorcycle")
VEHICLE_SIZES = (2.0, 4.0, 5.0, 1.0)

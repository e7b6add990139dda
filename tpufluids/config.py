"""Simulation configuration.

The reference (robbergen/FluidSolverGPU) hard-codes every physics and
domain constant as a compile-time ``#define`` (FluidGPU.cuh:1-31,
FluidGPU-unidyn.cuh:1-36) and hand-edits scene sizes in the drivers
(solver.cu:17-19, solver-unidyn.cu:21-23).  Here everything is a frozen
dataclass field so scenes are runtime-configurable; the two presets
``BASE_CONFIG`` and ``UNIDYN_CONFIG`` reproduce the reference values
verbatim, including the quirky magic numbers called out by name
(density normalization, static-friction threshold, acceleration
prefactors, wall constants).
"""

from __future__ import annotations

import dataclasses
import math

# The reference uses the literal 3.14159 in its smoothing kernels
# (FluidGPU.cu:13,16,25,28,37), not machine pi.  Kept for parity.
PI_REF = 3.14159


@dataclasses.dataclass(frozen=True)
class SPHConfig:
    """All solver constants. Defaults = base variant (FluidGPU.cuh:1-31)."""

    # --- variant selection -------------------------------------------------
    # "base": single-phase WCSPH, explicit Euler (FluidGPU.cuh / solver.cu)
    # "unidyn": two-phase mixture + granular stress, leapfrog
    #           (FluidGPU-unidyn.cuh / solver-unidyn.cu)
    variant: str = "base"

    # --- domain / binning grid (FluidGPU.cuh:1-9) ---------------------------
    xmin: float = -1.0
    ymin: float = -1.0
    zmin: float = -1.0
    xmax: float = 1.0
    ymax: float = 1.0
    zmax: float = 1.0
    cell_size: float = 0.05
    grid_size: int = 40          # (xmax - xmin) / cell_size

    # --- physical constants (FluidGPU.cuh:10-14) ----------------------------
    gravity: float = -9.8
    sound: float = 1450.0
    rho0: float = 9550.0         # reference density of "water"
    rho0_sand: float = 9550.0    # unidyn RHO_0_SAND (FluidGPU-unidyn.cuh:13)
    p0: float = 101325.0
    diff: float = 0.0            # DIFF diffusion magnitude (disabled)

    # --- artificial viscosity (FluidGPU.cuh:16-20; -unidyn.cuh:17-21) -------
    alpha_fluid: float = -1.0        # -0.01e2
    alpha_boundary: float = 200.0    # 2000e-1
    alpha_sand: float = -1.55        # unidyn ALPHA_SAND (-0.0155e2)
    alpha_sand_boundary: float = 10.0  # unidyn ALPHA__SAND_BOUNDARY (100e-1)
    # quadratic term weight inside the inline viscosity of the force kernel:
    # s ~ alpha*SOUND*(h*mu + (visc_quad/SOUND)*(h*mu)^2)/rho_bar
    # (the literal 50 at FluidGPU.cu:255, FluidGPU-unidyn.cu:307)
    visc_quadratic: float = 50.0

    # --- boundary densification (FluidGPU.cuh:22) ---------------------------
    bdensfactor: float = 1.5

    # --- granular stress constants (FluidGPU.cuh:24-28; -unidyn.cuh:26-30) --
    c1: float = 15.0
    c2: float = 0.0
    c3: float = 0.0              # unidyn: 50.0
    phi: float = 1.23            # friction angle (radians)
    kc: float = 1e3              # cohesion; unidyn: 1e9
    # denominator regularizer in the stress-rate middle term
    # (the literal 1e8 at FluidGPU.cu:393, FluidGPU-unidyn.cu:439)
    stress_rate_reg: float = 1e8

    # --- mixture (drift-flux) couplings (FluidGPU-unidyn.cuh:32-33) ---------
    mixpressure: float = 1e-12
    mixbrownian: float = 5e-9
    # volume-fraction gate for the mixture terms (FluidGPU-unidyn.cu:317)
    mix_frac_min: float = 0.001
    mix_frac_max: float = 0.999
    # mixfactor denominator regularizer (the 0.01 at FluidGPU-unidyn.cu:368)
    mixfactor_reg: float = 0.01
    # drag prefactor in the leapfrog friction term
    # (the 0.0000002 at FluidGPU-unidyn.cuh:351-353)
    solid_drag: float = 2e-7
    # mixture_accel weight in the velocity kick
    # (the literal 5 at FluidGPU-unidyn.cuh:351-353)
    mixture_accel_weight: float = 5.0
    # minimum fluid fraction before transport freezes
    # (FluidGPU-unidyn.cuh:315: if fluid + delfluid < 0.2 -> delfluid = 0)
    fluid_floor: float = 0.2

    # --- kernel support & timestep (FluidGPU.cuh:30-31) ---------------------
    cutoff: float = 0.06         # smoothing length h; support radius = 2h
    dt: float = 0.0005           # unidyn: 0.0018

    # --- quirky named constants (SURVEY.md §7 "reproducing quirky constants")
    # density normalization: dens = (sum + W(0))/23 * (1 + bnd*BDENS) + 9250
    # (FluidGPU.cuh:165-167)
    dens_norm_div: float = 23.0
    dens_norm_offset: float = 9250.0
    # Tait EOS stiffness multiplier: press = 1000 * rho0/7 * ((rho/rho0)^7-1)
    # (FluidGPU.cuh:256-260; SOUND^0 == 1 so the stiffness is literally 1000)
    eos_stiffness: float = 1000.0
    eos_gamma: float = 7.0
    # static-friction hack threshold (FluidGPU.cuh:290-295)
    friction_eps: float = 0.003
    # pressure-gradient acceleration prefactors:
    # base: a = -(150/rho) * delpress (FluidGPU.cuh:298-300)
    accel_prefactor: float = 150.0
    # unidyn: a = -((220 - 70*solid)/rho) * delpress (FluidGPU-unidyn.cuh:357-359)
    accel_prefactor_unidyn: float = 220.0
    accel_prefactor_solid: float = 70.0
    # unidyn wall handling (FluidGPU-unidyn.cuh:332, 404-413)
    floor_recycle_z: float = -0.89
    wall_limit: float = 0.98
    wall_clamp: float = 0.97

    # --- two-level binning (FluidGPU-unidyn.cu:181-192, 569-869) ------------
    # In the reference's unidyn variant the octant sub-bin refinement is
    # the ACTIVE default: every cell with population > subbin_threshold
    # skips the coarse kernel and is processed by the fine kernel
    # mykernel3 with the 8-cell octant stencil (launch at
    # solver-unidyn.cu:379).  subbin_parity=True reproduces those
    # stencil semantics (UNIDYN_CONFIG default); False uses the full
    # 27-cell stencil everywhere (a superset of the interaction set).
    # Callers may override per call (step.sph_step(subbin_parity=...)).
    subbin_parity: bool = False
    subbin_threshold: int = 6

    # --- adaptive resolution (merge/split; FluidGPU-unidyn.cu:261-285) ------
    # merge distance threshold; the reference ships with the sentinel -10.0
    # which disables merging (ds <= -10 is never true for ds > 0).
    merge_dist: float = -10.0
    merge_mass_new: float = 2.75
    merge_diffusion_max: float = 20.0
    split_mass_min: float = 3.0
    split_diffusion_min: float = 35000.0
    split_dens_max: float = 9400.0
    split_y_nudge: float = 0.015
    # host split re-injection (solver-unidyn.cu:495-542, commented out in the
    # reference; implemented here as a masked pool op, off by default)
    split_reinjection: bool = False
    split_child_y_offset: float = -0.03

    # --- TPU-side numerics (no reference equivalent) -------------------------
    # SPH force-pass backend: "auto" (pallas on TPU, xla elsewhere),
    # "xla" (gather-based), or "pallas" (column-window kernels,
    # tpufluids/sph_pallas.py, both variants incl. merge-enabled unidyn
    # runs; 4-5x on v5e at the reference scenes). Column population cap
    # is 128 (counted overflow); pallas falls back to xla only for
    # base-variant subbin mode (see step.use_pallas_forces).
    force_backend: str = "auto"
    # pallas column-window capacity (home block rows / window rows).
    # Must cover the densest (x, y) column of the sorted pool (column
    # population overflow is counted in StepMetrics.bin_overflow and
    # the excess particles' pairs are dropped deterministically).
    # Multiples of 128 (lane width); raise for dense large-N scenes.
    pallas_col_cap: int = 128
    # window-sublane chunk: >0 processes each neighbor-column window in
    # chunks of this many sublanes under a dynamic loop, so pair-tile
    # VPU work scales with the actual column population instead of the
    # worst-case cap (sph_pallas._window_loop). 0 = whole-cap tiles.
    # 64 measured best on v5e for both scenes (verify/bench_sph_rb_sweep).
    pallas_w_chunk: int = 64
    # home-LANE chunk for the column family: >0 computes pair tiles in
    # static lane chunks of this size and skips chunks past the
    # column's population (sph_pallas._make_base_body_hc), so home-side
    # VPU work scales with occupancy instead of the cap (~56% at the
    # 524k uniform fill's suggested cap).  0 = whole-cap tiles; -1 =
    # auto (128 when the column cap exceeds one lane tile, else 0 —
    # measured v5e at 524k uniform fill, cap 584: h_chunk 0 = 127.4,
    # 64 = 179.2, 128 = 111.3 ms/step with bitwise-identical
    # positions; verify/bench_sph_hchunk_ab.py).  Base variant only.
    pallas_h_chunk: int = -1
    # z-band tile skip for the home-chunked column family: skip
    # (window-chunk x home-chunk) pair tiles whose z-cell bands are
    # not stencil-adjacent (the cell-sorted packed layout makes both
    # chunk kinds contiguous z bands; the |czi-czj|<=1 pair gate
    # zeroes non-adjacent tiles, so skipping them is bitwise
    # identical — sph_pallas._make_base_body_hc; the rowblock family
    # has the analogous candidate-chunk skip, _rowblock_sweep).  -1 =
    # auto (column: on when the home block spans >= 4 h_chunk chunks;
    # rowblock: off), 0 = off, 1 = on for both families.  Measured v5e
    # (verify/bench_sph_zskip_ab.py): 524k uniform fill / cap 584 =
    # 5 chunks: column 110.9 -> 104.2 ms/step ON; 131k / cap 176 =
    # 2 chunks: 24.6 -> 30.0 OFF (cond dispatch overhead dominates);
    # rowblock 156 -> 197 at 524k, so auto never enables it there.
    pallas_z_skip: int = -1
    # Pallas force-kernel family: "rowblock" (home block = 128
    # consecutive sorted rows — full lane utilization, NO capacity cap,
    # overflow impossible), "column" (one (x,y) grid column per
    # program, pallas_col_cap-padded tiles), "resident" (unidyn only:
    # fused two-pass whole-pool-in-VMEM kernel, auto-selected for
    # unidyn pools <= sph_pallas.RESIDENT_MAX_BYTES when no sharded
    # drift_fix is in play), or "auto" (rowblock up to
    # ROWBLOCK_MAX_POOL rows, column above — the measured v5e
    # crossover: rowblock wins 4.5/25.1 vs 7.6/28.2 ms/step at
    # 32k/131k uniform fill but loses 156 vs 132 at 524k, where the
    # rowblock windows span too many cells;
    # verify/bench_sph_scaling_ab.py).  Both families serve the full
    # cube AND sharded x-slabs (binning.GridSpec).
    pallas_kernel: str = "auto"
    # Spatial-sort cadence: 1 = re-sort the pool every step (the
    # reference's thrust::sort_by_key cadence, solver.cu:181).  K > 1
    # re-sorts every K-th step and reuses the binning tables in
    # between (the pool storage stays in the last sort's order, so the
    # Pallas kernels read it without the per-step order gather — at 2M
    # particles sort+pack were 28% of the step, BASELINE.md r4/r5).
    # Between sorts the neighbor WINDOWS come from sort-time cell
    # membership while the pair masks (|dcx|,|dcy|,|dcz| <= 1 and
    # ds <= 2h) are evaluated on CURRENT positions, so the pair set is
    # the fresh-sort set minus pairs whose endpoints drifted >= 1 cell
    # apart in x/y since the sort — with per-step drift bounded by
    # max_speed*dt (a few % of a cell at the reference scenes), losses
    # sit in the same outer-support tail the reference's own 27-cell
    # stencil already truncates (FluidGPU.cu:124-126).  Python drivers
    # (run/run_python) only; requires the Pallas backend and the base
    # variant (unidyn's octant/home_count sub-bin state would go stale).
    sort_every: int = 1
    # dense neighbor-run capacity: each of the 9 (dx,dy) stencil runs covers
    # the contiguous cells (z-1, z, z+1) and holds at most 3*max_per_cell
    # particle slots; overflow is deterministic (highest-rank dropped) and
    # surfaced in diagnostics (vs the reference silently dropping cells with
    # population >= 64, FluidGPU.cu:174).
    max_per_cell: int = 16

    # ------------------------------------------------------------------------
    @property
    def num_cells(self) -> int:
        return self.grid_size ** 3

    @property
    def support(self) -> float:
        return 2.0 * self.cutoff

    @property
    def yield_denom(self) -> float:
        """sqrt(9 + 12 tan^2 phi) of the Drucker-Prager-style yield rule
        (FluidGPU-unidyn.cu:436-438)."""
        t = math.tan(self.phi)
        return math.sqrt(9.0 + 12.0 * t * t)

    def replace(self, **kw) -> "SPHConfig":
        return dataclasses.replace(self, **kw)


# Base variant preset: FluidGPU.cuh:1-31 + solver.cu scene constants.
# pallas_col_cap 80: the dam column's max (x,y)-column population is
# 64 over the full 4000-step run (verify/_occ_probe.py) — the default
# 128 doubles the force kernel's padded tile work for nothing
BASE_CONFIG = SPHConfig(pallas_col_cap=80)

# unidyn variant preset: FluidGPU-unidyn.cuh:1-36.
UNIDYN_CONFIG = SPHConfig(
    variant="unidyn",
    cell_size=0.12,
    grid_size=17,
    alpha_fluid=-0.155,        # -0.0155e1
    alpha_boundary=80.0,       # 80e0
    alpha_sand=-1.55,          # -0.0155e2
    alpha_sand_boundary=10.0,  # 100e-1
    c1=15.0,
    c2=0.0,                    # 0e6
    c3=50.0,                   # 5e1
    kc=1e9,
    dt=0.0018,
    max_per_cell=32,
    # the reference's default: cells with population > 6 use the octant
    # sub-bin stencil (mykernel3, solver-unidyn.cu:379)
    subbin_parity=True,
)

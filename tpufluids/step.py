"""Single-device step function and scan-based run loop.

The reference's per-step pipeline (solver.cu:171-216;
solver-unidyn.cu:313-573) is: thrust sort -> (unidyn) merge compaction
count -> findneighbours binning -> coarse force kernel -> (unidyn) fine
force kernel -> update kernel -> (multi-dev) exchange -> periodic VTK
write -> cell recompute, with a host sync and print every step.

Here the entire step is one pure function under ``jit``, and ``run``
drives it with ``lax.scan`` so there are no host round-trips inside the
loop (snapshots are taken between scan chunks).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpufluids import adapt, binning
from tpufluids.config import SPHConfig
from tpufluids.forces import compute_forces
from tpufluids.integrate import update
from tpufluids.state import ParticleState


class StepMetrics(NamedTuple):
    """Per-step diagnostics (the reference only prints particle/merge
    counts and kernel ms, solver-unidyn.cu:347-348)."""
    n_alive: jax.Array
    max_speed: jax.Array
    total_mass: jax.Array
    dens_residual: jax.Array   # max |dens - rho0| / rho0 over fluid
    bin_overflow: jax.Array
    n_split: jax.Array


# "auto" kernel-family crossover (pool rows): the rowblock family's
# 128-consecutive-sorted-rows home blocks win below this size, but at
# very large N each block's rows span so many (x, y) columns that its
# neighbor window outgrows the column family's capped tiles (measured
# v5e crossover between 131k and 524k uniform fill — 25.1 vs 28.2 and
# 156 vs 132 ms/step; verify/bench_sph_scaling_ab.py).
ROWBLOCK_MAX_POOL = 262144


def resolve_kernel_family(cfg: SPHConfig, capacity: int) -> str:
    """Resolve cfg.pallas_kernel ("auto" picks by static pool size)."""
    if cfg.pallas_kernel == "auto":
        return "rowblock" if capacity <= ROWBLOCK_MAX_POOL else "column"
    return cfg.pallas_kernel


def resolve_subbin(cfg: SPHConfig, subbin_parity) -> bool:
    """Per-call override (bool) or the config default (None) — the
    UNIDYN preset defaults to True, the reference's active two-level
    binning behavior (solver-unidyn.cu:379)."""
    return cfg.subbin_parity if subbin_parity is None else subbin_parity


def use_pallas_forces(cfg: SPHConfig, subbin_parity=None) -> bool:
    """Whether the Pallas force backend handles this config.  It covers
    both variants incl. unidyn subbin-parity mode and merge-enabled
    unidyn runs (the partner search runs inside the pass-A kernels);
    it falls back to XLA only for base-variant subbin mode (not a
    reference combination)."""
    sp = resolve_subbin(cfg, subbin_parity)
    backend = cfg.force_backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    return backend == "pallas" and not (sp and cfg.variant == "base")


def dispatch_forces(state: ParticleState, bt, cfg: SPHConfig,
                    subbin_parity=None, drift_fix=None,
                    grid=None, order=None, stale=False):
    """Compute the ForceAccum with the resolved backend; returns
    (acc, kernel_overflow).  Shared by the single-device step and the
    sharded step (which passes its local GridSpec + drift_fix hook).

    ``order``: binning.sort_tables mode — the state is the UNSORTED
    pool and results come back in pool order (Pallas backends only).

    ``stale``: the BinTable was built on an EARLIER step's positions
    (cfg.sort_every > 1) — the column family then adds the fresh
    per-pair |dcx|,|dcy| <= 1 cell masks (xy_cells) that its window
    construction normally guarantees, so the pair set stays a subset
    of the fresh-sort stencil (the rowblock family always masks)."""
    subbin_parity = resolve_subbin(cfg, subbin_parity)
    use_pallas = use_pallas_forces(cfg, subbin_parity)
    assert order is None or use_pallas, \
        "sort_tables mode needs the Pallas backend"
    rowblock = resolve_kernel_family(cfg, state.capacity) == "rowblock"
    if use_pallas and cfg.variant == "base":
        from tpufluids.forces import ForceAccum
        from tpufluids.sph_pallas import (base_forces_pallas,
                                          base_forces_rowblock)
        n = state.capacity
        if rowblock:
            zs = cfg.pallas_z_skip
            sw, dp, kovf = base_forces_rowblock(
                state, bt, cfg, order=order,
                w_chunk=cfg.pallas_w_chunk, grid=grid,
                z_skip=zs == 1)
        else:
            # h_chunk auto (-1): 128 when the column cap is well past
            # one lane tile — the home-chunked path is the r5 BANDED
            # sweep (exact window row ranges, no per-tile conds), a
            # clear win at large caps (524k/cap-584: 111.3 -> 95.2
            # ms/step) but ~3% behind the whole-tile path at barely-
            # over-one-tile caps (131k/cap-176: 20.8 vs 21.5 —
            # verify r5 banded A/B), hence the 192 threshold
            hc = cfg.pallas_h_chunk
            if hc < 0:
                hc = 128 if cfg.pallas_col_cap > 192 else 0
            zs = cfg.pallas_z_skip
            if zs < 0:
                # auto: on only when the rounded home block spans >= 5
                # chunks — the skip's win scales with the chunk count.
                # Measured crossover (bench_sph_zskip_ab.py, v5e, full
                # step, column family): 2 chunks (131k/cap-176)
                # 24.6 -> 30.0 LOSS; 3 chunks (262k/cap-304)
                # 58.8 -> 66.4 LOSS; 4 chunks (393k/cap-448)
                # 74.3 -> 77.5 loss; 5 chunks (524k/cap-584)
                # 110.9 -> 104.2 WIN — the cond dispatch overhead
                # needs >= ~half the window provably skippable.
                zs = 1 if hc and -(-cfg.pallas_col_cap // hc) >= 5 else 0
            sw, dp, kovf = base_forces_pallas(
                state, bt, cfg, b=cfg.pallas_col_cap,
                w_cap=cfg.pallas_col_cap, grid=grid, order=order,
                w_chunk=cfg.pallas_w_chunk,
                h_chunk=hc, z_skip=bool(zs and hc), xy_cells=stale)
        z3 = jnp.zeros((n, 3), jnp.float32)
        z33 = jnp.zeros((n, 3, 3), jnp.float32)
        acc = ForceAccum(
            sum_w=sw, dpress=dp, diffusion=z3, vel_grad=z33,
            stress_accel=z3, solid_drift=z3, fluid_drift=z3,
            mixture_accel=z3, delsolid=jnp.zeros(n, jnp.float32),
            delfluid=jnp.zeros(n, jnp.float32),
            stress_scaled=state.stress, stress_rate=z33,
            split_trigger=jnp.zeros(n, bool),
            merge_partner=jnp.full(n, -1, jnp.int32))
        return acc, kovf
    if use_pallas:
        from tpufluids.forces import accum_from_pallas
        from tpufluids.sph_pallas import (F, RESIDENT_MAX_BYTES,
                                          unidyn_forces_pallas,
                                          unidyn_forces_resident,
                                          unidyn_forces_rowblock)
        st = cfg.subbin_threshold if subbin_parity else None
        pad = max(128, cfg.pallas_w_chunk or 32)
        if (cfg.pallas_kernel in ("auto", "resident")
                and drift_fix is None
                and (state.capacity + pad) * F * 4 <= RESIDENT_MAX_BYTES):
            # fused two-pass kernel for VMEM-resident pools (both
            # sweeps in one pallas_call; unidyn_tank 5.0 -> see
            # verify/bench_unidyn_parts.py r5 rows); the sharded step's
            # drift_fix hook needs the passes split, so it keeps the
            # two-call families
            r = unidyn_forces_resident(state, bt, cfg, order=order,
                                       subbin_threshold=st, grid=grid,
                                       w_chunk=cfg.pallas_w_chunk)
        elif rowblock:
            r = unidyn_forces_rowblock(
                state, bt, cfg, order=order,
                w_chunk=cfg.pallas_w_chunk, drift_fix=drift_fix,
                subbin_threshold=st, grid=grid)
        else:
            r = unidyn_forces_pallas(
                state, bt, cfg, b=cfg.pallas_col_cap,
                w_cap=cfg.pallas_col_cap, grid=grid,
                drift_fix=drift_fix, subbin_threshold=st, order=order,
                w_chunk=cfg.pallas_w_chunk)
        return accum_from_pallas(state, r, cfg), r["overflow"]
    acc = compute_forces(state, bt, cfg, subbin_parity=subbin_parity,
                         subbin_threshold=cfg.subbin_threshold,
                         drift_fix=drift_fix)
    return acc, jnp.zeros((), jnp.int32)


def sph_step(state: ParticleState, cfg: SPHConfig,
             subbin_parity=None) -> tuple[ParticleState, StepMetrics]:
    """One physics step. Pure; safe under jit/scan/shard_map.

    ``subbin_parity``: None (default) resolves from cfg.subbin_parity;
    a bool overrides per call."""
    subbin_parity = resolve_subbin(cfg, subbin_parity)
    use_pallas = use_pallas_forces(cfg, subbin_parity)
    if use_pallas:
        # sort_tables mode: the pool is never permuted — the Pallas
        # pack gathers by ``order`` directly and results come back in
        # pool order (saves the 33-column permute + a cell-id recompute
        # per step; the sorted ADJACENCY the kernels need is in bt)
        order, bt = binning.sort_tables(state, cfg)
    else:
        state, bt = binning.sort_by_cell(state, cfg, runs=True)
        order = None
    acc, kovf = dispatch_forces(state, bt, cfg,
                                subbin_parity=subbin_parity, order=order)
    return _finish_step(state, bt, acc, kovf, cfg)


def _finish_step(state, bt, acc, kovf, cfg):
    """Merge/update/split + per-step metrics (shared by sph_step and
    the stale-tables step)."""
    bt = bt._replace(overflow=bt.overflow + kovf)
    if cfg.variant != "base" and cfg.merge_dist > 0:
        state = adapt.apply_merges(state, acc.merge_partner, cfg)
    state = update(state, acc, cfg)
    if cfg.variant != "base" and cfg.split_reinjection:
        state = adapt.apply_splits(state, cfg)

    fluid_alive = state.alive & (~state.boundary)
    metrics = StepMetrics(
        n_alive=adapt.count_alive(state),
        max_speed=jnp.max(jnp.where(
            fluid_alive, jnp.linalg.norm(state.vel, axis=-1), 0.0)),
        total_mass=jnp.sum(jnp.where(state.alive, state.mass, 0.0)),
        dens_residual=jnp.max(jnp.where(
            fluid_alive, jnp.abs(state.dens - cfg.rho0) / cfg.rho0, 0.0)),
        bin_overflow=bt.overflow,
        n_split=jnp.sum(state.split.astype(jnp.int32)),
    )
    return state, metrics


def sph_step_stale(state: ParticleState, bt, cfg: SPHConfig):
    """One step against a PREVIOUSLY built BinTable (cfg.sort_every
    amortization): the pool storage is still in the last sort's order,
    so the Pallas kernels read it directly — no per-step sort and no
    per-step order gather (at 2M particles those were 28% of the step,
    BASELINE.md).  The kernels evaluate the pair masks on current
    positions (see dispatch_forces ``stale``).  Base variant + Pallas
    backend only — enforced by use_sort_every()."""
    acc, kovf = dispatch_forces(state, bt, cfg, order=None, stale=True)
    return _finish_step(state, bt, acc, kovf, cfg)


def use_sort_every(cfg: SPHConfig, subbin_parity=None) -> bool:
    """Whether the drivers should amortize the sort (cfg.sort_every>1).
    Requires the Pallas backend and the base variant: unidyn's
    octant/home_count sub-bin inputs and merge compaction live in the
    tables and would go stale."""
    if cfg.sort_every <= 1:
        return False
    if cfg.variant != "base":
        raise ValueError("sort_every > 1 supports the base variant "
                         "only (unidyn sub-bin/merge state would go "
                         "stale between sorts)")
    if not use_pallas_forces(cfg, subbin_parity):
        raise ValueError("sort_every > 1 requires the Pallas force "
                         "backend")
    return True


@partial(jax.jit, static_argnames=("cfg",))
def _jitted_sort_step(state: ParticleState, cfg: SPHConfig):
    """Re-sort (pool physically permuted to cell order) + one stale
    step in a single dispatch; returns (state, bt, metrics)."""
    state, bt = binning.sort_by_cell(state, cfg, runs=False)
    state, metrics = sph_step_stale(state, bt, cfg)
    return state, bt, metrics


@partial(jax.jit, static_argnames=("cfg",))
def _jitted_stale_step(state: ParticleState, bt, cfg: SPHConfig):
    return sph_step_stale(state, bt, cfg)


@partial(jax.jit, static_argnames=("cfg", "n_steps", "subbin_parity"))
def run_chunk(state: ParticleState, cfg: SPHConfig, n_steps: int,
              subbin_parity=None):
    """Run ``n_steps`` under lax.scan; returns final state + stacked
    per-step metrics."""

    def body(s, _):
        s, m = sph_step(s, cfg, subbin_parity)
        return s, m

    return jax.lax.scan(body, state, None, length=n_steps)


@partial(jax.jit, static_argnames=("cfg", "subbin_parity"))
def _jitted_sph_step(state: ParticleState, cfg: SPHConfig,
                     subbin_parity=None):
    return sph_step(state, cfg, subbin_parity)


FENCE_EVERY = 256   # scalar-readback cadence in the python drivers: a
# readback through the axon tunnel costs a ~10-25 ms round trip, so at
# 1-10 ms step times a tight cadence dominates wall time (measured:
# base_dam 7.4 ms/step fenced every 8 vs 1.3 unfenced,
# verify/bench_fence_cadence.py); 256 bounds the async dispatch queue
# at ~0.1 ms/step amortized cost.


def run_python(state: ParticleState, cfg: SPHConfig, n_steps: int,
               subbin_parity=None):
    """Python-driven step loop (one jitted dispatch per step, fenced
    every FENCE_EVERY steps).  Preferred over run_chunk on runtimes
    where custom calls inside lax.scan pay a per-call host round trip
    (the axon TPU tunnel) — which matters once the Pallas force kernel
    is enabled.  Returns (state, last-step metrics)."""
    if use_sort_every(cfg, subbin_parity):
        metrics, bt = None, None
        for i in range(n_steps):
            if i % cfg.sort_every == 0:
                state, bt, metrics = _jitted_sort_step(state, cfg)
            else:
                state, metrics = _jitted_stale_step(state, bt, cfg)
            if (i + 1) % FENCE_EVERY == 0:
                float(state.pos[0, 0])
        return state, metrics
    metrics = None
    for i in range(n_steps):
        state, metrics = _jitted_sph_step(state, cfg, subbin_parity)
        if (i + 1) % FENCE_EVERY == 0:
            float(state.pos[0, 0])
    return state, metrics


def _resolved_backend(cfg: SPHConfig) -> str:
    if cfg.force_backend == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return cfg.force_backend


def run(state: ParticleState, cfg: SPHConfig, n_steps: int,
        snapshot_every: int = 0, snapshot_fn=None,
        subbin_parity=None):
    """Drive the simulation; host callbacks only at snapshot cadence
    (replacing the per-step device sync of the reference,
    solver.cu:189-197).

    With the Pallas force backend active, steps are dispatched one
    jitted call at a time (run_python style) instead of under
    ``lax.scan`` — on runtimes where custom calls inside scan pay a
    per-call host round trip (the axon TPU tunnel, ~25 ms each) the
    scan formulation would erase the kernel speedup."""
    if use_pallas_forces(cfg, subbin_parity):
        import numpy as _np
        sort_every = use_sort_every(cfg, subbin_parity)
        all_m = []
        bt = None
        for i in range(n_steps):
            if sort_every:
                if i % cfg.sort_every == 0:
                    state, bt, m = _jitted_sort_step(state, cfg)
                else:
                    state, m = _jitted_stale_step(state, bt, cfg)
            else:
                state, m = _jitted_sph_step(state, cfg, subbin_parity)
            all_m.append(m)
            if (i + 1) % FENCE_EVERY == 0:
                float(state.pos[0, 0])
            if (snapshot_fn is not None and snapshot_every > 0
                    and (i + 1) % snapshot_every == 0):
                snapshot_fn(i + 1, jax.device_get(state))
        all_m = jax.device_get(all_m)
        metrics = jax.tree_util.tree_map(
            lambda *xs: jnp.asarray(_np.stack(xs)), *all_m)
        return state, metrics

    # surfaces an invalid sort_every combination instead of silently
    # running the every-step-sort scan path (advisor r1 pattern)
    use_sort_every(cfg, subbin_parity)
    chunk = snapshot_every if snapshot_every > 0 else n_steps
    all_metrics = []
    step = 0
    while step < n_steps:
        this = min(chunk, n_steps - step)
        state, metrics = run_chunk(state, cfg, this,
                                   subbin_parity=subbin_parity)
        all_metrics.append(metrics)
        step += this
        if snapshot_fn is not None and snapshot_every > 0:
            snapshot_fn(step, jax.device_get(state))
    metrics = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs), *all_metrics)
    return state, metrics

"""Pallas TPU kernel for the SPH pair-force pass (base WCSPH variant).

The XLA force pass is gather-bound: per step it gathers N * 27 * 3K
candidate rows (TPU gather cost is per-index, ~4 ns each).  This kernel
exploits the binning structure instead: after the cell sort, one
(x, y) *column* of the grid (G consecutive cells) is one contiguous
range of sorted particles, and a particle's entire 27-cell stencil is
contained in the 9 neighbor columns with a |dz| <= 1 mask.  So:

* grid = one program per (x, y) column (G^2 programs);
* the program DMAs its own column block (B rows) and the 9 neighbor
  column blocks (W rows each) — contiguous slices, no gather;
* pair math (distance, cubic kernel, spiky gradient, Monaghan
  viscosity with the quadratic term, symmetrized pressure gradient —
  FluidGPU.cu:234-281) runs on dense (W, B) pair tiles in VMEM.
  Layout note: the tile is oriented with neighbors j on SUBLANES and
  home particles i on LANES, so j-fields broadcast from window columns
  and i-fields from rows of the (once-)transposed home block — no
  per-field lane<->sublane relayouts;
* per-column results land in a tile-owned output block; a cheap
  N-row gather maps them back to particle order.

The pair set is EXACTLY the binned stencil set of the XLA path
(column window + |dz| <= 1 == the 9 z-runs); tests assert agreement to
float32 tolerance.  Columns with more than the block capacity overflow
deterministically (counted, like bin overflow).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpufluids.binning import BinTable
from tpufluids.config import SPHConfig
from tpufluids.kernels import grad_w_spiky, w_cubic
from tpufluids.state import ParticleState

NCOLS = 9
F = 128          # packed row width (lane-aligned)
# packed column layout
_X, _V, _DENS, _PRESS, _BND, _ALIVE = 0, 3, 6, 7, 8, 9


def _window_loop(col_start, packed_hbm, cx, cy, win2, sems, *, gx, gy,
                 w_cap, body_fn, acc0, w_chunk=0):
    """Double-buffered sweep over the 9 neighbor columns.

    The window DMAs dominated the kernels' latency when issued
    start/wait back-to-back (9 serialized round trips per program);
    here window r+1 streams into the alternate VMEM slot while window
    r is being computed.  ``body_fn(acc, wj, w_count, r)`` does the
    pair math for one window block ``wj`` ((w_cap or w_chunk), F) with
    ``w_count`` valid rows; ``r`` is the static window index (its
    (dx, dy) column offset is (r // 3 - 1, r % 3 - 1)).  The loop is
    Python-unrolled so slots/semaphores are static.

    ``w_chunk`` > 0 processes each window in sublane chunks of that
    size under a dynamic fori_loop, so pair-tile VPU work scales with
    the ACTUAL window population instead of the static cap (the cap
    must cover the worst column; most columns are far below it — the
    tank averages ~48 of cap 128, i.e. ~2.6x padded work per axis).
    Requires w_cap % w_chunk == 0.

    ``gx``/``gy`` are the x/y column-grid extents — the full cube has
    gx == gy == cfg.grid_size; a sharded x-slab has gx == x_planes
    (binning.GridSpec).
    """
    def rng(r):
        dx = r // 3 - 1
        dy = r % 3 - 1
        nx, ny = cx + dx, cy + dy
        ok = (nx >= 0) & (nx < gx) & (ny >= 0) & (ny < gy)
        ncc = jnp.clip(nx * gy + ny, 0, gx * gy - 1)
        w_start = col_start[ncc]
        w_count = jnp.minimum(
            jnp.where(ok, col_start[ncc + 1] - w_start, 0), w_cap)
        return w_start, w_count

    def copy(slot, w_start):
        return pltpu.make_async_copy(
            packed_hbm.at[pl.ds(w_start, w_cap)], win2.at[slot],
            sems.at[slot])

    acc = acc0
    w_start, w_count = rng(0)
    copy(0, w_start).start()
    for r in range(NCOLS):
        slot = r % 2
        if r + 1 < NCOLS:
            nxt = rng(r + 1)
            copy(1 - slot, nxt[0]).start()
        copy(slot, w_start).wait()
        if w_chunk:
            win_ref = win2.at[slot]

            def chunk_body(i, a, r=r, win_ref=win_ref,
                           w_count=w_count):
                wj = win_ref[pl.ds(i * w_chunk, w_chunk)]
                cnt = jnp.minimum(w_count - i * w_chunk, w_chunk)
                return body_fn(a, wj, cnt, r)

            n_ch = (w_count + w_chunk - 1) // w_chunk
            acc = jax.lax.fori_loop(0, n_ch, chunk_body, acc)
        else:
            acc = body_fn(acc, win2[slot], w_count, r)
        if r + 1 < NCOLS:
            w_start, w_count = nxt
    return acc


def _sph_kernel(col_start, packed_hbm, out_ref, home, win2, sems, *,
                gx, gy, b, w_cap, cfg: SPHConfig, w_chunk=0, h_chunk=0,
                z_skip=False, xy_cells=False):
    t = pl.program_id(0)
    cx = t // gy
    cy = t % gy
    h_start = col_start[t]
    h_count = jnp.minimum(col_start[t + 1] - h_start, b)

    # empty columns (most of the grid) skip all DMA and pair work
    @pl.when(h_count > 0)
    def _do_column():
        if h_chunk and w_chunk:
            # r5: the home-chunked path always uses the banded sweep
            # (exact contiguous row ranges; no per-tile lax.cond —
            # see _column_body_banded; the z_skip flag is subsumed)
            _column_body_banded(
                col_start, packed_hbm, out_ref, home, win2, sems,
                t=t, cx=cx, cy=cy, h_start=h_start, h_count=h_count,
                gx=gx, gy=gy, b=b, w_cap=w_cap, cfg=cfg,
                w_chunk=w_chunk, h_chunk=h_chunk, xy_cells=xy_cells)
        else:
            _column_body(col_start, packed_hbm, out_ref, home, win2,
                         sems, t=t, cx=cx, cy=cy, h_start=h_start,
                         h_count=h_count, gx=gx, gy=gy, b=b,
                         w_cap=w_cap, cfg=cfg, w_chunk=w_chunk,
                         h_chunk=h_chunk, z_skip=z_skip,
                         xy_cells=xy_cells)


def _make_base_body(hmT, i_valid, cfg, *, xy_cells=False):
    """Build the base-variant pair body closure over the home block.

    ``xy_cells=True`` (row-block kernel) additionally masks pairs to
    the |dcx| <= 1 & |dcy| <= 1 cell stencil per pair — the column
    kernel guarantees that by window construction instead."""
    def irow(c):
        return hmT[c, :][None, :]                          # (1, B)

    xi_x, xi_y, xi_z = irow(_X), irow(_X + 1), irow(_X + 2)
    vi_x, vi_y, vi_z = irow(_V), irow(_V + 1), irow(_V + 2)
    di = irow(_DENS)
    pi = irow(_PRESS)
    bi = irow(_BND) > 0.5
    h = jnp.float32(cfg.cutoff)
    cs = jnp.float32(cfg.cell_size)
    czi = jnp.floor((xi_z - cfg.zmin) / cs)
    cxi = jnp.floor((xi_x - cfg.xmin) / cs) if xy_cells else None
    cyi = jnp.floor((xi_y - cfg.ymin) / cs) if xy_cells else None

    def window_body(acc, wj, w_count, r):
        def jcol(c):
            return wj[:, c][:, None]                       # (W, 1)

        xj_x, xj_y, xj_z = jcol(_X), jcol(_X + 1), jcol(_X + 2)
        j_valid = ((jax.lax.broadcasted_iota(
            jnp.int32, (wj.shape[0], 1), 0)
                    < w_count) & (jcol(_ALIVE) > 0.5))

        rabx = xi_x - xj_x                                 # (W, B)
        raby = xi_y - xj_y
        rabz = xi_z - xj_z
        ds2 = rabx * rabx + raby * raby + rabz * rabz
        ds = jnp.sqrt(ds2)
        czj = jnp.floor((xj_z - cfg.zmin) / cs)
        mask = (i_valid & j_valid & (jnp.abs(czi - czj) <= 1.0)
                & (ds > 0) & (ds <= 2 * h))
        if xy_cells:
            cxj = jnp.floor((xj_x - cfg.xmin) / cs)
            cyj = jnp.floor((xj_y - cfg.ymin) / cs)
            mask = mask & (jnp.abs(cxi - cxj) <= 1.0) \
                & (jnp.abs(cyi - cyj) <= 1.0)
        ds_safe = jnp.where(ds > 0, ds, 1.0)

        wker = w_cubic(ds, h)                # FluidGPU.cu:11-21
        dw = grad_w_spiky(ds, h)             # FluidGPU.cu:35-43

        vabx = vi_x - jcol(_V)
        vaby = vi_y - jcol(_V + 1)
        vabz = vi_z - jcol(_V + 2)
        d = vabx * rabx + vaby * raby + vabz * rabz
        mu = h * (d / (ds2 + 0.01 * h * h))
        dj = jcol(_DENS)
        pj = jcol(_PRESS)
        nb_bnd = (~bi) & (jcol(_BND) > 0.5)
        rho_bar = (di + dj) / 2.0
        s = (cfg.alpha_fluid * cfg.sound
             * (mu + cfg.visc_quadratic / cfg.sound * mu * mu) / rho_bar
             * (d < 0) * (1.0 + nb_bnd * cfg.alpha_boundary))
        p_term = pj / (dj * dj) + pi / (di * di) + s
        dkf = dw / ds_safe

        # where-masking (not multiply-masking): invalid window rows hold
        # uninitialized VMEM garbage whose inf/NaN would survive a *0
        def msum(x):
            return jnp.sum(jnp.where(mask, x, 0.0), axis=0)  # (B,)

        sum_w = msum(wker * (1.0 + nb_bnd * cfg.bdensfactor))
        pk = p_term * dkf
        dpx = msum(pk * rabx)
        dpy = msum(pk * raby)
        dpz = msum(pk * rabz)
        return acc + jnp.stack([sum_w, dpx, dpy, dpz], axis=0)  # (4, B)

    return window_body


def _make_base_body_hc(hmT, h_count, b, cfg, hc, z_skip=False,
                       xy_cells=False):
    """Home-lane-chunked twin of _make_base_body: the pair tile is
    (W, hc) instead of (W, B) and chunks past the column's actual
    population are skipped with lax.cond, so home-side VPU work scales
    with ``h_count`` rounded up to ``hc`` instead of the static cap
    ``b`` (which must cover the worst column — the 524k uniform fill
    averages ~56% home occupancy at the suggested cap).  All slices
    are static (b % hc == 0 lane chunks); per-lane op order matches
    _make_base_body exactly, so results are bitwise identical.

    ``z_skip`` additionally skips (window-chunk x home-chunk) tiles
    whose z-cell bands cannot overlap within one cell: the packed
    layout is cell-id sorted, so both a home lane chunk and a window
    sublane chunk span contiguous z bands, and the pair mask's
    ``|czi - czj| <= 1`` gate (FluidGPU.cu:155's 27-cell stencil in
    column form) zeroes every pair of non-adjacent bands — the cond
    just skips computing those exact zeros, so results stay bitwise
    identical.  A uniform fill whose columns span many z cells only
    pays for the ~3 band-adjacent window chunks per home chunk."""
    assert b % hc == 0

    # Hoist the per-home invariants (lane slice, i_valid, the
    # _make_base_body closure with its cell-z precompute, the chunk's
    # z-cell band) out of window_body: they are identical for all 9
    # windows x w-chunks, so building them once per program instead of
    # per (window x chunk) pair keeps the chunked path's overhead to
    # the lax.cond dispatch.
    cs = jnp.float32(cfg.cell_size)
    zmin = jnp.float32(cfg.zmin)
    bodies = []
    for k in range(b // hc):
        hT = hmT[:, k * hc:(k + 1) * hc]
        i_valid = ((jax.lax.broadcasted_iota(
            jnp.int32, (1, hc), 1) + k * hc < h_count)
            & (hT[_ALIVE, :][None, :] > 0.5))
        band = None
        if z_skip:
            czi = jnp.floor((hT[_X + 2, :][None, :] - zmin) / cs)
            band = (jnp.min(jnp.where(i_valid, czi, jnp.float32(3e38))),
                    jnp.max(jnp.where(i_valid, czi, jnp.float32(-3e38))))
        bodies.append((_make_base_body(hT, i_valid, cfg,
                                       xy_cells=xy_cells), band))

    def window_body(acc, wj, w_count, r):
        if z_skip:
            czj = jnp.floor((wj[:, _X + 2:_X + 3] - zmin) / cs)
            j_valid = ((jax.lax.broadcasted_iota(
                jnp.int32, czj.shape, 0) < w_count)
                & (wj[:, _ALIVE:_ALIVE + 1] > 0.5))
            wlo = jnp.min(jnp.where(j_valid, czj, jnp.float32(3e38)))
            whi = jnp.max(jnp.where(j_valid, czj, jnp.float32(-3e38)))
        tiles = []
        for k, (body, band) in enumerate(bodies):
            pred = k * hc < h_count
            if z_skip:
                # empty bands carry +inf-like lo > -inf-like hi, so
                # the overlap test is False and the count check is
                # subsumed; kept anyway for the z_skip=False parity
                pred = pred & (wlo <= band[1] + 1.0) \
                    & (whi >= band[0] - 1.0)
            tiles.append(jax.lax.cond(
                pred,
                lambda body=body: body(jnp.zeros((4, hc), jnp.float32),
                                       wj, w_count, r),
                lambda: jnp.zeros((4, hc), jnp.float32)))
        return acc + jnp.concatenate(tiles, axis=1)

    return window_body


def _window_loop_banded(col_start, packed_hbm, cx, cy, win2, sems, *,
                        gx, gy, w_cap, process, accs):
    """_window_loop twin whose per-window callback receives the whole
    slot REF (``process(accs, win_ref, w_count, r)``) instead of
    per-chunk values — the banded path derives its own chunk ranges."""
    def rng(r):
        dx = r // 3 - 1
        dy = r % 3 - 1
        nx, ny = cx + dx, cy + dy
        ok = (nx >= 0) & (nx < gx) & (ny >= 0) & (ny < gy)
        ncc = jnp.clip(nx * gy + ny, 0, gx * gy - 1)
        w_start = col_start[ncc]
        w_count = jnp.minimum(
            jnp.where(ok, col_start[ncc + 1] - w_start, 0), w_cap)
        return w_start, w_count

    def copy(slot, w_start):
        return pltpu.make_async_copy(
            packed_hbm.at[pl.ds(w_start, w_cap)], win2.at[slot],
            sems.at[slot])

    w_start, w_count = rng(0)
    copy(0, w_start).start()
    for r in range(NCOLS):
        slot = r % 2
        if r + 1 < NCOLS:
            nxt = rng(r + 1)
            copy(1 - slot, nxt[0]).start()
        copy(slot, w_start).wait()
        accs = process(accs, win2.at[slot], w_count, r)
        if r + 1 < NCOLS:
            w_start, w_count = nxt
    return accs


def _column_body_banded(col_start, packed_hbm, out_ref, home, win2,
                        sems, *, t, cx, cy, h_start, h_count, gx, gy, b,
                        w_cap, cfg, w_chunk, h_chunk, xy_cells=False):
    """Home-lane-chunked column body with EXACT window row ranges
    instead of the cond-scanned z-band skip (r5).

    Both the home block and every window are cell-id sorted, so the
    rows stencil-adjacent to a home chunk's z band [z0, z1] form one
    CONTIGUOUS window range; counting rows with cz < z0-1 / cz <= z1+1
    (two batched (w_cap, K) compare+sum passes per window) yields the
    exact chunk range per home chunk, and the per-tile ``lax.cond``
    dispatches of the old z_skip path disappear entirely.  That
    matters more than the pruning itself: a cond costs ~100 ns on this
    chip even when skipped (measured r5), and the 2M-particle step was
    issuing ~5M of them — more than its entire pair math.  Results are
    bitwise identical to the unchunked tiles (skipped tiles would have
    contributed exact zeros through the |czi-czj| <= 1 pair gate, and
    edge-chunk extra rows still pass through that gate)."""
    cp = pltpu.make_async_copy(packed_hbm.at[pl.ds(h_start, b)], home,
                               sems.at[2])
    cp.start()
    cp.wait()
    hmT = home[...].T
    hc = h_chunk
    ch = w_chunk
    K = b // hc
    cs = jnp.float32(cfg.cell_size)
    zmin = jnp.float32(cfg.zmin)
    bodies, z0s, z1s = [], [], []
    for k in range(K):
        hT = hmT[:, k * hc:(k + 1) * hc]
        i_valid = ((jax.lax.broadcasted_iota(
            jnp.int32, (1, hc), 1) + k * hc < h_count)
            & (hT[_ALIVE, :][None, :] > 0.5))
        czi = jnp.floor((hT[_X + 2, :][None, :] - zmin) / cs)
        # empty chunks get an inverted band -> empty row range below
        z0s.append(jnp.min(jnp.where(i_valid, czi, jnp.float32(3e38))))
        z1s.append(jnp.max(jnp.where(i_valid, czi, jnp.float32(-3e38))))
        bodies.append(_make_base_body(hT, i_valid, cfg,
                                      xy_cells=xy_cells))
    z0v = jnp.stack(z0s).reshape(1, K)
    z1v = jnp.stack(z1s).reshape(1, K)

    def process(accs, win_ref, w_count, r):
        zj = jnp.floor((win_ref[:, _X + 2:_X + 3] - zmin) / cs)
        rv = (jax.lax.broadcasted_iota(jnp.int32, (w_cap, 1), 0)
              < w_count)
        lo = jnp.sum((rv & (zj < z0v - 1.0)).astype(jnp.int32), axis=0)
        hi = jnp.sum((rv & (zj <= z1v + 1.0)).astype(jnp.int32), axis=0)
        out = []
        for k in range(K):
            c0 = lo[k] // ch
            c1 = (hi[k] + ch - 1) // ch

            def chunk(i, a, k=k):
                wj = win_ref[pl.ds(i * ch, ch)]
                cnt = jnp.clip(w_count - i * ch, 0, ch)
                return bodies[k](a, wj, cnt, r)

            out.append(jax.lax.fori_loop(c0, c1, chunk, accs[k]))
        return out

    accs = [jnp.zeros((4, hc), jnp.float32) for _ in range(K)]
    accs = _window_loop_banded(col_start, packed_hbm, cx, cy, win2,
                               sems, gx=gx, gy=gy, w_cap=w_cap,
                               process=process, accs=accs)
    acc = jnp.concatenate(accs, axis=1)                    # (4, b)
    out_ref[...] = jnp.concatenate(
        [acc.T, jnp.zeros((b, F - 4), jnp.float32)], axis=1)


def _column_body(col_start, packed_hbm, out_ref, home, win2, sems, *,
                 t, cx, cy, h_start, h_count, gx, gy, b, w_cap, cfg,
                 w_chunk=0, h_chunk=0, z_skip=False, xy_cells=False):
    cp = pltpu.make_async_copy(packed_hbm.at[pl.ds(h_start, b)], home,
                               sems.at[2])
    cp.start()
    cp.wait()

    # one transpose per program: i-fields become rows -> (1, B) lane
    # vectors that broadcast over the j sublanes for free
    hmT = home[...].T                                     # (F, B)
    if h_chunk:
        window_body = _make_base_body_hc(hmT, h_count, b, cfg, h_chunk,
                                         z_skip=z_skip, xy_cells=xy_cells)
    else:
        i_valid = ((jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)
                    < h_count)
                   & (hmT[_ALIVE, :][None, :] > 0.5))
        window_body = _make_base_body(hmT, i_valid, cfg,
                                      xy_cells=xy_cells)

    acc = _window_loop(col_start, packed_hbm, cx, cy, win2, sems,
                       gx=gx, gy=gy, w_cap=w_cap, body_fn=window_body,
                       acc0=jnp.zeros((4, b), jnp.float32),
                       w_chunk=w_chunk)
    # tiles are written in (b, F) orientation (one transpose per
    # program) so the map back to particle order is a cheap row
    # gather — a (rows, g^2*b) column gather costs ~36 ns/element on
    # TPU and dominated the whole force pass before
    out_ref[...] = jnp.concatenate(
        [acc.T, jnp.zeros((b, F - 4), jnp.float32)], axis=1)


def _grid_extents(cfg: SPHConfig, grid):
    """(gx, gy) column-grid extents for a GridSpec (None = full cube).
    Columns run along z; the column id is lx * gy + cy."""
    if grid is None:
        return cfg.grid_size, cfg.grid_size
    return grid.x_planes, grid.g


def _pack_base_by_order(state: ParticleState, order, bt, pad: int):
    """Build the base packed kernel input directly from the UNSORTED
    pool with one row gather by ``order`` (binning.sort_tables mode):
    replaces permute_pool's 33-column gather + the field-by-field
    packing writes.  ``order=None``: the pool storage IS the kernel
    order (sort_by_cell / stale-tables mode) — no gather at all, the
    pack is a pure streaming write."""
    f32 = jnp.float32
    n = state.capacity
    cols = jnp.concatenate([
        state.pos, state.vel, state.dens[:, None], state.press[:, None],
        state.boundary.astype(f32)[:, None],
        state.alive.astype(f32)[:, None]], axis=1)          # (n, 10)
    rows = cols if order is None else cols[order]
    alive = rows[:, 9:10] * bt.in_dom.astype(f32)[:, None]
    rows = jnp.concatenate([rows[:, :9], alive], axis=1)
    return jnp.pad(rows, ((0, pad), (0, F - 10)))


def _merge_elig(state: ParticleState, cfg: SPHConfig):
    """Per-particle merge eligibility (forces.compute_forces semantics,
    FluidGPU-unidyn.cu:261): light fluid particle with last step's
    diffusion magnitude under the threshold."""
    prev_diff2 = jnp.sum(state.diffusion ** 2, axis=-1)
    return ((state.mass > 0) & (state.mass < 2) & (~state.boundary)
            & (prev_diff2 < cfg.merge_diffusion_max)
            & state.alive).astype(jnp.float32)


def _pack_unidyn_by_order(state: ParticleState, order, bt, pad: int,
                          cfg: SPHConfig):
    """Unidyn twin of _pack_base_by_order (layout of _pack_unidyn plus
    the sorted-order home_count/octant columns and, for merge-enabled
    configs, the eligibility/row-id columns)."""
    f32 = jnp.float32
    s = state
    n = s.capacity
    cols = jnp.concatenate([
        s.pos, s.vel, s.dens[:, None], s.press[:, None],
        s.boundary.astype(f32)[:, None], s.alive.astype(f32)[:, None],
        s.mass[:, None], s.solid[:, None], s.fluid[:, None],
        s.delpress, s.stress.reshape(n, 9)], axis=1)        # (n, 25)
    rows = cols if order is None else cols[order]
    if order is None:
        order_f = jnp.arange(n, dtype=f32)
        elig = _merge_elig(s, cfg)
    else:
        order_f = order.astype(f32)
        elig = _merge_elig(s, cfg)[order]
    alive = rows[:, 9:10] * bt.in_dom.astype(f32)[:, None]
    if cfg.merge_dist > 0:
        merge_cols = [elig[:, None], order_f[:, None]]
    else:
        merge_cols = [jnp.zeros((n, 2), f32)]
    rows = jnp.concatenate([
        rows[:, :9], alive, rows[:, 10:25],
        jnp.zeros((n, 6), f32),                 # _SDV/_FDV slots
        bt.home_count.astype(f32)[:, None],
        bt.octant.astype(f32)[:, None],
        *merge_cols], axis=1)                               # (n, 35)
    return jnp.pad(rows, ((0, pad), (0, F - 35)))


def base_forces_pallas(sorted_state: ParticleState, bt: BinTable,
                       cfg: SPHConfig, b: int = 128, w_cap: int = 128,
                       grid=None, order=None, w_chunk: int = 0,
                       h_chunk: int = 0, z_skip: bool = False,
                       xy_cells: bool = False):
    """Compute (sum_w, dpress, overflow) for the base variant with the
    column-window Pallas kernel.  ``sorted_state`` must be cell-sorted
    with the same ``grid`` (binning.GridSpec; None = full cube — a
    sharded x-slab passes its local GridSpec, tpufluids.shard.particles).

    With ``order`` given (binning.sort_tables mode), the state is the
    UNSORTED pool: the packed input is gathered by ``order`` and the
    results come back in pool order.  ``w_chunk`` > 0 processes window
    sublanes in population-proportional chunks (see _window_loop);
    ``h_chunk`` > 0 does the same for home LANES in static chunks of
    that size (``b`` is rounded up to a multiple of it; only the
    lane-register-aligned values 64 and 128 are validated — Mosaic may
    reject other lane-slice widths).  ``z_skip`` (requires h_chunk)
    skips pair tiles whose z-cell bands cannot be stencil-adjacent —
    bitwise identical, see _make_base_body_hc."""
    gx, gy = _grid_extents(cfg, grid)
    n = sorted_state.capacity
    if w_chunk:
        w_cap = -(-w_cap // w_chunk) * w_chunk
    if h_chunk:
        if h_chunk % 64:
            raise ValueError(
                f"h_chunk={h_chunk}: only multiples of 64 lanes are "
                "supported (64/128 validated)")
        b = -(-b // h_chunk) * h_chunk
    pad = max(b, w_cap)

    if order is not None:
        packed = _pack_base_by_order(sorted_state, order, bt, pad)
    else:
        packed = jnp.zeros((n + pad, F), jnp.float32)
        packed = packed.at[:n, _X:_X + 3].set(sorted_state.pos)
        packed = packed.at[:n, _V:_V + 3].set(sorted_state.vel)
        packed = packed.at[:n, _DENS].set(sorted_state.dens)
        packed = packed.at[:n, _PRESS].set(sorted_state.press)
        packed = packed.at[:n, _BND].set(
            sorted_state.boundary.astype(jnp.float32))
        packed = packed.at[:n, _ALIVE].set(
            (sorted_state.alive & bt.in_dom).astype(jnp.float32))

    # col_start[c] = first sorted row of column c (gy consecutive cells)
    col_start = bt.cell_start[0:gx * gy * gy + 1:gy]      # (gx*gy + 1,)
    col_count = col_start[1:] - col_start[:-1]
    overflow = jnp.sum(jnp.maximum(col_count - b, 0))

    kern = functools.partial(_sph_kernel, gx=gx, gy=gy, b=b, w_cap=w_cap,
                             cfg=cfg, w_chunk=w_chunk, h_chunk=h_chunk,
                             z_skip=z_skip, xy_cells=xy_cells)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(gx * gy,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        # tiles in (b, F) orientation: particle mapping is a row gather
        out_specs=pl.BlockSpec((b, F), lambda t, cs: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((b, F), jnp.float32),
            pltpu.VMEM((2, w_cap, F), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((gx * gy * b, F), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(col_start.astype(jnp.int32), packed)

    res = _tile_to_particle(out, bt, col_start, n, gx, gy, b,
                            order=order)
    return res[:, 0], res[:, 1:4], overflow


# ---------------------------------------------------------------------------
# unidyn variant: two kernel passes (drift velocities are accumulated in
# pass A and consumed in pass B — the deterministic resolution of the
# reference's atomic read-write race, see tpufluids/oracle.py)

# extended packed layout (columns 0-9 shared with the base layout)
_MASS, _SOLID, _FLUID, _DP, _SIG, _SDV, _FDV = 10, 11, 12, 13, 16, 25, 28
# sub-bin parity extras: home-cell population + octant id
_HCNT, _OCT = 31, 32
# merge extras: per-particle eligibility + the row id the partner must
# be reported as (pool index in sort_tables mode, sorted rank otherwise
# — whatever index space the caller's state lives in)
_ELIG, _ROW = 33, 34

# pass A output rows
_A_SUMW, _A_DP, _A_DIFF, _A_VG, _A_SA, _A_SDV, _A_FDV, _A_CNT = \
    0, 1, 4, 7, 16, 19, 22, 25
_A_ROWS = 26
# merge-enabled extras: best eligible pair distance (min-combined) and
# its partner row id (selected alongside) — the in-kernel twin of the
# reference's in-force-kernel merge (FluidGPU-unidyn.cu:261-275)
_A_BESTD, _A_BESTP = 26, 27
_A_ROWS_MERGE = 28
_MERGE_BIG = 3.0e38
# pass B output rows
_B_MA, _B_DSOL, _B_DFLU = 0, 3, 4
_B_ROWS = 5


def _pack_unidyn(sorted_state: ParticleState, bt: BinTable, pad: int):
    """Pack the unidyn field set into (n + pad, F) rows; pass B splices
    the drift-velocity columns into this buffer afterwards (see
    unidyn_forces_pallas)."""
    n = sorted_state.capacity
    s = sorted_state
    packed = jnp.zeros((n + pad, F), jnp.float32)
    packed = packed.at[:n, _X:_X + 3].set(s.pos)
    packed = packed.at[:n, _V:_V + 3].set(s.vel)
    packed = packed.at[:n, _DENS].set(s.dens)
    packed = packed.at[:n, _PRESS].set(s.press)
    packed = packed.at[:n, _BND].set(s.boundary.astype(jnp.float32))
    packed = packed.at[:n, _ALIVE].set(
        (s.alive & bt.in_dom).astype(jnp.float32))
    packed = packed.at[:n, _MASS].set(s.mass)
    packed = packed.at[:n, _SOLID].set(s.solid)
    packed = packed.at[:n, _FLUID].set(s.fluid)
    packed = packed.at[:n, _DP:_DP + 3].set(s.delpress)
    packed = packed.at[:n, _SIG:_SIG + 9].set(s.stress.reshape(n, 9))
    packed = packed.at[:n, _HCNT].set(bt.home_count.astype(jnp.float32))
    packed = packed.at[:n, _OCT].set(bt.octant.astype(jnp.float32))
    return packed


def _set_merge_cols(packed, state: ParticleState, bt, cfg: SPHConfig):
    if cfg.merge_dist <= 0:
        return packed
    n = state.capacity
    packed = packed.at[:n, _ELIG].set(_merge_elig(state, cfg))
    return packed.at[:n, _ROW].set(
        jnp.arange(n, dtype=jnp.float32))


def _unidyn_prologue(col_start, packed_hbm, home, sems, t, b):
    h_start = col_start[t]
    cp = pltpu.make_async_copy(packed_hbm.at[pl.ds(h_start, b)], home,
                               sems.at[2])
    cp.start()
    cp.wait()
    return home[...].T                                      # (F, B)


def _pair_geom(hmT, wj, czi, i_valid, j_valid, cfg, *, xy_cells=False,
               cxi=None, cyi=None):
    """Shared pair geometry on the (W, B) tile; returns a dict.

    ``xy_cells=True`` (row-block kernel) also computes per-pair x/y
    cell offsets (dxc/dyc) and masks pairs to the |dcx| <= 1 &
    |dcy| <= 1 stencil — the column kernel guarantees membership by
    window construction."""
    h = jnp.float32(cfg.cutoff)
    cs = jnp.float32(cfg.cell_size)

    def irow(c):
        return hmT[c, :][None, :]

    def jcol(c):
        return wj[:, c][:, None]

    rabx = irow(_X) - jcol(_X)
    raby = irow(_X + 1) - jcol(_X + 1)
    rabz = irow(_X + 2) - jcol(_X + 2)
    ds2 = rabx * rabx + raby * raby + rabz * rabz
    ds = jnp.sqrt(ds2)
    czj = jnp.floor((jcol(_X + 2) - cfg.zmin) / cs)
    dz_ok = jnp.abs(czi - czj) <= 1.0
    mask = (i_valid & j_valid & dz_ok & (ds > 0) & (ds <= 2 * h))
    dxc = dyc = None
    if xy_cells:
        dxc = jnp.floor((jcol(_X) - cfg.xmin) / cs) - cxi
        dyc = jnp.floor((jcol(_X + 1) - cfg.ymin) / cs) - cyi
        mask = mask & (jnp.abs(dxc) <= 1.0) & (jnp.abs(dyc) <= 1.0)
    ds_safe = jnp.where(ds > 0, ds, 1.0)
    vabx = irow(_V) - jcol(_V)
    vaby = irow(_V + 1) - jcol(_V + 1)
    vabz = irow(_V + 2) - jcol(_V + 2)
    d = vabx * rabx + vaby * raby + vabz * rabz
    dw = grad_w_spiky(ds, h)                 # FluidGPU.cu:35-43
    return dict(rab=(rabx, raby, rabz), vab=(vabx, vaby, vabz),
                ds=ds, ds2=ds2, ds_safe=ds_safe, d=d, mask=mask,
                dkf=dw / ds_safe, dzc=czj - czi, dxc=dxc, dyc=dyc,
                irow=irow, jcol=jcol)


def _subbin_mask(gm, irow, r, subbin_threshold):
    """Octant sub-bin pair predicate (parity with mykernel3's 8-cell
    stencil, FluidGPU-unidyn.cu:579-583): home particles in cells with
    population > threshold restrict their stencil to the per-axis
    offsets {0, dir_axis}, where dir is the half-cell octant direction
    (binning.octant: bit0 = x upper half, bit1 = y upper, bit2 = z
    LOWER — the reference's inverted z test).  dx/dy are static per
    window; dz varies per pair."""
    o = irow(_OCT)                              # (1, B) float 0..7
    overfull = irow(_HCNT) > subbin_threshold
    dirz = jnp.where(o >= 4, -1.0, 1.0)
    ok = (gm["dzc"] == 0.0) | (gm["dzc"] == dirz)
    dirx = jnp.where(jnp.mod(o, 2.0) >= 1.0, 1.0, -1.0)
    diry = jnp.where(jnp.mod(jnp.floor(o / 2.0), 2.0) >= 1.0,
                     1.0, -1.0)
    if r is None:
        # row-block kernel: dx/dy vary per pair (gm["dxc"]/["dyc"])
        ok = ok & ((gm["dxc"] == 0.0) | (gm["dxc"] == dirx))
        ok = ok & ((gm["dyc"] == 0.0) | (gm["dyc"] == diry))
        return ~overfull | ok
    dx = r // 3 - 1
    dy = r % 3 - 1
    if dx != 0:
        ok = ok & (dirx == dx)
    if dy != 0:
        ok = ok & (diry == dy)
    return ~overfull | ok


def _unidyn_kernel_a(col_start, packed_hbm, out_ref, home, win2, sems, *,
                     gx, gy, b, w_cap, cfg: SPHConfig,
                     subbin_threshold=None, w_chunk=0):
    t = pl.program_id(0)
    cx = t // gy
    cy = t % gy
    h_count = jnp.minimum(col_start[t + 1] - col_start[t], b)

    @pl.when(h_count > 0)
    def _():
        hmT = _unidyn_prologue(col_start, packed_hbm, home, sems, t, b)
        i_valid = ((jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)
                    < h_count) & (hmT[_ALIVE, :][None, :] > 0.5))
        window_body = _make_unidyn_a_body(hmT, i_valid, cfg,
                                          subbin_threshold)

        acc = _window_loop(col_start, packed_hbm, cx, cy, win2, sems,
                           gx=gx, gy=gy, w_cap=w_cap, body_fn=window_body,
                           acc0=_unidyn_a_acc0(b, cfg), w_chunk=w_chunk)
        nr = acc.shape[0]
        out_ref[...] = jnp.concatenate(
            [acc.T, jnp.zeros((b, F - nr), jnp.float32)], axis=1)


def _unidyn_a_acc0(b, cfg: SPHConfig):
    """Pass-A accumulator init: sum rows start at 0; merge-enabled
    configs append (best_dist = BIG, best_partner = -1) rows."""
    if cfg.merge_dist <= 0:
        return jnp.zeros((_A_ROWS, b), jnp.float32)
    return jnp.concatenate([
        jnp.zeros((_A_ROWS, b), jnp.float32),
        jnp.full((1, b), _MERGE_BIG, jnp.float32),
        jnp.full((1, b), -1.0, jnp.float32)], axis=0)


def _make_unidyn_a_body(hmT, i_valid, cfg, subbin_threshold,
                        xy_cells=False):
    """Pass-A pair body closure over the home block (shared by the
    column and row-block kernels)."""
    def irow(c):
        return hmT[c, :][None, :]

    h = jnp.float32(cfg.cutoff)
    cs = jnp.float32(cfg.cell_size)
    czi = jnp.floor((irow(_X + 2) - cfg.zmin) / cs)
    cxi = jnp.floor((irow(_X) - cfg.xmin) / cs) if xy_cells else None
    cyi = jnp.floor((irow(_X + 1) - cfg.ymin) / cs) if xy_cells else None
    bi = irow(_BND) > 0.5
    di, pi = irow(_DENS), irow(_PRESS)
    si, fi = irow(_SOLID), irow(_FLUID)
    mi = irow(_MASS)
    # mass fractions + mixture gate (FluidGPU-unidyn.cu:314-317)
    denom = cfg.rho0_sand * si + cfg.rho0 * fi
    denom = jnp.where(denom == 0, 1.0, denom)
    msf = si * cfg.rho0_sand / denom
    mff = fi * cfg.rho0 / denom
    gate_i = ((msf > cfg.mix_frac_min) & (msf < cfg.mix_frac_max)
              & (mff > cfg.mix_frac_min) & (mff < cfg.mix_frac_max))
    s_safe = jnp.where(si == 0, 1.0, si)
    f_safe = jnp.where(fi == 0, 1.0, fi)
    # Block-level activity flags (once per home block): the mixture /
    # granular / drift row groups are EXACTLY zero when their home-side
    # gates are all false — mixfactor needs a non-boundary home row
    # with solid > 0, the stress rows need nonzero home sigma, the
    # drift rows need a home row passing the mixture-fraction gate.
    # lax.cond skips their per-pair math then (the reference's own
    # tank scene never mixes: fluid seeds solid=0 and boundary pairs
    # are excluded by both_fluid, so every block skips all three
    # groups there — measured 7.2 -> ~4 ms/step, bench_unidyn_parts).
    has_mix = jnp.any(i_valid & (~bi) & (si > 0.0))
    has_sig = jnp.any(
        i_valid & (sum(jnp.abs(irow(_SIG + k)) for k in range(9)) > 0.0))
    has_gate = jnp.any(i_valid & gate_i)
    nl = hmT.shape[1]

    def window_body(acc, wj, w_count, r):
        def jcol(c):
            return wj[:, c][:, None]

        j_valid = ((jax.lax.broadcasted_iota(
            jnp.int32, (wj.shape[0], 1), 0)
                    < w_count) & (jcol(_ALIVE) > 0.5))
        gm = _pair_geom(hmT, wj, czi, i_valid, j_valid, cfg,
                        xy_cells=xy_cells, cxi=cxi, cyi=cyi)
        mask = gm["mask"]
        if subbin_threshold is not None:
            mask = mask & _subbin_mask(gm, irow, r, subbin_threshold)
        rabx, raby, rabz = gm["rab"]
        vabx, vaby, vabz = gm["vab"]
        ds, ds2, d, dkf = gm["ds"], gm["ds2"], gm["d"], gm["dkf"]

        def msum(x):
            return jnp.sum(jnp.where(mask, x, 0.0), axis=0)

        bj = jcol(_BND) > 0.5
        nb_bnd = (~bi) & bj
        both_fluid = (~bi) & (~bj)
        mj = jcol(_MASS)
        dj, pj = jcol(_DENS), jcol(_PRESS)
        sj, fj = jcol(_SOLID), jcol(_FLUID)

        wker = w_cubic(ds, h)            # FluidGPU.cu:11-21

        # unidyn viscosity (FluidGPU-unidyn.cu:307)
        mu = h * (d / (ds2 + 0.01 * h * h))
        alpha_i = (si * 9.0 + 1.0) * cfg.alpha_fluid
        bfac = 1.0 + nb_bnd * ((1.0 + 3.0 * fi * fi)
                               * cfg.alpha_sand_boundary)
        rho_bar = (di + dj) / 2.0
        s = (alpha_i * cfg.sound
             * (mi * mu + cfg.visc_quadratic / cfg.sound * mu * mu)
             / rho_bar * (d < 0) * bfac)
        p_term = pj / (dj * dj) + pi / (di * di) + s
        pk = p_term * dkf * mj

        rows = [msum(wker * (1.0 + nb_bnd * cfg.bdensfactor) * mj),
                msum(pk * rabx), msum(pk * raby), msum(pk * rabz)]
        # diffusion / color gradient (FluidGPU-unidyn.cu:364-366)
        dfac = jnp.where(both_fluid, mj / dj, 0.0) * dkf
        rows += [msum(dfac * rabx), msum(dfac * raby), msum(dfac * rabz)]
        rab = (rabx, raby, rabz)
        vab = (vabx, vaby, vabz)

        def vg_sa_rows(_):
            # mixfactor-gated velocity gradient
            # (FluidGPU-unidyn.cu:368-377)
            mixfactor = jnp.where(
                both_fluid & (si > 0) & (sj > 0),
                2.0 * si * sj / (si + sj + cfg.mixfactor_reg), 0.0)
            out = [msum(-mixfactor * vab[bb] * dkf * rab[a])
                   for a in range(3) for bb in range(3)]
            # stress acceleration (FluidGPU-unidyn.cu:379-381); sigma_i
            # is per-home-particle, so the contraction is over lanes
            for a in range(3):
                term = dkf * (irow(_SIG + 3 * a) * rabx
                              + irow(_SIG + 3 * a + 1) * raby
                              + irow(_SIG + 3 * a + 2) * rabz)
                out.append(msum((1.0 + mixfactor) * term))
            return jnp.stack(out, axis=0)

        def drift_rows(_):
            # drift velocities (pass A; FluidGPU-unidyn.cu:314-356)
            g3 = mask & both_fluid & gate_i
            sg = [(sj - si) * dkf * r for r in rab]
            fg = [(fj - fi) * dkf * r for r in rab]
            A_ = [(si * pi - sj * pj) * dkf * r for r in rab]
            B_ = [(fi * pi - fj * pj) * dkf * r for r in rab]
            v_dk = dkf * (irow(_V) * rabx + irow(_V + 1) * raby
                          + irow(_V + 2) * rabz)
            s_pref = di * (si - msf * si - mff * fi)
            f_pref = di * (fi - msf * si - mff * fi)
            grav = (0.0, 0.0, cfg.gravity)
            sdv_rows, fdv_rows = [], []
            for a in range(3):
                body = ((150.0 / di) * irow(_DP + a) + grav[a]
                        - v_dk * vab[a])
                sbrown = sg[a] / s_safe * (1 - msf) - mff * fg[a] / f_safe
                fbrown = fg[a] / f_safe * (1 - mff) - msf * sg[a] / s_safe
                sslip = A_[a] * (1 - msf) - mff * B_[a]
                fslip = B_[a] * (1 - mff) - msf * A_[a]
                sdv_rows.append(jnp.sum(jnp.where(
                    g3, cfg.mixpressure * (s_pref * body + sslip)
                    - cfg.mixbrownian * sbrown, 0.0), axis=0))
                fdv_rows.append(jnp.sum(jnp.where(
                    g3, cfg.mixpressure * (f_pref * body + fslip)
                    - cfg.mixbrownian * fbrown, 0.0), axis=0))
            return jnp.stack(sdv_rows + fdv_rows, axis=0)

        vgsa = jax.lax.cond(has_mix | has_sig, vg_sa_rows,
                            lambda _: jnp.zeros((12, nl), jnp.float32), 0)
        drift = jax.lax.cond(has_gate, drift_rows,
                             lambda _: jnp.zeros((6, nl), jnp.float32), 0)
        delta = jnp.concatenate(
            [jnp.stack(rows, axis=0), vgsa, drift,
             msum(jnp.ones_like(ds))[None]], axis=0)
        if cfg.merge_dist <= 0:
            return acc + delta

        # in-kernel merge partner search (FluidGPU-unidyn.cu:261-275):
        # nearest eligible neighbor within merge_dist, min-combined
        # across windows/chunks with its row id selected alongside.
        # Ties: equal distances keep the earlier window / lower row id
        # (the same stencil-run order as the XLA candidate argmin).
        summed = acc[:_A_ROWS] + delta
        elig_pair = (mask & (ds <= cfg.merge_dist)
                     & (irow(_ELIG) > 0.5) & (jcol(_ELIG) > 0.5))
        big = jnp.float32(_MERGE_BIG)
        dmask = jnp.where(elig_pair, ds, big)
        wbest = jnp.min(dmask, axis=0)                       # (B,)
        rowj = jcol(_ROW) * jnp.ones_like(ds)
        pmin = jnp.min(jnp.where(dmask == wbest[None, :], rowj, big),
                       axis=0)
        better = wbest < acc[_A_BESTD]
        best_d = jnp.where(better, wbest, acc[_A_BESTD])
        best_p = jnp.where(better, jnp.where(pmin < big, pmin, -1.0),
                           acc[_A_BESTP])
        return jnp.concatenate(
            [summed, best_d[None, :], best_p[None, :]], axis=0)

    return window_body


def _unidyn_kernel_b(col_start, packed_hbm, out_ref, home, win2, sems, *,
                     gx, gy, b, w_cap, cfg: SPHConfig,
                     subbin_threshold=None, w_chunk=0):
    t = pl.program_id(0)
    cx = t // gy
    cy = t % gy
    h_count = jnp.minimum(col_start[t + 1] - col_start[t], b)

    @pl.when(h_count > 0)
    def _():
        hmT = _unidyn_prologue(col_start, packed_hbm, home, sems, t, b)
        i_valid = ((jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)
                    < h_count) & (hmT[_ALIVE, :][None, :] > 0.5))
        window_body = _make_unidyn_b_body(hmT, i_valid, cfg,
                                          subbin_threshold)

        acc = _window_loop(col_start, packed_hbm, cx, cy, win2, sems,
                           gx=gx, gy=gy, w_cap=w_cap, body_fn=window_body,
                           acc0=jnp.zeros((_B_ROWS, b), jnp.float32),
                           w_chunk=w_chunk)
        out_ref[...] = jnp.concatenate(
            [acc.T, jnp.zeros((b, F - _B_ROWS), jnp.float32)], axis=1)


def _make_unidyn_b_body(hmT, i_valid, cfg, subbin_threshold,
                        xy_cells=False):
    """Pass-B pair body closure over the home block (shared by the
    column and row-block kernels)."""
    def irow(c):
        return hmT[c, :][None, :]

    cs = jnp.float32(cfg.cell_size)
    czi = jnp.floor((irow(_X + 2) - cfg.zmin) / cs)
    cxi = jnp.floor((irow(_X) - cfg.xmin) / cs) if xy_cells else None
    cyi = jnp.floor((irow(_X + 1) - cfg.ymin) / cs) if xy_cells else None
    bi = irow(_BND) > 0.5
    di = irow(_DENS)
    si, fi = irow(_SOLID), irow(_FLUID)
    sdvi = [irow(_SDV + a) for a in range(3)]
    fdvi = [irow(_FDV + a) for a in range(3)]
    # block-level flag: every pass-B drift term carries an sdv/fdv
    # factor, so when the home block AND the current window chunk hold
    # only zero drift (pure-phase flows — incl. the reference's own
    # tank scene), only the boundary-gated divergence part of the
    # phase-transport rows survives; lax.cond skips the rest exactly
    home_drift = jnp.any(
        i_valid & (sum(jnp.abs(irow(_SDV + k)) for k in range(6)) > 0.0))
    nl = hmT.shape[1]

    def window_body(acc, wj, w_count, r):
        def jcol(c):
            return wj[:, c][:, None]

        j_valid = ((jax.lax.broadcasted_iota(
            jnp.int32, (wj.shape[0], 1), 0)
                    < w_count) & (jcol(_ALIVE) > 0.5))
        gm = _pair_geom(hmT, wj, czi, i_valid, j_valid, cfg,
                        xy_cells=xy_cells, cxi=cxi, cyi=cyi)
        mask = gm["mask"]
        if subbin_threshold is not None:
            mask = mask & _subbin_mask(gm, irow, r, subbin_threshold)
        rab = gm["rab"]
        vab = gm["vab"]
        dkf = gm["dkf"]

        def msum(x):
            return jnp.sum(jnp.where(mask, x, 0.0), axis=0)

        bj = jcol(_BND) > 0.5
        both_fluid = (~bi) & (~bj)
        dj = jcol(_DENS)
        sj, fj = jcol(_SOLID), jcol(_FLUID)
        dk_vab = dkf * sum(rab[a] * vab[a] for a in range(3))
        # conservative chunk check: rows past w_count may force the
        # full path (stale slot contents) but never the reverse
        chunk_drift = jnp.any(jnp.abs(wj[:, _SDV:_SDV + 6]) > 0.0)

        def full_rows(_):
            sdvj = [jcol(_SDV + a) for a in range(3)]
            fdvj = [jcol(_FDV + a) for a in range(3)]
            ds_i = dkf * sum(sdvi[a] * rab[a] for a in range(3))
            ds_j = dkf * sum(sdvj[a] * rab[a] for a in range(3))
            df_i = dkf * sum(fdvi[a] * rab[a] for a in range(3))
            df_j = dkf * sum(fdvj[a] * rab[a] for a in range(3))
            rows = []
            # mixture acceleration (FluidGPU-unidyn.cu:391-398)
            for a in range(3):
                term = (sj * dj * (sj * sdvj[a] * ds_j
                                   + si * sdvi[a] * ds_i)
                        + fj * dj * (fj * fdvj[a] * df_j
                                     + fi * fdvi[a] * df_i))
                rows.append(msum(-term / (di * dj)))
            # phase transport (FluidGPU-unidyn.cu:400-401): divergence
            # part boundary-gated, drift part ungated (reference
            # precedence)
            drift_s = dkf * sum((si * sdvi[a] + sj * sdvj[a]) * rab[a]
                                for a in range(3))
            drift_f = dkf * sum((fi * fdvi[a] + fj * fdvj[a]) * rab[a]
                                for a in range(3))
            rows.append(msum(jnp.where(both_fluid, 1.0, 0.0)
                             * (-0.5 / dj) * (si + sj) * dk_vab
                             + (-drift_s) / dj))
            rows.append(msum(jnp.where(both_fluid, 1.0, 0.0)
                             * (-0.5 / dj) * (fi + fj) * dk_vab
                             + (-drift_f) / dj))
            return jnp.stack(rows, axis=0)

        def divergence_only(_):
            div_s = msum(jnp.where(both_fluid, 1.0, 0.0)
                         * (-0.5 / dj) * (si + sj) * dk_vab)
            div_f = msum(jnp.where(both_fluid, 1.0, 0.0)
                         * (-0.5 / dj) * (fi + fj) * dk_vab)
            return jnp.concatenate(
                [jnp.zeros((3, nl), jnp.float32), div_s[None],
                 div_f[None]], axis=0)

        return acc + jax.lax.cond(home_drift | chunk_drift,
                                  full_rows, divergence_only, 0)

    return window_body


def _extract_merge_partner(res_a, cfg: SPHConfig, n: int):
    """Partner row ids from the pass-A result rows.  Rows that fell
    outside their tile (overflow / out-of-domain) read back as 0.0 in
    every column, so the pair-count row gates them to -1 (a particle
    with zero pairs cannot have an eligible partner)."""
    if cfg.merge_dist <= 0:
        return jnp.full((n,), -1, jnp.int32)
    mp = res_a[:, _A_BESTP]
    return jnp.where((res_a[:, _A_CNT] > 0) & (mp >= 0),
                     mp.astype(jnp.int32), -1)


def _run_column_kernel(kern_fn, col_start, packed, gx, gy, b, w_cap, cfg,
                       **kern_kw):
    kern = functools.partial(kern_fn, gx=gx, gy=gy, b=b, w_cap=w_cap,
                             cfg=cfg, **kern_kw)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(gx * gy,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((b, F), lambda t, cs: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((b, F), jnp.float32),
            pltpu.VMEM((2, w_cap, F), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((gx * gy * b, F), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(col_start.astype(jnp.int32), packed)


def _tile_to_particle(out, bt, col_start, n, gx, gy, b, order=None):
    """Map (gx*gy*b, F) tile rows back to particle order with ONE row
    gather (per-index cost, independent of row width — the same trick
    as forces.pair_geometry's packed gather).  With ``order`` given
    (sort_tables mode) the result lands in the UNSORTED pool order."""
    num_cells = gx * gy * gy
    cid = jnp.clip(bt.cid, 0, num_cells)
    col_of = jnp.minimum(cid // gy, gx * gy - 1)
    rank = jnp.arange(n, dtype=jnp.int32) - col_start[col_of]
    valid = (bt.cid < num_cells) & (rank >= 0) & (rank < b)
    rows = jnp.where(valid, col_of * b + jnp.clip(rank, 0, b - 1), 0)
    if order is not None:
        # original row order[r] holds sorted rank r: compose the tile
        # lookup with the inverse permutation (small int gathers)
        inv = jnp.zeros((n,), jnp.int32).at[order].set(
            jnp.arange(n, dtype=jnp.int32))
        rows = rows[inv]
        valid = valid[inv]
    return jnp.where(valid[:, None], out[rows], 0.0)          # (n, F)


def unidyn_forces_pallas(sorted_state: ParticleState, bt: BinTable,
                         cfg: SPHConfig, b: int = 128, w_cap: int = 128,
                         grid=None, drift_fix=None,
                         subbin_threshold=None, order=None,
                         w_chunk: int = 0):
    """Full unidyn pair accumulation with the column-window kernels.

    NOT itself jitted: callers run it inside their own jit (step.sph_step,
    shard.particles.one_step) — the sharded ``drift_fix`` closure
    captures caller-trace values, which an inner jit boundary would
    turn into leaked tracers.

    Returns a dict with every ForceAccum pair field plus has_pair and
    the column overflow count.  The per-particle granular pass and the
    merge/split triggers stay in XLA (tpufluids.forces semantics).

    ``grid``: binning.GridSpec the state was sorted with (None = full
    cube).  ``drift_fix``: optional (sdv, fdv) -> (sdv, fdv) hook run
    between pass A and pass B — the spatial-decomposition point where
    halo particles' locally-incomplete drift velocities are replaced by
    owner-computed values (same contract as forces.compute_forces).
    """
    gx, gy = _grid_extents(cfg, grid)
    n = sorted_state.capacity
    if w_chunk:
        w_cap = -(-w_cap // w_chunk) * w_chunk
    pad = max(b, w_cap)
    col_start = bt.cell_start[0:gx * gy * gy + 1:gy]
    col_count = col_start[1:] - col_start[:-1]
    overflow = jnp.sum(jnp.maximum(col_count - b, 0))

    if order is not None:
        packed = _pack_unidyn_by_order(sorted_state, order, bt, pad, cfg)
    else:
        packed = _set_merge_cols(_pack_unidyn(sorted_state, bt, pad),
                                 sorted_state, bt, cfg)
    out_a = _run_column_kernel(_unidyn_kernel_a, col_start, packed,
                               gx, gy, b, w_cap, cfg,
                               subbin_threshold=subbin_threshold,
                               w_chunk=w_chunk)
    res_a = _tile_to_particle(out_a, bt, col_start, n, gx, gy, b,
                              order=order)
    sdv = res_a[:, _A_SDV:_A_SDV + 3]
    fdv = res_a[:, _A_FDV:_A_FDV + 3]
    if drift_fix is not None:
        sdv, fdv = drift_fix(sdv, fdv)

    # pass B reuses pass A's packed buffer with the drift-velocity
    # columns spliced in (a full repack costs ~1.2 ms at 14k particles).
    # In order mode the drifts are in pool order; the kernel buffer is
    # sorted — gather them back by order for the splice.
    sdv_s = sdv if order is None else sdv[order]
    fdv_s = fdv if order is None else fdv[order]
    packed_b = packed.at[:n, _SDV:_SDV + 3].set(sdv_s)
    packed_b = packed_b.at[:n, _FDV:_FDV + 3].set(fdv_s)
    out_b = _run_column_kernel(_unidyn_kernel_b, col_start, packed_b,
                               gx, gy, b, w_cap, cfg,
                               subbin_threshold=subbin_threshold,
                               w_chunk=w_chunk)
    res_b = _tile_to_particle(out_b, bt, col_start, n, gx, gy, b,
                              order=order)

    dens = sorted_state.dens
    return dict(
        sum_w=res_a[:, _A_SUMW],
        dpress=res_a[:, _A_DP:_A_DP + 3],
        diffusion=res_a[:, _A_DIFF:_A_DIFF + 3],
        vel_grad=(res_a[:, _A_VG:_A_VG + 9]
                  / dens[:, None]).reshape(n, 3, 3),
        stress_accel=res_a[:, _A_SA:_A_SA + 3] / (dens * dens)[:, None],
        solid_drift=sdv,
        fluid_drift=fdv,
        mixture_accel=res_b[:, _B_MA:_B_MA + 3],
        delsolid=res_b[:, _B_DSOL],
        delfluid=res_b[:, _B_DFLU],
        has_pair=res_a[:, _A_CNT] > 0,
        merge_partner=_extract_merge_partner(res_a, cfg, n),
        overflow=overflow,
    )


# ---------------------------------------------------------------------------
# row-block kernels: home blocks are RB consecutive rows of the SORTED
# pool (not one grid column), so home-lane utilization is ~100%
# regardless of column population and there is NO capacity cap at all —
# every particle is processed, overflow cannot occur.  The stencil
# candidates of a block are 3-5 contiguous sorted ranges (the x-rows
# [cx_min-1, cx_max+1] restricted to columns [cy_min-1, cy_max+1]),
# streamed in population-proportional sublane chunks; per-pair
# |dcx| <= 1 & |dcy| <= 1 cell masks replace the column kernel's
# window-construction guarantee.  Same pair math (shared body
# builders), same accumulation order per home particle row-major over
# the ranges — deterministic.

RB = 128     # default home rows per block (= lane width; rb kwarg
             # accepts multiples of 128 — wider blocks halve the block
             # count and candidate re-streaming at ~20% more pair slots)


def _rowblock_sweep(col_start, packed_hbm, wbuf2, sems, body_fn, acc0,
                    cx_min, cx_max, cy_min, cy_max, *, gx, gy, ch,
                    zband=None, cfg=None):
    """Sweep one home block's candidate ranges.  Chunks of ``ch``
    sublane rows stream through two VMEM slots with a static-slot
    software pipeline (wait k, compute k, prefetch k+2); chunks beyond
    the range compute with count 0 (where-masks zero garbage).

    ``zband`` = (z_cell_min, z_cell_max) of the home block: when given,
    chunks whose valid rows' z-cell band cannot be stencil-adjacent to
    it are cond-skipped — the pair mask's ``|czi - czj| <= 1`` gate
    (_pair_geom) zeroes every such pair, so the skipped tile would
    have contributed exact zeros.  The DMA still runs (the prefetch
    pipeline needs static slots); only the VPU pair math is saved."""
    c_lo_y = jnp.maximum(cy_min - 1, 0)
    c_hi_y = jnp.minimum(cy_max + 1, gy - 1)
    xr_lo = jnp.maximum(cx_min - 1, 0)
    xr_hi = jnp.minimum(cx_max + 1, gx - 1)

    def call_body(acc, slot, cnt):
        if zband is None:
            return body_fn(acc, wbuf2[slot], cnt, None)
        wj = wbuf2[slot]
        czj = jnp.floor((wj[:, _X + 2:_X + 3] - cfg.zmin)
                        / jnp.float32(cfg.cell_size))
        jv = ((jax.lax.broadcasted_iota(jnp.int32, czj.shape, 0) < cnt)
              & (wj[:, _ALIVE:_ALIVE + 1] > 0.5))
        wlo = jnp.min(jnp.where(jv, czj, jnp.float32(3e38)))
        whi = jnp.max(jnp.where(jv, czj, jnp.float32(-3e38)))
        return jax.lax.cond(
            (wlo <= zband[1] + 1.0) & (whi >= zband[0] - 1.0),
            lambda a: body_fn(a, wj, cnt, None), lambda a: a, acc)

    def row_body(xr, acc):
        start = col_start[xr * gy + c_lo_y]
        nrows = col_start[xr * gy + c_hi_y + 1] - start
        nc = (nrows + ch - 1) // ch

        def copy(i, slot):
            return pltpu.make_async_copy(
                packed_hbm.at[pl.ds(start + i * ch, ch)],
                wbuf2.at[slot], sems.at[slot])

        @pl.when(nc > 0)
        def _():
            copy(0, 0).start()

        @pl.when(nc > 1)
        def _():
            copy(1, 1).start()

        def chunk2(k, acc):
            i0 = 2 * k
            copy(i0, 0).wait()
            acc = call_body(acc, 0, jnp.clip(nrows - i0 * ch, 0, ch))

            @pl.when(i0 + 2 < nc)
            def _():
                copy(i0 + 2, 0).start()

            @pl.when(i0 + 1 < nc)
            def _():
                copy(i0 + 1, 1).wait()

            acc = call_body(acc, 1,
                            jnp.clip(nrows - (i0 + 1) * ch, 0, ch))

            @pl.when(i0 + 3 < nc)
            def _():
                copy(i0 + 3, 1).start()

            return acc

        return jax.lax.fori_loop(0, (nc + 1) // 2, chunk2, acc)

    return jax.lax.fori_loop(xr_lo, xr_hi + 1, row_body, acc0)


def _rowblock_prologue(col_start, packed_hbm, home, sems, blk, cfg, rb,
                       gx, gy):
    """Load the home block, derive lane validity and the block's cell
    bounding box.

    The x-plane range comes from ``col_start`` (the planes whose sorted
    row ranges intersect [blk, blk+rb)) in LOCAL plane ids, so the same
    kernel serves the full cube and a sharded x-slab whose global
    x_offset is a traced value (binning.GridSpec); the y range comes
    from positions (y is never sharded, global == local)."""
    cp = pltpu.make_async_copy(packed_hbm.at[pl.ds(blk, rb)], home,
                               sems.at[2])
    cp.start()
    cp.wait()
    hmT = home[...].T
    i_valid = hmT[_ALIVE, :][None, :] > 0.5
    cs = jnp.float32(cfg.cell_size)
    cyi = jnp.floor((hmT[_X + 1, :][None, :] - cfg.ymin) / cs)
    big = jnp.float32(1e9)
    cy_min = jnp.min(jnp.where(i_valid, cyi, big)).astype(jnp.int32)
    cy_max = jnp.max(jnp.where(i_valid, cyi, -big)).astype(jnp.int32)
    czi = jnp.floor((hmT[_X + 2, :][None, :] - cfg.zmin) / cs)
    zband = (jnp.min(jnp.where(i_valid, czi, jnp.float32(3e38))),
             jnp.max(jnp.where(i_valid, czi, jnp.float32(-3e38))))

    def plane_body(xr, lohi):
        lo, hi = lohi
        inter = ((col_start[(xr + 1) * gy] > blk)
                 & (col_start[xr * gy] < blk + rb))
        return (jnp.where(inter, jnp.minimum(lo, xr), lo),
                jnp.where(inter, jnp.maximum(hi, xr), hi))

    cx_min, cx_max = jax.lax.fori_loop(
        0, gx, plane_body,
        (jnp.int32(gx), jnp.int32(-1)))
    return hmT, i_valid, cx_min, cx_max, cy_min, cy_max, zband


def _base_rowblock_kernel(col_start, packed_hbm, out_hbm, home, wbuf2,
                          otile, sems, *, gx, gy, ch, cfg, rb,
                          z_skip=False):
    q = pl.program_id(0)
    blk = q * rb
    total = col_start[gx * gy]

    @pl.when(blk < total)
    def _():
        hmT, i_valid, cx_min, cx_max, cy_min, cy_max, zband = \
            _rowblock_prologue(col_start, packed_hbm, home, sems, blk,
                               cfg, rb, gx, gy)
        body = _make_base_body(hmT, i_valid, cfg, xy_cells=True)
        acc = _rowblock_sweep(col_start, packed_hbm, wbuf2, sems, body,
                              jnp.zeros((4, rb), jnp.float32),
                              cx_min, cx_max, cy_min, cy_max,
                              gx=gx, gy=gy, ch=ch,
                              zband=zband if z_skip else None, cfg=cfg)
        otile[...] = jnp.concatenate(
            [acc.T, jnp.zeros((rb, F - 4), jnp.float32)], axis=1)
        ocp = pltpu.make_async_copy(otile, out_hbm.at[pl.ds(blk, rb)],
                                    sems.at[2])
        ocp.start()
        ocp.wait()


def _unidyn_rowblock_kernel_a(col_start, packed_hbm, out_hbm, home,
                              wbuf2, otile, sems, *, gx, gy, ch, cfg, rb,
                              subbin_threshold=None):
    q = pl.program_id(0)
    blk = q * rb
    total = col_start[gx * gy]

    @pl.when(blk < total)
    def _():
        hmT, i_valid, cx_min, cx_max, cy_min, cy_max, _zb = \
            _rowblock_prologue(col_start, packed_hbm, home, sems, blk,
                               cfg, rb, gx, gy)
        body = _make_unidyn_a_body(hmT, i_valid, cfg, subbin_threshold,
                                   xy_cells=True)
        acc = _rowblock_sweep(col_start, packed_hbm, wbuf2, sems, body,
                              _unidyn_a_acc0(rb, cfg),
                              cx_min, cx_max, cy_min, cy_max,
                              gx=gx, gy=gy, ch=ch)
        nr = acc.shape[0]
        otile[...] = jnp.concatenate(
            [acc.T, jnp.zeros((rb, F - nr), jnp.float32)], axis=1)
        ocp = pltpu.make_async_copy(otile, out_hbm.at[pl.ds(blk, rb)],
                                    sems.at[2])
        ocp.start()
        ocp.wait()


def _unidyn_rowblock_kernel_b(col_start, packed_hbm, out_hbm, home,
                              wbuf2, otile, sems, *, gx, gy, ch, cfg, rb,
                              subbin_threshold=None):
    q = pl.program_id(0)
    blk = q * rb
    total = col_start[gx * gy]

    @pl.when(blk < total)
    def _():
        hmT, i_valid, cx_min, cx_max, cy_min, cy_max, _zb = \
            _rowblock_prologue(col_start, packed_hbm, home, sems, blk,
                               cfg, rb, gx, gy)
        body = _make_unidyn_b_body(hmT, i_valid, cfg, subbin_threshold,
                                   xy_cells=True)
        acc = _rowblock_sweep(col_start, packed_hbm, wbuf2, sems, body,
                              jnp.zeros((_B_ROWS, rb), jnp.float32),
                              cx_min, cx_max, cy_min, cy_max,
                              gx=gx, gy=gy, ch=ch)
        otile[...] = jnp.concatenate(
            [acc.T, jnp.zeros((rb, F - _B_ROWS), jnp.float32)], axis=1)
        ocp = pltpu.make_async_copy(otile, out_hbm.at[pl.ds(blk, rb)],
                                    sems.at[2])
        ocp.start()
        ocp.wait()


def _run_rowblock_kernel(kern_fn, col_start, packed, n, gx, gy, ch, cfg,
                         rb=RB, **kern_kw):
    kern = functools.partial(kern_fn, gx=gx, gy=gy, ch=ch, cfg=cfg,
                             rb=rb, **kern_kw)
    nb = (n + rb - 1) // rb
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((rb, F), jnp.float32),
            pltpu.VMEM((2, ch, F), jnp.float32),
            pltpu.VMEM((rb, F), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(packed.shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(col_start.astype(jnp.int32), packed)


def _rows_to_particle(out, bt, n, order):
    """Row-block results land at sorted row indices directly; mask the
    sentinel tail and (order mode) compose with the inverse
    permutation."""
    valid = bt.in_dom
    res = out[:n]
    if order is None:
        return jnp.where(valid[:, None], res, 0.0)
    inv = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    return jnp.where(valid[inv][:, None], res[inv], 0.0)


def base_forces_rowblock(state: ParticleState, bt: BinTable,
                         cfg: SPHConfig, order=None, w_chunk: int = 32,
                         rb: int = RB, grid=None,
                         z_skip: bool = False):
    """Base-variant forces with the row-block kernel.  ``grid``: the
    binning.GridSpec the state was sorted with (None = full cube; a
    sharded x-slab passes its local GridSpec — the home-block plane
    range is derived from col_start in local plane ids, so a traced
    x_offset is fine).  ``z_skip`` cond-skips candidate chunks whose
    z-cell band is not stencil-adjacent to the home block's (see
    _rowblock_sweep; the pair mask zeroes those chunks anyway).
    Returns (sum_w, dpress, overflow==0) like base_forces_pallas."""
    gx, gy = _grid_extents(cfg, grid)
    n = state.capacity
    ch = w_chunk or 32
    pad = max(rb, ch)
    packed = _pack_base_by_order(state, order, bt, pad)
    col_start = bt.cell_start[0:gx * gy * gy + 1:gy]
    out = _run_rowblock_kernel(_base_rowblock_kernel, col_start, packed,
                               n, gx, gy, ch, cfg, rb=rb, z_skip=z_skip)
    res = _rows_to_particle(out, bt, n, order)
    return res[:, 0], res[:, 1:4], jnp.zeros((), jnp.int32)


# ---------------------------------------------------------------------------
# whole-pool-VMEM-resident fused unidyn kernel: for pools that fit in
# VMEM (the reference tank is 14k rows x 512 B = 7.3 MB), BOTH passes
# run inside ONE pallas_call — the packed pool streams to VMEM once,
# pass A's drift velocities are spliced into the resident pool's
# _SDV/_FDV columns between the sweeps (pass A never reads those
# columns, so in-place splicing during sweep 1 is safe), and pass B
# reads them straight from VMEM.  This removes the second dispatch,
# the inter-pass HBM round trip (res_a write + order gather + packed_b
# splice + reload) and all per-window HBM re-streaming — the
# deterministic two-pass resolution of the reference's single-kernel
# atomic read-write race (FluidGPU-unidyn.cu:314-401) at close to
# single-pass cost.  Single-device only (the sharded step's drift_fix
# hook needs the passes split at the XLA level).

RESIDENT_MAX_BYTES = 48 * 1024 * 1024   # pool VMEM budget for the tier


def _resident_prologue(pool, col_start, blk, cfg, rb, gx, gy):
    """_rowblock_prologue twin on the VMEM-resident pool (no DMA)."""
    hmT = pool[pl.ds(blk, rb)].T
    i_valid = hmT[_ALIVE, :][None, :] > 0.5
    cs = jnp.float32(cfg.cell_size)
    cyi = jnp.floor((hmT[_X + 1, :][None, :] - cfg.ymin) / cs)
    big = jnp.float32(1e9)
    cy_min = jnp.min(jnp.where(i_valid, cyi, big)).astype(jnp.int32)
    cy_max = jnp.max(jnp.where(i_valid, cyi, -big)).astype(jnp.int32)

    def plane_body(xr, lohi):
        lo, hi = lohi
        inter = ((col_start[(xr + 1) * gy] > blk)
                 & (col_start[xr * gy] < blk + rb))
        return (jnp.where(inter, jnp.minimum(lo, xr), lo),
                jnp.where(inter, jnp.maximum(hi, xr), hi))

    cx_min, cx_max = jax.lax.fori_loop(
        0, gx, plane_body, (jnp.int32(gx), jnp.int32(-1)))
    return hmT, i_valid, cx_min, cx_max, cy_min, cy_max


def _resident_sweep(col_start, pool, body_fn, acc0, cx_min, cx_max,
                    cy_min, cy_max, *, gx, gy, ch):
    """_rowblock_sweep twin reading candidate chunks straight from the
    VMEM-resident pool (no DMA pipeline to software-schedule)."""
    c_lo_y = jnp.maximum(cy_min - 1, 0)
    c_hi_y = jnp.minimum(cy_max + 1, gy - 1)
    xr_lo = jnp.maximum(cx_min - 1, 0)
    xr_hi = jnp.minimum(cx_max + 1, gx - 1)

    def row_body(xr, acc):
        start = col_start[xr * gy + c_lo_y]
        nrows = col_start[xr * gy + c_hi_y + 1] - start
        nc = (nrows + ch - 1) // ch

        def chunk(k, acc):
            wj = pool[pl.ds(start + k * ch, ch)]
            return body_fn(acc, wj, jnp.clip(nrows - k * ch, 0, ch),
                           None)

        return jax.lax.fori_loop(0, nc, chunk, acc)

    return jax.lax.fori_loop(xr_lo, xr_hi + 1, row_body, acc0)


def _unidyn_resident_kernel(col_start, packed_hbm, out_a_hbm, out_b_hbm,
                            pool, otile, sems, *, gx, gy, ch,
                            cfg: SPHConfig, rb, nb,
                            subbin_threshold=None):
    cp = pltpu.make_async_copy(packed_hbm, pool, sems.at[2])
    cp.start()
    cp.wait()
    total = col_start[gx * gy]

    def write_out(acc, blk, out_hbm):
        otile[...] = jnp.concatenate(
            [acc.T, jnp.zeros((rb, F - acc.shape[0]), jnp.float32)],
            axis=1)
        ocp = pltpu.make_async_copy(otile, out_hbm.at[pl.ds(blk, rb)],
                                    sems.at[0])
        ocp.start()
        ocp.wait()

    def pass_a_block(q, c):
        blk = q * rb

        @pl.when(blk < total)
        def _():
            hmT, i_valid, cx0, cx1, cy0, cy1 = _resident_prologue(
                pool, col_start, blk, cfg, rb, gx, gy)
            body = _make_unidyn_a_body(hmT, i_valid, cfg,
                                       subbin_threshold, xy_cells=True)
            acc = _resident_sweep(col_start, pool, body,
                                  _unidyn_a_acc0(rb, cfg),
                                  cx0, cx1, cy0, cy1,
                                  gx=gx, gy=gy, ch=ch)
            write_out(acc, blk, out_a_hbm)
            # splice this block's drift velocities into the resident
            # pool (columns _SDV.._FDV+2); pass A reads nothing in
            # that column range, so later blocks' sweeps are unaffected
            blkrows = pool[pl.ds(blk, rb)]
            drift = jnp.concatenate(
                [acc[_A_SDV:_A_SDV + 3].T, acc[_A_FDV:_A_FDV + 3].T],
                axis=1)                                     # (rb, 6)
            pool[pl.ds(blk, rb)] = jnp.concatenate(
                [blkrows[:, :_SDV], drift, blkrows[:, _SDV + 6:]],
                axis=1)

        return c

    def pass_b_block(q, c):
        blk = q * rb

        @pl.when(blk < total)
        def _():
            hmT, i_valid, cx0, cx1, cy0, cy1 = _resident_prologue(
                pool, col_start, blk, cfg, rb, gx, gy)
            body = _make_unidyn_b_body(hmT, i_valid, cfg,
                                       subbin_threshold, xy_cells=True)
            acc = _resident_sweep(col_start, pool, body,
                                  jnp.zeros((_B_ROWS, rb), jnp.float32),
                                  cx0, cx1, cy0, cy1,
                                  gx=gx, gy=gy, ch=ch)
            write_out(acc, blk, out_b_hbm)

        return c

    jax.lax.fori_loop(0, nb, pass_a_block, 0)
    jax.lax.fori_loop(0, nb, pass_b_block, 0)


def unidyn_forces_resident(state: ParticleState, bt: BinTable,
                           cfg: SPHConfig, order=None,
                           subbin_threshold=None, w_chunk: int = 32,
                           rb: int = RB, grid=None):
    """Fused two-pass unidyn forces for VMEM-resident pools (see the
    section comment above); same result dict as unidyn_forces_pallas,
    overflow always 0 (row blocks have no capacity cap).  No
    ``drift_fix`` hook — single-device/full-cube only."""
    gx, gy = _grid_extents(cfg, grid)
    n = state.capacity
    ch = w_chunk or 32
    pad = max(rb, ch)
    if (n + pad) * F * 4 > RESIDENT_MAX_BYTES:
        raise ValueError(
            f"pool of {n} rows does not fit the resident tier "
            f"({(n + pad) * F * 4} > {RESIDENT_MAX_BYTES} bytes)")
    packed = _pack_unidyn_by_order(state, order, bt, pad, cfg)
    col_start = bt.cell_start[0:gx * gy * gy + 1:gy]
    nb = (n + rb - 1) // rb
    kern = functools.partial(_unidyn_resident_kernel, gx=gx, gy=gy,
                             ch=ch, cfg=cfg, rb=rb, nb=nb,
                             subbin_threshold=subbin_threshold)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM(packed.shape, jnp.float32),
            pltpu.VMEM((rb, F), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    out_a, out_b = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct(packed.shape, jnp.float32),
                   jax.ShapeDtypeStruct(packed.shape, jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(col_start.astype(jnp.int32), packed)
    res_a = _rows_to_particle(out_a, bt, n, order)
    res_b = _rows_to_particle(out_b, bt, n, order)

    dens = state.dens
    return dict(
        sum_w=res_a[:, _A_SUMW],
        dpress=res_a[:, _A_DP:_A_DP + 3],
        diffusion=res_a[:, _A_DIFF:_A_DIFF + 3],
        vel_grad=(res_a[:, _A_VG:_A_VG + 9]
                  / dens[:, None]).reshape(n, 3, 3),
        stress_accel=res_a[:, _A_SA:_A_SA + 3] / (dens * dens)[:, None],
        solid_drift=res_a[:, _A_SDV:_A_SDV + 3],
        fluid_drift=res_a[:, _A_FDV:_A_FDV + 3],
        mixture_accel=res_b[:, _B_MA:_B_MA + 3],
        delsolid=res_b[:, _B_DSOL],
        delfluid=res_b[:, _B_DFLU],
        has_pair=res_a[:, _A_CNT] > 0,
        merge_partner=_extract_merge_partner(res_a, cfg, n),
        overflow=jnp.zeros((), jnp.int32),
    )


def unidyn_forces_rowblock(state: ParticleState, bt: BinTable,
                           cfg: SPHConfig, order=None,
                           w_chunk: int = 32, drift_fix=None,
                           subbin_threshold=None, rb: int = RB,
                           grid=None):
    """Unidyn forces with the row-block kernels (``grid``: GridSpec for
    sharded x-slabs, see base_forces_rowblock); same result dict as
    unidyn_forces_pallas, overflow always 0."""
    gx, gy = _grid_extents(cfg, grid)
    n = state.capacity
    ch = w_chunk or 32
    pad = max(rb, ch)
    packed = _pack_unidyn_by_order(state, order, bt, pad, cfg)
    col_start = bt.cell_start[0:gx * gy * gy + 1:gy]
    out_a = _run_rowblock_kernel(_unidyn_rowblock_kernel_a, col_start,
                                 packed, n, gx, gy, ch, cfg, rb=rb,
                                 subbin_threshold=subbin_threshold)
    res_a = _rows_to_particle(out_a, bt, n, order)
    sdv = res_a[:, _A_SDV:_A_SDV + 3]
    fdv = res_a[:, _A_FDV:_A_FDV + 3]
    if drift_fix is not None:
        sdv, fdv = drift_fix(sdv, fdv)
    sdv_s = sdv if order is None else sdv[order]
    fdv_s = fdv if order is None else fdv[order]
    packed_b = packed.at[:n, _SDV:_SDV + 3].set(sdv_s)
    packed_b = packed_b.at[:n, _FDV:_FDV + 3].set(fdv_s)
    out_b = _run_rowblock_kernel(_unidyn_rowblock_kernel_b, col_start,
                                 packed_b, n, gx, gy, ch, cfg, rb=rb,
                                 subbin_threshold=subbin_threshold)
    res_b = _rows_to_particle(out_b, bt, n, order)

    dens = state.dens
    return dict(
        sum_w=res_a[:, _A_SUMW],
        dpress=res_a[:, _A_DP:_A_DP + 3],
        diffusion=res_a[:, _A_DIFF:_A_DIFF + 3],
        vel_grad=(res_a[:, _A_VG:_A_VG + 9]
                  / dens[:, None]).reshape(n, 3, 3),
        stress_accel=res_a[:, _A_SA:_A_SA + 3] / (dens * dens)[:, None],
        solid_drift=sdv,
        fluid_drift=fdv,
        mixture_accel=res_b[:, _B_MA:_B_MA + 3],
        delsolid=res_b[:, _B_DSOL],
        delfluid=res_b[:, _B_DFLU],
        has_pair=res_a[:, _A_CNT] > 0,
        merge_partner=_extract_merge_partner(res_a, cfg, n),
        overflow=jnp.zeros((), jnp.int32),
    )

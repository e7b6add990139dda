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
from tpufluids.config import PI_REF, SPHConfig
from tpufluids.state import ParticleState

NCOLS = 9
F = 128          # packed row width (lane-aligned)
# packed column layout
_X, _V, _DENS, _PRESS, _BND, _ALIVE = 0, 3, 6, 7, 8, 9


def _sph_kernel(col_start, packed_hbm, out_ref, home, win, sems, *,
                g, b, w_cap, cfg: SPHConfig):
    t = pl.program_id(0)
    cx = t // g
    cy = t % g
    h_start = col_start[t]
    h_count = jnp.minimum(col_start[t + 1] - h_start, b)

    # empty columns (most of the grid) skip all DMA and pair work
    @pl.when(h_count > 0)
    def _do_column():
        _column_body(col_start, packed_hbm, out_ref, home, win, sems,
                     t=t, cx=cx, cy=cy, h_start=h_start, h_count=h_count,
                     g=g, b=b, w_cap=w_cap, cfg=cfg)


def _column_body(col_start, packed_hbm, out_ref, home, win, sems, *,
                 t, cx, cy, h_start, h_count, g, b, w_cap, cfg):
    cp = pltpu.make_async_copy(packed_hbm.at[pl.ds(h_start, b)], home,
                               sems.at[0])
    cp.start()
    cp.wait()

    # one transpose per program: i-fields become rows -> (1, B) lane
    # vectors that broadcast over the j sublanes for free
    hmT = home[...].T                                     # (F, B)

    def irow(c):
        return hmT[c, :][None, :]                          # (1, B)

    xi_x, xi_y, xi_z = irow(_X), irow(_X + 1), irow(_X + 2)
    vi_x, vi_y, vi_z = irow(_V), irow(_V + 1), irow(_V + 2)
    di = irow(_DENS)
    pi = irow(_PRESS)
    bi = irow(_BND) > 0.5
    h = jnp.float32(cfg.cutoff)
    czi = jnp.floor((xi_z - cfg.zmin) / cfg.cell_size)
    i_valid = ((jax.lax.broadcasted_iota(jnp.int32, (1, b), 1) < h_count)
               & (irow(_ALIVE) > 0.5))

    def window_body(r, acc):
        dx = r // 3 - 1
        dy = r % 3 - 1
        nx, ny = cx + dx, cy + dy
        nc = nx * g + ny
        ok = (nx >= 0) & (nx < g) & (ny >= 0) & (ny < g)
        ncc = jnp.clip(nc, 0, g * g - 1)
        w_start = col_start[ncc]
        w_count = jnp.where(ok, col_start[ncc + 1] - w_start, 0)
        w_count = jnp.minimum(w_count, w_cap)

        cpw = pltpu.make_async_copy(packed_hbm.at[pl.ds(w_start, w_cap)],
                                    win, sems.at[1])
        cpw.start()
        cpw.wait()
        wj = win[...]                                      # (W, F)

        def jcol(c):
            return wj[:, c][:, None]                       # (W, 1)

        xj_x, xj_y, xj_z = jcol(_X), jcol(_X + 1), jcol(_X + 2)
        j_valid = ((jax.lax.broadcasted_iota(jnp.int32, (w_cap, 1), 0)
                    < w_count) & (jcol(_ALIVE) > 0.5))

        rabx = xi_x - xj_x                                 # (W, B)
        raby = xi_y - xj_y
        rabz = xi_z - xj_z
        ds2 = rabx * rabx + raby * raby + rabz * rabz
        ds = jnp.sqrt(ds2)
        czj = jnp.floor((xj_z - cfg.zmin) / cfg.cell_size)
        dz_ok = jnp.abs(czi - czj) <= 1.0
        mask = (i_valid & j_valid & dz_ok & (ds > 0) & (ds <= 2 * h))
        ds_safe = jnp.where(ds > 0, ds, 1.0)

        # cubic-spline W (FluidGPU.cu:11-21)
        q = ds / h
        w_in = 1.0 - 1.5 * q * q + 0.75 * q * q * q
        w_out = 0.25 * (2.0 - q) ** 3
        wker = jnp.where(q <= 1.0, w_in,
                         jnp.where(q < 2.0, w_out, 0.0)) / (PI_REF * h ** 3)
        # spiky gradient (FluidGPU.cu:35-43)
        dw = jnp.where(ds < h,
                       -45.0 / (PI_REF * h ** 6) * (h - ds) ** 2, 0.0)

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

    acc = jax.lax.fori_loop(0, NCOLS, window_body,
                            jnp.zeros((4, b), jnp.float32))
    out_ref[...] = jnp.concatenate(
        [acc, jnp.zeros((F - 4, b), jnp.float32)], axis=0)


@functools.partial(jax.jit, static_argnames=("cfg", "b", "w_cap"))
def base_forces_pallas(sorted_state: ParticleState, bt: BinTable,
                       cfg: SPHConfig, b: int = 128, w_cap: int = 128):
    """Compute (sum_w, dpress, overflow) for the base variant with the
    column-window Pallas kernel.  ``sorted_state`` must be cell-sorted
    with the full-cube GridSpec."""
    g = cfg.grid_size
    n = sorted_state.capacity

    packed = jnp.zeros((n + b, F), jnp.float32)
    packed = packed.at[:n, _X:_X + 3].set(sorted_state.pos)
    packed = packed.at[:n, _V:_V + 3].set(sorted_state.vel)
    packed = packed.at[:n, _DENS].set(sorted_state.dens)
    packed = packed.at[:n, _PRESS].set(sorted_state.press)
    packed = packed.at[:n, _BND].set(
        sorted_state.boundary.astype(jnp.float32))
    packed = packed.at[:n, _ALIVE].set(
        (sorted_state.alive & bt.in_dom).astype(jnp.float32))

    # col_start[c] = first sorted row of column c (G consecutive cells)
    col_start = bt.cell_start[0:g * g * g + 1:g]          # (G^2 + 1,)
    col_count = col_start[1:] - col_start[:-1]
    overflow = jnp.sum(jnp.maximum(col_count - b, 0))

    kern = functools.partial(_sph_kernel, g=g, b=b, w_cap=w_cap, cfg=cfg)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g * g,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        # output is (F, G^2 * B): accumulator rows stay in the pair-tile
        # orientation so no transpose is needed on write
        out_specs=pl.BlockSpec((F, b), lambda t, cs: (0, t)),
        scratch_shapes=[
            pltpu.VMEM((b, F), jnp.float32),
            pltpu.VMEM((w_cap, F), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F, g * g * b), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(col_start.astype(jnp.int32), packed)

    # map tile-owned columns back to particle order
    cid = jnp.clip(bt.cid, 0, g * g * g)  # sentinel-safe
    col_of = jnp.minimum(cid // g, g * g - 1)
    rank = jnp.arange(n, dtype=jnp.int32) - col_start[col_of]
    valid = (bt.cid < g * g * g) & (rank >= 0) & (rank < b)
    cols = jnp.where(valid, col_of * b + jnp.clip(rank, 0, b - 1), 0)
    res = jnp.where(valid[None, :], out[0:4, cols], 0.0)
    return res[0], res[1:4].T, overflow

"""Pallas TPU kernels for the stable-fluids hot loop.

The Poisson/diffusion solve is the step's dominant cost (20+ sweeps over
(n+2)^3 arrays).  The XLA formulation pays one full HBM round trip per
sweep plus extra passes for the boundary update and the red-black merge
(~1.5 ms/sweep at 256^3, ~6x off roofline).  This kernel fuses:

* SWEEPS consecutive sweeps per HBM pass (overlapping-halo wavefront:
  each x-plane tile loads SWEEPS halo planes each side and shrinks its
  valid light cone by one plane per sweep);
* the set_bnd boundary reflection (applied in VMEM after every sweep,
  exactly matching the dense jacobi -> set_bnd ordering);
* the red-black parity merge (a mask inside the sweep instead of a
  separate full-array select pass).

Semantics are bit-compatible with stam.lin_solve3d (tests assert exact
agreement for both jacobi and red-black modes).

Layout: all 3D kernels run on the Z-GHOSTLESS layout — the lane (z)
axis stores ONLY the interior cells (z_true - 2 of them), padded to a
multiple of 128; y keeps its ghost rows, padded to a multiple of 8.
At the power-of-two grids that matter (64/128/256/512 interior) the
interior is lane-exact, so no VPU work is wasted on padding (the
ghosted layout padded 258 -> 384 lanes at 256^3: ~33% of every sweep).
The z-ghost taps are synthesized in-kernel from the set_bnd invariant
ghost = sz * neighbor, which is bit-exact because set_bnd3d writes the
z faces LAST (stam.set_bnd3d): the dense array's ghost plane always
equals sz times the final adjacent interior plane.  ``zg_pad`` /
``zg_restore`` convert to/from the dense ghosted layout (the step
converts once and threads the layout through every kernel).

One documented deviation: between a raw source add (step3d sources)
and the next set_bnd, the dense path's ghost planes hold stale values
plus the ghost-plane source; the synthesized ghosts always satisfy the
boundary invariant instead.  Interior-supported sources (all shipped
scenes) are unaffected.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift(v, d, axis):
    """out[i] = v[i + d] with zero fill (edges are masked downstream)."""
    L = v.shape[axis]

    def sl(a, b):
        return tuple(slice(a, b) if dd == axis else slice(None)
                     for dd in range(v.ndim))

    pad = [(0, 0)] * v.ndim
    if d > 0:
        pad[axis] = (0, d)
        return jnp.pad(v[sl(d, L)], pad)
    pad[axis] = (-d, 0)
    return jnp.pad(v[sl(0, L + d)], pad)


def _face_fix_ref(vx, is_first, is_last, *, p, sx, sy, y_hi, wylo=None):
    """set_bnd applied in-place on the VMEM window ref via thin-slab
    slice assignments, in the dense order (x faces, then y —
    set_bnd3d at stam.py:129-139).  Thin slabs replace the
    full-window shift+select ops of the naive formulation (the solver
    is VPU-bound; every full-window op is ~1 ms over a 40-sweep solve
    at 256^3).  The z faces are NOT stored in the z-ghostless layout;
    their values are synthesized at tap time (see _zshift_g).

    Global x faces exist only at window index 0 of the first tile
    (``is_first``: window start == 0) and index p-1 of the last
    (``is_last``); other windows write back the identity slab.

    ``wylo``: window-global y origin for (x, y)-tiled windows
    (_stream_tiles2d) — the y faces then land at dynamic window rows,
    gated on the window actually containing them (callers guarantee
    the last window keeps the y_hi face's source row inside).  None
    keeps the static full-y form."""
    vx[0:1] = jnp.where(is_first, sx * vx[1:2], vx[0:1])
    vx[p - 1:p] = jnp.where(is_last, sx * vx[p - 2:p - 1], vx[p - 1:p])
    if wylo is None:
        vx[:, 0:1, :] = sy * vx[:, 1:2, :]
        vx[:, y_hi:y_hi + 1, :] = sy * vx[:, y_hi - 1:y_hi, :]
    else:
        pyw = vx.shape[1]
        lo = vx[:, 0:1, :]
        vx[:, 0:1, :] = jnp.where(wylo == 0, sy * vx[:, 1:2, :], lo)
        rel = jnp.clip(y_hi - wylo, 1, pyw - 1)
        hi = vx[:, pl.ds(rel, 1), :]
        vx[:, pl.ds(rel, 1), :] = jnp.where(
            (y_hi - wylo) <= pyw - 1,
            sy * vx[:, pl.ds(rel - 1, 1), :], hi)


def _lane_edges(shape, z_hi):
    """(lane==0, lane==z_hi) boolean masks: the interior cells adjacent
    to the unstored z-ghost planes in the z-ghostless layout."""
    kk = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    return kk == 0, kk == z_hi


def _zshift_g(v, d, sz, zlo, zhi, ghost_src=None):
    """z-axis tap in the z-ghostless layout: lane k holds true z = k+1,
    so the edge taps read the (unstored) set_bnd ghost sz * neighbor —
    bit-equal to the dense array's ghost plane, which set_bnd3d writes
    last.  ``ghost_src`` overrides the ghost source array (the packed
    red-black solver's ghost lives in the OTHER phase: the updating
    cell itself)."""
    g = v if ghost_src is None else ghost_src
    g = g if sz == 1.0 else -g
    return jnp.where(zlo if d == -1 else zhi, g, _shift(v, d, 2))


def _sweep_ref(vx, v0, mask, zedges, is_first, is_last, *, a, c_inv,
               sx, sy, sz, p, y_hi):
    """One jacobi/red-black sweep + set_bnd on the VMEM window ref.
    ``mask`` is the precomputed interior(-and-parity) mask (padding
    lanes/rows beyond the true extents stay untouched); ``zedges`` the
    precomputed _lane_edges pair."""
    v = vx[...]
    zlo, zhi = zedges
    taps = (_shift(v, -1, 0) + _shift(v, 1, 0)
            + _shift(v, -1, 1) + _shift(v, 1, 1)
            + _zshift_g(v, -1, sz, zlo, zhi)
            + _zshift_g(v, 1, sz, zlo, zhi))
    new = (v0 + a * taps) * c_inv
    vx[...] = jnp.where(mask, new, v)
    _face_fix_ref(vx, is_first, is_last, p=p, sx=sx, sy=sy, y_hi=y_hi)


def _solve_whole_kernel(x_hbm, x0_hbm, out_hbm, vx, vx0, sem1, sem2, *,
                        a, c_inv, sx, sy, sz, n_full, y_hi, z_hi,
                        iters, red_black):
    """Whole-solve-in-VMEM jacobi/red-black kernel: both buffers stay
    resident for the entire iteration loop (one kernel call, one HBM
    read+write — the windowed _solve_kernel re-streams the field every
    fused pass and pays a call per pass).  For grids that fit the
    jacobi_whole_ok gate; fori_loop keeps compile time independent of
    ``iters``."""
    cp1 = pltpu.make_async_copy(x_hbm, vx, sem1)
    cp2 = pltpu.make_async_copy(x0_hbm, vx0, sem2)
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()

    shape = vx.shape
    gi = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    kk = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    interior = ((gi >= 1) & (gi <= n_full - 2) & (jj >= 1)
                & (jj <= y_hi - 1) & (kk <= z_hi))
    if red_black:
        chk = ((gi + jj + kk) % 2) == 0
        masks = (interior & chk, interior & (~chk))
    else:
        masks = (interior,)
    zedges = _lane_edges(shape, z_hi)
    _jacobi_whole_loop(vx, vx0[...], masks, zedges, a=a, c_inv=c_inv,
                       sx=sx, sy=sy, sz=sz, n_full=n_full, y_hi=y_hi,
                       iters=iters)
    cp3 = pltpu.make_async_copy(vx, out_hbm, sem1)
    cp3.start()
    cp3.wait()


def _jacobi_whole_loop(vx, v0, masks, zedges, *, a, c_inv, sx, sy, sz,
                       n_full, y_hi, iters):
    """The whole-array sweep loop shared by _solve_whole_kernel and
    _project_whole_kernel (one copy keeps their bit-compatibility from
    drifting).  fori_loop keeps compile time independent of iters."""
    def body(_, carry):
        for m in masks:
            _sweep_ref(vx, v0, m, zedges, True, True, a=a, c_inv=c_inv,
                       sx=sx, sy=sy, sz=sz, p=n_full, y_hi=y_hi)
        return carry

    jax.lax.fori_loop(0, iters, body, 0)


def _solve_whole_multi_kernel(*refs, n_full, y_hi, z_hi, iters,
                              fields):
    """Whole-solve k independent jacobi systems in ONE kernel call
    (the per-field diffuse sweeps of a step are independent; running
    them resident saves k-1 kernel calls and the per-field layout
    conversions).  ``fields``: static tuple of (b, a, c) per array;
    x0 = the input field itself (the diffuse contract)."""
    k = len(fields)
    in_hbm, out_hbm = refs[:k], refs[k:2 * k]
    vxs, v0s, sems = refs[2 * k:3 * k], refs[3 * k:4 * k], refs[4 * k]
    cps = []
    for i in range(k):
        cp = pltpu.make_async_copy(in_hbm[i], vxs[i], sems.at[i])
        cp.start()
        cps.append(cp)
    for cp in cps:
        cp.wait()
    for i in range(k):
        v0s[i][...] = vxs[i][...]

    shape = vxs[0].shape
    gi = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    kk = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    interior = ((gi >= 1) & (gi <= n_full - 2) & (jj >= 1)
                & (jj <= y_hi - 1) & (kk <= z_hi))
    zedges = _lane_edges(shape, z_hi)

    def body(_, carry):
        for i, (b, a, c) in enumerate(fields):
            sx, sy, sz = _bnd_scales(b)
            _sweep_ref(vxs[i], v0s[i][...], interior, zedges, True,
                       True, a=a, c_inv=1.0 / c, sx=sx, sy=sy, sz=sz,
                       p=n_full, y_hi=y_hi)
        return carry

    jax.lax.fori_loop(0, iters, body, 0)
    wcps = []
    for i in range(k):
        cp = pltpu.make_async_copy(vxs[i], out_hbm[i], sems.at[i])
        cp.start()
        wcps.append(cp)
    for cp in wcps:
        cp.wait()


def whole_multi_ok(shape, k):
    """True when ``k`` fields of ``shape`` can run the multi-field
    whole diffuse (2k resident f32 buffers + sweep temporaries).  The
    per-field bound matches jacobi_whole_ok's 12 MB ceiling — the
    sweep's transient working set scales with the field, not with k —
    and the k-scaled bound caps the resident total."""
    n_full, y_true, z_true = shape
    yp, zp = zg_extents(y_true, z_true)
    bytes_per = n_full * yp * zp * 4
    return (bytes_per <= 12 * 1024 * 1024
            and k * bytes_per <= 30 * 1024 * 1024)


@functools.partial(jax.jit, static_argnames=("fields", "iters",
                                             "true_extents"))
def diffuse3d_whole_multi(xs, fields, iters: int, true_extents=None):
    """Diffuse k fields in one whole-in-VMEM kernel call.  ``fields``:
    per-array (b, a, c) tuples (diffuse semantics: x0 is the field
    itself).  Bit-compatible with k sequential diffuse3d whole-solve
    calls (tested); use only when whole_multi_ok(shape, k)."""
    ins, n_full, y_true, z_true, yp, zp, standalone = _pad_setup(
        tuple(xs), true_extents)
    k = len(fields)
    shape = ins[0].shape
    kern = functools.partial(_solve_whole_multi_kernel, n_full=n_full,
                             y_hi=y_true - 1, z_hi=z_true - 3,
                             iters=iters, fields=fields)
    outs = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * k,
        out_specs=tuple([pl.BlockSpec(memory_space=pl.ANY)] * k),
        out_shape=tuple(jax.ShapeDtypeStruct(shape, jnp.float32)
                        for _ in range(k)),
        scratch_shapes=[pltpu.VMEM(shape, jnp.float32)
                        for _ in range(2 * k)]
                       + [pltpu.SemaphoreType.DMA((k,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*ins)
    if standalone:
        outs = tuple(zg_restore(o, b, y_true, z_true)
                     for o, (b, _, _) in zip(outs, fields))
    return outs


def jacobi_whole_ok(shape, dtype=jnp.float32):
    """True when lin_solve3d_pallas can run whole-solve-in-VMEM on
    ``shape`` (both z-ghostless buffers resident, <= ~130^3 at f32);
    request it by passing tx=n_full, fuse=iters."""
    n_full, y_true, z_true = shape
    esize = jnp.dtype(dtype).itemsize
    ymul = 16 if esize == 2 else 8
    yp, zp = zg_extents(y_true, z_true, ymul)
    return n_full * yp * zp * esize <= 12 * 1024 * 1024


def _solve_kernel(x_hbm, x0_hbm, out_hbm, vx, vx0, sem1, sem2, *,
                  a, c_inv, sx, sy, sz, n_full, y_hi, z_hi, tx, halo,
                  parities):
    t = pl.program_id(0)
    p = tx + 2 * halo
    lo = jnp.minimum(t * tx, n_full - tx)      # tile write start
    wlo = jnp.clip(lo - halo, 0, n_full - p)   # window start

    cp1 = pltpu.make_async_copy(x_hbm.at[pl.ds(wlo, p)], vx, sem1)
    cp2 = pltpu.make_async_copy(x0_hbm.at[pl.ds(wlo, p)], vx0, sem2)
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()

    shape = vx.shape
    gi = (jax.lax.broadcasted_iota(jnp.int32, shape, 0) + wlo)
    jj = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    kk = jax.lax.broadcasted_iota(jnp.int32, shape, 2)

    # loop-invariant masks, computed once per program.  In the
    # z-ghostless layout every lane <= z_hi is interior.
    interior = ((gi >= 1) & (gi <= n_full - 2) & (jj >= 1)
                & (jj <= y_hi - 1) & (kk <= z_hi))
    if parities[0] is None:
        masks = {None: interior}
    else:
        # dense _checker parity is on 0-based interior indices:
        # ((gi-1)+(jj-1)+kk) % 2 with lane kk = true z - 1
        chk = ((gi + jj + kk) % 2) == 0
        masks = {0: interior & chk, 1: interior & (~chk)}
    zedges = _lane_edges(shape, z_hi)
    is_first = wlo == 0
    is_last = wlo == n_full - p

    v0 = vx0[...]
    for parity in parities:
        _sweep_ref(vx, v0, masks[parity], zedges, is_first, is_last,
                   a=a, c_inv=c_inv, sx=sx, sy=sy, sz=sz, p=p,
                   y_hi=y_hi)

    cp3 = pltpu.make_async_copy(
        vx.at[pl.ds(lo - wlo, tx)], out_hbm.at[pl.ds(lo, tx)], sem1)
    cp3.start()
    cp3.wait()


def _bnd_scales(b):
    return (-1.0 if b == 1 else 1.0, -1.0 if b == 2 else 1.0,
            -1.0 if b == 3 else 1.0)


# ---------------------------------------------------------------------------
# shared double-buffered x-window streaming
#
# Every kernel in this file sweeps x-plane tiles with a halo window.
# Issued start/wait back-to-back, the window DMAs serialize with the
# compute; for the cheap kernels (divergence, gradient) the per-tile
# DMA round trips dominate.  This helper runs the standard two-slot
# pipeline: program t awaits windows prefetched by t-1, prefetches
# t+1's into the alternate slot, computes in place, and streams the
# tile span back to HBM (awaited by t+1 before slot reuse).


def _stream_tiles(in_hbm, out_pairs, vbuf, in_sems, out_sems, *,
                  n_full, tx, halo, compute, pipeline=True,
                  n_bufs=None):
    """Double-buffered x-window pipeline over ``grid=(num_tiles,)``.

    ``in_hbm``: input HBM refs sharing (n_full, Y, Z) geometry, copied
    as windows of ``p = tx + 2*halo`` planes into ``vbuf`` slot arrays.
    ``out_pairs``: (buffer_index, out_hbm_ref) written back from the
    buffer's valid tile span after compute.  ``compute(refs, wlo)``
    mutates the slot's buffer refs in place.  Overlapping write spans
    of the clamped last tile carry identical values (both tiles compute
    their full valid cone), so racing output DMAs are benign.

    ``pipeline=False`` runs a single-slot serial load/compute/store
    cycle — for compute bodies whose register-spill footprint scales
    with the window (e.g. 27-tap advection), where the second slot
    would push the program past the VMEM limit.

    ``n_bufs`` > len(in_hbm) reserves extra slot buffers (not filled by
    input DMAs) that ``compute`` may use as dedicated outputs; they are
    passed to ``compute`` after the input windows and may be named by
    ``out_pairs`` buffer indices."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    n_in = len(in_hbm)
    n_bufs = n_in if n_bufs is None else n_bufs
    p = tx + 2 * halo

    def tile_lo(tt):
        return jnp.minimum(tt * tx, n_full - tx)

    def tile_wlo(tt):
        return jnp.clip(tile_lo(tt) - halo, 0, n_full - p)

    def in_copies(tt, slot):
        w = tile_wlo(tt)
        return [pltpu.make_async_copy(src.at[pl.ds(w, p)],
                                      vbuf.at[slot, i], in_sems.at[slot, i])
                for i, src in enumerate(in_hbm)]

    def out_copies(tt, slot):
        lo = tile_lo(tt)
        w = tile_wlo(tt)
        return [pltpu.make_async_copy(vbuf.at[slot, i, pl.ds(lo - w, tx)],
                                      dst.at[pl.ds(lo, tx)],
                                      out_sems.at[slot, j])
                for j, (i, dst) in enumerate(out_pairs)]

    if not pipeline:
        for cp in in_copies(t, 0):
            cp.start()
        for cp in in_copies(t, 0):
            cp.wait()
        compute([vbuf.at[0, i] for i in range(n_bufs)], tile_wlo(t))
        for cp in out_copies(t, 0):
            cp.start()
        for cp in out_copies(t, 0):
            cp.wait()
        return

    s = jax.lax.rem(t, 2)
    s2 = jax.lax.rem(t + 1, 2)

    @pl.when(t == 0)
    def _():
        for cp in in_copies(0, 0):
            cp.start()

    @pl.when(t + 1 < nt)
    def _():
        @pl.when(t > 0)
        def _():
            for cp in out_copies(t - 1, s2):
                cp.wait()
        for cp in in_copies(t + 1, s2):
            cp.start()

    for cp in in_copies(t, s):
        cp.wait()

    compute([vbuf.at[s, i] for i in range(n_bufs)], tile_wlo(t))

    for cp in out_copies(t, s):
        cp.start()

    @pl.when(t == nt - 1)
    def _():
        @pl.when(t > 0)
        def _():
            for cp in out_copies(t - 1, s2):
                cp.wait()
        for cp in out_copies(t, s):
            cp.wait()


def _stream_scratch(n_in, n_out, p, y, z, dtype=jnp.float32, slots=2):
    return [pltpu.VMEM((slots, n_in, p, y, z), dtype),
            pltpu.SemaphoreType.DMA((slots, n_in)),
            pltpu.SemaphoreType.DMA((slots, max(n_out, 1)))]


def _stream_tiles2d(in_hbm, out_pairs, vbuf, in_sems, out_sems, *,
                    n_full, tx, halo, ny, ty, hy, compute,
                    pipeline=True, n_bufs=None):
    """(x, packed-y)-tiled variant of _stream_tiles over
    ``grid=(ntx, nty)``: windows carry a halo in BOTH the x (plane) and
    packed-y (sublane) axes, for kernels whose full-y window would
    collapse the x tile under the VMEM budget (512^3 and beyond — the
    y*z plane footprint grows quadratically with n while the budget is
    fixed).  ``compute(refs, wlo, wylo)`` gets both window origins.

    The y-halo windows re-read ty+2*hy rows per ty computed and the
    compute body recomputes the y-halo cone, so the plan must weigh
    (tx + 2*halo)/tx * (ty + 2*hy)/ty total redundancy against the
    full-y alternative's (tx' + 2*halo)/tx' at the smaller tx'."""
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    ntx = pl.num_programs(0)
    nty = pl.num_programs(1)
    t = ti * nty + tj
    nt = ntx * nty
    n_in = len(in_hbm)
    # extra slot buffers beyond the inputs serve as dedicated outputs
    # (same contract as _stream_tiles)
    n_bufs = n_in if n_bufs is None else n_bufs
    p = tx + 2 * halo
    py = ty + 2 * hy

    def tile_lo(tt):
        return jnp.minimum((tt // nty) * tx, n_full - tx)

    def tile_wlo(tt):
        return jnp.clip(tile_lo(tt) - halo, 0, n_full - p)

    def tile_lo_y(tt):
        return jnp.minimum((tt % nty) * ty, ny - ty)

    def tile_wlo_y(tt):
        return jnp.clip(tile_lo_y(tt) - hy, 0, ny - py)

    def _mult8(i):
        # every y offset here is a multiple of 8 by construction
        # (ty/hy/ny are multiples of 8), but Mosaic cannot prove it
        # through the min/clip arithmetic and rejects the sublane-dim
        # memref slice ("failed to prove a tile index ... divisible by
        # the tiling (8)") — annotate.
        return pl.multiple_of(i, 8)

    def in_copies(tt, slot):
        w = tile_wlo(tt)
        wy = tile_wlo_y(tt)
        return [pltpu.make_async_copy(
                    src.at[pl.ds(w, p), pl.ds(_mult8(wy), py)],
                    vbuf.at[slot, i], in_sems.at[slot, i])
                for i, src in enumerate(in_hbm)]

    def out_copies(tt, slot):
        lo, w = tile_lo(tt), tile_wlo(tt)
        lo_y, wy = tile_lo_y(tt), tile_wlo_y(tt)
        return [pltpu.make_async_copy(
                    vbuf.at[slot, i, pl.ds(lo - w, tx),
                            pl.ds(_mult8(lo_y - wy), ty)],
                    dst.at[pl.ds(lo, tx), pl.ds(_mult8(lo_y), ty)],
                    out_sems.at[slot, j])
                for j, (i, dst) in enumerate(out_pairs)]

    if not pipeline:
        for cp in in_copies(t, 0):
            cp.start()
        for cp in in_copies(t, 0):
            cp.wait()
        compute([vbuf.at[0, i] for i in range(n_bufs)], tile_wlo(t),
                tile_wlo_y(t))
        for cp in out_copies(t, 0):
            cp.start()
        for cp in out_copies(t, 0):
            cp.wait()
        return

    s = jax.lax.rem(t, 2)
    s2 = jax.lax.rem(t + 1, 2)

    @pl.when(t == 0)
    def _():
        for cp in in_copies(0, 0):
            cp.start()

    @pl.when(t + 1 < nt)
    def _():
        @pl.when(t > 0)
        def _():
            for cp in out_copies(t - 1, s2):
                cp.wait()
        for cp in in_copies(t + 1, s2):
            cp.start()

    for cp in in_copies(t, s):
        cp.wait()

    compute([vbuf.at[s, i] for i in range(n_bufs)], tile_wlo(t),
            tile_wlo_y(t))

    for cp in out_copies(t, s):
        cp.start()

    @pl.when(t == nt - 1)
    def _():
        @pl.when(t > 0)
        def _():
            for cp in out_copies(t - 1, s2):
                cp.wait()
        for cp in out_copies(t, s):
            cp.wait()


def _fit_tx(tx_want, n_bufs, halo, n_full, yp, zp, *, slots=2,
            dtype_size=4, budget=64 * 1024 * 1024):
    """Largest tile size <= tx_want whose double-buffered windows fit
    the scratch budget (large grids fall back to thin tiles: the plane
    footprint yp*zp grows quadratically with n).  ``budget`` covers the
    window buffers only — it must leave VMEM headroom for the compute
    body's temporaries (register spills scale with the window size).

    Floors at tx=1 even when that minimal window still exceeds the
    budget (possible for very large planes): the budget is advisory —
    the pallas_call vmem_limit stays the hard bound — and callers with
    heavy compute bodies provide a slots=1 fallback for that regime."""
    plane = yp * zp * dtype_size
    max_p = budget // (slots * n_bufs * plane)
    return max(1, min(tx_want, max_p - 2 * halo, n_full - 2 * halo))


def _auto_ty(tx_want, n_bufs, halo, n_full, yp, zp, ny, y_true, *,
             budget):
    """Pick a y tile (or None for full-y windows) for the streaming
    wrappers: when the full-y double-buffered window collapses the x
    tile below 8 planes (large y*z planes — 512^3 fits only tx=2 for
    forcing, a 3x read redundancy), switch to (x, y)-tiled windows.
    ty=128 measured best at 512^3 (41.8 vs 49.3 ms full-y for forcing,
    verify/bench_forcing512.py); the window must fit the rows and keep
    the y_hi face's source row inside the last window."""
    txf = _fit_tx(tx_want, n_bufs, halo, n_full, yp, zp, budget=budget)
    if txf >= 8:
        return None
    if ny >= 144 and ny - 144 <= y_true - 2:
        return 128
    return None


def _ty_window(ty, ny, y_true, kind):
    """Validate a y tile and return the window rows py = ty + 2*hy
    (hy=8: HBM sublane window slices must be 8-aligned in offset and
    size — Mosaic rejects smaller halos with 'slice shape along
    dimension 1 must be aligned to tiling (8)')."""
    if ty % 8:
        raise ValueError(f"ty={ty} must be a multiple of 8 (HBM "
                         "sublane window slices must be 8-aligned)")
    py = ty + 16
    # the last window must keep the y_hi face's source row inside
    if py > ny or ny - py > y_true - 2:
        raise ValueError(
            f"{kind} y tile window {py} incompatible with {ny} "
            f"rows (y_hi {y_true - 1})")
    return py


def _fit_tx_or_serial(tx_want, n_bufs, halo, n_full, yp, zp, *, budget):
    """(tx, pipeline) for the generic streaming wrappers: the
    double-buffered fit, falling back to the single-slot serial layout
    (pipeline=False) when even the minimal pipelined window exceeds the
    budget — very large y*z planes would otherwise compile a window
    over the advisory budget and can hit the hard vmem_limit_bytes
    (the same fallback advect3d_multi_pallas and rb_packed_plan make)."""
    tx = _fit_tx(tx_want, n_bufs, halo, n_full, yp, zp, budget=budget)
    if (tx + 2 * halo) * yp * zp * 4 * 2 * n_bufs <= budget:
        return tx, True
    return _fit_tx(tx_want, n_bufs, halo, n_full, yp, zp, slots=1,
                   budget=budget), False


def zg_extents(y_true, z_true, ymul=8):
    """(yp, zp) of the z-ghostless layout for a dense ghosted
    (x, y_true, z_true) array: y (ghosts kept) padded to a sublane
    multiple, z INTERIOR (z_true - 2) padded to a lane multiple."""
    return -(-y_true // ymul) * ymul, -(-(z_true - 2) // 128) * 128


def zg_pad(a, yp, zp):
    """Dense ghosted -> z-ghostless layout: strip the two z-ghost
    planes, pad y to ``yp`` sublanes and the z interior to ``zp``
    lanes (padding cells are don't-care: every kernel masks them out
    of its outputs and guards the adjacent taps)."""
    y_true, zi = a.shape[1], a.shape[2] - 2
    return jnp.pad(a[:, :, 1:-1], ((0, 0), (0, yp - y_true),
                                   (0, zp - zi)))


def zg_restore(a, b, y_true, z_true):
    """z-ghostless -> dense ghosted layout: slice off padding and
    synthesize the two z-ghost planes as sz * adjacent interior plane.
    Bit-exact vs the dense path because set_bnd3d writes the z faces
    last — the dense output's ghost planes always equal sz times the
    final adjacent planes (including the x/y edge columns, where the
    z-face write wins)."""
    sz = -1.0 if b == 3 else 1.0
    zi = z_true - 2
    core = a[:, :y_true, :zi]
    return jnp.concatenate(
        [sz * core[:, :, :1], core, sz * core[:, :, zi - 1:zi]], axis=2)


def _pad_setup(arrays, true_extents):
    """Resolve the z-ghostless layout for a kernel wrapper.

    With ``true_extents=None`` (standalone use) the arrays arrive
    dense/ghosted: convert via zg_pad here; the caller restores
    outputs with zg_restore.  With ``true_extents=(y_true, z_true)``
    (the dense extents) the arrays are ALREADY in the z-ghostless
    layout (the step converts its five fields once and threads them
    through every kernel) and outputs stay in it.

    Returns (arrays, n_full, y_true, z_true, yp, zp, standalone)."""
    n_full = arrays[0].shape[0]
    if true_extents is None:
        y_true, z_true = arrays[0].shape[1], arrays[0].shape[2]
        yp, zp = zg_extents(y_true, z_true)
        return ([zg_pad(a, yp, zp) for a in arrays], n_full, y_true,
                z_true, yp, zp, True)
    y_true, z_true = true_extents
    return (list(arrays), n_full, y_true, z_true, arrays[0].shape[1],
            arrays[0].shape[2], False)


# ---------------------------------------------------------------------------
# fused buoyancy + vorticity-confinement forcing


def _forcing_stage(vu, vv, vw, vd, vt, interior, zedges, bnd_ref, *,
                   dt, h, eps, b_alpha, b_beta, t_amb):
    """Buoyancy + vorticity-confinement compute body shared by the
    windowed _force_kernel and the fused whole-step kernel (one copy
    keeps the bit-compatibility from drifting).  ``bnd_ref(ref, b)``
    is the caller's set_bnd fix for its window/face layout."""
    if b_alpha or b_beta:
        # buoyancy on w (stam.buoyancy3d) incl. its set_bnd(3, .)
        f = -b_alpha * vd[...] + b_beta * (vt[...] - t_amb)
        vw[...] = jnp.where(interior, vw[...] + dt * f, vw[...])
        bnd_ref(vw, 3)

    if eps:
        inv2h = 0.5 / h
        u, v, w = vu[...], vv[...], vw[...]

        def d_axis(q, axis, sz=1.0):
            if axis == 2:
                # mag's dense ghost planes are literal zeros (the
                # interior mask), which plain zero-fill shifts
                # reproduce; u/v/w ghosts are set_bnd values
                hi = _zshift_g(q, 1, sz, *zedges)
                lo = _zshift_g(q, -1, sz, *zedges)
                return (hi - lo) * inv2h
            return (_shift(q, 1, axis) - _shift(q, -1, axis)) * inv2h

        cx = d_axis(w, 1) - d_axis(v, 2)
        cy = d_axis(u, 2) - d_axis(w, 0)
        cz = d_axis(v, 0) - d_axis(u, 1)
        mag = jnp.sqrt(cx * cx + cy * cy + cz * cz)
        mag = jnp.where(interior, mag, 0.0)
        gx = d_axis(mag, 0)
        gy = d_axis(mag, 1)
        gz = (_shift(mag, 1, 2) - _shift(mag, -1, 2)) * inv2h
        norm = jnp.sqrt(gx * gx + gy * gy + gz * gz) + 1e-5
        gx, gy, gz = gx / norm, gy / norm, gz / norm
        eps_h = eps * h
        vu[...] = jnp.where(interior,
                            u + dt * eps_h * (gy * cz - gz * cy), u)
        vv[...] = jnp.where(interior,
                            v + dt * eps_h * (gz * cx - gx * cz), v)
        vw[...] = jnp.where(interior,
                            w + dt * eps_h * (gx * cy - gy * cx), w)
        bnd_ref(vu, 1)
        bnd_ref(vv, 2)
        bnd_ref(vw, 3)


def _force_kernel(gx0_ref, u_hbm, v_hbm, w_hbm, d_hbm, t_hbm, uo, vo, wo,
                  vbuf, in_sems, out_sems, *, n_full, gn, slab, y_hi,
                  z_hi, tx, dt, h, eps, b_alpha, b_beta, t_amb,
                  pipeline=True, ty=None, ny=None):
    """``gx0_ref``/``gn``/``slab``: global x placement for x-slab
    arrays (see _advect_kernel).  On a slab (halo 2) the domain
    x-ghost sits at absolute row 1 / n_full-2 (row 0 / n_full-1 are
    out-of-domain filler), so the x-face refresh targets those rows,
    gated on the slab actually touching the domain edge; the global
    interior mask makes halo rows with interior global indices update
    like their owner (deterministic replication) and zeroes the mag
    ghost exactly where the dense kernel does.

    ``ty``: y-tile rows — windows tile the y axis too with an 8-row
    halo (_stream_tiles2d; 2 rows suffice for the stencil but HBM
    window slices along the sublane dim must be 8-aligned in offset
    and size — Mosaic rejects hy=2 with "slice shape along dimension 1
    must be aligned to tiling (8)"), for plane sizes that collapse tx;
    the interior mask and y-face rows then use window-global ``wylo``.
    wylo == 0 on the full-y path, so the y-face gates fold to the
    static form there."""

    def compute(refs, wlo, wylo):
        vu, vv, vw, vd, vt = refs
        shape = vu.shape
        gi = (jax.lax.broadcasted_iota(jnp.int32, shape, 0) + wlo
              + gx0_ref[0])
        jj = jax.lax.broadcasted_iota(jnp.int32, shape, 1) + wylo
        kk = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
        interior = ((gi >= 1) & (gi <= gn - 2) & (jj >= 1)
                    & (jj <= y_hi - 1) & (kk <= z_hi))
        apply_ylo = wylo == 0
        pyw = shape[1]
        rel_yhi = jnp.clip(y_hi - wylo, 1, pyw - 1)
        apply_yhi = (y_hi - wylo) <= pyw - 1

        def bnd_y_ref(ref, sy):
            lo = ref[:, 0:1, :]
            ref[:, 0:1, :] = jnp.where(apply_ylo, sy * ref[:, 1:2, :],
                                       lo)
            hi = ref[:, pl.ds(rel_yhi, 1), :]
            ref[:, pl.ds(rel_yhi, 1), :] = jnp.where(
                apply_yhi, sy * ref[:, pl.ds(rel_yhi - 1, 1), :], hi)
        zedges = _lane_edges(shape, z_hi)
        p_ = shape[0]
        if slab:
            # slab ghost rows sit at absolute 1 / n_full-2; they ARE
            # the domain ghosts iff their global index is 0 / gn-1.
            # Refresh dynamically in whichever window contains them.
            face_lo = gx0_ref[0] + 1 == 0
            face_hi = gx0_ref[0] + n_full == gn + 1
            rel_lo = jnp.clip(1 - wlo, 0, p_ - 2)
            ap_lo = face_lo & (wlo <= 1)
            rel_hi = jnp.clip(n_full - 2 - wlo, 1, p_ - 1)
            ap_hi = face_hi & (wlo >= n_full - 1 - p_)
            is_first = is_last = None
        else:
            is_first = (wlo == 0) & (gx0_ref[0] == 0)
            is_last = (wlo == n_full - p_) & (gx0_ref[0] + n_full == gn)

        def bnd_ref(ref, b):
            sx, sy, _ = _bnd_scales(b)
            if slab:
                ref[pl.ds(rel_lo, 1)] = jnp.where(
                    ap_lo, sx * ref[pl.ds(rel_lo + 1, 1)],
                    ref[pl.ds(rel_lo, 1)])
                ref[pl.ds(rel_hi, 1)] = jnp.where(
                    ap_hi, sx * ref[pl.ds(rel_hi - 1, 1)],
                    ref[pl.ds(rel_hi, 1)])
                bnd_y_ref(ref, sy)
            else:
                ref[0:1] = jnp.where(is_first, sx * ref[1:2], ref[0:1])
                ref[p_ - 1:p_] = jnp.where(is_last,
                                           sx * ref[p_ - 2:p_ - 1],
                                           ref[p_ - 1:p_])
                bnd_y_ref(ref, sy)

        _forcing_stage(vu, vv, vw, vd, vt, interior, zedges, bnd_ref,
                       dt=dt, h=h, eps=eps, b_alpha=b_alpha,
                       b_beta=b_beta, t_amb=t_amb)

    if ty is None:
        _stream_tiles((u_hbm, v_hbm, w_hbm, d_hbm, t_hbm),
                      ((0, uo), (1, vo), (2, wo)), vbuf, in_sems,
                      out_sems, n_full=n_full, tx=tx, halo=2,
                      compute=lambda refs, wlo: compute(refs, wlo, 0),
                      pipeline=pipeline)
    else:
        _stream_tiles2d((u_hbm, v_hbm, w_hbm, d_hbm, t_hbm),
                        ((0, uo), (1, vo), (2, wo)), vbuf, in_sems,
                        out_sems, n_full=n_full, tx=tx, halo=2, ny=ny,
                        ty=ty, hy=8, compute=compute,
                        pipeline=pipeline)


@functools.partial(jax.jit, static_argnames=(
    "dt", "h", "eps", "b_alpha", "b_beta", "t_amb", "tx",
    "true_extents", "gn", "ty"))
def forcing3d_pallas(u, v, w, dens, temp, dt: float, h: float, eps: float,
                     b_alpha: float, b_beta: float, t_amb: float,
                     tx: int = 4, true_extents=None, gx0=None, gn=None,
                     ty=None):
    """Fused buoyancy + vorticity confinement (stam.buoyancy3d followed
    by stam.vorticity_confinement3d), one HBM pass.  ``gx0``/``gn``:
    global x placement for x-slab arrays (see advect3d_multi_pallas).
    ``ty``: y-tile rows — tile the window along y too (hy=2), for
    plane sizes that collapse tx (512^3 picks tx=2, a 3x read
    redundancy); None keeps full-y windows."""
    ins, n_full, y_true, z_true, yp, zp, standalone = _pad_setup(
        (u, v, w, dens, temp), true_extents)
    slab = gx0 is not None
    if gn is None:
        gn = n_full
    gx0_arr = (jnp.zeros((1,), jnp.int32) if gx0 is None
               else jnp.asarray(gx0, jnp.int32).reshape(1))
    ny = ins[0].shape[1]
    if ty is None:
        ty = _auto_ty(tx, 5, 2, n_full, yp, zp, ny, y_true,
                      budget=50 * 1024 * 1024)
    if ty is not None:
        py = _ty_window(ty, ny, y_true, "forcing")
        tx = max(1, min(tx, _fit_tx(tx, 5, 2, n_full, py, zp,
                                    budget=50 * 1024 * 1024)))
        pipeline = True
        grid = (pl.cdiv(n_full, tx), pl.cdiv(ny, ty))
        ywin = py
    else:
        tx, pipeline = _fit_tx_or_serial(tx, 5, 2, n_full, yp, zp,
                                         budget=50 * 1024 * 1024)
        grid = (pl.cdiv(n_full, tx),)
        ywin = ins[0].shape[1]
    p = tx + 4
    kern = functools.partial(
        _force_kernel, n_full=n_full, gn=gn, slab=slab, y_hi=y_true - 1,
        z_hi=z_true - 3, tx=tx, dt=dt, h=h, eps=eps, b_alpha=b_alpha,
        b_beta=b_beta, t_amb=t_amb, pipeline=pipeline, ty=ty, ny=ny)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5,
        out_specs=tuple([pl.BlockSpec(memory_space=pl.ANY)] * 3),
        scratch_shapes=_stream_scratch(5, 3, p, ywin,
                                       ins[0].shape[2],
                                       slots=2 if pipeline else 1),
    )
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=tuple(jax.ShapeDtypeStruct(ins[0].shape, jnp.float32)
                        for _ in range(3)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(gx0_arr, *ins)
    if standalone:
        outs = tuple(zg_restore(o, b, y_true, z_true)
                     for o, b in zip(outs, (1, 2, 3)))
    return outs


# ---------------------------------------------------------------------------
# fused projection plumbing: divergence build and gradient subtraction
# (the XLA formulations cost ~6 full-array copies each per projection —
# .at[].set/.add and the set_bnd face writes each materialize a copy)


def _div_stage(vu, vv, vw, out_ref, interior, zedges, *, h, p, y_hi,
               is_first, is_last, wylo=None):
    """Divergence compute body shared by the windowed _div_kernel and
    the fused _project_whole_kernel — keep ONE copy so the documented
    bit-compatibility cannot drift between the two dispatch paths.
    Same association order as stam.divergence3d; w's z-ghost taps
    synthesize the b=3 mirror (sz = -1)."""
    u, v, w = vu[...], vv[...], vw[...]
    s = (_shift(u, 1, 0) - _shift(u, -1, 0) + _shift(v, 1, 1)
         - _shift(v, -1, 1) + _zshift_g(w, 1, -1.0, *zedges)
         - _zshift_g(w, -1, -1.0, *zedges))
    out_ref[...] = jnp.where(interior, jnp.float32(-0.5 * h) * s, 0.0)
    _face_fix_ref(out_ref, is_first, is_last, p=p, sx=1.0, sy=1.0,
                  y_hi=y_hi, wylo=wylo)


def _gradsub_stage(pr, refs_bs, interior, zedges, *, h, p, y_hi,
                   is_first, is_last, wylo=None):
    """Pressure-gradient subtraction body shared by the windowed
    _gradsub_kernel and the fused _project_whole_kernel.  Same op
    order as the dense path (bit-compatible): -0.5*(p[i+1]-p[i-1])/h;
    p's z ghosts are the b=0 mirror (sz = 1)."""
    for axis, ref, b in refs_bs:
        if axis == 2:
            hi = _zshift_g(pr, 1, 1.0, *zedges)
            lo = _zshift_g(pr, -1, 1.0, *zedges)
        else:
            hi, lo = _shift(pr, 1, axis), _shift(pr, -1, axis)
        g_ = jnp.float32(-0.5) * (hi - lo) / jnp.float32(h)
        ref[...] = jnp.where(interior, ref[...] + g_, ref[...])
        sx, sy, _ = _bnd_scales(b)
        _face_fix_ref(ref, is_first, is_last, p=p, sx=sx, sy=sy,
                      y_hi=y_hi, wylo=wylo)


def _div_kernel(u_hbm, v_hbm, w_hbm, out_hbm, vbuf, in_sems, out_sems, *,
                n_full, y_hi, z_hi, tx, h, pipeline=True, ty=None,
                ny=None):
    p = tx + 2

    def compute(refs, wlo, wylo):
        vu, vv, vw = refs
        shape = vu.shape
        gi = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + wlo
        jj = jax.lax.broadcasted_iota(jnp.int32, shape, 1) + wylo
        kk = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
        interior = ((gi >= 1) & (gi <= n_full - 2) & (jj >= 1)
                    & (jj <= y_hi - 1) & (kk <= z_hi))
        zedges = _lane_edges(shape, z_hi)
        _div_stage(vu, vv, vw, vu, interior, zedges, h=h, p=p,
                   y_hi=y_hi, is_first=wlo == 0,
                   is_last=wlo == n_full - p,
                   wylo=None if ty is None else wylo)

    if ty is None:
        _stream_tiles((u_hbm, v_hbm, w_hbm), ((0, out_hbm),), vbuf,
                      in_sems, out_sems, n_full=n_full, tx=tx, halo=1,
                      compute=lambda refs, wlo: compute(refs, wlo, 0),
                      pipeline=pipeline)
    else:
        _stream_tiles2d((u_hbm, v_hbm, w_hbm), ((0, out_hbm),), vbuf,
                        in_sems, out_sems, n_full=n_full, tx=tx, halo=1,
                        ny=ny, ty=ty, hy=8, compute=compute,
                        pipeline=pipeline)


@functools.partial(jax.jit, static_argnames=("tx", "true_extents", "h",
                                              "ty"))
def div3d_pallas(u, v, w, tx: int = 32, true_extents=None, h=None,
                 ty=None):
    """Fused ``set_bnd3d(0, zeros.at[1:-1,...].set(divergence3d(u,v,w)))``
    — one HBM pass instead of ~6 full-array copies.

    ``h``: grid spacing override — the sharded path passes 1/n_global
    because its arrays are x-slabs whose extent is not the global n
    (tpufluids.shard.grid_sharded).  ``ty``: y-tile rows for plane
    sizes that collapse tx (auto-picked at 512^3+); None keeps full-y
    windows."""
    ins, n_full, y_true, z_true, yp, zp, standalone = _pad_setup(
        (u, v, w), true_extents)
    if h is None:
        h = 1.0 / (n_full - 2)
    ny = ins[0].shape[1]
    if ty is None:
        ty = _auto_ty(tx, 3, 1, n_full, yp, zp, ny, y_true,
                      budget=70 * 1024 * 1024)
    if ty is not None:
        py = _ty_window(ty, ny, y_true, "divergence")
        tx = max(1, min(tx, _fit_tx(tx, 3, 1, n_full, py, zp,
                                    budget=70 * 1024 * 1024)))
        pipeline = True
        grid = (pl.cdiv(n_full, tx), pl.cdiv(ny, ty))
        ywin = py
    else:
        tx, pipeline = _fit_tx_or_serial(tx, 3, 1, n_full, yp, zp,
                                         budget=70 * 1024 * 1024)
        grid = (pl.cdiv(n_full, tx),)
        ywin = ny
    p = tx + 2
    kern = functools.partial(_div_kernel, n_full=n_full, y_hi=y_true - 1,
                             z_hi=z_true - 3, tx=tx, h=h,
                             pipeline=pipeline, ty=ty, ny=ny)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(ins[0].shape, jnp.float32),
        scratch_shapes=_stream_scratch(3, 1, p, ywin,
                                       ins[0].shape[2],
                                       slots=2 if pipeline else 1),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(*ins)
    if standalone:
        out = zg_restore(out, 0, y_true, z_true)
    return out


def _gradsub_kernel(p_hbm, u_hbm, v_hbm, w_hbm, uo, vo, wo,
                    vbuf, in_sems, out_sems, *, n_full, y_hi, z_hi, tx, h,
                    pipeline=True, ty=None, ny=None):
    p = tx + 2

    def compute(refs, wlo, wylo):
        vp, vu, vv, vw = refs
        shape = vp.shape
        gi = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + wlo
        jj = jax.lax.broadcasted_iota(jnp.int32, shape, 1) + wylo
        kk = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
        interior = ((gi >= 1) & (gi <= n_full - 2) & (jj >= 1)
                    & (jj <= y_hi - 1) & (kk <= z_hi))
        zedges = _lane_edges(shape, z_hi)
        _gradsub_stage(vp[...], ((0, vu, 1), (1, vv, 2), (2, vw, 3)),
                       interior, zedges, h=h, p=p, y_hi=y_hi,
                       is_first=wlo == 0, is_last=wlo == n_full - p,
                       wylo=None if ty is None else wylo)

    if ty is None:
        _stream_tiles((p_hbm, u_hbm, v_hbm, w_hbm),
                      ((1, uo), (2, vo), (3, wo)), vbuf, in_sems,
                      out_sems, n_full=n_full, tx=tx, halo=1,
                      compute=lambda refs, wlo: compute(refs, wlo, 0),
                      pipeline=pipeline)
    else:
        _stream_tiles2d((p_hbm, u_hbm, v_hbm, w_hbm),
                        ((1, uo), (2, vo), (3, wo)), vbuf, in_sems,
                        out_sems, n_full=n_full, tx=tx, halo=1, ny=ny,
                        ty=ty, hy=8, compute=compute,
                        pipeline=pipeline)


@functools.partial(jax.jit, static_argnames=("tx", "true_extents", "h",
                                              "ty"))
def gradsub3d_pallas(p_arr, u, v, w, tx: int = 24, true_extents=None,
                     h=None, ty=None):
    """Fused pressure-gradient subtraction + per-component set_bnd
    (the tail of stam.project3d), one HBM pass.  ``h``: grid-spacing
    override for x-slab arrays (see div3d_pallas).  ``ty``: y-tile
    rows for plane sizes that collapse tx (auto-picked at 512^3+)."""
    ins, n_full, y_true, z_true, yp, zp, standalone = _pad_setup(
        (p_arr, u, v, w), true_extents)
    if h is None:
        h = 1.0 / (n_full - 2)
    ny = ins[0].shape[1]
    if ty is None:
        ty = _auto_ty(tx, 4, 1, n_full, yp, zp, ny, y_true,
                      budget=60 * 1024 * 1024)
    if ty is not None:
        py = _ty_window(ty, ny, y_true, "gradsub")
        tx = max(1, min(tx, _fit_tx(tx, 4, 1, n_full, py, zp,
                                    budget=60 * 1024 * 1024)))
        pipeline = True
        grid = (pl.cdiv(n_full, tx), pl.cdiv(ny, ty))
        ywin = py
    else:
        tx, pipeline = _fit_tx_or_serial(tx, 4, 1, n_full, yp, zp,
                                         budget=60 * 1024 * 1024)
        grid = (pl.cdiv(n_full, tx),)
        ywin = ny
    pw = tx + 2
    kern = functools.partial(_gradsub_kernel, n_full=n_full,
                             y_hi=y_true - 1, z_hi=z_true - 3, tx=tx, h=h,
                             pipeline=pipeline, ty=ty, ny=ny)
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=tuple([pl.BlockSpec(memory_space=pl.ANY)] * 3),
        out_shape=tuple(jax.ShapeDtypeStruct(ins[0].shape, jnp.float32)
                        for _ in range(3)),
        scratch_shapes=_stream_scratch(4, 3, pw, ywin,
                                       ins[0].shape[2],
                                       slots=2 if pipeline else 1),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(*ins)
    if standalone:
        outs = tuple(zg_restore(o, b, y_true, z_true)
                     for o, b in zip(outs, (1, 2, 3)))
    return outs


def _project_whole_kernel(u_hbm, v_hbm, w_hbm, uo, vo, wo, vu, vv, vw,
                          vp, vdiv, sems, *, n_full, y_hi, z_hi, h,
                          iters, red_black):
    """Whole projection (divergence -> pressure solve -> gradient
    subtraction, the body of stam.project3d) in ONE kernel call with
    every buffer resident in VMEM — for grids that fit the
    project_whole_ok gate.  The windowed path is three kernel calls
    with div and p round-tripping through HBM.  Each stage reuses the
    exact math of _div_kernel / _solve_whole_kernel / _gradsub_kernel
    with window = the whole array, so the result is bit-identical to
    their composition (tested)."""
    cps = []
    for i, (src, dstv) in enumerate(((u_hbm, vu), (v_hbm, vv),
                                     (w_hbm, vw))):
        cp = pltpu.make_async_copy(src, dstv, sems.at[i])
        cp.start()
        cps.append(cp)
    for cp in cps:
        cp.wait()

    shape = vu.shape
    gi = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    kk = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    interior = ((gi >= 1) & (gi <= n_full - 2) & (jj >= 1)
                & (jj <= y_hi - 1) & (kk <= z_hi))
    zedges = _lane_edges(shape, z_hi)

    # divergence (shared _div_stage: b=0 faces)
    _div_stage(vu, vv, vw, vdiv, interior, zedges, h=h, p=n_full,
               y_hi=y_hi, is_first=True, is_last=True)

    # pressure solve from a zero guess (as _solve_whole_kernel, b=0)
    vp[...] = jnp.zeros(shape, jnp.float32)
    if red_black:
        chk = ((gi + jj + kk) % 2) == 0
        masks = (interior & chk, interior & (~chk))
    else:
        masks = (interior,)
    _jacobi_whole_loop(vp, vdiv[...], masks, zedges, a=1.0,
                       c_inv=1.0 / 6.0, sx=1.0, sy=1.0, sz=1.0,
                       n_full=n_full, y_hi=y_hi, iters=iters)

    # gradient subtraction (shared _gradsub_stage)
    _gradsub_stage(vp[...], ((0, vu, 1), (1, vv, 2), (2, vw, 3)),
                   interior, zedges, h=h, p=n_full, y_hi=y_hi,
                   is_first=True, is_last=True)

    wcps = []
    for i, (ref, out) in enumerate(((vu, uo), (vv, vo), (vw, wo))):
        cp = pltpu.make_async_copy(ref, out, sems.at[i])
        cp.start()
        wcps.append(cp)
    for cp in wcps:
        cp.wait()


def project_whole_ok(shape):
    """True when project3d_whole_pallas can run on ``shape`` (five
    z-ghostless f32 buffers + sweep temporaries resident in VMEM,
    <= ~130^3)."""
    n_full, y_true, z_true = shape
    yp, zp = zg_extents(y_true, z_true)
    return n_full * yp * zp * 4 <= 10 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("iters", "red_black",
                                             "true_extents", "h"))
def project3d_whole_pallas(u, v, w, iters: int, red_black: bool = True,
                           true_extents=None, h=None):
    """Fused stam.project3d for small grids: divergence, ``iters``
    jacobi/red-black pressure sweeps, and the gradient subtraction in
    one kernel call (vs three calls + two HBM round trips of div/p).
    Bit-compatible with div3d_pallas + the dense-path solve +
    gradsub3d_pallas (tested).  Use only when project_whole_ok(shape);
    the residual-reporting final step takes the unfused path."""
    ins, n_full, y_true, z_true, yp, zp, standalone = _pad_setup(
        (u, v, w), true_extents)
    if h is None:
        h = 1.0 / (n_full - 2)
    shape = ins[0].shape
    kern = functools.partial(_project_whole_kernel, n_full=n_full,
                             y_hi=y_true - 1, z_hi=z_true - 3, h=h,
                             iters=iters, red_black=red_black)
    outs = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=tuple([pl.BlockSpec(memory_space=pl.ANY)] * 3),
        out_shape=tuple(jax.ShapeDtypeStruct(shape, jnp.float32)
                        for _ in range(3)),
        scratch_shapes=[pltpu.VMEM(shape, jnp.float32)
                        for _ in range(5)]
                       + [pltpu.SemaphoreType.DMA((3,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*ins)
    if standalone:
        outs = tuple(zg_restore(o, b, y_true, z_true)
                     for o, b in zip(outs, (1, 2, 3)))
    return outs


def _step_whole_kernel(u_hbm, v_hbm, w_hbm, d_hbm, t_hbm,
                       uo, vo_, wo, do_, to,
                       vu, vv, vw, vd, vt, vp, vdiv, va, vb, vc, sems,
                       *, n_full, y_hi, z_hi, dt, h, iters, red_black,
                       eps, b_alpha, b_beta, t_amb, visc_ac, diff_ac,
                       temp_ac, dt0):
    """One ENTIRE 3D stable-fluids step in a single kernel call for
    grids whose working set fits VMEM (step_whole_ok): forcing ->
    diffuse(u,v,w) -> project -> advect(u,v,w) -> project ->
    diffuse(dens/temp) -> advect(dens,temp), composed from the same
    stage helpers the windowed kernels run (_forcing_stage,
    _jacobi_whole_loop, _div_stage, _gradsub_stage, _advect_stage) —
    so the result is bit-identical to the multi-call step (tested).
    Replaces ~6 kernel calls + their HBM round trips per step."""
    cps = []
    for i, (src, dstv) in enumerate(((u_hbm, vu), (v_hbm, vv),
                                     (w_hbm, vw), (d_hbm, vd),
                                     (t_hbm, vt))):
        cp = pltpu.make_async_copy(src, dstv, sems.at[i])
        cp.start()
        cps.append(cp)
    for cp in cps:
        cp.wait()

    shape = vu.shape
    gi = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    kk = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    interior = ((gi >= 1) & (gi <= n_full - 2) & (jj >= 1)
                & (jj <= y_hi - 1) & (kk <= z_hi))
    if red_black:
        chk = ((gi + jj + kk) % 2) == 0
        rb_masks = (interior & chk, interior & (~chk))
    else:
        rb_masks = (interior,)
    zedges = _lane_edges(shape, z_hi)

    def bnd_ref(ref, b):
        sx, sy, _ = _bnd_scales(b)
        _face_fix_ref(ref, True, True, p=n_full, sx=sx, sy=sy,
                      y_hi=y_hi)

    if eps or b_alpha or b_beta:
        _forcing_stage(vu, vv, vw, vd, vt, interior, zedges, bnd_ref,
                       dt=dt, h=h, eps=eps, b_alpha=b_alpha,
                       b_beta=b_beta, t_amb=t_amb)

    def diffuse(ref, b, ac):
        a, c = ac
        sx, sy, sz = _bnd_scales(b)
        _jacobi_whole_loop(ref, ref[...], (interior,), zedges, a=a,
                           c_inv=1.0 / c, sx=sx, sy=sy, sz=sz,
                           n_full=n_full, y_hi=y_hi, iters=iters)

    if visc_ac is not None:
        diffuse(vu, 1, visc_ac)
        diffuse(vv, 2, visc_ac)
        diffuse(vw, 3, visc_ac)

    def project():
        _div_stage(vu, vv, vw, vdiv, interior, zedges, h=h, p=n_full,
                   y_hi=y_hi, is_first=True, is_last=True)
        vp[...] = jnp.zeros(shape, jnp.float32)
        _jacobi_whole_loop(vp, vdiv[...], rb_masks, zedges, a=1.0,
                           c_inv=1.0 / 6.0, sx=1.0, sy=1.0, sz=1.0,
                           n_full=n_full, y_hi=y_hi, iters=iters)
        _gradsub_stage(vp[...], ((0, vu, 1), (1, vv, 2), (2, vw, 3)),
                       interior, zedges, h=h, p=n_full, y_hi=y_hi,
                       is_first=True, is_last=True)

    project()
    _advect_stage(vu, vv, vw, (vu, vv, vw), (va, vb, vc), 0, 0,
                  p=n_full, n_full=n_full, gn=n_full, y_hi=y_hi,
                  z_hi=z_hi, dt0=dt0, bnds=(1, 2, 3))
    vu[...] = va[...]
    vv[...] = vb[...]
    vw[...] = vc[...]
    project()
    if diff_ac is not None:
        diffuse(vd, 0, diff_ac)
    if temp_ac is not None:
        diffuse(vt, 0, temp_ac)
    _advect_stage(vu, vv, vw, (vd, vt), (va, vb), 0, 0, p=n_full,
                  n_full=n_full, gn=n_full, y_hi=y_hi, z_hi=z_hi,
                  dt0=dt0, bnds=(0, 0))
    vd[...] = va[...]
    vt[...] = vb[...]

    wcps = []
    for i, (ref, out) in enumerate(((vu, uo), (vv, vo_), (vw, wo),
                                    (vd, do_), (vt, to))):
        cp = pltpu.make_async_copy(ref, out, sems.at[i])
        cp.start()
        wcps.append(cp)
    for cp in wcps:
        cp.wait()


def step_whole_ok(shape):
    """True when the fused whole-step kernel fits ``shape`` (10
    resident buffers + the forcing stage's ~8 full-array temporaries;
    ~<=80^3 at f32)."""
    n_full, y_true, z_true = shape
    yp, zp = zg_extents(y_true, z_true)
    return n_full * yp * zp * 4 <= 3 * 1024 * 1024 + 512 * 1024


@functools.partial(jax.jit, static_argnames=(
    "iters", "red_black", "dt", "h", "eps", "b_alpha", "b_beta",
    "t_amb", "visc_ac", "diff_ac", "temp_ac", "dt0", "true_extents"))
def step3d_whole_pallas(u, v, w, dens, temp, *, iters, red_black, dt,
                        h, eps, b_alpha, b_beta, t_amb, visc_ac,
                        diff_ac, temp_ac, dt0, true_extents=None):
    """Fused whole 3D step (see _step_whole_kernel).  ``visc_ac`` /
    ``diff_ac`` / ``temp_ac``: the diffuse (a, c) coefficient pairs or
    None when that diffusion is off.  Dispatched by stam.step3d when
    step_whole_ok and the config is the jacobi/stencil pallas path."""
    ins, n_full, y_true, z_true, yp, zp, standalone = _pad_setup(
        (u, v, w, dens, temp), true_extents)
    shape = ins[0].shape
    kern = functools.partial(
        _step_whole_kernel, n_full=n_full, y_hi=y_true - 1,
        z_hi=z_true - 3, dt=dt, h=h, iters=iters, red_black=red_black,
        eps=eps, b_alpha=b_alpha, b_beta=b_beta, t_amb=t_amb,
        visc_ac=visc_ac, diff_ac=diff_ac, temp_ac=temp_ac, dt0=dt0)
    outs = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5,
        out_specs=tuple([pl.BlockSpec(memory_space=pl.ANY)] * 5),
        out_shape=tuple(jax.ShapeDtypeStruct(shape, jnp.float32)
                        for _ in range(5)),
        scratch_shapes=[pltpu.VMEM(shape, jnp.float32)
                        for _ in range(10)]
                       + [pltpu.SemaphoreType.DMA((5,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*ins)
    if standalone:
        outs = tuple(zg_restore(o, b, y_true, z_true)
                     for o, b in zip(outs, (1, 2, 3, 0, 0)))
    return outs


# ---------------------------------------------------------------------------
# fused multi-field 27-tap semi-Lagrangian advection


def _advect_kernel(gx0_ref, u_hbm, v_hbm, w_hbm, *rest, n_full, gn,
                   y_hi, z_hi, tx, dt0, bnds, pipeline, self_advect,
                   ty=None, ny=None):
    """rest = (field_hbm..., out_hbm..., vbuf, in_sems, out_sems).
    Advect k fields by (u,v,w) with one shared set of backtrace weights
    (the XLA path recomputes them per field).

    ``gx0_ref``: scalar-prefetch (1,) i32 — the GLOBAL dense row index
    of array row 0 (0 for the dense full cube; an x-slab under spatial
    decomposition passes its offset so the backtrace clamp, interior
    mask, and face fix see global coordinates).  ``gn`` is the global
    x extent incl. ghosts.

    The 27-tap loop streams one output x-plane at a time: whole-window
    formulation keeps ~5 window-sized temporaries per field live and
    register-spills far past the VMEM limit (measured 214M at 256^3
    with tx=8), while per-plane temporaries are ~400 KB each.  Outputs
    go to dedicated plane buffers (in-place window writes would corrupt
    the dx=-1 taps of the next plane).

    ``self_advect``: the advected fields ARE (u, v, w) — the velocity
    self-advection pass — so no field inputs exist and the velocity
    windows double as field windows (halves the input DMA traffic)."""
    k = len(bnds)
    nf = 0 if self_advect else k
    f_hbm = rest[:nf]
    o_hbm = rest[nf:nf + k]
    vbuf, in_sems, out_sems = rest[nf + k:nf + k + 3]
    p = tx + 2
    n_in = 3 + nf

    def compute(refs, wlo, wylo):
        vu, vv, vw = refs[:3]
        vf = refs[:3] if self_advect else refs[3:3 + k]
        vo = refs[n_in:n_in + k]
        _advect_stage(vu, vv, vw, vf, vo, wlo, gx0_ref[0], p=p,
                      n_full=n_full, gn=gn, y_hi=y_hi, z_hi=z_hi,
                      dt0=dt0, bnds=bnds,
                      wylo=None if ty is None else wylo)

    if ty is None:
        _stream_tiles((u_hbm, v_hbm, w_hbm) + tuple(f_hbm),
                      tuple((n_in + q, o_hbm[q]) for q in range(k)),
                      vbuf, in_sems, out_sems, n_full=n_full, tx=tx,
                      halo=1,
                      compute=lambda refs, wlo: compute(refs, wlo, 0),
                      pipeline=pipeline, n_bufs=n_in + k)
    else:
        _stream_tiles2d((u_hbm, v_hbm, w_hbm) + tuple(f_hbm),
                        tuple((n_in + q, o_hbm[q]) for q in range(k)),
                        vbuf, in_sems, out_sems, n_full=n_full, tx=tx,
                        halo=1, ny=ny, ty=ty, hy=8, compute=compute,
                        pipeline=pipeline, n_bufs=n_in + k)


def _advect_stage(vu, vv, vw, vf, vo, wlo, gx0, *, p, n_full, gn, y_hi,
                  z_hi, dt0, bnds, wylo=None):
    """27-tap stencil-advection compute body shared by the windowed
    _advect_kernel and the fused whole-step kernel (one copy keeps the
    bit-compatibility from drifting).  ``vf``/``vo``: source / output
    window refs per field; ``gx0`` the global dense row of array row
    0; ``wylo`` the window-global y of window row 0 for y-tiled
    windows (None = full-y)."""
    k = len(bnds)
    dyn_y = wylo is not None
    wy0 = wylo if dyn_y else 0
    pshape = (1,) + vu.shape[1:]
    jj = jax.lax.broadcasted_iota(jnp.int32, pshape, 1) + wy0
    kk = jax.lax.broadcasted_iota(jnp.int32, pshape, 2)
    jjf = jj.astype(jnp.float32)
    kkf = kk.astype(jnp.float32) + 1.0   # lane k holds true z = k+1
    yz_int = ((jj >= 1) & (jj <= y_hi - 1) & (kk <= z_hi))
    elo, ehi = _lane_edges(pshape, z_hi)
    szs = [(-1.0 if b == 3 else 1.0) for b in bnds]

    def hat(o, d):
        return jnp.maximum(0.0, 1.0 - jnp.abs(o - d))

    def plane(ref, j):
        return ref[pl.ds(j, 1)]

    def body(j, _):
        gi = wlo + j + gx0            # GLOBAL dense row index
        gif = gi.astype(jnp.float32)

        def offs(vel, coord, extent):
            o = jnp.clip(-dt0 * vel, -1.0, 1.0)
            # per-cell source clamp to [0.5, n_axis + 0.5] where
            # n_axis = extent - 2 interior cells, matching the
            # dense stencil advection
            return jnp.clip(o, 0.5 - coord, extent - 1.5 - coord)

        ox = offs(plane(vu, j), gif, jnp.float32(gn))
        oy = offs(plane(vv, j), jjf, jnp.float32(y_hi + 1))
        oz = offs(plane(vw, j), kkf, jnp.float32(z_hi + 3))
        wxs = [hat(ox, d) for d in (-1, 0, 1)]
        wys = [hat(oy, d) for d in (-1, 0, 1)]
        wz_m1, wz_0, wz_p1 = (hat(oz, d) for d in (-1, 0, 1))
        # the unstored z-ghost value equals sz * the center tap
        # (set_bnd invariant), so the edge lanes' dz=+-1 weight
        # folds onto the center with scale sz.  One rounding
        # different from the dense two-product sum (tests use
        # atol); taps then stay plain shifts with zero fill.
        edge_w = (jnp.where(elo, wz_m1, 0.0)
                  + jnp.where(ehi, wz_p1, 0.0))
        wz_m1 = jnp.where(elo, 0.0, wz_m1)
        wz_p1 = jnp.where(ehi, 0.0, wz_p1)
        wz0 = {s: wz_0 + s * edge_w for s in set(szs)}

        # the (wy, wz) tap products are independent of dx, so they are
        # built ONCE per output plane (12 vector products) instead of
        # per (dx, dy) pair (45): the body is VPU-op-bound
        # (verify/bench_opcost.py), and the per-dx partial sums get
        # their wx factor in a single fma at accumulation time.  Tap
        # values are identical to the nested-product form; only the
        # multiply association differs (fp32-rounding-level, within the
        # advect tests' tolerance).
        wyz_m1 = [wys[dy] * wz_m1 for dy in range(3)]
        wyz_p1 = [wys[dy] * wz_p1 for dy in range(3)]
        wyz_0 = {s: [wys[dy] * w0 for dy in range(3)]
                 for s, w0 in wz0.items()}
        outs = [jnp.zeros(pshape, jnp.float32) for _ in range(k)]
        ctr = [None] * k
        for dx in (-1, 0, 1):
            fx = [plane(vf[q], j + dx) for q in range(k)]
            if dx == 0:
                ctr = fx
            sums = [jnp.zeros(pshape, jnp.float32) for _ in range(k)]
            for dy in (-1, 0, 1):
                fxy = [_shift(f, dy, 1) for f in fx]
                for q in range(k):
                    sums[q] = (sums[q]
                               + wyz_m1[dy + 1] * _shift(fxy[q], -1, 2)
                               + wyz_0[szs[q]][dy + 1] * fxy[q]
                               + wyz_p1[dy + 1] * _shift(fxy[q], 1, 2))
            for q in range(k):
                outs[q] = outs[q] + wxs[dx + 1] * sums[q]

        ok = yz_int & (gi >= 1) & (gi <= gn - 2)
        for q in range(k):
            vo[q][pl.ds(j, 1)] = jnp.where(ok, outs[q], ctr[q])
        return 0

    # planes 0 / p-1 lack a window neighbor; they are only live at
    # the domain faces, where the face fix rewrites them below
    jax.lax.fori_loop(1, p - 1, body, 0, unroll=False)

    # global domain x-faces only (an interior x-slab's array edges
    # are halo planes, discarded by the caller)
    is_first = (wlo == 0) & (gx0 == 0)
    is_last = (wlo == n_full - p) & (gx0 + n_full == gn)
    for q in range(k):
        # seed the never-computed edge planes from the input field
        # (their retained values are either face-fix overwritten or
        # outside the export span; the copy just keeps every VMEM
        # read below initialized, per the kernel conventions)
        vo[q][pl.ds(0, 1)] = plane(vf[q], 0)
        vo[q][pl.ds(p - 1, 1)] = plane(vf[q], p - 1)
        sx, sy, _ = _bnd_scales(bnds[q])
        _face_fix_ref(vo[q], is_first, is_last, p=p, sx=sx, sy=sy,
                      y_hi=y_hi, wylo=wylo if dyn_y else None)


@functools.partial(jax.jit, static_argnames=("bnds", "dt0", "tx",
                                             "self_advect", "pipeline",
                                             "true_extents", "gn", "ty"))
def advect3d_multi_pallas(fields, bnds, u, v, w, dt0: float,
                          tx: int = 8, self_advect: bool = False,
                          pipeline: bool = None, true_extents=None,
                          gx0=None, gn=None, ty=None):
    """Fused 27-tap stencil advection of ``fields`` (tuple) by (u,v,w).

    Equivalent to calling stam.advect3d_stencil per field, but the
    backtrace weights are computed once and all fields stream through
    VMEM together.  The compute body streams per output plane (see
    _advect_kernel), so the window buffers are the only VMEM cost and
    the double-buffered pipeline fits.

    ``self_advect=True`` (STATIC; caller asserts fields == (u, v, w))
    skips the duplicate field windows — the uvw pass would otherwise
    DMA the same three arrays twice.

    ``gx0``/``gn``: global x placement for x-slab arrays under spatial
    decomposition — gx0 (traced i32 scalar) is the global dense row of
    array row 0, gn (static) the global x extent incl. ghosts.  Dense
    callers omit both (gx0=0, gn=n_full).
    """
    k = len(fields)
    assert len(bnds) == k
    if self_advect:
        assert k == 3
    arrs, n_full, y_true, z_true, yp, zp, standalone = _pad_setup(
        (u, v, w) + (() if self_advect else tuple(fields)), true_extents)
    if gn is None:
        gn = n_full
    gx0_arr = (jnp.zeros((1,), jnp.int32) if gx0 is None
               else jnp.asarray(gx0, jnp.int32).reshape(1))
    u_, v_, w_ = arrs[:3]
    fs = arrs[3:]
    n_in = 3 + len(fs)
    n_bufs = n_in + k
    # the per-plane compute body keeps ~46 plane-sized temporaries
    # live (measured at 512^3: 58M of spills+temps beside the 80M
    # window scratch); budget only what they leave of the VMEM limit
    ny = yp
    plane = yp * zp * 4
    budget = max(16 * 1024 * 1024,
                 112 * 1024 * 1024 - 46 * plane)
    if ty is None:
        ty = _auto_ty(tx, n_bufs, 1, n_full, yp, zp, ny, y_true,
                      budget=budget)
    if ty is not None:
        py = _ty_window(ty, ny, y_true, "advect")
        # per-plane temporaries shrink to the window rows
        budget = max(16 * 1024 * 1024,
                     112 * 1024 * 1024 - 46 * py * zp * 4)
        tx = max(1, min(tx, _fit_tx(tx, n_bufs, 1, n_full, py, zp,
                                    budget=budget)))
        pipeline = True
        p = tx + 2
        grid = (pl.cdiv(n_full, tx), pl.cdiv(ny, ty))
        ywin = py
    else:
        want = tx
        tx = _fit_tx(tx, n_bufs, 1, n_full, yp, zp, budget=budget)
        auto = pipeline is None
        if auto:
            pipeline = tx >= 4
        if not pipeline:
            # auto fallback: unpipelined frees a slot, retry a wide
            # tile; explicit pipeline=False keeps the caller's request
            tx = _fit_tx(8 if auto else want, n_bufs, 1, n_full, yp, zp,
                         slots=1, budget=budget)
        p = tx + 2
        grid = (pl.cdiv(n_full, tx),)
        ywin = yp

    kern = functools.partial(
        _advect_kernel, n_full=n_full, gn=gn, y_hi=y_true - 1,
        z_hi=z_true - 3, tx=tx, dt0=dt0, bnds=bnds, pipeline=pipeline,
        self_advect=self_advect, ty=ty, ny=ny)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_in,
        out_specs=tuple([pl.BlockSpec(memory_space=pl.ANY)] * k),
        scratch_shapes=_stream_scratch(n_bufs, k, p, ywin, zp,
                                       slots=2 if pipeline else 1),
    )
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct(u_.shape, jnp.float32) for _ in range(k)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(gx0_arr, u_, v_, w_, *fs)
    if standalone:
        outs = tuple(zg_restore(o, b, y_true, z_true)
                     for o, b in zip(outs, bnds))
    return outs


# ---------------------------------------------------------------------------
# packed red-black solver: the checkerboard is deinterleaved along the
# SUBLANE (y) axis into phase arrays A (parity 0 = red) and B (parity 1)
# of half the rows, so each half-sweep computes ONLY its active cells —
# the naive formulation computes both parities and discards half.
#
# Packing along y (not z) keeps lanes fully utilized: half-z would need
# zp/2 lanes re-padded to 128, half-y re-pads sublanes to 8 (~3%).
# In the z-ghostless layout lane k holds true z = k + 1; with
# r = (i + k) % 2 (the row offset of phase A at plane i, lane k):
#   A[i, j', k] = x[i, 2j' + r,     k + 1]   (cells with 0-based
#   B[i, j', k] = x[i, 2j' + 1 - r, k + 1]    interior parity 0 / 1)
# the 6-tap stencil of an A-cell reads B with PLAIN +-1 shifts along x
# and z (the neighbor's phase offset absorbs the parity flip), and a
# 2-shift select along y.  The z-ghost taps at the edge lanes read the
# updating cell ITSELF scaled by sz (the ghost x[i,y,0] = sz*x[i,y,1]
# and (i, y, z=1) is the A-cell at lane 0 — same packed position).
# Identical per-cell arithmetic in the dense order -> bit-compatible
# with stam.lin_solve3d (tested).


def _rb_r_mask(shape, wlo):
    """True where phase A's row offset r = (i + k) % 2 == 0 (lane k
    holds true z = k + 1)."""
    gi = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + wlo
    kk = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    return ((gi + kk) % 2) == 0


def _rb_face_fix(vA, vB, is_first, is_last, r0, *, p, sx, sy, y_hi):
    """set_bnd in packed space (dense order: x, then y faces; the z
    faces are unstored in the z-ghostless layout — their taps are
    synthesized inside _rb_half_sweep).  All slabs are thin.  ``r0``
    is the r==0 mask restricted to the slab shapes where needed."""
    # x faces: cell (0, j, k) <- (1, j, k); the neighbor plane's phase
    # offset flips, so A[0] copies B[1] and vice versa
    a1, b1 = vA[1:2], vB[1:2]
    vA[0:1] = jnp.where(is_first, sx * b1, vA[0:1])
    vB[0:1] = jnp.where(is_first, sx * a1, vB[0:1])
    am, bm = vA[p - 2:p - 1], vB[p - 2:p - 1]
    vA[p - 1:p] = jnp.where(is_last, sx * bm, vA[p - 1:p])
    vB[p - 1:p] = jnp.where(is_last, sx * am, vB[p - 1:p])
    _rb_face_fix_y(vA, vB, r0, sy=sy, y_hi=y_hi)


def _rb_ghost_fix_x_dyn(vA, vB, rel, apply, sx, src_off):
    """Refresh the packed x-ghost row at dynamic window-relative row
    ``rel`` from the adjacent interior row rel+src_off (+1 at the low
    domain face, -1 at the high one; the phase offset flips), gated by
    ``apply`` — the sharded solver's x-face fix, whose ghost rows sit
    INSIDE the padded slab (absolute rows halo-1 / n_full-halo) rather
    than at the array edge."""
    a1 = vA[pl.ds(rel + src_off, 1)]
    b1 = vB[pl.ds(rel + src_off, 1)]
    ca = vA[pl.ds(rel, 1)]
    cb = vB[pl.ds(rel, 1)]
    vA[pl.ds(rel, 1)] = jnp.where(apply, sx * b1, ca)
    vB[pl.ds(rel, 1)] = jnp.where(apply, sx * a1, cb)


def _rb_face_fix_y(vA, vB, r0, *, sy, y_hi):
    """The y-face part of _rb_face_fix (shared with the sharded solver,
    whose x faces are handled by _rb_ghost_fix_x_dyn)."""
    # y-lo face: j=0 lives in A where r==0 (else in B); source j=1 is
    # the other phase's slab 0
    r0y = r0[:, 0:1, :]
    a0, b0 = vA[:, 0:1, :], vB[:, 0:1, :]
    vA[:, 0:1, :] = jnp.where(r0y, sy * b0, a0)
    vB[:, 0:1, :] = jnp.where(r0y, b0, sy * a0)
    # y-hi face: j=y_hi at packed index h in the phase holding its
    # parity; source j=y_hi-1 at index hs in the other phase
    if y_hi % 2 == 0:
        # j=y_hi even: in A where r==0 (A j=2j'), in B where r==1
        # (B j=2m+1-r=2m); source y_hi-1 odd: B (r==0) at h-1, A (r==1)
        # at h-1
        h = y_hi // 2
        ah, bh = vA[:, h:h + 1, :], vB[:, h:h + 1, :]
        asrc = vA[:, h - 1:h, :]
        bsrc = vB[:, h - 1:h, :]
        vA[:, h:h + 1, :] = jnp.where(r0y, sy * bsrc, ah)
        vB[:, h:h + 1, :] = jnp.where(r0y, bh, sy * asrc)
    else:
        # j=y_hi odd: in A where r==1 (A j=2j'+1 at j'=(y_hi-1)/2), in
        # B where r==0 (B j=2m+1 at m=(y_hi-1)/2); source y_hi-1 even:
        # A (r==0) / B (r==1) at the same index
        h = (y_hi - 1) // 2
        ah, bh = vA[:, h:h + 1, :], vB[:, h:h + 1, :]
        vA[:, h:h + 1, :] = jnp.where(r0y, ah, sy * bh)
        vB[:, h:h + 1, :] = jnp.where(r0y, sy * ah, bh)


def _rb_face_fix_y_dyn(vA, vB, r0y, wylo, py, *, sy, y_hi):
    """_rb_face_fix_y for a packed-y WINDOW [wylo, wylo + py): the
    domain y-faces sit at dynamic window-relative rows.  The lo face is
    global packed row 0 (window row 0 iff wylo == 0, the clamped first
    y-tile); the hi face is global packed row h in the phase holding
    y_hi's parity, at window row h - wylo when the window contains it.
    Same per-row formulas as the static fix, gated by ``apply``."""
    apply_lo = wylo == 0
    a0, b0 = vA[:, 0:1, :], vB[:, 0:1, :]
    vA[:, 0:1, :] = jnp.where(apply_lo & r0y, sy * b0, a0)
    vB[:, 0:1, :] = jnp.where(apply_lo, jnp.where(r0y, b0, sy * a0), b0)
    if y_hi % 2 == 0:
        h = y_hi // 2
        rel = h - wylo
        apply_hi = (rel >= 1) & (rel <= py - 1)
        relc = jnp.clip(rel, 1, py - 1)
        ah = vA[:, pl.ds(relc, 1), :]
        bh = vB[:, pl.ds(relc, 1), :]
        asrc = vA[:, pl.ds(relc - 1, 1), :]
        bsrc = vB[:, pl.ds(relc - 1, 1), :]
        vA[:, pl.ds(relc, 1), :] = jnp.where(apply_hi & r0y, sy * bsrc,
                                             ah)
        vB[:, pl.ds(relc, 1), :] = jnp.where(
            apply_hi, jnp.where(r0y, bh, sy * asrc), bh)
    else:
        h = (y_hi - 1) // 2
        rel = h - wylo
        apply_hi = (rel >= 0) & (rel <= py - 1)
        relc = jnp.clip(rel, 0, py - 1)
        ah = vA[:, pl.ds(relc, 1), :]
        bh = vB[:, pl.ds(relc, 1), :]
        vA[:, pl.ds(relc, 1), :] = jnp.where(
            apply_hi, jnp.where(r0y, ah, sy * bh), ah)
        vB[:, pl.ds(relc, 1), :] = jnp.where(
            apply_hi, jnp.where(r0y, sy * ah, bh), bh)


def _rb_sweeps_yt(vA, vB, vA0, vB0, wlo, wylo, *, a, c_inv, sx, sy, sz,
                  n_full, y_hi, z_hi, p, py, n_sweeps):
    """_rb_sweeps on an (x, packed-y) window: x faces are static window
    rows (first/last x-tile only), y faces go through the dynamic-row
    fix.  The packed-y halo must be >= n_sweeps rows: each half-sweep
    reads the other phase at packed-y shifts {-1, 0, +1}, so window
    y-edge garbage advances one row per half-sweep — the same cone
    argument as the x halo."""
    r0w = _rb_r_mask(vA.shape, wlo)
    r0y = r0w[:, 0:1, :]
    zedges = _lane_edges(vA.shape, z_hi)
    is_first = wlo == 0
    is_last = wlo == n_full - p
    a0v = vA0[...]
    b0v = vB0[...]
    for sw in range(n_sweeps):
        if sw % 2 == 0:
            _rb_half_sweep(vA, vB, a0v, r0w, zedges, a=a, c_inv=c_inv,
                           sz=sz)
        else:
            _rb_half_sweep(vB, vA, b0v, ~r0w, zedges, a=a, c_inv=c_inv,
                           sz=sz)
        # x faces (dense order: x then y), as in _rb_face_fix
        a1, b1 = vA[1:2], vB[1:2]
        vA[0:1] = jnp.where(is_first, sx * b1, vA[0:1])
        vB[0:1] = jnp.where(is_first, sx * a1, vB[0:1])
        am, bm = vA[p - 2:p - 1], vB[p - 2:p - 1]
        vA[p - 1:p] = jnp.where(is_last, sx * bm, vA[p - 1:p])
        vB[p - 1:p] = jnp.where(is_last, sx * am, vB[p - 1:p])
        _rb_face_fix_y_dyn(vA, vB, r0y, wylo, py, sy=sy, y_hi=y_hi)


def _rb_half_sweep(dst, src, dst0, r_sel, zedges, *, a, c_inv, sz):
    """Update phase ``dst`` from ``src`` (the other phase).  ``r_sel``
    selects the y-tap shift direction (True rows take shift(-1)/no-op,
    False rows no-op/shift(+1)); dense tap order preserved.  The z-edge
    taps read the unstored set_bnd ghost, which equals sz * the
    updating cell's own pre-update value (see the section comment) —
    bit-equal to the dense stored ghost.

    No interior mask: every dst cell is active parity; face and padding
    cells receive garbage but the face fix immediately rewrites faces
    from interior values (the boundary closes the system at domain
    edges, window x-edge garbage stays outside the halo cone, and the
    z-edge selects wall off the lane padding), so retained values are
    bit-identical to the masked form (tested)."""
    s = src[...]
    d = dst[...]
    ylo = jnp.where(r_sel, _shift(s, -1, 1), s)
    yhi = jnp.where(r_sel, s, _shift(s, 1, 1))
    taps = (_shift(s, -1, 0) + _shift(s, 1, 0) + ylo + yhi
            + _zshift_g(s, -1, sz, *zedges, ghost_src=d)
            + _zshift_g(s, 1, sz, *zedges, ghost_src=d))
    dst[...] = (dst0 + a * taps) * c_inv


def _rb_sweeps(vA, vB, vA0, vB0, wlo, *, a, c_inv, sx, sy, sz, n_full,
               y_hi, z_hi, p, n_sweeps):
    """Run the packed red-black sweep loop on one window (shared by
    the single-buffer and pipelined kernels).

    Full-window sweeps: a light-cone-trimmed variant (dynamic-start
    spans shrinking per sweep) measured neutral-to-slower on v5e at
    256^3 — the dynamic-slice reads cost what the skipped planes
    save — so the simple formulation stays."""
    r0w = _rb_r_mask(vA.shape, wlo)
    zedges = _lane_edges(vA.shape, z_hi)
    is_first = wlo == 0
    is_last = wlo == n_full - p
    a0v = vA0[...]
    b0v = vB0[...]
    for sw in range(n_sweeps):
        if sw % 2 == 0:
            # parity-0 half-sweep: update A from B.  A-cell j-1 = B at
            # j'-1 when r==0 else j'; j+1 = B at j' when r==0 else j'+1
            _rb_half_sweep(vA, vB, a0v, r0w, zedges, a=a, c_inv=c_inv,
                           sz=sz)
        else:
            # parity-1: B-cell has offset 1-r; shift select flips
            _rb_half_sweep(vB, vA, b0v, ~r0w, zedges, a=a, c_inv=c_inv,
                           sz=sz)
        _rb_face_fix(vA, vB, is_first, is_last, r0w, p=p, sx=sx, sy=sy,
                     y_hi=y_hi)


def _rb_sweeps_whole(vA, vB, vA0, vB0, *, a, c_inv, sx, sy, sz,
                     n_full, y_hi, z_hi, iters):
    """All ``iters`` red-black iterations on the WHOLE packed arrays in
    VMEM: no windows, so no halo cone, no seam garbage, no redundant
    halo recompute, and a single HBM read+write for the entire solve
    (the windowed plans re-stream the field once per fused pass).  The
    face fix applies unconditionally at both x edges every half-sweep.
    fori_loop keeps compile time independent of ``iters`` (the windowed
    kernels unroll their n_sweeps)."""
    r0 = _rb_r_mask(vA.shape, 0)
    zedges = _lane_edges(vA.shape, z_hi)
    a0v = vA0[...]
    b0v = vB0[...]

    def body(_, carry):
        _rb_half_sweep(vA, vB, a0v, r0, zedges, a=a, c_inv=c_inv, sz=sz)
        _rb_face_fix(vA, vB, True, True, r0, p=n_full, sx=sx, sy=sy,
                     y_hi=y_hi)
        _rb_half_sweep(vB, vA, b0v, ~r0, zedges, a=a, c_inv=c_inv,
                       sz=sz)
        _rb_face_fix(vA, vB, True, True, r0, p=n_full, sx=sx, sy=sy,
                     y_hi=y_hi)
        return carry

    jax.lax.fori_loop(0, iters, body, 0)


def _solve_rb_packed_whole_kernel(xA_hbm, xB_hbm, a0_hbm, b0_hbm,
                                  oA_hbm, oB_hbm, vA, vB, vA0, vB0,
                                  sems, *, a, c_inv, sx, sy, sz, n_full,
                                  y_hi, z_hi, iters):
    """Whole-solve-in-VMEM packed red-black kernel (grids whose four
    packed buffers fit VMEM, <= ~130^3): the 3D analog of
    _lin_solve2d_kernel."""
    cps = []
    for i, (src, dstv) in enumerate(((xA_hbm, vA), (xB_hbm, vB),
                                     (a0_hbm, vA0), (b0_hbm, vB0))):
        cp = pltpu.make_async_copy(src, dstv, sems.at[i])
        cp.start()
        cps.append(cp)
    for cp in cps:
        cp.wait()

    _rb_sweeps_whole(vA, vB, vA0, vB0, a=a, c_inv=c_inv, sx=sx, sy=sy,
                     sz=sz, n_full=n_full, y_hi=y_hi, z_hi=z_hi,
                     iters=iters)

    wcps = []
    for i, (ref, out) in enumerate(((vA, oA_hbm), (vB, oB_hbm))):
        cp = pltpu.make_async_copy(ref, out, sems.at[i])
        cp.start()
        wcps.append(cp)
    for cp in wcps:
        cp.wait()


def _solve_rb_packed_kernel(xA_hbm, xB_hbm, a0_hbm, b0_hbm, oA_hbm,
                            oB_hbm, vA, vB, vA0, vB0, sems, *,
                            a, c_inv, sx, sy, sz, n_full, y_hi, z_hi,
                            tx, halo, n_sweeps):
    t = pl.program_id(0)
    p = tx + 2 * halo
    lo = jnp.minimum(t * tx, n_full - tx)
    wlo = jnp.clip(lo - halo, 0, n_full - p)

    cps = []
    for i, (src, dstv) in enumerate(((xA_hbm, vA), (xB_hbm, vB),
                                     (a0_hbm, vA0), (b0_hbm, vB0))):
        cp = pltpu.make_async_copy(src.at[pl.ds(wlo, p)], dstv,
                                   sems.at[i])
        cp.start()
        cps.append(cp)
    for cp in cps:
        cp.wait()

    _rb_sweeps(vA, vB, vA0, vB0, wlo, a=a, c_inv=c_inv, sx=sx, sy=sy,
               sz=sz, n_full=n_full, y_hi=y_hi, z_hi=z_hi, p=p,
               n_sweeps=n_sweeps)

    wcps = []
    for i, (ref, out) in enumerate(((vA, oA_hbm), (vB, oB_hbm))):
        cp = pltpu.make_async_copy(ref.at[pl.ds(lo - wlo, tx)],
                                   out.at[pl.ds(lo, tx)], sems.at[i])
        cp.start()
        wcps.append(cp)
    for cp in wcps:
        cp.wait()


def _geom2d(nx, nyy):
    """(ii, jj, col_int, interior) iota masks for a full (nx, nyy)
    2D field with a one-cell ghost frame."""
    shape = (nx, nyy)
    ii = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    col_int = (jj >= 1) & (jj <= nyy - 2)
    interior = (ii >= 1) & (ii <= nx - 2) & col_int
    return ii, jj, col_int, interior


def _set_bnd2d_stage(xx, geom, *, sx, sy, nx, nyy):
    """stam.set_bnd2d on a VMEM-resident value, in its exact order:
    x edges (interior cols), then full y edges, then corner averages —
    bit-compatible with the dense set_bnd2d (tested via the solve and
    fused-step kernels)."""
    ii, jj, col_int, _ = geom
    xx = jnp.where((ii == 0) & col_int, sx * _shift(xx, 1, 0), xx)
    xx = jnp.where((ii == nx - 1) & col_int,
                   sx * _shift(xx, -1, 0), xx)
    xx = jnp.where(jj == 0, sy * _shift(xx, 1, 1), xx)
    xx = jnp.where(jj == nyy - 1, sy * _shift(xx, -1, 1), xx)
    dn, up = _shift(xx, 1, 0), _shift(xx, -1, 0)
    rt, lf = _shift(xx, 1, 1), _shift(xx, -1, 1)
    xx = jnp.where((ii == 0) & (jj == 0), 0.5 * (dn + rt), xx)
    xx = jnp.where((ii == 0) & (jj == nyy - 1), 0.5 * (dn + lf), xx)
    xx = jnp.where((ii == nx - 1) & (jj == 0), 0.5 * (up + rt), xx)
    xx = jnp.where((ii == nx - 1) & (jj == nyy - 1),
                   0.5 * (up + lf), xx)
    return xx


def _solve2d_sweeps(vx, x0v, geom, *, a, c_inv, sx, sy, nx, nyy, iters):
    """``iters`` Jacobi sweeps + set_bnd2d on a VMEM ref — the loop
    body of stam.lin_solve2d, bit-compatible (tested)."""
    _, _, _, interior = geom

    def body(_, carry):
        xx = vx[...]
        nb = (_shift(xx, -1, 0) + _shift(xx, 1, 0)
              + _shift(xx, -1, 1) + _shift(xx, 1, 1))
        xx = jnp.where(interior, (x0v + a * nb) * c_inv, xx)
        vx[...] = _set_bnd2d_stage(xx, geom, sx=sx, sy=sy, nx=nx,
                                   nyy=nyy)
        return carry

    jax.lax.fori_loop(0, iters, body, 0)


def _lin_solve2d_kernel(x_hbm, x0_hbm, o_hbm, vx, v0, sems, *, a, c_inv,
                        sx, sy, nx, nyy, iters):
    """Whole 2D solve in one kernel invocation: both arrays live in
    VMEM for all ``iters`` Jacobi sweeps + set_bnd2d fixes.  The XLA
    formulation pays per-op dispatch for every sweep's shifts and the
    8 thin set_bnd updates — ~100 tiny kernels for a 20-iteration
    diffuse at 128^2, which dominates the 2D step's time."""
    cps = [pltpu.make_async_copy(x_hbm, vx, sems.at[0]),
           pltpu.make_async_copy(x0_hbm, v0, sems.at[1])]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()
    geom = _geom2d(nx, nyy)
    _solve2d_sweeps(vx, v0[...], geom, a=a, c_inv=c_inv, sx=sx, sy=sy,
                    nx=nx, nyy=nyy, iters=iters)
    ocp = pltpu.make_async_copy(vx, o_hbm, sems.at[0])
    ocp.start()
    ocp.wait()


@functools.partial(jax.jit, static_argnames=("b", "a", "c", "iters"))
def lin_solve2d_pallas(b: int, x, x0, a: float, c: float, iters: int):
    """Fused drop-in for stam.lin_solve2d: the full iteration loop in
    one pallas_call (bit-compatible, tested)."""
    nx, nyy = x.shape
    sx = -1.0 if b == 1 else 1.0
    sy = -1.0 if b == 2 else 1.0
    kern = functools.partial(_lin_solve2d_kernel, a=a, c_inv=1.0 / c,
                             sx=sx, sy=sy, nx=nx, nyy=nyy, iters=iters)
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        scratch_shapes=[pltpu.VMEM((nx, nyy), jnp.float32),
                        pltpu.VMEM((nx, nyy), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, x0)


def _bnd2d(xx, b, geom, *, nx, nyy):
    """_set_bnd2d_stage with scales resolved from the field code."""
    return _set_bnd2d_stage(xx, geom, sx=-1.0 if b == 1 else 1.0,
                            sy=-1.0 if b == 2 else 1.0, nx=nx, nyy=nyy)


def _advect2d_out(q, du, dv, geom, *, n):
    """9-tap stencil semi-Lagrangian interior values on a full
    (nx, nyy) array — the in-kernel form of stam.advect2d_stencil
    (stam.py:317-363, _SHIFTS[2] tap order; bit-compatible, tested).
    ``du``/``dv`` are the raw backtrace displacements (-dt0 * vel);
    values outside the interior are ignored."""
    ii, jj, _, _ = geom
    iif, jjf = ii.astype(jnp.float32), jj.astype(jnp.float32)
    offx = jnp.clip(jnp.clip(du, -1.0, 1.0), 0.5 - iif, n + 0.5 - iif)
    offy = jnp.clip(jnp.clip(dv, -1.0, 1.0), 0.5 - jjf, n + 0.5 - jjf)
    out = jnp.zeros_like(q)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            wgt = jnp.maximum(0.0, 1.0 - jnp.abs(offx - dx))
            wgt = wgt * jnp.maximum(0.0, 1.0 - jnp.abs(offy - dy))
            out = out + wgt * _shift(_shift(q, dx, 0), dy, 1)
    return out


def _step2d_whole_kernel(u_hbm, v_hbm, d_hbm, t_hbm, uo, vo_, do_, to,
                         vu, vv, vd, vt, vp, vdiv, sems, *, nx, nyy, n,
                         dt, h, iters, eps, b_alpha, b_beta, t_amb,
                         visc_ac, diff_ac, temp_ac, dt0):
    """One ENTIRE 2D smoke step in a single kernel call (the 2D analog
    of _step_whole_kernel): forcing -> diffuse(u,v) -> project ->
    advect(u,v) -> project -> diffuse/advect(dens,temp), all fields
    VMEM-resident.  Composed from the same _solve2d_sweeps /
    _set_bnd2d_stage helpers as lin_solve2d_pallas; every stage is
    op-order exact vs its dense twin in stam.step2d with
    advect_mode="stencil" (the end-to-end step agrees to 1 ulp — XLA
    FMA-contracts the structurally different graphs differently on
    isolated elements; tested).  The multi-call 2D step at 128^2
    is dominated by per-op dispatch of hundreds of tiny kernels — this
    replaces them with one call."""
    cps = []
    for i, (src, dstv) in enumerate(((u_hbm, vu), (v_hbm, vv),
                                     (d_hbm, vd), (t_hbm, vt))):
        cp = pltpu.make_async_copy(src, dstv, sems.at[i])
        cp.start()
        cps.append(cp)
    for cp in cps:
        cp.wait()
    geom = _geom2d(nx, nyy)
    _, _, _, interior = geom

    def bnd(xx, b):
        return _bnd2d(xx, b, geom, nx=nx, nyy=nyy)

    # buoyancy2d (stam.py:697-702)
    if b_alpha or b_beta:
        f = -b_alpha * vd[...] + b_beta * (vt[...] - t_amb)
        vv[...] = bnd(jnp.where(interior, vv[...] + dt * f, vv[...]), 2)

    # vorticity_confinement2d (stam.py:641-655)
    if eps:
        u, v = vu[...], vv[...]
        curl = 0.5 * ((_shift(v, 1, 0) - _shift(v, -1, 0))
                      - (_shift(u, 1, 1) - _shift(u, -1, 1))) / h
        mag = jnp.where(interior, jnp.abs(curl), 0.0)
        gx = 0.5 * (_shift(mag, 1, 0) - _shift(mag, -1, 0)) / h
        gy = 0.5 * (_shift(mag, 1, 1) - _shift(mag, -1, 1)) / h
        norm = jnp.sqrt(gx * gx + gy * gy) + 1e-5
        gx, gy = gx / norm, gy / norm
        fu = eps * h * gy * curl
        fv = -eps * h * gx * curl
        vu[...] = bnd(jnp.where(interior, u + dt * fu, u), 1)
        vv[...] = bnd(jnp.where(interior, v + dt * fv, v), 2)

    def diffuse(ref, b, ac):
        a, c = ac
        _solve2d_sweeps(ref, ref[...], geom, a=a, c_inv=1.0 / c,
                        sx=-1.0 if b == 1 else 1.0,
                        sy=-1.0 if b == 2 else 1.0,
                        nx=nx, nyy=nyy, iters=iters)

    if visc_ac is not None:
        diffuse(vu, 1, visc_ac)
        diffuse(vv, 2, visc_ac)

    def project():
        # project2d (stam.py:422-437): div, zero-guess Jacobi solve,
        # gradient subtraction, wall fixes
        u, v = vu[...], vv[...]
        dv = (-0.5 * h) * (((_shift(u, 1, 0) - _shift(u, -1, 0))
                            + _shift(v, 1, 1)) - _shift(v, -1, 1))
        vdiv[...] = bnd(jnp.where(interior, dv, 0.0), 0)
        vp[...] = jnp.zeros((nx, nyy), jnp.float32)
        _solve2d_sweeps(vp, vdiv[...], geom, a=1.0, c_inv=1.0 / 4.0,
                        sx=1.0, sy=1.0, nx=nx, nyy=nyy, iters=iters)
        p = vp[...]
        un = u + -0.5 * (_shift(p, 1, 0) - _shift(p, -1, 0)) / h
        vn = v + -0.5 * (_shift(p, 1, 1) - _shift(p, -1, 1)) / h
        vu[...] = bnd(jnp.where(interior, un, u), 1)
        vv[...] = bnd(jnp.where(interior, vn, v), 2)

    project()
    u0, v0 = vu[...], vv[...]
    du, dv_ = -dt0 * u0, -dt0 * v0
    vu[...] = bnd(jnp.where(interior,
                            _advect2d_out(u0, du, dv_, geom, n=n), u0), 1)
    vv[...] = bnd(jnp.where(interior,
                            _advect2d_out(v0, du, dv_, geom, n=n), v0), 2)
    project()

    u, v = vu[...], vv[...]
    du, dv_ = -dt0 * u, -dt0 * v
    if diff_ac is not None:
        diffuse(vd, 0, diff_ac)
    d0 = vd[...]
    vd[...] = bnd(jnp.where(interior,
                            _advect2d_out(d0, du, dv_, geom, n=n), d0), 0)
    if temp_ac is not None:
        diffuse(vt, 0, temp_ac)
    t0 = vt[...]
    vt[...] = bnd(jnp.where(interior,
                            _advect2d_out(t0, du, dv_, geom, n=n), t0), 0)

    wcps = []
    for i, (ref, out) in enumerate(((vu, uo), (vv, vo_), (vd, do_),
                                    (vt, to))):
        cp = pltpu.make_async_copy(ref, out, sems.at[i])
        cp.start()
        wcps.append(cp)
    for cp in wcps:
        cp.wait()


def step2d_whole_ok(shape):
    """True when the fused 2D whole-step kernel fits ``shape`` (6
    resident buffers + the advect stage's ~9 tap temporaries)."""
    nx, nyy = shape
    return nx * nyy * 4 * 20 <= 96 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=(
    "iters", "dt", "h", "n", "eps", "b_alpha", "b_beta", "t_amb",
    "visc_ac", "diff_ac", "temp_ac", "dt0"))
def step2d_whole_pallas(u, v, dens, temp, *, iters, dt, h, n, eps,
                        b_alpha, b_beta, t_amb, visc_ac, diff_ac,
                        temp_ac, dt0):
    """Fused whole 2D step (see _step2d_whole_kernel).  Dispatched by
    stam.step2d for the pallas/stencil/jacobi config (any size that
    passes step2d_whole_ok — 2D grids are trivially VMEM-resident)."""
    nx, nyy = u.shape
    kern = functools.partial(
        _step2d_whole_kernel, nx=nx, nyy=nyy, n=n, dt=dt, h=h,
        iters=iters, eps=eps, b_alpha=b_alpha, b_beta=b_beta,
        t_amb=t_amb, visc_ac=visc_ac, diff_ac=diff_ac, temp_ac=temp_ac,
        dt0=dt0)
    shape = (nx, nyy)
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=tuple([pl.BlockSpec(memory_space=pl.ANY)] * 4),
        out_shape=tuple(jax.ShapeDtypeStruct(shape, jnp.float32)
                        for _ in range(4)),
        scratch_shapes=[pltpu.VMEM(shape, jnp.float32)
                        for _ in range(6)]
                       + [pltpu.SemaphoreType.DMA((4,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(u, v, dens, temp)


def rb_packed_plan(shape, iters):
    """Pick (tx, fuse, pipeline) for lin_solve3d_rb_packed on ``shape``.

    Prefers the deepest fuse dividing ``iters`` whose double-buffered
    windows keep a useful tile size under the VMEM budget (measured
    best at 256^3: tx=32, fuse=4, pipelined), degrading to shallower
    fuse and finally to the unpipelined single-buffer layout for grids
    with very large y*z planes (e.g. 512^3)."""
    n_full, y_true, z_true = shape
    yp, zp = zg_extents(y_true, z_true)
    yhp = -(-(yp // 2) // 8) * 8
    # whole-solve mode: all four packed buffers resident in VMEM for
    # the entire iteration loop (single kernel call, single HBM
    # read+write, zero halo recompute) — encoded as tx=n_full,
    # fuse=iters, a combination the windowed path rejects.  The 6 MB
    # per-buffer gate (~<=130^3) leaves the 100 MB VMEM limit ample
    # headroom for sweep temporaries.
    if n_full * yhp * zp * 4 <= 6 * 1024 * 1024:
        return n_full, iters, False
    for fuse in (4, 2, 1):
        if iters % fuse:
            continue
        halo = 2 * fuse
        tx = _fit_tx(24, 4, halo, n_full, yhp, zp,
                     budget=70 * 1024 * 1024)
        if tx >= 8:
            return tx, fuse, True
        if fuse == 4:
            # large-plane fallback (512^3): single-slot windows fit
            # ~2x the planes, so the deep fuse survives without the
            # double buffer — measured 83.2 ms vs 99.2 for the thin
            # pipelined fuse=2 window and 104.8 for serial fuse=2
            # (verify/bench_rb512_plans.py, 20-iter solve at 512^3).
            # tx capped at 16: the sweep body's scoped temporaries add
            # ~1/3 of a window on top, and tx=24 (p=40 planes) blew
            # the 100M hard vmem limit by 15M at 512^3
            txs = _fit_tx(16, 4, halo, n_full, yhp, zp, slots=1,
                          budget=70 * 1024 * 1024)
            if txs >= 12:
                return txs, 4, False
    for fuse in (2, 1):
        if iters % fuse:
            continue
        halo = 2 * fuse
        tx = _fit_tx(24, 4, halo, n_full, yhp, zp, slots=1,
                     budget=70 * 1024 * 1024)
        if tx >= 1:
            return tx, fuse, False
    raise AssertionError("unreachable: fuse=1 always divides iters "
                         "and _fit_tx floors at tx=1")


def _solve_rb_packed_pipe_kernel(xA_hbm, xB_hbm, a0_hbm, b0_hbm, oA_hbm,
                                 oB_hbm, vbuf, in_sems, out_sems, *,
                                 a, c_inv, sx, sy, sz, n_full, y_hi,
                                 z_hi, tx, halo, n_sweeps):
    """Double-buffered variant of _solve_rb_packed_kernel: program t
    prefetches tile t+1's windows while sweeping tile t (see
    _stream_tiles)."""
    p = tx + 2 * halo

    def compute(refs, wlo):
        vA, vB, vA0, vB0 = refs
        _rb_sweeps(vA, vB, vA0, vB0, wlo, a=a, c_inv=c_inv, sx=sx,
                   sy=sy, sz=sz, n_full=n_full, y_hi=y_hi, z_hi=z_hi,
                   p=p, n_sweeps=n_sweeps)

    _stream_tiles((xA_hbm, xB_hbm, a0_hbm, b0_hbm),
                  ((0, oA_hbm), (1, oB_hbm)), vbuf, in_sems, out_sems,
                  n_full=n_full, tx=tx, halo=halo, compute=compute)


def _solve_rb_packed_yt_kernel(xA_hbm, xB_hbm, a0_hbm, b0_hbm, oA_hbm,
                               oB_hbm, vbuf, in_sems, out_sems, *,
                               a, c_inv, sx, sy, sz, n_full, y_hi, z_hi,
                               tx, ty, halo, hy, n_sweeps, pipeline):
    """(x, packed-y)-tiled packed solver: windows of
    (tx + 2*halo) planes x (ty + 2*hy) sublane rows streamed by
    _stream_tiles2d, sweeping with the dynamic-row y-face fix.  For
    grids whose full-y window collapses tx under the VMEM budget
    (512^3+)."""
    p = tx + 2 * halo
    py = ty + 2 * hy
    ny = xA_hbm.shape[1]

    def compute(refs, wlo, wylo):
        vA, vB, vA0, vB0 = refs
        _rb_sweeps_yt(vA, vB, vA0, vB0, wlo, wylo, a=a, c_inv=c_inv,
                      sx=sx, sy=sy, sz=sz, n_full=n_full, y_hi=y_hi,
                      z_hi=z_hi, p=p, py=py, n_sweeps=n_sweeps)

    _stream_tiles2d((xA_hbm, xB_hbm, a0_hbm, b0_hbm),
                    ((0, oA_hbm), (1, oB_hbm)), vbuf, in_sems, out_sems,
                    n_full=n_full, tx=tx, halo=halo, ny=ny, ty=ty, hy=hy,
                    compute=compute, pipeline=pipeline)


@functools.partial(jax.jit, static_argnames=("b", "a", "c", "iters",
                                              "tx", "fuse", "pipeline",
                                              "x_zero", "true_extents",
                                              "ty"))
def lin_solve3d_rb_packed(b: int, x, x0, a: float, c: float, iters: int,
                          tx: int = 24, fuse: int = 2,
                          pipeline: bool = True, x_zero: bool = False,
                          true_extents=None, ty=None):
    """Red-black solver on the packed checkerboard layout — each
    half-sweep computes only its active cells (~1.9x less VPU work than
    the masked formulation).  Bit-compatible with
    stam.lin_solve3d(red_black=True).

    ``x_zero=True`` asserts the initial guess is all zeros (the
    pressure projection's) and skips packing it — two full-field
    select passes.  ``true_extents``: z-ghostless in/out (_pad_setup).
    ``ty``: packed-y tile rows — tiles the window along y too
    (_stream_tiles2d), for grids whose y*z plane collapses the full-y
    x tile under the VMEM budget (512^3+); None keeps full-y windows."""
    standalone = true_extents is None
    if standalone:
        n_full, y_true, z_true = x.shape
        yp, zp = zg_extents(y_true, z_true)
        if not x_zero:
            x = zg_pad(x, yp, zp)
        x0 = zg_pad(x0, yp, zp)
    else:
        n_full = x0.shape[0]
        y_true, z_true = true_extents
        yp, zp = x0.shape[1], x0.shape[2]
    sx, sy, sz = _bnd_scales(b)

    # pack: A/B rows interleave along y with plane/lane-dependent
    # offset (lane kz holds true z = kz + 1)
    ii = jnp.arange(n_full, dtype=jnp.int32)[:, None, None]
    kz = jnp.arange(zp, dtype=jnp.int32)[None, None, :]
    r0 = ((ii + kz) % 2) == 0
    yh = yp // 2
    yhp = -(-yh // 8) * 8
    def even_odd(q):
        # lax.slice with stride (basic numpy stride indexing lowers to
        # a GATHER + transpose pair on TPU; strided slice is one pass)
        e = jax.lax.slice(q, (0, 0, 0), (n_full, yp - 1, zp), (1, 2, 1))
        o = jax.lax.slice(q, (0, 1, 0), (n_full, yp, zp), (1, 2, 1))
        return e, o

    if x_zero:
        A = B = jnp.zeros((n_full, yh, zp), jnp.float32)
    else:
        xe, xo = even_odd(x)
        A = jnp.where(r0, xe, xo)
        B = jnp.where(r0, xo, xe)
    x0e, x0o = even_odd(x0)
    A0 = jnp.where(r0, x0e, x0o)
    B0 = jnp.where(r0, x0o, x0e)
    # re-pad packed sublanes to a multiple of 8
    if yhp != yh:
        padr = ((0, 0), (0, yhp - yh), (0, 0))
        A, B, A0, B0 = (jnp.pad(q, padr) for q in (A, B, A0, B0))

    y_hi = y_true - 1
    if tx >= n_full and fuse >= iters:
        # whole-solve mode (rb_packed_plan emits tx=n_full, fuse=iters
        # when the four packed buffers fit VMEM): one kernel call runs
        # every iteration with the arrays resident
        if ty is not None:
            raise ValueError("whole-solve mode has no y tiling")
        kern = functools.partial(
            _solve_rb_packed_whole_kernel, a=a, c_inv=1.0 / c, sx=sx,
            sy=sy, sz=sz, n_full=n_full, y_hi=y_hi, z_hi=z_true - 3,
            iters=iters)
        call = pl.pallas_call(
            kern,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
            out_specs=tuple([pl.BlockSpec(memory_space=pl.ANY)] * 2),
            out_shape=tuple(jax.ShapeDtypeStruct(A.shape, jnp.float32)
                            for _ in range(2)),
            scratch_shapes=[pltpu.VMEM(A.shape, jnp.float32)
                            for _ in range(4)]
                           + [pltpu.SemaphoreType.DMA((4,))],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        A, B = call(A, B, A0, B0)
        return _rb_unpack(A, B, r0, yh, yhp, n_full, yp, zp, b,
                          standalone, y_true, z_true)

    fuse = max(1, min(fuse, iters))
    if iters % fuse:
        raise ValueError(f"iters={iters} must be a multiple of fuse")
    passes = iters // fuse
    n_sweeps = 2 * fuse
    halo = n_sweeps
    p = tx + 2 * halo
    if p > n_full:
        raise ValueError(f"window {p} exceeds array extent {n_full}")
    if ty is not None:
        ny = A.shape[1]
        if ty % 8:
            raise ValueError(f"ty={ty} must be a multiple of 8 (HBM "
                             "sublane window slices must be 8-aligned)")
        # the sweeps need n_sweeps halo rows; round up to the sublane
        # tiling so every window offset stays 8-aligned (Mosaic
        # requirement, see _stream_tiles2d._mult8)
        hy = -(-n_sweeps // 8) * 8
        py = ty + 2 * hy
        # the LAST window starts at ny - py; the hi-face fix needs the
        # face row h reachable there (even parity also needs its source
        # row h-1 inside the window)
        if y_hi % 2 == 0:
            h_face, h_min = y_hi // 2, 1
        else:
            h_face, h_min = (y_hi - 1) // 2, 0
        if py > ny or ny - py > h_face - h_min:
            raise ValueError(
                f"y tile window {py} incompatible with {ny} packed rows "
                f"(face row {h_face})")
        kern = functools.partial(
            _solve_rb_packed_yt_kernel, a=a, c_inv=1.0 / c, sx=sx, sy=sy,
            sz=sz, n_full=n_full, y_hi=y_hi, z_hi=z_true - 3, tx=tx,
            ty=ty, halo=halo, hy=hy, n_sweeps=n_sweeps,
            pipeline=pipeline)
        grid = (pl.cdiv(n_full, tx), pl.cdiv(ny, ty))
        scratch = _stream_scratch(4, 2, p, py, A.shape[2],
                                  slots=2 if pipeline else 1)
    else:
        kw = dict(a=a, c_inv=1.0 / c, sx=sx, sy=sy, sz=sz, n_full=n_full,
                  y_hi=y_hi, z_hi=z_true - 3, tx=tx, halo=halo,
                  n_sweeps=n_sweeps)
        grid = (pl.cdiv(n_full, tx),)
        if pipeline:
            kern = functools.partial(_solve_rb_packed_pipe_kernel, **kw)
            scratch = _stream_scratch(4, 2, p, A.shape[1], A.shape[2])
        else:
            kern = functools.partial(_solve_rb_packed_kernel, **kw)
            scratch = [pltpu.VMEM((p, A.shape[1], A.shape[2]),
                                  jnp.float32)
                       for _ in range(4)] + [pltpu.SemaphoreType.DMA((4,))]
    call = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=tuple([pl.BlockSpec(memory_space=pl.ANY)] * 2),
        out_shape=tuple(jax.ShapeDtypeStruct(A.shape, jnp.float32)
                        for _ in range(2)),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def body(_, ab):
        return call(ab[0], ab[1], A0, B0)

    A, B = jax.lax.fori_loop(0, passes, body, (A, B))
    return _rb_unpack(A, B, r0, yh, yhp, n_full, yp, zp, b, standalone,
                      y_true, z_true)


def _rb_unpack(A, B, r0, yh, yhp, n_full, yp, zp, b, standalone,
               y_true, z_true):
    # unpack: interleave even/odd rows via stack+reshape (the strided
    # .at[::2].set scatter lowers to gather+transpose passes on TPU)
    if yhp != yh:
        A, B = A[:, :yh, :], B[:, :yh, :]
    out = jnp.stack([jnp.where(r0, A, B), jnp.where(r0, B, A)],
                    axis=2).reshape(n_full, yp, zp)
    if standalone:
        return zg_restore(out, b, y_true, z_true)
    return out


@functools.partial(jax.jit, static_argnames=(
    "b", "a", "c", "iters", "red_black", "tx", "fuse", "dtype"))
def lin_solve3d_pallas(b: int, x, x0, a: float, c: float, iters: int,
                       red_black: bool = False, tx: int = 8,
                       fuse: int = 2, dtype=jnp.float32):
    """Drop-in fused replacement for stam.lin_solve3d (3D only).

    ``fuse`` = jacobi sweeps per HBM pass (red-black always fuses the
    two parity half-sweeps of one iteration per pass).  ``dtype`` =
    sweep arithmetic precision: jnp.bfloat16 halves HBM traffic and
    doubles VPU throughput on the VPU-bound sweeps at the cost of ~3
    decimal digits in the solved field (opt-in via
    StamConfig.solver_dtype; output is cast back to float32).
    """
    n_full, y_true, z_true = x.shape
    in_dtype = x.dtype
    # z-ghostless layout: y (ghosted) padded to a sublane multiple
    # (16 for bf16), z interior to a lane multiple of 128 (masks use
    # true extents; padding cells are don't-care, walled off by the
    # interior mask and the z-edge tap selects)
    ymul = 16 if dtype == jnp.bfloat16 else 8
    yp, zp = zg_extents(y_true, z_true, ymul)
    x = zg_pad(x, yp, zp).astype(dtype)
    x0 = zg_pad(x0, yp, zp).astype(dtype)
    sx, sy, sz = _bnd_scales(b)
    if tx >= n_full and fuse >= iters:
        # whole-solve mode (see jacobi_whole_ok): the full loop in one
        # kernel call with both buffers resident in VMEM
        kern = functools.partial(
            _solve_whole_kernel, a=a, c_inv=1.0 / c, sx=sx, sy=sy,
            sz=sz, n_full=n_full, y_hi=y_true - 1, z_hi=z_true - 3,
            iters=iters, red_black=red_black)
        out = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            scratch_shapes=[pltpu.VMEM(x.shape, x.dtype),
                            pltpu.VMEM(x.shape, x.dtype),
                            pltpu.SemaphoreType.DMA,
                            pltpu.SemaphoreType.DMA],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x, x0).astype(in_dtype)
        return zg_restore(out, b, y_true, z_true)
    if red_black:
        fuse = max(1, min(fuse, iters))
        if iters % fuse:
            raise ValueError(f"iters={iters} must be a multiple of fuse")
        passes, parities = iters // fuse, (0, 1) * fuse
    else:
        fuse = max(1, min(fuse, iters))
        if iters % fuse:
            raise ValueError(f"iters={iters} must be a multiple of fuse")
        passes, parities = iters // fuse, (None,) * fuse
    halo = len(parities)
    p = tx + 2 * halo
    if p > n_full:
        raise ValueError(f"window {p} exceeds array extent {n_full}")
    grid = (pl.cdiv(n_full, tx),)

    kern = functools.partial(
        _solve_kernel, a=a, c_inv=1.0 / c, sx=sx, sy=sy, sz=sz,
        n_full=n_full, y_hi=y_true - 1, z_hi=z_true - 3, tx=tx,
        halo=halo, parities=parities)
    call = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((p,) + x.shape[1:], x.dtype),
            pltpu.VMEM((p,) + x.shape[1:], x.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def body(_, xc):
        return call(xc, x0)

    out = jax.lax.fori_loop(0, passes, body, x).astype(in_dtype)
    return zg_restore(out, b, y_true, z_true)


# ---------------------------------------------------------------------------
# sharded packed red-black solver: per-device x-slabs with a DEEP halo.
#
# The same wavefront property that lets the dense kernel fuse ``fuse``
# iterations per HBM pass (window halo = 2*fuse planes covers the light
# cone) works ACROSS devices: pad each slab with 2*fuse neighbor planes
# per side, run 2*fuse half-sweeps locally, keep the interior — the
# result is bit-identical to the dense solver, with ONE halo exchange
# per ``fuse`` iterations instead of one per sweep (the reference
# exchanges host-staged buffers every step, solver-unidyn.cu:396-470;
# the XLA sharded fallback ppermutes every half-sweep).
#
# Domain x-faces no longer sit at the array edge: for the first/last
# device the set_bnd ghost lives at absolute padded row halo-1 /
# n_full-halo (outer rows are junk filler walled off by the per-sweep
# ghost refresh), so the x-face fix targets those rows dynamically,
# gated on scalar-prefetch flags (axis_index of the shard).


def _rb_sweeps_shard(vA, vB, vA0, vB0, wlo, face_lo, face_hi, *, a,
                     c_inv, sx, sy, sz, n_full, y_hi, z_hi, p, halo,
                     n_sweeps, poff):
    r0w = _rb_r_mask(vA.shape, wlo + poff)
    zedges = _lane_edges(vA.shape, z_hi)
    # ghost rows (absolute halo-1 / n_full-halo) in window coordinates;
    # clamped — the ``apply`` gates keep out-of-window rows untouched
    rel_lo = jnp.clip(halo - 1 - wlo, 0, p - 2)
    rel_hi = jnp.clip(n_full - halo - wlo, 1, p - 1)
    apply_lo = face_lo & (wlo <= halo - 1)
    apply_hi = face_hi & (wlo >= n_full - halo - p + 1)
    a0v = vA0[...]
    b0v = vB0[...]
    for sw in range(n_sweeps):
        if sw % 2 == 0:
            _rb_half_sweep(vA, vB, a0v, r0w, zedges, a=a, c_inv=c_inv,
                           sz=sz)
        else:
            _rb_half_sweep(vB, vA, b0v, ~r0w, zedges, a=a, c_inv=c_inv,
                           sz=sz)
        _rb_ghost_fix_x_dyn(vA, vB, rel_lo, apply_lo, sx, +1)
        _rb_ghost_fix_x_dyn(vA, vB, rel_hi, apply_hi, sx, -1)
        _rb_face_fix_y(vA, vB, r0w, sy=sy, y_hi=y_hi)


def _solve_rb_shard_kernel(face_ref, xA_hbm, xB_hbm, a0_hbm, b0_hbm,
                           oA_hbm, oB_hbm, vA, vB, vA0, vB0, sems, *,
                           a, c_inv, sx, sy, sz, n_full, y_hi, z_hi,
                           tx, halo, n_sweeps, poff):
    t = pl.program_id(0)
    p = tx + 2 * halo
    lo = jnp.minimum(t * tx, n_full - tx)
    wlo = jnp.clip(lo - halo, 0, n_full - p)
    face_lo = face_ref[0] != 0
    face_hi = face_ref[1] != 0

    cps = []
    for i, (src, dstv) in enumerate(((xA_hbm, vA), (xB_hbm, vB),
                                     (a0_hbm, vA0), (b0_hbm, vB0))):
        cp = pltpu.make_async_copy(src.at[pl.ds(wlo, p)], dstv,
                                   sems.at[i])
        cp.start()
        cps.append(cp)
    for cp in cps:
        cp.wait()

    _rb_sweeps_shard(vA, vB, vA0, vB0, wlo, face_lo, face_hi, a=a,
                     c_inv=c_inv, sx=sx, sy=sy, sz=sz, n_full=n_full,
                     y_hi=y_hi, z_hi=z_hi, p=p, halo=halo,
                     n_sweeps=n_sweeps, poff=poff)

    wcps = []
    for i, (ref, out) in enumerate(((vA, oA_hbm), (vB, oB_hbm))):
        cp = pltpu.make_async_copy(ref.at[pl.ds(lo - wlo, tx)],
                                   out.at[pl.ds(lo, tx)], sems.at[i])
        cp.start()
        wcps.append(cp)
    for cp in wcps:
        cp.wait()


def _solve_rb_shard_pipe_kernel(face_ref, xA_hbm, xB_hbm, a0_hbm,
                                b0_hbm, oA_hbm, oB_hbm, vbuf, in_sems,
                                out_sems, *, a, c_inv, sx, sy, sz,
                                n_full, y_hi, z_hi, tx, halo, n_sweeps,
                                poff):
    p = tx + 2 * halo
    face_lo = face_ref[0] != 0
    face_hi = face_ref[1] != 0

    def compute(refs, wlo):
        vA, vB, vA0, vB0 = refs
        _rb_sweeps_shard(vA, vB, vA0, vB0, wlo, face_lo, face_hi, a=a,
                         c_inv=c_inv, sx=sx, sy=sy, sz=sz,
                         n_full=n_full, y_hi=y_hi, z_hi=z_hi, p=p,
                         halo=halo, n_sweeps=n_sweeps, poff=poff)

    _stream_tiles((xA_hbm, xB_hbm, a0_hbm, b0_hbm),
                  ((0, oA_hbm), (1, oB_hbm)), vbuf, in_sems, out_sems,
                  n_full=n_full, tx=tx, halo=halo, compute=compute)


def rb_shard_plan(c_local, y_true, z_true, iters):
    """(tx, fuse, pipeline) for the sharded packed solver on a slab of
    ``c_local`` x rows (mirror of rb_packed_plan; the padded extent is
    c_local + 4*fuse)."""
    yp, zp = zg_extents(y_true, z_true)
    yhp = -(-(yp // 2) // 8) * 8
    for fuse in (4, 2, 1):
        if iters % fuse:
            continue
        halo = 2 * fuse
        # the deep-halo pad sources halo rows from the neighbor's
        # interior (lin_solve3d_rb_shard pad_pair) — a slab can only
        # donate c_local rows, so halo must fit in one slab
        if halo > c_local:
            continue
        if c_local + 2 * halo < 8 + 2 * halo:
            continue
        tx = _fit_tx(24, 4, halo, c_local + 2 * halo, yhp, zp,
                     budget=70 * 1024 * 1024)
        if tx >= 8:
            return tx, fuse, True
    for fuse in (2, 1):
        if iters % fuse or 2 * fuse > c_local:
            continue
        halo = 2 * fuse
        tx = _fit_tx(24, 4, halo, c_local + 2 * halo, yhp, zp, slots=1,
                     budget=70 * 1024 * 1024)
        if tx >= 1:
            return tx, fuse, False
    raise ValueError(
        f"rb_shard_plan: slab of {c_local} x rows cannot host the "
        "minimal halo=2 (needs c_local >= 2 even rows); use the XLA "
        "sharded backend for this mesh/size")


def lin_solve3d_rb_shard(bb: int, x, x0, a: float, c: float, iters: int,
                         *, axis_name, n_dev: int, y_true: int,
                         z_true: int, tx: int, fuse: int,
                         pipeline: bool, x_zero: bool = False):
    """Sharded red-black solve on z-ghostless x-slabs — call INSIDE
    shard_map.  ``x``/``x0``: (c_local, yp, zp) slabs whose rows are
    ALL globally interior (no x ghosts stored; ghosts materialize in
    the deep halo pad each pass).  Bit-compatible with the dense
    lin_solve3d_rb_packed / stam.lin_solve3d(red_black=True).

    c_local must be even (the packed checkerboard parity is then
    uniform across shards: global row of slab row 0 is odd)."""
    c_local = x0.shape[0]
    yp, zp = x0.shape[1], x0.shape[2]
    if c_local % 2:
        raise ValueError(f"c_local={c_local} must be even")
    sx, sy, sz = _bnd_scales(bb)
    idx = jax.lax.axis_index(axis_name) if n_dev > 1 else 0
    face_arr = jnp.array(
        [1, 1], jnp.int32) if n_dev == 1 else jnp.stack(
        [(idx == 0).astype(jnp.int32),
         (idx == n_dev - 1).astype(jnp.int32)])

    # pack to phase arrays with GLOBAL parity: slab row 0 is global
    # dense row idx*c+1, odd for even c -> static offset 1
    poff = 1
    ii = jnp.arange(c_local, dtype=jnp.int32)[:, None, None] + poff
    kz = jnp.arange(zp, dtype=jnp.int32)[None, None, :]
    r0 = ((ii + kz) % 2) == 0
    yh = yp // 2
    yhp = -(-yh // 8) * 8

    def even_odd(q):
        e = jax.lax.slice(q, (0, 0, 0), (c_local, yp - 1, zp), (1, 2, 1))
        o = jax.lax.slice(q, (0, 1, 0), (c_local, yp, zp), (1, 2, 1))
        return e, o

    if x_zero:
        A = B = jnp.zeros((c_local, yh, zp), jnp.float32)
    else:
        xe, xo = even_odd(x)
        A = jnp.where(r0, xe, xo)
        B = jnp.where(r0, xo, xe)
    x0e, x0o = even_odd(x0)
    A0 = jnp.where(r0, x0e, x0o)
    B0 = jnp.where(r0, x0o, x0e)
    if yhp != yh:
        padr = ((0, 0), (0, yhp - yh), (0, 0))
        A, B, A0, B0 = (jnp.pad(q, padr) for q in (A, B, A0, B0))

    fuse = max(1, min(fuse, iters))
    if iters % fuse:
        raise ValueError(f"iters={iters} must be a multiple of fuse")
    passes = iters // fuse
    n_sweeps = 2 * fuse
    halo = n_sweeps
    n_full = c_local + 2 * halo
    p = tx + 2 * halo
    if p > n_full:
        raise ValueError(f"window {p} exceeds padded extent {n_full}")

    def pad_pair(qA, qB):
        """Deep-halo pad: neighbor planes over ICI; at domain edges the
        set_bnd ghost row (pad row halo-1 low / 0 high) seeds from the
        adjacent interior (phase flip), other pad rows are junk that
        the kernel's per-sweep ghost refresh walls off."""
        if n_dev > 1:
            right = [(i, (i + 1) % n_dev) for i in range(n_dev)]
            left = [(i, (i - 1) % n_dev) for i in range(n_dev)]
            lA = jax.lax.ppermute(qA[-halo:], axis_name, right)
            lB = jax.lax.ppermute(qB[-halo:], axis_name, right)
            hA = jax.lax.ppermute(qA[:halo], axis_name, left)
            hB = jax.lax.ppermute(qB[:halo], axis_name, left)
        else:
            lA = jnp.zeros_like(qA[-halo:])
            lB = jnp.zeros_like(qB[-halo:])
            hA = jnp.zeros_like(qA[:halo])
            hB = jnp.zeros_like(qB[:halo])
        gl = (jnp.arange(halo) == halo - 1)[:, None, None]
        seed_loA = jnp.where(gl, sx * qB[0:1], 0.0)
        seed_loB = jnp.where(gl, sx * qA[0:1], 0.0)
        gh = (jnp.arange(halo) == 0)[:, None, None]
        seed_hiA = jnp.where(gh, sx * qB[-1:], 0.0)
        seed_hiB = jnp.where(gh, sx * qA[-1:], 0.0)
        edge_lo = face_arr[0] != 0
        edge_hi = face_arr[1] != 0
        lA = jnp.where(edge_lo, seed_loA, lA)
        lB = jnp.where(edge_lo, seed_loB, lB)
        hA = jnp.where(edge_hi, seed_hiA, hA)
        hB = jnp.where(edge_hi, seed_hiB, hB)
        return (jnp.concatenate([lA, qA, hA], axis=0),
                jnp.concatenate([lB, qB, hB], axis=0))

    kw = dict(a=a, c_inv=1.0 / c, sx=sx, sy=sy, sz=sz, n_full=n_full,
              y_hi=y_true - 1, z_hi=z_true - 3, tx=tx, halo=halo,
              n_sweeps=n_sweeps, poff=poff)
    if pipeline:
        kern = functools.partial(_solve_rb_shard_pipe_kernel, **kw)
        scratch = _stream_scratch(4, 2, p, A.shape[1], A.shape[2])
    else:
        kern = functools.partial(_solve_rb_shard_kernel, **kw)
        scratch = [pltpu.VMEM((p, A.shape[1], A.shape[2]), jnp.float32)
                   for _ in range(4)] + [pltpu.SemaphoreType.DMA((4,))]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(pl.cdiv(n_full, tx),),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=tuple([pl.BlockSpec(memory_space=pl.ANY)] * 2),
        scratch_shapes=scratch,
    )
    call = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=tuple(jax.ShapeDtypeStruct(
            (n_full,) + A.shape[1:], jnp.float32) for _ in range(2)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    # x0 is pass-invariant: one exchange total (the swept ghost rows'
    # x0 values never matter — the ghost refresh overwrites them)
    A0p, B0p = pad_pair(A0, B0)
    for _ in range(passes):
        Ap, Bp = pad_pair(A, B)
        Ao, Bo = call(face_arr, Ap, Bp, A0p, B0p)
        A, B = Ao[halo:halo + c_local], Bo[halo:halo + c_local]

    if yhp != yh:
        A, B = A[:, :yh, :], B[:, :yh, :]
    out = jnp.stack([jnp.where(r0, A, B), jnp.where(r0, B, A)],
                    axis=2).reshape(c_local, yp, zp)
    return out

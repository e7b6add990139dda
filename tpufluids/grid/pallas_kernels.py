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
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _inner_neighbor(v, axis):
    """out[i] = v[i-1] for i > 0, v[1] at i = 0, along ``axis`` — for
    the set_bnd reflection the face at 0 needs v[1] and the face at
    L_true-1 needs v[L_true-2]; a +1/-1 shift pair selected by a mask
    covers both without needing the true extent."""
    lo = _shift(v, 1, axis)    # out[i] = v[i+1]
    hi = _shift(v, -1, axis)   # out[i] = v[i-1]
    return lo, hi


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


def _sweep(v, v0, gi, jj, kk, *, a, c_inv, sx, sy, sz, n_full, y_hi,
           z_hi, parity):
    """One jacobi sweep + set_bnd on a VMEM window.  ``gi`` is the
    global x-plane index of each window plane; jj/kk are y/z iotas.
    ``y_hi``/``z_hi`` are the TRUE last indices (the buffer may carry
    tiling padding beyond them, which stays untouched)."""
    taps = (_shift(v, -1, 0) + _shift(v, 1, 0)
            + _shift(v, -1, 1) + _shift(v, 1, 1)
            + _shift(v, -1, 2) + _shift(v, 1, 2))
    new = (v0 + a * taps) * c_inv
    interior = ((gi >= 1) & (gi <= n_full - 2) & (jj >= 1) & (jj <= y_hi - 1)
                & (kk >= 1) & (kk <= z_hi - 1))
    if parity is not None:
        # dense _checker parity is on 0-based interior indices:
        # ((gi-1)+(jj-1)+(kk-1)) % 2
        interior = interior & (((gi + jj + kk + 1) % 2) == parity)
    out = jnp.where(interior, new, v)
    # set_bnd, in the dense order: x faces, then y, then z.  Each face
    # cell copies its interior neighbor (the +1 shift at the low face,
    # the -1 shift at the high face).
    for axis, cc, scale, hi_idx in ((0, gi, sx, n_full - 1),
                                    (1, jj, sy, y_hi),
                                    (2, kk, sz, z_hi)):
        lo_n, hi_n = _inner_neighbor(out, axis)
        out = jnp.where(cc == 0, scale * lo_n,
                        jnp.where(cc == hi_idx, scale * hi_n, out))
    return out


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

    v = vx[...]
    v0 = vx0[...]
    for parity in parities:
        v = _sweep(v, v0, gi, jj, kk, a=a, c_inv=c_inv, sx=sx, sy=sy,
                   sz=sz, n_full=n_full, y_hi=y_hi, z_hi=z_hi,
                   parity=parity)
    vx[...] = v

    cp3 = pltpu.make_async_copy(
        vx.at[pl.ds(lo - wlo, tx)], out_hbm.at[pl.ds(lo, tx)], sem1)
    cp3.start()
    cp3.wait()


def _bnd_scales(b):
    return (-1.0 if b == 1 else 1.0, -1.0 if b == 2 else 1.0,
            -1.0 if b == 3 else 1.0)


@functools.partial(jax.jit, static_argnames=(
    "b", "a", "c", "iters", "red_black", "tx", "fuse"))
def lin_solve3d_pallas(b: int, x, x0, a: float, c: float, iters: int,
                       red_black: bool = False, tx: int = 8,
                       fuse: int = 2):
    """Drop-in fused replacement for stam.lin_solve3d (3D only).

    ``fuse`` = jacobi sweeps per HBM pass (red-black always fuses the
    two parity half-sweeps of one iteration per pass).
    """
    n_full, y_true, z_true = x.shape
    # Mosaic DMA slices need lane/sublane-aligned extents: pad y to a
    # multiple of 8 and z to a multiple of 128 (masks use true extents,
    # padding cells stay zero)
    yp = -(-y_true // 8) * 8
    zp = -(-z_true // 128) * 128
    padded = (yp != y_true) or (zp != z_true)
    if padded:
        x = jnp.pad(x, ((0, 0), (0, yp - y_true), (0, zp - z_true)))
        x0 = jnp.pad(x0, ((0, 0), (0, yp - y_true), (0, zp - z_true)))
    sx, sy, sz = _bnd_scales(b)
    if red_black:
        passes, parities = iters, (0, 1)
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
        n_full=n_full, y_hi=y_true - 1, z_hi=z_true - 1, tx=tx,
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

    out = jax.lax.fori_loop(0, passes, body, x)
    if padded:
        out = out[:, :y_true, :z_true]
    return out

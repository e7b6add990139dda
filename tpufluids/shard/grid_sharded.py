"""Sharded 3D stable-fluids step: x-slab decomposition + ICI halo
exchange (BASELINE config 5: 512^3 over a device mesh).

Layout: the global field interior is (n, n+2, n+2) — NO ghost planes
along the sharded x axis (they are materialized locally), ghost layers
kept along y/z.  The array shards evenly along x over the 1-D mesh.
Inside ``shard_map`` each device pads its slab with two halo planes,
refreshed by ``jax.lax.ppermute`` before every stencil application —
the exact communication pattern of the reference's 1-cell-plane halo
buffer (``buffer = GRIDSIZE^2``, solver-unidyn.cu:187), but over ICI
instead of host-staged memcpy.

Numerics match the single-device stam.step3d exactly (tests assert
allclose): every Jacobi iteration refreshes halos with the previous
iteration's planes, which is precisely what the dense update reads.
Advection backtraces are clamped to one halo plane across the shard
boundary (CFL <= 1 cell in x across devices).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpufluids.grid.stam import GridState3D, StamConfig

AXIS = "x"


# ---------------------------------------------------------------------------
# layout conversion (dense single-device <-> sharded)


def to_sharded_layout(state: GridState3D) -> GridState3D:
    """Strip the x ghost planes: (n+2, n+2, n+2) -> (n, n+2, n+2)."""
    return jax.tree_util.tree_map(lambda a: a[1:-1], state)


def from_sharded_layout(state: GridState3D, cfg: StamConfig) -> GridState3D:
    """Re-attach x ghost planes using set_bnd continuity values."""
    from tpufluids.grid.stam import set_bnd3d

    def pad(a, b):
        full = jnp.pad(a, ((1, 1), (0, 0), (0, 0)))
        return set_bnd3d(b, full)

    return GridState3D(
        u=pad(state.u, 1), v=pad(state.v, 2), w=pad(state.w, 3),
        dens=pad(state.dens, 0), temp=pad(state.temp, 0))


def shard_state(state: GridState3D, mesh: Mesh) -> GridState3D:
    sh = NamedSharding(mesh, P(AXIS, None, None))
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), state)


# ---------------------------------------------------------------------------
# local (per-shard) primitives


def _halo_exchange(a, sx, n_dev):
    """Pad the local slab (c, Y, Z) to (c+2, Y, Z) with neighbor planes;
    domain edges get the set_bnd x-face values (scale sx)."""
    idx = jax.lax.axis_index(AXIS)
    if n_dev > 1:
        right = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        left = [(i, (i - 1) % n_dev) for i in range(n_dev)]
        from_left = jax.lax.ppermute(a[-1:], AXIS, right)   # neighbor's last
        from_right = jax.lax.ppermute(a[:1], AXIS, left)    # neighbor's first
    else:
        from_left = a[-1:]
        from_right = a[:1]
    lo = jnp.where(idx == 0, sx * a[:1], from_left)
    hi = jnp.where(idx == n_dev - 1, sx * a[-1:], from_right)
    return jnp.concatenate([lo, a, hi], axis=0)


def _set_bnd_yz(b, x):
    """y/z faces of set_bnd3d on a local block (x faces are handled by
    the halo exchange)."""
    sy = -1.0 if b == 2 else 1.0
    sz = -1.0 if b == 3 else 1.0
    x = x.at[:, 0, :].set(sy * x[:, 1, :])
    x = x.at[:, -1, :].set(sy * x[:, -2, :])
    x = x.at[:, :, 0].set(sz * x[:, :, 1])
    x = x.at[:, :, -1].set(sz * x[:, :, -2])
    return x


def _bnd(b, a, n_dev):
    """Full set_bnd3d on a local slab WITHOUT x ghosts: returns the slab
    with y/z faces set (x faces live in the halo pad)."""
    return _set_bnd_yz(b, a)


def _halo(b, a, n_dev):
    """set_bnd + halo pad: returns (c+2, Y, Z) ready for a stencil."""
    sx = -1.0 if b == 1 else 1.0
    a = _set_bnd_yz(b, a)
    return _halo_exchange(a, sx, n_dev)


def _lin_solve_local(b, x, x0, a, c, iters, n_dev, red_black=False):
    c_inv = 1.0 / c

    def jacobi(x):
        xp = _halo(b, x, n_dev)
        nb = (xp[:-2, 1:-1, 1:-1] + xp[2:, 1:-1, 1:-1]
              + xp[1:-1, :-2, 1:-1] + xp[1:-1, 2:, 1:-1]
              + xp[1:-1, 1:-1, :-2] + xp[1:-1, 1:-1, 2:])
        return x.at[:, 1:-1, 1:-1].set((x0[:, 1:-1, 1:-1] + a * nb) * c_inv)

    if not red_black:
        def body(_, x):
            return _set_bnd_yz(b, jacobi(x))
        return jax.lax.fori_loop(0, iters, body, x)

    # red-black parity must be computed in GLOBAL x coordinates
    c_local = x.shape[0]
    gx0 = jax.lax.axis_index(AXIS) * c_local
    shape = (c_local, x.shape[1] - 2, x.shape[2] - 2)
    # 0-based interior indices to match the dense _checker parity
    i = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + gx0
    j = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    k = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    mask0 = ((i + j + k) % 2) == 0

    def body_rb(_, x):
        for parity in (0, 1):
            new = jacobi(x)
            m = mask0 if parity == 0 else ~mask0
            x = x.at[:, 1:-1, 1:-1].set(
                jnp.where(m, new[:, 1:-1, 1:-1], x[:, 1:-1, 1:-1]))
            x = _set_bnd_yz(b, x)
        return x

    return jax.lax.fori_loop(0, iters, body_rb, x)


def _advect_local(b, q, u, v, w, cfg, n_dev, n):
    """Semi-Lagrangian advection on a local slab; backtraces clamp to
    the one-plane halo across the shard boundary.

    NOTE: the XLA slab fallback always uses this GATHER formulation
    regardless of cfg.advect_mode — with ``advect_mode="stencil"`` it
    matches the dense stencil path only away from domain edges (the
    two formulations clamp edge backtraces differently, a few % on
    edge cells).  The production Pallas sharded backend runs the same
    stencil advection as the dense step and matches it everywhere
    (tests/test_grid_sharded.py::test_sharded_pallas_step_matches_dense)."""
    c_local = q.shape[0]
    dt0 = cfg.dt * n
    gx0 = jax.lax.axis_index(AXIS) * c_local  # global x of local row 0
    qp = _halo(b, q, n_dev)  # (c+2, Y, Z); local row i -> qp row i+1
    shape = (c_local, n, n)
    ii = jax.lax.broadcasted_iota(jnp.float32, shape, 0)
    jj = jax.lax.broadcasted_iota(jnp.float32, shape, 1) + 1.0
    kk = jax.lax.broadcasted_iota(jnp.float32, shape, 2) + 1.0
    gi = ii + gx0.astype(jnp.float32) + 1.0  # global x coordinate

    x = jnp.clip(gi - dt0 * u[:, 1:-1, 1:-1], 0.5, n + 0.5)
    y = jnp.clip(jj - dt0 * v[:, 1:-1, 1:-1], 0.5, n + 0.5)
    z = jnp.clip(kk - dt0 * w[:, 1:-1, 1:-1], 0.5, n + 0.5)
    # local coordinate into the halo-padded block qp (row r = global
    # row gx0 + r).  With the one-plane halo, backtraces of up to one
    # cell across the shard boundary are exact (the i0 clamp keeps the
    # lx == c+1 edge interpolating rows c / c+1 with weight 1); longer
    # backtraces clamp to the halo (CFL <= 1 plane in x).
    lx = jnp.clip(x - gx0, 0.0, c_local + 1.0)

    i0 = jnp.clip(jnp.floor(lx).astype(jnp.int32), 0, c_local)
    j0 = jnp.floor(y).astype(jnp.int32)
    k0 = jnp.floor(z).astype(jnp.int32)
    s1, t1, r1 = lx - i0, y - j0, z - k0
    s0, t0, r0 = 1 - s1, 1 - t1, 1 - r1

    def g(di, dj, dk):
        return qp[jnp.clip(i0 + di, 0, c_local + 1), j0 + dj, k0 + dk]

    out = (s0 * (t0 * (r0 * g(0, 0, 0) + r1 * g(0, 0, 1))
                 + t1 * (r0 * g(0, 1, 0) + r1 * g(0, 1, 1)))
           + s1 * (t0 * (r0 * g(1, 0, 0) + r1 * g(1, 0, 1))
                   + t1 * (r0 * g(1, 1, 0) + r1 * g(1, 1, 1))))
    return _set_bnd_yz(b, q.at[:, 1:-1, 1:-1].set(out))


def _dct_solve_local(x0, n, n_dev, cfg=None, final=True):
    """Sharded spectral projection solve (stam._dct_solve_interior over
    x-slabs): y/z cosine transforms are local matmuls; the x transform
    contracts the sharded axis as a per-device partial matmul followed
    by ``psum_scatter`` — one reduce-scatter over ICI each way, versus
    the iterative solver's 2 halo exchanges per iteration."""
    from tpufluids.grid.stam import _DCT_PREC, _dct_axis, _dct_mats, \
        _dct_params

    prec = _DCT_PREC[_dct_params(cfg, final)[0]]
    c = x0.shape[0]
    off = jax.lax.axis_index(AXIS) * c
    xi = x0[:, 1:-1, 1:-1]
    C, Ci, lam1 = _dct_mats(n)

    def xmul(a, m):
        cols = jax.lax.dynamic_slice_in_dim(m, off, c, axis=1)
        part = jnp.tensordot(cols, a, axes=((1,), (0,)),
                             precision=prec)
        if n_dev == 1:
            return part
        return jax.lax.psum_scatter(part, AXIS, scatter_dimension=0,
                                    tiled=True)

    def t_ax(a, m, ax):
        return _dct_axis(a, m, ax, prec)

    F = xmul(xi, C)
    F = t_ax(F, C, 1)
    F = t_ax(F, C, 2)
    lam = (jax.lax.dynamic_slice_in_dim(lam1, off, c)[:, None, None]
           + lam1[None, :, None] + lam1[None, None, :])
    coef = F / jnp.where(lam == 0.0, 1.0, lam)
    # zero the global (0,0,0) gauge mode (lives on device 0's slab)
    gauge = ((jnp.arange(c)[:, None, None] + off == 0)
             & (jnp.arange(n)[None, :, None] == 0)
             & (jnp.arange(n)[None, None, :] == 0))
    coef = jnp.where(gauge, 0.0, coef)
    sol = xmul(coef, Ci)
    sol = t_ax(sol, Ci, 1)
    sol = t_ax(sol, Ci, 2)
    p = jnp.zeros_like(x0).at[:, 1:-1, 1:-1].set(sol)
    return _set_bnd_yz(0, p)


def _dct_solve_local_zg(dslab, n, n_dev, cfg, te, final=True):
    """Sharded spectral projection solve directly on the z-ghostless
    slab layout (stam.dct_solve3d_zg over x-slabs): y/z cosine
    transforms are local matmuls, the x transform contracts the
    sharded axis as a per-device partial matmul + ``psum_scatter``
    (one reduce-scatter over ICI each way).  Keeps the Pallas
    per-shard pipeline fully resident in the zg layout — without this
    a ``projection='dct'`` sharded step fell back to the pure-XLA slab
    step, whose 256^3 compile is pathological (round-4 incident: the
    config-5 bench secondary killed the TPU worker)."""
    from tpufluids.grid.stam import (_DCT_PREC, _dct_axis, _dct_mats,
                                     _radix_fwd_axis, _radix_inv_axis)

    from tpufluids.grid.stam import _dct_params
    prec_key, radix_min, radix_levels = _dct_params(cfg, final)
    prec = _DCT_PREC[prec_key]
    y_true, z_true = te
    zi = z_true - 2
    c = dslab.shape[0]
    xi = dslab[:, 1:y_true - 1, :zi]

    if n_dev == 1:
        # the slab IS the full interior: run the dense interior solver
        # (radix split on ALL THREE axes, no partial-matmul/collective
        # pattern — on a 1-device mesh that pattern cost real time even
        # though the psum_scatter itself is a no-op: config5 ran 13.5%
        # over the unsharded step in BENCH_r04, the same trick as the
        # SPH n_dev==1 static fast path, r4)
        from tpufluids.grid.stam import _dct_solve_interior
        sol = _dct_solve_interior(xi, prec_key, radix_min, radix_levels)
        p = jnp.zeros_like(dslab).at[:, 1:y_true - 1, :zi].set(sol)
        p = p.at[:, 0].set(p[:, 1])
        p = p.at[:, y_true - 1].set(p[:, y_true - 2])
        return p

    off = jax.lax.axis_index(AXIS) * c
    C, Ci, lam1 = _dct_mats(n)
    # radix-2 split on the LOCAL (y/z) transforms only — the sharded x
    # transform stays the partial-matmul + psum_scatter contraction
    use_radix = bool(radix_min) and n >= radix_min and n % 2 == 0

    def xmul(a, m):
        cols = jax.lax.dynamic_slice_in_dim(m, off, c, axis=1)
        part = jnp.tensordot(cols, a, axes=((1,), (0,)), precision=prec)
        if n_dev == 1:
            return part
        return jax.lax.psum_scatter(part, AXIS, scatter_dimension=0,
                                    tiled=True)

    lamx = jax.lax.dynamic_slice_in_dim(lam1, off, c)
    F = xmul(xi, C)
    if use_radix:
        pieces = [(F, [])]
        pieces = _radix_fwd_axis(pieces, 1, prec, radix_levels)
        pieces = _radix_fwd_axis(pieces, 2, prec, radix_levels)
        solved = []
        for k, (a, lams) in enumerate(pieces):
            lam = (lamx[:, None, None] + lams[0][None, :, None]
                   + lams[1][None, None, :])
            if k == 0:
                a = a / jnp.where(lam == 0.0, 1.0, lam)
                # zero the global (0,0,0) gauge mode (device 0's slab)
                m2 = n // 2
                gauge = ((jnp.arange(c)[:, None, None] + off == 0)
                         & (jnp.arange(m2)[None, :, None] == 0)
                         & (jnp.arange(m2)[None, None, :] == 0))
                a = jnp.where(gauge, 0.0, a)
            else:
                a = a / lam
            solved.append(a)
        pieces = _radix_inv_axis(solved, 2, prec, radix_levels)
        pieces = _radix_inv_axis(pieces, 1, prec, radix_levels)
        sol = xmul(pieces[0], Ci)
    else:
        F = _dct_axis(F, C, 1, prec)
        F = _dct_axis(F, C, 2, prec)
        lam = (lamx[:, None, None]
               + lam1[None, :, None] + lam1[None, None, :])
        coef = F / jnp.where(lam == 0.0, 1.0, lam)
        # zero the global (0,0,0) gauge mode (lives on device 0's slab)
        gauge = ((jnp.arange(c)[:, None, None] + off == 0)
                 & (jnp.arange(n)[None, :, None] == 0)
                 & (jnp.arange(n)[None, None, :] == 0))
        coef = jnp.where(gauge, 0.0, coef)
        sol = xmul(coef, Ci)
        sol = _dct_axis(sol, Ci, 1, prec)
        sol = _dct_axis(sol, Ci, 2, prec)
    p = jnp.zeros_like(dslab).at[:, 1:y_true - 1, :zi].set(sol)
    # stored ghost faces (y only; z faces are synthesized by zg
    # consumers as +1 * adjacent, the b=0 dense value)
    p = p.at[:, 0].set(p[:, 1])
    p = p.at[:, y_true - 1].set(p[:, y_true - 2])
    return p


def _divergence_local(u, v, w, n, n_dev):
    h = 1.0 / n
    up = _halo(1, u, n_dev)
    return -0.5 * h * (
        up[2:, 1:-1, 1:-1] - up[:-2, 1:-1, 1:-1]
        + v[:, 2:, 1:-1] - v[:, :-2, 1:-1]
        + w[:, 1:-1, 2:] - w[:, 1:-1, :-2])


def _project_local(u, v, w, cfg, n, n_dev, with_residual=True,
                   final=True):
    h = 1.0 / n
    div = jnp.zeros_like(u).at[:, 1:-1, 1:-1].set(
        _divergence_local(u, v, w, n, n_dev))
    div = _set_bnd_yz(0, div)
    if cfg.projection == "dct":
        p = _dct_solve_local(div, n, n_dev, cfg, final)
    else:
        p = _lin_solve_local(0, jnp.zeros_like(u), div, 1.0, 6.0,
                             cfg.jacobi_iters, n_dev,
                             red_black=cfg.red_black)
    pp = _halo(0, p, n_dev)
    u = u.at[:, 1:-1, 1:-1].add(
        -0.5 * (pp[2:, 1:-1, 1:-1] - pp[:-2, 1:-1, 1:-1]) / h)
    v = v.at[:, 1:-1, 1:-1].add(-0.5 * (p[:, 2:, 1:-1] - p[:, :-2, 1:-1]) / h)
    w = w.at[:, 1:-1, 1:-1].add(-0.5 * (p[:, 1:-1, 2:] - p[:, 1:-1, :-2]) / h)
    u = _set_bnd_yz(1, u)
    v = _set_bnd_yz(2, v)
    w = _set_bnd_yz(3, w)
    if not with_residual:
        return u, v, w, jnp.float32(0)
    # Poisson residual (global max via pmax), reusing the halo'd p
    nb = (pp[:-2, 1:-1, 1:-1] + pp[2:, 1:-1, 1:-1]
          + pp[1:-1, :-2, 1:-1] + pp[1:-1, 2:, 1:-1]
          + pp[1:-1, 1:-1, :-2] + pp[1:-1, 1:-1, 2:])
    res = jnp.max(jnp.abs(div[:, 1:-1, 1:-1] + nb - 6.0 * p[:, 1:-1, 1:-1]))
    res = jax.lax.pmax(res, AXIS)
    return u, v, w, res


def _vorticity_local(u, v, w, cfg, n, n_dev):
    """Sharded twin of stam.vorticity_confinement3d: identical stencil
    arithmetic on the halo-padded slab.  x ghosts are materialized
    directly from the neighbor/face values WITHOUT re-running set_bnd
    (the dense version reads whatever ghosts the previous set_bnd3d
    left, which the sx-scaled face value reproduces exactly)."""
    h = 1.0 / n
    up = _halo_exchange(u, -1.0, n_dev)
    vp = _halo_exchange(v, 1.0, n_dev)
    wp = _halo_exchange(w, 1.0, n_dev)

    def dx(q):
        return 0.5 * (q[2:, 1:-1, 1:-1] - q[:-2, 1:-1, 1:-1]) / h

    def dy(q):
        return 0.5 * (q[1:-1, 2:, 1:-1] - q[1:-1, :-2, 1:-1]) / h

    def dz(q):
        return 0.5 * (q[1:-1, 1:-1, 2:] - q[1:-1, 1:-1, :-2]) / h

    wx = dy(wp) - dz(vp)
    wy = dz(up) - dx(wp)
    wz = dx(vp) - dy(up)
    mag_i = jnp.sqrt(wx * wx + wy * wy + wz * wz)
    # dense keeps mag's ghost shell at 0 (zeros_like + interior set):
    # local slab rows are all dense-interior, y/z ghosts zero, and the
    # x halo at the domain edge is the dense ghost plane = 0.
    mag = jnp.zeros_like(u).at[:, 1:-1, 1:-1].set(mag_i)
    magp = _halo_exchange(mag, 0.0, n_dev)
    gx, gy, gz = dx(magp), dy(magp), dz(magp)
    norm = jnp.sqrt(gx * gx + gy * gy + gz * gz) + 1e-5
    gx, gy, gz = gx / norm, gy / norm, gz / norm
    eps_h = cfg.vorticity_eps * h
    u = u.at[:, 1:-1, 1:-1].add(cfg.dt * eps_h * (gy * wz - gz * wy))
    v = v.at[:, 1:-1, 1:-1].add(cfg.dt * eps_h * (gz * wx - gx * wz))
    w = w.at[:, 1:-1, 1:-1].add(cfg.dt * eps_h * (gx * wy - gy * wx))
    return _set_bnd_yz(1, u), _set_bnd_yz(2, v), _set_bnd_yz(3, w)


def _step_local(u, v, w, dens, temp, cfg: StamConfig, n: int, n_dev: int,
                with_residual=True):
    if cfg.buoyancy_alpha or cfg.buoyancy_beta:
        f = (-cfg.buoyancy_alpha * dens[:, 1:-1, 1:-1]
             + cfg.buoyancy_beta * (temp[:, 1:-1, 1:-1] - cfg.ambient_temp))
        w = _set_bnd_yz(3, w.at[:, 1:-1, 1:-1].add(cfg.dt * f))
    if cfg.vorticity_eps:
        u, v, w = _vorticity_local(u, v, w, cfg, n, n_dev)
    if cfg.visc:
        a = cfg.dt * cfg.visc * n * n
        u = _lin_solve_local(1, u, u, a, 1 + 6 * a, cfg.jacobi_iters, n_dev)
        v = _lin_solve_local(2, v, v, a, 1 + 6 * a, cfg.jacobi_iters, n_dev)
        w = _lin_solve_local(3, w, w, a, 1 + 6 * a, cfg.jacobi_iters, n_dev)
    u, v, w, _ = _project_local(u, v, w, cfg, n, n_dev,
                                with_residual=False, final=False)
    u0, v0, w0 = u, v, w
    u = _advect_local(1, u0, u0, v0, w0, cfg, n_dev, n)
    v = _advect_local(2, v0, u0, v0, w0, cfg, n_dev, n)
    w = _advect_local(3, w0, u0, v0, w0, cfg, n_dev, n)
    u, v, w, res = _project_local(u, v, w, cfg, n, n_dev,
                                  with_residual=with_residual)
    if cfg.diff:
        a = cfg.dt * cfg.diff * n * n
        dens = _lin_solve_local(0, dens, dens, a, 1 + 6 * a,
                                cfg.jacobi_iters, n_dev)
    dens = _advect_local(0, dens, u, v, w, cfg, n_dev, n)
    if cfg.temp_diff:
        a = cfg.dt * cfg.temp_diff * n * n
        temp = _lin_solve_local(0, temp, temp, a, 1 + 6 * a,
                                cfg.jacobi_iters, n_dev)
    temp = _advect_local(0, temp, u, v, w, cfg, n_dev, n)
    return u, v, w, dens, temp, res


# ---------------------------------------------------------------------------
# Pallas per-shard step: the dense z-ghostless kernel pipeline
# (grid/pallas_kernels.py) run slab-locally between ICI halo exchanges.
# Numerics match the dense stam.step3d pallas path (tests assert
# allclose); the deep-halo packed solver exchanges once per ``fuse``
# iterations instead of once per sweep.


def _refresh_halo(q, b, n_dev):
    """Rewrite the 2 pad rows on each side of a PERSISTENTLY padded
    z-ghostless slab (c+4, yp, zp; interior rows [2:-2]) in place:
    rows [0:2] / [-2:] become the neighbor's two adjacent interior
    rows over ICI, or at the domain x-faces the set_bnd ghost
    (sx * edge row at the adjacent pad row, zero junk beyond it that
    the kernels' global interior masks and face gates wall off) —
    2-row writes instead of a per-stage full-array concatenate copy.
    Kernel outputs carry garbage pad rows; calling this before every
    stencil read re-validates them."""
    sx = _sx(b)
    zero = jnp.zeros_like(q[0:1])
    lo_edge = jnp.concatenate([zero, sx * q[2:3]], axis=0)
    hi_edge = jnp.concatenate([sx * q[-3:-2], zero], axis=0)
    if n_dev > 1:
        idx = jax.lax.axis_index(AXIS)
        right = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        left = [(i, (i - 1) % n_dev) for i in range(n_dev)]
        from_left = jax.lax.ppermute(q[-4:-2], AXIS, right)
        from_right = jax.lax.ppermute(q[2:4], AXIS, left)
        lo = jnp.where(idx == 0, lo_edge, from_left)
        hi = jnp.where(idx == n_dev - 1, hi_edge, from_right)
    else:
        lo, hi = lo_edge, hi_edge
    return q.at[0:2].set(lo).at[-2:].set(hi)


def _sx(b):
    return -1.0 if b == 1 else 1.0


def _refresh_halo_multi(qs, bs, n_dev):
    """_refresh_halo over several same-shape fields with ONE ppermute
    each way: the per-field 2-row edge slabs are concatenated along
    axis 0, exchanged as a single (2k, Y, Z) message, and split back.
    Bit-identical to per-field refreshes; cuts the sharded step's
    collective count ~3-5x (each 2-row message is latency-bound, so
    batching k fields into one message is nearly free on ICI —
    VERDICT r4 #3's halo-overlap lever in its robust form)."""
    if n_dev == 1 or len(qs) == 1:
        return tuple(_refresh_halo(q, b, n_dev) for q, b in zip(qs, bs))
    idx = jax.lax.axis_index(AXIS)
    right = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    left = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    from_left = jax.lax.ppermute(
        jnp.concatenate([q[-4:-2] for q in qs], axis=0), AXIS, right)
    from_right = jax.lax.ppermute(
        jnp.concatenate([q[2:4] for q in qs], axis=0), AXIS, left)
    zero = jnp.zeros_like(qs[0][0:1])
    out = []
    for i, (q, b) in enumerate(zip(qs, bs)):
        sx = _sx(b)
        lo_edge = jnp.concatenate([zero, sx * q[2:3]], axis=0)
        hi_edge = jnp.concatenate([sx * q[-3:-2], zero], axis=0)
        lo = jnp.where(idx == 0, lo_edge, from_left[2 * i:2 * i + 2])
        hi = jnp.where(idx == n_dev - 1, hi_edge,
                       from_right[2 * i:2 * i + 2])
        out.append(q.at[0:2].set(lo).at[-2:].set(hi))
    return tuple(out)


def _step_local_pallas(u, v, w, dens, temp, cfg: StamConfig, n: int,
                       n_dev: int, te, plan, with_residual=True):
    """One slab-local step on PERSISTENTLY padded z-ghostless
    (c+4, yp, zp) fields (interior rows [2:-2]) using the dense Pallas
    kernels with global-coordinate placement (gx0/gn).

    The persistent pad replaces the previous per-stage
    ``jnp.concatenate`` halo pads and ``[1:-1]`` output slices
    (~30 full-array XLA copies per step at 256^3): kernels read and
    write the padded arrays directly, and ``_refresh_halo`` re-validates
    the 4 pad rows (2-row in-place writes + one 2-plane ppermute each
    way) before every stencil read.  Kernel placement is unchanged —
    gx0 = idx*c - 1 is exactly where the old depth-2 forcing pad put
    row 0, and div/gradsub treat the extra rows as discardable, so the
    per-cell arithmetic (and the bit-compat vs the dense step) is
    identical."""
    from tpufluids.grid.pallas_kernels import (advect3d_multi_pallas,
                                               div3d_pallas,
                                               forcing3d_pallas,
                                               gradsub3d_pallas,
                                               lin_solve3d_rb_shard,
                                               zg_restore)

    y_true, z_true = te
    c = u.shape[0] - 4
    idx = jax.lax.axis_index(AXIS) if n_dev > 1 else 0
    gn = n + 2
    h = 1.0 / n
    tx, fuse, pipeline = plan
    gx0 = idx * c - 1  # dense-global x of padded row 0

    def refresh(q, b):
        return _refresh_halo(q, b, n_dev)

    def repad(q_slab):
        return jnp.pad(q_slab, ((2, 2), (0, 0), (0, 0)))

    def solve(b, x_slab, x0_slab, a_, c_, x_zero=False):
        return lin_solve3d_rb_shard(
            b, x_slab, x0_slab, float(a_), float(c_), cfg.jacobi_iters,
            axis_name=AXIS, n_dev=n_dev, y_true=y_true, z_true=z_true,
            tx=tx, fuse=fuse, pipeline=pipeline, x_zero=x_zero)

    def solve_padded(b, q, a_, c_):
        s = q[2:-2]
        return repad(solve(b, s, s, a_, c_))

    if cfg.buoyancy_alpha or cfg.buoyancy_beta or cfg.vorticity_eps:
        u, v, w, dens, temp = _refresh_halo_multi(
            (u, v, w, dens, temp), (1, 2, 3, 0, 0), n_dev)
        u, v, w = forcing3d_pallas(
            u, v, w, dens, temp, float(cfg.dt), h,
            float(cfg.vorticity_eps), float(cfg.buoyancy_alpha),
            float(cfg.buoyancy_beta), float(cfg.ambient_temp), tx=16,
            true_extents=te, gx0=gx0, gn=gn)
    if cfg.visc:
        a_ = cfg.dt * cfg.visc * n * n
        u = solve_padded(1, u, a_, 1 + 6 * a_)
        v = solve_padded(2, v, a_, 1 + 6 * a_)
        w = solve_padded(3, w, a_, 1 + 6 * a_)

    def project(u, v, w, with_residual=False, final=True):
        u, v, w = _refresh_halo_multi((u, v, w), (1, 2, 3), n_dev)
        div = div3d_pallas(u, v, w, true_extents=te, h=h)
        dslab = div[2:-2]
        if cfg.projection == "dct":
            p_ = _dct_solve_local_zg(dslab, n, n_dev, cfg, te,
                                     final=final)
        else:
            p_ = solve(0, dslab, dslab, 1.0, 6.0, x_zero=True)
        pp = refresh(repad(p_), 0)
        uo, vo, wo = gradsub3d_pallas(pp, u, v, w, true_extents=te,
                                      h=h)
        if not with_residual:
            return uo, vo, wo, jnp.float32(0)
        pd = zg_restore(p_, 0, y_true, z_true)
        ppd = zg_restore(pp[1:-1], 0, y_true, z_true)
        dd = zg_restore(dslab, 0, y_true, z_true)
        nb = (ppd[:-2, 1:-1, 1:-1] + ppd[2:, 1:-1, 1:-1]
              + pd[:, :-2, 1:-1] + pd[:, 2:, 1:-1]
              + pd[:, 1:-1, :-2] + pd[:, 1:-1, 2:])
        res = jnp.max(jnp.abs(dd[:, 1:-1, 1:-1] + nb
                              - 6.0 * pd[:, 1:-1, 1:-1]))
        return uo, vo, wo, jax.lax.pmax(res, AXIS) if n_dev > 1 else res

    u, v, w, _ = project(u, v, w, final=False)
    u, v, w = _refresh_halo_multi((u, v, w), (1, 2, 3), n_dev)
    u, v, w = advect3d_multi_pallas(
        (u, v, w), (1, 2, 3), u, v, w, float(cfg.dt * n),
        self_advect=True, true_extents=te, gx0=gx0, gn=gn)
    u, v, w, res = project(u, v, w, with_residual=with_residual)

    if cfg.diff:
        a_ = cfg.dt * cfg.diff * n * n
        dens = solve_padded(0, dens, a_, 1 + 6 * a_)
    if cfg.temp_diff:
        a_ = cfg.dt * cfg.temp_diff * n * n
        temp = solve_padded(0, temp, a_, 1 + 6 * a_)
    u, v, w, dens, temp = _refresh_halo_multi(
        (u, v, w, dens, temp), (1, 2, 3, 0, 0), n_dev)
    dens, temp = advect3d_multi_pallas(
        (dens, temp), (0, 0), u, v, w,
        float(cfg.dt * n), true_extents=te, gx0=gx0, gn=gn)
    return u, v, w, dens, temp, res


def _pallas_sharded_supported(cfg: StamConfig) -> bool:
    # dct projection runs _dct_solve_local_zg inside the pallas
    # pipeline; red_black is still required because any visc/diff
    # solves go through the packed red-black shard solver
    return (cfg.projection in ("jacobi", "dct") and cfg.red_black
            and cfg.advect_mode == "stencil"
            and cfg.solver_dtype != "bfloat16"
            and cfg.n + 2 >= 16)


def make_sharded_step(mesh: Mesh, cfg: StamConfig, n_steps: int = 1,
                      backend: str = "auto"):
    """Build a jitted sharded scan of ``n_steps`` 3D steps.

    Takes/returns GridState3D in sharded layout ((n, n+2, n+2) fields,
    sharded along x).  Also returns the last step's Poisson residual.

    ``backend``: "auto" (pallas per-shard kernels on TPU when the
    config supports them — red-black jacobi projection + stencil
    advection — else the XLA slab step), "pallas", or "xla"."""
    n_dev = mesh.devices.size
    n = cfg.n
    if n % n_dev:
        raise ValueError(f"n={n} must divide over {n_dev} devices")
    if cfg.projection not in ("jacobi", "dct"):
        # silent fallback to jacobi would ignore the user's choice
        # (advisor finding r1); a sharded multigrid is not implemented.
        raise ValueError(
            f"sharded step supports projection in ('jacobi', 'dct'), "
            f"got {cfg.projection!r}")
    c_local = n // n_dev
    # packed checkerboard parity needs even slabs; the deep-halo pad
    # needs at least 2 donatable rows per slab
    slab_ok = c_local % 2 == 0 and c_local >= 2
    if backend == "pallas" and not (_pallas_sharded_supported(cfg)
                                    and slab_ok):
        raise ValueError(
            "backend='pallas' needs projection in ('jacobi', 'dct'), "
            "red_black, advect_mode='stencil', float32 solver, "
            f"n+2 >= 16, and an even per-device slab (n/n_dev = "
            f"{c_local})")
    use_pallas = (backend == "pallas"
                  or (backend == "auto" and slab_ok
                      and _pallas_sharded_supported(cfg)
                      and jax.default_backend() == "tpu"))
    spec = P(AXIS, None, None)

    plan = None
    te = None
    if use_pallas:
        from tpufluids.grid.pallas_kernels import (rb_shard_plan,
                                                   zg_extents, zg_pad,
                                                   zg_restore)
        te = (n + 2, n + 2)
        yp, zp = zg_extents(n + 2, n + 2)
        plan = rb_shard_plan(c_local, n + 2, n + 2, cfg.jacobi_iters)

    # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
    # annotation, which the shard_map vma checker rejects
    @partial(jax.shard_map, mesh=mesh,
             in_specs=(spec,) * 5, out_specs=((spec,) * 5, P()),
             check_vma=False)
    def run_local(u, v, w, dens, temp):
        if use_pallas:
            # persistent layout across the scan: z-ghostless y/z + 2
            # pad rows per x side (see _step_local_pallas)
            xpad = ((2, 2), (0, 0), (0, 0))
            u, v, w, dens, temp = (
                jnp.pad(zg_pad(q, yp, zp), xpad)
                for q in (u, v, w, dens, temp))

        def one_step(carry, with_residual):
            u, v, w, dens, temp = carry
            if use_pallas:
                u, v, w, dens, temp, res = _step_local_pallas(
                    u, v, w, dens, temp, cfg, n, n_dev, te, plan,
                    with_residual=with_residual)
            else:
                u, v, w, dens, temp, res = _step_local(
                    u, v, w, dens, temp, cfg, n, n_dev,
                    with_residual=with_residual)
            return (u, v, w, dens, temp), res

        def body(carry, _):
            return one_step(carry, False)

        # residual on the FINAL step only (matches stam.run3d_python):
        # computing it per scan step costs ~5 extra full-array passes
        carry, _ = jax.lax.scan(
            body, (u, v, w, dens, temp), None, length=n_steps - 1)
        (u, v, w, dens, temp), res = one_step(carry, True)
        if use_pallas:
            u = zg_restore(u[2:-2], 1, n + 2, n + 2)
            v = zg_restore(v[2:-2], 2, n + 2, n + 2)
            w = zg_restore(w[2:-2], 3, n + 2, n + 2)
            dens = zg_restore(dens[2:-2], 0, n + 2, n + 2)
            temp = zg_restore(temp[2:-2], 0, n + 2, n + 2)
        return (u, v, w, dens, temp), res

    @jax.jit
    def step(state: GridState3D):
        (u, v, w, dens, temp), res = run_local(
            state.u, state.v, state.w, state.dens, state.temp)
        return GridState3D(u=u, v=v, w=w, dens=dens, temp=temp), res

    return step

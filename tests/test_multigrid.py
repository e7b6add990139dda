"""Geometric multigrid projection option: convergence vs plain
red-black sweeps, and integration into both grid schemes."""

import numpy as np
import jax
import jax.numpy as jnp

from tpufluids.grid import mac, stam


def _rand_rhs(n, seed=0):
    """Mean-free random RHS: the all-Neumann Poisson system (set_bnd
    continuity ghosts) is singular with a constant null space, so it is
    solvable only for compatible RHS — which real divergence fields
    satisfy (no-flux walls integrate div to zero)."""
    rng = np.random.default_rng(seed)
    r = rng.normal(0, 1, (n, n, n)).astype(np.float32)
    r -= r.mean()
    x0 = jnp.zeros((n + 2,) * 3, jnp.float32).at[1:-1, 1:-1, 1:-1].set(r)
    return stam.set_bnd3d(0, x0)


def _resid(p, x0):
    return float(jnp.max(jnp.abs(stam._mg_residual3d(p, x0))))


def test_vcycle_beats_sweeps():
    """Two V(2,2) cycles (~16 sweeps of work) must beat 20 plain
    red-black iterations by an order of magnitude at 64^3."""
    n = 64
    cfg = stam.StamConfig(n=n, red_black=True, jacobi_iters=20)
    x0 = _rand_rhs(n)
    p_rb = stam.lin_solve3d(0, jnp.zeros_like(x0), x0, 1.0, 6.0, 20,
                            red_black=True)
    p_mg = stam.mg_solve3d(x0, cfg, cycles=2)
    assert _resid(p_mg, x0) < 0.1 * _resid(p_rb, x0)


def test_vcycle_contraction_rate():
    """Residual keeps contracting per additional cycle (until float32
    round-off)."""
    n = 32
    cfg = stam.StamConfig(n=n, red_black=True)
    x0 = _rand_rhs(n, seed=2)
    r_prev = None
    for cycles in (2, 3, 4):
        r = _resid(stam.mg_solve3d(x0, cfg, cycles=cycles), x0)
        if r_prev is not None and r_prev > 1e-4:
            assert r < 0.5 * r_prev
        r_prev = r


def test_step3d_with_multigrid_projection():
    n = 32
    cfg = stam.StamConfig(n=n, dt=0.5 / n, jacobi_iters=20,
                          red_black=True, projection="multigrid",
                          mg_cycles=2, buoyancy_beta=0.5,
                          vorticity_eps=1.0, advect_mode="stencil")
    s = stam.make_grid3d(cfg)
    s = s.replace(dens=s.dens.at[12:20, 12:20, 1:5].set(1.0),
                  temp=s.temp.at[12:20, 12:20, 1:5].set(3.0))
    for _ in range(5):
        s, res = stam.step3d(s, cfg, with_residual=True)
    assert bool(jnp.isfinite(s.u).all() & jnp.isfinite(s.dens).all())
    # multigrid residual far below what 20 sweeps deliver
    cfg_rb = cfg.replace(projection="jacobi")
    s2 = stam.make_grid3d(cfg_rb)
    s2 = s2.replace(dens=s.dens, temp=s.temp)
    for _ in range(5):
        s2, res_rb = stam.step3d(s2, cfg_rb, with_residual=True)
    assert float(res) < float(res_rb)


def test_mac_with_multigrid_kills_divergence():
    n = 32
    cfg = stam.StamConfig(n=n, red_black=True, projection="multigrid",
                          mg_cycles=3, jacobi_iters=20)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(0, 1, (n + 1, n, n)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (n, n + 1, n)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 1, (n, n, n + 1)), jnp.float32)
    u, v, w = mac._noflux(u, v, w)
    div0 = float(jnp.max(jnp.abs(mac.divergence(u, v, w, n))))
    u, v, w, res = mac.project(u, v, w, cfg, with_residual=True)
    # MAC + multigrid: divergence drops ~4 orders of magnitude
    assert float(res) < 1e-3 * div0

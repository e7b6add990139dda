"""MAC (staggered) grid option: the projection must actually kill the
divergence (the property the collocated scheme cannot deliver — see
stam.poisson_residual3d), plus basic physics sanity."""

import numpy as np
import jax
import jax.numpy as jnp

from tpufluids.grid import mac, stam


def _cfg(**kw):
    base = dict(n=24, dt=0.05, jacobi_iters=60, red_black=True,
                buoyancy_beta=0.5, buoyancy_alpha=0.05)
    base.update(kw)
    return stam.StamConfig(**base)


def _seeded(cfg, seed=0):
    rng = np.random.default_rng(seed)
    n = cfg.n
    state = mac.make_mac3d(cfg)
    return state.replace(
        u=jnp.asarray(rng.normal(0, 1, (n + 1, n, n)), jnp.float32),
        v=jnp.asarray(rng.normal(0, 1, (n, n + 1, n)), jnp.float32),
        w=jnp.asarray(rng.normal(0, 1, (n, n, n + 1)), jnp.float32),
        dens=jnp.asarray(rng.uniform(0, 1, (n, n, n)), jnp.float32))


def test_projection_kills_divergence():
    cfg = _cfg()
    s = _seeded(cfg)
    u, v, w = mac._noflux(s.u, s.v, s.w)
    div0 = float(jnp.max(jnp.abs(mac.divergence(u, v, w, cfg.n))))
    u, v, w, res = mac.project(u, v, w, cfg, with_residual=True)
    assert div0 > 1.0
    # 60 red-black iters at 24^3: divergence drops by orders of
    # magnitude — impossible on the collocated grid (checkerboard)
    assert float(res) < 2e-2 * div0


def test_projection_converges_with_iters():
    s = _seeded(_cfg())
    u0, v0, w0 = mac._noflux(s.u, s.v, s.w)
    residuals = []
    for iters in (10, 40, 160):
        cfg = _cfg(jacobi_iters=iters)
        *_, res = mac.project(u0, v0, w0, cfg, with_residual=True)
        residuals.append(float(res))
    assert residuals[1] < residuals[0]
    assert residuals[2] < residuals[1]


def test_projection_contracts():
    """Projection is (approximately) idempotent: a second application
    moves the field far less than the first (the residual motion is
    the unconverged Jacobi tail, which shrinks monotonically)."""
    cfg = _cfg(jacobi_iters=120)
    s = _seeded(cfg, seed=3)
    u0, v0, w0 = mac._noflux(s.u, s.v, s.w)
    u1, v1, w1 = mac.project(u0, v0, w0, cfg)
    u2, v2, w2 = mac.project(u1, v1, w1, cfg)
    d1 = max(float(jnp.max(jnp.abs(a - b)))
             for a, b in ((u0, u1), (v0, v1), (w0, w1)))
    d2 = max(float(jnp.max(jnp.abs(a - b)))
             for a, b in ((u1, u2), (v1, v2), (w1, w2)))
    assert d2 < 0.05 * d1


def test_plume_rises_and_stays_finite():
    cfg = _cfg(n=20, jacobi_iters=30)
    state = mac.make_mac3d(cfg)
    n = cfg.n
    state = state.replace(
        dens=state.dens.at[8:12, 8:12, 1:4].set(1.0),
        temp=state.temp.at[8:12, 8:12, 1:4].set(3.0))
    kk = np.arange(n) + 0.5

    def com_z(d):
        d = np.asarray(d)
        return float((d.sum((0, 1)) * kk).sum() / max(d.sum(), 1e-9))

    z0 = com_z(state.dens)
    state, res = mac.run3d(state, cfg, 30)
    z1 = com_z(state.dens)
    assert z1 > z0 + 0.5
    for f in (state.u, state.v, state.w, state.dens, state.temp):
        assert bool(jnp.isfinite(f).all())
    # no-flux walls hold
    assert float(jnp.max(jnp.abs(state.u[0]))) == 0.0
    assert float(jnp.max(jnp.abs(state.w[:, :, -1]))) == 0.0


def test_scalar_advection_bounded():
    """Trilinear semi-Lagrangian advection cannot create new extrema."""
    cfg = _cfg(n=16, jacobi_iters=20, buoyancy_beta=0.0,
               buoyancy_alpha=0.0)
    s = _seeded(cfg, seed=5)
    s = s.replace(dens=jnp.clip(s.dens, 0.0, 1.0))
    out = mac.step3d(s, cfg)
    d = np.asarray(out.dens)
    assert d.min() >= -1e-5 and d.max() <= 1.0 + 1e-5

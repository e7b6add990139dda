"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.json): cell-updates/sec/chip for the 3D
stable-fluids step at 256^3 (config 3: red-black Jacobi projection +
vorticity confinement), plus the max Poisson/divergence residual.

The reference publishes no numbers (BASELINE.md), so vs_baseline is
measured against the self-established round-1 number recorded below.
Extra detail goes to stderr; stdout carries exactly one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

# Self-established baseline (first TPU measurement of this harness,
# v5e single chip, 256^3, 20 red-black Jacobi iters). Updated only when
# the harness itself changes meaning.
BASELINE_CELL_UPDATES_PER_SEC = 1.31e8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    n = 256
    steps = 40
    warmup = 3
    for a in sys.argv[1:]:
        if a.startswith("--size="):
            n = int(a.split("=")[1])
        if a.startswith("--steps="):
            steps = int(a.split("=")[1])

    from tpufluids.grid import stam

    dev = jax.devices()[0]
    log(f"device: {dev}, grid {n}^3, {steps} steps")

    # dt keeps CFL <= 1 cell for the stencil advection backend
    cfg = stam.StamConfig(n=n, dt=0.5 / n, jacobi_iters=20, red_black=True,
                          vorticity_eps=2.0, buoyancy_beta=0.5,
                          buoyancy_alpha=0.05, advect_mode="stencil")
    state = stam.make_grid3d(cfg)
    k = n // 8
    state = state.replace(
        dens=state.dens.at[3 * k:5 * k, 3 * k:5 * k, 1:k].set(1.0),
        temp=state.temp.at[3 * k:5 * k, 3 * k:5 * k, 1:k].set(3.0))

    t0 = time.perf_counter()
    state, res = stam.run3d_python(state, cfg, warmup)
    float(jnp.sum(state.u))  # honest fence (block_until_ready is
    # unreliable through the axon tunnel)
    log(f"compile+warmup ({warmup} steps): {time.perf_counter() - t0:.1f}s")

    # time in segments and report the median rate: the remote-compile
    # tunnel occasionally injects multi-second stalls that would
    # otherwise corrupt a single long measurement
    seg = max(steps // 5, 1)
    rates = []
    residual = None
    for _ in range(5):
        t0 = time.perf_counter()
        state, res = stam.run3d_python(state, cfg, seg)
        float(jnp.sum(state.u))
        rates.append((time.perf_counter() - t0) / seg)
        residual = float(res[-1])
    dt = sorted(rates)[2]

    cell_updates = n ** 3 / dt
    log(f"segment ms/step: {[round(r * 1e3, 1) for r in rates]}")
    log(f"median {dt * 1e3:.1f} ms/step; {cell_updates:.3e} "
        f"cell-updates/s/chip; residual {residual:.3e}")
    finite = bool(jnp.isfinite(state.dens).all()
                  and jnp.isfinite(state.u).all())
    log(f"fields finite: {finite}")

    # secondary: the spectral (DCT/MXU) projection option — exact
    # Poisson solve; reported alongside the headline jacobi config
    dct = {}
    try:
        dcfg = cfg.replace(projection="dct")
        dstate = stam.make_grid3d(dcfg)
        dstate = dstate.replace(
            dens=dstate.dens.at[3 * k:5 * k, 3 * k:5 * k, 1:k].set(1.0),
            temp=dstate.temp.at[3 * k:5 * k, 3 * k:5 * k, 1:k].set(3.0))
        dstate, dres = stam.run3d_python(dstate, dcfg, warmup)
        float(jnp.sum(dstate.u))
        t0 = time.perf_counter()
        dstate, dres = stam.run3d_python(dstate, dcfg, seg)
        float(jnp.sum(dstate.u))
        dct["dct_ms_per_step"] = round((time.perf_counter() - t0)
                                       / seg * 1e3, 2)
        dct["dct_poisson_residual"] = float(dres[-1])
        log(f"DCT projection: {dct['dct_ms_per_step']} ms/step, "
            f"residual {dct['dct_poisson_residual']:.3e}")
    except Exception as e:  # never fail the headline metric
        log(f"DCT secondary bench skipped: {e}")

    # secondary: the reference's own two scenes (SPH), Pallas backend
    sph = {}
    try:
        from tpufluids.config import BASE_CONFIG, UNIDYN_CONFIG
        from tpufluids.scenes import base_dam, unidyn_tank
        from tpufluids.step import run_python
        for sname, scfg, scene in (("base_dam_8000p", BASE_CONFIG,
                                    base_dam),
                                   ("unidyn_tank_14040p", UNIDYN_CONFIG,
                                    unidyn_tank)):
            s = scene(scfg)
            s, m = run_python(s, scfg, 2)
            float(s.pos[0, 0])
            t0 = time.perf_counter()
            s, m = run_python(s, scfg, 30)
            float(s.pos[0, 0])
            sph[sname + "_ms_per_step"] = round(
                (time.perf_counter() - t0) / 30 * 1e3, 2)
            log(f"SPH {sname}: {sph[sname + '_ms_per_step']} ms/step")
    except Exception as e:  # never fail the headline metric
        log(f"SPH secondary bench skipped: {e}")

    print(json.dumps({
        "metric": "cell-updates/sec/chip @ 256^3 stable-fluids step "
                  "(red-black Jacobi x20, vorticity confinement, buoyancy)",
        "value": cell_updates,
        "unit": "cell-updates/s",
        "vs_baseline": cell_updates / BASELINE_CELL_UPDATES_PER_SEC,
        "extra": {
            "ms_per_step": dt * 1e3,
            "poisson_residual": residual,
            "grid": n,
            "finite": finite,
            **dct,
            **sph,
        },
    }))


if __name__ == "__main__":
    main()

"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.json): cell-updates/sec/chip for the 3D
stable-fluids step at 256^3 plus the max Poisson/divergence residual.
The headline configuration is the SPECTRAL (DCT/MXU) projection — it
beats the red-black Jacobi config on both metric axes (r3: 14.5 vs
23.7 ms/step AND residual 7.6e-11 vs 2.5e-5); the Jacobi config is
kept as a continuity secondary.  Re-baselining note: BASELINE.md
"headline re-baselining (round 4)".

Driver-proofing (round-3 incident: rc 124 killed the run during a
late secondary and the headline never reached stdout — BENCH_r03.json
parsed:null): the single stdout JSON line now prints IMMEDIATELY after
the headline 256^3 segments.  Everything after it is a secondary that
logs to stderr (+ BENCH_EXTRAS.json), and each secondary is gated on a
global wall-clock deadline (env BENCH_DEADLINE, seconds from process
start) so the process exits 0 well inside the driver budget even from
a cold compilation cache.

The reference publishes no numbers (BASELINE.md), so vs_baseline is
measured against the self-established round-1 number recorded below.
"""

from __future__ import annotations

import json
import os
import sys
import time

# Self-established baseline (first TPU measurement of this harness,
# v5e single chip, 256^3, 20 red-black Jacobi iters). The DENOMINATOR
# stays fixed at the round-1 number even though the headline config is
# now the DCT projection (round 4) — vs_baseline remains "how far the
# 256^3 step has come since the first stable measurement".
BASELINE_CELL_UPDATES_PER_SEC = 1.31e8

_T0 = time.monotonic()
# Driver budget guard: secondaries are skipped once this many seconds
# have elapsed since process start.  Default keeps the whole run well
# inside typical external timeouts even when every kernel compiles
# fresh through the axon tunnel (13-250 s per compile).
_DEADLINE = float(os.environ.get("BENCH_DEADLINE", 900))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def remaining() -> float:
    return _DEADLINE - (time.monotonic() - _T0)


def budget(name: str, need: float) -> bool:
    """True if a secondary expected to take ``need`` seconds fits in
    the remaining deadline budget; logs the skip otherwise."""
    r = remaining()
    if r < need:
        log(f"[deadline] skipping {name}: needs ~{need:.0f}s, "
            f"{r:.0f}s left of BENCH_DEADLINE={_DEADLINE:.0f}")
        return False
    return True


def _arm_tunnel_watchdog(seconds=600):
    """The axon tunnel occasionally goes down for hours; `import jax`
    or jax.devices() then HANGS (no exception).  If the first device op
    hasn't completed within ``seconds``, print a fallback JSON line so
    the driver records an explained failure instead of a hung/empty
    bench, and exit."""
    import threading

    seconds = int(os.environ.get("BENCH_TUNNEL_TIMEOUT", seconds))

    armed = threading.Event()

    def watchdog():
        if not armed.wait(seconds):
            print(json.dumps({
                "metric": "cell_updates_per_sec_per_chip", "value": 0,
                "unit": "cell-updates/s/chip", "vs_baseline": 0.0,
                "error": ("TPU tunnel unreachable: jax.devices() did "
                          f"not respond within {seconds}s")}),
                flush=True)
            os._exit(3)

    threading.Thread(target=watchdog, daemon=True).start()
    return armed


def main():
    cpu = "--cpu" in sys.argv
    no_secondaries = "--no-secondaries" in sys.argv
    watchdog_ok = _arm_tunnel_watchdog(30 if cpu else 600)
    import jax
    import jax.numpy as jnp

    if cpu:
        # smoke-test mode (tests/test_bench_json.py): the sitecustomize
        # pins the axon backend, so env vars don't stick — force CPU
        # via the config API
        jax.config.update("jax_platforms", "cpu")
    # remote compiles through the axon tunnel take 13-250 s; the
    # persistent cache makes warm re-runs ~3 min total
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    n = 256
    steps = None
    warmup = 3
    for a in sys.argv[1:]:
        if a.startswith("--size="):
            n = int(a.split("=")[1])
        if a.startswith("--steps="):
            steps = int(a.split("=")[1])
    if steps is None:
        # segments end in a scalar-readback fence whose tunnel round
        # trip (25-50 ms) is inside the timed window — segments must be
        # long enough to amortize it (verify/bench_fence_cadence.py).
        # r5: the r4 windows (5 segments of 20 steps) still carried a
        # ~1.5-2 ms/step fence tax at 256^3 (~37 ms / 20 steps); 3
        # segments of 150 cut it to ~0.25 ms/step.  The tax is
        # measurement artifact, not chip time — production drivers
        # dispatch steps back-to-back without per-segment readbacks.
        steps = 450 if n <= 256 else 60

    from tpufluids.grid import stam

    dev = jax.devices()[0]
    watchdog_ok.set()
    log(f"device: {dev}, grid {n}^3, {steps} steps, "
        f"deadline {_DEADLINE:.0f}s")

    # dt keeps CFL <= 1 cell for the stencil advection backend.
    # HEADLINE config: spectral (DCT) projection — exact Poisson solve
    # on the MXU; faster AND ~6 orders more accurate than 20 red-black
    # Jacobi sweeps at 256^3 (see module docstring).
    base_kw = dict(n=n, dt=0.5 / n, jacobi_iters=20, red_black=True,
                   vorticity_eps=2.0, buoyancy_beta=0.5,
                   buoyancy_alpha=0.05, advect_mode="stencil")
    # dct_precision_first: the step's FIRST (pre-advection) projection
    # runs at the cheap bf16 tier; the post-advect solve — the one the
    # residual reports and every step ends on — stays "highest".  Even
    # the cheap tier's intermediate divergence (~1e-5) beats the
    # published Stam scheme's 20-Jacobi-sweep projection (2.2e-5).
    # Measured solve cost highest-radix vs default: 2.08 vs ~0.8 ms at
    # 256^3, 41.5 vs 15.3 at 512^3 (verify/bench_dct_radix_ab.py r5).
    cfg = stam.StamConfig(projection="dct",
                          dct_precision_first="default", **base_kw)

    def seeded(c):
        s = stam.make_grid3d(c)
        k = c.n // 8
        return s.replace(
            dens=s.dens.at[3 * k:5 * k, 3 * k:5 * k, 1:k].set(1.0),
            temp=s.temp.at[3 * k:5 * k, 3 * k:5 * k, 1:k].set(3.0))

    state = seeded(cfg)
    t0 = time.perf_counter()
    state, res = stam.run3d_python(state, cfg, warmup)
    float(jnp.sum(state.u))  # honest fence (block_until_ready is
    # unreliable through the axon tunnel)
    t_warm = time.perf_counter() - t0
    log(f"compile+warmup ({warmup} steps): {t_warm:.1f}s")

    # time in segments and report the median rate: the remote-compile
    # tunnel occasionally injects multi-second stalls that would
    # otherwise corrupt a single long measurement
    seg = max(steps // 3, 1)
    rates = []
    residual = None
    for _ in range(3):
        t0 = time.perf_counter()
        state, res = stam.run3d_python(state, cfg, seg)
        float(jnp.sum(state.u))
        rates.append((time.perf_counter() - t0) / seg)
        residual = float(res[-1])
    dt = sorted(rates)[1]

    cell_updates = n ** 3 / dt
    log(f"segment ms/step: {[round(r * 1e3, 1) for r in rates]}")
    log(f"median {dt * 1e3:.1f} ms/step; {cell_updates:.3e} "
        f"cell-updates/s/chip; residual {residual:.3e}")
    finite = bool(jnp.isfinite(state.dens).all()
                  and jnp.isfinite(state.u).all())
    log(f"fields finite: {finite}")

    # ---- THE one stdout JSON line: printed before any secondary so a
    # kill during the probes below can never strand the headline ------
    extra = {
        "ms_per_step": dt * 1e3,
        "poisson_residual": residual,
        "grid": n,
        "finite": finite,
        "projection": "dct",
    }
    print(json.dumps({
        "metric": "cell-updates/sec/chip @ 256^3 stable-fluids step "
                  "(spectral DCT projection, vorticity confinement, "
                  "buoyancy)",
        "value": cell_updates,
        "unit": "cell-updates/s",
        "vs_baseline": cell_updates / BASELINE_CELL_UPDATES_PER_SEC,
        "extra": extra,
    }), flush=True)

    if no_secondaries:
        return

    # ---- secondaries: stderr + BENCH_EXTRAS.json only ----------------
    # Each is wrapped (never crashes the process) and budget-gated.
    # "need" estimates assume a cold compile cache (the expensive case).

    if budget("jacobi continuity", 300):
        try:
            # the former headline config (red-black Jacobi x20), kept so
            # projection-solver regressions stay visible across rounds
            jcfg = stam.StamConfig(projection="jacobi", **base_kw)
            jstate = seeded(jcfg)
            jstate, jres = stam.run3d_python(jstate, jcfg, warmup)
            float(jnp.sum(jstate.u))
            jseg = max(seg, 100) if n <= 256 else seg
            t0 = time.perf_counter()
            jstate, jres = stam.run3d_python(jstate, jcfg, jseg)
            float(jnp.sum(jstate.u))
            extra["jacobi_ms_per_step"] = round(
                (time.perf_counter() - t0) / jseg * 1e3, 2)
            extra["jacobi_poisson_residual"] = float(jres[-1])
            log(f"jacobi continuity: {extra['jacobi_ms_per_step']} "
                f"ms/step, residual "
                f"{extra['jacobi_poisson_residual']:.3e}")
        except Exception as e:
            log(f"jacobi secondary bench skipped: {e}")

    # the reference's own two scenes (SPH), Pallas backend — plus the
    # merge-enabled tank (in-kernel partner search,
    # FluidGPU-unidyn.cu:261-275) and the sharded SPH step on one chip
    if budget("SPH scenes", 240):
        try:
            from tpufluids.config import BASE_CONFIG, UNIDYN_CONFIG
            from tpufluids.scenes import base_dam, unidyn_tank
            from tpufluids.step import run_python
            for sname, scfg, scene in (("base_dam_8000p", BASE_CONFIG,
                                        base_dam),
                                       ("base_dam_sort_every8",
                                        BASE_CONFIG.replace(
                                            sort_every=8),
                                        base_dam),
                                       ("unidyn_tank_14040p",
                                        UNIDYN_CONFIG, unidyn_tank),
                                       ("unidyn_tank_merge_on",
                                        UNIDYN_CONFIG.replace(
                                            merge_dist=0.06),
                                        unidyn_tank)):
                s = scene(scfg)
                s, m = run_python(s, scfg, 2)
                float(s.pos[0, 0])
                best = None
                for _ in range(2):   # min-of-2: congestion spikes
                    t0 = time.perf_counter()
                    s, m = run_python(s, scfg, 300)
                    float(s.pos[0, 0])
                    dt_ = (time.perf_counter() - t0) / 300 * 1e3
                    best = dt_ if best is None else min(best, dt_)
                extra[sname + "_ms_per_step"] = round(best, 2)
                log(f"SPH {sname}: "
                    f"{extra[sname + '_ms_per_step']} ms/step")
        except Exception as e:
            log(f"SPH secondary bench skipped: {e}")

    if budget("sharded SPH 1-chip", 180):
        try:
            # sharded SPH on ONE chip (solver-unidyn.cu:396-470's
            # decomposition): per-step overhead vs the unsharded dam
            from tpufluids.config import BASE_CONFIG
            from tpufluids.scenes import base_dam
            from tpufluids.shard import make_mesh
            from tpufluids.shard.particles import (distribute,
                                                   make_sharded_step)
            mesh1 = make_mesh(1)
            scfg = BASE_CONFIG
            s = base_dam(scfg)
            sh = distribute(s, mesh1, scfg, s.capacity)
            stepn = make_sharded_step(mesh1, scfg, n_steps=300)
            sh, ms = stepn(sh)
            float(ms.max_speed)
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                sh, ms = stepn(sh)
                float(ms.max_speed)
                dt_ = (time.perf_counter() - t0) / 300 * 1e3
                best = dt_ if best is None else min(best, dt_)
            extra["sph_sharded_1chip_ms"] = round(best, 2)
            log(f"SPH sharded(1 chip) base_dam: "
                f"{extra['sph_sharded_1chip_ms']} ms/step")
        except Exception as e:
            log(f"sharded SPH secondary bench skipped: {e}")

    # the remaining BASELINE.json configs (1: 2D smoke box, 2: 64^3
    # step, 4: buoyant plume, 5: sharded path on this one chip) so
    # regressions there are driver-visible
    if budget("BASELINE configs 1/2/4", 200):
        try:
            c1 = stam.StamConfig(n=128, dt=0.1, diff=1e-5, visc=1e-5,
                                 jacobi_iters=20, advect_mode="stencil")
            s1 = stam.make_grid2d(c1)
            src = jnp.zeros((130, 130), jnp.float32
                            ).at[60:68, 4:8].set(5.0)
            fv = jnp.zeros_like(src).at[60:68, 4:8].set(2.0)
            sources = {"dens": src, "fv": fv}
            s1 = stam.run2d_python(s1, c1, 3, sources=sources)
            float(s1.dens[1, 1])
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                s1 = stam.run2d_python(s1, c1, 400, sources=sources)
                float(s1.dens[1, 1])
                dt_ = (time.perf_counter() - t0) / 400 * 1e3
                best = dt_ if best is None else min(best, dt_)
            extra["config1_smoke2d_128_ms"] = round(best, 2)

            for key, kw in (("config2_grid3d_64_ms", {}),
                            ("config4_plume3d_64_ms",
                             dict(buoyancy_alpha=0.05, buoyancy_beta=1.0,
                                  vorticity_eps=2.0))):
                c = stam.StamConfig(n=64, dt=0.05, diff=1e-5, visc=1e-5,
                                    jacobi_iters=20, red_black=True,
                                    advect_mode="stencil", **kw)
                s3 = stam.make_grid3d(c)
                s3 = s3.replace(
                    dens=s3.dens.at[24:40, 24:40, 1:9].set(1.0),
                    temp=s3.temp.at[24:40, 24:40, 1:9].set(3.0))
                s3, _ = stam.run3d_python(s3, c, 3)
                float(jnp.sum(s3.u))
                best = None
                for _ in range(2):
                    t0 = time.perf_counter()
                    s3, _ = stam.run3d_python(s3, c, 400)
                    float(jnp.sum(s3.u))
                    dt_ = (time.perf_counter() - t0) / 400 * 1e3
                    best = dt_ if best is None else min(best, dt_)
                extra[key] = round(best, 2)
            log("BASELINE configs 1/2/4: "
                + str({k: extra[k] for k in
                       ("config1_smoke2d_128_ms", "config2_grid3d_64_ms",
                        "config4_plume3d_64_ms") if k in extra}))
        except Exception as e:
            log(f"BASELINE-config secondary bench skipped: {e}")

    if budget("config5 sharded grid", 180):
        try:
            # config 5 proxy: the sharded step on ONE chip at the
            # headline size (real multi-chip needs hardware this
            # environment lacks); gap vs unsharded = sharding overhead
            from tpufluids.shard import grid_sharded, make_mesh
            mesh = make_mesh(1)
            s5 = grid_sharded.shard_state(
                grid_sharded.to_sharded_layout(state), mesh)
            step5 = grid_sharded.make_sharded_step(mesh, cfg,
                                                   n_steps=seg)
            s5, r5 = step5(s5)
            float(jnp.sum(s5.u))
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                s5, r5 = step5(s5)
                float(jnp.sum(s5.u))
                dt_ = (time.perf_counter() - t0) / seg * 1e3
                best = dt_ if best is None else min(best, dt_)
            extra["config5_sharded_1chip_ms"] = round(best, 2)
            log(f"config5 sharded(1 chip) {n}^3: "
                f"{extra['config5_sharded_1chip_ms']} ms/step, "
                f"residual {float(r5):.3e}")
        except Exception as e:
            log(f"sharded secondary bench skipped: {e}")

    # 512^3 segment (the scaling axis of BASELINE config 5): fresh
    # compiles for this probe can take minutes, which is what killed
    # round 3 — it now runs LAST, only with generous budget left, and
    # only when the tunnel compiler is healthy: 512-sized Pallas
    # kernels never hit the cross-process compilation cache, and a
    # congested remote compiler was measured taking 300-950 s PER
    # KERNEL (r4, verify/bench_stages_tail.py) — a single blocking
    # compile cannot be interrupted by the deadline, so the
    # headline's own compile+warmup time is the health proxy
    if n == 256 and t_warm < 120 and budget("512^3 probe", 600):
        try:
            c512 = cfg.replace(n=512, dt=0.5 / 512)
            s512 = seeded(c512)
            s512, _ = stam.run3d_python(s512, c512, 2)
            float(jnp.sum(s512.u))
            t0 = time.perf_counter()
            s512, r512 = stam.run3d_python(s512, c512, 24)
            float(jnp.sum(s512.u))
            ms512 = (time.perf_counter() - t0) / 24 * 1e3
            extra["grid512_ms_per_step"] = round(ms512, 1)
            extra["grid512_cell_updates_per_sec"] = round(
                512 ** 3 / ms512 * 1e3)
            log(f"512^3 (dct): {ms512:.1f} ms/step = "
                f"{extra['grid512_cell_updates_per_sec']:.3e} "
                f"cell-updates/s, residual {float(r512[-1]):.3e}")
            del s512
        except Exception as e:
            log(f"512^3 secondary bench skipped: {e}")

    # full extras live here (stdout already carried the headline line)
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_EXTRAS.json"), "w") as f:
            json.dump({"value": cell_updates, "extra": extra}, f,
                      indent=1)
    except OSError as e:
        log(f"could not write BENCH_EXTRAS.json: {e}")
    log("extras: " + json.dumps(extra))


if __name__ == "__main__":
    main()

"""Default-plan per-stage times of the 3D step at any grid size (the
exact calls stam.step3d makes on the zg layout) — one parameterized
probe replacing the bench_stages256/bench_stages512c near-duplicates
(ADVICE r3).  Run at 256 and 512 to locate the 512^3 per-cell-rate
gap: a stage whose 512^3 time exceeds 8x its 256^3 time is where the
gap lives.  Includes the spectral (DCT) projection solve — the
headline configuration since round 4.

    python verify/bench_stages.py [n ...]     (default: 256 512)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from tpufluids.grid import pallas_kernels as pk
from tpufluids.grid import stam


def timeit(name, fn, reps=16):
    """``reps`` is a floor; the actual rep count is raised so each
    timed window is >= ~0.8 s — the final-fence tunnel round trip is
    25-50 ms, so 16 reps of a 2 ms stage would otherwise measure the
    fence (the r5 roofline lesson, verify/bench_roofline.py)."""
    try:
        t0 = time.perf_counter()
        r = fn()
        x = r[0] if isinstance(r, tuple) else r
        float(jnp.ravel(x)[0])
        tc = time.perf_counter() - t0
        # calibrate with the floor rep count
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn()
        x = r[0] if isinstance(r, tuple) else r
        float(jnp.ravel(x)[0])
        est = max((time.perf_counter() - t0 - 0.04) / reps, 5e-5)
        reps = max(reps, int(min(0.8 / est, 4000)))
        acc = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(reps):
                r = fn()
            x = r[0] if isinstance(r, tuple) else r
            float(jnp.ravel(x)[0])
            acc.append((time.perf_counter() - t0) / reps * 1e3)
        med = sorted(acc)[1]
        print(f"{name:44s} {med:8.2f} ms  {[round(a, 2) for a in acc]}"
              f"  (reps {reps}, compile+1st {tc:.1f}s)", flush=True)
        return med
    except Exception as e:
        print(f"{name:44s} FAIL {str(e)[:140]}", flush=True)
        return None


def run(n, reps):
    y_true = z_true = n + 2
    yp, zp = pk.zg_extents(y_true, z_true)
    te = (y_true, z_true)
    print(f"--- n={n} zg extents yp={yp} zp={zp}", flush=True)

    key = jax.random.PRNGKey(0)
    u, v, w, d, t_ = (
        pk.zg_pad(jax.random.normal(jax.random.fold_in(key, i),
                                    (n + 2,) * 3, jnp.float32) * 0.1,
                  yp, zp)
        for i in range(5))

    scal = dict(dt=0.5 / n, h=1.0 / n, eps=2.0, b_alpha=0.05,
                b_beta=0.5, t_amb=0.0)
    tot_jac, tot_dct = 0.0, 0.0

    def add(ms, jac=True, dct=True):
        nonlocal tot_jac, tot_dct
        if ms is not None:
            tot_jac += ms if jac else 0.0
            tot_dct += ms if dct else 0.0

    forcing = jax.jit(lambda u, v, w, d, t_: pk.forcing3d_pallas(
        u, v, w, d, t_, scal["dt"], scal["h"], scal["eps"],
        scal["b_alpha"], scal["b_beta"], scal["t_amb"], tx=16,
        true_extents=te))
    add(timeit("forcing tx=16 (step3d default)",
               lambda: forcing(u, v, w, d, t_), reps))

    divf = jax.jit(lambda u, v, w: pk.div3d_pallas(u, v, w,
                                                   true_extents=te))
    # the step projects twice (post-forcing and post-advection)
    add(timeit("div auto (x2 per step)", lambda: divf(u, v, w), reps))
    add(timeit("div auto (second projection)",
               lambda: divf(u, v, w), reps))
    div = divf(u, v, w)

    tx0, fuse0, pipe0 = pk.rb_packed_plan(div.shape, 20)
    print(f"rb_packed_plan: tx={tx0} fuse={fuse0} pipe={pipe0}",
          flush=True)
    solve = jax.jit(lambda dd: pk.lin_solve3d_rb_packed(
        0, jnp.zeros_like(dd), dd, 1.0, 6.0, 20, tx=tx0, fuse=fuse0,
        pipeline=pipe0, true_extents=te))
    ms = timeit("solve20 auto plan (x2 per step)",
                lambda: solve(div), reps)
    add(ms, dct=False)
    add(ms, dct=False)
    p_sol = solve(div)

    cfg = stam.StamConfig(n=n, projection="dct")
    dct = jax.jit(lambda dd: stam.dct_solve3d_zg(dd, cfg, te))
    ms = timeit("dct solve zg (x2 per step)", lambda: dct(div), reps)
    add(ms, jac=False)
    add(ms, jac=False)

    grads = jax.jit(lambda p, u, v, w: pk.gradsub3d_pallas(
        p, u, v, w, true_extents=te))
    add(timeit("gradsub auto (x2 per step)",
               lambda: grads(p_sol, u, v, w), reps))
    add(timeit("gradsub (second projection)",
               lambda: grads(p_sol, u, v, w), reps))

    adv = jax.jit(lambda u, v, w: pk.advect3d_multi_pallas(
        (u, v, w), (1, 2, 3), u, v, w, 0.5, self_advect=True,
        true_extents=te))
    add(timeit("advect uvw auto", lambda: adv(u, v, w), reps))

    adv2 = jax.jit(lambda d, t_, u, v, w: pk.advect3d_multi_pallas(
        (d, t_), (0, 0), u, v, w, 0.5, true_extents=te))
    add(timeit("advect dens/temp auto", lambda: adv2(d, t_, u, v, w),
               reps))
    print(f"stage-sum: jacobi-config {tot_jac:.2f} ms, "
          f"dct-config {tot_dct:.2f} ms", flush=True)


sizes = [int(a) for a in sys.argv[1:]] or [256, 512]
for n in sizes:
    run(n, reps=16 if n <= 256 else 8)
print("DONE", flush=True)

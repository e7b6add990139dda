"""Default-plan per-stage times of the 3D step at 256^3 (the exact
calls stam.step3d makes on the zg layout) — the comparison row for
bench_stages512b.py's 512^3 numbers: a stage whose 512^3 time exceeds
8x its time here is where the 512^3 per-cell-rate gap lives.

    python verify/bench_stages256.py [n]
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

n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
y_true = z_true = n + 2
yp, zp = pk.zg_extents(y_true, z_true)
te = (y_true, z_true)
print(f"n={n} zg extents yp={yp} zp={zp}", flush=True)

key = jax.random.PRNGKey(0)
u, v, w, d, t_ = (
    pk.zg_pad(jax.random.normal(jax.random.fold_in(key, i),
                                (n + 2,) * 3, jnp.float32) * 0.1, yp, zp)
    for i in range(5))

scal = dict(dt=0.5 / n, h=1.0 / n, eps=2.0, b_alpha=0.05, b_beta=0.5,
            t_amb=0.0)


def timeit(name, fn, reps=16):
    try:
        t0 = time.perf_counter()
        r = fn()
        x = r[0] if isinstance(r, tuple) else r
        float(jnp.ravel(x)[0])
        tc = time.perf_counter() - t0
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
              f"  (compile+1st {tc:.1f}s)", flush=True)
        return med
    except Exception as e:
        print(f"{name:44s} FAIL {str(e)[:140]}", flush=True)
        return None


forcing = jax.jit(lambda u, v, w, d, t_: pk.forcing3d_pallas(
    u, v, w, d, t_, scal["dt"], scal["h"], scal["eps"],
    scal["b_alpha"], scal["b_beta"], scal["t_amb"], tx=16,
    true_extents=te))
timeit("forcing tx=16 (step3d default)", lambda: forcing(u, v, w, d, t_))

divf = jax.jit(lambda u, v, w: pk.div3d_pallas(u, v, w,
                                               true_extents=te))
timeit("div auto", lambda: divf(u, v, w))
div = divf(u, v, w)

tx0, fuse0, pipe0 = pk.rb_packed_plan(div.shape, 20)
print(f"rb_packed_plan: tx={tx0} fuse={fuse0} pipe={pipe0}", flush=True)
solve = jax.jit(lambda dd: pk.lin_solve3d_rb_packed(
    0, jnp.zeros_like(dd), dd, 1.0, 6.0, 20, tx=tx0, fuse=fuse0,
    pipeline=pipe0, true_extents=te))
timeit("solve20 auto plan", lambda: solve(div))
p_sol = solve(div)

grads = jax.jit(lambda p, u, v, w: pk.gradsub3d_pallas(
    p, u, v, w, true_extents=te))
timeit("gradsub auto", lambda: grads(p_sol, u, v, w))

adv = jax.jit(lambda u, v, w: pk.advect3d_multi_pallas(
    (u, v, w), (1, 2, 3), u, v, w, 0.5, self_advect=True,
    true_extents=te))
timeit("advect uvw auto", lambda: adv(u, v, w))

adv2 = jax.jit(lambda d, t_, u, v, w: pk.advect3d_multi_pallas(
    (d, t_), (0, 0), u, v, w, 0.5, true_extents=te))
timeit("advect dens/temp auto", lambda: adv2(d, t_, u, v, w))
print("DONE", flush=True)

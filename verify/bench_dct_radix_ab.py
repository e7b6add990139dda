"""A/B the DCT projection's radix-2 split (StamConfig.dct_radix_min)
and MXU precision at the solve level, interleaved in ONE process
(CLAUDE.md: tunnel variance demands same-process A/B).

The spectral solve's matmul work grows n^4 while cells grow n^3, so
512^3 pays ~2x the per-cell transform cost of 256^3.  One radix-2
level (fold + half-size DCT-II/DCT-IV blocks, stam._dct_solve_interior)
halves the MXU FLOPs per axis at the cost of fold/unfold VPU passes;
this probe locates the crossover and the residual cost of the bf16
precision tiers.

    python verify/bench_dct_radix_ab.py [n ...]   (default 256 512)
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


def timeit(name, fn, reps=8):
    r = fn()
    float(jnp.ravel(r)[0])
    acc = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn()
        float(jnp.ravel(r)[0])
        acc.append((time.perf_counter() - t0) / reps * 1e3)
    med = sorted(acc)[1]
    print(f"{name:52s} {med:8.2f} ms  {[round(a, 2) for a in acc]}",
          flush=True)
    return med


def run(n):
    y_true = z_true = n + 2
    yp, zp = pk.zg_extents(y_true, z_true)
    te = (y_true, z_true)
    print(f"--- n={n} zg extents yp={yp} zp={zp}", flush=True)

    key = jax.random.PRNGKey(0)
    u, v, w = (pk.zg_pad(
        jax.random.normal(jax.random.fold_in(key, i),
                          (n + 2,) * 3, jnp.float32) * 0.1, yp, zp)
        for i in range(3))
    div = jax.jit(lambda u, v, w: pk.div3d_pallas(u, v, w,
                                                  true_extents=te)
                  )(u, v, w)

    def residual(p, dd):
        # max |(6p - sum_nb p) - dd| on the stored interior, via the
        # same packed residual the bench reports (mean-free rhs)
        zi = z_true - 2
        pi = p[1:-1, 1:y_true - 1, :zi]
        lap = (6 * pi
               - p[2:, 1:y_true - 1, :zi] - p[:-2, 1:y_true - 1, :zi]
               - p[1:-1, 2:y_true, :zi] - p[1:-1, :y_true - 2, :zi]
               - jnp.roll(pi, -1, 2).at[:, :, -1].set(pi[:, :, -1])
               - jnp.roll(pi, 1, 2).at[:, :, 0].set(pi[:, :, 0]))
        rhs = dd[1:-1, 1:y_true - 1, :zi]
        rhs = rhs - jnp.mean(rhs)
        return float(jnp.max(jnp.abs(lap - rhs)))

    fns, meds = {}, {}
    # (precision, radix_min, radix_levels); levels > 1 recurse the
    # split on the even branch (r5, stam._dct2_split_fwd) — only
    # meaningful where the split itself wins (the "highest" tier)
    variants = [("highest", 0, 1), ("highest", n, 1), ("highest", n, 2),
                ("highest", n, 3),
                ("high", 0, 1), ("high", n, 1),
                ("default", 0, 1), ("default", n, 1)]
    for prec, rmin, lv in variants:
        cfg = stam.StamConfig(n=n, projection="dct",
                              dct_precision=prec, dct_radix_min=rmin,
                              dct_radix_levels=lv)
        fns[(prec, rmin, lv)] = jax.jit(
            lambda dd, cfg=cfg: stam.dct_solve3d_zg(dd, cfg, te))
        fns[(prec, rmin, lv)](div)  # compile
    for rep in range(2):  # interleave
        for k, f in fns.items():
            meds[k] = timeit(
                f"n={n} dct solve prec={k[0]:8s} radix={k[1]} lv={k[2]}",
                lambda f=f: f(div))
    for k, f in fns.items():
        print(f"n={n} prec={k[0]:8s} radix={k[1]} lv={k[2]}: residual "
              f"{residual(f(div), div):.3e}", flush=True)


for n in ([int(a) for a in sys.argv[1:]] or [256, 512]):
    run(n)
print("DONE", flush=True)

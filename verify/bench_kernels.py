"""Per-kernel cost breakdown for the 256^3 grid step on the real TPU.

Times each Pallas kernel of the bench workload independently so tuning
targets the real bottleneck. Usage:
    python verify/bench_kernels.py [--size=256] [--reps=30]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(name, fn, *args, reps=30):
    out = fn(*args)
    fence = out[0] if isinstance(out, tuple) else out
    float(jnp.ravel(fence)[0])  # compile + fence
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    fence = out[0] if isinstance(out, tuple) else out
    float(jnp.ravel(fence)[0])
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:48s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    n = 256
    reps = 30
    for a in sys.argv[1:]:
        if a.startswith("--size="):
            n = int(a.split("=")[1])
        if a.startswith("--reps="):
            reps = int(a.split("=")[1])
    print(f"device {jax.devices()[0]}, n={n}", flush=True)

    from tpufluids.grid import pallas_kernels as pk

    key = jax.random.PRNGKey(0)
    shape = (n + 2,) * 3
    u, v, w, d, t_, x, x0 = (jax.random.normal(jax.random.fold_in(key, i),
                                               shape, jnp.float32)
                             for i in range(7))

    dt = 0.5 / n
    h = 1.0 / n

    only = [a.split("=")[1] for a in sys.argv[1:]
            if a.startswith("--only=")]
    pairs = [a.split("=")[1] for a in sys.argv[1:]
             if a.startswith("--pairs=")]
    if pairs:
        for spec in pairs[0].split(","):
            parts = spec.split(":")
            tx, fuse = int(parts[0]), int(parts[1])
            pipe = len(parts) > 2 and parts[2] == "p"
            try:
                timeit(f"rb_packed 20 iters (tx={tx}, fuse={fuse}, "
                       f"pipe={pipe})",
                       lambda tx=tx, fuse=fuse, pipe=pipe:
                       pk.lin_solve3d_rb_packed(
                           0, x, x0, 1.0, 6.0, 20, tx=tx, fuse=fuse,
                           pipeline=pipe),
                       reps=reps)
            except Exception as e:
                print(f"  tx={tx} fuse={fuse}: {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
        return

    if only and "advect" in only:
        for tx in (4, 8, 16, 32):
            try:
                timeit(f"advect3d_multi uvw (tx={tx})",
                       lambda tx=tx: pk.advect3d_multi_pallas(
                           (u, v, w), (1, 2, 3), u, v, w, dt * n, tx=tx),
                       reps=reps)
            except Exception as e:
                print(f"  advect tx={tx}: {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
        return

    if only and "solver" in only:
        for tx in (16, 24):
            for fuse in (1, 2, 4, 5):
                if 20 % fuse:
                    continue
                try:
                    timeit(f"rb_packed 20 iters (tx={tx}, fuse={fuse})",
                           lambda tx=tx, fuse=fuse:
                           pk.lin_solve3d_rb_packed(
                               0, x, x0, 1.0, 6.0, 20, tx=tx, fuse=fuse),
                           reps=reps)
                except Exception as e:
                    print(f"  tx={tx} fuse={fuse}: {type(e).__name__}: "
                          f"{str(e)[:120]}", flush=True)
        return

    timeit("forcing3d_pallas (piped, tx=16)",
           lambda: pk.forcing3d_pallas(u, v, w, d, t_, dt, h, 2.0, 0.05,
                                       0.5, 0.0, tx=16), reps=reps)
    timeit("div3d_pallas (piped, default)",
           lambda: pk.div3d_pallas(u, v, w), reps=reps)
    timeit("gradsub3d_pallas (piped, default)",
           lambda: pk.gradsub3d_pallas(x, u, v, w), reps=reps)
    timeit("advect3d_multi (uvw, piped, default)",
           lambda: pk.advect3d_multi_pallas((u, v, w), (1, 2, 3), u, v, w,
                                            dt * n), reps=reps)
    timeit("advect3d_multi (uvw, self_advect)",
           lambda: pk.advect3d_multi_pallas((u, v, w), (1, 2, 3), u, v, w,
                                            dt * n, self_advect=True),
           reps=reps)
    timeit("advect3d_multi (dens+temp, piped, default)",
           lambda: pk.advect3d_multi_pallas((d, t_), (0, 0), u, v, w,
                                            dt * n), reps=reps)


if __name__ == "__main__":
    main()

"""A/B the fused forcing kernel at 512^3: auto plan (tx=2, 3x read
redundancy) vs y-tiled windows (hy=2).  Interleaved, one process.

    python verify/bench_forcing512.py [n]
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

n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
shape = (n + 2,) * 3
ks = jax.random.split(jax.random.PRNGKey(0), 5)
u, v, w, d, t = (jax.random.normal(k, shape, jnp.float32) * 0.1
                 for k in ks)
args = (u, v, w, d, t)
# dt/h/eps/buoyancy params are STATIC in forcing3d_pallas (Python
# branches on them) — close over them instead of passing through jit.
scal = dict(dt=0.001, h=1.0 / n, eps=2.0, b_alpha=0.05, b_beta=0.5,
            t_amb=0.0)

CANDS = [("auto", dict()),
         ("tx=16 ty=128", dict(tx=16, ty=128)),
         ("tx=8 ty=128", dict(tx=8, ty=128)),
         ("tx=16 ty=256", dict(tx=16, ty=256)),
         ("tx=32 ty=64", dict(tx=32, ty=64))]

fns, ref = {}, None
for name, kw in CANDS:
    try:
        f = jax.jit(lambda *a, kw=kw: pk.forcing3d_pallas(
            *a, **scal, **kw))
        r = f(*args)
        if ref is None:
            ref = r
        else:
            dm = max(float(jnp.max(jnp.abs(x - y)))
                     for x, y in zip(r, ref))
            if dm != 0.0:
                print(f"{name}: NOT bit-compatible, {dm}", flush=True)
                continue
        fns[name] = f
        print(f"{name:14s} compiled", flush=True)
    except Exception as e:
        print(f"{name:14s} FAIL {str(e)[:120]}", flush=True)

acc = {k: [] for k in fns}
for _ in range(3):
    for name, f in fns.items():
        r = f(*args)
        float(r[0][1, 1, 1])
        t0 = time.perf_counter()
        for _ in range(10):
            r = f(*args)
        float(r[0][1, 1, 1])
        acc[name].append((time.perf_counter() - t0) / 10 * 1e3)
for name, ts in acc.items():
    print(f"{name:14s} {sorted(ts)[1]:8.2f} ms (runs "
          f"{[round(x, 2) for x in ts]})", flush=True)

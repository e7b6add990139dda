"""A/B deeper fuse plans for the packed red-black solver at 256^3
(VERDICT r2 item 7: fuse was only swept over (4,2,1); prove or beat
the 24-25 ms headline's projection floor).

fuse must divide iters=20: candidates 5, 10, 20.  Deep fuse trades
halo-recompute (sum_{s<fuse} 2s extra plane-sweeps per tile) for fewer
HBM exchange passes (20/fuse).  Run on the real chip, one process,
interleaved:

    python verify/bench_rb256_deep.py [n]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
from tpufluids.grid import pallas_kernels as pk

n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
shape = (n + 2,) * 3
x0 = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
z = jnp.zeros(shape, jnp.float32)

print("auto plan:", pk.rb_packed_plan(shape, 20), flush=True)

CANDS = [
    ("auto", None),
    ("tx=32 fuse=4 pipe", (32, 4, True)),
    ("tx=24 fuse=5 pipe", (24, 5, True)),
    ("tx=16 fuse=5 pipe", (16, 5, True)),
    ("tx=16 fuse=10 pipe", (16, 10, True)),
    ("tx=24 fuse=10 serial", (24, 10, False)),
    ("tx=16 fuse=10 serial", (16, 10, False)),
    # tx=16 fuse=20 serial dropped: its remote compile alone exceeded
    # 25 minutes (40 half-sweeps unrolled per tile) and timed out the
    # whole probe battery
]

fns = {}
for name, plan in CANDS:
    if plan is None:
        fns[name] = jax.jit(lambda x0: pk.lin_solve3d_rb_packed(
            0, z, x0, 1.0, 6.0, 20))
    else:
        tx, fuse, pipe = plan
        fns[name] = jax.jit(
            lambda x0, tx=tx, fuse=fuse, pipe=pipe:
            pk.lin_solve3d_rb_packed(0, z, x0, 1.0, 6.0, 20, tx=tx,
                                     fuse=fuse, pipeline=pipe))

ref = None
alive = []
for name, _ in CANDS:
    try:
        r = fns[name](x0)
        float(r[1, 1, 1])
        if ref is None:
            ref = np.asarray(r)
        else:
            err = np.abs(np.asarray(r) - ref).max()
            print(f"{name}: max abs diff vs auto {err:.2e}", flush=True)
        alive.append(name)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:140]}", flush=True)

res = {}
for rep in range(3):
    for name in alive:
        t0 = time.perf_counter()
        for _ in range(10):
            r = fns[name](x0)
        float(r[1, 1, 1])
        res.setdefault(name, []).append(
            (time.perf_counter() - t0) / 10 * 1e3)
for name in alive:
    v = res[name]
    print(f"{name:24s} {min(v):8.2f} ms  {v}", flush=True)

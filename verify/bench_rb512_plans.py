"""A/B the packed red-black solver plans at 512^3 (one process,
interleaved — tunnel variance is +-10-15%).

rb_packed_plan picks tx=8/fuse=2 at 512^3 under the 70 MB advisory
budget (2.0x window redundancy, 10 exchange passes for 20 iters vs the
256^3 plan's 1.67x / 5).  Candidates probe whether a larger budget
(tx up to ~15 at fuse=2) or a deeper fuse at sub-8 tiles (tx=7/fuse=4,
rejected by the tx>=8 gate) buys real time, or whether the hard
vmem_limit bites first.  Run on the real chip:

    python verify/bench_rb512_plans.py [n]
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
x0 = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
z = jnp.zeros(shape, jnp.float32)

print("auto plan:", pk.rb_packed_plan(shape, 20), flush=True)

CANDS = [
    ("auto", None),
    ("tx=8 fuse=2", (8, 2, True)),
    ("tx=12 fuse=2", (12, 2, True)),
    ("tx=15 fuse=2", (15, 2, True)),
    ("tx=7 fuse=4", (7, 4, True)),
    ("tx=6 fuse=4", (6, 4, True)),
    ("tx=23 fuse=1", (23, 1, True)),
    # single-slot windows fit ~2x the planes: deep fuse without the
    # double-buffer cost, trading DMA/compute overlap for less
    # redundant window traffic (0.75 vs 1.5 HBM passes/iter)
    ("tx=16 fuse=4 serial", (16, 4, False)),
    ("tx=24 fuse=4 serial", (24, 4, False)),
    ("tx=16 fuse=2 serial", (16, 2, False)),
    # (x, packed-y)-tiled windows: big tx at small plane footprint.
    # fuse=2/ty=128: VPU redundancy (23+8)/23 * 136/128 = 1.43 vs the
    # auto plan's 2.0; fuse=4/ty=128: HBM 0.88 passes/iter vs 1.5
    ("tx=23 fuse=2 ty=128", (23, 2, True, 128)),
    ("tx=24 fuse=1 ty=128", (24, 1, True, 128)),
    ("tx=13 fuse=4 ty=128", (13, 4, True, 128)),
    ("tx=23 fuse=2 ty=64", (23, 2, True, 64)),
]

fns, ref = {}, None
for name, plan in CANDS:
    kw = {} if plan is None else dict(tx=plan[0], fuse=plan[1],
                                      pipeline=plan[2])
    if plan is not None and len(plan) > 3:
        kw["ty"] = plan[3]
    try:
        f = jax.jit(lambda x0, kw=kw: pk.lin_solve3d_rb_packed(
            0, z, x0, 1.0, 6.0, 20, x_zero=True, **kw))
        r = f(x0)
        s = float(jnp.sum(r))
        if ref is None:
            ref = r
        else:
            d = float(jnp.max(jnp.abs(r - ref)))
            if d != 0.0:
                print(f"{name}: NOT bit-compatible, max|diff|={d}",
                      flush=True)
                continue
        fns[name] = f
        print(f"{name:16s} compiled, sum={s:.6e}", flush=True)
    except Exception as e:
        print(f"{name:16s} FAIL {str(e)[:120]}", flush=True)

# interleaved timing: 3 rounds of every candidate
acc = {k: [] for k in fns}
for _ in range(3):
    for name, f in fns.items():
        r = f(x0)
        float(r[1, 1, 1])        # fence
        t0 = time.perf_counter()
        for _ in range(5):
            r = f(x0)
        float(r[1, 1, 1])
        acc[name].append((time.perf_counter() - t0) / 5 * 1e3)
for name, ts in acc.items():
    print(f"{name:16s} {sorted(ts)[1]:8.2f} ms  (runs: "
          f"{[round(t, 1) for t in ts]})", flush=True)

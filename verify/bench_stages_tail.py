"""The tail stages of the 3D step (gradsub + both advections) at a
given size — split out of bench_stages.py so the expensive 512^3
solver compiles aren't re-paid when only these numbers are missing
(each fused 512^3 Pallas solver compile costs 15+ minutes through the
axon tunnel and does not persist in the compilation cache).

    python verify/bench_stages_tail.py [n]     (default 512)
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


def timeit(name, fn, reps=8):
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


n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
y_true = z_true = n + 2
yp, zp = pk.zg_extents(y_true, z_true)
te = (y_true, z_true)
print(f"--- n={n} zg extents yp={yp} zp={zp}", flush=True)

key = jax.random.PRNGKey(0)
u, v, w, d, t_, p = (
    pk.zg_pad(jax.random.normal(jax.random.fold_in(key, i),
                                (n + 2,) * 3, jnp.float32) * 0.1,
              yp, zp)
    for i in range(6))

grads = jax.jit(lambda p, u, v, w: pk.gradsub3d_pallas(
    p, u, v, w, true_extents=te))
timeit("gradsub auto (x2 per step)", lambda: grads(p, u, v, w))

adv = jax.jit(lambda u, v, w: pk.advect3d_multi_pallas(
    (u, v, w), (1, 2, 3), u, v, w, 0.5, self_advect=True,
    true_extents=te))
timeit("advect uvw auto", lambda: adv(u, v, w))

adv2 = jax.jit(lambda d, t_, u, v, w: pk.advect3d_multi_pallas(
    (d, t_), (0, 0), u, v, w, 0.5, true_extents=te))
timeit("advect dens/temp auto", lambda: adv2(d, t_, u, v, w))
print("DONE", flush=True)

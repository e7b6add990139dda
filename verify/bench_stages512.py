"""Per-stage breakdown of the 3D step at 512^3 (zg layout, the exact
calls stam.step3d makes), with tile-plan A/B candidates per stage —
interleaved in ONE process (tunnel variance is +-10-15% across runs).

The step at 512^3 is: forcing -> project (div+solve20+gradsub) ->
advect uvw -> project -> advect dens/temp.  bench.py measures the
whole step; this probe attributes the time.

    python verify/bench_stages512.py [n]
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


def timeit(name, fn, reps=8):
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


# --- forcing ---------------------------------------------------------
for tag, kw in (("auto(ty->128,tx<=16)", dict(tx=16)),
                ("ty=256 tx=16", dict(tx=16, ty=256)),
                ("ty=64 tx=16", dict(tx=16, ty=64)),
                ("ty=128 tx=8", dict(tx=8, ty=128)),
                ("ty=128 tx=32", dict(tx=32, ty=128))):
    f = jax.jit(lambda u, v, w, d, t_, kw=kw: pk.forcing3d_pallas(
        u, v, w, d, t_, scal["dt"], scal["h"], scal["eps"],
        scal["b_alpha"], scal["b_beta"], scal["t_amb"],
        true_extents=te, **kw))
    timeit(f"forcing {tag}", lambda f=f: f(u, v, w, d, t_))

# --- divergence ------------------------------------------------------
for tag, kw in (("auto", dict()), ("tx=16", dict(tx=16)),
                ("ty=128 tx=32", dict(tx=32, ty=128))):
    f = jax.jit(lambda u, v, w, kw=kw: pk.div3d_pallas(
        u, v, w, true_extents=te, **kw))
    timeit(f"div {tag}", lambda f=f: f(u, v, w))

# --- 20-iter packed red-black solve ----------------------------------
div = jax.jit(lambda u, v, w: pk.div3d_pallas(u, v, w, true_extents=te)
              )(u, v, w)
tx0, fuse0, pipe0 = pk.rb_packed_plan(div.shape, 20)
print(f"rb_packed_plan: tx={tx0} fuse={fuse0} pipe={pipe0}", flush=True)
for tag, (txs, fs, ps) in (
        (f"plan tx={tx0} fuse={fuse0} pipe={pipe0}", (tx0, fuse0, pipe0)),
        ("tx=16 fuse=5 serial", (16, 5, False)),
        ("tx=16 fuse=10 serial", (16, 10, False)),
        ("tx=8 fuse=20 serial", (8, 20, False))):
    f = jax.jit(lambda dd, txs=txs, fs=fs, ps=ps: pk.lin_solve3d_rb_packed(
        0, jnp.zeros_like(dd), dd, 1.0, 6.0, 20, tx=txs, fuse=fs,
        pipeline=ps, true_extents=te))
    timeit(f"solve20 {tag}", lambda f=f: f(div))

p_sol = jax.jit(lambda dd: pk.lin_solve3d_rb_packed(
    0, jnp.zeros_like(dd), dd, 1.0, 6.0, 20, tx=tx0, fuse=fuse0,
    pipeline=pipe0, true_extents=te))(div)

# --- gradient subtraction --------------------------------------------
for tag, kw in (("auto(ty->128)", dict()), ("ty=256", dict(ty=256)),
                ("ty=128 tx=48", dict(tx=48, ty=128))):
    f = jax.jit(lambda p, u, v, w, kw=kw: pk.gradsub3d_pallas(
        p, u, v, w, true_extents=te, **kw))
    timeit(f"gradsub {tag}", lambda f=f: f(p_sol, u, v, w))

# --- advection -------------------------------------------------------
for tag, kw in (("auto(ty->128,tx=8)", dict()),
                ("ty=256 tx=8", dict(ty=256)),
                ("ty=64 tx=8", dict(ty=64)),
                ("ty=128 tx=16", dict(tx=16, ty=128))):
    f = jax.jit(lambda u, v, w, kw=kw: pk.advect3d_multi_pallas(
        (u, v, w), (1, 2, 3), u, v, w, 0.5, self_advect=True,
        true_extents=te, **kw))
    timeit(f"advect uvw {tag}", lambda f=f: f(u, v, w))

f2 = jax.jit(lambda d, t_, u, v, w: pk.advect3d_multi_pallas(
    (d, t_), (0, 0), u, v, w, 0.5, true_extents=te))
timeit("advect dens/temp auto", lambda: f2(d, t_, u, v, w))
print("DONE", flush=True)

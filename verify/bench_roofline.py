"""Roofline probes — separate hardware limits from probe artifacts in
the "~21 ps/elem per-pass floor" (verify/bench_opcost.py) that prices
the whole grid stack (BASELINE.md op-cost-floor + 512^3 sections).

The r4 verdict's challenge: 21 ps/elem = ~381 GB/s of R+W traffic,
~46% of spec HBM BW for STREAMED passes, and ~10-20x off VPU/VMEM peak
for RESIDENT ones.  Which is it — chip or artifact?  Three families of
probes, all in one process (A/B-valid on the shared tunnel):

A. STREAMED roofline: pallas auto-pipelined HBM->VMEM->HBM copy and a
   1R+1W scale pass at 64/256 MB -> the chip's real streamed bytes/s.
B. RESIDENT cost decomposition: the bench_opcost-style fori_loop add
   at 1..16 MB (fit t_iter = fixed + marginal*elems), an 8x-unrolled
   body (same passes, 1/8 loop iterations), a chained-8-fma body
   (8x FLOPs, same traffic), and a 2D-layout variant.
C. Continuity: the original 8 MB add + halfsweep bodies, so numbers
   tie back to bench_opcost.py.

    python verify/bench_roofline.py

Measured on the v5e (see BASELINE.md "measured roofline" section for
the recorded numbers and the resulting verdict).
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import time
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fence(r):
    # block_until_ready is unreliable through the axon tunnel
    float(jnp.asarray(r).ravel()[0])


# The final fence costs a 25-50 ms tunnel round trip; a timed window
# must be LONG enough to amortize it (CLAUDE.md fence-cadence rule).
# The first version of this probe used 3-rep windows and measured the
# fence itself everywhere (every row ~9-12 ms total regardless of
# size); reps are now chosen adaptively for a >= ~1.5 s window.
WINDOW_S = 1.5


def timeit(f, x):
    r = f(x); fence(r)          # warm (compile)
    # calibrate: 10 reps + one fence -> per-call estimate with the
    # fence cost (~0.05 s) subtracted out
    t0 = time.perf_counter()
    for _ in range(10):
        r = f(x)
    fence(r)
    est = max((time.perf_counter() - t0 - 0.05) / 10, 2e-5)
    reps = int(min(max(WINDOW_S / est, 10), 20000))
    best = float('inf')
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(reps):
            r = f(x)
        fence(r)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


# ---------------------------------------------------------------- A —
# streamed HBM->VMEM->HBM via the standard auto-pipelined grid: what
# the DMA engines actually sustain for 1 read + 1 write stream.

CHAIN = 10   # chained pallas_calls per jitted dispatch: the tunnel's
# ~0.4 ms per-call dispatch cost would otherwise dominate sub-ms calls


def streamed(op, shape, tx):
    def kern(x, o):
        if op == 'copy':
            o[...] = x[...]
        else:                      # 'scale': one VPU op per elem
            o[...] = x[...] * jnp.float32(1.0001)
    call = lambda x: pl.pallas_call(
        kern,
        grid=(shape[0] // tx,),
        in_specs=[pl.BlockSpec((tx,) + shape[1:],
                               lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((tx,) + shape[1:],
                               lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x)
    @jax.jit
    def run(x):
        for _ in range(CHAIN):     # dependent chain, one dispatch
            x = call(x)
        return x
    return run


# ---------------------------------------------------------------- B —
# VMEM-resident pass cost: the bench_opcost skeleton, parameterized.

def resident(body, shape, K, dtype=jnp.float32):
    """body(x, y, consts) -> new x; runs K times on VMEM-resident
    scratch.  Returns a jitted runner."""
    def kern(x_hbm, o_hbm, vx, vy, sem):
        cp = pltpu.make_async_copy(x_hbm, vx, sem)
        cp.start(); cp.wait()
        vy[...] = vx[...] * jnp.asarray(0.5, dtype)
        def loop(i, c):
            vx[...] = body(vx[...], vy[...])
            return c
        jax.lax.fori_loop(0, K, loop, 0)
        cp = pltpu.make_async_copy(vx, o_hbm, sem)
        cp.start(); cp.wait()
    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            scratch_shapes=[pltpu.VMEM(shape, dtype),
                            pltpu.VMEM(shape, dtype),
                            pltpu.SemaphoreType.DMA],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x.astype(dtype))
    return run


def b_add(x, y):
    return x + y


def b_fma8(x, y):
    # 8 dependent fmas, ONE write: 8x the FLOPs of b_add at identical
    # VMEM traffic.  If this costs ~the same as b_add the pass is
    # traffic/overhead-bound; if ~8x it is ALU-bound.
    c = jnp.asarray(1.0001, x.dtype)
    r = x
    for _ in range(8):
        r = r * c + y
    return r


def mk_unrolled(shape, K, U=8, dtype=jnp.float32):
    # U adds per fori iteration (each a real write to vx), K/U
    # iterations: same total passes as resident(b_add, K) but 1/U the
    # loop-control overhead.
    def kern(x_hbm, o_hbm, vx, vy, sem):
        cp = pltpu.make_async_copy(x_hbm, vx, sem)
        cp.start(); cp.wait()
        vy[...] = vx[...] * jnp.asarray(0.5, dtype)
        def loop(i, c):
            for _ in range(U):
                vx[...] = vx[...] + vy[...]
            return c
        jax.lax.fori_loop(0, K // U, loop, 0)
        cp = pltpu.make_async_copy(vx, o_hbm, sem)
        cp.start(); cp.wait()
    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            scratch_shapes=[pltpu.VMEM(shape, dtype),
                            pltpu.VMEM(shape, dtype),
                            pltpu.SemaphoreType.DMA],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x.astype(dtype))
    return run


def _shift(v, d, axis):
    L = v.shape[axis]
    def sl(a, b):
        return tuple(slice(a, b) if dd == axis else slice(None)
                     for dd in range(v.ndim))
    pad = [(0, 0)] * v.ndim
    if d > 0:
        pad[axis] = (0, d)
        return jnp.pad(v[sl(d, L)], pad)
    pad[axis] = (-d, 0)
    return jnp.pad(v[sl(0, L + d)], pad)


def mk_halfsweep(shape):
    maskbase = None
    def body(x, y):
        mask = jax.lax.broadcasted_iota(jnp.int32, shape, 2) == 0
        c166 = jnp.float32(0.166)
        return (y + c166 * (_shift(x, -1, 0) + _shift(x, 1, 0)
                + jnp.where(mask, _shift(x, -1, 1), x)
                + jnp.where(mask, x, _shift(x, 1, 1))
                + jnp.where(mask, x, _shift(x, -1, 2))
                + jnp.where(mask, x, _shift(x, 1, 2)))) * c166
    return body


def main():
    key = jax.random.PRNGKey(0)
    print(f"device: {jax.devices()[0]}", flush=True)

    # ---- A: streamed --------------------------------------------------
    print("\n== A. streamed (pallas auto-pipelined grid) ==", flush=True)
    for label, shape, tx, op in (
            ('copy 64MB',  (2048, 128, 64), 64, 'copy'),
            ('copy 256MB', (8192, 128, 64), 64, 'copy'),
            ('copy 256MB tx128', (8192, 128, 64), 128, 'copy'),
            ('scale 256MB', (8192, 128, 64), 64, 'scale'),
            # 3D-grid-like shape (matches solver field layout)
            ('copy 512^2x256', (512, 512, 256), 8, 'copy'),
    ):
        x = jax.random.normal(key, shape, jnp.float32)
        dt = timeit(streamed(op, shape, tx), x) / CHAIN
        nbytes = x.size * 4
        bw = 2 * nbytes / dt / 1e9   # R+W
        per = dt / x.size * 1e12
        print(f"{label:18s} {dt*1e3:8.3f} ms/copy  {bw:7.1f} GB/s (R+W)"
              f"  {per:6.2f} ps/elem", flush=True)
        del x

    # ---- B: resident --------------------------------------------------
    print("\n== B. VMEM-resident pass decomposition ==", flush=True)
    K = 2000
    rows = []
    for label, shape in (('add 1MB', (8, 128, 256)),
                         ('add 2MB', (16, 128, 256)),
                         ('add 4MB', (32, 128, 256)),
                         ('add 8MB', (64, 128, 256)),
                         ('add 16MB', (128, 128, 256))):
        x = jax.random.normal(key, shape, jnp.float32)
        dt = timeit(resident(b_add, shape, K), x)
        per_it = dt / K
        per = per_it / x.size * 1e12
        rows.append((x.size, per_it))
        print(f"{label:18s} {dt*1e3:8.2f} ms  {per_it*1e6:8.2f} us/pass"
              f"  {per:6.2f} ps/elem", flush=True)
    # linear fit t_pass = fixed + marginal * elems
    import numpy as np
    ns = np.array([r[0] for r in rows], float)
    ts = np.array([r[1] for r in rows], float)
    A = np.vstack([np.ones_like(ns), ns]).T
    (fixed, marg), *_ = np.linalg.lstsq(A, ts, rcond=None)
    print(f"fit: t_pass = {fixed*1e6:.2f} us + {marg*1e12:.2f} ps/elem"
          f"  (marginal R+W+W BW = {3*4/max(marg,1e-18)/1e9:.0f} GB/s)",
          flush=True)

    shape8 = (64, 128, 256)
    x8 = jax.random.normal(key, shape8, jnp.float32)
    dt = timeit(mk_unrolled(shape8, K, 8), x8)
    print(f"{'add 8MB unroll8':18s} {dt*1e3:8.2f} ms  "
          f"{dt/K*1e6:8.2f} us/pass  {dt/K/x8.size*1e12:6.2f} ps/elem",
          flush=True)
    dt = timeit(resident(b_fma8, shape8, K), x8)
    print(f"{'fma8 8MB':18s} {dt*1e3:8.2f} ms  {dt/K*1e6:8.2f} us/pass"
          f"  {dt/K/x8.size*1e12:6.2f} ps/elem "
          f"({dt/K/x8.size/8*1e12:.2f} ps/elem/fma)", flush=True)
    sh2d = (8192, 256)
    x2 = jax.random.normal(key, sh2d, jnp.float32)
    def b_add2(x, y):
        return x + y
    dt = timeit(resident(b_add2, sh2d, K), x2)
    print(f"{'add 8MB 2D':18s} {dt*1e3:8.2f} ms  {dt/K*1e6:8.2f} us/pass"
          f"  {dt/K/x2.size*1e12:6.2f} ps/elem", flush=True)

    # ---- C: continuity with bench_opcost ------------------------------
    print("\n== C. continuity (bench_opcost bodies, 8MB) ==", flush=True)
    dt = timeit(resident(mk_halfsweep(shape8), shape8, K), x8)
    print(f"{'halfsweep 8MB':18s} {dt*1e3:8.2f} ms  "
          f"{dt/K*1e6:8.2f} us/pass  {dt/K/x8.size*1e12:6.2f} ps/elem",
          flush=True)


if __name__ == '__main__':
    main()

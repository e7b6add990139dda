"""SUPERSEDED (round 5): the numbers below are a MEASUREMENT ARTIFACT.
The 3-rep timed windows (~9 ms) measured the 25-50 ms final-fence
tunnel round trip divided by 3, not the kernels — every row's total
was ~9-12 ms regardless of array size.  The corrected probe with
>= 1.5 s adaptive windows is verify/bench_roofline.py: a VMEM-resident
add pass costs 0.66 ps/elem (not ~21), the half-sweep mix 3.76, and a
properly-tiled streamed copy sustains 650 GB/s R+W.  See BASELINE.md
"Measured roofline (round 5)".  Kept for the historical record.

Per-op cost model of the VPU inside a VMEM-resident pallas loop:
what does one whole-array pass cost per element for an add / fma /
select / lane- / sublane- / plane-shift / the full red-black half-sweep
op mix?  This calibrates how much an op-count reduction in the solver
sweeps could possibly buy.

Measured (v5e, axon tunnel, 2026-08-18, 8 MB f32 array, K=200):

    add                 8.62 ms    20.55 ps/elem/it
    fma                 8.52 ms    20.31 ps/elem/it
    select              9.22 ms    21.99 ps/elem/it
    lane_shift          9.17 ms    21.85 ps/elem/it
    sublane_shift       9.33 ms    22.25 ps/elem/it
    plane_shift         9.00 ms    21.46 ps/elem/it
    halfsweep          10.30 ms    24.56 ps/elem/it

Takeaway: a traversal costs ~20-22 ps/elem almost REGARDLESS of the op,
and the whole 12-op half-sweep mix is only ~20% over a bare add — the
sweep loop is bound by per-pass array-traversal overhead, not by op
count.  Reducing ops per sweep cannot move the solver much; only
fusing more work into fewer whole-array passes does (which is what the
packed red-black / whole-in-VMEM / fused-projection kernels already
do).  This is why the whole-in-VMEM 128^3 solve was only ~9% faster
than the windowed plan: both are at the same per-pass floor.

    python verify/bench_opcost.py
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

SHAPE = (64, 128, 256)   # 8 MB, VMEM resident
K = 200

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

def mk(opname, dtype=jnp.float32):
    def kern(x_hbm, o_hbm, vx, vy, sem):
        cp = pltpu.make_async_copy(x_hbm, vx, sem)
        cp.start(); cp.wait()
        vy[...] = vx[...] * jnp.asarray(0.5, dtype)
        mask = jax.lax.broadcasted_iota(jnp.int32, SHAPE, 2) == 0
        def body(i, c):
            x = vx[...]
            y = vy[...]
            if opname == 'add':
                r = x + y
            elif opname == 'scale':
                # single-input variant: drops the y load — separates
                # VMEM-stream cost from op cost
                r = x * jnp.asarray(1.0001, dtype)
            elif opname == 'fma':
                r = x * 1.0001 + y
            elif opname == 'lane_shift':
                r = _shift(x, 1, 2) + y
            elif opname == 'sublane_shift':
                r = _shift(x, 1, 1) + y
            elif opname == 'plane_shift':
                r = _shift(x, 1, 0) + y
            elif opname == 'select':
                r = jnp.where(mask, x, y)
            elif opname == 'halfsweep':
                # the actual rb half-sweep op mix
                c166 = jnp.asarray(0.166, dtype)
                r = (y + c166 * (_shift(x, -1, 0) + _shift(x, 1, 0)
                     + jnp.where(mask, _shift(x, -1, 1), x)
                     + jnp.where(mask, x, _shift(x, 1, 1))
                     + jnp.where(mask, x, _shift(x, -1, 2))
                     + jnp.where(mask, x, _shift(x, 1, 2)))) * c166
            vx[...] = r
            return c
        jax.lax.fori_loop(0, K, body, 0)
        cp = pltpu.make_async_copy(vx, o_hbm, sem)
        cp.start(); cp.wait()
    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct(SHAPE, dtype),
            scratch_shapes=[pltpu.VMEM(SHAPE, dtype),
                            pltpu.VMEM(SHAPE, dtype),
                            pltpu.SemaphoreType.DMA],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x.astype(dtype))
    return run

x = jax.random.normal(jax.random.PRNGKey(0), SHAPE, jnp.float32)
nel = x.size
# bf16 variants answer whether halving the element width halves the
# per-pass traversal cost (it would make a bf16 packed solver ~2x)
for op, dt_ in (('add', jnp.float32), ('scale', jnp.float32),
                ('fma', jnp.float32),
                ('select', jnp.float32), ('lane_shift', jnp.float32),
                ('sublane_shift', jnp.float32),
                ('plane_shift', jnp.float32),
                ('halfsweep', jnp.float32),
                ('add_bf16', jnp.bfloat16), ('scale_bf16', jnp.bfloat16),
                ('fma_bf16', jnp.bfloat16),
                ('halfsweep_bf16', jnp.bfloat16)):
    label = op
    f = mk(op.replace('_bf16', ''), dt_)
    r = f(x); float(r[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(3):
        r = f(x)
    float(r[0, 0, 0])
    dt = (time.perf_counter() - t0) / 3
    per = dt / K / nel * 1e12   # ps per element per iteration
    eops = nel * K / dt / 1e12  # Tera element-ops/s
    print(f"{label:15s} {dt*1e3:8.2f} ms   {per:7.2f} ps/elem/it  {eops:6.2f} T/s", flush=True)

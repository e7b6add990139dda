"""Per-stage attribution of the unidyn force pass (VERDICT r3 weak #5:
7.18 ms/step for 14,040 particles = ~511 ns/p vs base's ~170 ns/p —
where does it go?): sort_tables, the 35-col pack, rowblock kernel A
(density/dpress/drift/velgrad/merge), kernel B (mixture accel +
delsolid/delfluid), the per-particle granular/update epilogue, and the
full step, timed individually on the real TPU.

    python verify/bench_unidyn_parts.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
from tpufluids import binning
from tpufluids.config import UNIDYN_CONFIG
from tpufluids.scenes import unidyn_tank
from tpufluids.sph_pallas import (RB, _grid_extents, _pack_unidyn_by_order,
                                  _run_rowblock_kernel,
                                  _unidyn_rowblock_kernel_a,
                                  _unidyn_rowblock_kernel_b,
                                  unidyn_forces_rowblock)
from tpufluids.step import run_python, sph_step


def timeit(name, fn, reps=40):
    """Adaptive reps for a >= ~1.2 s window: the final scalar-readback
    fence costs 25-50 ms, so 40 reps of a ~2 ms stage would overstate
    it by ~1 ms/rep (the r5 roofline lesson — the r4 numbers from this
    probe carry that inflation)."""
    r = fn()
    leaf = jax.tree_util.tree_leaves(r)[0]
    float(jnp.ravel(leaf)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn()
    leaf = jax.tree_util.tree_leaves(r)[0]
    float(jnp.ravel(leaf)[0])
    est = max((time.perf_counter() - t0 - 0.04) / reps, 5e-5)
    reps = max(reps, int(min(1.2 / est, 4000)))
    acc = []
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn()
        leaf = jax.tree_util.tree_leaves(r)[0]
        float(jnp.ravel(leaf)[0])
        acc.append((time.perf_counter() - t0) / reps * 1e3)
    ms = min(acc)
    print(f"{name:52s} {ms:8.2f} ms  (reps {reps})", flush=True)
    return ms


cfg = UNIDYN_CONFIG
s0 = unidyn_tank(cfg)
# settle a few steps so the density/occupancy is realistic
s0, _ = run_python(s0, cfg, 20)
n = s0.capacity
print(f"unidyn_tank: n={n}, w_chunk={cfg.pallas_w_chunk}, "
      f"subbin_threshold={cfg.subbin_threshold}, RB={RB}", flush=True)

gx, gy = _grid_extents(cfg, None)
ch = cfg.pallas_w_chunk or 32
pad = max(RB, ch)

tables_j = jax.jit(lambda s: binning.sort_tables(s, cfg))
order, bt = tables_j(s0)
t_sort = timeit("sort_tables", lambda: tables_j(s0))

pack_j = jax.jit(lambda s, o, b: _pack_unidyn_by_order(s, o, b, pad, cfg))
packed = pack_j(s0, order, bt)
t_pack = timeit("pack_unidyn_by_order (35 cols)",
                lambda: pack_j(s0, order, bt))

col_start = bt.cell_start[0:gx * gy * gy + 1:gy].astype(jnp.int32)
ka_j = jax.jit(lambda cs, p: _run_rowblock_kernel(
    _unidyn_rowblock_kernel_a, cs, p, n, gx, gy, ch, cfg, rb=RB,
    subbin_threshold=cfg.subbin_threshold))
t_ka = timeit("rowblock kernel A (pair pass 1)",
              lambda: ka_j(col_start, packed))

kb_j = jax.jit(lambda cs, p: _run_rowblock_kernel(
    _unidyn_rowblock_kernel_b, cs, p, n, gx, gy, ch, cfg, rb=RB,
    subbin_threshold=cfg.subbin_threshold))
t_kb = timeit("rowblock kernel B (pair pass 2)",
              lambda: kb_j(col_start, packed))

forces_j = jax.jit(lambda s, o, b: unidyn_forces_rowblock(
    s, b, cfg, order=o, w_chunk=cfg.pallas_w_chunk,
    subbin_threshold=cfg.subbin_threshold))
t_forces = timeit("unidyn_forces_rowblock (pack+A+B+unpack)",
                  lambda: forces_j(s0, order, bt))

step_j = jax.jit(lambda s: sph_step(s, cfg))
t_step = timeit("full sph_step", lambda: step_j(s0))

print(f"\nattribution: sort {t_sort:.2f} + pack {t_pack:.2f} + "
      f"A {t_ka:.2f} + B {t_kb:.2f} "
      f"= {t_sort + t_pack + t_ka + t_kb:.2f}; forces-call "
      f"{t_forces:.2f}; full step {t_step:.2f} "
      f"(epilogue ~{t_step - t_sort - t_forces:.2f})", flush=True)

# --- r5: fused whole-pool-VMEM-resident kernel (both passes in ONE
# pallas_call; step.dispatch_forces auto-selects it for unidyn pools
# that fit VMEM)
from tpufluids.sph_pallas import unidyn_forces_resident

res_j = jax.jit(lambda s, o, b: unidyn_forces_resident(
    s, b, cfg, order=o, w_chunk=cfg.pallas_w_chunk,
    subbin_threshold=cfg.subbin_threshold))
t_res = timeit("unidyn_forces_resident (fused A+B, one call)",
               lambda: res_j(s0, order, bt))

# two-call rowblock step vs the auto (resident) step
step_rb_j = jax.jit(lambda s: sph_step(
    s, cfg.replace(pallas_kernel="rowblock")))
t_step_rb = timeit("full sph_step (rowblock two-call)",
                   lambda: step_rb_j(s0))
print(f"\nr5 resident: forces {t_res:.2f} (vs rowblock two-call "
      f"{t_forces:.2f}); full step auto {t_step:.2f} vs rowblock "
      f"{t_step_rb:.2f}", flush=True)

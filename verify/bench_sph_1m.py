"""SPH scaling beyond the r3 table (VERDICT r3 weak #6): 1M and 2M
uniform fill with the column family (auto above 262144 rows), per-stage
split (sort_tables / pack / forces / full step) and overflow check.
The r3 table stopped at 524k (~212 ns/particle, sort+pack 26% of the
step); this finds the next cliff.

    python verify/bench_sph_1m.py [n ...]   (default 1048576 2097152)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
from tpufluids import binning
from tpufluids.binning import suggest_col_cap
from tpufluids.config import BASE_CONFIG
from tpufluids.sph_pallas import _pack_base_by_order, base_forces_pallas
from tpufluids.state import make_state
from tpufluids.step import sph_step


def timeit(name, fn, reps=8):
    r = fn()
    float(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[0])
    acc = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn()
        float(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[0])
        acc.append((time.perf_counter() - t0) / reps * 1e3)
    med = sorted(acc)[1]
    print(f"{name:52s} {med:8.2f} ms  {[round(a, 2) for a in acc]}",
          flush=True)
    return med


sizes = [int(a) for a in sys.argv[1:]] or [1048576, 2097152]
for n in sizes:
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(-0.9, 0.9, (n, 3)), jnp.float32)
    s0 = make_state(pos, cfg=BASE_CONFIG)
    cap = suggest_col_cap(s0, BASE_CONFIG)
    cfg = BASE_CONFIG.replace(pallas_kernel="column", pallas_col_cap=cap)
    print(f"--- n={n}, col_cap={cap}", flush=True)

    tables_j = jax.jit(lambda s: binning.sort_tables(s, cfg))
    order, bt = tables_j(s0)
    t_sort = timeit(f"n={n} sort_tables", lambda: tables_j(s0))

    pack_j = jax.jit(lambda s, o, b: _pack_base_by_order(s, o, b, 128))
    t_pack = timeit(f"n={n} pack_by_order", lambda: pack_j(s0, order, bt))

    hc = 128 if cap > 192 else 0   # step.py r5 auto threshold
    zs = bool(hc)  # subsumed by the banded sweep when hc > 0 (r5)
    col_j = jax.jit(lambda s, o, b: base_forces_pallas(
        s, b, cfg, b=cap, w_cap=cap, order=o,
        w_chunk=cfg.pallas_w_chunk, h_chunk=hc, z_skip=zs))
    t_col = timeit(f"n={n} column forces (h_chunk={hc}, z_skip={zs})",
                   lambda: col_j(s0, order, bt))

    step_j = jax.jit(lambda s: sph_step(s, cfg))
    t_step = timeit(f"n={n} full step", lambda: step_j(s0))
    s1, m = step_j(s0)
    ovf = int(m.bin_overflow)
    print(f"n={n}: {t_step:.1f} ms/step = {t_step / n * 1e6:.0f} "
          f"ns/particle; sort+pack share "
          f"{(t_sort + t_pack) / t_step * 100:.0f}%; overflow={ovf}",
          flush=True)
    assert ovf == 0, f"column cap {cap} overflowed: {ovf}"

    # --- sort_every amortization (r5): the stale step keeps the pool
    # in the last sort's storage order, so it pays neither the 2M-row
    # packed-key sort nor the per-step order gather (pack becomes a
    # streaming write) — see step.sph_step_stale
    from tpufluids.step import _jitted_sort_step, _jitted_stale_step
    K = 8
    cfgK = cfg.replace(sort_every=K)
    s_sorted, bt, _ = _jitted_sort_step(s0, cfgK)
    float(s_sorted.pos[0, 0])
    t_ss = timeit(f"n={n} re-sort step (sort_by_cell + stale step)",
                  lambda: _jitted_sort_step(s0, cfgK))
    t_st = timeit(f"n={n} stale step",
                  lambda: _jitted_stale_step(s_sorted, bt, cfgK))
    amort = (t_ss + (K - 1) * t_st) / K
    print(f"n={n} sort_every={K}: amortized {amort:.1f} ms/step = "
          f"{amort / n * 1e6:.0f} ns/particle (was {t_step:.1f}; "
          f"sort share {(t_ss - t_st) / K / amort * 100:.0f}%)",
          flush=True)

    # overflow check over one K-cycle.  NOTE: the uniform fill at these
    # sizes is violently explosive (density ~2x rho0 -> max_speed
    # ~2.5e8 after 8 steps), so a positional agreement check here only
    # measures chaos amplification; the physical-scene agreement
    # evidence is base_dam fresh-vs-sort_every=8 over 64 steps:
    # max|dpos| 2.98e-08 at pos scale 0.76, and 1.08 -> 0.89 ms/step
    # (r5, same-process TPU run).
    from tpufluids.step import run_python
    sb, mb = run_python(s0, cfgK, K)
    print(f"n={n} sort_every={K}: finite="
          f"{bool(jnp.isfinite(sb.pos).all())}, "
          f"overflow={int(mb.bin_overflow)}", flush=True)
print("DONE", flush=True)

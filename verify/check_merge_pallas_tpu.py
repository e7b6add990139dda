"""Real-TPU validation of the round-3 Pallas additions:

1. merge-enabled unidyn forces (in-kernel partner search) — both
   kernel families vs the XLA partner argmin, plus a 30-step
   merge-enabled sph_step equivalence + ms/step A/B (merge on/off);
2. rowblock-on-slab (GridSpec with traced x_offset) — sharded 1-dev
   mesh step with pallas_kernel="rowblock" vs the XLA sharded step;
3. Mosaic lane-gather probe: does jnp.take_along_axis(axis=-1)
   compile inside a TPU kernel (wanted by the 2D whole-step kernel)?

    python verify/check_merge_pallas_tpu.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

print(f"device: {jax.devices()[0]}", flush=True)

# ---- 3. lane-gather probe first (cheap, informs the 2D whole-step) ----
try:
    from jax.experimental import pallas as pl

    def _tg_kernel(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=-1)

    x = jnp.arange(8 * 256, dtype=jnp.float32).reshape(8, 256)
    idx = jnp.broadcast_to(jnp.arange(256)[::-1][None, :],
                           (8, 256)).astype(jnp.int32)
    got = pl.pallas_call(
        _tg_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32))(x, idx)
    ok = bool((np.asarray(got)
               == np.asarray(jnp.take_along_axis(x, idx, axis=-1))).all())
    print(f"take_along_axis(axis=-1) in-kernel: compiles, exact={ok}",
          flush=True)
except Exception as e:
    print(f"take_along_axis(axis=-1) in-kernel: FAILED ({type(e).__name__}: "
          f"{str(e)[:200]})", flush=True)

# sublane-axis variant
try:
    def _tg0_kernel(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=0)

    x = jnp.arange(16 * 128, dtype=jnp.float32).reshape(16, 128)
    idx = jnp.broadcast_to((jnp.arange(16)[::-1])[:, None],
                           (16, 128)).astype(jnp.int32)
    got = pl.pallas_call(
        _tg0_kernel,
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32))(x, idx)
    ok = bool((np.asarray(got)
               == np.asarray(jnp.take_along_axis(x, idx, axis=0))).all())
    print(f"take_along_axis(axis=0) in-kernel: compiles, exact={ok}",
          flush=True)
except Exception as e:
    print(f"take_along_axis(axis=0) in-kernel: FAILED ({type(e).__name__}: "
          f"{str(e)[:200]})", flush=True)

# ---- 1. merge-enabled unidyn forces ----------------------------------
from tpufluids import binning
from tpufluids.config import UNIDYN_CONFIG
from tpufluids.forces import compute_forces
from tpufluids.scenes import unidyn_tank
from tpufluids.sph_pallas import (unidyn_forces_pallas,
                                  unidyn_forces_rowblock)
from tpufluids.step import run_python, sph_step

cfg = UNIDYN_CONFIG.replace(merge_dist=0.06)  # lattice pitch 0.05
state = unidyn_tank(cfg)
# jitter breaks the lattice's exact distance ties (tie-break order is
# backend-specific; real scenes have measure-zero ties)
rng = np.random.default_rng(0)
state = state.replace(pos=state.pos + jnp.asarray(
    rng.uniform(-2e-3, 2e-3, state.pos.shape), jnp.float32))
ss, bt = binning.sort_by_cell(state, cfg)
ref = jax.jit(lambda s, b: compute_forces(s, b, cfg))(ss, bt)
mp_ref = np.asarray(ref.merge_partner)
print(f"XLA partners found: {(mp_ref >= 0).sum()}", flush=True)

for name, fn in (("column", unidyn_forces_pallas),
                 ("rowblock", unidyn_forces_rowblock)):
    t0 = time.perf_counter()
    got = jax.jit(lambda s, b, fn=fn: fn(s, b, cfg))(ss, bt)
    mp = np.asarray(got["merge_partner"])
    eq = (mp == mp_ref).all()
    print(f"merge partner ({name}): exact match={bool(eq)} "
          f"[compile+run {time.perf_counter()-t0:.1f}s]", flush=True)
    if not eq:
        bad = np.nonzero(mp != mp_ref)[0][:10]
        print(f"  mismatch rows {bad}: got {mp[bad]} want {mp_ref[bad]}",
              flush=True)

# 30-step merge-enabled step equivalence (pallas auto family vs xla)
sx = state
sp = state
cfgx = cfg.replace(force_backend="xla")
cfgp = cfg.replace(force_backend="pallas")
for _ in range(30):
    sx, mx = jax.jit(lambda s: sph_step(s, cfgx))(sx)
    sp, mpm = jax.jit(lambda s: sph_step(s, cfgp))(sp)
dx = {k: np.asarray(getattr(sx, k)) for k in ("pos", "vel", "mass")}
dp = {k: np.asarray(getattr(sp, k)) for k in ("pos", "vel", "mass")}
alive_x = int(mx.n_alive)
alive_p = int(mpm.n_alive)
print(f"30-step merge run: alive xla={alive_x} pallas={alive_p}", flush=True)
for k in dx:
    scale = max(1.0, np.abs(dx[k]).max())
    err = np.abs(dx[k] - dp[k]).max() / scale
    print(f"  {k}: rel max err {err:.2e}", flush=True)

# ms/step with merge ON vs OFF (pallas backend, interleaved A/B)
cfg_off = UNIDYN_CONFIG
s_on, s_off = state, state
jit_on = jax.jit(lambda s: sph_step(s, cfgp))
jit_off = jax.jit(lambda s: sph_step(s, cfg_off))
for f, s in ((jit_on, s_on), (jit_off, s_off)):
    s, _ = f(s)
    float(s.pos[0, 0])
res = {}
for rep in range(2):
    for name, f in (("merge_on", jit_on), ("merge_off", jit_off)):
        s = state
        t0 = time.perf_counter()
        for _ in range(60):
            s, _ = f(s)
        float(s.pos[0, 0])
        res.setdefault(name, []).append(
            (time.perf_counter() - t0) / 60 * 1e3)
for name, v in res.items():
    print(f"unidyn_tank {name}: {min(v):.2f} ms/step {v}", flush=True)

# ---- 2. rowblock on a sharded slab (1-dev mesh, real Mosaic) ----------
from tpufluids.oracle import state_to_dict
from tpufluids.shard import make_mesh
from tpufluids.shard.particles import collect, distribute, make_sharded_step

mesh = make_mesh(1)
cfg_rb = UNIDYN_CONFIG.replace(force_backend="pallas",
                               pallas_kernel="rowblock")
cap = state.capacity
step_rb = make_sharded_step(mesh, cfg_rb, n_steps=5,
                            halo_capacity=2048, migrate_capacity=256)
out, met = step_rb(distribute(state, mesh, cfg_rb, cap))
outd = state_to_dict(collect(out))

ref5 = state
for _ in range(5):
    ref5, _ = jax.jit(lambda s: sph_step(s, cfg_rb))(ref5)
refd = state_to_dict(ref5)
oa = np.argsort(outd["pid"][outd["alive"].astype(bool)])
ra = np.argsort(refd["pid"][refd["alive"].astype(bool)])
for k in ("pos", "vel", "dens"):
    a = outd[k][outd["alive"].astype(bool)][oa]
    b = refd[k][refd["alive"].astype(bool)][ra]
    scale = max(1.0, np.abs(b).max())
    print(f"sharded-rowblock {k}: rel max err "
          f"{np.abs(a - b).max() / scale:.2e}", flush=True)
print("DONE", flush=True)

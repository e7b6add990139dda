"""lax.rev (jnp.flip) miscompile repro on the axon TPU backend
(round-4 incident): reversing axis 0 of a (256,512,512) f32 array
disagrees with a gather-based reverse by O(data) — the gather is the
correct one (the radix-DCT residual oracle in
verify/bench_dct_radix_ab.py confirms it; small shapes agree
everywhere).  tpufluids therefore never uses jnp.flip on large arrays
(stam._dct_solve_interior uses the gather-based rev).

Expected on a healthy backend: all printed errors ~1e-7 * scale.
Observed on axon (2026-08): "rev vs gather: raw 9.6e-01".
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
from tpufluids.grid.stam import _DCT_PREC, _dct_mats

n = 512
m = n // 2
prec = _DCT_PREC["highest"]
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (n, n, n), jnp.float32) * 0.1


@jax.jit
def rev_cmp(x):
    back_rev = jnp.flip(x[m:], axis=0)
    idx = n - 1 - jnp.arange(m)
    back_gather = jnp.take(x, idx, axis=0)
    d = jnp.max(jnp.abs(back_rev - back_gather))
    g_rev = x[:m] + back_rev
    g_gather = x[:m] + back_gather
    C2 = _dct_mats(m)[0]
    E_rev = jnp.tensordot(C2, g_rev, axes=((1,), (0,)), precision=prec)
    E_gather = jnp.tensordot(C2, g_gather, axes=((1,), (0,)),
                             precision=prec)
    return d, jnp.max(jnp.abs(E_rev - E_gather))


d, dE = rev_cmp(x)
print(f"rev vs gather: raw {float(d):.3e}  after dot {float(dE):.3e}",
      flush=True)

# split pipeline: materialize g in its own jit, dot in another
fold = jax.jit(lambda x: x[:m] + jnp.flip(x[m:], axis=0))
dot = jax.jit(lambda g: jnp.tensordot(_dct_mats(m)[0], g,
                                      axes=((1,), (0,)),
                                      precision=prec))
E_split = dot(fold(x))


@jax.jit
def fused(x):
    g = x[:m] + jnp.flip(x[m:], axis=0)
    return jnp.tensordot(_dct_mats(m)[0], g, axes=((1,), (0,)),
                         precision=prec)


E_fused = fused(x)
print(f"fused vs split E: "
      f"{float(jnp.max(jnp.abs(E_fused - E_split))):.3e}", flush=True)

# and vs the direct transform's even rows (the known-good reference)
@jax.jit
def direct_even(x):
    C = _dct_mats(n)[0]
    F = jnp.tensordot(C, x, axes=((1,), (0,)), precision=prec)
    return F[0::2]


E_dir = direct_even(x)
print(f"split E vs direct-even: "
      f"{float(jnp.max(jnp.abs(E_split - E_dir))):.3e}", flush=True)
print(f"fused E vs direct-even: "
      f"{float(jnp.max(jnp.abs(E_fused - E_dir))):.3e}", flush=True)

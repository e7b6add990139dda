"""Real-TPU numerical validation of the SPH Pallas force backends
against the XLA gather path (CLAUDE.md: pallas kernels need real-TPU
validation, not just interpret mode).

Rows are pid-matched before comparing: the Pallas path keeps pool
order (binning.sort_tables), while the XLA path cell-sorts the pool
every step — comparing raw rows compares different particles (r4 fix;
the unmatched version reported a spurious 1.32 'error')."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import numpy as np
from tpufluids.config import BASE_CONFIG, UNIDYN_CONFIG
from tpufluids.scenes import base_dam, unidyn_tank
from tpufluids.step import run_python


def by_pid(s):
    alive = np.asarray(s.alive)
    order = np.argsort(np.asarray(s.pid)[alive])
    return {f: np.asarray(getattr(s, f))[alive][order]
            for f in ("pos", "vel", "dens", "press", "pid")}


for name, cfg, scene in (("base_dam", BASE_CONFIG, base_dam),
                         ("unidyn_tank", UNIDYN_CONFIG, unidyn_tank)):
    outs = {}
    for backend in ("pallas", "xla"):
        bcfg = cfg.replace(force_backend=backend)
        s = scene(bcfg)
        s, m = run_python(s, bcfg, 5)
        outs[backend] = by_pid(jax.device_get(s))
    a, b = outs["pallas"], outs["xla"]
    np.testing.assert_array_equal(a["pid"], b["pid"])
    # identical pair sets -> float32-tolerance agreement after 5 steps
    for f, tol in (("pos", 1e-6), ("vel", 1e-4), ("dens", 1e-2),
                   ("press", 2.0)):
        x, y = a[f], b[f]
        scale = max(np.abs(y).max(), 1.0)
        err = np.abs(x - y).max() / scale
        print(f"{name} {f}: rel max err {err:.2e}", flush=True)
        assert err < tol, (name, f, err)
print("TPU pallas-vs-xla force backends: PASS")

"""Sort-cadence amortization (cfg.sort_every > 1): the pool is
re-sorted every K-th step and the binning tables are reused in
between, with the Pallas kernels adding fresh per-pair xy cell masks
(replacing the reference's every-step thrust::sort_by_key,
solver.cu:181, at pool sizes the reference never reached — at 2M
particles the sort+pack were 28% of the step).  CPU interpret-mode
tests; real-TPU timing rows live in verify/bench_sph_1m.py."""

import jax
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from tpufluids.config import BASE_CONFIG, UNIDYN_CONFIG
from tpufluids.oracle import state_to_dict
from tpufluids.scenes import random_blob
from tpufluids.step import run_python, sph_step, use_sort_every


def by_pid(d):
    o = np.argsort(d["pid"])
    return {k: v[o] for k, v in d.items()}


CFG = BASE_CONFIG.replace(force_backend="pallas", pallas_col_cap=64,
                          max_per_cell=32)


@pytest.mark.parametrize("family", ["column", "rowblock"])
def test_sort_step_matches_fresh_step(family):
    """The re-sort step of the amortized driver (sort_by_cell + stale
    step with the fresh-xy masks) is numerically identical to the
    every-step path: on a just-sorted table the added masks are no-ops
    by window construction."""
    from tpufluids.step import _jitted_sort_step, _jitted_sph_step

    cfg = CFG.replace(pallas_kernel=family)
    state = random_blob(150, seed=5, span=0.7)
    with pltpu.force_tpu_interpret_mode():
        # jitted reference (eager-vs-jit fusion differs by ulps in the
        # EOS's ^7 — the force accumulations themselves are bitwise
        # equal between the two paths)
        ref, _ = _jitted_sph_step(state, cfg)
        out, bt, _ = _jitted_sort_step(state, cfg)
    refd = by_pid(state_to_dict(ref))
    outd = by_pid(state_to_dict(out))
    np.testing.assert_array_equal(outd["pid"], refd["pid"])
    for f in ("pos", "vel", "dens", "press"):
        np.testing.assert_allclose(outd[f], refd[f], rtol=1e-6,
                                   atol=1e-7, err_msg=f)


@pytest.mark.parametrize("family", ["column", "rowblock"])
def test_sort_every_k_tracks_every_step(family):
    """9 steps at sort_every=3 stay within tolerance of every-step
    sorting: between sorts only pairs whose endpoints drifted a full
    cell apart in x/y can differ, and those sit in the outer-support
    tail (W -> 0 at the support edge)."""
    cfg1 = CFG.replace(pallas_kernel=family)
    cfgk = cfg1.replace(sort_every=3)
    state = random_blob(150, seed=11, span=0.7)
    with pltpu.force_tpu_interpret_mode():
        ref, _ = run_python(state, cfg1, 9)
        out, _ = run_python(state, cfgk, 9)
    refd = by_pid(state_to_dict(ref))
    outd = by_pid(state_to_dict(out))
    np.testing.assert_array_equal(outd["pid"], refd["pid"])
    for f in ("pos", "vel"):
        scale = max(1.0, np.abs(refd[f]).max())
        np.testing.assert_allclose(outd[f], refd[f], rtol=3e-4,
                                   atol=2e-4 * scale, err_msg=f)


def test_sort_every_rejects_unidyn_and_xla():
    with pytest.raises(ValueError, match="base variant"):
        use_sort_every(UNIDYN_CONFIG.replace(sort_every=4,
                                             force_backend="pallas"))
    with pytest.raises(ValueError, match="Pallas"):
        use_sort_every(BASE_CONFIG.replace(sort_every=4,
                                           force_backend="xla"))
    assert not use_sort_every(BASE_CONFIG)

"""Fused whole-pool-VMEM-resident unidyn kernel (sph_pallas
.unidyn_forces_resident): both passes in ONE pallas_call for pools
that fit VMEM — the deterministic two-pass resolution of the
reference's single-kernel atomic read-write race
(FluidGPU-unidyn.cu:314-401) at near-single-pass cost.  CPU interpret
mode; real-TPU timing in verify/bench_unidyn_parts.py."""

import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from tests.test_forces_vs_oracle import mixed_blob
from tpufluids import binning
from tpufluids.config import UNIDYN_CONFIG
from tpufluids.sph_pallas import (unidyn_forces_resident,
                                  unidyn_forces_rowblock)

FIELDS = ("sum_w", "dpress", "diffusion", "vel_grad", "stress_accel",
          "solid_drift", "fluid_drift", "mixture_accel", "delsolid",
          "delfluid")


@pytest.mark.parametrize("merge,subbin", [(0.0, None), (0.06, None),
                                          (0.0, 6)])
def test_resident_matches_rowblock(merge, subbin):
    cfg = UNIDYN_CONFIG.replace(max_per_cell=64, merge_dist=merge)
    state = mixed_blob(140, 3, cfg, span=0.5)
    sorted_state, bt = binning.sort_by_cell(state, cfg, runs=True)
    with pltpu.force_tpu_interpret_mode():
        r = unidyn_forces_resident(sorted_state, bt, cfg,
                                   subbin_threshold=subbin)
        rb = unidyn_forces_rowblock(sorted_state, bt, cfg,
                                    subbin_threshold=subbin)
    for k in FIELDS:
        a, b = np.asarray(r[k]), np.asarray(rb[k])
        scale = max(1.0, np.abs(b).max())
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5 * scale,
                                   err_msg=k)
    np.testing.assert_array_equal(np.asarray(r["merge_partner"]),
                                  np.asarray(rb["merge_partner"]))


def test_step_dispatch_selects_resident_and_matches_xla():
    """The unidyn step with pallas_kernel='auto' routes small pools to
    the resident tier (step.dispatch_forces) and tracks the XLA step."""
    from tpufluids.oracle import state_to_dict
    from tpufluids.step import run_python

    cfg = UNIDYN_CONFIG.replace(max_per_cell=64)
    state = mixed_blob(120, 9, cfg, span=0.5, boundary_frac=0.15)
    ref, _ = run_python(state, cfg.replace(force_backend="xla"), 2)
    with pltpu.force_tpu_interpret_mode():
        out, m = run_python(state, cfg.replace(force_backend="pallas"), 2)
    refd = state_to_dict(ref)
    outd = state_to_dict(out)
    o = np.argsort(outd["pid"])
    r = np.argsort(refd["pid"])
    for f in ("pos", "vel", "dens", "press", "solid", "fluid"):
        scale = max(1.0, np.abs(refd[f]).max())
        np.testing.assert_allclose(outd[f][o], refd[f][r], rtol=3e-4,
                                   atol=1e-5 * scale, err_msg=f)
    assert int(m.bin_overflow) == 0

"""Sharded SPH (domain decomposition + halo/migration via ppermute) vs
the single-device step — pid-matched agreement on the CPU fake mesh."""

import jax
import numpy as np
import pytest

from tpufluids.config import BASE_CONFIG, UNIDYN_CONFIG
from tpufluids.oracle import state_to_dict
from tpufluids.scenes import base_dam, random_blob, unidyn_tank
from tpufluids.shard import make_mesh
from tpufluids.shard.particles import (collect, distribute,
                                       make_sharded_step)
from tpufluids.step import sph_step


def by_pid(d):
    alive = d["alive"].astype(bool)
    pids = d["pid"][alive]
    order = np.argsort(pids)
    return {k: v[alive][order] for k, v in d.items()}


def run_and_compare(cfg, state, n_dev, steps, cap, fields, rtol=3e-4,
                    subbin_parity=False, **mk):
    ref = state
    for _ in range(steps):
        ref, _ = sph_step(ref, cfg, subbin_parity=subbin_parity)
    refd = by_pid(state_to_dict(ref))

    mesh = make_mesh(n_dev)
    sharded = distribute(state, mesh, cfg, cap)
    step = make_sharded_step(mesh, cfg, n_steps=steps,
                             subbin_parity=subbin_parity, **mk)
    out, metrics = step(sharded)
    outd = by_pid(state_to_dict(collect(out)))

    assert int(metrics.halo_overflow) == 0
    assert int(metrics.migrate_overflow) == 0
    np.testing.assert_array_equal(outd["pid"], refd["pid"])
    for f in fields:
        a, b = outd[f], refd[f]
        scale = max(1.0, np.abs(b).max())
        np.testing.assert_allclose(a, b, rtol=rtol, atol=1e-5 * scale,
                                   err_msg=f)
    return metrics


@pytest.mark.parametrize("n_dev", [1, 2, 4])
def test_base_sharded_matches_single(n_dev):
    cfg = BASE_CONFIG.replace(max_per_cell=32)
    state = random_blob(200, seed=5, span=0.6)
    run_and_compare(cfg, state, n_dev, steps=3, cap=220,
                    fields=("pos", "vel", "dens", "press", "acc"))


def test_base_dam_sharded_8dev():
    cfg = BASE_CONFIG.replace(max_per_cell=32)
    state = base_dam(cfg, n=2000)
    run_and_compare(cfg, state, 8, steps=5, cap=2000,
                    fields=("pos", "vel", "dens"))


@pytest.mark.parametrize("n_dev", [2, 4])
def test_unidyn_sharded_matches_single(n_dev):
    from tests.test_forces_vs_oracle import mixed_blob
    cfg = UNIDYN_CONFIG.replace(max_per_cell=64, grid_size=16,
                                cell_size=0.125)
    state = mixed_blob(150, 21, cfg, span=0.7, boundary_frac=0.1)
    run_and_compare(
        cfg, state, n_dev, steps=3, cap=170,
        fields=("pos", "vel", "dens", "solid", "fluid", "stress"),
        rtol=1e-3)


def test_migration_happens():
    """Particles with strong x velocity cross slabs and stay conserved."""
    cfg = BASE_CONFIG.replace(max_per_cell=32)
    state = random_blob(100, seed=7, span=0.5)
    vel = np.asarray(state.vel).copy()
    vel[:, 0] = 3.0  # ~ crosses a 0.05 cell every ~33 steps at dt 5e-4
    state = state.replace(vel=jax.numpy.asarray(vel))
    mesh = make_mesh(4)
    sharded = distribute(state, mesh, cfg, 120)
    step = make_sharded_step(mesh, cfg, n_steps=40)
    out, metrics = step(sharded)
    assert int(metrics.n_alive) == 100
    outd = by_pid(state_to_dict(collect(out)))
    assert outd["pid"].shape[0] == 100

    ref = state
    from tpufluids.step import run_chunk
    ref, _ = run_chunk(ref, cfg, 40)
    refd = by_pid(state_to_dict(ref))
    np.testing.assert_allclose(outd["pos"], refd["pos"], rtol=3e-4,
                               atol=1e-5)

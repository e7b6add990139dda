"""Adaptive-resolution (merge/split) tests — tpufluids.adapt.

The reference merges in-kernel with atomic races and compacts via a
sentinel-cell sort (FluidGPU-unidyn.cu:261-275, 554-562); splitting is
flagged in-kernel (:278-285) with host re-injection shipped commented
out (solver-unidyn.cu:495-542).  These tests pin the deterministic
masked-pool semantics of the rebuild."""

import jax.numpy as jnp
import numpy as np

from tpufluids import adapt
from tpufluids.config import UNIDYN_CONFIG
from tpufluids.scenes import random_blob
from tpufluids.state import make_state
from tpufluids.step import run_chunk

CFG = UNIDYN_CONFIG


def square_state(**kw):
    """Four particles on a small square, unit mass, fluid."""
    pos = np.array([[0.0, 0.0, 0.0], [0.02, 0.0, 0.0],
                    [0.5, 0.0, 0.0], [0.0, 0.5, 0.0]], np.float32)
    return make_state(pos, cfg=CFG, **kw)


def test_merge_mutual_nearest_pair():
    st = square_state()
    st = st.replace(vel=jnp.array([[1.0, 0, 0], [0, 1.0, 0],
                                   [0, 0, 0], [0, 0, 0]], jnp.float32))
    partner = jnp.array([1, 0, 0, -1], jnp.int32)  # 2->0 is not mutual
    out = adapt.apply_merges(st, partner, CFG)
    # absorber = lower index 0: averaged pos/vel, merged mass 2.75
    np.testing.assert_allclose(np.asarray(out.pos[0]), [0.01, 0, 0],
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(out.vel[0]), [0.5, 0.5, 0],
                               atol=1e-7)
    assert float(out.mass[0]) == CFG.merge_mass_new
    # victim dies with zero mass (reference masses 2.75/0,
    # FluidGPU-unidyn.cu:266-267)
    assert not bool(out.alive[1]) and float(out.mass[1]) == 0.0
    # bystanders untouched
    assert bool(out.alive[2]) and bool(out.alive[3])
    assert float(out.mass[2]) == 1.0
    assert int(adapt.count_alive(out)) == 3


def test_merge_requires_mutual_partners():
    st = square_state()
    # 0 wants 1 but 1 wants 2: nobody merges
    partner = jnp.array([1, 2, -1, -1], jnp.int32)
    out = adapt.apply_merges(st, partner, CFG)
    assert int(adapt.count_alive(out)) == 4
    np.testing.assert_array_equal(np.asarray(out.mass),
                                  np.asarray(st.mass))


def test_split_injects_child_into_free_slot():
    st = square_state(capacity=6)
    st = st.replace(split=st.split.at[1].set(True),
                    vel=st.vel.at[1].set(jnp.array([0.3, 0, 0])),
                    mass=st.mass.at[1].set(3.5))
    out = adapt.apply_splits(st, CFG)
    assert int(adapt.count_alive(out)) == 5
    child = 4  # first free slot
    np.testing.assert_allclose(
        np.asarray(out.pos[child]),
        np.asarray(st.pos[1]) + [0, CFG.split_child_y_offset, 0], atol=1e-7)
    np.testing.assert_allclose(np.asarray(out.vel[child]),
                               np.asarray(st.vel[1]), atol=1e-7)
    # mother mass resets to 1 (solver-unidyn.cu:512), child mass 1
    assert float(out.mass[1]) == 1.0 and float(out.mass[child]) == 1.0
    assert not bool(out.split[1]) and not bool(out.split[child])
    assert int(out.pid[child]) == int(st.pid[1]) + st.capacity


def test_split_capacity_bounded():
    st = square_state(capacity=5)  # one free slot, two splitters
    st = st.replace(split=st.split.at[jnp.array([0, 1])].set(True))
    out = adapt.apply_splits(st, CFG)
    assert int(adapt.count_alive(out)) == 5  # never beyond capacity
    # first splitter served, second keeps its flag for a later step
    assert not bool(out.split[0])
    assert bool(out.split[1])


def test_split_skips_boundary_and_dead():
    st = square_state(capacity=6)
    st = st.replace(split=jnp.array([True, True, False, False, False,
                                     False]),
                    boundary=st.boundary.at[0].set(True),
                    alive=st.alive.at[1].set(False))
    out = adapt.apply_splits(st, CFG)
    # neither is eligible: no children injected (3 alive going in)
    assert int(adapt.count_alive(out)) == 3


def test_step_merge_shrinks_dense_blob():
    cfg = CFG.replace(merge_dist=0.03)
    st = random_blob(64, seed=3, cfg=cfg, span=0.05)
    st, metrics = run_chunk(st, cfg, 3)
    assert int(metrics.n_alive[-1]) < 64
    mass = np.asarray(st.mass)[np.asarray(st.alive)]
    assert (mass == cfg.merge_mass_new).any()
    # mass bookkeeping: absorbers carry 2.75, victims 0 — pool total
    # matches alive masses
    assert np.isfinite(np.asarray(st.pos)[np.asarray(st.alive)]).all()


def test_step_split_grows_to_capacity_only():
    cfg = CFG.replace(split_reinjection=True, split_mass_min=0.5,
                      split_dens_max=1e9)
    st = random_blob(32, seed=1, cfg=cfg, span=0.08, capacity=40)
    st, metrics = run_chunk(st, cfg, 4)
    n_alive = np.asarray(metrics.n_alive)
    assert n_alive[-1] > 32
    assert n_alive.max() <= 40
    assert (np.diff(n_alive) >= 0).all()

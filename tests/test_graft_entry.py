"""Guard the driver contract (__graft_entry__.py).

Round-1 shipped a dryrun_multichip that assumed the ambient backend had
enough devices and failed under the driver (VERDICT round 1, missing #1).
These tests exercise both entry points exactly as the driver does, on the
8-device CPU mesh the conftest provisions.
"""

import jax

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    for leaf in jax.tree_util.tree_leaves(out):
        assert bool(jax.numpy.all(jax.numpy.isfinite(leaf)))


def test_dryrun_multichip_8():
    # Must complete on an 8-device mesh (self-provisioning is a no-op
    # here because the conftest already forced the virtual CPU mesh).
    graft.dryrun_multichip(8)


def test_dryrun_multichip_2():
    graft.dryrun_multichip(2)

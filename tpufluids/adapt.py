"""Adaptive resolution — particle merge/split as masked pool ops.

The reference merges particles by mutating the AoS array inside the
force kernel (mass 2.75 / 0, averaged position+velocity, victim
teleported to 90.99 and flagged boundary, FluidGPU-unidyn.cu:261-275),
then compacts by sorting the sentinel cell ids to the end and counting
(``count_after_merge``, FluidGPU-unidyn.cu:554-562).  Splitting is
flagged in-kernel (:278-285) and re-injected by a host-side block that
ships commented out (solver-unidyn.cu:495-542).

Here both are deterministic masked ops on the fixed-capacity pool:

* merge: mutual-nearest eligible pairs merge; the lower PID absorbs
  (mass = merge_mass_new, averaged pos/vel), the victim's ``alive``
  mask clears (no teleport needed — dead slots already sort to the
  sentinel bin).  The pid tiebreak is device-invariant, so the sharded
  step resolves cut-straddling pairs identically on both owners.
* split: flagged particles re-inject a child into a free (dead) slot
  with the mother's velocity and a y offset, implementing the latent
  host block.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpufluids.config import SPHConfig
from tpufluids.state import ParticleState


def resolve_merges(state: ParticleState, partner_row: jax.Array,
                   pick_pid: jax.Array, cfg: SPHConfig) -> ParticleState:
    """Apply merge outcomes given each row's nearest-eligible-partner
    row (``partner_row``, for the partner's pos/vel data; -1 if none)
    and the authoritative pid picked by each row (``pick_pid``; under
    spatial decomposition the picks of halo rows come from their owner
    device, tpufluids.shard.particles).

    A pair merges iff the picks are mutual (my partner picked my pid);
    the LOWER pid absorbs (mass = merge_mass_new, averaged pos/vel) and
    the higher pid dies.  Pid-based matching is device-invariant: both
    sides of a slab cut resolve the same pair identically, whereas a
    local-row tiebreak would diverge between devices."""
    n = state.capacity
    pc = jnp.clip(partner_row, 0, n - 1)
    has = (partner_row >= 0) & (pick_pid >= 0)
    # mutual: my partner's (authoritative) pick is me
    mutual = has & (pick_pid[pc] == state.pid) & (pick_pid != state.pid)
    absorber = mutual & (state.pid < pick_pid)
    victim = mutual & (state.pid > pick_pid)

    pos = jnp.where(absorber[:, None],
                    (state.pos + state.pos[pc]) / 2.0, state.pos)
    vel = jnp.where(absorber[:, None],
                    (state.vel + state.vel[pc]) / 2.0, state.vel)
    mass = jnp.where(absorber, cfg.merge_mass_new, state.mass)
    mass = jnp.where(victim, 0.0, mass)
    alive = state.alive & (~victim)
    return state.replace(pos=pos, vel=vel, mass=mass, alive=alive)


def apply_merges(state: ParticleState, merge_partner: jax.Array,
                 cfg: SPHConfig) -> ParticleState:
    """Deterministic merge resolution: a pair (i, j) merges iff each is
    the other's nearest eligible partner; the lower PID absorbs (see
    resolve_merges)."""
    n = state.capacity
    pick_pid = jnp.where(merge_partner >= 0,
                         state.pid[jnp.clip(merge_partner, 0, n - 1)], -1)
    return resolve_merges(state, merge_partner, pick_pid, cfg)


def apply_splits(state: ParticleState, cfg: SPHConfig) -> ParticleState:
    """Re-inject children for split-flagged particles into dead slots.

    Mother: mass reset to 1, flag cleared (FluidGPU-unidyn.cu:279,
    solver-unidyn.cu:512).  Child: mother's position with a y offset,
    mother's velocity, mass 1 (solver-unidyn.cu:507-531).  Children are
    assigned to free slots in order; excess splits wait for a later step
    (the pool is capacity-bounded, like the reference's nspts+nbpts cap).
    """
    n = state.capacity
    want = state.split & state.alive & (~state.boundary)
    free = ~state.alive
    # rank k-th splitter with k-th free slot
    want_rank = jnp.cumsum(want.astype(jnp.int32)) - 1
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    n_free = jnp.sum(free.astype(jnp.int32))
    served = want & (want_rank < n_free)

    # scatter: slot_of_rank[r] = index of r-th free slot
    slot_of_rank = jnp.full((n,), n, jnp.int32).at[
        jnp.where(free, free_rank, n)].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    child_slot = jnp.where(served, slot_of_rank[jnp.clip(want_rank, 0, n - 1)],
                           n)

    child_pos = state.pos + jnp.array(
        [0.0, cfg.split_child_y_offset, 0.0], jnp.float32)

    def scatter(dst, src, fill_idx):
        return dst.at[fill_idx].set(src, mode="drop")

    pos = scatter(state.pos, child_pos, child_slot)
    vel = scatter(state.vel, state.vel, child_slot)
    acc = scatter(state.acc, state.acc, child_slot)
    mass = scatter(state.mass, jnp.ones_like(state.mass), child_slot)
    dens = scatter(state.dens, state.dens, child_slot)
    press = scatter(state.press, state.press, child_slot)
    delpress = scatter(state.delpress, jnp.zeros_like(state.delpress),
                       child_slot)
    diffusion = scatter(state.diffusion, jnp.zeros_like(state.diffusion),
                        child_slot)
    solid = scatter(state.solid, state.solid, child_slot)
    fluid = scatter(state.fluid, state.fluid, child_slot)
    stress = scatter(state.stress, jnp.zeros_like(state.stress), child_slot)
    boundary = scatter(state.boundary, jnp.zeros_like(state.boundary),
                       child_slot)
    alive = scatter(state.alive, jnp.ones_like(state.alive), child_slot)
    split = scatter(state.split, jnp.zeros_like(state.split), child_slot)
    pid = scatter(state.pid, state.pid + n, child_slot)

    mass = jnp.where(served, 1.0, mass)
    split = split & ~served
    return ParticleState(
        pos=pos, vel=vel, acc=acc, mass=mass, dens=dens, press=press,
        delpress=delpress, diffusion=diffusion, solid=solid, fluid=fluid,
        stress=stress, boundary=boundary, alive=alive, split=split, pid=pid)


def count_alive(state: ParticleState) -> jax.Array:
    """The reference's ``count_after_merge`` compaction count
    (FluidGPU-unidyn.cu:554-562) — here just the alive-mask sum."""
    return jnp.sum(state.alive.astype(jnp.int32))

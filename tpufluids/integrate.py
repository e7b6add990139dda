"""Per-particle update pass — ``Particle::update`` rebuilt as vector ops.

* base variant: explicit Euler with the static-friction hack
  (FluidGPU.cuh:270-304)
* unidyn variant: volume-fraction transport + kick-drift-kick leapfrog
  with drag, floor recycling and reflective walls
  (FluidGPU-unidyn.cuh:296-423)

All quirks preserved and named (config.py): the density normalization
``(sum + W(0))/23 + 9250``, the 0.003 friction threshold, the 150 vs
(220 - 70*solid) acceleration prefactors, the sequential (non-clean)
fraction renormalization, and the y/z drag conditions that read the
already-updated x velocity (FluidGPU-unidyn.cuh:352-353).
"""

from __future__ import annotations

import jax.numpy as jnp

from tpufluids.config import SPHConfig
from tpufluids.forces import ForceAccum
from tpufluids.kernels import w0
from tpufluids.state import ParticleState


def eos_pressure(dens, solid, cfg: SPHConfig):
    """Tait EOS (FluidGPU.cuh:256-260; FluidGPU-unidyn.cuh:282-286)."""
    base = (cfg.eos_stiffness * cfg.rho0 / cfg.eos_gamma
            * ((dens / cfg.rho0) ** cfg.eos_gamma - 1.0))
    if cfg.variant == "base":
        return base
    sand = (cfg.eos_stiffness * cfg.rho0_sand / cfg.eos_gamma
            * ((dens / cfg.rho0) ** cfg.eos_gamma - 1.0))
    return (1.0 - solid) * base + solid * sand


def normalize_density(sum_w, boundary, cfg: SPHConfig):
    """dens = (sum + W(0)) / 23 * (1 + bnd*BDENSFACTOR) + 9250
    (FluidGPU.cuh:165-167)."""
    return ((sum_w + w0(cfg.cutoff)) / cfg.dens_norm_div
            * (1.0 + boundary * cfg.bdensfactor) + cfg.dens_norm_offset)


def update(state: ParticleState, acc: ForceAccum,
           cfg: SPHConfig) -> ParticleState:
    bnd = state.boundary
    alive = state.alive
    mob = (~bnd) & alive
    dt = jnp.float32(cfg.dt)

    dens = normalize_density(acc.sum_w, bnd, cfg)
    press = eos_pressure(dens, state.solid, cfg)
    delpress = acc.dpress
    # sigma is overwritten, not integrated (FluidGPU.cuh:278-282)
    stress_new = dt * acc.stress_rate

    if cfg.variant == "base":
        pos = jnp.where(mob[:, None],
                        state.pos + dt * state.vel
                        + cfg.diff * state.diffusion, state.pos)
        vp = state.vel + dt * state.acc  # stress_accel == 0 in base path
        eps = jnp.float32(cfg.friction_eps)
        vx = vp[:, 0] - (vp[:, 0] > 0) * eps + (vp[:, 0] < 0) * eps
        vx = vx * (jnp.abs(vx) > eps)
        vy = vp[:, 1] - (vp[:, 1] > 0) * eps + (vp[:, 1] < 0) * eps
        vy = vy * (jnp.abs(vy) > eps)
        vz = vp[:, 2] * (jnp.abs(vp[:, 2]) > eps)
        new_vel = jnp.stack([vx, vy, vz], axis=1)
        new_acc = -(cfg.accel_prefactor / dens)[:, None] * delpress
        new_acc = new_acc.at[:, 2].add(cfg.gravity)
        vel = jnp.where(mob[:, None], new_vel, state.vel)
        accel = jnp.where(mob[:, None], new_acc, state.acc)
        solid, fluid = state.solid, state.fluid
        split = state.split
    else:
        friction = jnp.sum(jnp.abs(acc.diffusion), axis=-1)
        solid = state.solid + dt * acc.delsolid
        solid = solid * (solid >= 0)
        delfluid = jnp.where(state.fluid + acc.delfluid < cfg.fluid_floor,
                             0.0, acc.delfluid)
        fluid = state.fluid + dt * delfluid
        fluid = fluid * (fluid >= 0)
        # sequential renormalization quirk (FluidGPU-unidyn.cuh:319-320)
        fluid = fluid / (fluid + solid)
        solid = solid / (fluid + solid)
        solid = jnp.where(mob, solid, state.solid)
        fluid = jnp.where(mob, fluid, state.fluid)

        pos = jnp.where(mob[:, None],
                        state.pos + dt * state.vel
                        + 0.5 * dt * dt * state.acc
                        + cfg.diff * acc.diffusion, state.pos)
        below = pos[:, 2] < cfg.floor_recycle_z
        v0x = jnp.where(mob & below, 0.0, state.vel[:, 0])
        v0y = jnp.where(mob & below, 0.0, state.vel[:, 1])
        v0z = state.vel[:, 2]

        sa, ma = acc.stress_accel, acc.mixture_accel
        drag = friction * cfg.solid_drag * solid
        maw = cfg.mixture_accel_weight
        a0 = state.acc

        vx = v0x + 0.5 * dt * a0[:, 0] + dt * sa[:, 0] + maw * dt * dt * ma[:, 0]
        cond_x = v0x + dt * a0[:, 0] + dt * sa[:, 0] + dt * dt * ma[:, 0]
        vx = vx - (cond_x > 0) * drag + (cond_x < 0) * drag
        # quirk: y/z drag conditions read the updated x velocity and the
        # x acceleration (FluidGPU-unidyn.cuh:352-353)
        vy = v0y + 0.5 * dt * a0[:, 1] + dt * sa[:, 1] + maw * dt * dt * ma[:, 1]
        cond_y = vx + dt * a0[:, 0] + dt * sa[:, 1] + dt * dt * ma[:, 1]
        vy = vy - (cond_y > 0) * drag + (cond_y < 0) * drag
        vz = v0z + 0.5 * dt * a0[:, 2] + dt * sa[:, 2] + maw * dt * dt * ma[:, 2]
        cond_z = vx + dt * a0[:, 0] + dt * sa[:, 2] + dt * dt * ma[:, 2]
        vz = vz - (cond_z > 0) * drag + (cond_z < 0) * drag

        pref = (cfg.accel_prefactor_unidyn
                - cfg.accel_prefactor_solid * solid) / dens
        nax = -pref * delpress[:, 0]
        nay = -pref * delpress[:, 1]
        naz = cfg.gravity - pref * delpress[:, 2]

        vx = vx + 0.5 * nax * dt
        vy = vy + 0.5 * nay * dt
        vz = vz + 0.5 * naz * dt

        # walls (FluidGPU-unidyn.cuh:404-413)
        zhit = jnp.abs(pos[:, 2]) > cfg.wall_limit
        pos = pos.at[:, 2].set(
            jnp.where(mob & zhit, cfg.wall_clamp / pos[:, 2], pos[:, 2]))
        vz = jnp.where(zhit, 0.0, vz)
        vy = jnp.where(jnp.abs(pos[:, 1]) > cfg.wall_limit, -vy, vy)
        vx = jnp.where(jnp.abs(pos[:, 0]) > cfg.wall_limit, -vx, vx)

        new_vel = jnp.stack([vx, vy, vz], axis=1)
        new_acc = jnp.stack([nax, nay, naz], axis=1)
        vel = jnp.where(mob[:, None], new_vel, state.vel)
        accel = jnp.where(mob[:, None], new_acc, state.acc)
        # split nudge applied once per trigger (the reference re-adds it
        # per racing thread, FluidGPU-unidyn.cu:282); the trigger also
        # resets the mother's mass to 1 (FluidGPU-unidyn.cu:279)
        newly = acc.split_trigger & (~state.split)
        pos = pos.at[:, 1].add(jnp.where(newly, cfg.split_y_nudge, 0.0))
        split = state.split | acc.split_trigger

    mass = state.mass
    if cfg.variant != "base":
        mass = jnp.where(acc.split_trigger, 1.0, mass)

    return state.replace(
        pos=pos, vel=vel, acc=accel, mass=mass,
        dens=jnp.where(alive, dens, state.dens),
        press=jnp.where(alive, press, state.press),
        delpress=jnp.where(alive[:, None], delpress, state.delpress),
        diffusion=jnp.where(alive[:, None], acc.diffusion, state.diffusion),
        solid=solid, fluid=fluid,
        stress=jnp.where(alive[:, None, None], stress_new, state.stress),
        split=split,
    )

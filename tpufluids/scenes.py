"""Scene presets reproducing the reference drivers' particle seeding."""

from __future__ import annotations

import numpy as np

from tpufluids.config import BASE_CONFIG, UNIDYN_CONFIG, SPHConfig
from tpufluids.state import ParticleState, make_state


def base_dam(cfg: SPHConfig = BASE_CONFIG, n: int = 8000, nb: int = 0,
             capacity=None) -> ParticleState:
    """The base variant's scene: a fluid column seeded on a 15x15 lattice,
    zero boundary particles, 4000 steps (solver.cu:17-19, 115-121).

    ``nb``: optional boundary particles on a 30-wide lattice plane at
    z = -0.24, spacing 0.06 (solver.cu:122-128) — the base driver's
    second seeding block, inert in the shipped scene (``nbpts = 000``,
    solver.cu:18), exposed here for completeness."""
    j = np.arange(n)
    pos = np.stack(
        [
            -0.16 + 0.04 * ((j // 15) % 15),
            -0.76 + 0.04 * (j // 15 // 15),
            -0.20 + 0.04 * (j % 15),
        ],
        axis=1,
    ).astype(np.float32)
    if nb:
        i = np.arange(nb)
        bpos = np.stack(
            [-0.96 + 0.06 * (i % 30), -0.96 + 0.06 * (i // 30),
             np.full_like(i, -0.24, dtype=float)], axis=1
        ).astype(np.float32)
        boundary = np.concatenate([np.zeros(n, bool), np.ones(nb, bool)])
        return make_state(np.concatenate([pos, bpos], axis=0),
                          boundary=boundary, cfg=cfg, capacity=capacity)
    return make_state(pos, cfg=cfg, capacity=capacity)


def unidyn_tank(cfg: SPHConfig = UNIDYN_CONFIG, nf: int = 10000,
                nb: int = 4040, capacity=None) -> ParticleState:
    """The unidyn scene: a 30x30-lattice fluid block above a tank made of
    a floor plane plus four wall planes of boundary particles, all with
    sand phase (solid=1, fluid=0) (solver-unidyn.cu:21-23, 127-184)."""
    j = np.arange(nf)
    fluid_pos = np.stack(
        [
            -0.76 + 0.05 * ((j // 30) % 30),
            -0.76 + 0.05 * (j % 30),
            -0.40 + 0.05 * (j // 30 // 30),
        ],
        axis=1,
    )

    planes = []
    i = np.arange(nb // 2)  # floor at z = -0.7 (solver-unidyn.cu:139-149)
    planes.append(np.stack(
        [-0.96 + 0.04 * (i % 45), -0.96 + 0.04 * (i // 45),
         np.full_like(i, -0.7, dtype=float)], axis=1))
    i = np.arange(nb // 8)  # wall y = -0.96 (:151-158)
    planes.append(np.stack(
        [-0.96 + 0.04 * (i % 45), np.full_like(i, -0.96, dtype=float),
         -0.74 + 0.04 * (i // 45)], axis=1))
    i = np.arange(nb // 8)  # wall y = 0.84 (:159-166)
    planes.append(np.stack(
        [-0.96 + 0.04 * (i % 45), np.full_like(i, 0.84, dtype=float),
         -0.74 + 0.04 * (i // 45)], axis=1))
    i = np.arange(nb // 8)  # wall x = -0.96 (:167-174)
    planes.append(np.stack(
        [np.full_like(i, -0.96, dtype=float), -0.96 + 0.04 * (i % 45),
         -0.74 + 0.04 * (i // 45)], axis=1))
    i = np.arange(nb // 8)  # wall x = 0.76 (:175-184)
    planes.append(np.stack(
        [np.full_like(i, 0.76, dtype=float), -0.96 + 0.04 * (i % 45),
         -0.74 + 0.04 * (i // 45)], axis=1))
    bnd_pos = np.concatenate(planes, axis=0)

    pos = np.concatenate([fluid_pos, bnd_pos], axis=0).astype(np.float32)
    boundary = np.concatenate(
        [np.zeros(nf, bool), np.ones(bnd_pos.shape[0], bool)])
    solid = np.concatenate(
        [np.zeros(nf), np.ones(bnd_pos.shape[0])]).astype(np.float32)
    return make_state(pos, boundary=boundary, solid=solid, cfg=cfg,
                      capacity=capacity)


def random_blob(n: int, seed: int = 0, cfg: SPHConfig = BASE_CONFIG,
                span: float = 0.3, boundary_frac: float = 0.0,
                capacity=None) -> ParticleState:
    """Small random cluster for tests: particles dense enough to interact."""
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-span, span, size=(n, 3)).astype(np.float32)
    vel = rng.normal(0.0, 0.5, size=(n, 3)).astype(np.float32)
    boundary = rng.uniform(size=n) < boundary_frac
    return make_state(pos, vel, boundary=boundary, cfg=cfg, capacity=capacity)

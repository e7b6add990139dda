"""Stam stable-fluids grid module (BASELINE.json configs)."""

from tpufluids.grid.stam import (  # noqa: F401
    StamConfig, GridState2D, GridState3D, make_grid2d, make_grid3d,
    step2d, step3d, divergence3d, divergence2d,
)

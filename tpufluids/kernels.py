"""SPH smoothing kernels.

Reproduces the reference kernel functions exactly (including the literal
pi = 3.14159 and the Mueller-2003-style mismatch: a cubic-spline kernel
for density but a spiky-type gradient for forces):

* ``w_cubic``       <- ``kernel``            (FluidGPU.cu:11-21)
* ``w_cubic_deriv`` <- ``kernel_test``       (FluidGPU.cu:23-33)
* ``grad_w_spiky``  <- ``kernel_derivative`` (FluidGPU.cu:35-43)

All take the pair distance ``r`` and the smoothing length ``h``
(= reference ``cutoff``).  The cubic spline has support ``2h``; the
spiky gradient is nonzero only for ``r < h`` (a reference quirk that is
part of the behavior contract).
"""

from __future__ import annotations

import jax.numpy as jnp

from tpufluids.config import PI_REF


def w_cubic(r, h):
    """Cubic-spline density kernel W(r); support 2h (FluidGPU.cu:11-21)."""
    q = r / h
    inner = 1.0 - 1.5 * q * q + 0.75 * q * q * q          # 0 <= r <= h
    outer = 0.25 * (2.0 - q) ** 3                          # h < r < 2h
    val = jnp.where(q <= 1.0, inner, jnp.where(q < 2.0, outer, 0.0))
    # negative r never occurs (r = |x_i - x_j|); the reference also
    # gates r >= 0.
    return val / (PI_REF * h ** 3)


def w_cubic_deriv(r, h):
    """Cubic-spline derivative (reference ``kernel_test``, FluidGPU.cu:23-33).

    Only referenced by commented-out velocity-gradient code in the base
    variant; exposed for API parity and tests.
    """
    q = r / h
    inner = 1.0 - 3.0 * q + 2.25 * q * q
    outer = -0.5 * (2.0 - q) ** 2
    val = jnp.where(q <= 1.0, inner, jnp.where(q < 2.0, outer, 0.0))
    return val / (PI_REF * h ** 4)


def grad_w_spiky(r, h):
    """Spiky-type gradient magnitude dW/dr (FluidGPU.cu:35-43).

    -45/(pi h^6) (h - r)^2 for r < h, else 0.  Note: zero on [h, 2h)
    even though w_cubic is not — a deliberate parity quirk.
    """
    val = -45.0 / (PI_REF * h ** 6) * (h - r) ** 2
    return jnp.where(r < h, val, 0.0)


def w0(h) -> float:
    """W(0) — the self-contribution added in the density normalization
    (FluidGPU.cuh:166)."""
    return 1.0 / (PI_REF * h ** 3)
